"""Mimic the driver's correctness sweep: run every queries() entry at sf0.01,
time Spark execution (collect), print per-query seconds sorted by cost."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from vers_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entry  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or None
    spark = get_spark()
    qs = entry.queries()
    times = {}
    t_all = time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            n = len(df.collect())
            err = None
        except Exception as e:  # noqa: BLE001
            n, err = -1, f"{type(e).__name__}: {e}"[:200]
        dt = time.time() - t0
        times[name] = round(dt, 2)
        print(f"{dt:7.2f}s  {n:6d}  {name}" + (f"  ERR {err}" if err else ""), flush=True)
    total = time.time() - t_all
    print(f"\nTOTAL {total:.1f}s for {len(times)} queries")
    for name, dt in sorted(times.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {dt:7.2f}s  {name}")
    with open("/tmp/sweep_times.json", "w") as f:
        json.dump(times, f, indent=1)


if __name__ == "__main__":
    main()
