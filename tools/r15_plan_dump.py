"""Dump `.explain("formatted")` for headline queries into plans/r15/.

Usage: python tools/r15_plan_dump.py <suffix> [query ...]
  suffix: "before" | "after" (writes plans/r15/<query>_<suffix>.txt)
  With no query args, dumps every bench headline line.

The LSH/IVF/HNSW serving queries execute driver-side probe logic inside the
query function, so the captured plan is the plan of the RETURNED DataFrame —
the final serving join, which is the shape the optimization claims are about.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from bench import HEADLINE, _clear_state

    import __spark_entry__ as entry
    from vers_spark.session import get_spark

    spark = get_spark(app_name="r15_plan_dump")
    qmap = entry.queries()
    if not names:
        names = list(HEADLINE)
    outdir = os.path.join("/root/repo", "plans", "r15")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        try:
            df = qmap[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR: {type(exc).__name__}: {exc}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)", flush=True)
        _clear_state(spark)


if __name__ == "__main__":
    main()
