"""Audit every registered query's OUTPUT schema for driver-canonicalizer
hazards: the driver sorts all result columns through pandas, which raises
``TypeError: unhashable type`` on array/map cells (CORRECTNESS_r02:
ivf_build_fixed, emb_label_centroids). Run at sf0.001 so even the heavy
iterative queries construct quickly.

Usage: python tools/audit_schemas.py [sf_dir]
Exit code 1 if any registered query emits an ArrayType/MapType column.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T  # noqa: E402


def main(sf_dir: str) -> int:
    import __spark_entry__ as E
    from vers_spark.session import get_spark

    spark = get_spark()
    bad: list[tuple[str, str]] = []
    errs: list[tuple[str, str]] = []
    qs = E.queries()
    for i, (name, fn) in enumerate(qs.items()):
        try:
            df = fn(spark, sf_dir)
            hazards = [
                f"{f.name}:{f.dataType.simpleString()}"
                for f in df.schema.fields
                if isinstance(f.dataType, (T.ArrayType, T.MapType))
            ]
            if hazards:
                bad.append((name, ", ".join(hazards)))
                print(f"[{i + 1}/{len(qs)}] {name}: HAZARD {hazards}", flush=True)
            else:
                print(f"[{i + 1}/{len(qs)}] {name}: ok", flush=True)
        except Exception:
            errs.append((name, traceback.format_exc(limit=3)))
            print(f"[{i + 1}/{len(qs)}] {name}: BUILD ERROR", flush=True)
    print(f"\n{len(qs)} queries, {len(bad)} array/map hazards, {len(errs)} build errors")
    for name, cols in bad:
        print(f"  HAZARD {name}: {cols}")
    for name, tb in errs:
        print(f"  ERROR  {name}:\n{tb}")
    return 1 if bad or errs else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))
