"""Audit every registered query's OUTPUT schema for driver-canonicalizer
hazards. The driver sorts all result columns through pandas and hashes in a
dtype-class-sensitive way; calibration against three rounds of driver rows
(see tests/oracle.py::_norm_dtype) gives the contract:

HARD hazards (red driver row guaranteed):
- ArrayType/MapType/StructType — list/dict cells are unhashable in the
  pandas sort → driver ERR (r2: ivf_build_fixed, emb_label_centroids;
  r3: mm_resize, mm_audio_resample — StructType slipped through the r3
  audit, which only checked Array/Map).
- DecimalType — Spark-via-Arrow renders object-Decimal, DuckDB fetchdf
  renders float64 → silent hash_match=false even when values agree
  (r3: evt_gapfill_locf, evt_hourly_rollup_serve).

NOT hazards (driver-green evidence):
- TimestampType: stream_events_hourly was green in r3 with a raw
  datetime64[ns]-vs-[us] divergence (pandas hashing upcasts).
- int32 vs int64: q_top_customers_per_nation green in r1.

Green discipline for decimals: cast to double or ×10⁴ fixed-point BIGINT.

Run at sf0.001 so even the heavy iterative queries construct quickly.

Usage: python tools/audit_schemas.py [sf_dir]
Exit code 1 if any registered query emits a hard-hazard column type.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T  # noqa: E402

_HARD = (T.ArrayType, T.MapType, T.StructType, T.DecimalType)


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
                if isinstance(f.dataType, _HARD)
            ]
            infos = [
                f"{f.name}:{f.dataType.simpleString()}"
                for f in df.schema.fields
                if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType))
            ]
            if hazards:
                bad.append((name, ", ".join(hazards)))
                print(f"[{i + 1}/{len(qs)}] {name}: HAZARD {hazards}", flush=True)
            elif infos:
                print(f"[{i + 1}/{len(qs)}] {name}: ok (raw timestamp: {infos})", flush=True)
            else:
                print(f"[{i + 1}/{len(qs)}] {name}: ok", flush=True)
        except Exception:
            errs.append((name, traceback.format_exc(limit=3)))
            print(f"[{i + 1}/{len(qs)}] {name}: BUILD ERROR", flush=True)
    print(f"\n{len(qs)} queries, {len(bad)} hard hazards, {len(errs)} build errors")
    for name, cols in bad:
        print(f"  HAZARD {name}: {cols}")
    for name, tb in errs:
        print(f"  ERROR  {name}:\n{tb}")
    return 1 if bad or errs else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))
