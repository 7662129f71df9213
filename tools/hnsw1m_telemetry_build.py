"""VERDICT r12 item 2: settle the 1M HNSW build variance (404.8-949 s
across windows, §r11) with the per-shard telemetry that landed in r12.

Builds the §r10/r11 config (64-parent balanced k-means, 12k shard cap,
boundary handling off) on the cached 1M×300 corpus and analyzes
params['shard_build_seconds']:

- STRAGGLERS would show as uneven shard walls with the build wall tracking
  the max shard (wall ≈ assignment + slowest wave containing the max).
- HOST STEAL shows as uniform inflation: every shard's wall scales with
  the window while the rows stay fixed, and the wall tracks
  sum(shard_s)/32 workers, not an outlier.

Prints the per-shard (rows, seconds) distribution, the critical-path vs
total-work decomposition, and per-row microseconds vs the single-shard
A/B floor (67.3 s / 12k rows ≈ 5.6 ms/row, §r11) as the steal indicator.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from vers_spark.indexes.hnsw import HNSWIndex
    from vers_spark.session import get_spark

    spark = get_spark(
        app_name="hnsw1m_tele", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    corpus = (
        spark.read.parquet(f"{REPO}/.scale_data/emb1m_1000000.parquet")
        .filter("vec_id < 1000000")
        .withColumnRenamed("vec_id", "id")
    )
    t0 = time.perf_counter()
    hnsw = HNSWIndex.build(
        corpus,
        id_col="id",
        num_layers=12,
        ef_construction=100,
        ef_search=32,
        m=24,
        num_shards=64,
        shard_by="kmeans",
        seed=42,
        max_shard_rows=12000,
    )
    hnsw.graph.count()
    wall = time.perf_counter() - t0
    tele = hnsw.params["shard_build_seconds"]
    rows = sorted(n for n, _ in tele.values())
    secs = sorted(s for _, s in tele.values())
    n_workers = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    def pct(xs, q):
        return xs[min(len(xs) - 1, int(q * len(xs)))]

    out = {
        "build_wall_s": round(wall, 1),
        "num_shards": len(tele),
        "rows": {"min": rows[0], "p50": pct(rows, 0.5), "max": rows[-1]},
        "shard_s": {
            "min": secs[0],
            "p50": pct(secs, 0.5),
            "p90": pct(secs, 0.9),
            "max": secs[-1],
        },
        "total_work_s": round(sum(secs), 1),
        "ideal_wall_s": round(sum(secs) / n_workers, 1),
        "critical_path_s": round(secs[-1], 1),
        # ms per row per shard — uniform inflation of this vs the §r11
        # single-shard floor (~5.6 ms/row at the 12k cap) means steal
        "ms_per_row": {
            "p50": round(
                1000 * pct(sorted(s / n for n, s in tele.values() if n), 0.5), 2
            ),
            "max": round(
                1000 * max(s / n for n, s in tele.values() if n), 2
            ),
        },
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
