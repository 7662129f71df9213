"""Leg-by-leg wall-clock of the lsh_saved_multiprobe bench line at sf0.1:
build (in-session forest) / save (partitioned store + pack) / load /
first multiprobe serve — run with nothing else on the box; each leg is
labelled so a Spark-UI/eventlog read attributes stages. Prints one JSON
line for OPTIMIZATION_r14.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from vers_spark.indexes.lsh import LSHForestIndex
    from vers_spark.session import get_spark
    from vers_spark.sources.staging import ephemeral_dir
    from vers_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    spark = get_spark(app_name="lsh_saved_legs")
    emb = load_table(spark, SF_DIR, "embeddings")
    emb.count()  # warm footer cache
    legs = {}

    t0 = time.perf_counter()
    spark.sparkContext.setJobDescription("legs: build")
    idx = LSHForestIndex.build(emb, num_trees=8, max_node_size=100, seed=7)
    idx.leaves.count()
    legs["build"] = round(time.perf_counter() - t0, 3)

    path = ephemeral_dir("vs_lsh_legs_") + "/idx"
    t0 = time.perf_counter()
    spark.sparkContext.setJobDescription("legs: save")
    idx.save(path)
    legs["save"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    spark.sparkContext.setJobDescription("legs: load")
    loaded = LSHForestIndex.load(spark, path)
    legs["load"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    spark.sparkContext.setJobDescription("legs: serve")
    n = loaded.search_multiprobe(
        emb.filter(F.col("vec_id") < 50), k=10, n_probes=2, probe_mode="margin"
    ).count()
    legs["serve_cold"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    n = loaded.search_multiprobe(
        emb.filter(F.col("vec_id") < 50), k=10, n_probes=2, probe_mode="margin"
    ).count()
    legs["serve_warm"] = round(time.perf_counter() - t0, 3)
    legs["rows"] = n
    print(json.dumps(legs))


if __name__ == "__main__":
    main()
