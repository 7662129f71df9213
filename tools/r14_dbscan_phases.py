"""Phase breakdown for emb_dbscan_clusters (guide §1: isolate before
optimizing). Mirrors the operator body but forces materialization between
phases so per-phase wall is visible. Not a correctness tool — the real
operator stays the single lazy composition.

Usage: python tools/r14_dbscan_phases.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from vers_spark.session import get_spark  # noqa: E402
from vers_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark()
    from vers_spark.indexes.ivfflat import IVFFlatIndex
    from vers_spark.operators.graph import connected_components_star
    from vers_spark.operators.index_queries import (
        DBSCAN_EPS2,
        DBSCAN_MIN_PTS,
        DBSCAN_MOD,
    )

    for rep in range(reps):
        t = {}

        def mark(name, t0):
            t[name] = time.perf_counter() - t0
            print(f"rep{rep} {name:12s} {t[name]:7.2f}s", flush=True)

        emb = load_table(spark, sf_dir, "embeddings").filter(
            F.col("vec_id") % DBSCAN_MOD == 0
        )
        t0 = time.perf_counter()
        n = emb.count()
        mark("count", t0)
        k_clusters = max(8, min(256, n // 150))
        t0 = time.perf_counter()
        idx = IVFFlatIndex.build(emb, num_clusters=k_clusters, seed=11)
        idx.assignments.count()
        mark("ivf_build", t0)
        t0 = time.perf_counter()
        nbrs = idx.range_join_blocked(emb, DBSCAN_EPS2).localCheckpoint(eager=True)
        mark("range_join", t0)
        deg = nbrs.groupBy("query_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_eps")
        )
        core = deg.filter(F.col("n_eps") >= DBSCAN_MIN_PTS).select(
            F.col("query_id").alias("vec_id")
        )
        pairs = nbrs.filter(F.col("query_id") < F.col("neighbour_id")).select(
            F.col("query_id").alias("a"), F.col("neighbour_id").alias("b")
        )
        core_edges = pairs.join(
            core.withColumnRenamed("vec_id", "a"), "a", "left_semi"
        ).join(core.withColumnRenamed("vec_id", "b"), "b", "left_semi")
        t0 = time.perf_counter()
        comp = connected_components_star(core_edges, src="a", dst="b").select(
            F.col("node").alias("vec_id"), "component"
        )
        core_comp = (
            core.join(comp, "vec_id", "left")
            .select(
                "vec_id", F.coalesce("component", "vec_id").alias("cluster")
            )
            .localCheckpoint(eager=True)
        )
        mark("cc_star", t0)
        border = (
            nbrs.filter(F.col("query_id") != F.col("neighbour_id"))
            .join(
                core.withColumnRenamed("vec_id", "query_id"),
                "query_id",
                "left_anti",
            )
            .join(
                core_comp.select(
                    F.col("vec_id").alias("neighbour_id"),
                    F.col("cluster").alias("_c"),
                ),
                "neighbour_id",
            )
            .groupBy("query_id")
            .agg(F.min("_c").alias("cluster"))
            .select(F.col("query_id").alias("vec_id"), "cluster")
        )
        role = (
            F.when(F.col("core_cluster").isNotNull(), F.lit("core"))
            .when(F.col("border_cluster").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
        )
        out = (
            deg.withColumnRenamed("query_id", "vec_id")
            .join(
                core_comp.withColumnRenamed("cluster", "core_cluster"),
                "vec_id",
                "left",
            )
            .join(
                border.withColumnRenamed("cluster", "border_cluster"),
                "vec_id",
                "left",
            )
            .select(
                "vec_id",
                role.alias("role"),
                F.coalesce("core_cluster", "border_cluster", F.lit(-1))
                .cast("long")
                .alias("cluster"),
                "n_eps",
            )
            .orderBy("vec_id")
        )
        t0 = time.perf_counter()
        out.write.format("noop").mode("overwrite").save()
        mark("assemble", t0)
        print(
            f"rep{rep} TOTAL        {sum(t.values()):7.2f}s  (n={n}, k={k_clusters})",
            flush=True,
        )
        spark.catalog.clearCache()
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for rid in list(jmap.keySet().toArray()):
                jmap.get(rid).unpersist(False)
        except Exception:
            pass
        from vers_spark.indexes import ivfflat as _iv  # noqa: F401


if __name__ == "__main__":
    main()
