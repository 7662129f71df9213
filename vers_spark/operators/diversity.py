"""Embedding-space curation: semantic dedup (SemDeDup, Abbas et al. 2023)
and greedy k-center (farthest-point) diversity sampling — the two
embedding-driven subset-selection passes of a training-data pipeline.
No counterpart in the reference (vectors-only ANN, `base.rs:27-58`); these
COMPOSE its building blocks: the IVFFlat k-means partitioner
(`ivfflat.rs:73-136` → indexes/ivfflat.py) plus the §A distance kernels.

Scale shapes:
- semantic_dedup: k-means assignment is the only corpus-wide shuffle (one
  exchange on cluster_id — identical cost profile to the IVF build it
  reuses). Per-cluster representatives are found with a window over
  cluster_id, and the rep table (k rows) is BROADCAST back — no second
  shuffle. Each ε-ball comparison is row-local against the broadcast rep.
- kcenter_sample: k sequential jobs, each one embarrassingly-parallel scan
  computing distance to the single newest center (running min kept in a
  column, so iteration i does O(n) work, not O(n·i)). Lineage is truncated
  with localCheckpoint every few rounds. k is small by construction
  (coreset seeding); for k in the thousands switch to kmeans++ oversample
  (MLlib initMode=k-means||) — noted, not needed here.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vers_spark.functions import vector as V
from vers_spark.indexes.ivfflat import IVFFlatIndex
from vers_spark.sources.tables import load_table


TARGET_CLUSTER_SIZE = 2_000  # bounds the per-cluster Gram matrix (~32 MB f64)

# Above this cluster size the c×c Gram matrix (the paper's one-matmul
# pairwise step) stops being the right tool (~0.5 GB f64 at 8k×8k, growing
# quadratically); the spill form compares each row only against the KEPT
# set — O(c·kept) flops, O(kept·dim) memory. Deterministic run-to-run;
# equal to the Gram path except when a similarity sits within one BLAS-ulp
# of tau (agreement on real data asserted in tests). k is auto-sized to
# keep clusters near TARGET_CLUSTER_SIZE, so this is the skewed-cluster
# safety net, not the common path.
GRAM_MAX_ROWS = 8_000


def semantic_dedup(
    emb: DataFrame,
    num_clusters: int | None = None,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023 §2): k-means-partition the corpus, then
    WITHIN each cluster greedily keep members in (distance-to-centroid, id)
    order, dropping any member whose cosine similarity to an already-kept
    member is ≥ tau. Pairwise comparison happens only inside a cluster —
    that is the paper's trick for making pairwise dedup tractable: O(Σ cᵢ²)
    instead of O(n²), with cluster size c bounded by choosing k ∝ n.

    Spark shape: the k-means assignment reuses the IVFFlat build (one
    exchange on cluster_id); the greedy scan is a grouped applyInPandas —
    one Arrow batch per cluster, a single Gram-matrix product per group.
    Returns the full corpus annotated (cluster_id, keep_rank, d_cent,
    kept, sim_to_killer) — callers filter ``kept``."""
    import numpy as np
    import pandas as pd

    if num_clusters is None:
        # auto-size k ∝ n so expected cluster size (and the per-cluster
        # Gram matrix) stays bounded regardless of corpus scale
        num_clusters = max(16, emb.count() // TARGET_CLUSTER_SIZE)
    idx = IVFFlatIndex.build(
        emb, num_clusters=num_clusters, id_col=id_col, vec_col=vec_col, seed=seed
    )
    a = idx.assignments  # id, cluster_id, embedding
    with_d = a.join(F.broadcast(idx.centroids), "cluster_id").withColumn(
        "d_cent", V.sq_euclidean(F.col("embedding").cast("array<double>"), F.col("centroid"))
    )

    gram_cap = GRAM_MAX_ROWS

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["d_cent", "id"]).reset_index(drop=True)
        X = np.array(list(pdf["embedding"]), dtype=np.float64)
        norms = np.linalg.norm(X, axis=1)
        norms[norms == 0.0] = 1.0
        Xn = X / norms[:, None]
        S = Xn @ Xn.T if len(pdf) <= gram_cap else None
        kept_rows: list[int] = []
        kept_flags = np.zeros(len(pdf), dtype=bool)
        killer_sim = np.full(len(pdf), np.nan)
        for i in range(len(pdf)):
            if kept_rows:
                sims = S[i, kept_rows] if S is not None else Xn[kept_rows] @ Xn[i]
                j = int(np.argmax(sims))
                if sims[j] >= tau:
                    killer_sim[i] = float(sims[j])
                    continue
            kept_flags[i] = True
            kept_rows.append(i)
        return pd.DataFrame(
            {
                "id": pdf["id"],
                "cluster_id": pdf["cluster_id"],
                "keep_rank": np.arange(len(pdf), dtype=np.int32),
                "d_cent": pdf["d_cent"],
                "kept": kept_flags,
                "sim_to_killer": killer_sim,
            }
        )

    out = with_d.select("id", "cluster_id", "embedding", "d_cent").groupBy("cluster_id").applyInPandas(
        greedy,
        schema="id long, cluster_id int, keep_rank int, d_cent double, kept boolean, sim_to_killer double",
    )
    return out.withColumnRenamed("id", id_col)


def kcenter_sample(
    emb: DataFrame,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center (Gonzalez farthest-point): start from the minimum id,
    then k−1 times pick the point maximizing its distance to the nearest
    already-selected center (squared Euclidean; ties by id). Exactly
    reproducible — the property test replays it in numpy."""
    spark = emb.sparkSession
    d = emb.select(F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("emb"))

    first = d.orderBy("id").limit(1).collect()[0]
    selected = [(0, int(first["id"]), float("inf"))]
    cur_vec = [float(x) for x in first["emb"]]

    state = d.withColumn("min_d", F.lit(float("inf")))
    for rank in range(1, k):
        center = F.array(*[F.lit(x) for x in cur_vec])
        state = state.withColumn(
            "min_d", F.least(F.col("min_d"), V.sq_euclidean(F.col("emb"), center))
        )
        if rank % 4 == 0:
            state = state.localCheckpoint(eager=False)
        nxt = state.orderBy(F.desc("min_d"), F.asc("id")).limit(1).collect()[0]
        selected.append((rank, int(nxt["id"]), float(nxt["min_d"])))
        cur_vec = [float(x) for x in nxt["emb"]]

    return spark.createDataFrame(
        [(r, i, dist) for r, i, dist in selected],
        f"rank int, {id_col} long, maximin_sq_dist double",
    )


# ---- driver queries (iterative / model-driven → rows-only checks; exact
# semantics are pinned by tests/test_diversity.py instead of a SQL oracle) ----


def emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = semantic_dedup(emb, num_clusters=16, tau=0.95)
    return (
        out.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
        )
        .orderBy("cluster_id")
    )


def emb_kcenter_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return kcenter_sample(emb, k=16).orderBy("rank")


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "emb_semantic_dedup": emb_semantic_dedup,
    "emb_kcenter_sample": emb_kcenter_sample,
}


def _kcenter_sql(k: int = 16) -> str:
    """Unrolled Gonzalez farthest-point oracle: every step of kcenter_sample
    is a declared-order f64 fold + an (min_d DESC, id ASC) argmax — both
    engine-exact — so the k driver rounds unroll as 2k MATERIALIZED CTEs
    (m_r = running-min update vs the previous center, s_r = the argmax row).
    A HARD hash gate on a greedy iterative algorithm."""
    fold = (
        "list_reduce(list_transform(list_zip(m.emb, (SELECT emb FROM s{prev})),"
        " s -> (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE)) * (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE))),"
        " (x,y) -> x + y)"
    )
    ctes = [
        "v AS MATERIALIZED (SELECT vec_id AS id, embedding AS emb FROM embeddings)",
        "s0 AS MATERIALIZED (SELECT id, emb, CAST('infinity' AS DOUBLE) AS maximin"
        " FROM v ORDER BY id LIMIT 1)",
        "m0 AS MATERIALIZED (SELECT id, emb, CAST('infinity' AS DOUBLE) AS min_d FROM v)",
    ]
    for r in range(1, k):
        ctes.append(
            f"m{r} AS MATERIALIZED (SELECT id, emb,"
            f" least(min_d, {fold.format(prev=r - 1)}) AS min_d FROM m{r - 1} m)"
        )
        ctes.append(
            f"s{r} AS MATERIALIZED (SELECT id, emb, min_d AS maximin FROM m{r}"
            " ORDER BY min_d DESC, id ASC LIMIT 1)"
        )
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS INT) AS rank, id AS vec_id, maximin AS maximin_sq_dist FROM s{r}"
        for r in range(k)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + sel


ORACLE_SQL: dict[str, str] = {"emb_kcenter_sample": _kcenter_sql()}
