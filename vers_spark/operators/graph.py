"""Connected components over a pair/edge list — the clustering step between
near-dup PAIR detection (text_dedup, similarity) and dedup SURVIVOR selection:
pairs only say "a duplicates b"; transitive closure decides which rows form one
duplicate group and which single row survives (min id, matching the
first-occurrence-wins rule of the reference's dedup, `lsh.rs:119-129`).

Algorithm: iterative min-label propagation (each node adopts the minimum label
among itself and its neighbours) — the dataflow formulation of breadth-first
union-find. Per round: ONE shuffle (join labels to edges) + ONE aggregate
(min per node); rounds = graph diameter. Near-dup graphs are clique-like
(diameter 2-4), so this beats the Stergiou/Kiveris large-star/small-star
alternation, whose constant factor only pays off on deep path-shaped graphs
(that variant is the documented upgrade path if components ever span
millions of nodes). Labels only decrease, so the sum of labels is strictly
monotone — convergence is detected by a 1-row aggregate per round, no
row-level diff join.

Scale notes (100 TB): the edge list is tiny relative to the corpus (only
docs with ≥1 dup pair appear); per-round lineage is truncated with
localCheckpoint so the plan doesn't grow with iterations; the undirected
edge list is cached once and reused every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """Return ``(node BIGINT, component BIGINT)`` for every node appearing in
    ``edges``; ``component`` is the minimum node id of the node's component.
    Raises if ``max_iter`` rounds don't reach the fixpoint (diameter bound
    exceeded — pathological input for this variant)."""
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    und = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    und = und.distinct().cache()
    labels = (
        und.select(F.col("src").alias("node")).distinct().withColumn("lbl", F.col("node"))
    ).localCheckpoint()
    prev = labels.agg(F.sum(F.col("lbl").cast("decimal(38,0)"))).collect()[0][0]
    for _ in range(max_iter):
        msgs = und.join(labels, und.src == labels.node).select(
            F.col("dst").alias("node"), "lbl"
        )
        labels = (
            labels.unionByName(msgs).groupBy("node").agg(F.min("lbl").alias("lbl"))
        ).localCheckpoint()
        cur = labels.agg(F.sum(F.col("lbl").cast("decimal(38,0)"))).collect()[0][0]
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    und.unpersist()
    return labels.select("node", F.col("lbl").alias("component"))


def dedup_survivors(components: DataFrame) -> DataFrame:
    """Per node: its component, the component size, and whether it is the
    surviving row (node == component == min id of the group)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("component")
    return components.select(
        F.col("node").alias("doc_id"),
        "component",
        F.count(F.lit(1)).over(w).alias("comp_size"),
        (F.col("node") == F.col("component")).cast("int").alias("is_survivor"),
    )
