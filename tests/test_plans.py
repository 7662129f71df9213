"""Plan-shape regression tests: pushdown, pruning, broadcast, partial aggs.

These pin the Catalyst behaviors the 100 TB design depends on (SURVEY §4) —
a change that breaks one of these shapes would still pass value checks at
test scale while regressing badly at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vers_spark.operators.relational import q1_pricing_summary, q5_revenue_by_nation
from vers_spark.operators.text_analysis import doc_quality
from vers_spark.operators.knn import exact_knn
from vers_spark.plans import audit
from vers_spark.sources.tables import load_table


def test_q5_join_and_pushdown(spark, sf_dir):
    df = q5_revenue_by_nation(spark, sf_dir)
    assert audit.has_broadcast_join(df)  # dims broadcast at this scale
    pushed = " ".join(audit.pushed_filters(df))
    assert "r_name" in pushed  # region predicate reaches the scan
    assert "o_orderdate" in pushed  # date range reaches the orders scan
    assert audit.has_partial_aggregate(df)


def test_q1_column_pruning(spark, sf_dir):
    df = q1_pricing_summary(spark, sf_dir)
    cols = audit.scan_columns(df)
    lineitem_scan = max(cols, key=len)
    # 16-column table, 7-column query: the scan must not read the rest
    assert "l_comment" not in lineitem_scan and "l_partkey" not in lineitem_scan
    assert audit.has_partial_aggregate(df)


def test_doc_quality_single_pass(spark, sf_dir):
    df = doc_quality(spark, sf_dir)
    # pure per-row expressions: no shuffle at all
    assert audit.num_exchanges(df) == 0
    cols = audit.scan_columns(df)
    assert all("source" not in c for c in cols)  # unused column pruned


def test_exact_knn_broadcasts_queries(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    df = exact_knn(q, emb, k=10)
    # the small query side must broadcast; the corpus must never shuffle
    assert audit.has_broadcast_join(df)
    assert not audit.has_sort_merge_join(df)


def test_ivf_on_disk_search_partition_prunes(spark, sf_dir, tmp_path):
    """A search against the SAVED index must hit the cluster_id-partitioned
    posting lists with dynamic partition pruning — the Spark analogue of
    scanning only the probed posting lists (ivfflat.rs:166-195)."""
    from vers_spark.indexes.ivfflat import IVFFlatIndex

    emb = load_table(spark, sf_dir, "embeddings")
    idx = IVFFlatIndex.build(emb, num_clusters=8, seed=1)
    idx.save(str(tmp_path / "ivf"))
    loaded = IVFFlatIndex.load(spark, str(tmp_path / "ivf"))
    res = loaded.search(emb.filter(F.col("vec_id") < 3), k=5, n_probes=2)
    plan = audit.executed_plan(res)
    assert "dynamicpruning" in plan  # probe list prunes posting-list files
    # and results are identical to the in-memory index's
    a = sorted(map(tuple, res.collect()))
    b = sorted(map(tuple, idx.search(emb.filter(F.col("vec_id") < 3), k=5, n_probes=2).collect()))
    assert a == b


def test_filter_pushdown_through_load_table(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    pushed = " ".join(audit.pushed_filters(df))
    assert "o_orderstatus" in pushed
    cols = audit.scan_columns(df)
    assert all(len(c) <= 2 for c in cols)  # only key + filter column read
