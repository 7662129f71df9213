"""Embedding similarity + multimodal plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.oracle import assert_oracle_match
from vers_spark.operators import pipeline_queries as PQ
from vers_spark.operators.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
    synthesize_media_from_documents,
)
from vers_spark.sources.tables import load_table


@pytest.mark.parametrize("name", sorted(PQ.ORACLE_SQL))
def test_pipeline_oracles(spark, sf_dir, name):
    assert_oracle_match(spark, sf_dir, name, PQ.QUERIES[name], PQ.ORACLE_SQL[name])


def test_similarity_join_shape(spark, sf_dir):
    res = PQ.emb_similarity_join(spark, sf_dir)
    rows = res.collect()
    assert rows
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
        assert r["neighbour_id"] != r["query_id"]
    assert all(len(v) <= 3 for v in per_q.values())


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return synthesize_media_from_documents(load_table(spark, sf_dir, "documents")).cache()


def test_feature_extract_deterministic(media):
    a = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    b = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert a == b
    dims = {len(v) for v in a.values()}
    assert dims == {16}
    assert len(a) == media.count()


def test_real_decode_rejects_non_format_payloads(media):
    """decode="real" now actually parses (media_codecs BMP/WAV); the text-
    byte payloads of the default synthesizer are NOT valid format bytes, so
    the real path must fail loudly on them, naming the expected magic."""
    with pytest.raises(Exception, match="BMP|WAV|RIFF|not a"):
        extract_features(media, decode="real").collect()


def test_resize_and_frames(media):
    resized = resize_images(media, 8, 4).collect()
    assert resized and all(len(r["payload"]) == 32 for r in resized)
    assert all(r["meta"]["width"] == 8 for r in resized)
    frames = sample_frames(media, every_ms=1000).collect()
    assert frames
    by_media = {}
    for fr in frames:
        by_media.setdefault(fr["media_id"], []).append(fr["frame_idx"])
    for idxs in by_media.values():
        assert sorted(idxs) == list(range(len(idxs)))


def test_personalized_pagerank_localizes_mass(spark):
    """PPR sanity on a two-component graph: personalizing on one component
    leaves the other with exactly zero mass (teleport + walk both confined),
    and within the seed component the seed outranks equally-connected
    non-seeds."""
    from vers_spark.operators.graph import pagerank_personalized_fixed

    # component A: triangle 0-1-2; component B: triangle 10-11-12
    und = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(0,)], ["node"])
    scores = {r["node"]: r["score"] for r in pagerank_personalized_fixed(edges, seeds).collect()}
    assert all(scores[n] == 0 for n in (10, 11, 12))
    assert scores[0] > scores[1] == scores[2] > 0


def test_triangle_stats_known_graph(spark):
    """triangle_stats on a hand-checkable graph: a 4-clique {0,1,2,3}
    (each node: degree 3, 3 triangles, clustering 1.0), a pendant 3→4
    (degree bumps, no new triangle), and an open wedge 10-11-12 (zero
    triangles, center clustering 0.0)."""
    import itertools

    from vers_spark.operators.graph import triangle_stats

    edges = list(itertools.combinations(range(4), 2)) + [(3, 4), (10, 11), (11, 12)]
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {r["doc_id"]: r for r in triangle_stats(df).collect()}
    assert {n: got[n]["n_triangles"] for n in sorted(got)} == {
        0: 3, 1: 3, 2: 3, 3: 3, 4: 0, 10: 0, 11: 0, 12: 0,
    }
    assert got[0]["degree"] == 3 and got[0]["clustering"] == 1.0
    assert got[3]["degree"] == 4 and abs(got[3]["clustering"] - 0.5) < 1e-12
    assert got[4]["degree"] == 1 and got[4]["clustering"] == 0.0
    assert got[11]["degree"] == 2 and got[11]["clustering"] == 0.0


def test_connected_components_vs_union_find(spark):
    """Label propagation equals classic union-find on a seeded random graph
    plus a long path (worst-case diameter for the propagation loop)."""
    import random

    from vers_spark.operators.graph import connected_components

    rng = random.Random(42)
    edges = [(rng.randrange(0, 60), rng.randrange(0, 60)) for _ in range(45)]
    edges += [(100 + i, 101 + i) for i in range(25)]  # path: diameter 25
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expected = {n: find(n) for n in parent}

    df = spark.createDataFrame(edges, ["src", "dst"])
    # driver_cap=0 forces the DISTRIBUTED propagation loop (the default cap
    # would route this small graph to the driver union-find — which would
    # make this test circular); then assert the fast path agrees with it
    got = {r["node"]: r["component"] for r in connected_components(df, driver_cap=0).collect()}
    assert got == expected
    fast = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert fast == expected


def test_connected_components_star_parity(spark):
    """Large-star/small-star converges to the SAME min-id components as
    union-find and label propagation on a seeded random graph plus a long
    path — the path is the regime the star variant exists for (diameter 40
    would cost propagation 40 rounds; star contracts it in O(log²))."""
    import random

    from vers_spark.operators.graph import connected_components, connected_components_star

    rng = random.Random(7)
    edges = [(rng.randrange(0, 60), rng.randrange(0, 60)) for _ in range(45)]
    edges += [(200 + i, 201 + i) for i in range(40)]  # path: diameter 40
    edges = [(a, b) for a, b in edges if a != b]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}

    df = spark.createDataFrame(edges, ["src", "dst"])
    # driver_cap=0 forces the DISTRIBUTED star alternation (the default cap
    # would route this tiny graph to union-find and make the test circular)
    star = {
        r["node"]: r["component"]
        for r in connected_components_star(df, driver_cap=0).collect()
    }
    assert star == expected
    # the scale-adaptive fast path (default cap → union-find) must agree
    fast = {r["node"]: r["component"] for r in connected_components_star(df).collect()}
    assert fast == expected
    prop = {
        r["node"]: r["component"]
        for r in connected_components(df, driver_cap=0, max_iter=45).collect()
    }
    assert star == prop


def test_kcore_hand_graph_and_fixpoint(spark, sf_dir):
    """kcore(): (a) on a hand graph (4-clique + pendant chain + triangle
    with a tail) the 2-core keeps exactly the clique and triangle with full
    inside-degrees and peels every tail node — including the cascade where
    removing a leaf drops its parent below k; (b) on the real near-dup
    graph the registered KCORE_ROUNDS peel has CONVERGED (one extra round
    changes nothing), so the fixed-round oracle states the true k-core."""
    from vers_spark.operators.graph import kcore
    from vers_spark.operators.text_dedup_queries import (
        KCORE_K,
        KCORE_ROUNDS,
        _minhash_pairs,
    )

    # 4-clique {0,1,2,3}; chain 3-10-11 (peels in two cascading rounds);
    # triangle {20,21,22} with tail 22-23
    edges = (
        [(a, b) for a in range(4) for b in range(a + 1, 4)]
        + [(3, 10), (10, 11)]
        + [(20, 21), (20, 22), (21, 22), (22, 23)]
    )
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["core_degree"] for r in kcore(df, k=2, rounds=4).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 20: 2, 21: 2, 22: 2}
    # regime parity: the driver-side peel (default, below driver_cap) and
    # the distributed rounds (driver_cap=0) return the identical node set
    # and degrees — the same parity contract as connected_components'
    assert got == {
        r["node"]: r["core_degree"]
        for r in kcore(df, k=2, rounds=4, driver_cap=0).collect()
    }

    pairs = _minhash_pairs(spark, sf_dir)
    at_n = {
        (r["node"], r["core_degree"])
        for r in kcore(pairs, KCORE_K, KCORE_ROUNDS, "doc_a", "doc_b").collect()
    }
    # convergence of the DISTRIBUTED fixed-round peel (driver_cap=0: the
    # driver regime's early fixpoint break would make this check vacuous)
    extra = {
        (r["node"], r["core_degree"])
        for r in kcore(
            pairs, KCORE_K, KCORE_ROUNDS + 1, "doc_a", "doc_b", driver_cap=0
        ).collect()
    }
    assert at_n == extra and at_n  # converged, and the core is non-trivial


def test_hits_hand_graph_semantics(spark):
    """hits_fixed on a hand bipartite graph: the supplier with more (and
    better-connected) customers out-hubs the other; the shared customer
    out-authorities the exclusive ones; off-side scores are exactly 0; and
    each L1 normalization sums to HITS_UNIT within the floor-division loss
    (< one unit per node)."""
    from vers_spark.operators.graph import HITS_UNIT, hits_fixed

    edges = [("s1", "c1"), ("s1", "c2"), ("s1", "c3"), ("s2", "c1")]
    got = {
        r["node"]: (r["hub"], r["auth"])
        for r in hits_fixed(spark.createDataFrame(edges, ["src", "dst"])).collect()
    }
    assert set(got) == {"s1", "s2", "c1", "c2", "c3"}
    assert got["s1"][0] > got["s2"][0] > 0
    assert got["c1"][1] > got["c2"][1] > 0
    assert got["c2"][1] == got["c3"][1]
    assert got["s1"][1] == got["s2"][1] == 0  # suppliers have no in-edges
    assert got["c1"][0] == got["c2"][0] == 0  # customers have no out-edges
    n = len(got)
    assert HITS_UNIT - n <= sum(v[0] for v in got.values()) <= HITS_UNIT
    assert HITS_UNIT - n <= sum(v[1] for v in got.values()) <= HITS_UNIT


def test_stratified_sample_rates(spark, sf_dir):
    """Hash-bucket stratified sampling hits each language's configured rate
    within binomial tolerance, and is exactly reproducible run-to-run."""
    from vers_spark.operators.curation import (
        SAMPLE_DEFAULT_K,
        SAMPLE_RATES_K,
        doc_stratified_sample,
    )
    from vers_spark.sources.tables import load_table

    from pyspark.sql import functions as F

    totals = {
        r["lang"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got1 = {r["lang"]: r["n_sampled"] for r in doc_stratified_sample(spark, sf_dir).collect()}
    got2 = {r["lang"]: r["n_sampled"] for r in doc_stratified_sample(spark, sf_dir).collect()}
    assert got1 == got2  # deterministic: identical on re-run
    for lang, total in totals.items():
        rate = SAMPLE_RATES_K.get(lang, SAMPLE_DEFAULT_K) / 1000
        n = got1.get(lang, 0)
        # 4-sigma binomial band
        sigma = (total * rate * (1 - rate)) ** 0.5
        assert abs(n - total * rate) <= 4 * sigma + 1, (lang, n, total, rate)


def test_write_compacted_file_layout(spark, sf_dir, tmp_path):
    """write_compacted hits the requested file count, each file respects the
    row cap, and the data round-trips intact."""
    import glob

    from vers_spark.sources.layout import read_back, write_compacted
    from vers_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    target = max(1, n // 7)
    path = str(tmp_path / "compacted")
    files = write_compacted(docs, path, target, row_count=n)
    on_disk = glob.glob(path + "/part-*.parquet")
    assert len(on_disk) == files
    back = read_back(spark, path)
    assert back.count() == n
    assert sorted(r["doc_id"] for r in back.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in docs.select("doc_id").collect()
    )


def test_write_partitioned_layout_and_pruning(spark, sf_dir, tmp_path):
    """write_partitioned produces one file per low-cardinality partition
    value, round-trips intact, and a partition-column filter on the read
    path scans ONLY the matching directory (partition pruning)."""
    import glob

    from vers_spark.plans import audit
    from vers_spark.sources.layout import read_back, write_partitioned
    from vers_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "by_lang")
    write_partitioned(docs, path, ["lang"], max_records_per_file=10_000)
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    dirs = glob.glob(path + "/lang=*")
    assert {d.rsplit("=", 1)[1] for d in dirs} == langs
    for d in dirs:
        assert len(glob.glob(d + "/part-*.parquet")) == 1  # no small-files fanout
    back = read_back(spark, path)
    assert back.count() == docs.count()
    filtered = back.filter(F.col("lang") == "en")
    assert filtered.count() == docs.filter(F.col("lang") == "en").count()
    plan = audit.executed_plan(filtered)
    # pruning is visible in the scan's partition filters, and the scan must
    # not enumerate non-matching directories
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters", 1)[1][:200]


def _file_bbox_area(path: str, col_a: str, col_b: str) -> float:
    """Mean normalized (a-range × b-range) bounding-box area across the
    layout's parquet files, read from footer column statistics."""
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(path + "/part-*.parquet"))
    spans, boxes = {}, []
    for f in files:
        md = pq.ParquetFile(f).metadata
        lo, hi = {}, {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name not in (col_a, col_b) or col.statistics is None:
                    continue
                s = col.statistics
                lo[name] = min(lo.get(name, s.min), s.min)
                hi[name] = max(hi.get(name, s.max), s.max)
        boxes.append((lo, hi))
        for name in (col_a, col_b):
            spans.setdefault(name, [lo[name], hi[name]])
            spans[name][0] = min(spans[name][0], lo[name])
            spans[name][1] = max(spans[name][1], hi[name])

    def norm(v, name):
        lo_g, hi_g = spans[name]
        d = (hi_g - lo_g) or 1
        return (v - lo_g) / d if not hasattr(v, "timestamp") else (
            (v - lo_g).total_seconds() / ((hi_g - lo_g).total_seconds() or 1)
        )

    areas = [
        (norm(hi[col_a], col_a) - norm(lo[col_a], col_a))
        * (norm(hi[col_b], col_b) - norm(lo[col_b], col_b))
        for lo, hi in boxes
    ]
    return sum(areas) / len(areas)


def test_zorder_key_matches_python_morton(spark):
    """zorder_key ≡ an independent Python Morton encode over the same
    quantization: quantize each coordinate to 8 bits with the identical
    multiply-then-integer-divide, interleave bits (a even, b odd)."""
    from vers_spark.sources.layout import zorder_key
    import random

    rng = random.Random(7)
    rows = [(rng.randrange(0, 1000), rng.randrange(-500, 500)) for _ in range(200)]
    df = spark.createDataFrame(rows, ["a", "b"])
    bits = 8
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.withColumn(
            "z", zorder_key("a", "b", 0, 999, -500, 499, bits=bits)
        ).collect()
    }

    def quant(v, lo, hi):
        return (v - lo) * ((1 << bits) - 1) // max(hi - lo, 1)

    for (a, b), z in got.items():
        qa, qb = quant(a, 0, 999), quant(b, -500, 499)
        want = sum(
            (((qa >> i) & 1) << (2 * i)) + (((qb >> i) & 1) << (2 * i + 1))
            for i in range(bits)
        )
        assert z == want, (a, b, z, want)


def test_zorder_write_tightens_file_bounding_boxes(spark, sf_dir, tmp_path):
    """Z-order clustering on (user_id, ts) must shrink each file's footer
    min/max bounding box far below the naive layout's (which spans ~the
    whole domain per file) — the property file/row-group skipping relies
    on. Round-trip row-count preserved."""
    from vers_spark.sources.layout import write_zordered
    from vers_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    naive = str(tmp_path / "naive")
    ev.repartition(8).write.mode("overwrite").parquet(naive)
    z = str(tmp_path / "zorder")
    write_zordered(ev, z, "user_id", "unix_micros(ts)", num_files=8)

    assert spark.read.parquet(z).count() == ev.count()
    a_naive = _file_bbox_area(naive, "user_id", "ts")
    a_z = _file_bbox_area(z, "user_id", "ts")
    # naive round-robin files each span ~the full (user, time) domain
    assert a_naive > 0.5
    assert a_z < a_naive / 3
