"""Near-duplicate detection for text corpora: MinHash+LSH banding, SimHash,
exact n-gram Jaccard join (SURVEY.md §2.E; training-data dedup north star).

All hashing uses the cross-engine deterministic md5-fold (functions.text), so
even the MinHash pipeline is DuckDB-oracle-checkable end to end.

Scale shapes:
- MinHash signatures: one explode + ONE groupBy with 16 min-aggregates
  (map-side combine), then an unpivot — no 16× row blowup.
- Band join: candidates only where a 4-hash band collides; the self-join keys
  on (band_id, band_key) — skew handled by AQE; verification joins are
  candidate-sized, not corpus².
- SimHash banding: 4 × 8-bit chunks; pigeonhole guarantees every pair with
  hamming ≤ 3 shares at least one chunk, so banding loses nothing.
- n-gram Jaccard: inverted-index self-join on shingle; exact.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vers_spark.functions import text as TX

BAND_SIZE = 4
BAND_POWERS = [1, 31, 961, 29791]  # weight of position h_idx % 4 inside a band
SIMHASH_BITS = 32
SIMHASH_CHUNKS = 4


def _cpu_spread(df: DataFrame) -> DataFrame:
    """Fan a small-in-bytes but CPU-heavy input across all cores: file splits
    and AQE coalescing are sized by BYTES, which leaves md5/regex-bound
    stages running on 1-2 partitions. One tiny shuffle buys full parallelism."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def shingle_array(
    docs: DataFrame, n_shingle: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, shingles array<string>) — DISTINCT word n-gram shingles per
    document, computed ROW-LOCALLY (``array_distinct`` over the shingle
    window transform). Per-doc dedup never needs cross-row data, so the
    explode + global ``dropDuplicates`` shuffle the old shape paid is pure
    waste — at 100 TB this stage is embarrassingly parallel, zero exchanges
    (guide §2.4: remove shuffles outright). Docs with NULL text yield no
    row (the explode path dropped them implicitly). The null filter sits on
    the SOURCE column, not the computed array: a filter on the projected
    alias would be pushed below the projection with the expression
    substituted in, evaluating the whole tokenize+shingle+distinct chain
    twice per row (the guide §4.4 duplication, with built-ins) — and
    ``shingles`` is null exactly iff ``text`` is null (ws_tokens is a
    split/trim/lower chain, word_shingles a null-propagating transform)."""
    toks = TX.ws_tokens(F.col(text_col))
    return (
        _cpu_spread(docs)
        .filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            F.array_distinct(TX.word_shingles(toks, n_shingle)).alias("shingles"),
        )
    )


def shingle_sets(docs: DataFrame, n_shingle: int = 3, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) — DISTINCT word n-gram shingles per document
    (exploded view of :func:`shingle_array`; same rows as the historical
    explode + dropDuplicates shape, without its shuffle)."""
    return shingle_array(docs, n_shingle, id_col, text_col).select(
        "doc_id", F.explode("shingles").alias("shingle")
    )


def _sig_wide(sets: DataFrame, num_hashes: int, hash_backend: str) -> DataFrame:
    """(doc_id, h0..h{n-1}) MinHash signature table from the row-local
    shingle arrays: explode (NO dedup shuffle — the arrays are already
    distinct) then ONE groupBy(doc_id) whose 16 min-aggregates share the
    scalar base-hash subexpression under whole-stage codegen.

    Deliberately NOT a row-local array_min projection: higher-order-function
    lambdas are CodegenFallback with no subexpression elimination, and
    CollapseProject inlines a struct-of-16-lambdas once per field reference
    — measured ~5× slower end-to-end than this aggregate shape (the md5
    transform re-evaluated per referencing expression). The aggregate keys
    on doc_id with map-side partial combine, so the exchange carries one
    17-column row per document — the same bytes the projection shape would
    have shuffled into the band join anyway."""
    sh = sets.select("doc_id", F.explode("shingles").alias("shingle"))
    base = TX.base_hash(F.col("shingle"), hash_backend)
    return sh.groupBy("doc_id").agg(
        *[
            F.min(TX.minhash_value(base, a, b)).alias(f"h{i}")
            for i, (a, b) in enumerate(TX.MINHASH_COEFFS[:num_hashes])
        ]
    )


def minhash_signatures(
    docs: DataFrame,
    n_shingle: int = 3,
    num_hashes: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_backend: str = "md5",
) -> DataFrame:
    """(doc_id, h_idx, min_hash): num_hashes affine hashes over the shingle
    set, one shuffle (16 min-aggs in a single groupBy, then unpivot).

    ``hash_backend``: "md5" (oracle-certified default) | "xxhash64" (the
    100 TB deployment swap — see functions.text.base_hash).

    Shuffle discipline: per-doc shingle dedup is row-local (array_distinct,
    :func:`shingle_array`) so the historical global dropDuplicates exchange
    is gone; the one remaining shuffle is the signature aggregate itself
    (``_sig_wide`` — see its docstring for why an aggregate, not a
    row-local array_min projection). Values are bit-identical (same base
    hash, same affine arithmetic, min over the same distinct set)."""
    wide = _sig_wide(
        shingle_array(docs, n_shingle, id_col, text_col), num_hashes, hash_backend
    )
    stack = ", ".join(f"{i}, h{i}" for i in range(num_hashes))
    return wide.selectExpr(
        "doc_id", f"stack({num_hashes}, {stack}) as (h_idx, min_hash)"
    ).select("doc_id", F.col("h_idx").cast("int").alias("h_idx"), "min_hash")


def minhash_signatures_from_shingles(
    sh: DataFrame, num_hashes: int = 16, hash_backend: str = "md5"
) -> DataFrame:
    base = TX.base_hash(F.col("shingle"), hash_backend)
    aggs = [
        F.min(TX.minhash_value(base, a, b)).alias(f"h{i}")
        for i, (a, b) in enumerate(TX.MINHASH_COEFFS[:num_hashes])
    ]
    wide = sh.groupBy("doc_id").agg(*aggs)
    stack = ", ".join(f"{i}, h{i}" for i in range(num_hashes))
    return wide.selectExpr(
        "doc_id", f"stack({num_hashes}, {stack}) as (h_idx, min_hash)"
    ).select("doc_id", F.col("h_idx").cast("int").alias("h_idx"), "min_hash")


def minhash_bands(sigs: DataFrame, band_size: int = BAND_SIZE) -> DataFrame:
    """(doc_id, band_id, band_key): position-weighted sum per band — exact
    integer arithmetic, order-independent, identical in the SQL twin."""
    weight = F.element_at(
        F.array(*[F.lit(p) for p in BAND_POWERS[:band_size]]), (F.col("h_idx") % band_size) + 1
    )
    return (
        sigs.withColumn("band_id", F.expr(f"h_idx div {band_size}"))
        .groupBy("doc_id", "band_id")
        .agg(F.sum(F.col("min_hash") * weight).alias("band_key"))
    )


def band_candidates(bands: DataFrame, max_bucket: int | None = None) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs colliding in at least one band.

    ``max_bucket`` is the web-scale skew guard: a degenerate band key (empty
    or boilerplate documents all sharing one band) makes the self-join
    quadratic in that bucket's size. Buckets larger than ``max_bucket`` are
    DROPPED — a band shared by thousands of documents carries almost no
    near-dup signal (its members collide on 4 hashes by being generic, not
    similar), and every real pair inside it still has 3 other bands to
    collide in. Default None keeps the join exact (the oracle-checked
    configuration); at 100 TB you set it (e.g. 10_000) and record the dropped
    bucket count."""
    if max_bucket is not None:
        sizes = bands.groupBy("band_id", "band_key").agg(F.count(F.lit(1)).alias("_bsz"))
        bands = bands.join(
            sizes.filter(F.col("_bsz") <= max_bucket).drop("_bsz"),
            ["band_id", "band_key"],
            "left_semi",
        )
    a = bands.select(F.col("doc_id").alias("doc_a"), "band_id", "band_key")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band_id", "band_key")
    return (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates()
    )


def jaccard_verify(candidates: DataFrame, sets: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard for candidate pairs only, over ROW-LOCAL shingle
    arrays (``sets`` = :func:`shingle_array` output): two equi-joins attach
    each side's array, then ``|A ∩ B|`` is one ``array_intersect`` per
    pair — replacing the historical 3-shuffle chain (join by doc_a, join by
    (doc_b, shingle), re-aggregate per pair) with per-pair local work. The
    candidate table is tiny relative to the corpus (banded/pre-filtered),
    so AQE broadcast-joins it and the corpus side is never shuffled.
    Arrays are distinct by construction, so size/intersect counts equal the
    old exploded-row counts exactly; the double arithmetic is unchanged."""
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("_sha"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("_shb"))
    n_inter = F.size(F.array_intersect("_sha", "_shb"))
    return (
        candidates.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("n_inter", n_inter)
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.size("_sha") + F.size("_shb") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_neardup_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n_shingle: int = 3,
    num_hashes: int = 16,
    max_bucket: int | None = None,
    hash_backend: str = "md5",
) -> DataFrame:
    """Full MinHash-LSH dedup pipeline: signatures → bands → candidate pairs →
    exact-Jaccard verification.

    Stage-count discipline (same result as the composable pieces above,
    fewer shuffles): per-doc shingle dedup is row-local (array_distinct —
    the old global dropDuplicates exchange is gone), signatures are ONE
    codegen'd aggregate (see ``_sig_wide``), band keys are row-local
    expressions over the wide signature row, and verification attaches the
    per-doc shingle arrays with two joins and intersects locally instead of
    re-shuffling exploded shingle rows (guide §2.4)."""
    # the shingle-array table feeds signatures AND both sides of the
    # verification join — materialize it once (at 100 TB this would be a
    # persisted Parquet intermediate). localCheckpoint, not .cache(): the
    # columnar cache builder does a per-value UnsafeArrayData copy for
    # nested array<string> columns, measured ~20% slower end-to-end than
    # storing the task outputs as serialized rows (r14 variants study,
    # tools/r14_minhash_variants.py; no-materialization is 4× worse — the
    # md5-bound chain would run once per consumer).
    sets = shingle_array(docs, n_shingle).localCheckpoint(eager=True)
    wide = _sig_wide(sets, num_hashes, hash_backend)
    n_bands = num_hashes // BAND_SIZE
    band_structs = [
        F.struct(
            F.lit(j).alias("band_id"),
            sum(
                F.col(f"h{j * BAND_SIZE + k}") * F.lit(BAND_POWERS[k])
                for k in range(BAND_SIZE)
            ).alias("band_key"),
        )
        for j in range(n_bands)
    ]
    bands = wide.select("doc_id", F.explode(F.array(*band_structs)).alias("b")).select(
        "doc_id", "b.band_id", "b.band_key"
    )
    cands = band_candidates(bands, max_bucket=max_bucket)
    return jaccard_verify(cands, sets, threshold)


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.8, n_shingle: int = 3) -> DataFrame:
    """EXACT n-gram Jaccard similarity join: inverted-index self-join on
    shingle (no hashing, no misses)."""
    sets = shingle_array(docs, n_shingle).localCheckpoint(eager=True)
    sh = sets.select("doc_id", F.explode("shingles").alias("shingle"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    cands = (
        sa.join(sb, "shingle").filter(F.col("doc_a") < F.col("doc_b")).select("doc_a", "doc_b").dropDuplicates()
    )
    return jaccard_verify(cands, sets, threshold)


def ngram_jaccard_pairs_prefix(
    docs: DataFrame, threshold: float = 0.8, n_shingle: int = 3
) -> DataFrame:
    """EXACT Jaccard join via PREFIX FILTERING (SSJoin/ppjoin principle) —
    the scale path for the inverted-index self-join: under any global token
    order, two sets with J ≥ t must share a token within their first
    ``|S| − ⌈t·|S|⌉ + 1`` tokens (if all common tokens sat in A's last
    ⌈t·|A|⌉ − 1 positions, then |A∩B| < t·|A| ≤ t·|∪| — contradiction). So
    only PREFIX tokens are indexed: with t=0.8 that is ~20% of each set,
    and because the order is rarest-first (ascending document frequency),
    the indexed tokens are precisely the ones with the shortest posting
    lists — the join's candidate volume drops superlinearly, the
    verification step stays exact, and the result PROVABLY EQUALS the full
    inverted-index join (same DuckDB oracle, equality also test-gated)."""
    from pyspark.sql import Window as W

    sets = shingle_array(docs, n_shingle).localCheckpoint(eager=True)
    sh = sets.select(
        "doc_id", F.size("shingles").alias("_n"), F.explode("shingles").alias("shingle")
    )
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    w = W.partitionBy("doc_id").orderBy(F.asc("_df"), F.asc("shingle"))
    pref = (
        sh.join(dfreq, "shingle")
        .withColumn("_pos", F.row_number().over(w))
        .filter(
            F.col("_pos")
            <= F.col("_n") - F.ceil(F.lit(threshold) * F.col("_n")) + F.lit(1)
        )
        .select("doc_id", "shingle")
    )
    pa = pref.select(F.col("doc_id").alias("doc_a"), "shingle")
    pb = pref.select(F.col("doc_id").alias("doc_b"), "shingle")
    cands = (
        pa.join(pb, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates()
    )
    return jaccard_verify(cands, sets, threshold)


def mllib_minhash_exactdup_pairs(
    docs: DataFrame,
    n_shingle: int = 3,
    num_hash_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Documented MLlib fast path: MinHashLSH approxSimilarityJoin over
    CountVectorizer'd shingle sets, threshold = Jaccard distance 0 — i.e.
    pairs with IDENTICAL shingle sets. Identical sets hash identically in
    every table, so the result provably equals the exact-Jaccard=1 join.
    (CountVectorizer keeps features exact; at 100 TB you'd trade its global
    vocabulary for HashingTF and accept a ~n/2^20 collision probability.)"""
    from pyspark.ml.feature import CountVectorizer
    from pyspark.ml.feature import MinHashLSH

    sh = shingle_sets(docs, n_shingle)
    as_list = sh.groupBy("doc_id").agg(F.collect_list("shingle").alias("shingles"))
    cv = CountVectorizer(inputCol="shingles", outputCol="features", binary=True).fit(as_list)
    feats = cv.transform(as_list).select("doc_id", "features")
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed
    ).fit(feats)
    # approxSimilarityJoin's threshold is STRICT (<), so ask for < 0.5 and
    # keep only exact matches (jaccard distance 0) afterwards
    joined = model.approxSimilarityJoin(feats, feats, 0.5, distCol="jdist")
    return (
        joined.select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            (F.lit(1.0) - F.col("jdist")).alias("jaccard"),
        )
        .filter((F.col("doc_a") < F.col("doc_b")) & (F.col("jaccard") >= 1.0))
    )


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_backend: str = "md5",
) -> DataFrame:
    """(doc_id, simhash): 32-bit SimHash over whitespace tokens WITH
    multiplicity — per-bit ±1 vote weighted by term frequency, bit set iff
    the vote sum is strictly positive. ``hash_backend``: see
    functions.text.base_hash (md5 = oracle path, xxhash64 = deployment)."""
    toks = _cpu_spread(docs).select(
        F.col(id_col).alias("doc_id"), F.explode(TX.ws_tokens(F.col(text_col))).alias("t")
    )
    hv = TX.base_hash(F.col("t"), hash_backend)
    votes = [
        F.sum(
            F.when(F.shiftright(hv, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(SIMHASH_BITS)
    ]
    wide = toks.groupBy("doc_id").agg(*votes)
    sim = reduce(
        lambda acc, b: acc
        + F.when(F.col(f"b{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long")),
        range(SIMHASH_BITS),
        F.lit(0).cast("long"),
    )
    return wide.select("doc_id", sim.alias("simhash"))


def simhash_neardup_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    max_bucket: int | None = None,
    hash_backend: str = "md5",
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, banded into 4 × 8-bit
    chunks (pigeonhole-complete for hamming ≤ 3), verified exactly.

    ``max_bucket``: same skew guard as :func:`band_candidates` — chunk values
    shared by more than ``max_bucket`` documents are dropped before the
    self-join (default None = exact, the oracle configuration)."""
    # the signature table feeds BOTH sides of the banded self-join (the
    # build side is a BroadcastExchange, which can never reuse the probe
    # side's shuffle), so without materialization the tokenize + 32-vote
    # aggregate runs twice (r14 plan: two full signature pipelines).
    # Materialize once — 2 longs/doc, the shingle-frame discipline.
    sim = simhash(docs, hash_backend=hash_backend).localCheckpoint(eager=True)
    chunks = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_id"),
                        F.shiftright("simhash", 8 * c).bitwiseAND(F.lit(255)).alias("chunk_val"),
                    )
                    for c in range(SIMHASH_CHUNKS)
                ]
            )
        ).alias("ch"),
    ).select("doc_id", "simhash", "ch.chunk_id", "ch.chunk_val")
    if max_bucket is not None:
        sizes = chunks.groupBy("chunk_id", "chunk_val").agg(F.count(F.lit(1)).alias("_bsz"))
        chunks = chunks.join(
            sizes.filter(F.col("_bsz") <= max_bucket).drop("_bsz"),
            ["chunk_id", "chunk_val"],
            "left_semi",
        )
    a = chunks.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"), "chunk_id", "chunk_val"
    )
    b = chunks.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"), "chunk_id", "chunk_val"
    )
    # Verify BEFORE the dedup exchange (r15): hamming is row-local
    # (bit_count of xor), so filtering candidate pairs down to the ≤
    # max_hamming survivors on the join's map side commutes with the
    # (doc_a, doc_b) dropDuplicates — and the dedup shuffle then carries
    # only true near-dup pairs instead of every banded collision (profiled
    # 53 MB shuffle write at sf0.1 with the old order — candidates
    # colliding in several chunks were shuffled once per collision with
    # both 8-byte signatures aboard). Same output rows: duplicates agree
    # on hamming, and dedup-then-filter ≡ filter-then-dedup for a
    # row-local predicate.
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        a.join(b, ["chunk_id", "chunk_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .dropDuplicates(["doc_a", "doc_b"])
    )


def containment_pairs(
    docs: DataFrame, threshold: float = 0.9, n_shingle: int = 3
) -> DataFrame:
    """ASYMMETRIC near-dup detection — shingle-set CONTAINMENT
    c(A→B) = |S(A) ∩ S(B)| / |S(A)| (Broder 1997's resemblance/containment
    pair, public): catches "B = A + appended boilerplate" pairs whose
    symmetric Jaccard falls below any sane threshold because the tail
    inflates the union. Emits (doc_small, doc_big, containment) for ordered
    pairs with |S(small)| ≤ |S(big)| (ties by id), c ≥ threshold.

    Shape: inverted-index self-join on shingle (exact; the banded-MinHash
    path is the candidate generator at 100 TB — superset detection also has
    a one-sided MinHash bound |A∩B|/|A| via asymmetric signatures), then a
    containment filter on integer intersection counts — the division
    n_inter/|A| is one exact f64 op, engine-identical."""
    sets = shingle_array(docs, n_shingle).localCheckpoint(eager=True)
    sh = sets.select("doc_id", F.explode("shingles").alias("shingle"))
    sizes = sets.select("doc_id", F.size("shingles").cast("long").alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        sa.join(sb, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    wsz = (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"),
            "doc_a",
        ).join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"),
            "doc_b",
        )
    )
    small_first = F.col("n_a") < F.col("n_b")
    tie = (F.col("n_a") == F.col("n_b")) & (F.col("doc_a") < F.col("doc_b"))
    doc_small = F.when(small_first | tie, F.col("doc_a")).otherwise(F.col("doc_b"))
    doc_big = F.when(small_first | tie, F.col("doc_b")).otherwise(F.col("doc_a"))
    n_small = F.least("n_a", "n_b")
    return (
        wsz.select(
            doc_small.alias("doc_small"),
            doc_big.alias("doc_big"),
            (F.col("n_inter").cast("double") / n_small.cast("double")).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )
