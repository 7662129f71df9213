"""End-to-end RAG retrieval under the hard oracle gate: chunk → embed →
score → top-k, every stage engine-exact.

The embedder is feature hashing / random projection by hash (public
technique — "hashing trick", Weinberger et al. 2009): each token is
md5-hashed ONCE to a 60-bit base, and dimension d's feature is an AFFINE
universal hash of that base — ``((a_d·(h mod P) + b_d) mod P) mod 2001 −
1000`` — summed over the chunk's tokens. An INTEGER random projection, so
embeddings, dot-product scores, and the retrieval ranking are bit-identical
across engines (a float embedder would make the driver hash meaningless; a
real model slots into the same pipeline shape via mapInPandas at the embed
stage). One md5 per token — the 16 dims are integer arithmetic on the same
base, the exact trick functions/text.minhash_value uses (a per-dim md5 was
measured 20x superlinear at the 10x scale probe and rewritten to this).

The query is corpus-derived (the 3 most frequent tokens, count-desc/token-asc
— deterministic) and embedded by the SAME hash projection, computed
independently in each engine.

Scale shape: chunking is a generated explode (no shuffle), the 16 embedding
dims are 16 wide SUM aggregates over one (doc, chunk) shuffle (the
minhash-signatures discipline — no 16x dimension explode), the 1-row query
vector broadcasts, and the final top-k is TakeOrdered — the corpus is
scanned once and only (chunk, 16 longs) rows move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vers_spark.functions import text as TX
from vers_spark.functions.text import stable_hash60
from vers_spark.operators.text_analysis import CHUNK_SIZE, CHUNK_STRIDE, D_HASH60, D_TOKENS
from vers_spark.sources.tables import load_table

EMB_DIMS = 16
HASH_MOD = 2001  # feature values in [-1000, 1000]
TOP_K = 20
_COEFFS = TX.MINHASH_COEFFS[:EMB_DIMS]  # (a_d, b_d) affine pairs, P = HASH_PRIME


def _chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, chunk_id, chunk) — same window arithmetic as
    text_analysis.doc_chunk_windows, keeping the chunk text for embedding."""
    docs = load_table(spark, sf_dir, "documents")
    last_k = F.expr(f"(greatest(length(text), 1) - 1) div {CHUNK_STRIDE}")
    chunk = F.substring(F.col("text"), F.col("k").cast("int") * CHUNK_STRIDE + 1, CHUNK_SIZE)
    return docs.select(
        "doc_id", F.explode(F.sequence(F.lit(0).cast("long"), last_k)).alias("k"), "text"
    ).select(
        "doc_id",
        F.col("k").cast("long").alias("chunk_id"),
        chunk.alias("chunk"),
    )


def _features(base):
    """The EMB_DIMS signed integer features of one token's base hash."""
    return [
        (TX.minhash_value(base, a, b) % F.lit(HASH_MOD)) - F.lit(HASH_MOD // 2)
        for a, b in _COEFFS
    ]


def _embed(tokens: DataFrame, keys: list[str], hash_backend: str = "md5") -> DataFrame:
    """Σ-aggregate the per-token features into EMB_DIMS wide columns.

    ``hash_backend``: ``"md5"`` (default) is the cross-engine base hash the
    DuckDB oracle certifies; ``"xxhash64"`` is the DEPLOYMENT swap named in
    BASELINE.md's scaling table since round 2 — Spark's codegen'd 64-bit
    hash, ~5× cheaper per token, same embedding semantics (an affine family
    over a well-mixed base), but Spark-only, so queries using it trade the
    hash oracle for the recall/shape gates (tests/test_text.py probes the
    swap's scaling claim)."""
    if hash_backend == "md5":
        base = stable_hash60(F.col("token"))
    elif hash_backend == "xxhash64":
        base = F.abs(F.xxhash64(F.col("token")))
    else:
        raise ValueError(f"unknown hash_backend {hash_backend!r}")
    feats = _features(base)
    return tokens.groupBy(*keys).agg(
        *[F.sum(feats[d]).cast("long").alias(f"e{d}") for d in range(EMB_DIMS)]
    )


def rag_retrieve_chunks(
    spark: SparkSession, sf_dir: str, hash_backend: str = "md5"
) -> DataFrame:
    toks = F.split(F.trim(F.lower("chunk")), r"\s+")
    ct = (
        _chunks(spark, sf_dir)
        .select("doc_id", "chunk_id", F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
    )
    ce = _embed(ct, ["doc_id", "chunk_id"], hash_backend)
    qt = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("token"))
        .limit(3)
        .withColumn("_g", F.lit(1))
    )
    qe = _embed(qt, ["_g"], hash_backend).select(
        *[F.col(f"e{d}").alias(f"q{d}") for d in range(EMB_DIMS)]
    )
    score = sum(F.col(f"e{d}") * F.col(f"q{d}") for d in range(EMB_DIMS))
    scored = ce.crossJoin(F.broadcast(qe)).select(
        "doc_id", "chunk_id", score.cast("long").alias("score")
    )
    from pyspark.sql import Window as W

    # Global top-K via orderBy().limit() — TakeOrderedAndProject computes a
    # per-partition partial top-K and merges K·num_partitions rows on the
    # driver side, unlike a global row_number window which would sort EVERY
    # chunk score in one partition (the round-2 scale-killer: ~12x at the
    # 10x probe). The rank window then runs over the K survivors only.
    order = [F.desc("score"), F.asc("doc_id"), F.asc("chunk_id")]
    top = scored.orderBy(*order).limit(TOP_K)
    w = W.orderBy(*order)
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("doc_id", "chunk_id", "score", "rank")
    )


_D_CHUNKS = f"""(
    SELECT doc_id,
           CAST(k AS BIGINT) AS chunk_id,
           substr(text, CAST(k AS INT) * {CHUNK_STRIDE} + 1, {CHUNK_SIZE}) AS chunk
    FROM (SELECT doc_id, text,
                 unnest(generate_series(0, (greatest(length(text), 1) - 1) // {CHUNK_STRIDE})) AS k
          FROM documents)
)"""


def _d_features(base: str) -> list[str]:
    return [
        f"((({a} * (({base}) % {TX.HASH_PRIME}) + {b}) % {TX.HASH_PRIME}) % {HASH_MOD}) - {HASH_MOD // 2}"
        for a, b in _COEFFS
    ]


def _rag_sql() -> str:
    toks = D_TOKENS.format(t="chunk")
    dtoks = D_TOKENS.format(t="text")
    feats = _d_features("h")
    ce_sums = ", ".join(
        f"CAST(sum({feats[d]}) AS BIGINT) AS e{d}" for d in range(EMB_DIMS)
    )
    qe_sums = ", ".join(
        f"CAST(sum({feats[d]}) AS BIGINT) AS q{d}" for d in range(EMB_DIMS)
    )
    dot = " + ".join(f"ce.e{d} * qe.q{d}" for d in range(EMB_DIMS))
    return f"""
        WITH ct AS MATERIALIZED (
            SELECT doc_id, chunk_id, {D_HASH60.format(x="token")} AS h
            FROM (SELECT doc_id, chunk_id, unnest({toks}) AS token FROM {_D_CHUNKS})
            WHERE token <> ''
        ), ce AS MATERIALIZED (
            SELECT doc_id, chunk_id, {ce_sums} FROM ct GROUP BY doc_id, chunk_id
        ), qt AS MATERIALIZED (
            SELECT {D_HASH60.format(x="token")} AS h FROM (
                SELECT token, count(*) AS c
                FROM (SELECT unnest({dtoks}) AS token FROM documents)
                WHERE token <> '' GROUP BY token
            ) ORDER BY c DESC, token ASC LIMIT 3
        ), qe AS MATERIALIZED (
            SELECT {qe_sums} FROM qt
        ), scored AS MATERIALIZED (
            SELECT doc_id, chunk_id, CAST({dot} AS BIGINT) AS score
            FROM ce CROSS JOIN qe
        )
        SELECT doc_id, chunk_id, score, CAST(rank AS INT) AS rank FROM (
            SELECT doc_id, chunk_id, score,
                   row_number() OVER (ORDER BY score DESC, doc_id ASC, chunk_id ASC) AS rank
            FROM scored)
        WHERE rank <= {TOP_K}
    """


def rag_maxsim_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction (ColBERT-style MaxSim — Khattab & Zaharia 2020,
    public) rerank of the top-20 first-stage chunks: score(chunk) =
    Σ_{query token} max_{chunk token} ⟨emb(qtok), emb(ctok)⟩ over per-TOKEN
    hash embeddings. The two-stage shape is the production retrieval
    pattern: the cheap pooled dot product prunes the corpus to a shortlist,
    MaxSim only touches shortlist × query-token pairs. Integer end-to-end —
    the rerank's full ranking hash-matches the DuckDB twin."""
    shortlist = rag_retrieve_chunks(spark, sf_dir).select("doc_id", "chunk_id")
    toks = F.split(F.trim(F.lower("chunk")), r"\s+")
    ct = (
        _chunks(spark, sf_dir)
        .join(F.broadcast(shortlist), ["doc_id", "chunk_id"])
        .select("doc_id", "chunk_id", F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
    )
    cbase = stable_hash60(F.col("token"))
    cfeats = _features(cbase)
    cte = ct.select(
        "doc_id", "chunk_id", *[cfeats[d].alias(f"e{d}") for d in range(EMB_DIMS)]
    )
    qt = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("token"))
        .limit(3)
    )
    qbase = stable_hash60(F.col("token"))
    qfeats = _features(qbase)
    qte = qt.select(
        F.col("token").alias("qtok"), *[qfeats[d].alias(f"q{d}") for d in range(EMB_DIMS)]
    )
    dot = sum(F.col(f"e{d}") * F.col(f"q{d}") for d in range(EMB_DIMS))
    per_pair = cte.crossJoin(F.broadcast(qte)).select(
        "doc_id", "chunk_id", "qtok", dot.cast("long").alias("tokdot")
    )
    maxsim = (
        per_pair.groupBy("doc_id", "chunk_id", "qtok")
        .agg(F.max("tokdot").alias("mx"))
        .groupBy("doc_id", "chunk_id")
        .agg(F.sum("mx").cast("long").alias("maxsim"))
    )
    from pyspark.sql import Window as W

    w = W.orderBy(F.desc("maxsim"), F.asc("doc_id"), F.asc("chunk_id"))
    return (
        maxsim.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("doc_id", "chunk_id", "maxsim", "rank")
    )


def _rag_maxsim_sql() -> str:
    toks = D_TOKENS.format(t="chunk")
    dtoks = D_TOKENS.format(t="text")
    feats = _d_features("h")
    ce_cols = ", ".join(f"{feats[d]} AS e{d}" for d in range(EMB_DIMS))
    qe_cols = ", ".join(f"{feats[d]} AS q{d}" for d in range(EMB_DIMS))
    dot = " + ".join(f"cte.e{d} * qte.q{d}" for d in range(EMB_DIMS))
    first_stage = _rag_sql()
    return f"""
        WITH shortlist AS MATERIALIZED (
            SELECT doc_id, chunk_id FROM ({first_stage})
        ), cte AS MATERIALIZED (
            SELECT doc_id, chunk_id, {ce_cols} FROM (
                SELECT doc_id, chunk_id, {D_HASH60.format(x="token")} AS h
                FROM (SELECT c.doc_id, c.chunk_id, unnest({toks}) AS token
                      FROM {_D_CHUNKS} c JOIN shortlist USING (doc_id, chunk_id))
                WHERE token <> '')
        ), qte AS MATERIALIZED (
            SELECT qtok, {qe_cols} FROM (
                SELECT qtok, {D_HASH60.format(x="qtok")} AS h FROM (
                    SELECT token AS qtok, count(*) AS c
                    FROM (SELECT unnest({dtoks}) AS token FROM documents)
                    WHERE token <> '' GROUP BY token
                    ORDER BY c DESC, qtok ASC LIMIT 3))
        ), ms AS MATERIALIZED (
            SELECT doc_id, chunk_id, CAST(sum(mx) AS BIGINT) AS maxsim FROM (
                SELECT doc_id, chunk_id, qtok, max({dot}) AS mx
                FROM cte CROSS JOIN qte
                GROUP BY doc_id, chunk_id, qtok)
            GROUP BY doc_id, chunk_id
        )
        SELECT doc_id, chunk_id, maxsim, CAST(row_number() OVER (
            ORDER BY maxsim DESC, doc_id ASC, chunk_id ASC) AS INT) AS rank
        FROM ms
    """


# ----------------------------------------------------------------- MMR
# Maximal Marginal Relevance (Carbonell & Goldstein 1998): greedy
# diversified selection from the first-stage shortlist —
#   next = argmax_{c ∈ C\S} [ λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s) ]
# λ = 0.7 as the integer weights 7 and 3 (the ×10-scaled objective is the
# same argmax), rel = the first-stage query dot product, sim = the raw
# chunk⋅chunk integer inner product — every score is a BIGINT, so the
# greedy trajectory is bit-identical across engines and the k unrolled
# selection rounds can be stated exactly in DuckDB SQL.
MMR_K = 10
MMR_W_REL = 7  # λ·10
MMR_W_DIV = 3  # (1−λ)·10


def _mmr_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-stage top-20 shortlist WITH its pooled integer embeddings —
    the same corpus scan / broadcast-query / TakeOrdered shape as
    rag_retrieve_chunks, keeping e0..e15 for the rerank's chunk-chunk
    similarities."""
    toks = F.split(F.trim(F.lower("chunk")), r"\s+")
    ct = (
        _chunks(spark, sf_dir)
        .select("doc_id", "chunk_id", F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
    )
    ce = _embed(ct, ["doc_id", "chunk_id"])
    qt = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("token"))
        .limit(3)
        .withColumn("_g", F.lit(1))
    )
    qe = _embed(qt, ["_g"]).select(
        *[F.col(f"e{d}").alias(f"q{d}") for d in range(EMB_DIMS)]
    )
    score = sum(F.col(f"e{d}") * F.col(f"q{d}") for d in range(EMB_DIMS))
    scored = ce.crossJoin(F.broadcast(qe)).select(
        "doc_id",
        "chunk_id",
        *[F.col(f"e{d}") for d in range(EMB_DIMS)],
        score.cast("long").alias("rel"),
    )
    return scored.orderBy(
        F.desc("rel"), F.asc("doc_id"), F.asc("chunk_id")
    ).limit(TOP_K)


def rag_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-10 over the first-stage top-20. Scale shape:
    candidate generation is the distributed stage (one corpus scan,
    TakeOrderedAndProject top-20); the greedy selection itself is
    O(k·|C|·dims) on TWENTY rows — driver-local BY DESIGN, exactly like the
    k-center seeding loop (a shortlist never grows with the corpus, only
    with k). Returns (doc_id, chunk_id, rel, max_sim, mmr, sel_rank):
    max_sim is the selected item's similarity to the already-picked set at
    the moment of ITS selection (0 for the first pick), mmr its winning
    objective value. The DuckDB twin states the identical k greedy rounds
    as unrolled single-row CTEs — a FULL trajectory hash oracle, not just a
    membership check."""
    cand = _mmr_candidates(spark, sf_dir).collect()
    rows = [
        (
            r["doc_id"],
            r["chunk_id"],
            [r[f"e{d}"] for d in range(EMB_DIMS)],
            r["rel"],
        )
        for r in cand
    ]
    selected: list[tuple] = []
    chosen: set[tuple] = set()
    out: list[tuple] = []
    for step in range(1, min(MMR_K, len(rows)) + 1):
        best = None
        for doc_id, chunk_id, emb, rel in rows:
            if (doc_id, chunk_id) in chosen:
                continue
            msim = max(
                (sum(a * b for a, b in zip(emb, s_emb)) for _, _, s_emb, _ in selected),
                default=0,
            )
            mmr = MMR_W_REL * rel - MMR_W_DIV * msim
            key = (-mmr, doc_id, chunk_id)
            if best is None or key < best[0]:
                best = (key, (doc_id, chunk_id, emb, rel), msim, mmr)
        _, pick, msim, mmr = best
        selected.append(pick)
        chosen.add((pick[0], pick[1]))
        out.append((pick[0], pick[1], pick[3], msim, mmr, step))
    return spark.createDataFrame(
        out,
        "doc_id long, chunk_id long, rel long, max_sim long, mmr long, sel_rank int",
    )


def _mmr_sql() -> str:
    feats = _d_features("h")
    toks = D_TOKENS.format(t="chunk")
    dtoks = D_TOKENS.format(t="text")
    ce_sums = ", ".join(
        f"CAST(sum({feats[d]}) AS BIGINT) AS e{d}" for d in range(EMB_DIMS)
    )
    qe_sums = ", ".join(
        f"CAST(sum({feats[d]}) AS BIGINT) AS q{d}" for d in range(EMB_DIMS)
    )
    dot_q = " + ".join(f"ce.e{d} * qe.q{d}" for d in range(EMB_DIMS))
    parts = [
        f"""
        ct AS MATERIALIZED (
            SELECT doc_id, chunk_id, {D_HASH60.format(x="token")} AS h
            FROM (SELECT doc_id, chunk_id, unnest({toks}) AS token FROM {_D_CHUNKS})
            WHERE token <> ''
        ), ce AS MATERIALIZED (
            SELECT doc_id, chunk_id, {ce_sums} FROM ct GROUP BY doc_id, chunk_id
        ), qt AS MATERIALIZED (
            SELECT {D_HASH60.format(x="token")} AS h FROM (
                SELECT token, count(*) AS c
                FROM (SELECT unnest({dtoks}) AS token FROM documents)
                WHERE token <> '' GROUP BY token
            ) ORDER BY c DESC, token ASC LIMIT 3
        ), qe AS MATERIALIZED (
            SELECT {qe_sums} FROM qt
        ), cand AS MATERIALIZED (
            SELECT ce.*, CAST({dot_q} AS BIGINT) AS rel
            FROM ce CROSS JOIN qe
            ORDER BY rel DESC, doc_id ASC, chunk_id ASC LIMIT {TOP_K}
        )"""
    ]
    for n in range(1, MMR_K + 1):
        prev = [f"s{j}" for j in range(1, n)]
        if not prev:
            parts.append(
                f"""s1 AS MATERIALIZED (
                SELECT c.*, CAST(0 AS BIGINT) AS max_sim,
                       CAST({MMR_W_REL} * c.rel AS BIGINT) AS mmr
                FROM cand c
                ORDER BY mmr DESC, c.doc_id ASC, c.chunk_id ASC LIMIT 1
            )"""
            )
            continue
        dots = [
            "(" + " + ".join(f"c.e{d} * {p}.e{d}" for d in range(EMB_DIMS)) + ")"
            for p in prev
        ]
        msim = dots[0] if len(dots) == 1 else f"greatest({', '.join(dots)})"
        excl = " AND ".join(
            f"NOT (c.doc_id = {p}.doc_id AND c.chunk_id = {p}.chunk_id)" for p in prev
        )
        parts.append(
            f"""s{n} AS MATERIALIZED (
            SELECT * FROM (
                SELECT c.*, CAST({msim} AS BIGINT) AS max_sim,
                       CAST({MMR_W_REL} * c.rel - {MMR_W_DIV} * ({msim}) AS BIGINT) AS mmr
                FROM cand c, {', '.join(prev)}
                WHERE {excl}
            ) ORDER BY mmr DESC, doc_id ASC, chunk_id ASC LIMIT 1
        )"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT doc_id, chunk_id, rel, max_sim, mmr, {n} AS n FROM s{n}"
        for n in range(1, MMR_K + 1)
    )
    return f"""
        WITH {', '.join(parts)}
        SELECT doc_id, chunk_id, rel, max_sim, mmr, CAST(n AS INT) AS sel_rank
        FROM ({union}) ORDER BY n
    """


# ---------------------------------------------------------------- BM25
# Okapi BM25 (Robertson & Walker 1994) lexical retrieval, engine-exact.
# ln() is not correctly-rounded across engines, so the idf is the RAW
# Robertson ratio (N − df + 0.5)/(df + 0.5) without the log — a monotone
# transform, so rankings are BM25 rankings (same discipline as
# doc_tfidf_topk's rational idf). Every constant is computed ONCE in
# Python and embedded as the identical literal in both engines; the
# per-document score is a fixed-order row expression (no float aggregate),
# so the doubles hash-match.
BM25_TERMS = ("spark", "vector", "window", "merge")
BM25_K1 = 1.2
BM25_B = 0.75
_BM25_1MB = 1.0 - BM25_B
_BM25_K1P1 = 1.0 + BM25_K1


def _tf(toks, term: str):
    # NB: a single-parameter lambda is required — F.filter dispatches on the
    # lambda's arity, and a second (defaulted) parameter would receive the
    # array INDEX column
    return F.size(F.filter(toks, lambda x: x == F.lit(term)))


def doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 documents for a fixed 4-term query. Scale shape: tf and
    dl are array-side per-row expressions (ONE corpus scan, no (doc, term)
    explode); N, Σdl, and the 4 dfs are one combined 1-row aggregate that
    broadcasts back; scoring is row-local; the global top-20 is
    orderBy+limit → TakeOrderedAndProject (per-partition partial top-k,
    never a full sort); the rank window runs over the 20 survivors only.
    At 100 TB nothing shuffles except 20-row blocks and one 1-row stats
    frame.

    The corpus scan is cpu_spread first (r15): the tokenize+5-term-count
    pipeline is CPU-bound over a byte-tiny single-split scan (profiled as
    a 0.52 s single-task checkpoint stage at sf0.1); the gate keeps
    real-scale scans untouched."""
    from pyspark.sql import Window as W

    from vers_spark.functions.spread import cpu_spread

    docs = cpu_spread(load_table(spark, sf_dir, "documents"))
    toks = TX.ws_tokens(F.col("text"))
    # per feeds BOTH the 1-row stats aggregate (a broadcast build side,
    # which can never reuse the probe side's work) and the scoring scan —
    # without materialization the tokenize+5-count pipeline runs twice
    # (r14 plan: 2 corpus Scan parquet -> 1). The frame is corpus-rows but
    # only 6 numeric columns wide, so the checkpoint is narrow.
    per = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("dl"),
        *[_tf(toks, t).cast("long").alias(f"tf_{t}") for t in BM25_TERMS],
    ).localCheckpoint(eager=True)
    stats = per.agg(
        F.sum("dl").cast("long").alias("sum_dl"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long")).cast("long").alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )
    s = per.crossJoin(F.broadcast(stats))
    n_d = F.col("n_docs").cast("double")
    ratio = (F.col("dl").cast("double") * n_d) / F.col("sum_dl").cast("double")

    def term_score(t: str):
        tf_d = F.col(f"tf_{t}").cast("double")
        df_d = F.col(f"df_{t}").cast("double")
        idf = ((n_d - df_d) + F.lit(0.5)) / (df_d + F.lit(0.5))
        norm = tf_d + (F.lit(BM25_K1) * (F.lit(_BM25_1MB) + (F.lit(BM25_B) * ratio)))
        return (idf * (tf_d * F.lit(_BM25_K1P1))) / norm

    score = term_score(BM25_TERMS[0])
    for t in BM25_TERMS[1:]:
        score = score + term_score(t)
    top = (
        s.select("doc_id", "dl", *[f"tf_{t}" for t in BM25_TERMS], score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(TOP_K)
    )
    w = W.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int")).orderBy("rank")


def _bm25_sql() -> str:
    toks = D_TOKENS.format(t="text")
    tf_cols = ", ".join(
        f"CAST(len(list_filter({toks}, x -> x = '{t}')) AS BIGINT) AS tf_{t}"
        for t in BM25_TERMS
    )
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}"
        for t in BM25_TERMS
    )
    ratio = "((CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE)) / CAST(sum_dl AS DOUBLE))"

    def ts(t: str) -> str:
        tf = f"CAST(tf_{t} AS DOUBLE)"
        dfv = f"CAST(df_{t} AS DOUBLE)"
        idf = f"(((CAST(n_docs AS DOUBLE) - {dfv}) + 0.5) / ({dfv} + 0.5))"
        norm = f"({tf} + ({BM25_K1!r} * ({_BM25_1MB!r} + ({BM25_B!r} * {ratio}))))"
        return f"(({idf} * ({tf} * {_BM25_K1P1!r})) / {norm})"

    score = ts(BM25_TERMS[0])
    for t in BM25_TERMS[1:]:
        score = f"({score} + {ts(t)})"
    tf_list = ", ".join(f"tf_{t}" for t in BM25_TERMS)
    return f"""
        WITH per AS (SELECT doc_id, CAST(len({toks}) AS BIGINT) AS dl, {tf_cols}
                     FROM documents),
        stats AS (SELECT CAST(sum(dl) AS BIGINT) AS sum_dl,
                         CAST(count(*) AS BIGINT) AS n_docs, {df_cols}
                  FROM per)
        SELECT doc_id, dl, {tf_list}, score,
               CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank
        FROM (SELECT p.doc_id, p.dl, {tf_list}, {score} AS score
              FROM per p CROSS JOIN stats)
        ORDER BY score DESC, doc_id ASC LIMIT {TOP_K}
    """


QUERIES = {
    "rag_retrieve_chunks": rag_retrieve_chunks,
    "rag_maxsim_rerank": rag_maxsim_rerank,
    "rag_mmr_rerank": rag_mmr_rerank,
    "doc_bm25_topk": doc_bm25_topk,
}
ORACLE_SQL = {
    "rag_retrieve_chunks": _rag_sql(),
    "rag_maxsim_rerank": _rag_maxsim_sql(),
    "rag_mmr_rerank": _mmr_sql(),
    "doc_bm25_topk": _bm25_sql(),
}
