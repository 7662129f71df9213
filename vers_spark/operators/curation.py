"""End-to-end training-data curation pipeline: the composition query the
whole engine exists for (SURVEY §2.E north star).

    documents (∪ injected dups)
      → exact dedup (first doc_id wins)
      → language gate (marker-word argmax = 'en')
      → quality gate (fixed-weight score ≥ threshold)
      → GLOBAL token budget: best-quality-first cumulative token cap

The budget step is the interesting one at scale: a naive
``Window.orderBy(quality)`` cumsum is a single-partition sort. Here it is
two-phase — ``repartitionByRange`` on the ranking key, per-partition cumsum,
then one tiny collect of per-partition totals broadcast back as offsets —
the same partial/final shape Spark uses for global sort, so it scales to any
corpus size. The DuckDB oracle is the plain window cumsum (identical result,
different physical plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from vers_spark.functions import text as TX
from vers_spark.operators.text_analysis import (
    D_HASH60,
    D_TOKENS,
    _argmax_lang,
    _d_argmax_lang,
    d_count_in_set,
)
from vers_spark.sources.tables import load_table

QUALITY_MIN = 0.55
TOKEN_BUDGET = 30_000
DUP_MOD = 7


def _scored(docs: DataFrame) -> DataFrame:
    toks = TX.ws_tokens(F.col("text"))
    n_tok = F.greatest(F.size(toks), F.lit(1)).cast("double")
    n_chr = F.greatest(F.length("text"), F.lit(1)).cast("double")
    stop = TX.count_in_set(toks, TX.STOPWORDS_EN).cast("double") / n_tok
    punct = (
        F.length("text") - F.length(F.regexp_replace("text", r"[.,!?;:()\[\]{}'\"]", ""))
    ).cast("double") / n_chr
    digit = (F.length("text") - F.length(F.regexp_replace("text", "[0-9]", ""))).cast("double") / n_chr
    mean_wl = n_chr / n_tok
    score = (
        F.lit(0.4) * stop
        + F.lit(0.3) * (F.lit(1.0) - punct)
        + F.lit(0.2) * (F.lit(1.0) - digit)
        + F.lit(0.1) * F.least(mean_wl / F.lit(10.0), F.lit(1.0))
    )
    lang_scores = {
        lang: TX.count_in_set(toks, words).cast("long") for lang, words in TX.LANG_MARKERS.items()
    }
    return docs.select(
        "doc_id",
        "text",
        F.size(toks).cast("long").alias("n_tokens"),
        score.alias("quality_score"),
        _argmax_lang(lang_scores).alias("predicted_lang"),
    )


def _budgeted(scored: DataFrame, budget: int, num_parts: int = 8) -> DataFrame:
    """Keep best-quality docs until the cumulative token count exceeds
    ``budget`` — two-phase global cumsum (see module docstring)."""
    ranked = scored.repartitionByRange(num_parts, F.desc("quality_score"), F.asc("doc_id"))
    w_local = (
        W.partitionBy("_part")
        .orderBy(F.desc("quality_score"), F.asc("doc_id"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    # localCheckpoint BEFORE reading the totals: repartitionByRange samples
    # its boundaries per EXECUTION (seeded off the physical rdd id), so the
    # totals action and the final consumer would otherwise see different
    # partitionings and the offsets would not match the rows (the
    # global_row_number fix, temporal.py — same two-execution hazard)
    local = ranked.withColumn("_part", F.spark_partition_id()).withColumn(
        "_local_cum", F.sum("n_tokens").over(w_local)
    ).localCheckpoint()
    totals = local.groupBy("_part").agg(F.max("_local_cum").alias("_total")).collect()
    offsets, acc = {}, 0
    for r in sorted(totals, key=lambda r: r["_part"]):
        offsets[r["_part"]] = acc
        acc += r["_total"]
    off = F.broadcast(
        scored.sparkSession.createDataFrame(
            [(p, int(o)) for p, o in offsets.items()], "_part int, _off long"
        )
    )
    return (
        local.join(off, "_part")
        .withColumn("cum_tokens", (F.col("_off") + F.col("_local_cum")).cast("long"))
        .filter(F.col("cum_tokens") <= budget)
        .select("doc_id", "n_tokens", "quality_score", "cum_tokens")
    )


def doc_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") % DUP_MOD == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    aug = docs.unionByName(dups)
    # exact dedup, first doc_id wins (lsh.rs:113-130 first-occurrence rule)
    w = W.partitionBy("text").orderBy("doc_id")
    dd = aug.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    kept = _scored(dd).filter(
        (F.col("predicted_lang") == "en") & (F.col("quality_score") >= QUALITY_MIN)
    )
    return _budgeted(kept, TOKEN_BUDGET)


# per-language sampling rates in thousandths (en-heavy mixes downsample the
# dominant language — the standard data-mix rebalancing move)
SAMPLE_RATES_K = {"en": 800, "de": 500, "fr": 500, "es": 300}
SAMPLE_DEFAULT_K = 200


def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified corpus sampling by language via DETERMINISTIC hash-bucket
    selection: keep a doc iff ``stable_hash60(doc_id) % 1000 < rate(lang)``.
    Hash sampling (vs seeded RNG ``sampleBy``) is the scale-correct design:
    the decision is a pure row function — reproducible across runs, engines,
    partitionings, and retries, usable as an incremental-ingest filter, and
    SQL-oracle-checkable. One scan, no shuffle before the audit aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = TX.stable_hash60(F.col("doc_id").cast("string")) % 1000
    rate = F.lit(SAMPLE_DEFAULT_K)
    for lang, k in sorted(SAMPLE_RATES_K.items()):
        rate = F.when(F.col("lang") == lang, F.lit(k)).otherwise(rate)
    return (
        docs.filter(bucket < rate)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").alias("chars_sampled"),
        )
        .orderBy("lang")
    )


_D_RATE = "CASE lang " + " ".join(
    f"WHEN '{lang}' THEN {k}" for lang, k in sorted(SAMPLE_RATES_K.items())
) + f" ELSE {SAMPLE_DEFAULT_K} END"

def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing, concat-and-chunk policy: per language,
    documents are concatenated in doc_id order and split into fixed
    SEQ_LEN-token windows; each doc reports the sequence it starts in, its
    token offset there, and how many sequences it spans. Pure integer
    window arithmetic (running token cumsum) — exact in both engines.
    One shuffle: the per-language window. At 100 TB the lang partitions
    are few and huge, so the production form shards each language
    (partitionBy(lang, shard) with per-shard base offsets composed in a
    tiny second pass — same two-phase global-cumsum trick as _budgeted);
    the single-window form here keeps the oracle simple."""
    from pyspark.sql import Window as W

    from vers_spark.functions import text as TX

    seq_len = 512
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        F.size(TX.ws_tokens(F.col("text"))).cast("long").alias("n_tok"),
    )
    w = (
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum("n_tok").over(w)
    base = d.select("doc_id", "lang", "n_tok", cum.alias("cum_tokens"))
    return _pack_positions(base, seq_len)


def _pack_positions(base, seq_len: int):
    """Sequence positions from the token cumsum — INTEGER division (`div`),
    not floor-of-double-divide: exact at any cumulative token count, not
    just below 2^53 (the DuckDB twin uses `//` for the same reason)."""
    start = f"(cum_tokens - n_tok)"
    return base.select(
        "doc_id",
        "lang",
        "n_tok",
        "cum_tokens",
        F.expr(f"{start} div {seq_len}").cast("long").alias("start_seq"),
        F.expr(f"{start} % {seq_len}").cast("long").alias("start_offset"),
        (
            F.expr(f"(cum_tokens - 1) div {seq_len}")
            - F.expr(f"{start} div {seq_len}")
            + F.lit(1)
        )
        .cast("long")
        .alias("n_seqs_spanned"),
    )


def doc_pack_sequences_sharded(spark: SparkSession, sf_dir: str, n_shards: int = 8) -> DataFrame:
    """The production form of doc_pack_sequences for skewed language
    partitions: shard each language into contiguous doc_id ranges, run the
    token cumsum per (lang, shard) — bounded-size windows instead of one
    giant per-language sort — then compose per-shard base offsets from a
    TINY (langs × shards) aggregate broadcast back. Output is defined to be
    IDENTICAL to the single-window form (integer arithmetic, contiguous
    ranges preserve doc_id order across shards), so it hash-matches the
    same global SQL oracle — the point of the query: the scale-bounded
    plan provably computes the same answer."""
    from pyspark.sql import Window as W

    from vers_spark.functions import text as TX

    seq_len = 512
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        F.size(TX.ws_tokens(F.col("text"))).cast("long").alias("n_tok"),
    )
    lo, hi = d.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
    span = max((int(hi) - int(lo) + n_shards) // n_shards, 1)
    d = d.withColumn("shard", ((F.col("doc_id") - int(lo)) / span).cast("int"))

    w_local = (
        W.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = d.withColumn("local_cum", F.sum("n_tok").over(w_local))

    totals = d.groupBy("lang", "shard").agg(F.sum("n_tok").alias("tot"))
    w_prior = (
        W.partitionBy("lang").orderBy("shard").rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "base", F.coalesce(F.sum("tot").over(w_prior), F.lit(0))
    ).select("lang", "shard", "base")

    j = local.join(F.broadcast(offsets), ["lang", "shard"])
    cum = (F.col("base") + F.col("local_cum")).cast("long")
    base = j.select("doc_id", "lang", "n_tok", cum.alias("cum_tokens"))
    return _pack_positions(base, seq_len)


def doc_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (90/5/5) by a content-independent
    hash of doc_id — reproducible across engines, partitionings, and reruns
    (the property seeded RNG sampling lacks), and stable under corpus
    appends: a doc's split never changes when other docs arrive. Returns
    per-(lang, split) counts; the per-doc assignment is the md5-bucket of
    the id, mirroring doc_stratified_sample's hash-bucket discipline."""
    from vers_spark.functions.text import stable_hash60

    docs = load_table(spark, sf_dir, "documents")
    bucket = stable_hash60(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        docs.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("lang", "split")
    )


# ---- data-mix rebalancing to a global char budget --------------------------
# Per-source mixture weights in thousandths; unlisted sources get the default.
# The canonical pretraining "data mixing" move: cap each source's contribution
# at weight/1000 of the global budget, filling each source in a deterministic
# hash order (so the sample is reproducible and append-stable, like
# doc_split_assign).
MIXTURE_BUDGET_CHARS = 200_000
MIXTURE_WEIGHTS_K = {"src0": 200, "src1": 150, "src2": 100, "src3": 100}
MIXTURE_DEFAULT_K = 25


def doc_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture sampling: each source gets ``weight/1000 * MIXTURE_BUDGET_CHARS``
    chars; docs fill the per-source budget in ``(stable_hash60(doc_id), doc_id)``
    order (a deterministic shuffle — no seeded RNG, so the pick is identical
    across engines/partitionings and stable under appends of other sources).
    Pure integer cumsum → exact oracle. One shuffle (per-source window); at
    100 TB a skewed source shards exactly like doc_pack_sequences_sharded
    (contiguous hash-ranges + composed base offsets)."""
    from vers_spark.functions.text import stable_hash60

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "source",
        "n_chars",
        stable_hash60(F.col("doc_id").cast("string")).alias("_h"),
        F.expr(
            f"CAST(({_MIX_WEIGHT_SPARK} * {MIXTURE_BUDGET_CHARS}) div 1000 AS BIGINT)"
        ).alias("_budget"),
    )
    w = (
        W.partitionBy("source")
        .orderBy(F.asc("_h"), F.asc("doc_id"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    picked = (
        d.withColumn("cum_chars", F.sum("n_chars").over(w).cast("long"))
        .filter(F.col("cum_chars") <= F.col("_budget"))
        .select("doc_id", "source", "n_chars", "cum_chars")
    )
    return picked


_MIX_WEIGHT_SPARK = "CASE source " + " ".join(
    f"WHEN '{s}' THEN {k}" for s, k in sorted(MIXTURE_WEIGHTS_K.items())
) + f" ELSE {MIXTURE_DEFAULT_K} END"


# ---- deterministic weight-biased priority sample ---------------------------
# key = n_chars * (stable_hash60(doc_id) % 2^20): monotone-in-weight,
# reproducible, integer-exact in both engines. (The textbook A-ES weighted
# reservoir uses u^(1/w) keys — transcendentals whose last-ulp is NOT
# bit-portable across engines; the integer product form keeps the same
# "heavier docs are proportionally likelier to rank high" bias while staying
# oracle-checkable. Documented operator spec, not a claim of exact
# probability-proportional sampling.)
WEIGHTED_SAMPLE_K = 200


def doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-``WEIGHTED_SAMPLE_K`` docs by the deterministic weighted
    priority key (weight = n_chars). Top-k by sort+limit — Spark plans
    TakeOrderedAndProject (per-partition heap + tiny driver merge), NOT a
    global sort: the 100 TB plan shape."""
    from vers_spark.functions.text import stable_hash60

    docs = load_table(spark, sf_dir, "documents")
    pri = (F.col("n_chars").cast("long") * (stable_hash60(F.col("doc_id").cast("string")) % F.lit(1048576))).alias(
        "priority"
    )
    return (
        docs.select("doc_id", "source", "n_chars", pri)
        .orderBy(F.desc("priority"), F.asc("doc_id"))
        .limit(WEIGHTED_SAMPLE_K)
    )


# ---- incremental corpus refresh: keyed COW upsert --------------------------
UPSERT_BUCKETS = 16


def doc_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO end-to-end (sources.upsert): materialize documents as a
    16-bucket hash-partitioned COW table, apply an update batch (doc_id%10
    rows get re-scored n_chars+1000; doc_id%17 rows re-ingest as new 'xx'
    docs under shifted ids), rewriting ONLY the impacted bucket directories,
    then read the table back. The oracle states merge semantics declaratively
    (update-wins anti-join ∪ updates) — the hash match fails if the COW
    rewrite loses, duplicates, or corrupts any row in touched OR untouched
    buckets. File-level no-rewrite of untouched buckets is asserted in
    tests."""
    from vers_spark.sources.staging import fresh_subdir
    from vers_spark.sources.upsert import merge_into, read_cow_table, write_cow_table

    docs = load_table(spark, sf_dir, "documents")
    path = fresh_subdir(spark, "cow", sf_dir, "docs")
    write_cow_table(docs, path, key="doc_id", n_buckets=UPSERT_BUCKETS)
    updates = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select(
            "doc_id",
            "text",
            "lang",
            "source",
            (F.col("n_chars") + 1000).alias("n_chars"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 17 == 0).select(
                (F.col("doc_id") + 50000).alias("doc_id"),
                "text",
                F.lit("xx").alias("lang"),
                "source",
                "n_chars",
            )
        )
    )
    merge_into(spark, path, updates, key="doc_id", n_buckets=UPSERT_BUCKETS)
    return read_cow_table(spark, path).select("doc_id", "lang", "source", "n_chars")


def doc_merge_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MERGE INTO (update + insert + DELETE) on the COW table:
    doc_id%10 rows rescore, doc_id%17 re-ingest as new docs, doc_id%13 rows
    delete (deletes win over updates on overlapping keys — the one
    precedence rule, stated in sources/upsert.py and restated by the
    oracle). The hash match fails if any action leaks into untouched
    buckets or stale files survive a fully-emptied bucket."""
    from vers_spark.sources.staging import fresh_subdir
    from vers_spark.sources.upsert import merge_into, read_cow_table, write_cow_table

    docs = load_table(spark, sf_dir, "documents")
    path = fresh_subdir(spark, "cowf", sf_dir, "docs")
    write_cow_table(docs, path, key="doc_id", n_buckets=UPSERT_BUCKETS)
    updates = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select(
            "doc_id",
            "text",
            "lang",
            "source",
            (F.col("n_chars") + 1000).alias("n_chars"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 17 == 0).select(
                (F.col("doc_id") + 50000).alias("doc_id"),
                "text",
                F.lit("xx").alias("lang"),
                "source",
                "n_chars",
            )
        )
    )
    deletes = docs.filter(F.col("doc_id") % 13 == 0).select("doc_id")
    merge_into(
        spark, path, updates, key="doc_id", n_buckets=UPSERT_BUCKETS, deletes=deletes
    )
    return read_cow_table(spark, path).select("doc_id", "lang", "source", "n_chars")


def doc_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot isolation as a hash-gated query (sources/versioned.py):
    documents materialize as version 0, the doc_merge_full batch (update +
    insert + delete) commits version 1, then BOTH versions are read AFTER
    the merge. The v0 row must still aggregate exactly to the base table —
    time travel — and the v1 row to the declarative merge result; one
    manifest-referenced file set per snapshot, unchanged buckets shared,
    never copied (reference-sharing and vacuum GC are test-gated)."""
    from vers_spark.sources.staging import fresh_subdir
    from vers_spark.sources.versioned import (
        create_versioned,
        merge_versioned,
        read_version,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = fresh_subdir(spark, "tt", sf_dir, "docs")
    create_versioned(docs, path, key="doc_id", n_buckets=UPSERT_BUCKETS)
    updates = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select(
            "doc_id", "text", "lang", "source", (F.col("n_chars") + 1000).alias("n_chars")
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 17 == 0).select(
                (F.col("doc_id") + 50000).alias("doc_id"),
                "text",
                F.lit("xx").alias("lang"),
                "source",
                "n_chars",
            )
        )
    )
    deletes = docs.filter(F.col("doc_id") % 13 == 0).select("doc_id")
    merge_versioned(spark, path, updates, deletes=deletes)

    out = None
    for v in (0, 1):
        snap = read_version(spark, path, v).agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.countDistinct("lang").alias("n_langs"),
        ).select(F.lit(v).alias("version"), "n_docs", "sum_chars", "n_langs")
        out = snap if out is None else out.unionByName(snap)
    return out.orderBy("version")


def doc_pretrain_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pretraining BATCH COMPOSER — the second end-to-end composition
    query next to doc_curation_pipeline's cleaning pipeline:

        mixture sample (per-source char budgets, deterministic hash order)
          → split assign (md5-bucket 90/5/5 train/val/test)
          → per-split 512-token sequence packing (concat-and-chunk in the
            same deterministic hash order)

    emitting each selected doc's split and packed position. Every stage is
    hash-deterministic integer arithmetic, so the WHOLE composition carries
    one DuckDB oracle. One window per stage (source, then split); at 100 TB
    each shards exactly like doc_pack_sequences_sharded."""
    from vers_spark.functions.text import stable_hash60

    docs = load_table(spark, sf_dir, "documents")
    h = stable_hash60(F.col("doc_id").cast("string"))
    d = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.size(TX.ws_tokens(F.col("text"))).cast("long").alias("n_tok"),
        h.alias("_h"),
        F.expr(
            f"CAST(({_MIX_WEIGHT_SPARK} * {MIXTURE_BUDGET_CHARS}) div 1000 AS BIGINT)"
        ).alias("_budget"),
    )
    w_src = (
        W.partitionBy("source")
        .orderBy(F.asc("_h"), F.asc("doc_id"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    picked = d.withColumn("cum_chars", F.sum("n_chars").over(w_src).cast("long")).filter(
        F.col("cum_chars") <= F.col("_budget")
    )
    bucket = F.col("_h") % 100
    split = F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    s = picked.withColumn("split", split)
    w_split = (
        W.partitionBy("split")
        .orderBy(F.asc("_h"), F.asc("doc_id"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    packed = s.withColumn("cum_tokens", F.sum("n_tok").over(w_split).cast("long"))
    return packed.select(
        "doc_id",
        "source",
        "split",
        "n_tok",
        "cum_tokens",
        F.expr("(cum_tokens - n_tok) div 512").cast("long").alias("start_seq"),
        F.expr("(cum_tokens - n_tok) % 512").cast("long").alias("start_offset"),
        F.expr("(cum_tokens - 1) div 512 - (cum_tokens - n_tok) div 512 + 1")
        .cast("long")
        .alias("n_seqs_spanned"),
    )


def doc_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot CHANGELOG (sources/versioned.diff_versions): commit the
    doc_time_travel merge recipe as v1, then read the v0→v1 diff as (key,
    action) rows. File-identity pruning makes the diff read only buckets
    whose manifest file lists differ — cost ∝ churn, not table size. The
    oracle restates the merge delta declaratively: deletes win, updates are
    the rescored non-deleted keys, inserts the offset copies."""
    from vers_spark.sources.staging import fresh_subdir
    from vers_spark.sources.versioned import (
        create_versioned,
        diff_versions,
        merge_versioned,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = fresh_subdir(spark, "diff", sf_dir, "docs")
    create_versioned(docs, path, key="doc_id", n_buckets=UPSERT_BUCKETS)
    updates = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select(
            "doc_id", "text", "lang", "source", (F.col("n_chars") + 1000).alias("n_chars")
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 17 == 0).select(
                (F.col("doc_id") + 50000).alias("doc_id"),
                "text",
                F.lit("xx").alias("lang"),
                "source",
                "n_chars",
            )
        )
    )
    deletes = docs.filter(F.col("doc_id") % 13 == 0).select("doc_id")
    merge_versioned(spark, path, updates, deletes=deletes)
    return diff_versions(spark, path, 0, 1)


ORACLE_SQL = {
    "doc_pretrain_batches": r"""
        WITH d AS (
            SELECT doc_id, source, n_chars,
                   CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS n_tok,
                   {h} AS h,
                   CAST((CASE source {wcase} ELSE {wdef} END)
                        * {budget} // 1000 AS BIGINT) AS budget
            FROM documents
        ), p AS (
            SELECT * FROM (
                SELECT *, CAST(sum(n_chars) OVER (PARTITION BY source ORDER BY h, doc_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_chars
                FROM d)
            WHERE cum_chars <= budget
        ), s AS (
            SELECT *, CASE WHEN h % 100 < 90 THEN 'train'
                           WHEN h % 100 < 95 THEN 'val' ELSE 'test' END AS split
            FROM p
        ), c AS (
            SELECT doc_id, source, split, n_tok,
                   CAST(sum(n_tok) OVER (PARTITION BY split ORDER BY h, doc_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
            FROM s
        )
        SELECT doc_id, source, split, n_tok, cum_tokens,
               CAST((cum_tokens - n_tok) // 512 AS BIGINT) AS start_seq,
               CAST((cum_tokens - n_tok) % 512 AS BIGINT) AS start_offset,
               CAST((cum_tokens - 1) // 512 - (cum_tokens - n_tok) // 512 + 1 AS BIGINT) AS n_seqs_spanned
        FROM c
    """.format(
        h=D_HASH60.format(x="CAST(doc_id AS VARCHAR)"),
        wcase=" ".join(f"WHEN '{s}' THEN {k}" for s, k in sorted(MIXTURE_WEIGHTS_K.items())),
        wdef=MIXTURE_DEFAULT_K,
        budget=MIXTURE_BUDGET_CHARS,
    ),
    "doc_version_diff": """
        SELECT doc_id, 'delete' AS action FROM documents WHERE doc_id % 13 = 0
        UNION ALL
        SELECT doc_id, 'update' AS action FROM documents
        WHERE doc_id % 10 = 0 AND doc_id % 13 <> 0
        UNION ALL
        SELECT doc_id + 50000 AS doc_id, 'insert' AS action FROM documents
        WHERE doc_id % 17 = 0
    """,
    "doc_time_travel": """
        WITH upd AS (
            SELECT doc_id, lang, source, n_chars + 1000 AS n_chars
            FROM documents WHERE doc_id % 10 = 0
            UNION ALL
            SELECT doc_id + 50000 AS doc_id, 'xx' AS lang, source, n_chars
            FROM documents WHERE doc_id % 17 = 0
        ), del AS (
            SELECT doc_id FROM documents WHERE doc_id % 13 = 0
        ), v1 AS (
            SELECT d.doc_id, d.lang, d.n_chars
            FROM documents d
            WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.doc_id = d.doc_id)
              AND NOT EXISTS (SELECT 1 FROM del x WHERE x.doc_id = d.doc_id)
            UNION ALL
            SELECT u.doc_id, u.lang, u.n_chars FROM upd u
            WHERE NOT EXISTS (SELECT 1 FROM del x WHERE x.doc_id = u.doc_id)
        )
        SELECT 0 AS version, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        FROM documents
        UNION ALL
        SELECT 1, CAST(count(*) AS BIGINT), CAST(sum(n_chars) AS BIGINT),
               CAST(count(DISTINCT lang) AS BIGINT)
        FROM v1
        ORDER BY version
    """,
    "doc_merge_full": """
        WITH upd AS (
            SELECT doc_id, lang, source, n_chars + 1000 AS n_chars
            FROM documents WHERE doc_id % 10 = 0
            UNION ALL
            SELECT doc_id + 50000 AS doc_id, 'xx' AS lang, source, n_chars
            FROM documents WHERE doc_id % 17 = 0
        ), del AS (
            SELECT doc_id FROM documents WHERE doc_id % 13 = 0
        )
        SELECT d.doc_id, d.lang, d.source, d.n_chars
        FROM documents d
        WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.doc_id = d.doc_id)
          AND NOT EXISTS (SELECT 1 FROM del x WHERE x.doc_id = d.doc_id)
        UNION ALL
        SELECT u.doc_id, u.lang, u.source, u.n_chars FROM upd u
        WHERE NOT EXISTS (SELECT 1 FROM del x WHERE x.doc_id = u.doc_id)
    """,
    "doc_upsert_merge": """
        WITH upd AS (
            SELECT doc_id, lang, source, n_chars + 1000 AS n_chars
            FROM documents WHERE doc_id % 10 = 0
            UNION ALL
            SELECT doc_id + 50000 AS doc_id, 'xx' AS lang, source, n_chars
            FROM documents WHERE doc_id % 17 = 0
        )
        SELECT d.doc_id, d.lang, d.source, d.n_chars
        FROM documents d
        WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.doc_id = d.doc_id)
        UNION ALL
        SELECT doc_id, lang, source, n_chars FROM upd
    """,
    "doc_mixture_sample": f"""
        WITH d AS (
            SELECT doc_id, source, n_chars,
                   {{h}} AS h,
                   CAST((CASE source {' '.join(f"WHEN '{s}' THEN {k}" for s, k in sorted(MIXTURE_WEIGHTS_K.items()))} ELSE {MIXTURE_DEFAULT_K} END)
                        * {MIXTURE_BUDGET_CHARS} // 1000 AS BIGINT) AS budget
            FROM documents
        )
        SELECT doc_id, source, n_chars, cum_chars
        FROM (
            SELECT doc_id, source, n_chars, budget,
                   CAST(sum(n_chars) OVER (PARTITION BY source ORDER BY h, doc_id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_chars
            FROM d
        )
        WHERE cum_chars <= budget
    """.format(h=D_HASH60.format(x="CAST(doc_id AS VARCHAR)")),
    "doc_weighted_sample": """
        SELECT doc_id, source, n_chars,
               CAST(n_chars * (({h}) % 1048576) AS BIGINT) AS priority
        FROM documents
        ORDER BY priority DESC, doc_id ASC
        LIMIT {k}
    """.format(
        h=D_HASH60.format(x="CAST(doc_id AS VARCHAR)"),
        k=WEIGHTED_SAMPLE_K,
    ),
    "doc_split_assign": f"""
        WITH b AS (
            SELECT lang,
                   CASE WHEN ({{h}}) % 100 < 90 THEN 'train'
                        WHEN ({{h}}) % 100 < 95 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        )
        SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs
        FROM b GROUP BY lang, split ORDER BY lang, split
    """.format(
        h="list_reduce(list_transform(string_split(substr(md5(CAST(doc_id AS VARCHAR)), 1, 15), ''),"
        " c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (a,b) -> a*16 + b)"
    ),
    "doc_pack_sequences": r"""
        WITH d AS (
            SELECT doc_id, lang,
                   CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS n_tok
            FROM documents
        ), c AS (
            SELECT doc_id, lang, n_tok,
                   CAST(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
            FROM d
        )
        SELECT doc_id, lang, n_tok, cum_tokens,
               CAST((cum_tokens - n_tok) // 512 AS BIGINT) AS start_seq,
               CAST((cum_tokens - n_tok) % 512 AS BIGINT) AS start_offset,
               CAST((cum_tokens - 1) // 512 - (cum_tokens - n_tok) // 512 + 1 AS BIGINT) AS n_seqs_spanned
        FROM c
    """,
    "doc_stratified_sample": f"""
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_sampled,
               CAST(sum(n_chars) AS BIGINT) AS chars_sampled
        FROM documents
        WHERE {D_HASH60.format(x='CAST(doc_id AS VARCHAR)')} % 1000 < {_D_RATE}
        GROUP BY lang
        ORDER BY lang
    """,
    "doc_curation_pipeline": f"""
        WITH aug AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 10000, text FROM documents WHERE doc_id % {DUP_MOD} = 0
        ), dd AS (
            SELECT doc_id, text
            FROM (SELECT doc_id, text,
                         row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
                  FROM aug)
            WHERE rn = 1
        ), scored AS (
            SELECT doc_id,
                   CAST(len({D_TOKENS.format(t='text')}) AS BIGINT) AS n_tokens,
                   0.4 * (CAST({d_count_in_set(D_TOKENS.format(t='text'), TX.STOPWORDS_EN)} AS DOUBLE)
                          / CAST(greatest(len({D_TOKENS.format(t='text')}), 1) AS DOUBLE))
                   + 0.3 * (1.0 - CAST(length(text) - length(regexp_replace(text, '[.,!?;:()\\[\\]{{}}''"]', '', 'g')) AS DOUBLE)
                                  / CAST(greatest(length(text), 1) AS DOUBLE))
                   + 0.2 * (1.0 - CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
                                  / CAST(greatest(length(text), 1) AS DOUBLE))
                   + 0.1 * least((CAST(greatest(length(text), 1) AS DOUBLE)
                                  / CAST(greatest(len({D_TOKENS.format(t='text')}), 1) AS DOUBLE)) / 10.0, 1.0)
                       AS quality_score,
                   {', '.join(f"CAST({d_count_in_set(D_TOKENS.format(t='text'), TX.LANG_MARKERS[lang])} AS BIGINT) AS s_{lang}" for lang in sorted(TX.LANG_MARKERS))}
            FROM dd
        ), gated AS (
            SELECT doc_id, n_tokens, quality_score
            FROM scored
            WHERE {_d_argmax_lang(list(TX.LANG_MARKERS))} = 'en'
              AND quality_score >= {QUALITY_MIN}
        )
        SELECT doc_id, n_tokens, quality_score, cum_tokens
        FROM (
            SELECT doc_id, n_tokens, quality_score,
                   CAST(sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id
                                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
            FROM gated
        )
        WHERE cum_tokens <= {TOKEN_BUDGET}
    """,
}

QUERIES = {
    "doc_curation_pipeline": doc_curation_pipeline,
    "doc_stratified_sample": doc_stratified_sample,
    "doc_mixture_sample": doc_mixture_sample,
    "doc_weighted_sample": doc_weighted_sample,
    "doc_upsert_merge": doc_upsert_merge,
    "doc_merge_full": doc_merge_full,
    "doc_time_travel": doc_time_travel,
    "doc_version_diff": doc_version_diff,
    "doc_pretrain_batches": doc_pretrain_batches,
    "doc_pack_sequences": doc_pack_sequences,
    "doc_pack_sequences_sharded": doc_pack_sequences_sharded,
    "doc_split_assign": doc_split_assign,
}

ORACLE_SQL["doc_pack_sequences_sharded"] = ORACLE_SQL["doc_pack_sequences"]
