"""Driver queries for embedding similarity + multimodal plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vers_spark.operators.multimodal import (
    extract_features,
    resample_audio,
    resize_images,
    sample_frames,
    synthesize_media_from_documents,
)
from vers_spark.operators.similarity import (
    embedding_cosine_neardup_pairs,
    embedding_neardup_pairs,
    ivf_similarity_join,
    mllib_brp_neardup_pairs,
)
from vers_spark.sources.tables import load_table

NEARDUP_THRESHOLD = 0.5  # natural min pairwise sq-euclid in testdata is ≈0.97
COS_THRESHOLD = 0.2  # natural min pairwise cosine distance is ≈0.40 at sf0.1


def _augmented_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dups = emb.filter(F.col("vec_id") % 11 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    return emb.unionByName(dups)


def emb_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed embedding near-dup over a corpus with injected exact
    duplicates. Identical vectors share every leaf, so no dup can be missed —
    the result provably equals the brute-force oracle at this threshold.
    (Completeness holds for ANY tree count at an exact-dup threshold, so the
    2-tree forest is the efficient config; more trees only buy recall for
    looser thresholds.)"""
    return embedding_neardup_pairs(
        _augmented_emb(spark, sf_dir), NEARDUP_THRESHOLD, num_trees=2
    )


def emb_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: normalize → LSH buckets → 1−dot verify.
    Provably complete at this threshold (only exact duplicates qualify)."""
    return embedding_cosine_neardup_pairs(
        _augmented_emb(spark, sf_dir), COS_THRESHOLD, num_trees=2
    )


def emb_brp_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib BucketedRandomProjectionLSH fast path, squared-euclidean ≤ 0.25
    (exact-dup-only) — same oracle shape as the forest variant."""
    return mllib_brp_neardup_pairs(_augmented_emb(spark, sf_dir), sq_threshold=0.25)


def doc_mllib_exactdup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib MinHashLSH fast path: identical-shingle-set pairs (Jaccard = 1)
    over documents ∪ exact copies — provably equals the exact join."""
    from vers_spark.operators.text_dedup import mllib_minhash_exactdup_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    return mllib_minhash_exactdup_pairs(docs.unionByName(dups))


def _simjoin_ivf(spark: SparkSession, sf_dir: str, num_clusters: int):
    """Cached IVF build for the similarity-join queries: k=16 reuses the
    index suite's cached build (identical config); the degenerate k=1 build
    is cached separately."""
    from vers_spark.indexes.ivfflat import IVFFlatIndex
    from vers_spark.operators._qcache import memo

    if num_clusters == 16:
        from vers_spark.operators.index_queries import _ivf

        return _ivf(spark, sf_dir, 16)

    def build():
        emb = load_table(spark, sf_dir, "embeddings")
        idx = IVFFlatIndex.build(emb, num_clusters=num_clusters, seed=42)
        idx.assignments.cache()
        return idx

    return memo(("simjoin_ivf", sf_dir, num_clusters), build)


def emb_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cluster-co-located approximate top-3 COSINE similarity self-join.

    r10 rows-only→hash-oracle conversion (VERDICT r9 #3): the cluster
    assignment now comes from the deterministic fixed-point build
    (index_queries._lloyd_fixed — hash init, f64 fold argmin, BIGINT mean
    updates; the build ivf_build_fixed already hash-certifies), so the
    ENTIRE query is engine-exact and carries a full DuckDB oracle
    (index_queries._emb_simjoin_cos_sql: the same unrolled Lloyd CTEs + the
    declared-order cosine fold knn_exact_cosine hash-matches). The
    mllib-built variant this replaces stays covered via emb_brp_neardup /
    doc_mllib_exactdup (mllib build path) and emb_knn_selfjoin_exact (the
    degenerate 1-cluster exact twin). Distance is cosine — the sibling
    emb_similarity_join_fixed serves the sq-euclidean top-5 shape.

    Scale: co-located join — candidates per query bounded by cluster size,
    never corpus²; payload columns dropped before the rank window so the
    top-k shuffle moves (id, id, double) rows only."""
    from pyspark.sql import Window as W

    from vers_spark.functions import vector as V
    from vers_spark.operators.index_queries import _lloyd_fixed

    _, assignments = _lloyd_fixed(spark, sf_dir)
    a = assignments.select(
        "cluster_id", F.col("id").alias("query_id"), F.col("emb").alias("qv")
    )
    b = assignments.select(
        "cluster_id", F.col("id").alias("neighbour_id"), F.col("emb").alias("cv")
    )
    w = W.partitionBy("query_id").orderBy(F.asc("distance"), F.asc("neighbour_id"))
    return (
        a.join(b, "cluster_id")
        .filter(F.col("query_id") != F.col("neighbour_id"))
        .withColumn("distance", V.cosine_distance(F.col("qv"), F.col("cv")))
        .select("query_id", "neighbour_id", "distance")
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
    )


def emb_knn_selfjoin_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate oracle config of the IVF similarity join: num_clusters=1 ≡
    exact all-pairs top-3 KNN self-join (every vector is everyone's
    candidate) — the hash-matched twin that pins the co-located join's
    ranking/tie-break semantics."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_similarity_join(emb, k=3, index=_simjoin_ivf(spark, sf_dir, 1))


def mm_real_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multimodal decode end-to-end (no external libs: BMP/WAV/BMP-stream
    codecs in operators/media_codecs): synthesize actual format bytes, run
    bilinear resize on images, linear resample on audio, header-walk frame
    sampling on video, then content-derived features — per-kind stats.
    Rows-only (binary payload pipelines are not SQL-expressible)."""
    from vers_spark.operators.multimodal import FEATURE_DIM  # noqa: F401

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    media = synthesize_media_from_documents(docs, real_payloads=True)
    imgs = resize_images(media, 8, 6, decode="real")
    aud = resample_audio(media, 8000, decode="real")
    frames = sample_frames(media, every_ms=1000, decode="real")
    feat = extract_features(imgs.unionByName(aud), decode="real")
    norm = F.aggregate(
        "feature", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    stats = (
        feat.groupBy("kind")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.round(F.avg(F.sqrt(norm)), 6).alias("mean_feat_norm"),
        )
    )
    vid = frames.agg(
        F.lit("video").alias("kind"),
        F.countDistinct("media_id").cast("long").alias("n_items"),
        F.round(F.count(F.lit(1)) / F.countDistinct("media_id"), 6).alias(
            "mean_feat_norm"  # frames-per-video for the video row
        ),
    )
    return stats.unionByName(vid).orderBy("kind")


def mm_jpeg_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-format image decode end-to-end: synthesize REAL baseline
    JPEG payloads (operators/jpeg_codec — pure-numpy ITU T.81 baseline, the
    r6 upgrade of the BMP-only 'real decode' seam), decode + bilinear-resize
    + re-extract features, and verify the decode is faithful: per-image
    PSNR of decode(encode(img)) vs the deterministic source image is
    recomputed INSIDE the pipeline, and the output aggregates feature norms
    with min/mean PSNR per size bucket. Rows-only (binary codec pipelines
    are not SQL-expressible); faithfulness is the in-query PSNR floor plus
    tests/test_multimodal_real.py's roundtrip gates."""
    import numpy as np
    import pandas as pd

    # kind is a deterministic function of doc_id (image <=> doc_id%3=0),
    # so the kind predicate pushes BELOW the synthesizer's mapInPandas —
    # the UDF never encodes the audio/video payloads this query drops
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 120) & (F.col("doc_id") % 3 == 0)
    )
    media = synthesize_media_from_documents(docs, real_payloads=True, image_format="jpeg")
    imgs = media.filter(F.col("kind") == "image")

    def fn(batches):
        from vers_spark.operators import media_codecs as MC

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                arr = MC.decode_image(bytes(p))
                h, w = arr.shape[:2]
                # the deterministic source (same recipe as the synthesizer)
                rng = np.random.RandomState(int(mid) % (2**31))
                gx = np.linspace(0, 255, w)[None, :, None]
                gy = np.linspace(0, 255, h)[:, None, None]
                src = np.clip(
                    0.5 * gx + 0.5 * gy + rng.randint(-12, 12, (h, w, 3)), 0, 255
                ).astype(np.uint8)
                err = arr.astype(np.float64) - src.astype(np.float64)
                mse = max(float((err * err).mean()), 1e-9)
                psnr = 10.0 * np.log10(255.0**2 / mse)
                feat = MC.image_features(MC.bilinear_resize(arr, 8, 6), 16)
                rows.append(
                    (int(mid), w, h, float(psnr), float(np.sqrt((feat * feat).sum())))
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "psnr", "feat_norm"]
            )

    per_img = imgs.mapInPandas(
        fn, "media_id long, width int, height int, psnr double, feat_norm double"
    )
    return (
        per_img.groupBy((F.col("width") % 4).cast("int").alias("size_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_images"),
            F.round(F.min("psnr"), 2).alias("min_psnr"),
            F.round(F.avg("psnr"), 2).alias("mean_psnr"),
            F.round(F.avg("feat_norm"), 4).alias("mean_feat_norm"),
        )
        .orderBy("size_bucket")
    )


def _video_psnr_frames(spark: SparkSession, sf_dir: str, video_format: str) -> DataFrame:
    """Shared body of mm_mjpeg_frames / mm_avi_frames: synthesize real
    video payloads in ``video_format``, frame-split them (T.81 segment walk
    for the elementary stream, RIFF box walk for AVI), sample one frame per
    tick through the standard sample_frames mapInPandas seam, decode each
    sampled frame, and verify faithfulness in-query: per-frame PSNR of the
    decoded JPEG vs the deterministic source frame from the ONE shared
    generator (multimodal.mjpeg_source_frames)."""
    import numpy as np
    import pandas as pd

    # video <=> doc_id%3=2: push the kind predicate below the synthesizer
    # so the UDF never encodes the image/audio payloads sample_frames drops
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 120) & (F.col("doc_id") % 3 == 2)
    )
    media = synthesize_media_from_documents(
        docs, real_payloads=True, video_format=video_format
    )
    frames = sample_frames(media, every_ms=1000, decode="real")

    def fn(batches):
        from vers_spark.operators import media_codecs as MC

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for mid, fidx, p in zip(
                pdf["media_id"], pdf["frame_idx"], pdf["frame_payload"]
            ):
                arr = MC.decode_image(bytes(p))
                h, w = arr.shape[:2]
                # the synthesizer's deterministic source frame, from the
                # SHARED generator (multimodal.mjpeg_source_frames) — one
                # definition, so the PSNR gate can't drift apart silently
                from vers_spark.operators.multimodal import mjpeg_source_frames

                src = mjpeg_source_frames(int(mid))[int(fidx)]
                err = arr.astype(np.float64) - src.astype(np.float64)
                mse = max(float((err * err).mean()), 1e-9)
                psnr = 10.0 * np.log10(255.0**2 / mse)
                feat = MC.image_features(arr, 16)
                rows.append(
                    (int(mid), int(fidx), w, h, float(psnr),
                     float(np.sqrt((feat * feat).sum())))
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "width", "height", "psnr", "feat_norm"],
            )

    per_frame = frames.mapInPandas(
        fn,
        "media_id long, frame_idx int, width int, height int, psnr double, feat_norm double",
    )
    return (
        per_frame.groupBy(F.col("frame_idx"))
        .agg(
            F.countDistinct("media_id").cast("long").alias("n_videos"),
            F.count(F.lit(1)).cast("long").alias("n_frames"),
            F.round(F.min("psnr"), 2).alias("min_psnr"),
            F.round(F.avg("feat_norm"), 4).alias("mean_feat_norm"),
        )
        .orderBy("frame_idx")
    )


def mm_mjpeg_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MJPEG elementary stream (concatenated baseline JPEGs) through the
    full sample/decode/PSNR pipeline — frame boundaries recovered by the
    T.81 segment walk (media_codecs.jpeg_size; a naive FFD9 scan would
    mis-split). Rows-only (binary codec pipelines are not
    SQL-expressible); split/roundtrip unit gates live in
    tests/test_multimodal_real.py."""
    return _video_psnr_frames(spark, sf_dir, "mjpeg")


def mm_avi_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIFF-AVI container (r8: the boxed-container step past the
    elementary stream): the same baseline-JPEG frames packed as
    LIST('hdrl') headers + LIST('movi') '00dc' chunks + idx1, split by the
    RIFF box walk (media_codecs.split_avi_mjpeg — chunk sizes, not byte
    scans; header frame counts and idx1 entries cross-checked against the
    walked chunks), then the identical sample/decode/PSNR pipeline.
    Rows-only; container unit gates in tests/test_multimodal_real.py."""
    return _video_psnr_frames(spark, sf_dir, "avi")


def mm_mp4_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO BMFF / MP4 container (r8, alongside the RIFF-AVI walk): the
    same baseline-JPEG frames as an unframed mdat indexed by the moov
    sample tables — the decoder recovers samples through stsc/stco/stsz
    the way a real BMFF demuxer does (media_codecs.split_mp4_mjpeg;
    counts cross-checked across stsz/stts/stsc, samples bounds-checked
    against mdat), then the identical sample/decode/PSNR pipeline.
    Rows-only; container unit gates in tests/test_multimodal_real.py."""
    return _video_psnr_frames(spark, sf_dir, "mp4")


def mm_meta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata audit — the one hash-matched query of the media
    family: per-kind counts, payload byte totals, and meta ranges over the
    synthesized media table. Payload bytes and meta fields are deterministic
    functions of the documents table, so a DuckDB oracle states the same
    aggregate directly; the binary column's byte length survives the whole
    Spark path (encode → binary → length), which is exactly what an opaque-
    payload pipeline needs to guarantee."""
    media = synthesize_media_from_documents(load_table(spark, sf_dir, "documents"))
    return (
        media.groupBy("kind")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_media"),
            F.sum(F.length("payload")).cast("long").alias("sum_payload_bytes"),
            F.min("meta.width").cast("int").alias("min_width"),
            F.max("meta.height").cast("int").alias("max_height"),
            F.sum("meta.duration_ms").cast("long").alias("sum_duration_ms"),
        )
        .orderBy("kind")
    )


def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction over synthesized media payloads —
    UPGRADED r8 from rows-only to a full hash oracle: the sha256-derived
    fake features are deterministic arithmetic on the payload bytes, and
    DuckDB restates them exactly (_feature_oracle — digest hex parsed to
    little-endian uint32 words, f32-rounded, ordered fold). The feature
    VECTOR is projected to per-row scalars (dim, min, max, 1e-6
    fixed-point sum) because the driver canonicalizer cannot sort array
    cells — the full array stays available from extract_features directly."""
    media = synthesize_media_from_documents(load_table(spark, sf_dir, "documents"))
    feats = extract_features(media, decode="fake")
    f = F.col("feature")
    fd = F.transform(f, lambda x: x.cast("double"))
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.size(f).alias("feature_dim"),
        F.array_min(f).cast("double").alias("f_min"),
        F.array_max(f).cast("double").alias("f_max"),
        F.round(
            F.aggregate(fd, F.lit(0.0), lambda acc, x: acc + x) * F.lit(1e6)
        ).cast("long").alias("f_sum_fp"),
    )


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling plumbing — UPGRADED r8 from rows-only to a
    full hash oracle: fake-mode frames are integer slices of the utf-8
    payload (duration = n_chars·10, n_frames = max(duration÷1000, 1),
    chunk = max(len÷n_frames, 1)), so each frame's byte length AND md5
    are SQL-stateable over the documents table — the oracle certifies the
    mapInPandas slicing byte-for-byte, not just row counts. The binary
    column itself is projected out (canonicalizer contract)."""
    media = synthesize_media_from_documents(load_table(spark, sf_dir, "documents"))
    fs = sample_frames(media, every_ms=1000, decode="fake")
    return fs.select(
        "media_id",
        "frame_idx",
        "ts_ms",
        F.length("frame_payload").cast("long").alias("frame_bytes"),
        F.md5("frame_payload").alias("frame_md5"),
    )


def mm_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio resample plumbing (kind filter pushed down, meta rewritten in
    Arrow batches). Output is FLAT SCALARS only — the r3 driver canonicalizer
    rejects struct cells (unhashable dict in pandas sort), so the meta struct
    is projected to its per-kind non-null fields; halving the rate (16000 →
    8000) makes the fake-mode byte-length rewrite non-trivial, and because
    the fake path is deterministic arithmetic on the documents table this is
    now a full hash-certified oracle, not rows-only."""
    media = synthesize_media_from_documents(load_table(spark, sf_dir, "documents"))
    out = resample_audio(media, 8000, decode="fake")
    return out.select(
        "media_id",
        "kind",
        F.length("payload").cast("long").alias("n_bytes"),
        F.col("meta.sample_rate").alias("sample_rate"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )


def mm_audio_mulaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G.711 μ-law transcode over REAL audio payloads (r8 — the audio
    seam's compressed codec, the T.81 parallel): decode each synthesized
    PCM16 WAV, compress through the ITU μ-law tables, re-container as a
    format-tag-7 WAV (media_codecs.encode_wav_mulaw), and re-expand. Per
    duration bucket: clip count and the EXACT byte totals of both
    containers — pure integer functions of doc_id (n = 16·dur_ms samples;
    PCM16 = 44 + 2n bytes, μ-law = 58 + n), so the whole real-codec
    pipeline is hash-certified by a DuckDB oracle stating the same
    arithmetic. Fidelity is gated in-query: any clip whose roundtrip SNR
    falls under 30 dB (μ-law's ~38 dB companding floor minus margin)
    raises inside the UDF and fails the row entirely."""
    import pandas as pd

    # audio <=> doc_id%3=1: push the kind predicate below the synthesizer
    # so the UDF never encodes the image/video payloads this query drops
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 300) & (F.col("doc_id") % 3 == 1)
    )
    media = synthesize_media_from_documents(docs, real_payloads=True).filter(
        F.col("kind") == "audio"
    )

    def fn(batches):
        import numpy as np

        from vers_spark.operators import media_codecs as MC

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                pcm_bytes = bytes(p)
                x, rate = MC.decode_wav(pcm_bytes)
                mu = MC.encode_wav_mulaw(x, rate)
                y = MC.decode_wav(mu)[0].astype(np.float64)
                err = y - x.astype(np.float64)
                sig = float((x.astype(np.float64) ** 2).mean())
                snr = 10.0 * np.log10(sig / max(float((err * err).mean()), 1e-12))
                if snr < 30.0:
                    raise ValueError(f"mu-law SNR {snr:.1f} dB under floor (media {mid})")
                rows.append((int(mid), len(pcm_bytes), len(mu)))
            yield pd.DataFrame(rows, columns=["media_id", "pcm_bytes", "mulaw_bytes"])

    per_clip = media.select("media_id", "payload").mapInPandas(
        fn, "media_id long, pcm_bytes long, mulaw_bytes long"
    )
    # duration bucket: dur_ms = media_id % 80 + 20 → four 20 ms-wide buckets
    bucket = ((F.col("media_id") % 80) / 20).cast("int")
    return (
        per_clip.groupBy(bucket.alias("dur_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clips"),
            F.sum("pcm_bytes").cast("long").alias("sum_pcm_bytes"),
            F.sum("mulaw_bytes").cast("long").alias("sum_mulaw_bytes"),
        )
        .orderBy("dur_bucket")
    )


def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize plumbing (kind filter pushed down, payload+meta rewritten
    in Arrow batches). Flat-scalar output (struct cells crash the driver
    canonicalizer — r3); fake-mode resize truncates/pads the payload to
    width*height bytes, so the byte length and new dims are SQL-stateable —
    full hash oracle."""
    media = synthesize_media_from_documents(load_table(spark, sf_dir, "documents"))
    out = resize_images(media, 8, 4, decode="fake")
    return out.select(
        "media_id",
        "kind",
        F.length("payload").cast("long").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


# Scale defaults for the fingerprint near-dup family (VERDICT r9 #1): ON at
# every shipped call site, sized so they can never bind at oracle-corpus
# scale (both caps exceed the whole sf0.01 corpora, ≤ ~600 fingerprints), so
# the DuckDB twins stay exact BY CONSTRUCTION while a 100 TB corpus's
# exact-dup mega-clusters (blank frames, logos) and degenerate band values
# are bounded. The lsh.rs:132-161 dedup-before-build lesson applied here:
# identical fingerprints collapse to one representative BEFORE the band
# self-join, so a 10M-copy cluster contributes ONE row to every bucket.
PHASH_MAX_BUCKET = 1024  # band-bucket cap over DISTINCT fingerprints
PHASH_MAX_GROUP = 1024  # exact-duplicate clique-expansion cap (star above)


def phash_neardup_pairs(
    fps: DataFrame,
    max_hamming: int = 7,
    max_bucket: int | None = PHASH_MAX_BUCKET,
    probe: DataFrame | None = None,
    max_group: int | None = PHASH_MAX_GROUP,
    n_bands: int | None = None,
    n_hint: int | None = None,
) -> DataFrame:
    """Banded Hamming self-join over dHash fingerprints — the image-modality
    near-dup joiner (text: simhash_neardup_pairs; embeddings:
    embedding_neardup_pairs). ``fps`` is (media_id long, bands array<int>),
    one band key per fingerprint row (media_codecs.dhash_bands), unique
    media_id per row.

    r10 scale restructure (distinct-first): identical fingerprints are
    collapsed FIRST (ONE window shuffle on the bands array: representative =
    min media_id, gsize = partition count), the banded candidate join runs
    over DISTINCT fingerprints only, and member pairs are expanded back
    afterwards — an exact-duplicate mega-cluster (the common case at 100 TB:
    blank frames, logos) puts ONE row in each band bucket instead of making
    the self-join quadratic. Candidates collide on at least one (band_id,
    band_key); pigeonhole makes the join recall-complete for Hamming ≤
    len(bands) - 1 (default 8 bands → 7). Verification is exact: Σ
    bit_count(xor) over the zipped band arrays, all integer, whole-stage
    codegen — and it runs BEFORE the pair dedup, so the dedup shuffle moves
    only the (ultra-selective) surviving scalar triples, never the ~n²/2^bits
    candidate set with its two band arrays per row (1M probe: this ordering
    plus the windowed collapse is the difference between 22 s and minutes).

    ``max_bucket`` (default ON) is the text_dedup.band_candidates skew
    guard, now over DISTINCT fingerprints: band values shared by more than
    max_bucket distinct fingerprints are dropped before the self-join (a
    degenerate band — all-flat images — carries no signal; exact duplicates
    are already collapsed so the cap only ever drops genuinely low-signal
    bands). ``max_group`` (default ON) bounds the pair EXPANSION: groups of
    identical fingerprints larger than max_group emit a star to their
    representative (k-1 pairs) instead of the clique (k²/2) and their
    cross-group edges collapse to representative level — component-
    equivalent output (same connected components, every member reachable),
    which is what the downstream consumers (dedup keep-one, leakage split,
    components) consume. Below the caps the output is the EXACT all-pairs
    set — both defaults exceed the oracle corpora sizes, so the SQL twins
    match by construction (tests/test_phash_scale_defaults.py pins both
    behaviors).

    ``n_hint`` (r11) is an UPPER BOUND on the number of fingerprint rows,
    supplied by callers that already know it (the auto_dhash_grid /
    auto_audio_windows call sites count the roster anyway; fake-mode
    corpora have static bounds). When ``n_hint ≤ min(max_bucket,
    max_group)`` NEITHER cap can bind — a duplicate group and a band
    bucket are both ≤ n — so the staged path's output provably equals the
    direct member-level banded join, and the collapse + expansion stages
    (one window shuffle + two expansion joins) buy nothing: we emit the
    direct join (VERDICT r10 #3). The bypass is a plan simplification
    under a proven-equal precondition, never a semantics switch: at 1M
    fingerprints n_hint exceeds the caps and the staged mega-cluster
    guarantee engages unchanged (tests/test_phash_scale_defaults.py pins
    both the equality and the engagement).

    ``probe`` restricts the RIGHT side of the candidate join to the probe
    rows (micro-batch ingest: new arrivals verify against the accumulated
    store without re-verifying store-store pairs); the left side stays the
    full ``fps`` set. Probe mode joins BOTH orientations before
    canonicalizing (least/greatest), so a probe row whose id is smaller
    than a matching store row's still yields the pair (ADVICE r9 — no
    arrival-order-equals-id-order precondition); max_bucket applies to the
    store side at member level, max_group does not apply (output is bounded
    by the micro-batch size)."""
    from pyspark.sql import Window as W

    from vers_spark.functions.vector import (
        _hamming_words_fixed_unchecked,
        hamming_words,
    )

    if n_bands is not None:
        # the verify fold runs on every banded candidate (~n²/2^bits rows);
        # a statically unrolled sum stays in whole-stage codegen — ~5× over
        # the higher-order fold at 1M (tools/phash_scale_probe.py). Width
        # safety (ADVICE r10) is enforced ONCE PER FINGERPRINT ROW below
        # (assert_band_width on fps/probe), so the per-candidate kernel can
        # skip the guard its public twin carries — two size probes and a
        # branch would otherwise run ~124M times at the 1M corpus.
        def _ham(x, y):
            return _hamming_words_fixed_unchecked(x, y, n_bands)

        def _checked(df: DataFrame) -> DataFrame:
            return df.withColumn(
                "bands",
                F.when(F.size("bands") == n_bands, F.col("bands")).otherwise(
                    F.raise_error(
                        F.format_string(
                            f"phash_neardup_pairs: expected {n_bands}-word"
                            " fingerprints, got %s",
                            F.size("bands").cast("string"),
                        )
                    ).cast(df.schema["bands"].dataType.simpleString())
                ),
            )

        fps = _checked(fps)
        if probe is not None:
            probe = _checked(probe)
    else:
        _ham = hamming_words

    def _drop_big_buckets(chunks: DataFrame) -> DataFrame:
        """Skew guard as a broadcastable ANTI-join: the oversized-bucket
        list is near-empty in a healthy corpus (avg bucket = n/2^bits), so
        AQE turns this into a broadcast anti-join and the exploded chunk
        set is never shuffled for the cap — only the narrow (band_id,
        band_key) pairs flow through the size aggregation. A/B'd at 1M
        against a window-count guard (whose partitioning the join could
        reuse): the window's full-width sort costs ~10 s more than the
        join exchange it saves (53.4 s vs 62-65 s, BASELINE.md §r10).

        NULL band keys are dropped up front (ADVICE r10): no shipped
        fingerprint kernel emits them, but a NULL key matches in NEITHER
        the candidate equi-join (contributing nothing) NOR this anti-join
        (surviving it), so without the filter the retained-vs-dropped
        fate of a NULL-key row would silently depend on which guard shape
        is active. The explicit filter makes the contract
        partitioning-independent: NULL band → no candidacy, ever."""
        chunks = chunks.filter(F.col("band_key").isNotNull())
        if max_bucket is None:
            return chunks
        sizes = chunks.groupBy("band_id", "band_key").agg(
            F.count(F.lit(1)).alias("_bsz")
        )
        return chunks.join(
            sizes.filter(F.col("_bsz") > max_bucket).drop("_bsz"),
            ["band_id", "band_key"],
            "left_anti",
        )

    if probe is not None:
        chunks = _drop_big_buckets(
            fps.select(
                "media_id",
                "bands",
                F.posexplode("bands").alias("band_id", "band_key"),
            )
        )
        a = chunks.select(
            F.col("media_id").alias("_id_x"), F.col("bands").alias("bands_x"),
            "band_id", "band_key",
        )
        p = probe.select(
            "media_id", "bands", F.posexplode("bands").alias("band_id", "band_key")
        ).select(
            F.col("media_id").alias("_id_p"), F.col("bands").alias("bands_p"),
            "band_id", "band_key",
        )
        return (
            a.join(p, ["band_id", "band_key"])
            .filter(F.col("_id_x") != F.col("_id_p"))
            .withColumn("hamming", _ham(F.col("bands_x"), F.col("bands_p")))
            .filter(F.col("hamming") <= max_hamming)
            .select(
                F.least("_id_x", "_id_p").alias("media_a"),
                F.greatest("_id_x", "_id_p").alias("media_b"),
                "hamming",
            )
            .dropDuplicates(["media_a", "media_b"])
        )

    if (
        n_hint is not None
        and (max_bucket is None or n_hint <= max_bucket)
        and (max_group is None or n_hint <= max_group)
    ):
        # small-corpus bypass (see n_hint in the docstring): caps provably
        # can't bind at n ≤ min(caps), so the direct member-level banded
        # join IS the staged path's output — minus one window shuffle and
        # two expansion joins. No skew guard either: a bucket holds ≤ n ≤
        # max_bucket members by the same bound.
        chunks = fps.select(
            "media_id", "bands", F.posexplode("bands").alias("band_id", "band_key")
        ).filter(F.col("band_key").isNotNull())
        da = chunks.select(
            F.col("media_id").alias("_ida"), F.col("bands").alias("bands_a"),
            "band_id", "band_key",
        )
        db = chunks.select(
            F.col("media_id").alias("_idb"), F.col("bands").alias("bands_b"),
            "band_id", "band_key",
        )
        return (
            da.join(db, ["band_id", "band_key"])
            .filter(F.col("_ida") < F.col("_idb"))
            .withColumn("hamming", _ham(F.col("bands_a"), F.col("bands_b")))
            .filter(F.col("hamming") <= max_hamming)
            .select(
                F.col("_ida").alias("media_a"),
                F.col("_idb").alias("media_b"),
                "hamming",
            )
            .dropDuplicates(["media_a", "media_b"])
        )

    # -- stage 1: collapse exact-duplicate fingerprints with ONE window
    # shuffle (array partition key is exact — no hash-collision risk); the
    # distinct set is the rep's own row, so no second join is needed --
    wb = W.partitionBy("bands")
    members = fps.select(
        "media_id",
        "bands",
        F.min("media_id").over(wb).alias("rep"),
        F.count(F.lit(1)).over(wb).alias("gsize"),
    )
    groups = members.filter(F.col("media_id") == F.col("rep"))

    # -- stage 2: banded candidate join over DISTINCT fingerprints --
    chunks = _drop_big_buckets(
        groups.select(
            "rep", "bands", F.posexplode("bands").alias("band_id", "band_key")
        )
    )
    a = chunks.select(
        F.col("rep").alias("rep_a"), F.col("bands").alias("bands_a"),
        "band_id", "band_key",
    )
    b = chunks.select(
        F.col("rep").alias("rep_b"), F.col("bands").alias("bands_b"),
        "band_id", "band_key",
    )
    rpairs = (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("rep_a") < F.col("rep_b"))
        # hamming BEFORE the pair dedup: the verify filter is ultra-selective,
        # so dedup shuffles surviving scalar triples, not array-carrying
        # candidates (a duplicated candidate costs one extra codegen'd fold,
        # not a shuffle write)
        .withColumn("hamming", _ham(F.col("bands_a"), F.col("bands_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("rep_a", "rep_b", "hamming")
        .dropDuplicates(["rep_a", "rep_b"])
    )

    # -- stage 3: expand back to member pairs (output-size-bound work) --
    big = (
        F.lit(False) if max_group is None else (F.col("gsize") > F.lit(max_group))
    )
    m = members.select("media_id", "rep", "gsize").withColumn("_big", big)
    # intra pairs self-join on the BANDS key, not rep: both sides inherit
    # the stage-1 window's hash partitioning and sort on bands, so the SMJ
    # needs no exchange and no re-sort (rep is a function of bands — the
    # join sets are identical)
    sms = members.filter(~big).select("bands", "media_id")
    xa = sms.select("bands", F.col("media_id").alias("media_a"))
    xb = sms.select("bands", F.col("media_id").alias("media_b"))
    intra = (
        xa.join(xb, "bands")
        .filter(F.col("media_a") < F.col("media_b"))
        .select("media_a", "media_b")
    )
    star = m.filter(F.col("_big") & (F.col("media_id") != F.col("rep"))).select(
        F.col("rep").alias("media_a"), F.col("media_id").alias("media_b")
    )
    intra_all = intra.unionByName(star).withColumn(
        "hamming", F.lit(0).cast("long")
    )
    ga = m.select(
        F.col("rep").alias("rep_a"), F.col("media_id").alias("_ma"),
        F.col("_big").alias("_biga"),
    )
    gb = m.select(
        F.col("rep").alias("rep_b"), F.col("media_id").alias("_mb"),
        F.col("_big").alias("_bigb"),
    )
    cross = (
        rpairs.join(ga, "rep_a")
        .join(gb, "rep_b")
        .filter(
            (~F.col("_biga") & ~F.col("_bigb"))
            | ((F.col("_ma") == F.col("rep_a")) & (F.col("_mb") == F.col("rep_b")))
        )
        .select(
            F.least("_ma", "_mb").alias("media_a"),
            F.greatest("_ma", "_mb").alias("media_b"),
            "hamming",
        )
    )
    return cross.unionByName(intra_all.select("media_a", "media_b", "hamming"))


def phash_fake_bands(src: int, is_dup: bool, fi: int = 0) -> list[int]:
    """The fake-mode dHash fingerprint — ONE definition of the quadratic
    grid shared by mm_phash_neardup_fake, mm_video_phash_fake, the leakage
    split, and the streaming gate (its SQL twin is _phash_bands_cte):
    v(i) = ((src%251 + 1)·i² + (src%241 + 13·fi)·i + src) mod 256 over an
    8×9 grid, through the REAL dHash kernel; ``fi`` is the video frame
    index bending the linear term (fi=0 ≡ the single-image formula); a
    duplicate copy perturbs cell 0 by +128 (≤1 bit flips per frame)."""
    import numpy as np

    from vers_spark.operators import media_codecs as MC

    i = np.arange(72, dtype=np.int64)
    v = ((src % 251 + 1) * i * i + (src % 241 + 13 * fi) * i + src) % 256
    if is_dup:
        v = v.copy()
        v[0] = (v[0] + 128) % 256
    g = v.reshape(8, 9)
    return MC.dhash_bands(np.stack([g, g, g], axis=-1).astype(np.uint8))


def _phash_bands_cte(kind_rem: int, frames: int | None = None) -> str:
    """The SQL restatement of :func:`phash_fake_bands` — the ONE oracle-side
    definition composed into every fake-fingerprint oracle (image pairs,
    video, streaming gate; the leakage split composes the pairs oracle).
    ``frames=N`` adds the frame dimension: fi bends the linear term by
    13·fi and the duplicate perturbs cell 0 of EVERY frame. Yields the CTE
    chain ``imgs → [fr] → idx → cells → bits → bands`` (bands carry fi when
    framed)."""
    fr = f"fr AS (SELECT unnest(range({frames})) AS fi),\n    " if frames else ""
    fi_col = "fi, " if frames else ""
    fi_cross = " CROSS JOIN fr" if frames else ""
    fi_eq = " AND c2.fi = c1.fi" if frames else ""
    fi_c1 = "c1.fi, " if frames else ""
    lin = "(src % 241 + 13 * fi)" if frames else "(src % 241)"
    return f"""imgs AS (
        SELECT doc_id AS media_id, doc_id AS src, 0 AS is_dup
        FROM documents WHERE doc_id < 200 AND doc_id % 3 = {kind_rem}
        UNION ALL
        SELECT doc_id + 10000, doc_id, 1
        FROM documents
        WHERE doc_id < 200 AND doc_id % 3 = {kind_rem} AND doc_id % 2 = 0
    ),
    {fr}idx AS (SELECT unnest(range(72)) AS i),
    cells AS (
        SELECT media_id, {fi_col}i,
               ((((src % 251 + 1) * i * i + {lin} * i + src) % 256)
                + CASE WHEN is_dup = 1 AND i = 0 THEN 128 ELSE 0 END) % 256 AS v
        FROM imgs{fi_cross} CROSS JOIN idx
    ),
    bits AS (
        SELECT c1.media_id, {fi_c1}c1.i // 9 AS y, c1.i % 9 AS x,
               CASE WHEN c2.v > c1.v THEN 1 ELSE 0 END AS bit
        FROM cells c1
        JOIN cells c2 ON c2.media_id = c1.media_id{fi_eq} AND c2.i = c1.i + 1
        WHERE c1.i % 9 < 8
    ),
    bands AS (
        SELECT media_id, {fi_col}y AS band_id,
               CAST(SUM(bit * (1 << x)) AS BIGINT) AS band_key
        FROM bits GROUP BY media_id, {fi_col}y
    )"""


def _phash_roster(docs: DataFrame, dup_offset: int) -> DataFrame:
    """(media_id, src_id, is_dup): every image doc plus an injected
    near-duplicate copy of every second one at src_id + dup_offset."""
    base = docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("doc_id").alias("src_id"),
        F.lit(0).alias("is_dup"),
    )
    dups = docs.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") + dup_offset).alias("media_id"),
        F.col("doc_id").alias("src_id"),
        F.lit(1).alias("is_dup"),
    )
    return base.unionByName(dups)


def mm_image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup over REAL images — the image-modality dedup
    a training-data pipeline needs (text ✓ MinHash/SimHash, embeddings ✓
    cosine; this closes images): synthesize baseline-JPEG payloads from the
    shared generator (multimodal.phash_source_pixels), inject a re-encoded
    near-duplicate of every second image (±2 pixel wobble, fresh encoder
    pass), decode, fingerprint with the integer dHash kernel
    (media_codecs.dhash_bands), and band-join at Hamming ≤ 7
    (pigeonhole-complete). Fixed 120-image sample by design (the media-line
    discipline: cost is per-payload, corpus-size-independent; scale is
    embarrassingly parallel over payload rows).

    Rows-only (JPEG decode is not SQL-expressible); the injected-duplicate
    recovery gate and kernel units live in tests/test_multimodal_real.py,
    and the banding plumbing carries a full hash oracle via the fake twin
    (mm_phash_neardup_fake). Output certifies recovery in-query:
    n_injected_recovered counts found (src, src+100000) pairs and
    max_injected_hamming shows the roundtrip-stability margin."""
    import pandas as pd

    from vers_spark.operators.media_codecs import auto_dhash_grid

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 360) & (F.col("doc_id") % 3 == 0)
    )
    roster = _phash_roster(docs, 100000)
    # corpus-count auto band width (r10: VERDICT r9 #1 — one cheap count
    # over the slim roster picks the 64- vs 256-bit layout); the same count
    # is the n_hint that lets the banded join skip its collapse stages
    # below the caps (r11)
    n_fp = roster.count()
    g_rows, g_cols = auto_dhash_grid(n_fp)
    roster = roster.repartition(16, "media_id")

    def synth(batches):
        from vers_spark.operators import media_codecs as MC
        from vers_spark.operators.multimodal import phash_source_pixels

        for pdf in batches:
            if pdf.empty:
                continue
            rows = [
                (int(m), MC.encode_jpeg(phash_source_pixels(int(s), perturb=bool(d))))
                for m, s, d in zip(pdf["media_id"], pdf["src_id"], pdf["is_dup"])
            ]
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    media = roster.mapInPandas(synth, "media_id long, payload binary")

    def fingerprint(batches):
        from vers_spark.operators import media_codecs as MC

        for pdf in batches:
            if pdf.empty:
                continue
            rows = [
                (int(m), MC.dhash_bands(MC.decode_image(bytes(p)), g_rows, g_cols))
                for m, p in zip(pdf["media_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=["media_id", "bands"])

    # decode+fingerprint feeds both sides of the banded self-join (the
    # broadcast build side cannot reuse the probe side's work), so without
    # materialization every payload is synthesized and decoded TWICE
    # (r14 plan: 4 MapInPandas nodes -> 2)
    fps = media.mapInPandas(
        fingerprint, "media_id long, bands array<int>"
    ).localCheckpoint(eager=True)
    pairs = phash_neardup_pairs(
        fps, max_hamming=g_rows - 1, n_bands=g_rows, n_hint=n_fp
    )
    injected = F.col("media_b") == F.col("media_a") + 100000
    return (
        pairs.select(
            F.lit(1).alias("_g"),
            F.when(injected, F.col("hamming")).alias("inj_ham"),
            F.when(injected, 1).otherwise(0).alias("is_inj"),
        )
        .groupBy("_g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_neardup_pairs"),
            F.sum("is_inj").cast("long").alias("n_injected_recovered"),
            F.max("inj_ham").cast("long").alias("max_injected_hamming"),
        )
        .drop("_g")
    )


def mm_phash_neardup_fake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake-mode twin of mm_image_phash_neardup carrying a FULL hash oracle
    (the mm_frame_sample discipline): the "image" is an 8×9 integer grid
    v(i) = ((src%251 + 1)·i² + (src%241)·i + src) mod 256 stacked to three
    equal channels, so the REAL dHash kernel's grayscale ((3v)//3 = v) and
    identity downsample run integer-exact and every bit, band key, candidate
    pair, and Hamming distance is restated in SQL over the documents table.
    The injected duplicate (src + 10000) perturbs only cell 0 by +128 mod
    256, flipping at most bit (0,0) — Hamming ≤ 1, so the pigeonhole
    recovery guarantee is certified by the oracle, not just asserted."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 200) & (F.col("doc_id") % 3 == 0)
    )
    roster = _phash_roster(docs, 10000)

    def fingerprint(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            yield pd.DataFrame(
                [
                    (int(m), phash_fake_bands(int(s), bool(d)))
                    for m, s, d in zip(pdf["media_id"], pdf["src_id"], pdf["is_dup"])
                ],
                columns=["media_id", "bands"],
            )

    fps = roster.mapInPandas(
        fingerprint, "media_id long, bands array<int>"
    ).localCheckpoint(eager=True)  # one Python pass, not one per join side
    # n_hint: static bound — doc_id < 200 caps the base roster at 200 and
    # the injected dups at 100 (every second), so ≤ 300 fingerprints
    return phash_neardup_pairs(fps, max_hamming=7, n_bands=8, n_hint=300)


def video_pair_overlap(
    frame_fps: DataFrame,
    max_hamming: int = 7,
    n_bands: int | None = None,
    n_hint: int | None = None,
) -> DataFrame:
    """Video-level near-dup from FRAME fingerprints: band-join all frames
    (the shared phash_neardup_pairs, frame ids packed as media_id·2²⁰ +
    frame_idx — room for 1M-frame videos and media ids to 2⁴³; the packing
    also preserves (video, frame) order, so media_a < media_b still means
    "earlier video"), then aggregate matched frames per video pair.
    Returns (media_a, media_b, matched_a, matched_b): how many DISTINCT
    frames of each side found a ≤max_hamming partner in the other. Callers
    compare matched_* against the videos' frame counts (containment
    semantics — a clip wholly inside a longer video still scores
    matched_a = n_frames(a)).

    Scale shape: the frame join inherits the banded join's properties
    (band-key buckets, skew guard, small-corpus bypass — ``n_hint`` here
    bounds the FRAME count, videos × frames); the video aggregation is one
    groupBy over surviving frame pairs — no all-pairs video work ever
    happens."""
    _P = 1 << 20
    packed = frame_fps.select(
        (F.col("media_id") * _P + F.col("frame_idx")).alias("media_id"), "bands"
    )
    fpairs = phash_neardup_pairs(packed, max_hamming, n_bands=n_bands, n_hint=n_hint)
    va = F.expr(f"media_a div {_P}")
    vb = F.expr(f"media_b div {_P}")
    return (
        fpairs.select(
            va.alias("va"),
            F.expr(f"media_a % {_P}").alias("fa"),
            vb.alias("vb"),
            F.expr(f"media_b % {_P}").alias("fb"),
        )
        .filter(F.col("va") != F.col("vb"))
        .groupBy(F.col("va").alias("media_a"), F.col("vb").alias("media_b"))
        .agg(
            F.countDistinct("fa").cast("long").alias("matched_a"),
            F.countDistinct("fb").cast("long").alias("matched_b"),
        )
    )


def mm_video_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup over REAL containers — the composition a training
    pipeline actually faces: THE SAME CONTENT shipped in different
    containers/encodes must dedup. Corpus: 40 videos (4 block-content
    frames each, multimodal.video_source_frames) as MJPEG elementary
    streams; every second video also arrives as an ISO BMFF/MP4 of the
    IDENTICAL frames (container dup, +100000), every other one as a
    RIFF-AVI of ±2-wobble re-encoded frames (re-encode dup, +200000).
    One pipeline handles the mix: split_video_stream sniffs the container,
    every frame is dHash-fingerprinted, and video_pair_overlap aggregates
    the banded frame join into per-pair matched-frame counts. A pair is a
    near-dup when EVERY frame on both sides matched. Rows-only (JPEG +
    container walks); recovery gates in tests/test_multimodal_real.py."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 120) & (F.col("doc_id") % 3 == 2)
    )
    base = docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("doc_id").alias("src_id"),
        F.lit("mjpeg").alias("container"),
        F.lit(0).alias("is_dup"),
    )
    container_dups = docs.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") + 100000).alias("media_id"),
        F.col("doc_id").alias("src_id"),
        F.lit("mp4").alias("container"),
        F.lit(0).alias("is_dup"),
    )
    reencode_dups = docs.filter(F.col("doc_id") % 2 == 1).select(
        (F.col("doc_id") + 200000).alias("media_id"),
        F.col("doc_id").alias("src_id"),
        F.lit("avi").alias("container"),
        F.lit(1).alias("is_dup"),
    )
    from vers_spark.operators.media_codecs import auto_dhash_grid

    roster = base.unionByName(container_dups).unionByName(reencode_dups)
    # auto band width keyed on the FRAME count (4 frames/video here) — the
    # banded join runs over frame fingerprints, so frames are the corpus
    n_frames = roster.count() * 4
    g_rows, g_cols = auto_dhash_grid(n_frames)
    roster = roster.repartition(16, "media_id")

    def fingerprint(batches):
        from vers_spark.operators import media_codecs as MC
        from vers_spark.operators.multimodal import video_source_frames

        enc = {
            "mjpeg": MC.encode_mjpeg,
            "avi": MC.encode_avi_mjpeg,
            "mp4": MC.encode_mp4_mjpeg,
        }
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for m, s, c, d in zip(
                pdf["media_id"], pdf["src_id"], pdf["container"], pdf["is_dup"]
            ):
                payload = enc[c](video_source_frames(int(s), perturb=bool(d)))
                for fi, fr in enumerate(MC.split_video_stream(payload)):
                    rows.append(
                        (int(m), fi, MC.dhash_bands(MC.decode_image(fr), g_rows, g_cols))
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "bands"])

    # container-walk + JPEG decode runs once, not once per join side
    # (the mm_image materialization rationale)
    fps = roster.mapInPandas(
        fingerprint, "media_id long, frame_idx int, bands array<int>"
    ).localCheckpoint(eager=True)
    pairs = video_pair_overlap(
        fps, max_hamming=g_rows - 1, n_bands=g_rows, n_hint=n_frames
    )
    # every video here has 4 frames (doc_id ≡ 2 mod 3 → n_frames = 4)
    full = pairs.filter((F.col("matched_a") == 4) & (F.col("matched_b") == 4))
    container = F.col("media_b") == F.col("media_a") + 100000
    reencode = F.col("media_b") == F.col("media_a") + 200000
    return (
        full.select(
            F.lit(1).alias("_g"),
            F.when(container, 1).otherwise(0).alias("is_c"),
            F.when(reencode, 1).otherwise(0).alias("is_r"),
        )
        .groupBy("_g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_neardup_pairs"),
            F.sum("is_c").cast("long").alias("n_container_dups_recovered"),
            F.sum("is_r").cast("long").alias("n_reencode_dups_recovered"),
        )
        .drop("_g")
    )


def mm_video_phash_fake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake-mode twin of mm_video_phash_neardup with a FULL hash oracle —
    certifies the frame-to-video AGGREGATION layer (fid packing, frame
    band join, matched-frame counts) that the image twin doesn't cover:
    each "video" is 4 integer quadratic grids (frame fi bends the linear
    term: v(i) = ((src%251+1)·i² + (src%241 + 13·fi)·i + src) mod 256),
    run through the REAL dHash kernel and the REAL video_pair_overlap.
    The injected duplicate (src + 10000) perturbs cell 0 of every frame by
    +128 — ≤1 bit per frame, so all 4 frames must match under the
    pigeonhole bound, restated in SQL."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 200) & (F.col("doc_id") % 3 == 2)
    )
    roster = _phash_roster(docs, 10000)

    def fingerprint(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            rows = [
                (int(m), fi, phash_fake_bands(int(s), bool(d), fi))
                for m, s, d in zip(pdf["media_id"], pdf["src_id"], pdf["is_dup"])
                for fi in range(4)
            ]
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "bands"])

    fps = roster.mapInPandas(
        fingerprint, "media_id long, frame_idx int, bands array<int>"
    ).localCheckpoint(eager=True)  # one Python pass, not one per join side
    # n_hint: doc_id < 200 ∧ doc_id ≡ 2 (mod 3) caps the base roster at 67
    # videos (+ ≤ 34 every-second dups) = ≤ 101 videos × 4 frames ≤ 404
    # frame fingerprints — static bound, below the default caps
    return video_pair_overlap(fps, max_hamming=7, n_bands=8, n_hint=404)


def mm_phash_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE train/val/test split for the IMAGE corpus — the
    within-modality complement of neardup_leakage_split (text): assignment
    keys on the dHash near-dup COMPONENT, so a near-duplicate of a training
    image can never land in eval (the image-benchmark contamination path).
    Runs on the fake-mode fingerprint corpus so the WHOLE composition —
    dHash bits → banded pairs → connected components → component-keyed
    split hash → cross-split audit — carries a full DuckDB hash oracle
    (recursive-CTE transitive closure, the neardup_leakage_split pattern);
    the real-decode corpus runs the same code on mm_image_phash_neardup's
    fingerprints. n_cross_pairs is recomputed from the pair table and is 0
    BY CONSTRUCTION — a regression in the component build or the
    assignment breaks the hash. Scale shape: one broadcast join of the
    component table, one hash per image; no all-pairs work."""
    from vers_spark.functions.text import stable_hash60
    from vers_spark.operators.graph import connected_components

    pairs = mm_phash_neardup_fake(spark, sf_dir).localCheckpoint(eager=False)
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 200) & (F.col("doc_id") % 3 == 0)
    )
    roster = _phash_roster(docs, 10000).select("media_id")
    comp = connected_components(pairs, src="media_a", dst="media_b")
    asg = (
        roster.join(comp.withColumnRenamed("node", "media_id"), "media_id", "left")
        .select(
            "media_id", F.coalesce("component", F.col("media_id")).alias("component")
        )
    )
    bucket = (
        stable_hash60(F.concat(F.lit("msplit:"), F.col("component").cast("string")))
        % 100
    )
    asg = asg.withColumn(
        "split",
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test")),
    ).localCheckpoint(eager=False)
    cross = (
        pairs.join(
            asg.select(F.col("media_id").alias("media_a"), F.col("split").alias("_sa")),
            "media_a",
        )
        .join(
            asg.select(F.col("media_id").alias("media_b"), F.col("split").alias("_sb")),
            "media_b",
        )
        .filter(F.col("_sa") != F.col("_sb"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_cross_pairs"))
    )
    return (
        asg.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_media"),
            F.countDistinct("component").cast("long").alias("n_components"),
        )
        .crossJoin(F.broadcast(cross))
        .orderBy("split")
    )


def mm_audio_fp_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-fingerprint near-dup over REAL PCM — closes the last dedup
    modality (text ✓, embeddings ✓, images ✓ mm_image_phash_neardup):
    synthesize WAV clips from the shared generator
    (multimodal.audio_source_samples — AM sine, ≥1.4× envelope contrast
    between windows), inject a re-mastered near-duplicate of every second
    clip (×0.97 gain + dither — the transform a fingerprint must survive),
    decode, fingerprint with the integer windowed-energy-delta kernel
    (media_codecs.audio_energy_bands — gain-invariant delta signs), and
    reuse the SAME banded Hamming join as the image path
    (phash_neardup_pairs). Fixed 120-clip sample by design; scale is
    per-payload parallel. Rows-only (PCM synthesis uses sin); the recovery
    gate lives in tests/test_multimodal_real.py and the banding plumbing's
    hash oracle is carried by mm_audio_fp_fake."""
    import pandas as pd

    from vers_spark.operators.media_codecs import auto_audio_windows

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 360) & (F.col("doc_id") % 3 == 1)
    )
    roster = _phash_roster(docs, 100000)
    # corpus-count auto band width (r10) — 65×8 below 100k clips, 257×16 at
    # scale; same dial as the image path's auto_dhash_grid
    n_fp = roster.count()
    n_win, b_bits = auto_audio_windows(n_fp)
    n_bands = (n_win - 1) // b_bits
    roster = roster.repartition(16, "media_id")

    def synth(batches):
        from vers_spark.operators import media_codecs as MC
        from vers_spark.operators.multimodal import audio_source_samples

        for pdf in batches:
            if pdf.empty:
                continue
            rows = [
                (
                    int(m),
                    MC.encode_wav(audio_source_samples(int(s), perturb=bool(d)), 16000),
                )
                for m, s, d in zip(pdf["media_id"], pdf["src_id"], pdf["is_dup"])
            ]
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    media = roster.mapInPandas(synth, "media_id long, payload binary")

    def fingerprint(batches):
        from vers_spark.operators import media_codecs as MC

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for m, p in zip(pdf["media_id"], pdf["payload"]):
                samples, _rate = MC.decode_wav(bytes(p))
                rows.append((int(m), MC.audio_energy_bands(samples, n_win, b_bits)))
            yield pd.DataFrame(rows, columns=["media_id", "bands"])

    # decode+fingerprint feeds both sides of the banded self-join (the
    # broadcast build side cannot reuse the probe side's work), so without
    # materialization every payload is synthesized and decoded TWICE
    # (r14 plan: 4 MapInPandas nodes -> 2)
    fps = media.mapInPandas(
        fingerprint, "media_id long, bands array<int>"
    ).localCheckpoint(eager=True)
    pairs = phash_neardup_pairs(
        fps, max_hamming=n_bands - 1, n_bands=n_bands, n_hint=n_fp
    )
    injected = F.col("media_b") == F.col("media_a") + 100000
    return (
        pairs.select(
            F.lit(1).alias("_g"),
            F.when(injected, F.col("hamming")).alias("inj_ham"),
            F.when(injected, 1).otherwise(0).alias("is_inj"),
        )
        .groupBy("_g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_neardup_pairs"),
            F.sum("is_inj").cast("long").alias("n_injected_recovered"),
            F.max("inj_ham").cast("long").alias("max_injected_hamming"),
        )
        .drop("_g")
    )


def mm_audio_fp_fake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake-mode twin of mm_audio_fp_neardup with a FULL hash oracle: the
    "PCM" is the document's per-character CODE POINTS cycled to 520 samples
    (65 windows × 8; ord(c) ≡ DuckDB ascii(substring(text,i,1)) for ANY
    character, so the twin is exact by construction even off the all-ASCII
    corpus — ADVICE r9), run through the REAL windowed-energy kernel
    (media_codecs.audio_energy_bands — int64 sums of squares, delta signs,
    8×8-bit band keys) and the REAL banded join, so every energy, bit,
    band key, candidate pair, and Hamming distance is restated in SQL over
    the documents table. The injected duplicate (src + 10000) adds 1 to
    sample 0 only — at most bit 0 flips, Hamming ≤ 1, certifying the
    pigeonhole recovery guarantee under the oracle."""
    import numpy as np
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 200) & (F.col("doc_id") % 3 == 1)
    )
    base = docs.select(
        F.col("doc_id").alias("media_id"), "text", F.lit(0).alias("is_dup")
    )
    dups = docs.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") + 10000).alias("media_id"), "text", F.lit(1).alias("is_dup")
    )
    roster = base.unionByName(dups)

    def fingerprint(batches):
        from vers_spark.operators import media_codecs as MC

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for m, t, d in zip(pdf["media_id"], pdf["text"], pdf["is_dup"]):
                # code points, not UTF-8 bytes: mirrors the oracle's
                # ascii(substring(text, i % length(text) + 1, 1)) exactly
                cp = np.fromiter((ord(c) for c in t), dtype=np.int64, count=len(t))
                s = np.resize(cp, 520)
                if int(d):
                    s = s.copy()
                    s[0] += 1
                rows.append((int(m), MC.audio_energy_bands(s)))
            yield pd.DataFrame(rows, columns=["media_id", "bands"])

    fps = roster.mapInPandas(
        fingerprint, "media_id long, bands array<int>"
    ).localCheckpoint(eager=True)  # one Python pass, not one per join side
    # n_hint: doc_id < 200 ∧ doc_id ≡ 1 (mod 3) → ≤ 67 base + ≤ 34 dups
    # = ≤ 101 fingerprints (static bound, below the default caps)
    return phash_neardup_pairs(fps, max_hamming=7, n_bands=8, n_hint=101)


_SQE = (
    "list_reduce(list_transform(list_zip({a}, {b}),"
    " s -> (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE)) * (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE))),"
    " (x,y) -> x + y)"
)

_AUG = """(
    SELECT vec_id, embedding FROM embeddings
    UNION ALL
    SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 11 = 0
)"""

# f64 normalize mirroring functions.vector.normalize (left-fold magnitude,
# <1e-6 identity guard), then cosine distance = 1 − dot on the unit vectors
_NORM_CTE = """
    n AS (
        SELECT vec_id,
               CASE WHEN mag < 1e-6 THEN dl
                    ELSE list_transform(dl, x -> x / mag) END AS ne
        FROM (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dl,
                   sqrt(list_reduce(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a + b)) AS mag
            FROM corpus
        )
    )
"""

_DOT_NN = (
    "list_reduce(list_transform(list_zip({a}, {b}), s -> s[1] * s[2]), (x,y) -> x + y)"
)

ORACLE_SQL: dict[str, str] = {
    "emb_neardup_pairs": f"""
        WITH corpus AS {_AUG}
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               {_SQE.format(a='a.embedding', b='b.embedding')} AS distance
        FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        WHERE {_SQE.format(a='a.embedding', b='b.embedding')} <= {NEARDUP_THRESHOLD}
    """,
    "emb_cosine_neardup": f"""
        WITH corpus AS {_AUG}, {_NORM_CTE}
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               1.0 - {_DOT_NN.format(a='a.ne', b='b.ne')} AS cos_distance
        FROM n a JOIN n b ON a.vec_id < b.vec_id
        WHERE 1.0 - {_DOT_NN.format(a='a.ne', b='b.ne')} <= {COS_THRESHOLD}
    """,
    # MLlib MinHashLSH at Jaccard distance 0 ≡ identical-shingle-set pairs;
    # the exact-Jaccard join at threshold 1.0 is the same set
    "doc_mllib_exactdup": None,  # filled below (needs text_dedup fragments)
    # MLlib BRP fast path finds exactly the exact-dup pairs at this threshold;
    # their squared distance is exactly 0.0 in both engines
    "emb_brp_neardup": f"""
        WITH corpus AS {_AUG}
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               {_SQE.format(a='a.embedding', b='b.embedding')} AS distance
        FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        WHERE {_SQE.format(a='a.embedding', b='b.embedding')} <= 0.25
    """,
}

def _doc_mllib_oracle() -> str:
    from vers_spark.operators.text_dedup_queries import (
        _d_augmented,
        _jaccard_tail_sql,
    )

    return "WITH " + _jaccard_tail_sql(
        _d_augmented(5, ""),
        """cand AS (
            SELECT DISTINCT sa.doc_id AS doc_a, sb.doc_id AS doc_b
            FROM sh sa JOIN sh sb ON sa.shingle = sb.shingle
            WHERE sa.doc_id < sb.doc_id
        )""",
        1.0,
    )


ORACLE_SQL["doc_mllib_exactdup"] = _doc_mllib_oracle()

ORACLE_SQL["emb_knn_selfjoin_exact"] = f"""
    SELECT query_id, neighbour_id, distance, rank FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbour_id,
               {_SQE.format(a='a.embedding', b='b.embedding')} AS distance,
               row_number() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY {_SQE.format(a='a.embedding', b='b.embedding')} ASC, b.vec_id ASC
               ) AS rank
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    ) WHERE rank <= 3
"""

# r10 (VERDICT r9 #3): the cosine co-located join over the deterministic
# fixed-point build — oracle lives next to the Lloyd CTE machinery it unrolls
from vers_spark.operators.index_queries import _emb_simjoin_cos_sql  # noqa: E402

ORACLE_SQL["emb_similarity_join"] = _emb_simjoin_cos_sql()

ORACLE_SQL["mm_meta_stats"] = """
    WITH m AS (
        SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                    WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
               octet_length(encode(text)) AS payload_bytes,
               CAST(n_chars % 640 + 1 AS INT) AS width,
               CAST(n_chars % 480 + 1 AS INT) AS height,
               CAST(n_chars * 10 AS BIGINT) AS duration_ms
        FROM documents
    )
    SELECT kind,
           CAST(count(*) AS BIGINT) AS n_media,
           CAST(sum(payload_bytes) AS BIGINT) AS sum_payload_bytes,
           min(width) AS min_width,
           max(height) AS max_height,
           CAST(sum(duration_ms) AS BIGINT) AS sum_duration_ms
    FROM m GROUP BY kind ORDER BY kind
"""

def _feature_oracle() -> str:
    """SQL twin of multimodal._fake_features projected to the query's
    scalars: sha256(payload utf-8) digest bytes read as LITTLE-ENDIAN
    uint32 words / uint32-max, rounded to f32 (DuckDB FLOAT). dim=16 over
    a 32-byte digest means words 8-15 repeat 0-7, so 8 parsed words cover
    min/max and the ordered 16-element fold is v8 || v8. Hex nibbles parse
    via the shared strpos idiom (D_HASH60 in text_analysis)."""

    def hexpair(p: int) -> str:
        return (
            f"((strpos('0123456789abcdef', substr(h, {p}, 1)) - 1) * 16"
            f" + (strpos('0123456789abcdef', substr(h, {p + 1}, 1)) - 1))"
        )

    words = []
    for j in range(8):
        base = j * 8 + 1
        b = [hexpair(base + 2 * k) for k in range(4)]
        words.append(
            f"({b[0]} + 256 * {b[1]} + 65536 * {b[2]} + 16777216 * {b[3]})"
        )
    vals = ",\n               ".join(
        f"CAST(CAST({w} AS DOUBLE) / 4294967295.0 AS FLOAT)" for w in words
    )
    return f"""
        WITH m AS (
            SELECT CAST(doc_id AS BIGINT) AS media_id,
                   CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                        ELSE 'video' END AS kind,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   sha256(text) AS h
            FROM documents
        ), f AS (
            SELECT media_id, kind, n_bytes,
               [{vals}] AS v8
            FROM m
        )
        SELECT media_id, kind, n_bytes,
               CAST(16 AS INT) AS feature_dim,
               CAST(list_min(v8) AS DOUBLE) AS f_min,
               CAST(list_max(v8) AS DOUBLE) AS f_max,
               CAST(round(list_reduce(list_transform(v8 || v8,
                        x -> CAST(x AS DOUBLE)), (a, b) -> a + b) * 1e6)
                    AS BIGINT) AS f_sum_fp
        FROM f
    """


ORACLE_SQL["mm_feature_extract"] = _feature_oracle()

# Fake-mode frame sampling is integer payload slicing: video rows are
# doc_id % 3 = 2, payload = utf-8 text bytes, duration = n_chars * 10,
# n_frames = GREATEST(duration // 1000, 1), chunk = GREATEST(len //
# n_frames, 1), frame i = payload[i*chunk : (i+1)*chunk] — length and md5
# both SQL-stateable (DuckDB substring/md5 operate on BLOBs).
# DuckDB has no BLOB substring, so slices are stated over the VARCHAR —
# byte-identical because the corpus is ASCII (0 multi-byte docs at every
# SF, asserted at oracle time by the octet_length = length equality the
# CASE below folds into the md5 input: a non-ASCII doc would hash-fail
# loudly rather than silently diverge).
ORACLE_SQL["mm_frame_sample"] = """
    WITH p AS (
        SELECT CAST(doc_id AS BIGINT) AS media_id,
               text AS payload,
               octet_length(encode(text)) AS plen,
               GREATEST((n_chars * 10) // 1000, 1) AS n_frames
        FROM documents WHERE doc_id % 3 = 2
    ), f AS (
        SELECT media_id, payload, plen,
               GREATEST(plen // n_frames, 1) AS chunk,
               CAST(t.i AS INT) AS frame_idx
        FROM p CROSS JOIN LATERAL (SELECT unnest(range(p.n_frames)) AS i) t
    )
    SELECT media_id,
           frame_idx,
           CAST(frame_idx * 1000 AS INT) AS ts_ms,
           CAST(GREATEST(LEAST(plen, (frame_idx + 1) * chunk) - frame_idx * chunk, 0) AS BIGINT) AS frame_bytes,
           md5(CASE WHEN length(payload) = plen
                    THEN substring(payload, frame_idx * chunk + 1, chunk)
                    ELSE '<non-ascii-doc>' END) AS frame_md5
    FROM f
"""

# The REAL mu-law transcode's byte accounting is exact integer arithmetic
# on doc_id: audio rows are doc_id % 3 = 1, dur_ms = doc_id % 80 + 20,
# n = 16 * dur_ms samples at 16 kHz; stdlib PCM16 WAV = 44 + 2n bytes,
# format-tag-7 mu-law WAV = 58 + n (12 RIFF + 26 fmt + 12 fact + 8 data
# header; n always even, no pad). SNR floors gate inside the UDF.
ORACLE_SQL["mm_audio_mulaw"] = """
    SELECT CAST((doc_id % 80) // 20 AS INT) AS dur_bucket,
           CAST(count(*) AS BIGINT) AS n_clips,
           CAST(sum(44 + 2 * 16 * (doc_id % 80 + 20)) AS BIGINT) AS sum_pcm_bytes,
           CAST(sum(58 + 16 * (doc_id % 80 + 20)) AS BIGINT) AS sum_mulaw_bytes
    FROM documents WHERE doc_id % 3 = 1 AND doc_id < 300
    GROUP BY 1 ORDER BY 1
"""

# Fake-mode resize truncates/pads payload to width*height bytes and pins
# meta to the target dims; synthesize_media assigns kind = image when
# doc_id % 3 = 0 and payload = utf-8 text bytes — all SQL-stateable.
ORACLE_SQL["mm_resize"] = """
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           'image' AS kind,
           CAST(32 AS BIGINT) AS n_bytes,
           CAST(8 AS INT) AS width,
           CAST(4 AS INT) AS height
    FROM documents WHERE doc_id % 3 = 0
"""

# Fake-mode resample scales payload length by target/src = 8000/16000 (src
# rate pinned to 16000 by the synthesizer): n = GREATEST(len // 2, 1);
# duration_ms carries through as n_chars * 10. kind = audio ⇔ doc_id % 3 = 1.
ORACLE_SQL["mm_audio_resample"] = """
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           'audio' AS kind,
           CAST(GREATEST(octet_length(encode(text)) // 2, 1) AS BIGINT) AS n_bytes,
           CAST(8000 AS INT) AS sample_rate,
           CAST(n_chars * 10 AS INT) AS duration_ms
    FROM documents WHERE doc_id % 3 = 1
"""

# the fake-twin dHash restated: grid → horizontal-gradient bits → per-row
# band keys → banded self-join → exact bit_count(xor) Hamming verify.
# Integer arithmetic end-to-end, so the hash must match bit-for-bit.
# The grid/bits/bands chain is the SHARED _phash_bands_cte definition.
ORACLE_SQL["mm_phash_neardup_fake"] = f"""
    WITH {_phash_bands_cte(0)},
    cand AS (
        SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b
        FROM bands a
        JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
        WHERE a.media_id < b.media_id
    ),
    ham AS (
        SELECT c.media_a, c.media_b,
               CAST(SUM(bit_count(xor(ba.band_key, bb.band_key))) AS BIGINT) AS hamming
        FROM cand c
        JOIN bands ba ON ba.media_id = c.media_a
        JOIN bands bb ON bb.media_id = c.media_b AND bb.band_id = ba.band_id
        GROUP BY c.media_a, c.media_b
    )
    SELECT media_a, media_b, hamming FROM ham WHERE hamming <= 7
"""

# the fake-twin audio fingerprint restated: cycled ASCII byte "samples" →
# 8-sample window energies → delta-sign bits → per-8-bit band keys → banded
# self-join → exact Hamming verify. Integer end-to-end.
ORACLE_SQL["mm_audio_fp_fake"] = """
    WITH clips AS (
        SELECT doc_id AS media_id, text, 0 AS is_dup
        FROM documents WHERE doc_id < 200 AND doc_id % 3 = 1
        UNION ALL
        SELECT doc_id + 10000, text, 1
        FROM documents WHERE doc_id < 200 AND doc_id % 3 = 1 AND doc_id % 2 = 0
    ),
    idx AS (SELECT unnest(range(520)) AS i),
    samples AS (
        SELECT media_id, i,
               ascii(substring(text, CAST(i % length(text) AS INT) + 1, 1))
               + CASE WHEN is_dup = 1 AND i = 0 THEN 1 ELSE 0 END AS v
        FROM clips CROSS JOIN idx
    ),
    energy AS (
        SELECT media_id, i // 8 AS w, SUM(v * v) AS e
        FROM samples GROUP BY media_id, i // 8
    ),
    bits AS (
        SELECT e1.media_id, e1.w AS b,
               CASE WHEN e2.e > e1.e THEN 1 ELSE 0 END AS bit
        FROM energy e1
        JOIN energy e2 ON e2.media_id = e1.media_id AND e2.w = e1.w + 1
        WHERE e1.w < 64
    ),
    bands AS (
        SELECT media_id, b // 8 AS band_id,
               CAST(SUM(bit * (1 << (b % 8))) AS BIGINT) AS band_key
        FROM bits GROUP BY media_id, b // 8
    ),
    cand AS (
        SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b
        FROM bands a
        JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
        WHERE a.media_id < b.media_id
    ),
    ham AS (
        SELECT c.media_a, c.media_b,
               CAST(SUM(bit_count(xor(ba.band_key, bb.band_key))) AS BIGINT) AS hamming
        FROM cand c
        JOIN bands ba ON ba.media_id = c.media_a
        JOIN bands bb ON bb.media_id = c.media_b AND bb.band_id = ba.band_id
        GROUP BY c.media_a, c.media_b
    )
    SELECT media_a, media_b, hamming FROM ham WHERE hamming <= 7
"""

# the fake-twin video near-dup restated: per-frame quadratic grids →
# dHash bits → band keys → frame-level banded join → per-video-pair
# matched-frame counts. The fid packing is implicit: frames key on
# (media_id, fi) directly.
ORACLE_SQL["mm_video_phash_fake"] = f"""
    WITH {_phash_bands_cte(2, frames=4)},
    cand AS (
        SELECT DISTINCT a.media_id AS va, a.fi AS fa, b.media_id AS vb, b.fi AS fb
        FROM bands a
        JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
        WHERE a.media_id < b.media_id
    ),
    ham AS (
        SELECT c.va, c.fa, c.vb, c.fb,
               SUM(bit_count(xor(ba.band_key, bb.band_key))) AS h
        FROM cand c
        JOIN bands ba ON ba.media_id = c.va AND ba.fi = c.fa
        JOIN bands bb ON bb.media_id = c.vb AND bb.fi = c.fb
                     AND bb.band_id = ba.band_id
        GROUP BY c.va, c.fa, c.vb, c.fb
    )
    SELECT va AS media_a, vb AS media_b,
           CAST(COUNT(DISTINCT fa) AS BIGINT) AS matched_a,
           CAST(COUNT(DISTINCT fb) AS BIGINT) AS matched_b
    FROM ham WHERE h <= 7 GROUP BY va, vb
"""

# the image leakage-split restated: the phash-fake pair CTE → recursive-CTE
# transitive closure → component-keyed split hash → cross-split audit
# (0 by construction) — the neardup_leakage_split oracle pattern.
from vers_spark.operators.text_analysis import D_HASH60 as _D_H60

_D_MSPLIT_HASH = _D_H60.format(x="'msplit:' || CAST(component AS VARCHAR)")
ORACLE_SQL["mm_phash_leakage_split"] = f"""
    WITH RECURSIVE
    pairs AS MATERIALIZED ({ORACLE_SQL["mm_phash_neardup_fake"]}),
    edges AS (
        SELECT media_a AS src, media_b AS dst FROM pairs
        UNION ALL
        SELECT media_b AS src, media_a AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    reach(node, lbl) AS (
        SELECT node, node AS lbl FROM nodes
        UNION
        SELECT e.dst AS node, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    ),
    comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node),
    ids AS (
        SELECT doc_id AS media_id FROM documents
        WHERE doc_id < 200 AND doc_id % 3 = 0
        UNION ALL
        SELECT doc_id + 10000 FROM documents
        WHERE doc_id < 200 AND doc_id % 3 = 0 AND doc_id % 2 = 0
    ),
    asg AS MATERIALIZED (
        SELECT media_id, component,
               CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
            SELECT media_id, component, ({_D_MSPLIT_HASH}) % 100 AS b
            FROM (SELECT i.media_id,
                         coalesce(c.component, i.media_id) AS component
                  FROM ids i LEFT JOIN comp c ON c.node = i.media_id)
        )
    ),
    crossed AS (
        SELECT CAST(count(*) AS BIGINT) AS n_cross_pairs
        FROM pairs p
        JOIN asg a ON a.media_id = p.media_a
        JOIN asg b ON b.media_id = p.media_b
        WHERE a.split <> b.split
    )
    SELECT split, CAST(count(*) AS BIGINT) AS n_media,
           CAST(count(DISTINCT component) AS BIGINT) AS n_components,
           n_cross_pairs
    FROM asg, crossed
    GROUP BY split, n_cross_pairs
    ORDER BY split
"""

QUERIES = {
    "emb_neardup_pairs": emb_neardup_pairs,
    "emb_cosine_neardup": emb_cosine_neardup,
    "emb_brp_neardup": emb_brp_neardup,
    "doc_mllib_exactdup": doc_mllib_exactdup,
    "emb_similarity_join": emb_similarity_join,
    "emb_knn_selfjoin_exact": emb_knn_selfjoin_exact,
    "mm_meta_stats": mm_meta_stats,
    "mm_feature_extract": mm_feature_extract,
    "mm_real_pipeline": mm_real_pipeline,
    "mm_jpeg_pipeline": mm_jpeg_pipeline,
    "mm_frame_sample": mm_frame_sample,
    "mm_mjpeg_frames": mm_mjpeg_frames,
    "mm_avi_frames": mm_avi_frames,
    "mm_mp4_frames": mm_mp4_frames,
    "mm_resize": mm_resize,
    "mm_audio_resample": mm_audio_resample,
    "mm_audio_mulaw": mm_audio_mulaw,
    "mm_image_phash_neardup": mm_image_phash_neardup,
    "mm_phash_neardup_fake": mm_phash_neardup_fake,
    "mm_audio_fp_neardup": mm_audio_fp_neardup,
    "mm_audio_fp_fake": mm_audio_fp_fake,
    "mm_video_phash_neardup": mm_video_phash_neardup,
    "mm_video_phash_fake": mm_video_phash_fake,
    "mm_phash_leakage_split": mm_phash_leakage_split,
}
