"""Multimodal column plumbing: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

Two decode modes:

- ``decode="fake"``: deterministic pseudo-features from payload bytes — the
  zero-cost mode for plumbing tests.
- ``decode="real"``: REAL parsing via the self-contained codecs in
  operators/media_codecs (BMP images, WAV PCM16 audio, BMP-stream video —
  pure numpy/stdlib, no PIL/ffmpeg): bilinear resize, linear-interpolation
  resample, header-walk frame splitting, content-derived features.
  Production formats (JPEG/MP4/FLAC) slot in at the SAME seam by swapping
  the codec calls for turbojpeg/ffmpeg bindings; unrecognized payloads
  raise with the expected magic bytes named.

Media-table schema (what a 100 TB multimodal corpus looks like as Parquet):
    media(media_id LONG, kind STRING, payload BINARY,
          meta STRUCT<width INT, height INT, sample_rate INT, duration_ms INT>)
Payloads are opaque to Catalyst; predicates on ``kind``/``meta`` still push
down, and the binary column is only materialized inside the Arrow batches of
the decode stage.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width: int, height: int, sample_rate: int, duration_ms: int>"
)

FEATURE_DIM = 16

_FEATURE_SCHEMA = f"media_id long, kind string, n_bytes long, feature array<float>"


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real encoder: sha256-seeded pseudo
    features. Same payload → same features, everywhere."""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def extract_features(media: DataFrame, decode: str = "fake") -> DataFrame:
    """payload → fixed-dim feature vector (the embed step of an ingest
    pipeline). ``decode='real'`` marks the PIL/torchvision seam."""
    if decode not in ("fake", "real"):
        raise ValueError(f"unknown decode mode {decode!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            if decode == "real":
                from vers_spark.operators import media_codecs as MC

                feats = []
                for kind, p in zip(pdf["kind"], pdf["payload"]):
                    p = bytes(p)
                    if kind == "image":
                        feats.append(MC.image_features(MC.decode_image(p), FEATURE_DIM))
                    elif kind == "audio":
                        feats.append(MC.audio_features(MC.decode_wav(p)[0], FEATURE_DIM))
                    elif kind == "video":
                        fr = [MC.decode_image(b) for b in MC.split_video_stream(p)]
                        feats.append(
                            np.mean([MC.image_features(f, FEATURE_DIM) for f in fr], axis=0)
                            .astype(np.float32)
                        )
                    else:
                        raise ValueError(f"unknown media kind {kind!r}")
            else:
                feats = [_fake_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(fn, _FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int, decode: str = "fake") -> DataFrame:
    """Image resize stage: filters kind='image' (pushed down), rewrites the
    payload + meta. Fake mode truncates/pads bytes deterministically."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            if pdf.empty:
                continue
            out = pdf.copy()
            if decode == "real":
                from vers_spark.operators import media_codecs as MC

                out["payload"] = [
                    MC.encode_bmp(MC.bilinear_resize(MC.decode_image(bytes(p)), width, height))
                    for p in pdf["payload"]
                ]
            else:
                out["payload"] = [
                    bytes(p[:target]).ljust(target, b"\0") for p in pdf["payload"]
                ]
            out["meta"] = [
                {"width": width, "height": height, "sample_rate": None, "duration_ms": None}
                for _ in range(len(pdf))
            ]
            yield out

    # MEDIA_SCHEMA (all-nullable DDL), not media.schema: the input's meta
    # fields may be non-nullable while the resized meta nulls audio fields.
    return media.filter(F.col("kind") == "image").mapInPandas(fn, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int, decode: str = "fake") -> DataFrame:
    """Video frame sampling: one output row per sampled frame. Fake mode
    slices the payload at frame boundaries derived from duration."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            # column zips instead of iterrows (see resample_audio note)
            triples = zip(pdf["media_id"], pdf["payload"], pdf["meta"])
            if decode == "real":
                from vers_spark.operators import media_codecs as MC

                for mid, payload, meta in triples:
                    duration = (meta or {}).get("duration_ms") or 0
                    frames = MC.split_video_stream(bytes(payload))
                    n = len(frames)
                    # sample the frame covering each every_ms tick (dedup
                    # when ticks land in the same frame)
                    seen = set()
                    t = 0
                    while t <= max(duration - 1, 0):
                        idx = min(int(t * n / max(duration, 1)), n - 1)
                        if idx not in seen:
                            seen.add(idx)
                            rows.append(
                                {
                                    "media_id": mid,
                                    "frame_idx": idx,
                                    "ts_ms": t,
                                    "frame_payload": frames[idx],
                                }
                            )
                        t += every_ms
            else:
                for mid, payload, meta in triples:
                    duration = (meta or {}).get("duration_ms") or 0
                    n_frames = max(duration // every_ms, 1)
                    chunk = max(len(payload) // n_frames, 1)
                    for i in range(n_frames):
                        rows.append(
                            {
                                "media_id": mid,
                                "frame_idx": i,
                                "ts_ms": i * every_ms,
                                "frame_payload": bytes(payload[i * chunk : (i + 1) * chunk]),
                            }
                        )
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "video").mapInPandas(
        fn, "media_id long, frame_idx int, ts_ms int, frame_payload binary"
    )


def resample_audio(media: DataFrame, target_rate: int, decode: str = "fake") -> DataFrame:
    """Audio resample stage: filters kind='audio' (pushed down), rewrites
    payload length by the rate ratio and updates meta.sample_rate. Fake mode
    scales byte length deterministically; real mode is the stubbed decode
    seam (soundfile/librosa are not in this container)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = pdf.copy()
            payloads, metas = [], []
            # column zip, not iterrows: per-row Series construction costs
            # ~10x the loop body for the fake path (pure length arithmetic);
            # the real codec decode is inherently per-payload either way
            for p, meta in zip(pdf["payload"], pdf["meta"]):
                src_rate = (meta or {}).get("sample_rate") or target_rate
                p = bytes(p)
                if decode == "real":
                    from vers_spark.operators import media_codecs as MC

                    samples, rate = MC.decode_wav(p)
                    payloads.append(
                        MC.encode_wav(MC.linear_resample(samples, rate, target_rate), target_rate)
                    )
                else:
                    n = max(int(len(p) * target_rate / max(src_rate, 1)), 1)
                    payloads.append((p * (n // max(len(p), 1) + 1))[:n])
                metas.append(
                    {
                        "width": None,
                        "height": None,
                        "sample_rate": target_rate,
                        "duration_ms": (meta or {}).get("duration_ms"),
                    }
                )
            out["payload"] = payloads
            out["meta"] = metas
            yield out

    return media.filter(F.col("kind") == "audio").mapInPandas(fn, MEDIA_SCHEMA)


def mjpeg_source_frames(media_id: int) -> list[np.ndarray]:
    """Deterministic source frames for a synthesized video row — the ONE
    definition of the MJPEG frame content, shared by
    ``synthesize_media_from_documents`` (encode side) and any query
    re-deriving the sources for a faithfulness check (mm_mjpeg_frames'
    per-frame PSNR). One RandomState seeded by media_id draws the
    per-frame noise sequentially, so content depends only on media_id;
    keeping a single definition means the PSNR gate cannot silently pass
    while the two sides drift (it compares decode(encode(f)) to THIS f)."""
    rng = np.random.RandomState(int(media_id) % (2**31))
    n_frames = int(media_id) % 3 + 2
    gx = np.linspace(0, 255, 12)[None, :, None]
    gy = np.linspace(0, 255, 8)[:, None, None]
    return [
        np.clip(
            0.5 * gx + 0.5 * gy + 20 * fi + rng.randint(-10, 10, (8, 12, 3)),
            0,
            255,
        ).astype(np.uint8)
        for fi in range(n_frames)
    ]


def phash_source_pixels(media_id: int, perturb: bool = False) -> np.ndarray:
    """Deterministic source pixels for the image near-dup queries — the ONE
    definition of that corpus's content (the mjpeg_source_frames discipline:
    the generator and any query re-deriving it cannot drift apart).

    Content is an 8×9 block pattern nearest-upsampled to (h, w): each row is
    a random walk whose steps are ≥48 gray levels, and (h, w) keeps every
    dHash downsample cell ≥2×2 pixels, so adjacent cell means contrast by
    far more than the baseline-JPEG roundtrip error (block-edge ringing
    included) and the fingerprint is encode/decode-stable. ``perturb=True``
    adds a ±2 pixel wobble from an independent stream — the model of a
    re-encoded near-duplicate copy (same content, different encoder pass)."""
    rng = np.random.RandomState(int(media_id) % (2**31))
    h, w = int(media_id) % 16 + 16, int(media_id) % 24 + 18
    img = _block_pattern(rng, h, w)
    if perturb:
        wob = np.random.RandomState((int(media_id) + 999331) % (2**31))
        img = img + wob.randint(-2, 3, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def _block_pattern(rng: np.random.RandomState, h: int, w: int) -> np.ndarray:
    """8×9 contrast-walk block grid (each row a random walk with ≥48-level
    steps) nearest-upsampled to (h, w, 3) int64 — the shared content
    primitive of the image/video near-dup generators."""
    base = np.empty((8, 9), dtype=np.int64)
    for y in range(8):
        v = int(rng.randint(0, 256))
        for x in range(9):
            base[y, x] = v
            step = int(rng.randint(48, 120))
            v = v + step if v + step <= 255 else v - step
    ys = (np.arange(h) * 8) // h
    xs = (np.arange(w) * 9) // w
    img = base[np.ix_(ys, xs)]
    return np.stack([img, img, img], axis=-1)


def video_source_frames(media_id: int, perturb: bool = False) -> list[np.ndarray]:
    """Deterministic source frames for the VIDEO near-dup queries — the
    phash_source_pixels discipline one level up: per-frame contrast-walk
    block content (frame fi seeds its own stream), uniform dims per video
    (containers carry one width/height). ``perturb=True`` adds the ±2
    re-encode wobble per frame. Distinct from mjpeg_source_frames (the
    PSNR-gate generator): those frames share one global gradient, which is
    exactly what a difference hash cannot distinguish — near-dup content
    needs per-video structure."""
    n_frames = int(media_id) % 3 + 2
    h, w = int(media_id) % 16 + 16, int(media_id) % 24 + 18
    out = []
    for fi in range(n_frames):
        rng = np.random.RandomState((int(media_id) * 131 + fi * 7 + 1) % (2**31))
        img = _block_pattern(rng, h, w)
        if perturb:
            wob = np.random.RandomState(
                (int(media_id) * 131 + fi * 7 + 999331) % (2**31)
            )
            img = img + wob.randint(-2, 3, img.shape)
        out.append(np.clip(img, 0, 255).astype(np.uint8))
    return out


def audio_source_samples(media_id: int, perturb: bool = False) -> np.ndarray:
    """Deterministic source PCM for the audio near-dup queries — the ONE
    definition of that corpus's content (the phash_source_pixels twin).

    An amplitude-modulated sine: a per-clip multiplicative envelope walk
    (adjacent windows contrast by ≥1.4×, bouncing inside [1200, 24000]) over
    a 200–900 Hz carrier, 65 windows × 160 samples at 16 kHz (≥2 full cycles
    per window, so windowed energy tracks the envelope, not the phase).
    ``perturb=True`` models a re-mastered near-duplicate: ×0.97 gain plus
    ±60 dither from an independent stream — the energy-delta fingerprint is
    gain-invariant, so the copy stays within a few Hamming bits."""
    rng = np.random.RandomState(int(media_id) % (2**31))
    n_win, w_len = 65, 160
    env = np.empty(n_win)
    v = float(rng.randint(1500, 20000))
    for w in range(n_win):
        env[w] = v
        f = float(rng.uniform(1.4, 2.0))
        if v >= 24000 / f:
            v /= f
        elif v <= 1200 * f:
            v *= f
        elif rng.rand() < 0.5:
            v *= f
        else:
            v /= f
    f_hz = 200.0 + int(media_id) % 700
    i = np.arange(n_win * w_len)
    x = np.repeat(env, w_len) * np.sin(2 * np.pi * f_hz * i / 16000.0)
    if perturb:
        wob = np.random.RandomState((int(media_id) + 777001) % (2**31))
        x = x * 0.97 + wob.randint(-60, 61, x.shape)
    return np.clip(np.round(x), -32768, 32767).astype(np.int16)


def synthesize_media_from_documents(
    docs: DataFrame,
    real_payloads: bool = False,
    image_format: str = "bmp",
    video_format: str = "bmp",
) -> DataFrame:
    """Build a deterministic media table from the documents corpus so
    multimodal plumbing is exercised on driver testdata.

    Default: text bytes as opaque payloads (cheap, for plumbing tests).
    ``real_payloads=True``: ACTUAL format bytes generated per row inside the
    Arrow batches — BMP or baseline JPEG images (``image_format``), WAV
    PCM16 audio, BMP-stream video — seeded by doc_id, sized small and
    bounded, so ``decode=\"real\"`` has genuine inputs end-to-end with no
    external data or libraries. ``image_format=\"jpeg\"`` exercises the
    r6 pure-numpy baseline JPEG codec (operators/jpeg_codec — the
    production image format at the same decode seam); images are smoothed
    gradients + noise so the lossy roundtrip stays high-PSNR.
    ``video_format=\"mjpeg\"`` emits a real MJPEG elementary stream
    (concatenated baseline JPEGs, frame boundaries recovered by the T.81
    segment walk — media_codecs.jpeg_size) instead of the BMP-stream toy
    container; frames are smoothed for the same lossy-roundtrip reason."""
    if image_format not in ("bmp", "jpeg"):
        raise ValueError(f"unknown image_format {image_format!r}")
    if video_format not in ("bmp", "mjpeg", "avi", "mp4"):
        raise ValueError(f"unknown video_format {video_format!r}")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    base = docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 640 + 1).cast("int").alias("width"),
            (F.col("n_chars") % 480 + 1).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
    if not real_payloads:
        return base

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from vers_spark.operators import media_codecs as MC

        for pdf in batches:
            if pdf.empty:
                continue
            payloads, metas = [], []
            for mid, k in zip(pdf["media_id"], pdf["kind"]):
                rng = np.random.RandomState(int(mid) % (2**31))
                if k == "image":
                    w, h = int(mid) % 24 + 8, int(mid) % 16 + 6
                    if image_format == "jpeg":
                        # smooth gradient + bounded noise: JPEG is lossy,
                        # realistic content keeps the roundtrip high-PSNR
                        gx = np.linspace(0, 255, w)[None, :, None]
                        gy = np.linspace(0, 255, h)[:, None, None]
                        img = np.clip(
                            0.5 * gx + 0.5 * gy + rng.randint(-12, 12, (h, w, 3)), 0, 255
                        ).astype(np.uint8)
                        payloads.append(MC.encode_jpeg(img))
                    else:
                        payloads.append(
                            MC.encode_bmp(rng.randint(0, 256, (h, w, 3), dtype=np.uint8))
                        )
                    metas.append(
                        {"width": w, "height": h, "sample_rate": None, "duration_ms": None}
                    )
                elif k == "audio":
                    rate, dur_ms = 16000, int(mid) % 80 + 20
                    t = np.arange(rate * dur_ms // 1000) / rate
                    freq = 100.0 + int(mid) % 800
                    wavf = (np.sin(2 * np.pi * freq * t) * 12000).astype(np.int16)
                    payloads.append(MC.encode_wav(wavf, rate))
                    metas.append(
                        {"width": None, "height": None, "sample_rate": rate, "duration_ms": dur_ms}
                    )
                else:  # video: BMP-stream or MJPEG of a few small frames
                    n_frames = int(mid) % 3 + 2
                    if video_format == "mjpeg":
                        payloads.append(MC.encode_mjpeg(mjpeg_source_frames(int(mid))))
                    elif video_format == "avi":
                        # same deterministic JPEG frames, boxed in the RIFF
                        # container (hdrl headers + movi chunks + idx1)
                        payloads.append(
                            MC.encode_avi_mjpeg(mjpeg_source_frames(int(mid)))
                        )
                    elif video_format == "mp4":
                        # same frames again, ISO BMFF (moov sample tables
                        # index an unframed mdat)
                        payloads.append(
                            MC.encode_mp4_mjpeg(mjpeg_source_frames(int(mid)))
                        )
                    else:
                        frames = [
                            rng.randint(0, 256, (8, 12, 3), dtype=np.uint8)
                            for _ in range(n_frames)
                        ]
                        payloads.append(MC.encode_bmp_stream(frames))
                    metas.append(
                        {
                            "width": 12,
                            "height": 8,
                            "sample_rate": None,
                            "duration_ms": n_frames * 1000,
                        }
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return base.drop("payload", "meta").mapInPandas(gen, MEDIA_SCHEMA)
