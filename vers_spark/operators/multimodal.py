"""Multimodal column plumbing: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The decode kernels themselves are STUBBED (no image/audio libraries in this
environment): ``decode=\"fake\"`` derives deterministic pseudo-features from the
payload bytes so the full Spark plumbing — schema, batching, partitioning, UDF
signatures — is real and testable; ``decode=\"real\"`` raises NotImplementedError
at the exact seam where PIL/ffmpeg would slot in.

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
                raise NotImplementedError(
                    "real decode needs an image/audio library (PIL/torchaudio); "
                    "not available in this environment — use decode='fake'"
                )
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
            if decode == "real":
                raise NotImplementedError("real resize needs PIL — use decode='fake'")
            out = pdf.copy()
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
            if decode == "real":
                raise NotImplementedError("real frame sampling needs ffmpeg — use decode='fake'")
            rows = []
            for _, r in pdf.iterrows():
                duration = (r["meta"] or {}).get("duration_ms") or 0
                n_frames = max(duration // every_ms, 1)
                chunk = max(len(r["payload"]) // n_frames, 1)
                for i in range(n_frames):
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_idx": i,
                            "ts_ms": i * every_ms,
                            "frame_payload": bytes(r["payload"][i * chunk : (i + 1) * chunk]),
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
            if decode == "real":
                raise NotImplementedError("real resample needs soundfile — use decode='fake'")
            out = pdf.copy()
            payloads, metas = [], []
            for _, r in pdf.iterrows():
                src_rate = (r["meta"] or {}).get("sample_rate") or target_rate
                n = max(int(len(r["payload"]) * target_rate / max(src_rate, 1)), 1)
                p = bytes(r["payload"])
                payloads.append((p * (n // max(len(p), 1) + 1))[:n])
                metas.append(
                    {
                        "width": None,
                        "height": None,
                        "sample_rate": target_rate,
                        "duration_ms": (r["meta"] or {}).get("duration_ms"),
                    }
                )
            out["payload"] = payloads
            out["meta"] = metas
            yield out

    return media.filter(F.col("kind") == "audio").mapInPandas(fn, MEDIA_SCHEMA)


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a deterministic media table from the documents corpus (text bytes
    as payloads) so multimodal plumbing is exercised on driver testdata."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
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
