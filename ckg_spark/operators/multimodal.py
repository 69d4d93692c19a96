"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side contract is real and tested — schema, Arrow batch shape,
partition-preserving mapInPandas — while the codec step is stubbed behind
``NotImplementedError`` / a deterministic fake, because no image/audio
libraries ship in this container. Swapping in a real decoder is a one-line
change inside ``_decode_stub``.

Schema convention:
    media(media_id long, kind string, payload binary, meta map<string,string>)

Operators:
- attach_fake_media: deterministic binary payloads derived from an id (for
  tests; byte-stable across runs).
- decode_features: mapInPandas -> fixed-width float feature vector per blob
  (stub: xxhash-seeded deterministic floats; real impl: PIL/librosa decode).
- frame_sample: per-video frame index expansion (pure JVM — the expensive
  decode happens later, only for the sampled frames).
- resize_meta: metadata-only resize bookkeeping (pure JVM).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

FEATURE_DIM = 16


def attach_fake_media(df: DataFrame, id_col: str, kind: str = "image") -> DataFrame:
    """Deterministic opaque payload per id: payload = sha1(id) bytes repeated."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.sha1(F.col(id_col).cast("string").cast("binary")), "utf-8").alias("payload"),
        F.create_map(
            F.lit("width"), (F.pmod(F.col(id_col), F.lit(8)) * 64 + 64).cast("string"),
            F.lit("height"), (F.pmod(F.col(id_col), F.lit(6)) * 64 + 64).cast("string"),
            F.lit("frames"), (F.pmod(F.col(id_col), F.lit(10)) + 1).cast("string"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic fake feature extraction. A real deployment replaces this
    with PIL.Image.open / librosa.load etc.; everything around it (Arrow
    batching, schema, partitioning) is unchanged."""
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for kind={kind!r}")
    h = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(h[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(FEATURE_DIM).astype(np.float32)


def decode_features(media: DataFrame) -> DataFrame:
    """(media_id, kind, features array<float>) via Arrow-batched mapInPandas.

    Batch-shape contract: the UDF receives whole Arrow record batches and
    emits one row per input row; payloads never round-trip through the
    driver. Partitioning is preserved (narrow op).
    """
    schema = "media_id long, kind string, features array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "features": feats}
            )

    return media.select("media_id", "kind", "payload").mapInPandas(run, schema=schema)


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Expand videos to sampled frame indexes (JVM sequence/explode; decode
    of just those frames would follow in decode_features)."""
    v = media.where(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.element_at("meta", "frames").cast("int") - 1,
                F.lit(every_n),
            )
        ).alias("frame_idx"),
    )


def resize_meta(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Metadata-only resize plan: target dims preserving aspect ratio."""
    w = F.element_at("meta", "width").cast("double")
    h = F.element_at("meta", "height").cast("double")
    scale = F.least(F.lit(float(max_side)) / w, F.lit(float(max_side)) / h, F.lit(1.0))
    return media.select(
        "media_id", "kind",
        F.round(w * scale).cast("int").alias("target_w"),
        F.round(h * scale).cast("int").alias("target_h"),
    )
