"""Multimodal column handling: image/audio/video as opaque `binary` columns
with typed metadata, processed via Arrow-batched `mapInPandas`. (Beyond the
reference's surface — first-class components per the build brief.)

The decode step is STUBBED — image/audio libraries are not available in this
container — behind `decoder=` hooks: the default `fake_decoder` produces
deterministic pseudo-features from the raw bytes (sha-seeded), so the
Spark-side plumbing (schema, batching, partitioning, UDF signature) is real
and fully tested; swapping in a real decoder (PIL/librosa/ffmpeg) is a
one-function change at the marked point.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = ("media_id string, kind string, byte_len bigint, "
                     "sha256 string")
FEATURE_SCHEMA = ("media_id string, kind string, byte_len bigint, "
                  "feat array<float>, width int, height int")
FEAT_DIM = 16


def real_decoder(blob: bytes, kind: str):  # pragma: no cover - stub
    """Marked extension point: decode image/audio bytes into (feature vector,
    width, height). Requires media libraries absent from this container."""
    raise NotImplementedError(
        "media decoding requires PIL/librosa/ffmpeg — not available here; "
        "use fake_decoder for plumbing tests")


def fake_decoder(blob: bytes, kind: str):
    """Deterministic stand-in: features seeded from the content hash —
    same bytes → same features, any bytes accepted."""
    h = hashlib.sha256(blob).digest()
    seed = int.from_bytes(h[:4], "big")
    rng = np.random.RandomState(seed)
    feat = rng.standard_normal(FEAT_DIM).astype(np.float32)
    width = 16 + seed % 1024
    height = 16 + (seed >> 10) % 1024
    return feat, width, height


def media_metadata(df: DataFrame, blob_col: str, id_col: str,
                   kind: str) -> DataFrame:
    """Typed metadata for an opaque binary column — pure JVM expressions
    (no decode): (media_id, kind, byte_len, sha256)."""
    return (df.filter(F.col(blob_col).isNotNull())
              .select(F.col(id_col).cast("string").alias("media_id"),
                      F.lit(kind).alias("kind"),
                      F.length(F.col(blob_col)).cast("bigint")
                      .alias("byte_len"),
                      F.sha2(F.col(blob_col), 256).alias("sha256")))


def extract_features(df: DataFrame, blob_col: str, id_col: str, kind: str,
                     decoder: Callable = fake_decoder) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batch iterator —
    one Python roundtrip per batch, never per row)."""
    cols = [id_col, blob_col]
    src = df.filter(F.col(blob_col).isNotNull()).select(*cols)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, widths, heights, lens = [], [], [], []
            for blob in pdf[blob_col]:
                b = bytes(blob)
                f, w, h = decoder(b, kind)
                feats.append(f.tolist())
                widths.append(w)
                heights.append(h)
                lens.append(len(b))
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype(str),
                "kind": kind,
                "byte_len": pd.Series(lens, dtype="int64"),
                "feat": feats,
                "width": pd.Series(widths, dtype="int32"),
                "height": pd.Series(heights, dtype="int32"),
            })

    return src.mapInPandas(gen, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, blob_col: str, id_col: str,
                 every_n_bytes: int = 1024, max_frames: int = 8) -> DataFrame:
    """'Frame sampling' plumbing for video-like blobs: deterministic byte-
    offset slices as stand-in frames — (media_id, frame_idx, offset,
    frame_sha). Pure JVM (substring on binary)."""
    idx = F.explode(F.sequence(F.lit(0), F.lit(max_frames - 1))).alias("frame_idx")
    base = (df.filter(F.col(blob_col).isNotNull())
              .select(F.col(id_col).cast("string").alias("media_id"),
                      F.col(blob_col).alias("_blob"), idx))
    offset = F.col("frame_idx") * every_n_bytes
    in_range = offset < F.length("_blob")
    frame = F.expr(f"substring(_blob, frame_idx * {every_n_bytes} + 1, "
                   f"{every_n_bytes})")
    return (base.filter(in_range)
                .select("media_id",
                        F.col("frame_idx").cast("bigint").alias("frame_idx"),
                        offset.cast("bigint").alias("offset"),
                        F.sha2(frame, 256).alias("frame_sha")))
