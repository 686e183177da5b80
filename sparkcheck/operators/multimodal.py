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


def real_decoder(blob: bytes, kind: str):
    """Real decode for formats parseable in pure Python (no media libs in
    this container): binary PPM images (P6) and PCM WAV audio. Features are
    16 coarse content buckets (mean sample value per 1/16th of the payload),
    width/height from the header (WAV: width=n_frames%65536, height=n_channels
    ×1000+bits). Other formats still need PIL/librosa/ffmpeg — marked
    extension point below."""
    if kind == "image" and blob.startswith(b"P6"):
        return _decode_ppm(blob)
    if kind == "audio" and blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return _decode_wav(blob)
    raise NotImplementedError(
        f"no pure-python decoder for kind={kind!r} (magic={blob[:4]!r}) — "
        "JPEG/PNG/MP3/... need PIL/librosa/ffmpeg, absent from this container")


def _decode_ppm(blob: bytes):
    """Binary PPM (P6): header 'P6\\n<w> <h>\\n<maxval>\\n' + RGB bytes."""
    parts, i = [], 2
    while len(parts) < 3:
        while i < len(blob) and blob[i : i + 1].isspace():
            i += 1
        if blob[i : i + 1] == b"#":  # comment line
            i = blob.index(b"\n", i) + 1
            continue
        j = i
        while j < len(blob) and not blob[j : j + 1].isspace():
            j += 1
        parts.append(int(blob[i:j]))
        i = j
    width, height, _maxval = parts
    pixels = np.frombuffer(blob, dtype=np.uint8, offset=i + 1,
                           count=width * height * 3)
    return _bucket_means(pixels), width, height


def _decode_wav(blob: bytes):
    """PCM WAV via the stdlib wave module (pure python)."""
    import io
    import wave
    with wave.open(io.BytesIO(blob)) as w:
        n, ch, sw = w.getnframes(), w.getnchannels(), w.getsampwidth()
        raw = w.readframes(n)
    dt = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
    if dt is None:
        # same contract as the dispatcher: unsupported format → actionable
        # NotImplementedError, not an opaque KeyError inside mapInPandas
        raise NotImplementedError(
            f"unsupported WAV sample width {sw} bytes (24-bit PCM needs "
            "3-byte unpacking; only 8/16/32-bit PCM is decoded here)")
    samples = np.frombuffer(raw, dtype=dt)
    return _bucket_means(samples), n % 65536, ch * 1000 + sw * 8


def _bucket_means(arr: np.ndarray) -> np.ndarray:
    """FEAT_DIM coarse content buckets: mean of each contiguous 1/16th."""
    if arr.size == 0:
        return np.zeros(FEAT_DIM, dtype=np.float32)
    splits = np.array_split(arr.astype(np.float64), FEAT_DIM)
    return np.array([s.mean() if s.size else 0.0 for s in splits],
                    dtype=np.float32)


def fake_decoder(blob: bytes, kind: str):
    """Deterministic stand-in for formats with no available decoder: features
    derived from content hashes by integer arithmetic — same bytes → same
    features, any bytes accepted, and every output is reproducible in ANSI
    SQL (the DuckDB oracle recomputes it exactly):

        sha    = sha256(blob) hex
        feat_j = ((int(md5(sha||':'||j)[:8hex],16) % 20001) - 10000) / 1e4
        width  = 16 + int(sha[:8hex],16) % 1024
        height = 16 + (int(sha[:8hex],16) // 1024) % 1024
    """
    sha = hashlib.sha256(blob).hexdigest()
    feat = np.array(
        [((int(hashlib.md5(f"{sha}:{j}".encode()).hexdigest()[:8], 16)
           % 20001) - 10000) / 10000.0 for j in range(FEAT_DIM)],
        dtype=np.float32)
    seed = int(sha[:8], 16)
    width = 16 + seed % 1024
    height = 16 + (seed // 1024) % 1024
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


def features_digest(feats: DataFrame) -> DataFrame:
    """Stable scalar projection of extract_features output for cross-engine
    comparison: the raw `feat array<float>` is not canonicalizable by
    value-hash checkers (unhashable list), so project it to
    md5(csv of round(feat*1e4)) — exact because fake_decoder features are
    integer/1e4 rationals (float32 eps ≪ 0.5 after ×1e4)."""
    feat_ints = F.transform(
        "feat",
        lambda x: F.floor(x.cast("double") * 10000 + F.lit(0.5))
                   .cast("bigint").cast("string"))
    return feats.select(
        "media_id", "kind", "byte_len",
        F.md5(F.concat_ws(",", feat_ints)).alias("feat_hash"),
        "width", "height")


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
