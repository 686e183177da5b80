"""Replica-amplified embedding corpus for scale tests and benches.

The driver testdata ships 500-2000 vectors per SF — three orders of
magnitude below where the similarity family's scale machinery (IVF Arrow
auto-switch at >256 centroids, >16-bit LSH signature widths) engages. This
loader amplifies the base table deterministically: each replica re-ids the
base rows and perturbs every coordinate with an integer-hash noise field,
so the amplified corpus has distinct, reproducible vectors (same bytes on
every run — no RNG state) while keeping the base table's cluster structure
(each base vector becomes a tight cloud of `replicas` near neighbors, the
shape a dedup-adjacent embedding corpus actually has).

Same scan discipline as sources/pages.load_pages: the base parquet is ONE
small file → repartition BEFORE the replica explode so the amplified
pandas-UDF stage runs with full parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType

# Knuth multiplicative constants for the coordinate hash — fixed here so
# the corpus is bit-stable across sessions and hosts.
_H_ID = 2654435761
_H_DIM = 40503
_MOD = 1 << 31


def _perturb_udf(scale: float, seed: int):
    @pandas_udf(ArrayType(FloatType()))
    def perturbed(ids: pd.Series, vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        idv = ids.to_numpy().astype(np.int64)
        d = np.arange(m.shape[1], dtype=np.int64)
        # uniform-ish noise in [-0.5, 0.5) from a 31-bit mixed hash of
        # (row id, dimension): vectorized, deterministic, engine-free
        h = (idv[:, None] * _H_ID + d[None, :] * _H_DIM + seed) % _MOD
        noise = h.astype(np.float64) / _MOD - 0.5
        out = (m * (1.0 + scale * noise)).astype(np.float32)
        return pd.Series(list(out))
    return perturbed


def load_embeddings(spark: SparkSession, sf_dir: str, replicas: int = 1,
                    perturb: float = 0.1, seed: int = 7,
                    partitions: int | None = None) -> DataFrame:
    """(vec_id, embedding, label) with ``replicas`` × the base row count.

    Replica r of base row v gets ``vec_id = v + r * shift`` (shift = one
    past the max base id — derived from the data, the same collision-proof
    convention bench.py uses for event replicas) and an embedding scaled
    coordinate-wise by ``1 + perturb * hash_noise(vec_id, dim)``. Replica 0
    is perturbed too: every row goes through the same expression, so the
    corpus is one homogeneous Arrow stage, not a union of code paths."""
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism * 2
    base = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
                 .repartition(partitions))
    if replicas <= 1:
        return base
    shift = base.agg(F.max("vec_id")).first()[0] + 1
    amp = (base.crossJoin(
               spark.range(replicas).select(F.col("id").alias("_rep")))
               .select((F.col("vec_id") + F.col("_rep") * shift)
                       .alias("vec_id"),
                       "embedding", "label"))
    return amp.select("vec_id",
                      _perturb_udf(perturb, seed)(
                          F.col("vec_id"), F.col("embedding"))
                      .alias("embedding"),
                      "label")
