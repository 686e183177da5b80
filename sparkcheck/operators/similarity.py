"""Similarity search over an embedding column (array<float>):
brute-force cosine as the correctness baseline, LSH-bucketed (random
hyperplane / SimHash-for-vectors) as the scale path. (Beyond the reference's
surface — first-class components per the build brief.)

Scale notes: brute-force is a broadcast of the (small) query set against the
full corpus — one pass, no shuffle, O(Q×N) dot products in codegen.
The LSH variant buckets the corpus once (16-bit hyperplane signature, pandas
UDF over Arrow batches), then restricts scoring to bucket collisions —
turning O(Q×N) into O(Q×N/2^bits·collision_factor) at recall<1.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType


def cosine(a, b):
    """Cosine similarity of two array columns in double precision,
    element-order summation (portable: DuckDB list ops sum in the same
    order)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y:
                                 x.cast("double") * y.cast("double")),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0),
                            lambda acc, v: acc + v.cast("double") ** 2))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0),
                            lambda acc, v: acc + v.cast("double") ** 2))
    return dot / (na * nb)


def cosine_scores(emb: DataFrame, query_ids: list[int],
                  id_col: str = "vec_id", vec_col: str = "embedding") \
        -> DataFrame:
    """All (query_id, vec_id, score) pairs for the given query ids —
    broadcast the queries, score the whole corpus (the ANN baseline oracle).
    Score rounded to 4dp for cross-engine float stability."""
    q = (emb.filter(F.col(id_col).isin(query_ids))
            .select(F.col(id_col).alias("query_id"),
                    F.col(vec_col).alias("qvec")))
    return (emb.crossJoin(F.broadcast(q))
               .select("query_id", F.col(id_col).alias("vec_id"),
                       (F.floor(cosine(F.col("qvec"), F.col(vec_col)) * 10000 + F.lit(0.5)) / 10000.0)
                       .alias("score")))


def brute_topk(emb: DataFrame, query_ids: list[int], k: int = 10,
               id_col: str = "vec_id", vec_col: str = "embedding") \
        -> DataFrame:
    """Exact top-k neighbors per query (excluding self): (query_id, vec_id,
    score, rank). Window over the scored pairs; ties broken by vec_id for
    determinism."""
    from pyspark.sql import Window
    scored = cosine_scores(emb, query_ids, id_col, vec_col) \
        .filter(F.col("vec_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))


def _hyperplanes(dim: int, bits: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((bits, dim)).astype(np.float64)


def lsh_bucket_udf(dim: int, bits: int = 16, seed: int = 7):
    """Random-hyperplane signature as an Arrow-vectorized pandas UDF —
    the entire batch is one (batch×dim)·(dim×bits) matmul."""
    planes = _hyperplanes(dim, bits, seed)
    weights = (1 << np.arange(bits)).astype(np.int64)

    @pandas_udf(LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())
        sig = (m.astype(np.float64) @ planes.T) > 0
        return pd.Series(sig @ weights)
    return bucket


def lsh_topk(emb: DataFrame, query_ids: list[int], k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int = 64, bits: int = 8, seed: int = 7) -> DataFrame:
    """Approximate top-k: score only bucket collisions. Lower `bits` →
    higher recall, more comparisons."""
    from pyspark.sql import Window
    bucket = lsh_bucket_udf(dim, bits, seed)
    with_b = emb.withColumn("_bkt", bucket(F.col(vec_col)))
    q = (with_b.filter(F.col(id_col).isin(query_ids))
               .select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qvec"),
                       F.col("_bkt").alias("_qbkt")))
    cand = with_b.join(F.broadcast(q), F.col("_bkt") == F.col("_qbkt"))
    scored = (cand.filter(F.col(id_col) != F.col("query_id"))
                  .select("query_id", F.col(id_col).alias("vec_id"),
                          (F.floor(cosine(F.col("qvec"), F.col(vec_col)) * 10000 + F.lit(0.5)) / 10000.0)
                          .alias("score")))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))


def embedding_near_dups(emb: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        dim: int = 64, bits: int = 8, seed: int = 7) \
        -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, score ≥ threshold)
    via LSH bucketing + within-bucket scoring (the all-pairs version of
    lsh_topk)."""
    bucket = lsh_bucket_udf(dim, bits, seed)
    with_b = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                        bucket(F.col(vec_col)).alias("_bkt"))
    a = with_b.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                      "_bkt")
    b = with_b.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                      "_bkt")
    pairs = (a.join(b, "_bkt").filter(F.col("id_a") < F.col("id_b"))
              .select("id_a", "id_b",
                      (F.floor(cosine(F.col("va"), F.col("vb")) * 10000 + F.lit(0.5)) / 10000.0)
                      .alias("score")))
    return pairs.filter(F.col("score") >= threshold)
