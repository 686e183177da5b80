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


def hyperplane_ints(dim: int, bits: int, seed: int = 7) -> list[list[int]]:
    """Engine-independent random hyperplanes: integer coordinates derived
    from md5 so any engine (Spark, DuckDB, numpy) reproduces the identical
    planes — plane[b][d] = k_{b,d}/1e4 with
    k = (int(md5('hp:{seed}:{b}:{d}')[:8hex], 16) % 20001) - 10000."""
    import hashlib
    return [[(int(hashlib.md5(f"hp:{seed}:{b}:{d}".encode()).hexdigest()[:8],
                  16) % 20001) - 10000
             for d in range(dim)] for b in range(bits)]


def _hyperplanes(dim: int, bits: int, seed: int = 7) -> np.ndarray:
    return np.array(hyperplane_ints(dim, bits, seed), dtype=np.float64) / 1e4


def lsh_bucket_expr(vec_col, dim: int, bits: int = 8, seed: int = 7):
    """Random-hyperplane signature as a pure Spark SQL expression (whole-stage
    codegen, no Python): bucket = Σ_b (v·plane_b > 0) · 2^b. The dot product
    is a sequential left fold so DuckDB's list_reduce reproduces the exact
    same float64 value (same literals, same op order) — the signature is
    oracle-able bit-for-bit."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    planes = hyperplane_ints(dim, bits, seed)
    out = F.lit(0).cast("bigint")
    for b, row in enumerate(planes):
        plane = F.array(*[F.lit(k / 1e4) for k in row])
        dot = F.aggregate(F.zip_with(v, plane,
                                     lambda x, y: x.cast("double") * y),
                          F.lit(0.0), lambda acc, p: acc + p)
        out = out + F.when(dot > 0, F.lit(2 ** b)).otherwise(F.lit(0))
    return out


def lsh_bucket_sql(vec_expr: str, dim: int, bits: int = 8,
                   seed: int = 7) -> str:
    """DuckDB SQL reproducing lsh_bucket_expr exactly (shared plane literals,
    list_reduce = the same sequential fold)."""
    planes = hyperplane_ints(dim, bits, seed)
    terms = []
    for b, row in enumerate(planes):
        lits = ", ".join(f"{k / 1e4!r}" for k in row)
        dot = (f"list_reduce(list_transform(range(1, {dim + 1}), i -> "
               f"CAST({vec_expr}[i] AS DOUBLE) * ([{lits}]::DOUBLE[])[i]), "
               f"(a, b) -> a + b)")
        terms.append(f"CASE WHEN {dot} > 0 THEN {2 ** b} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


def lsh_bucket_udf(dim: int, bits: int = 16, seed: int = 7):
    """The same signature as an Arrow-vectorized pandas UDF — the scale path:
    the entire batch is one (batch×dim)·(dim×bits) matmul. Buckets are
    asserted identical to lsh_bucket_expr in pytest (float64 matmul vs
    sequential fold can only disagree when |dot| ≲ 1e-12 — not observed;
    the SQL-expr path is the default for oracle-checked queries)."""
    planes = _hyperplanes(dim, bits, seed)
    weights = (1 << np.arange(bits)).astype(np.int64)

    @pandas_udf(LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())
        sig = (m.astype(np.float64) @ planes.T) > 0
        return pd.Series(sig @ weights)
    return bucket


def table_seed(seed: int, t: int) -> int:
    """Per-table hyperplane seed for multi-table (OR-construction) LSH."""
    return seed + 101 * t


def auto_bits(n_rows: int, target_bucket_size: int = 128,
              lo: int = 4, hi: int = 30) -> int:
    """Size the signature width to the corpus instead of a fixed demo value:
    2^bits ≈ n_rows / target_bucket_size keeps expected bucket occupancy
    (and therefore the within-bucket O(b²) pairing cost) constant as N
    grows — at 10^9 rows this yields 23 bits; at 10^4, 7.

    Pure-integer formulation (smallest b with target·2^b ≥ n) so the SQL
    ladder auto_bits_sql produces the exact same value in any engine — no
    float log2 boundary cases between Python and DuckDB."""
    b = lo
    while b < hi and target_bucket_size * (1 << b) < n_rows:
        b += 1
    return b


# the oracled driver queries clamp the signature width here: the oracle SQL
# materializes one plane-fold per bit up to this cap and masks the rest
ORACLE_MAX_BITS = 16


def auto_bits_sql(count_expr: str, target_bucket_size: int = 128,
                  lo: int = 4, hi: int = ORACLE_MAX_BITS) -> str:
    """The auto_bits integer ladder as portable SQL over a row-count
    expression — exact-integer comparisons, byte-identical decisions to
    auto_bits(n, target, lo, hi) for every n."""
    cases = " ".join(
        f"WHEN {count_expr} <= {target_bucket_size * (1 << b)} THEN {b}"
        for b in range(lo, hi))
    return f"(CASE {cases} ELSE {hi} END)"


def lsh_topk(emb: DataFrame, query_ids: list[int], k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int = 64, bits: int = 8, seed: int = 7, tables: int = 1,
             use_udf: bool = False) -> DataFrame:
    """Approximate top-k: score only bucket collisions. Standard LSH knobs:
    lower `bits` → higher recall, more comparisons per table; more `tables`
    (OR-construction — candidate if it collides in ANY table) → higher recall
    at `tables`× bucketing cost. Default bucketing is the codegen SQL
    expression (oracle-able); use_udf=True switches to the Arrow matmul."""
    from pyspark.sql import Window

    def bucket(t: int):
        s = table_seed(seed, t)
        return (lsh_bucket_udf(dim, bits, s)(F.col(vec_col)) if use_udf
                else lsh_bucket_expr(vec_col, dim, bits, s))

    # one row per (row, table): collide within the same table only
    bkts = F.array(*[bucket(t) for t in range(tables)])
    with_b = (emb.select(F.col(id_col), F.col(vec_col),
                         F.posexplode(bkts).alias("_t", "_bkt")))
    q = (with_b.filter(F.col(id_col).isin(query_ids))
               .select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qvec"),
                       F.col("_t").alias("_qt"),
                       F.col("_bkt").alias("_qbkt")))
    cand = with_b.join(F.broadcast(q), (F.col("_bkt") == F.col("_qbkt"))
                       & (F.col("_t") == F.col("_qt")))
    # a pair colliding in several tables scores identically each time →
    # distinct collapses it (same floats both sides of the oracle compare)
    scored = (cand.filter(F.col(id_col) != F.col("query_id"))
                  .select("query_id", F.col(id_col).alias("vec_id"),
                          (F.floor(cosine(F.col("qvec"), F.col(vec_col)) * 10000 + F.lit(0.5)) / 10000.0)
                          .alias("score"))
                  .distinct())
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))


def embedding_near_dups(emb: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        dim: int = 64, bits: int | None = 8, seed: int = 7,
                        use_udf: bool = False) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, score ≥ threshold)
    via LSH bucketing + within-bucket scoring (the all-pairs version of
    lsh_topk). Within-bucket pairing is quadratic per bucket — bits=None
    auto-sizes the bucket count to the corpus (auto_bits: 2^bits ≈
    N/target_bucket_size, one count() job) so occupancy stays constant as N
    grows instead of being a fixed demo value."""
    if bits is None:
        bits = auto_bits(emb.count())
    bucket = (lsh_bucket_udf(dim, bits, seed)(F.col(vec_col)) if use_udf
              else lsh_bucket_expr(vec_col, dim, bits, seed))
    with_b = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                        bucket.alias("_bkt"))
    a = with_b.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                      "_bkt")
    b = with_b.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                      "_bkt")
    pairs = (a.join(b, "_bkt").filter(F.col("id_a") < F.col("id_b"))
              .select("id_a", "id_b",
                      (F.floor(cosine(F.col("va"), F.col("vb")) * 10000 + F.lit(0.5)) / 10000.0)
                      .alias("score")))
    return pairs.filter(F.col("score") >= threshold)
