"""Deterministic hash sampling — the data-mixing primitive: training
pipelines don't rand()-sample (irreproducible across retries/engines), they
hash a stable id into a bucket and compare against a per-stratum rate.

Pure codegen filter: no shuffle, no RNG state, the same rows selected on
every engine, every run, every cluster size — and the sample of a UNION of
shards equals the union of shard samples (the property reservoir sampling
lacks). md5(id) is the same public formulation the MinHash/LSH family uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SAMPLE_MOD = 10_000  # rate resolution 1/10000

# driver-query mixing rates (documents.lang strata), imported by
# oracle.stratified_sample so the two sides cannot drift
MIX_RATES = {"en": 0.5, "de": 0.25, "zh": 0.1}
MIX_DEFAULT = 0.05


def hash_bucket(col: Column) -> Column:
    """Uniform bucket in [0, SAMPLE_MOD): first 8 md5 nibbles of the id's
    decimal string, mod SAMPLE_MOD (32-bit value — fits bigint exactly)."""
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
             .cast("bigint") % SAMPLE_MOD)


def hash_sample(df: DataFrame, id_col: str, rate: float) -> DataFrame:
    """Keep ~rate of rows, deterministically by id hash."""
    return df.filter(hash_bucket(F.col(id_col)) < int(rate * SAMPLE_MOD))


def stratified_hash_sample(df: DataFrame, id_col: str, strata_col: str,
                           rates: dict[str, float],
                           default_rate: float = 0.0) -> DataFrame:
    """Per-stratum rates (the data-mixing knob: up/down-sample languages,
    sources, quality tiers). Strata not in `rates` get default_rate; a NULL
    stratum gets default_rate too (CASE falls through)."""
    thr = F.lit(int(default_rate * SAMPLE_MOD))
    for k in sorted(rates):  # deterministic construction order
        thr = F.when(F.col(strata_col) == k,
                     F.lit(int(rates[k] * SAMPLE_MOD))).otherwise(thr)
    return df.filter(hash_bucket(F.col(id_col)) < thr)


CAP_SALT_BUCKETS = 32  # phase-1 buckets for the skew-safe per-key cap


def capped_by_key(df: DataFrame, key, id_col: str, cap: int,
                  key_name: str = "key",
                  salt_buckets: int = CAP_SALT_BUCKETS) -> DataFrame:
    """Per-key contribution cap (C4/RefinedWeb-style domain capping): keep
    at most `cap` rows per key, chosen deterministically by md5(id) rank —
    the same stable-hash ordering the sampling family uses, so the kept
    subset is identical across runs, engines, and cluster sizes.

    Output: the surviving rows with `key_name` and their final rank `rk`
    (1..cap) appended.

    Scale: a single hot key (the measured ~20% hot.example host skew) would
    put 20% of the corpus into ONE window partition — window functions get
    no AQE skew split. Two-phase salted cap instead: rows are ranked within
    (key, salt) buckets and locally capped first — any row in the global
    top-`cap` of its key ranks ≤ cap inside its own salt bucket too, so the
    prune is lossless — then the global window ranks the ≤ salt_buckets×cap
    survivors per key. The unsplittable per-key sort never sees more than
    salt_buckets×cap rows, regardless of skew. Lossless-prune equivalence
    is pinned by tests/test_capping_grams.py against the one-window
    formulation (which is also what the DuckDB oracle states).
    """
    from pyspark.sql import Window

    key_c = F.col(key) if isinstance(key, str) else key
    ordc = F.md5(F.col(id_col).cast("string"))
    base = df.withColumn(key_name, key_c) \
             .withColumn("_salt", F.pmod(F.xxhash64(F.col(id_col)),
                                         F.lit(salt_buckets)))
    w1 = Window.partitionBy(key_name, "_salt") \
               .orderBy(ordc.asc(), F.col(id_col).asc())
    pruned = (base.withColumn("_r1", F.row_number().over(w1))
                  .filter(F.col("_r1") <= cap)
                  .drop("_salt", "_r1"))
    w2 = Window.partitionBy(key_name) \
               .orderBy(ordc.asc(), F.col(id_col).asc())
    return (pruned.withColumn("rk", F.row_number().over(w2))
                  .filter(F.col("rk") <= cap))
