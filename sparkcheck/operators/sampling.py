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
