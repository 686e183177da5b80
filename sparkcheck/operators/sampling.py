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


# driver-query target mixture for mixture_resample (documents.lang strata),
# integer per-myriad shares, imported by oracle.mixture_resample so the two
# sides cannot drift
TARGET_MYRIAD = {"en": 4000, "zh": 2500, "de": 2000}
TARGET_DEFAULT_MYRIAD = 750


def mixture_resample(df: DataFrame, id_col: str, strata_col: str,
                     target_myriad: dict[str, int],
                     default_myriad: int) -> DataFrame:
    """Target-mixture resampling — the step AFTER the source_mix report:
    given integer per-myriad target shares per stratum, compute the
    per-stratum acceptance rate that moves the corpus mixture to the
    target while keeping the largest possible sample (the stratum most
    under-represented relative to its target keeps rate 1.0; every other
    stratum is thinned proportionally), then apply it with the same
    deterministic md5-bucket filter the rest of the sampling family uses.

    rate_s = (T_s / n_s) / max_u(T_u / n_u), realised as the integer
    threshold floor(T_s * n_m * SAMPLE_MOD / (T_m * n_s)) where m is the
    argmax stratum — EXACT integer arithmetic end-to-end (decimal(38,0)
    products here, HUGEINT in the DuckDB oracle), so both engines keep
    byte-identical row sets; the only double is the argmax ratio, a single
    IEEE division identical on both engines, tie-broken by stratum name.

    Output: the kept rows as (id, stratum, rate_myriad).

    Scale shape: one map-side-combining aggregate over the stratum key
    (tiny by definition — it's a mixing knob), a 1-row argmax broadcast
    crossJoined into the threshold expressions, a broadcast join of the
    O(strata) threshold frame back onto the corpus, and a shuffle-free
    codegen hash filter. One corpus scan, zero corpus shuffles, lazy
    construction (no build-time job — the tfidf eager-count lesson).

    CONTRACT (ADVICE r6): `strata_col` must be a bounded mixing dimension
    (language, source — the things target dicts are written for). The
    threshold frame has one row per DISTINCT stratum and is broadcast
    unconditionally BECAUSE of that bound; the unconditional hint is the
    deliberate trade that keeps this operator lazy (a gate_broadcast probe
    would run a job at construction time, which the laziness test pins
    against). Do NOT pass a high-cardinality key (url host, domain) as
    `strata_col` — for per-key caps over unbounded keys use
    `capped_by_key`, whose salted two-phase window is built for that."""
    from pyspark.sql import Window

    docs = df.filter(F.col(strata_col).isNotNull()) \
             .select(F.col(id_col).alias("id"),
                     F.col(strata_col).alias("stratum"))
    per = docs.groupBy("stratum").agg(F.count(F.lit(1)).alias("n"))
    tgt = F.lit(default_myriad)
    for k in sorted(target_myriad):  # deterministic construction order
        tgt = F.when(F.col("stratum") == k,
                     F.lit(target_myriad[k])).otherwise(tgt)
    per = per.withColumn("t", tgt.cast("bigint"))
    w = Window.orderBy((F.col("t").cast("double") / F.col("n")).desc(),
                       F.col("stratum").asc())
    mx = (per.withColumn("_rn", F.row_number().over(w))
             .filter(F.col("_rn") == 1)
             .select(F.col("t").alias("tm"), F.col("n").alias("nm")))
    # exact floor division on decimal(38,0): num is exactly divisible after
    # subtracting the remainder, so the decimal divide is rounding-free
    num = (F.col("t").cast("decimal(38,0)") * F.lit(SAMPLE_MOD)
           * F.col("nm"))
    den = F.col("tm").cast("decimal(38,0)") * F.col("n")
    thr = (per.crossJoin(F.broadcast(mx))
              .select("stratum",
                      F.least(((num - num % den) / den).cast("bigint"),
                              F.lit(SAMPLE_MOD)).alias("rate_myriad")))
    return (docs.join(F.broadcast(thr), "stratum")
                .filter(hash_bucket(F.col("id")) < F.col("rate_myriad"))
                .select(F.col("id").alias(id_col), "stratum",
                        "rate_myriad"))
