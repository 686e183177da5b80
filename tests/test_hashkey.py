"""key='hash' (xxhash64 shuffle keys) ≡ key='string' for the gram/line-keyed
operators (VERDICT r5 item 6): at 100 TB the gram/line STRING is the shuffle
cost, so each operator offers an xxhash64-keyed variant; these tests pin that
the variant produces identical output rows at sf0.01 (collision probability
~N²/2⁶⁵ — zero observed, and a collision would flip a count, not crash).

Plus the training_shard_v2 stage-semantics test (VERDICT r5 item 4) and the
partition_stats invariants (VERDICT r5 item 8).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkcheck.operators import dedup, quality

from .conftest import SF_DIR


def _docs(spark):
    return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
                 .filter(F.col("text").isNotNull()))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _lined(spark):
    docs = _docs(spark)
    return docs.select(
        "doc_id", quality.lines_noise("text", "doc_id").alias("text"))


def test_cross_doc_gram_frac_hash_key_equivalent(spark):
    docs = _docs(spark)
    s = dedup.cross_doc_gram_frac(docs, "doc_id")
    h = dedup.cross_doc_gram_frac(docs, "doc_id", key="hash")
    assert _rows(s) == _rows(h)


def test_line_dedup_hash_key_equivalent(spark):
    lined = _lined(spark)
    s = dedup.line_dedup(lined, "doc_id")
    h = dedup.line_dedup(lined, "doc_id", key="hash")
    assert _rows(s) == _rows(h)


def test_dup_spans_hash_key_equivalent(spark):
    docs = _docs(spark)
    s = dedup.dup_spans(docs, "doc_id")
    h = dedup.dup_spans(docs, "doc_id", key="hash")
    assert _rows(s) == _rows(h)


def test_cut_dup_spans_hash_key_equivalent(spark):
    docs = _docs(spark)
    s = dedup.cut_dup_spans(docs, "doc_id")
    h = dedup.cut_dup_spans(docs, "doc_id", key="hash")
    assert _rows(s) == _rows(h)


def test_decontaminate_hash_key_equivalent(spark):
    docs = _docs(spark)
    bench = docs.filter(F.col("doc_id") % quality.DECON_MOD == 0)
    s = quality.decontaminate(docs, bench, n=quality.DECON_N)
    h = quality.decontaminate(docs, bench, n=quality.DECON_N, key="hash")
    assert _rows(s) == _rows(h)


def test_ngram_jaccard_hash_key_equivalent(spark):
    """r7: the Jaccard verify over xxhash64'd shingle sets (what the fast
    fuzzy variant ships) must produce the identical (id_a, id_b, jaccard)
    rows as the byte-exact string-set oracle formulation —
    |A∩B|/|A∪B| is invariant under an injective-in-practice hash."""
    docs = _docs(spark).selectExpr("doc_id AS rid", "text")
    cand = dedup.minhash_candidates(docs, id_col="rid", variant="fast")
    s = dedup.ngram_jaccard(docs, cand, "rid")
    h = dedup.ngram_jaccard(docs, cand, "rid", key="hash")
    assert _rows(s) == _rows(h) and s.count() > 0


def test_minhash_fast_codegen_grams_formulation(spark):
    """r7: with_minhash_fast builds shingles via explode-of-start-positions
    + codegen concat_ws/slice; the produced (id, band, bucket) rows must be
    byte-identical to the interpreted shingles()-transform formulation it
    replaced (including the short-text whole-document degenerate case)."""
    docs = _docs(spark).selectExpr("doc_id AS rid", "text").union(
        spark.createDataFrame([(900001, "one two")], "rid long, text string"))
    got = dedup.with_minhash_fast(docs, "rid")
    # reference: the pre-r7 formulation — explode the interpreted shingle
    # array, then the identical scalar xxhash64 aggregates
    k, bands = dedup.DEFAULT_K, dedup.DEFAULT_BANDS
    rows_per = k // bands
    ex = (docs.filter(F.col("text").isNotNull())
              .select(F.col("rid").alias("id"),
                      F.explode(dedup.shingles("text")).alias("_s")))
    sig = ex.groupBy("id").agg(
        *[F.min(F.xxhash64(F.lit(j), F.col("_s"))).alias(f"_h{j}")
          for j in range(k)])
    band_structs = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.xxhash64(F.lit(b), *[F.col(f"_h{b * rows_per + r}")
                                        for r in range(rows_per)])
                 .alias("bucket"))
        for b in range(bands)])
    want = (sig.select("id", F.explode(band_structs).alias("bb"))
               .select("id", F.col("bb")["band"].alias("band"),
                       F.col("bb")["bucket"].alias("bucket")))
    assert _rows(got) == _rows(want)


def test_training_shard_keep_first_hash_window_equivalent(spark):
    """r7 (VERDICT r6 item 4): training_shard's keep-first stage windows on
    (xxhash64(text), md5(text)) instead of the raw text — output must be
    identical to the raw-text window composition."""
    from pyspark.sql import Window

    from sparkcheck.operators import pipeline, sampling
    docs = _docs(spark)
    bench = docs.filter(F.col("doc_id") % quality.DECON_MOD == 0)
    got = _rows(pipeline.training_shard(docs, bench))

    passing = (quality.gopher_quality(docs)
               .filter(F.col("gopher_pass")).select("doc_id"))
    keep_first = (docs.withColumn(
        "_keep", F.min("doc_id").over(Window.partitionBy("text")))
        .filter(F.col("doc_id") == F.col("_keep")))
    contaminated = quality.decontaminate(
        docs, bench, n=quality.DECON_N).select("doc_id")
    kept = (keep_first.join(passing, "doc_id")
            .join(F.broadcast(bench.select("doc_id").distinct()),
                  "doc_id", "left_anti")
            .join(contaminated, "doc_id", "left_anti"))
    want = _rows(sampling.stratified_hash_sample(
        kept, "doc_id", "lang", sampling.MIX_RATES, sampling.MIX_DEFAULT)
        .select("doc_id", "lang",
                F.size(F.split(F.col("text"), " ")).cast("int")
                .alias("n_tokens")))
    assert got == want and got


def test_bad_key_raises(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="key must be"):
        dedup.line_dedup(docs, "doc_id", key="md5")
    with pytest.raises(ValueError, match="key must be"):
        dedup.ngram_jaccard(docs, docs.selectExpr(
            "doc_id AS id_a", "doc_id AS id_b"), "doc_id", key="md5")


def test_hash_key_shrinks_shuffle_key_width(spark):
    """The point of the option: the agg/join key is an 8-byte long, not the
    line/gram string — assert the hash variant's first-occurrence aggregate
    really groups on a LongType key."""
    lined = _lined(spark)
    h = dedup.line_dedup(lined, "doc_id", key="hash")
    plan = h._jdf.queryExecution().optimizedPlan().toString()
    assert "xxhash64" in plan


def test_training_shard_v2_stage_semantics(spark):
    """training_shard_v2 ≡ the hand-applied stage chain: gopher gate →
    line_dedup (drop emptied docs) → cut_dup_spans (drop emptied docs) →
    exact dedup on the CLEANED text → stratified sample."""
    from pyspark.sql import Window

    from sparkcheck.operators import pipeline, sampling
    lined = _lined(spark).join(
        _docs(spark).select("doc_id", "lang"), "doc_id")
    got = _rows(pipeline.training_shard_v2(lined))

    gated = lined.join(
        quality.gopher_quality(lined).filter(F.col("gopher_pass"))
        .select("doc_id"), "doc_id")
    ld = (dedup.line_dedup(gated, "doc_id")
          .filter(F.col("n_kept") > 0)
          .select("doc_id", F.col("clean_text").alias("text")))
    cut = (dedup.cut_dup_spans(ld, "doc_id")
           .filter(F.col("clean_text") != "")
           .select("doc_id", F.col("clean_text").alias("text")))
    first = (cut.withColumn(
        "_m", F.min("doc_id").over(Window.partitionBy("text")))
        .filter(F.col("doc_id") == F.col("_m")))
    kept = first.join(lined.select("doc_id", "lang"), "doc_id")
    want = _rows(sampling.stratified_hash_sample(
        kept, "doc_id", "lang", sampling.MIX_RATES, sampling.MIX_DEFAULT)
        .select("doc_id", "lang",
                F.size(F.split("text", " ")).cast("int").alias("n_tokens")))
    assert got == want and got


def test_partition_stats_invariants(spark):
    """The one rows-only driver query still has teeth (VERDICT r5 item 8):
    per-partition counts sum to the table count, partition ids are dense
    [0, n_partitions), and every count is positive."""
    import __spark_entry__ as entry
    df = entry.queries()["partition_stats"](spark, SF_DIR)
    rows = df.collect()
    pids = sorted(r["partition_id"] for r in rows)
    assert pids == list(range(len(pids)))
    total = sum(r["rows"] for r in rows)
    assert all(r["rows"] > 0 for r in rows)
    expect = entry.queries()["pages_table"](spark, SF_DIR).count()
    assert total == expect
