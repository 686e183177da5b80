"""ColumnStatsRule.hist_cols is a real output (VERDICT r02 item 2): the
requested length histograms appear on ValidationResult.hists and equal the
standalone length_histogram operator over the same frontier; when not
requested, hists is None."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkcheck import suite as S
from sparkcheck.operators.stats import length_histogram
from sparkcheck.sources.dims import iso_lang_dim
from sparkcheck.sources.pages import load_pages

from .conftest import SF_SMALL


def test_requested_hist_cols_appear_in_result(spark):
    _, res = S.run_suite(spark, SF_SMALL, replicas=2, with_drift=False)
    assert res.hists is not None, "hist_cols requested but hists is None"
    got = {(r["col"], r["bucket"], r["n"]) for r in res.hists.collect()}
    fr = S.frontier_after_unique(load_pages(spark, SF_SMALL, replicas=2),
                                 iso_lang_dim(spark))
    want = {("text", r["bucket"], r["n"])
            for r in length_histogram(fr, "text", bin_width=50).collect()}
    res.unpersist()
    assert got == want and got


def test_hists_none_when_not_requested(spark):
    from sparkcheck import FieldConstraint, build_validator
    df = spark.range(5).select(F.concat(F.lit("https://x/"),
                                        F.col("id").cast("string")).alias("url"))
    v = (build_validator()
         .input(constraints=[FieldConstraint("url", "url IS NOT NULL", "req")],
                key_col="url")
         .column_stats(["url"]))
    res = v.validate(df, persist=False)
    assert res.stats is not None and res.hists is None


def test_windowed_kl_known_answer(spark):
    """day 101: p=(.75,.25) vs day 100 q=(.5,.5) → KL ≈ 0.1308; day 100
    has no predecessor and must not appear; a gap day breaks the chain.
    Expected value mirrors the micro-nat quantization (each term floored
    to integer 1e-6 nats BEFORE the sum — the order-independent
    cross-engine convention, ADVICE r5)."""
    import math
    from pyspark.sql import functions as F

    from sparkcheck.operators.drift import KL_SCALE, windowed_kl
    rows = ([(100 * 86400, "a")] * 2 + [(100 * 86400, "b")] * 2
            + [(101 * 86400, "a")] * 3 + [(101 * 86400, "b")]
            + [(200 * 86400, "a")])           # isolated day → excluded
    df = spark.createDataFrame(rows, "warc_epoch bigint, lang string")
    out = {r["day"]: r["kl4"] for r in
           windowed_kl(df, F.col("lang")).collect()}
    assert set(out) == {101}
    s = 1e-9
    terms = [(0.75 + s) * math.log((0.75 + s) / (0.5 + s)),
             (0.25 + s) * math.log((0.25 + s) / (0.5 + s))]
    sum_u = sum(math.floor(t * KL_SCALE + 0.5) for t in terms)
    assert out[101] == math.floor(sum_u / (KL_SCALE // 10_000) + 0.5) / 1e4
