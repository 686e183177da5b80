"""Mergeable HLL sketches: two disjoint half-runs' sketches union to (about)
the full exact distinct count — the resume-without-double-counting mechanism
for distinct stats (SURVEY.md §7 hard part e)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkcheck.operators.stats import column_sketches, merge_sketch_estimates

from .conftest import SF_DIR


def test_sketch_union_equals_full_estimate(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    h1 = docs.filter(F.col("doc_id") % 2 == 0)
    h2 = docs.filter(F.col("doc_id") % 2 == 1)

    merged = merge_sketch_estimates(
        column_sketches(h1, ["doc_id", "lang"])
        .unionByName(column_sketches(h2, ["doc_id", "lang"])))
    got = {r["col"]: r["n_distinct"] for r in merged.collect()}

    exact = {
        "doc_id": docs.select("doc_id").distinct().count(),
        "lang": docs.select("lang").distinct().count(),
    }
    assert got["lang"] == exact["lang"]  # tiny cardinality → exact
    assert abs(got["doc_id"] - exact["doc_id"]) <= 0.05 * exact["doc_id"]

    # overlapping runs must NOT double count
    merged_overlap = merge_sketch_estimates(
        column_sketches(docs, ["doc_id"])
        .unionByName(column_sketches(docs, ["doc_id"])))
    n = merged_overlap.collect()[0]["n_distinct"]
    assert abs(n - exact["doc_id"]) <= 0.05 * exact["doc_id"]


def test_resumable_runs_merge_sketches(spark, tmp_path):
    from sparkcheck.manifest import global_distinct, run_resumable
    from sparkcheck import build_validator
    src = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    inp = str(tmp_path / "docs")
    src.repartition(4).write.parquet(inp)

    def builder_fn(spark, pending):
        return (build_validator().input(constraints=[], key_col="doc_id")
                .provide()), pending

    import os
    files = sorted(os.path.join(inp, f) for f in os.listdir(inp)
                   if f.endswith(".parquet"))
    base = str(tmp_path / "out")
    # two partial runs then resume the rest
    run_resumable(spark, files[0], builder_fn, base, run_id="r1",
                  sketch_cols=["doc_id", "lang"])
    run_resumable(spark, inp, builder_fn, base, run_id="r2",
                  sketch_cols=["doc_id", "lang"])
    got = {r["col"]: r["n_distinct"]
           for r in global_distinct(spark, base).collect()}
    exact = src.select("doc_id").distinct().count()
    assert got["lang"] == src.select("lang").distinct().count()
    assert abs(got["doc_id"] - exact) <= 0.05 * exact


def test_approx_quantiles_within_rank_tolerance(spark):
    """VERDICT r02 item 6: the documented approx_percentile drop-in for
    numeric_quantiles, tolerance-tested like the HLL analogue. Rank error is
    ≤ n/accuracy, so each approx quantile must lie between the EXACT
    quantiles at p ± 2/accuracy (slack ×2 for interpolation)."""
    from sparkcheck.operators.stats import (numeric_quantiles,
                                            numeric_quantiles_approx)

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    probs = (0.25, 0.5, 0.75, 0.95)
    acc = 1000
    approx = {r["p"]: r["q"] for r in
              numeric_quantiles_approx(events, ["value"], probs,
                                       accuracy=acc).collect()}
    eps = 2.0 / acc
    lo_probs = tuple(max(0.0, p - eps) for p in probs)
    hi_probs = tuple(min(1.0, p + eps) for p in probs)
    lo = {round(probs[i], 6): r["q"] for i, r in enumerate(
        numeric_quantiles(events, ["value"], lo_probs).collect())}
    hi = {round(probs[i], 6): r["q"] for i, r in enumerate(
        numeric_quantiles(events, ["value"], hi_probs).collect())}
    for p in probs:
        assert lo[p] <= approx[p] <= hi[p], (p, lo[p], approx[p], hi[p])
