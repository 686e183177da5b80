#!/usr/bin/env python
"""sparkcheck benchmark harness.

Runs the flagship validation suite (full rule set) plus per-operator headline
queries over the deterministic pages table derived from
$SPARK_GRAFT_SF_DIR/documents.parquet (default /root/testdata/sf0.1),
amplified by SPARKCHECK_BENCH_REPLICAS (default 200 → ~1M pages at sf0.1),
on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "validated_docs_per_sec_full_suite", "value": N, "unit": "docs/sec",
   "queries": {name: seconds, ...}, "sf": ..., "rows": ..., "cores": ...}

Timing excludes SparkSession startup; a small warmup run precedes the timed
region (JVM/codegen warm). Results are forced with count()/noop-style actions.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F


def _force(df) -> int:
    """Execute the plan fully; return row count."""
    return df.count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    replicas = int(os.environ.get("SPARKCHECK_BENCH_REPLICAS", "400"))

    from sparkcheck import suite as S
    from sparkcheck.operators.stats import column_stats, length_histogram
    from sparkcheck.operators.uniqueness import duplicate_keys
    from sparkcheck.operators.drift import kl_divergence
    from sparkcheck.functions.extraction import extract_text
    from sparkcheck.session import get_spark
    from sparkcheck.sources.dims import iso_lang_dim
    from sparkcheck.sources.pages import load_pages

    spark = get_spark(cores=cpus, app="sparkcheck-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # optional per-op filter (bench_ab.py --queries mode): run ONLY the
    # named rows — per-op prev/head A/B needs each side cheap enough to
    # interleave best-of-N in one afternoon
    qfilter = {q for q in os.environ.get(
        "SPARKCHECK_BENCH_QUERIES", "").split(",") if q}

    def want(name: str) -> bool:
        return not qfilter or name in qfilter

    # warmup (untimed): run the SAME plan shape once at full size —
    # the first execution of each generated-code plan pays JIT/C2
    # compilation of the (large) whole-stage code and python-worker
    # startup (measured 2-4x on the first run); steady-state throughput
    # is what the metric reports. (In --queries mode each timed row's
    # rep 1 is its own warmup — skip the full-suite warmup unless the
    # full suite itself is being measured.)
    if want("full_suite"):
        _, warm = S.run_suite(spark, sf_dir, replicas=replicas)
        _force(warm.verdicts)
        _force(warm.violations)
        if warm.stats is not None:
            _force(warm.stats)
        if warm.hists is not None:
            _force(warm.hists)
        warm.unpersist()

    pages = load_pages(spark, sf_dir, replicas=replicas)
    dim = iso_lang_dim(spark)
    n_rows = _force(pages)

    # drift baseline is a stored artifact of a prior run — precompute it
    # (untimed) and hand the materialized snapshot to the suite, as a real
    # deployment would read it from a tiny parquet table (only needed by
    # the suite/drift rows — skip the pass in --queries mode otherwise)
    baseline = None
    if want("full_suite") or want("drift_kl"):
        baseline = spark.createDataFrame(
            S.make_baseline(pages, replicas, dim).collect(),
            "col string, bucket string, p double")

    timings: dict[str, float] = {}
    raw_runs: dict[str, list[float]] = {}
    run_ts: dict[str, list[float]] = {}

    def timed(name, fn, reps=1):
        """Best-of-`reps` timing; every raw run is recorded in the output so
        round-over-round comparisons can see through this host's documented
        multi-minute external contention bursts (a single-shot row that
        regressed 3× on paper was indistinguishable from contention).
        Each run's UNIX start timestamp is recorded too (VERDICT r5 item 1:
        attribute outliers to specific moments, not whole runs). In
        --queries mode, rows not named in the filter are skipped."""
        if not want(name):
            return
        runs = []
        starts = []
        for _ in range(reps):
            starts.append(round(time.time(), 2))
            t0 = time.perf_counter()
            fn()
            runs.append(round(time.perf_counter() - t0, 3))
        raw_runs[name] = runs
        run_ts[name] = starts
        timings[name] = min(runs)

    # full suite: verdicts + violations forced (stats/drift included)
    def full_suite():
        _, res = S.run_suite(spark, sf_dir, replicas=replicas,
                             baseline=baseline)
        _force(res.verdicts)
        _force(res.violations)
        if res.stats is not None:
            _force(res.stats)
        if res.hists is not None:
            _force(res.hists)
        res.unpersist()

    # the headline is best-of-N (SPARKCHECK_BENCH_INNER; default 2 in full
    # mode — the sandbox host has multi-minute external contention bursts a
    # single timed run lands in ~1/4 of the time. The scaling protocol
    # defaults to 1 and supplies its own reps, amortizing the full-size
    # warmup across inner runs of one subprocess.)
    only = os.environ.get("SPARKCHECK_BENCH_ONLY") == "full_suite"
    inner = int(os.environ.get("SPARKCHECK_BENCH_INNER",
                               "1" if only else "2"))
    timed("full_suite", full_suite, reps=inner)
    if only:
        docs_per_sec = round(n_rows / timings["full_suite"], 1)
        print(json.dumps({
            "metric": "validated_docs_per_sec_full_suite",
            "value": docs_per_sec, "unit": "docs/sec", "queries": timings,
            "full_suite_runs": raw_runs["full_suite"],
            "sf": sf_dir.rstrip("/").split("/")[-1], "rows": n_rows,
            "cores": cpus, "replicas": replicas}))
        return
    timed("unique_url", lambda: _force(
        duplicate_keys(S.valid_pages(pages, dim), "url")), reps=inner)
    timed("column_stats", lambda: _force(
        column_stats(S.frontier_after_unique(pages, dim), S.STATS_COLS)),
        reps=inner)
    timed("length_histogram", lambda: _force(
        length_histogram(S.frontier_after_unique(pages, dim), "text")),
        reps=inner)
    timed("extraction", lambda: _force(
        pages.select(F.sha2(extract_text(F.col("html")), 256).alias("h"))
             .filter(F.col("h").isNotNull())), reps=inner)
    timed("drift_kl", lambda: kl_divergence(
        S.frontier_after_unique(pages, dim), "lang",
        F.coalesce(F.col("lang"), F.lit("∅")), baseline), reps=inner)

    # operator-level headline points (constant-size where the operator's
    # full-replica cost would dominate the bench wall time)
    from sparkcheck.operators import dedup, similarity
    from sparkcheck.operators.skew import heavy_hitters
    from sparkcheck.oracle import HOST_RE
    timed("heavy_hitters", lambda: _force(heavy_hitters(
        pages, F.regexp_extract(F.col("url"), HOST_RE, 1), 20)), reps=inner)
    mh_pages = load_pages(spark, sf_dir, replicas=min(replicas, 20))
    timed("dedup_minhash_fast_100k", lambda: _force(
        dedup.minhash_candidates(mh_pages, id_col="rid", variant="fast")),
        reps=inner)
    def fuzzy_drops():
        # owner list = the engine-style lifecycle: the converged label frame
        # stays cached for the consuming action, released right after
        handles: list = []
        _force(dedup.fuzzy_drop_list(mh_pages, id_col="rid", variant="fast",
                                     owner=handles))
        for h in handles:
            h.unpersist()
    timed("dedup_fuzzy_drop_list_100k", fuzzy_drops, reps=inner)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    timed("ann_lsh_topk", lambda: _force(
        similarity.lsh_topk(emb, [0, 1, 2, 3, 4], k=10, tables=2)),
        reps=inner)
    timed("ann_ivf_topk", lambda: _force(
        similarity.ivf_topk(emb, [0, 1, 2, 3, 4], k=10, nprobe=2)),
        reps=inner)

    # --- ANN at a corpus size where the scale machinery ENGAGES ----------
    # The shipped embeddings table is 500-2000 vectors — auto_centroids
    # lands at ~45 and the IVF Arrow auto-switch / >16-bit LSH widths never
    # run under timed bench (r4 verdict gap). Amplify to ~1.02M vectors
    # (deterministic hash-perturbed replicas), written to parquet once
    # (untimed) so the timed runs scan columnar storage like production:
    #   auto_centroids(1_024_000) = 1024 > IVF_UDF_SWITCH=256 → the Arrow
    #   matmul assignment path, confirmed from the executed plan;
    #   auto_bits(1_024_000, target_bucket_size=8) = 17 > 16 planes,
    #   bucketed via the Arrow signature UDF (the scale path — the codegen
    #   fold stays the oracle formulation at driver-gate sizes).
    import shutil
    import tempfile

    from sparkcheck.sources.embeddings import load_embeddings
    ann_target = int(os.environ.get("SPARKCHECK_BENCH_ANN_ROWS",
                                    "1024000"))
    ann_queries = [0, 1, 2, 3, 4]
    ann_block: dict = {}
    ann_1m_names = ("ann_lsh_topk_1m", "ann_ivf_topk_1m",
                    "ann_brute_topk_1m")
    if ann_target > 0 and any(want(n) for n in ann_1m_names):
        n_base = _force(emb)
        ann_reps = max(1, ann_target // n_base)
        ann_dir = tempfile.mkdtemp(prefix="sparkcheck_ann_")
        load_embeddings(spark, sf_dir, replicas=ann_reps) \
            .write.mode("overwrite").parquet(f"{ann_dir}/emb")
        emb1m = spark.read.parquet(f"{ann_dir}/emb")
        n1m = _force(emb1m)
        bits1m = similarity.auto_bits(n1m, target_bucket_size=8)
        c1m = similarity.auto_centroids(n1m)
        timed("ann_lsh_topk_1m", lambda: _force(
            similarity.lsh_topk(emb1m, ann_queries, k=10, bits=bits1m,
                                tables=2, use_udf=True)), reps=inner)
        timed("ann_ivf_topk_1m", lambda: _force(
            similarity.ivf_topk(emb1m, ann_queries, k=10, nprobe=2)),
            reps=inner)
        # the Arrow brute force is both the recall oracle AND a headline
        # point of its own: at Q=5 queries the one-pass exact scan beats
        # IVF (whose cost is the query-independent corpus assignment —
        # IVF amortizes over many queries, brute wins at few)
        timed("ann_brute_topk_1m", lambda: _force(
            similarity.brute_topk_udf(emb1m, ann_queries, k=10)),
            reps=inner)
        # recall block (untimed): ONE collect per query family; the IVF
        # DataFrame doubles as the plan-confirmation source so the bench
        # pays no extra full pass just to stringify the plan (the r5
        # verdict flagged the old 3rd rebuild + re-collects as ~4 extra
        # corpus passes widening the contention window). Skipped in
        # --queries mode: the A/B wants tight interleaved wall-clock rows,
        # not re-derived recall evidence.
        if not qfilter:
            ivf_df = similarity.ivf_topk(emb1m, ann_queries, k=10, nprobe=2)
            ivf1m = {(r["query_id"], r["vec_id"]) for r in ivf_df.collect()}
            ivf_plan = ivf_df._jdf.queryExecution().executedPlan().toString()
            brute1m = {(r["query_id"], r["vec_id"]) for r in
                       similarity.brute_topk_udf(emb1m, ann_queries, k=10)
                       .collect()}
            lsh1m = {(r["query_id"], r["vec_id"]) for r in
                     similarity.lsh_topk(emb1m, ann_queries, k=10,
                                         bits=bits1m, tables=2,
                                         use_udf=True).collect()}
            ann_block = {
                "rows": n1m, "bits": bits1m, "centroids": c1m,
                "ivf_arrow_assignment": ("ArrowEvalPython" in ivf_plan
                                         and c1m > similarity.IVF_UDF_SWITCH),
                "recall_lsh": round(len(brute1m & lsh1m) / len(brute1m), 4),
                "recall_ivf": round(len(brute1m & ivf1m) / len(brute1m), 4),
            }
        shutil.rmtree(ann_dir, ignore_errors=True)

    # event-stream operators over a replica-amplified events table (users
    # shifted per replica so the key space scales with the data — the
    # shape a real crawl log has). events.parquet is one file: repartition
    # BEFORE the replica explode, same lesson as the pages loader.
    from sparkcheck.operators.asof import asof_join
    from sparkcheck.operators.sessions import sessionize
    ev2m = None
    if want("sessionize_2m") or want("asof_join_2m"):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
                  .repartition(cpus)
        ev_reps = 20
        # replica key shift derived from the data (one O(1) setup
        # aggregate): a hardcoded stride would silently collide replica key
        # spaces if the generator ever grows the user domain, shrinking the
        # keys these benches are meant to scale
        ev_shift = ev.agg(F.max("user_id")).first()[0] + 1
        ev2m = (ev.crossJoin(
                    spark.range(ev_reps).withColumnRenamed("id", "rep"))
                  .withColumn("user_id",
                              F.col("user_id") + F.col("rep") * ev_shift)
                  .withColumn("event_id",
                              F.col("event_id") * ev_reps + F.col("rep"))
                  .drop("rep"))
        timed("sessionize_2m", lambda: _force(sessionize(ev2m)), reps=inner)
    # composed training-set materialization at constant size (its n-gram
    # explode dominates if run at full replicas)
    from sparkcheck.operators import pipeline, quality
    shard_docs = (mh_pages.selectExpr("rid AS doc_id", "text", "lang"))
    shard_bench = shard_docs.filter(
        F.col("doc_id") % quality.DECON_MOD == 0)
    timed("training_shard_100k", lambda: _force(
        pipeline.training_shard(shard_docs, shard_bench)), reps=inner)
    # line-granularity web-text ops: structure lines cheaply (codegen
    # regexp_replace at sentence boundaries; quality.lines_noise's
    # interpreted transform is for ORACLE parity — input synthesis would
    # dominate a timing here)
    lined = mh_pages.select(
        "rid", F.regexp_replace("text", r"\. ", ".\n").alias("text"))
    timed("c4_quality_100k", lambda: _force(
        quality.c4_quality(lined, "rid")), reps=inner)
    timed("line_dedup_100k", lambda: _force(
        dedup.line_dedup(lined, "rid")), reps=inner)
    # span family (VERDICT r5 item 5): the most shuffle-intensive new
    # operators — gram explode + per-doc two-window interval merge (+ the
    # span-cut join-back) — get their own wall-clock rows
    timed("dup_spans_100k", lambda: _force(
        dedup.dup_spans(mh_pages, "rid")), reps=inner)
    timed("cut_dup_spans_100k", lambda: _force(
        dedup.cut_dup_spans(mh_pages, "rid")), reps=inner)
    from sparkcheck.operators.textstats import unigram_logppl
    timed("unigram_logppl_100k", lambda: _force(
        unigram_logppl(shard_docs)), reps=inner)
    # loader-facing tail of the pipeline: sequence packing's two-phase
    # prefix sum (bucket_width sized so the bucket-summary window actually
    # has ~25 buckets to scan over — the default 2^20 would put this corpus
    # in ONE bucket and time the degenerate single-window shape instead)
    # and target-mixture resampling (one tiny aggregate + codegen filter)
    from sparkcheck.operators.packing import pack_sequences
    from sparkcheck.operators.sampling import (TARGET_DEFAULT_MYRIAD,
                                               TARGET_MYRIAD,
                                               mixture_resample)
    timed("pack_sequences_100k", lambda: _force(
        pack_sequences(shard_docs, seq_len=2048, bucket_width=4096)),
        reps=inner)
    timed("mixture_resample_100k", lambda: _force(
        mixture_resample(shard_docs, "doc_id", "lang", TARGET_MYRIAD,
                         TARGET_DEFAULT_MYRIAD)), reps=inner)
    if ev2m is not None:
        upd = (ev2m.filter(F.col("event_id") % 20 == 0)
                   .select("user_id", "ts",
                           F.col("value").alias("asof_value")))
        timed("asof_join_2m", lambda: _force(
            asof_join(ev2m, upd, on="user_id", ts_col="ts",
                      left_cols=["event_id", "user_id"],
                      right_cols=["asof_value"])), reps=inner)

    docs_per_sec = (round(n_rows / timings["full_suite"], 1)
                    if "full_suite" in timings else None)
    out = {
        "metric": "validated_docs_per_sec_full_suite",
        "value": docs_per_sec,
        "unit": "docs/sec",
        "queries": timings,
        "query_runs": raw_runs,
        "query_run_ts": run_ts,
        "sf": sf_dir.rstrip("/").split("/")[-1],
        "rows": n_rows,
        "cores": cpus,
        "replicas": replicas,
    }
    if ann_block:
        out["ann_1m"] = ann_block
    # same-day A/B evidence (scripts/bench_ab.py writes it; round-over-round
    # headline comparisons are only trustworthy produced that way — this
    # host shows 30% same-config spread across days)
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH")
    for key, fname in (("ab", "ab_latest.json"),
                       ("ab_queries", "ab_queries_latest.json")):
        path = os.path.join(bench_dir, fname)
        if os.path.exists(path):
            try:
                with open(path) as f:
                    out[key] = json.load(f)
            except (OSError, json.JSONDecodeError):
                pass
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
