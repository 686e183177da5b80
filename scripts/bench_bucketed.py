#!/usr/bin/env python
"""Bucketed-table payoff bench (VERDICT r3 item 6): the unique-url stage of
the flagship suite — bucketed scan → validity filters → salted two-phase dup
aggregate — on a url-bucketed table vs the same data as plain parquet.

The bucketed write pre-pays the suite's one shuffle exchange; this measures
what that buys per recurring validation run. Both inputs are materialized on
disk first (write time excluded — the whole point is that the shuffle cost
moved to write time), then timed INTERLEAVED best-of-N (this host has
multi-minute external contention bursts; never time two modes back-to-back).

Asserts the bucketed plan has zero 'Exchange hashpartitioning' and the plain
plan has at least one, and that both produce identical dup counts.

Usage: python scripts/bench_bucketed.py [--replicas 100] [--reps 3]
                                        [--cores 32] [--buckets 64]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=100)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from sparkcheck import suite as S
    from sparkcheck.operators.uniqueness import duplicate_keys
    from sparkcheck.session import get_spark
    from sparkcheck.sources.bucketed import read_bucketed, write_bucketed
    from sparkcheck.sources.dims import iso_lang_dim
    from sparkcheck.sources.pages import load_pages

    spark = get_spark(cores=args.cores, app="bench-bucketed")
    spark.sparkContext.setLogLevel("ERROR")
    dim = iso_lang_dim(spark)

    base = tempfile.mkdtemp(prefix="bench_bucketed_")
    cols = ["url", "text", "lang", "warc_epoch", "rid"]  # html dead here
    pages = load_pages(spark, args.sf_dir, replicas=args.replicas) \
        .select(*cols)
    n_rows = pages.count()

    # materialize both inputs (untimed): identical rows, one bucketed
    plain_path = os.path.join(base, "plain")
    pages.write.parquet(plain_path)
    spark.sql("DROP TABLE IF EXISTS bench_pages_b")
    write_bucketed(pages, "bench_pages_b", bucket_col="url",
                   buckets=args.buckets, path=os.path.join(base, "bucketed"))

    def stage(df):
        return duplicate_keys(S.valid_pages(df, dim), "url")

    def run(df) -> tuple[float, int]:
        t0 = time.perf_counter()
        n = stage(df).count()
        return time.perf_counter() - t0, n

    plain_df = spark.read.parquet(plain_path)
    buck_df = read_bucketed(spark, "bench_pages_b")

    # plan contracts before timing
    p_plain = stage(plain_df)._jdf.queryExecution().executedPlan().toString()
    p_buck = stage(buck_df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in p_plain, "plain path must shuffle"
    assert "Exchange hashpartitioning" not in p_buck, \
        "bucketed unique-url stage must be exchange-free"

    # warm both plan shapes once (JIT), then interleave timed reps
    run(plain_df)
    run(buck_df)
    t_plain, t_buck = [], []
    n_plain = n_buck = None
    for _ in range(args.reps):
        w, n_plain = run(plain_df)
        t_plain.append(round(w, 3))
        w, n_buck = run(buck_df)
        t_buck.append(round(w, 3))
    assert n_plain == n_buck, (n_plain, n_buck)

    spark.sql("DROP TABLE IF EXISTS bench_pages_b")
    shutil.rmtree(base, ignore_errors=True)

    print(json.dumps({
        "metric": "unique_url_stage_sec",
        "rows": n_rows, "cores": args.cores, "buckets": args.buckets,
        "plain_best": min(t_plain), "bucketed_best": min(t_buck),
        "speedup": round(min(t_plain) / min(t_buck), 2),
        "plain_runs": t_plain, "bucketed_runs": t_buck,
        "dup_keys": n_plain}))


if __name__ == "__main__":
    sys.exit(main())
