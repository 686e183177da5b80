#!/usr/bin/env python
"""High-dup-density stress bench (VERDICT r02 item 7): the threshold gate's
raison d'être is mass duplication. Time the unique-url validation at ~30%
duplicated rows on a 10M-row synthetic table under three dup-list join
strategies, interleaved best-of-N:

  gated     — the engine default (collect-once probe; above-threshold →
              SHUFFLE_HASH-pinned join over the probe-warmed cache — the
              hint blocks AQE's compressed-bytes broadcast conversion)
  aqe       — no probe, no hint: both join children shuffle and AQE decides
              at runtime (pays the probe side's shuffle-file write)
  broadcast — unconditional F.broadcast hint on the dup list (what the gate
              protects against: at 30% density the list is ~1.5M keys; this
              is the OOM-at-scale shape, timed here to show it is also not
              faster)

Also asserts the executed plan keeps a shuffled join (no BroadcastHashJoin on
the dup list) under `gated` at this density.

Usage: python scripts/bench_dup_density.py [--rows 10000000] [--dup 0.3]
                                           [--reps 2] [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build_input(spark, rows: int, dup: float):
    """rows total; a `dup` fraction of rows share urls pairwise: ids in
    [0, rows*dup/2) appear twice (id and id + distinct_range)."""
    distinct = int(rows * (1 - dup / 2))
    return spark.range(rows).select(
        F.concat(F.lit("https://www.example.org/p/"),
                 (F.col("id") % distinct).cast("string")).alias("url"))


def run_mode(spark, mode: str, rows: int, dup: float) -> float:
    # patching U.gate_broadcast is enough: engine.run_validation resolves it
    # with a call-time import from operators.uniqueness
    import sparkcheck.operators.uniqueness as U
    from sparkcheck import FieldConstraint, build_validator

    orig = U.gate_broadcast

    def aqe_gate(small, key_col, owner=None):
        return small  # unhinted, unpersisted: both sides shuffle, AQE decides

    def force_broadcast_gate(small, key_col, owner=None):
        return F.broadcast(small)

    U.gate_broadcast = {"gated": orig, "aqe": aqe_gate,
                        "broadcast": force_broadcast_gate}[mode]
    try:
        df = build_input(spark, rows, dup)
        v = (build_validator()
             .input(constraints=[FieldConstraint("url", "url IS NOT NULL",
                                                 "req")], key_col="url")
             .unique("url"))
        t0 = time.perf_counter()
        res = v.validate(df)
        n_fail = res.verdicts.filter(~F.col("success")).count()
        wall = time.perf_counter() - t0
        expected_fail = int(rows * dup)
        assert n_fail == expected_fail, (n_fail, expected_fail)
        # at the timed size the dup list (rows*dup/2 keys) exceeds the
        # broadcast threshold -> the gated plan must stay a shuffled join;
        # at the small warmup size it legitimately fits and broadcasts
        if mode == "gated" and rows >= 5_000_000:
            plan = res.verdicts._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastHashJoin" not in plan, \
                "gate must NOT broadcast a 30%-density dup list"
            assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
        res.unpersist()
        return wall
    finally:
        U.gate_broadcast = orig


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--dup", type=float, default=0.3)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from sparkcheck.session import get_spark
    spark = get_spark(cores=args.cores, app="dup-density-stress")
    spark.sparkContext.setLogLevel("ERROR")

    modes = ["gated", "aqe", "broadcast"]
    # warm each plan shape once untimed (JIT of generated code, 2-4x) at a
    # size whose dup list already overflows the gate's probe cap — at 1M the
    # gated warm would take the broadcast path and leave the big-case
    # shuffled-join codegen cold for the first timed rep
    for m in modes:
        run_mode(spark, m, 3_000_000, args.dup)

    runs: dict[str, list[float]] = {m: [] for m in modes}
    for _ in range(args.reps):
        for m in modes:  # interleaved — host has bursty external contention
            w = run_mode(spark, m, args.rows, args.dup)
            runs[m].append(round(w, 2))
            print(f"  {m}: {w:.1f}s", flush=True)
    best = {m: min(ws) for m, ws in runs.items()}
    print(json.dumps({"rows": args.rows, "dup_density": args.dup,
                      "cores": args.cores, "best_sec": best, "runs": runs}))

    # scale-ratio point: broadcast budget 100KB — the dup list now exceeds
    # any broadcast budget BY AQE'S OWN METRIC too (models 10^12 rows, where
    # no sane threshold admits the list), so both strategies shuffle and the
    # gate's residual overhead is its bounded probe job only
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(100 * 1024))
    try:
        runs2: dict[str, list[float]] = {m: [] for m in ["gated", "aqe"]}
        for m in runs2:
            run_mode(spark, m, 3_000_000, args.dup)  # warm new plan shapes
        for _ in range(args.reps):
            for m in runs2:
                w = run_mode(spark, m, args.rows, args.dup)
                runs2[m].append(round(w, 2))
                print(f"  [100KB budget] {m}: {w:.1f}s", flush=True)
        best2 = {m: min(ws) for m, ws in runs2.items()}
        print(json.dumps({"rows": args.rows, "dup_density": args.dup,
                          "broadcast_threshold": "100KB",
                          "cores": args.cores, "best_sec": best2,
                          "runs": runs2}))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    return 0


if __name__ == "__main__":
    sys.exit(main())
