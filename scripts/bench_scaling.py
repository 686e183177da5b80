#!/usr/bin/env python
"""Scaling-evidence protocol (BASELINE.md): run the SAME job on the SAME
input at two parallelism levels — local[8] (N) vs local[32] (4N) — via
spark-submit --py-files, serially, median of `reps`, and write
BENCH/BASELINE.md with docs/sec at both plus efficiency = (T_N / T_4N) / 4.

Usage: python scripts/bench_scaling.py [--reps 3] [--replicas 400]
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cores: int, replicas: int, sf_dir: str, use_submit: bool) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=str(cores),
               SPARKCHECK_BENCH_REPLICAS=str(replicas))
    if use_submit:
        subprocess.run(["sh", os.path.join(REPO, "scripts/package.sh")],
                       check=True, capture_output=True)
        cmd = ["spark-submit", "--master", f"local[{cores}]",
               "--py-files", os.path.join(REPO, "dist/sparkcheck.zip"),
               os.path.join(REPO, "bench.py")]
    else:
        cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         cwd=REPO, check=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--replicas", type=int, default=400)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--spark-submit", action="store_true",
                    help="run through spark-submit --py-files (cluster-shaped)")
    args = ap.parse_args()

    results = {}
    for cores in (8, 32):
        runs = [run_once(cores, args.replicas, args.sf_dir, args.spark_submit)
                for _ in range(args.reps)]
        med = statistics.median(r["queries"]["full_suite"] for r in runs)
        results[cores] = {
            "runs": [r["queries"]["full_suite"] for r in runs],
            "median_sec": med,
            "rows": runs[0]["rows"],
            "docs_per_sec": round(runs[0]["rows"] / med, 1),
        }
        print(f"local[{cores}]: median {med:.1f}s "
              f"{results[cores]['docs_per_sec']} docs/s", flush=True)

    eff = (results[8]["median_sec"] / results[32]["median_sec"]) / 4
    rows = results[8]["rows"]
    md = f"""# BENCH/BASELINE.md — measured results

## Protocol
Same job (bench.py full rule suite), same input
({args.sf_dir} documents.parquet ×{args.replicas} deterministic replicas =
{rows:,} pages), two parallelism levels, median of {args.reps} runs each,
SparkSession startup and warmup excluded, AQE on,
shuffle partitions proportional to cores.
Runner: {'spark-submit --py-files dist/sparkcheck.zip' if args.spark_submit
         else 'python bench.py'}.

## Results

| setting | median full-suite wall (s) | docs/sec |
|---|---|---|
| local[8]  (N)  | {results[8]['median_sec']:.1f} | {results[8]['docs_per_sec']:,} |
| local[32] (4N) | {results[32]['median_sec']:.1f} | {results[32]['docs_per_sec']:,} |

**Scaling efficiency (N→4N) = (T_N / T_4N) / 4 = {eff:.2f}** (target ≥ 0.8)

Raw runs (s): local[8] {results[8]['runs']}; local[32] {results[32]['runs']}

## Caveats
- `local[k]` shares one JVM heap and has no network shuffle: this bounds
  scheduling/CPU scalability, not cluster I/O. The spark-submit --py-files
  packaging (scripts/package.sh + spark_job.py) demonstrates the same
  artifact is cluster-submittable.
- Pinned: Python {platform.python_version()}, {platform.platform()}.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH/BASELINE.md"), "w") as f:
        f.write(md)
    print(f"efficiency: {eff:.2f} → BENCH/BASELINE.md")
    return 0


if __name__ == "__main__":
    sys.exit(main())
