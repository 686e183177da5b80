#!/usr/bin/env python
"""Same-afternoon A/B: the ONLY trustworthy round-over-round comparison.

This host shows ~30% same-config spread across days (external contention),
so "faster/slower than last round" claims read from BENCH_rN files of
different days are noise. This script produces the comparison the honest
way, in one command:

  * the previous revision is materialized in a git WORKTREE (never a
    checkout into the live tree — `git checkout <rev> -- files` destroys
    uncommitted edits, the documented foot-gun);
  * both sides run the identical bench subprocess (SPARKCHECK_BENCH_ONLY=
    full_suite), INTERLEAVED prev/head/prev/head... so a contention burst
    hits both sides equally, never two Spark jobs concurrently;
  * best-of-N per side (the contention model: external noise only ever
    ADDS time, so min is the clean estimate).

Writes BENCH/ab_latest.json; bench.py inlines that file as the "ab" block
of its JSON line, so the per-round BENCH_rN record carries the evidence.

Usage: python scripts/bench_ab.py [--prev REV] [--reps 3] [--cores 32]
                                  [--replicas 400] [--sf /root/testdata/sf0.1]

The working tree must be clean (committed) — the A/B is HEAD vs REV, and
an uncommitted diff would silently not be measured.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(args: list[str], cwd: str = REPO) -> str:
    return subprocess.run(args, cwd=cwd, check=True, capture_output=True,
                          text=True).stdout.strip()


def run_once(tree: str, cores: int, replicas: int, sf_dir: str,
             timeout_s: int, queries: str = "",
             script: str | None = None, inner: int = 1) -> dict[str, float]:
    """One bench subprocess over `tree`'s sparkcheck; returns the timings
    dict. Default mode runs the tree's own bench.py with
    SPARKCHECK_BENCH_ONLY=full_suite; --queries mode runs `script` (the
    HEAD harness, copied into the worktree so both sides define identical
    rows) with SPARKCHECK_BENCH_QUERIES set."""
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=str(cores),
               SPARKCHECK_BENCH_REPLICAS=str(replicas),
               SPARKCHECK_BENCH_INNER=str(inner),
               PYTHONPATH=tree)
    if queries:
        env["SPARKCHECK_BENCH_QUERIES"] = queries
    else:
        env["SPARKCHECK_BENCH_ONLY"] = "full_suite"
    # own process group so a hung child is killed exactly, not host-wide
    # (same discipline as bench_scaling.run_once)
    proc = subprocess.Popen(
        [sys.executable, script or os.path.join(tree, "bench.py")],
        env=env, cwd=tree, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, start_new_session=True)
    try:
        stdout, _ = proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        proc.wait()
        raise
    if proc.returncode != 0:
        raise subprocess.CalledProcessError(proc.returncode, "bench.py")
    line = [l for l in stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)["queries"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prev", default="HEAD~1",
                    help="revision for the B side (default HEAD~1)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--replicas", type=int, default=400)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--timeout", type=int, default=1800)
    ap.add_argument("--queries", default="",
                    help="comma-separated bench row names → per-operator "
                         "A/B (VERDICT r5 item 3): both sides run the HEAD "
                         "harness (bench.py copied into the prev worktree, "
                         "so rows are defined identically) over each "
                         "side's own sparkcheck package, interleaved")
    ap.add_argument("--inner", type=int, default=None,
                    help="best-of-N inside each subprocess (default 1 for "
                         "full_suite mode, 2 in --queries mode — matching "
                         "how BENCH_rN per-op rows are produced, so the "
                         "second run is warm and the row is comparable)")
    args = ap.parse_args()
    if args.inner is None:
        args.inner = 2 if args.queries else 1

    dirty = [l for l in sh(["git", "status", "--porcelain",
                            "--untracked-files=no"]).splitlines()
             if not l.endswith("PROGRESS.jsonl")]  # driver-appended telemetry
    if dirty:
        print("ERROR: working tree dirty — commit first; the A/B measures "
              "HEAD vs --prev and would silently skip uncommitted edits",
              file=sys.stderr)
        return 2
    head = sh(["git", "rev-parse", "--short", "HEAD"])
    prev = sh(["git", "rev-parse", "--short", args.prev])
    wt = f"/tmp/sparkcheck_ab_{prev}"
    if os.path.exists(wt):
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=REPO, capture_output=True)
        shutil.rmtree(wt, ignore_errors=True)
    sh(["git", "worktree", "add", "--detach", wt, prev])
    try:
        script = None
        if args.queries:
            # per-op mode: both sides run the HEAD harness so every row is
            # the same code path; the A/B variable is the sparkcheck
            # package each tree resolves (script dir is first on sys.path,
            # hence the copy instead of PYTHONPATH games)
            script = os.path.join(wt, "bench_head.py")
            shutil.copy(os.path.join(REPO, "bench.py"), script)
        qnames = [q for q in args.queries.split(",") if q]
        runs: dict[str, list] = {"prev": [], "head": []}
        stamps: dict[str, list[float]] = {"prev": [], "head": []}
        for i in range(args.reps):
            # interleaved, serial — never two Spark jobs at once
            for side, tree in (("prev", wt), ("head", REPO)):
                t0 = time.time()
                stamps[side].append(round(t0, 1))
                q = run_once(tree, args.cores, args.replicas, args.sf,
                             args.timeout, queries=args.queries,
                             script=script if side == "prev" else None,
                             inner=args.inner)
                runs[side].append({k: round(v, 3) for k, v in q.items()}
                                  if qnames else round(q["full_suite"], 3))
                shown = (" ".join(f"{k}={q[k]:.2f}s" for k in sorted(q))
                         if qnames else f"full_suite {q['full_suite']:.2f}s")
                print(f"rep {i + 1}/{args.reps} {side} "
                      f"({head if side == 'head' else prev}): {shown} "
                      f"(subprocess {time.time() - t0:.0f}s)", flush=True)
        out = {
            "prev_rev": prev, "head_rev": head,
            "date": time.strftime("%Y-%m-%d"),
            "config": {"cores": args.cores, "replicas": args.replicas,
                       "sf": args.sf.rstrip("/").split("/")[-1],
                       "inner": args.inner,
                       "metric": (("per-op seconds (" + args.queries + ")")
                                  if qnames else "full_suite seconds")
                                 + f", interleaved, best-of-{args.reps}"
                                 + f" x inner best-of-{args.inner}"},
            "runs": runs,
            "run_start_ts": stamps,
        }
        if qnames:
            per_q = {}
            for name in qnames:
                p = [r[name] for r in runs["prev"] if name in r]
                h = [r[name] for r in runs["head"] if name in r]
                per_q[name] = {
                    "prev": p, "head": h,
                    "best": {"prev": min(p), "head": min(h)},
                    "head_over_prev": round(min(p) / min(h), 4)}
            out["queries"] = per_q
            ab_path = os.path.join(REPO, "BENCH", "ab_queries_latest.json")
        else:
            best_prev, best_head = min(runs["prev"]), min(runs["head"])
            out["best"] = {"prev": best_prev, "head": best_head}
            out["head_over_prev"] = round(best_prev / best_head, 4)
            ab_path = os.path.join(REPO, "BENCH", "ab_latest.json")
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(ab_path, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
        return 0
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=REPO, capture_output=True)


if __name__ == "__main__":
    sys.exit(main())
