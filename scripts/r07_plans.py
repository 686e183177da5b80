#!/usr/bin/env python
"""Capture `.explain("formatted")` for every query the r7 optimization round
touches, into plans/r07/<name>_<suffix>.txt.

Run twice: once with PYTHONPATH pointing at the round-start tree (a git
worktree of the pre-optimization revision) with suffix `before`, once on the
live tree with suffix `after`. Small scale factors keep the capture cheap;
the plan SHAPE (exchanges, join strategies, Python eval nodes) is what the
evidence files pin, and the shapes are scale-independent for these
formulations (AQE may coalesce partitions but does not change node kinds on
these paths). The ANN capture forces the >IVF_UDF_SWITCH Arrow path — the
same path auto-selected at the bench's 1M-vector corpus.

Usage: PYTHONPATH=<tree> python scripts/r07_plans.py <suffix> [outdir]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

SF = "/root/testdata/sf0.01"


def formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    outdir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r07")
    os.makedirs(outdir, exist_ok=True)

    from pyspark.sql import functions as F

    from sparkcheck.operators import dedup, pipeline, quality, similarity
    from sparkcheck.operators.similarity import IVF_UDF_SWITCH
    from sparkcheck.session import get_spark
    from sparkcheck.sources.pages import load_pages

    spark = get_spark(cores=8, app=f"r07-plans-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .filter(F.col("text").isNotNull())
    pages = load_pages(spark, SF, replicas=4)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    bench = docs.filter(F.col("doc_id") % quality.DECON_MOD == 0)

    plans: dict[str, object] = {}
    cand_fast = dedup.minhash_candidates(pages, id_col="rid", variant="fast")
    plans["dedup_minhash_fast_100k"] = cand_fast
    # the bench fuzzy row's Jaccard-verify stage (fast variant wiring —
    # the round-start tree has no `key` parameter)
    if suffix == "before":
        plans["jaccard_fast_stage"] = dedup.ngram_jaccard(pages, cand_fast,
                                                          "rid")
    else:
        plans["jaccard_fast_stage"] = dedup.ngram_jaccard(pages, cand_fast,
                                                          "rid", key="hash")
    plans["dedup_jaccard"] = dedup.ngram_jaccard(
        pages, dedup.minhash_candidates(pages, id_col="rid"), "rid")
    plans["training_shard"] = pipeline.training_shard(docs, bench)
    structured = docs.select(
        "doc_id", "lang", quality.lines_noise("text", "doc_id").alias("text"))
    plans["training_shard_v2"] = pipeline.training_shard_v2(structured)
    plans["decontaminate"] = quality.decontaminate(docs, bench,
                                                   n=quality.DECON_N)
    plans["repetition_stats"] = quality.repetition_stats(docs)
    plans["ann_ivf_topk_1m"] = similarity.ivf_topk(
        emb, [0, 1, 2, 3, 4], k=10, n_centroids=IVF_UDF_SWITCH + 1,
        nprobe=2)

    for name, df in plans.items():
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} ({suffix}) — captured at {SF}, local[8]\n")
            f.write(formatted(df))
        print("wrote", path)

    # the eager component loop (fuzzy) cannot be explained lazily end-to-end;
    # capture the final drop-list frame's plan (post-convergence labels join)
    drops = dedup.fuzzy_drop_list(pages, id_col="rid", variant="fast")
    path = os.path.join(outdir, f"dedup_fuzzy_drop_list_100k_{suffix}.txt")
    with open(path, "w") as f:
        f.write(f"# dedup_fuzzy_drop_list (fast variant, {suffix}) — final "
                f"frame plan; the candidate/Jaccard stage plans are the "
                f"jaccard_fast_stage/dedup_minhash_fast files\n")
        f.write(formatted(drops))
    print("wrote", path)


if __name__ == "__main__":
    main()
