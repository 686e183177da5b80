#!/usr/bin/env python
"""Supplementary benchmarks (r7). bench.py is FROZEN for driver measurement,
so every extra row lives here (round brief: "put them in a separate file
such as bench_extra.py").

Rows (all noop-sink isolated per the optimization guide §1.4 — the noop
write forces every column of every row, unlike count() which lets the
optimizer prune — and labeled via setJobDescription per §1.5):

- ann_ivf_search_1m  (VERDICT r6 Next 3): IVF SEARCH phase against a
  PREBUILT index — ivf_centroids + assignment materialized to parquet once,
  untimed; the timed region is only probe-cell ranking + candidate
  selection + scoring + top-k. This is the row the r5 "within ~3× of
  LSH-at-1M" done-bar asks about: IVF's end-to-end cost at Q=5 is dominated
  by the query-INDEPENDENT assignment pass, which a pipeline pays once per
  index, not once per query batch.
- ann_ivf_topk_1m / ann_lsh_topk_1m: the end-to-end rows, same session,
  interleaved, for the ratio.
- fuzzy sub-stages at the bench's 100k-page shape: minhash_fast_cand_100k
  (candidate generation), jaccard_fast_100k (candidates + Jaccard verify),
  fuzzy_100k (the full drop list) — attribution evidence for the r7
  dedup_fuzzy work.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    python bench_extra.py [--rows r1,r2] [--reps 2]

Prints one JSON line: {"rows": {name: best_sec}, "runs": {...}, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import tempfile
import time

from pyspark.sql import functions as F


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", default="")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    wanted = {r for r in args.rows.split(",") if r}

    from sparkcheck.operators import dedup, similarity
    from sparkcheck.session import get_spark
    from sparkcheck.sources.embeddings import load_embeddings
    from sparkcheck.sources.pages import load_pages

    spark = get_spark(cores=cpus, app="sparkcheck-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")

    runs: dict[str, list[float]] = {}
    meta: dict = {"sf": sf_dir.rstrip("/").split("/")[-1], "cores": cpus}

    def timed(name, fn):
        if wanted and name not in wanted:
            return
        spark.sparkContext.setJobDescription(name)
        rs = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn()
            rs.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        runs[name] = rs

    # ---- ANN block at ~1M vectors (the bench.py shape) ---------------------
    ann_names = ("ann_ivf_search_1m", "ann_ivf_topk_1m", "ann_lsh_topk_1m",
                 "ann_brute_topk_1m")
    if not wanted or wanted & set(ann_names):
        emb_base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n_base = emb_base.count()
        ann_reps = max(1, 1024000 // n_base)
        tmp = tempfile.mkdtemp(prefix="sparkcheck_extra_")
        load_embeddings(spark, sf_dir, replicas=ann_reps) \
            .write.mode("overwrite").parquet(f"{tmp}/emb")
        emb1m = spark.read.parquet(f"{tmp}/emb")
        n1m = emb1m.count()
        queries = [0, 1, 2, 3, 4]
        c1m = similarity.auto_centroids(n1m)
        bits1m = similarity.auto_bits(n1m, target_bucket_size=8)
        meta["ann"] = {"rows": n1m, "centroids": c1m, "bits": bits1m}

        # prebuilt index, untimed: centroids + per-vector cell assignment
        cent = similarity.ivf_centroids(emb1m, c1m)
        cent_rows = sorted(cent.collect(), key=lambda r: r["cid"])
        similarity._assign_udf_from_rows(emb1m, cent_rows,
                                         "vec_id", "embedding") \
            .write.mode("overwrite").parquet(f"{tmp}/ivf_index")
        index = spark.read.parquet(f"{tmp}/ivf_index")
        qrows = sorted(emb1m.filter(F.col("vec_id").isin(queries))
                       .select("vec_id", "embedding").collect(),
                       key=lambda r: r["vec_id"])

        def ivf_search_only():
            # probe ranking is driver-side numpy (O(Q·C·dim)); candidate
            # selection = cid semi-filter on the index parquet (predicate
            # pushdown on the int column), scoring on the 4dp grid, top-k
            from pyspark.sql import Window
            probes = similarity._probe_cells(qrows, cent_rows, 2,
                                             "vec_id", "embedding")
            qc = spark.createDataFrame(
                probes, schema="query_id long, qvec array<double>, cid long")
            cells = sorted({p[2] for p in probes})
            scored = (index.filter(F.col("cid").isin(cells))
                      .join(F.broadcast(qc), "cid")
                      .filter(F.col("vec_id") != F.col("query_id"))
                      .select("query_id", "vec_id",
                              similarity.cosine4(
                                  F.col("qvec"), F.col("embedding"))
                              .alias("score")))
            w = Window.partitionBy("query_id").orderBy(
                F.desc("score"), F.asc("vec_id"))
            noop(scored.withColumn("rank", F.row_number().over(w))
                 .filter(F.col("rank") <= 10))

        timed("ann_ivf_search_1m", ivf_search_only)
        timed("ann_ivf_topk_1m", lambda: noop(
            similarity.ivf_topk(emb1m, queries, k=10, nprobe=2)))
        timed("ann_lsh_topk_1m", lambda: noop(
            similarity.lsh_topk(emb1m, queries, k=10, bits=bits1m,
                                tables=2, use_udf=True)))
        timed("ann_brute_topk_1m", lambda: noop(
            similarity.brute_topk_udf(emb1m, queries, k=10)))
        shutil.rmtree(tmp, ignore_errors=True)

    # ---- fuzzy-dedup sub-stages at the bench 100k-page shape ---------------
    fz_names = ("minhash_fast_cand_100k", "jaccard_fast_100k", "fuzzy_100k")
    if not wanted or wanted & set(fz_names):
        mh_pages = load_pages(spark, sf_dir, replicas=20)
        timed("minhash_fast_cand_100k", lambda: noop(
            dedup.minhash_candidates(mh_pages, id_col="rid",
                                     variant="fast")))

        def jaccard_fast():
            cand = dedup.minhash_candidates(mh_pages, id_col="rid",
                                            variant="fast")
            noop(dedup.ngram_jaccard(mh_pages, cand, "rid", key="hash"))

        timed("jaccard_fast_100k", jaccard_fast)

        def fuzzy():
            handles: list = []
            noop(dedup.fuzzy_drop_list(mh_pages, id_col="rid",
                                       variant="fast", owner=handles))
            for h in handles:
                h.unpersist()

        timed("fuzzy_100k", fuzzy)

    out = {"rows": {k: min(v) for k, v in runs.items()},
           "runs": runs, **meta}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
