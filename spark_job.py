#!/usr/bin/env python
"""Cluster entrypoint: run the flagship validation suite via spark-submit.

    spark-submit --master <cluster> --py-files dist/sparkcheck.zip \
        spark_job.py --sf-dir /data/sfX --replicas 200 --out /data/out

The same artifact runs unchanged at any cluster size: shuffle partitioning
follows spark.sql.shuffle.partitions (set per-cluster), joins against
dimensions are broadcast, uniqueness is salted two-phase, AQE re-plans at
runtime. In local sandboxes the session comes from sparkcheck.session; under
spark-submit the active session/master is respected.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replicas", type=int, default=200)
    ap.add_argument("--out", default=None,
                    help="optional output dir for verdicts/violations/stats")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("sparkcheck-job").getOrCreate()

    from sparkcheck import suite as S
    t0 = time.perf_counter()
    pages, res = S.run_suite(spark, args.sf_dir, replicas=args.replicas)
    n = res.verdicts.count()
    n_viol = res.violations.count()
    if args.out:
        res.verdicts.write.mode("overwrite").parquet(f"{args.out}/verdicts")
        res.violations.write.mode("overwrite").parquet(
            f"{args.out}/violations")
        if res.stats is not None:
            res.stats.write.mode("overwrite").parquet(f"{args.out}/stats")
    wall = time.perf_counter() - t0
    print(json.dumps({
        "rows": n, "violations": n_viol, "wall_sec": round(wall, 2),
        "docs_per_sec": round(n / wall, 1),
        "run_checks": [{"rule_id": c.rule_id, "value": c.value,
                        "passed": c.passed} for c in res.run_checks],
    }))
    res.unpersist()
    return 0


if __name__ == "__main__":
    sys.exit(main())
