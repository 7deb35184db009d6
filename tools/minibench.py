#!/usr/bin/env python
"""Subset bench with the exact bench.py methodology (warm session,
prepared plan, toPandas timed, REBUILD rows rebuilt per run, min of N).

Usage: python tools/minibench.py row1 row2 ...
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    rows = sys.argv[1:]
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import BENCH_QUERIES, REBUILD_PER_RUN
    from jane_spark.contracts import REGISTRY
    from jane_spark.engine.catalog import Catalog
    from jane_spark.engine.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")
    spark = get_spark("jane_spark_minibench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    cat = Catalog(spark, sf_dir)
    cat.pin("events", cluster_by="user_id", partitions=8)
    cat.pin("orders", cluster_by="o_custkey", partitions=8)
    cat.pin("documents", cluster_by="doc_id", partitions=8)
    from jane_spark.engine.ckpt import persistent_rdd_ids, unpersist_ids

    baseline_rdds = persistent_rdd_ids(spark)

    timings = {}
    for name in rows:
        qname = BENCH_QUERIES[name]
        rebuild = name in REBUILD_PER_RUN
        df = REGISTRY[qname].spark_fn(spark, sf_dir)
        df.toPandas()  # untimed warm-up
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            if rebuild:
                REGISTRY[qname].spark_fn(spark, sf_dir).toPandas()
            else:
                df.toPandas()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(min(samples), 4)
        unpersist_ids(spark, persistent_rdd_ids(spark) - baseline_rdds)
        print(f"{name:22s} min {min(samples):8.4f}  med "
              f"{sorted(samples)[len(samples)//2]:8.4f}  "
              f"max {max(samples):8.4f}", flush=True)
    print(json.dumps(timings))
    spark.stop()


if __name__ == "__main__":
    main()
