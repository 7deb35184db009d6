#!/usr/bin/env python
"""Profiling harness for the optimization round: splits each bench row
into plan-BUILD time (spark_fn call — includes training collects and
py4j expression construction) vs first execution vs warm execution,
and counts the Spark jobs each phase launched.

Usage: python tools/profile_rows.py row1 row2 ...  (bench names)
       python tools/profile_rows.py --top N        (N slowest from last artifact)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import BENCH_QUERIES, REBUILD_PER_RUN
    from jane_spark.contracts import REGISTRY
    from jane_spark.engine.catalog import Catalog
    from jane_spark.engine.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")
    spark = get_spark("jane_spark_profile")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    cat = Catalog(spark, sf_dir)
    cat.pin("events", cluster_by="user_id", partitions=8)
    cat.pin("orders", cluster_by="o_custkey", partitions=8)
    cat.pin("documents", cluster_by="doc_id", partitions=8)

    args = sys.argv[1:]
    if args and args[0] == "--top":
        n = int(args[1]) if len(args) > 1 else 12
        art = json.load(open(
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "docs", "bench_last_full.json")))
        rows = [k for k, _ in sorted(
            art["queries"].items(), key=lambda kv: -kv[1])[:n]]
    else:
        rows = args

    from jane_spark.engine.ckpt import persistent_rdd_ids

    baseline_rdds = persistent_rdd_ids(spark)
    st = spark.sparkContext.statusTracker()
    out = {}
    for name in rows:
        qname = BENCH_QUERIES[name]
        fn = REGISTRY[qname].spark_fn
        spark.sparkContext.setJobDescription(f"profile:{name}")
        j0 = len(st.getJobIdsForGroup() or [])
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        j1 = len(st.getJobIdsForGroup() or [])
        df.toPandas()
        t2 = time.perf_counter()
        j2 = len(st.getJobIdsForGroup() or [])
        df.toPandas()
        t3 = time.perf_counter()
        # rebuild-class rows re-run the build per timed run in bench.py
        rebuild = name in REBUILD_PER_RUN
        out[name] = {
            "build_s": round(t1 - t0, 3),
            "first_exec_s": round(t2 - t1, 3),
            "warm_exec_s": round(t3 - t2, 3),
            "build_jobs": j1 - j0,
            "exec_jobs": j2 - j1,
            "rebuild_per_run": rebuild,
            "bench_cost_s": round((t1 - t0) + (t3 - t2), 3) if rebuild
            else round(t3 - t2, 3),
        }
        print(f"{name:20s} build {t1-t0:7.3f}s ({j1-j0:3d} jobs)  "
              f"first {t2-t1:7.3f}s  warm {t3-t2:7.3f}s  "
              f"{'REBUILD' if rebuild else 'lazy'}", flush=True)
        from jane_spark.engine.ckpt import persistent_rdd_ids, unpersist_ids
        unpersist_ids(spark, persistent_rdd_ids(spark) - baseline_rdds)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
