#!/usr/bin/env python
"""Dump .explain("formatted") for bench rows to plans/<tag>/<row>_<suffix>.txt."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]          # e.g. r15
    suffix = sys.argv[2]       # before | after
    rows = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import BENCH_QUERIES
    from jane_spark.contracts import REGISTRY
    from jane_spark.engine.catalog import Catalog
    from jane_spark.engine.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")
    spark = get_spark("jane_spark_plans")
    cat = Catalog(spark, sf_dir)
    cat.pin("events", cluster_by="user_id", partitions=8)
    cat.pin("orders", cluster_by="o_custkey", partitions=8)
    cat.pin("documents", cluster_by="doc_id", partitions=8)

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in rows:
        qname = BENCH_QUERIES.get(name, name)
        df = REGISTRY[qname].spark_fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"{name}: {len(txt.splitlines())} plan lines", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
