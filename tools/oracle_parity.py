#!/usr/bin/env python
"""Oracle parity checker: runs named contract queries on Spark and
their DuckDB oracles, compares sorted row tuples. Usage:

  python tools/oracle_parity.py [--sf 0.01] q_name1 q_name2 ...
"""
from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def main() -> None:
    args = sys.argv[1:]
    sf = "0.01"
    if args and args[0] == "--sf":
        sf = args[1]
        args = args[2:]
    sf_dir = f"/root/testdata/sf{sf}"

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("oracle_parity")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as e

    q = e.queries()
    osql = e.oracle_sql()
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = 0
    for name in args:
        if name not in q:
            print(f"{name}: NOT IN REGISTRY", flush=True)
            failures += 1
            continue
        sp = sorted(
            tuple(_norm(v) for v in r) for r in q[name](spark, sf_dir).collect()
        )
        if name not in osql:
            print(f"{name}: rows-only ({len(sp)} rows, no oracle)", flush=True)
            continue
        dk = sorted(
            tuple(_norm(v) for v in r)
            for r in con.execute(osql[name]).fetchall()
        )
        ok = sp == dk
        if not ok:
            failures += 1
            diff_a = [r for r in sp if r not in set(dk)][:3]
            diff_b = [r for r in dk if r not in set(sp)][:3]
            print(f"{name}: MISMATCH spark={len(sp)} duck={len(dk)} "
                  f"spark-only={diff_a} duck-only={diff_b}", flush=True)
        else:
            print(f"{name}: OK ({len(sp)} rows)", flush=True)
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
