"""One-pass column profiling (data-quality family, round 9).

Every ingestion pipeline fronts its tables with a profile report —
per-column row/null/distinct counts and value extents (the
deequ/dbt-test shape). At 100 TB the only acceptable plan is ONE scan
producing every statistic at once; per-column loops re-reading the
table are the classic accidental-quadratic. Spark compiles the
multi-``count(DISTINCT ...)`` aggregate into a single Expand + one
shuffle (data duplicated once per profiled column — the standard
trade), and the wide single-row result unpivots to the report via
``stack`` without touching the scan again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Profile ``cols`` in one scan: returns one row per column —
    ``(col_name, n, n_null, n_distinct, min_val, max_val)`` with the
    extents taken on the NATIVE type (true min/max, not lexicographic)
    then cast to string for a uniform schema. Callers profile types
    whose string form is not engine-stable — timestamps, doubles — by
    pre-projecting a canonical form (epoch micros, integer cents).

    ``n_distinct`` is exact (nulls excluded, matching ANSI
    ``count(DISTINCT col)``); swap in ``approx_count_distinct`` at
    cardinalities where exact is uneconomical — the report shape is
    unchanged.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"__null_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __null_{c}, __nd_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_null, n_distinct, min_val, max_val)"
        ),
        F.col("__n").alias("n"),
    ).select("col_name", "n", "n_null", "n_distinct", "min_val", "max_val")
