"""Ranking / top-k / argmax operators (SURVEY.md §2 D5, E1, F1–F4).

jane's orderby/limit params, latest-version resolution, and longestonly
segment selection all reduce to deterministic rank-and-keep patterns
[ref: src/jane/fdsnws/views/event_1.py orderby/limit;
dataselect_1.py longestonly; documents versioning, conf=H/M;
SURVEY.md §0 caveat]. Every ordering takes an explicit tie-break column:
a rank without a total order is nondeterministic across partitions —
unacceptable in the contract and un-debuggable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group: list[str],
    order: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """row_number ≤ k per group. Spark computes this with a single
    shuffle on the group keys; at scale, AQE handles group skew. (A
    partial per-partition top-k pre-prune is a future physical tweak —
    SURVEY.md §4.2.3 — not needed at contract scale.)"""
    w = Window.partitionBy(*group).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def argmax(df: DataFrame, group: list[str], order: list[Column]) -> DataFrame:
    """Keep exactly the first row per group under the given total order —
    jane's latest-version-per-document / longest-segment pick."""
    return top_k_per_group(df, group, order, 1).drop("rn")


def paged(df: DataFrame, order: list[Column], offset: int, limit: int) -> DataFrame:
    """Stable limit+offset paging: row_number over a total order. Spark's
    bare OFFSET on an unordered plan is not stable across runs, so jane's
    REST paging maps to an explicit window (SURVEY.md §2 F2)."""
    w = Window.orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") > offset) & (F.col("__rn") <= offset + limit))
        .drop("__rn")
    )
