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


def top_k_per_group_salted(
    df: DataFrame,
    group: list[str],
    order: list[Column],
    k: int,
    n_salts: int = 16,
    rank_col: str = "rn",
) -> DataFrame:
    """Skew-resistant top-k: two-stage rank for hot group keys.

    A plain window shuffles every row of a hot key to one task — at
    100 TB a single viral key (one station with years of data, one
    document duplicated millions of times) serializes the whole stage.
    Here each row first gets a deterministic salt (hash of the full
    order tie-break, NOT random — reruns must agree); stage 1 ranks
    within (group, salt) and keeps k candidates per salt, shrinking a
    hot key's row count to at most k·n_salts; stage 2 ranks the
    survivors per group. Any row in the true global top-k is in the
    top-k of its own salt bucket, so the result is EXACTLY
    ``top_k_per_group`` — proven by the equivalence test.

    Use when group-key skew is known/measured; the plain window is
    cheaper when keys are uniform (one shuffle instead of two).
    """
    salt = F.pmod(F.xxhash64(*[c for c in df.columns]), F.lit(n_salts))
    salted = df.withColumn("__salt", salt)
    stage1 = top_k_per_group(
        salted, [*group, "__salt"], order, k, rank_col="__rn1"
    ).drop("__rn1", "__salt")
    return top_k_per_group(stage1, group, order, k, rank_col=rank_col)


def argmax(df: DataFrame, group: list[str], order: list[Column]) -> DataFrame:
    """Keep exactly the first row per group under the given total order —
    jane's latest-version-per-document / longest-segment pick."""
    return top_k_per_group(df, group, order, 1).drop("rn")


def paged(df: DataFrame, order: list[Column], offset: int, limit: int) -> DataFrame:
    """Stable limit+offset paging: row_number over a total order. Spark's
    bare OFFSET on an unordered plan is not stable across runs, so jane's
    REST paging maps to an explicit window (SURVEY.md §2 F2).

    The input is first pruned to the top ``offset+limit`` rows via
    orderBy+limit — Spark plans that as TakeOrderedAndProject, a
    PARALLEL per-partition top-k merge — so the single-partition
    row_number window only ever sees one page's worth of rows instead
    of every filtered row (identical results: both steps use the same
    total order)."""
    pruned = df.orderBy(*order).limit(offset + limit)
    w = Window.orderBy(*order)
    return (
        pruned.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") > offset) & (F.col("__rn") <= offset + limit))
        .drop("__rn")
    )
