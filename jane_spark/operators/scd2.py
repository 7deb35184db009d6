"""SCD2-style version history (SURVEY.md §2 D15 — round 2).

jane keeps every uploaded document version and resolves "the version in
effect at time t" [ref: src/jane/documents/models.py — Document
versioned upsert, conf=M; SURVEY.md §0 caveat]. The warehouse-native
materialization of that idea is a slowly-changing-dimension type-2
history: each version row carries ``valid_from`` / ``valid_to`` (NULL =
still current), derived from the NEXT version's timestamp.

Spark shape: one window per key — ``lead(ts)`` over (key ORDER BY ts,
tiebreak). ONE shuffle on the key, no self-join (the naive translation
joins the table to itself on version+1). At 100 TB the window
partitions by document key — millions of small groups, no skew; the
as-of lookup against the result is a plain range predicate
(``valid_from <= t AND (valid_to IS NULL OR valid_to > t)``) that
pushes down to parquet stats when the table is sorted by key/time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Attach ``valid_from`` / ``valid_to`` / ``is_current`` to each
    version row. ``valid_to`` is the next version's ``ts_col`` (NULL on
    the latest version). ``tiebreak_col`` makes the version order total
    when two versions share a timestamp (determinism rule)."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    nxt = F.lead(F.col(ts_col)).over(w)
    return (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", nxt)
        .withColumn("is_current", nxt.isNull())
    )
