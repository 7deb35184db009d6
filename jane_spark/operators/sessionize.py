"""Segment sessionization / gap analysis (SURVEY.md §2 D6, E4, I4).

jane's waveform bookkeeping merges per-channel trace segments whose gaps
are under a tolerance into continuous spans and reports gaps/overlaps
[ref: src/jane/waveforms/ — gap analysis around ContinuousTrace, conf=M;
SURVEY.md §0 caveat]. Batch form here (pure window functions — one
shuffle on the key, oracle-checkable); the streaming twin is
``session_window`` in streaming/windows.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from jane_spark.functions.time import ntz_epoch_us


def with_gaps(
    df: DataFrame,
    key: str,
    ts: str,
    tie_break: str,
    gap_col: str = "gap_us",
) -> DataFrame:
    """Per-key previous-event gap in microseconds (NULL for first row).

    µs integers, not intervals: integer deltas hash identically across
    engines, interval types do not (SURVEY.md §7.4 risk 4).
    """
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(tie_break).asc())
    # tz-free epoch µs: a session-timezone cast would mis-measure gaps
    # across DST transitions by up to an hour (functions/time.py)
    us = ntz_epoch_us(F.col(ts))
    return df.withColumn(gap_col, us - F.lag(us).over(w))


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    tie_break: str,
    gap_tolerance_us: int,
) -> DataFrame:
    """Assign a session id per key: a new session starts when the gap to
    the previous event exceeds the tolerance. Classic cumulative-flag
    sessionization: lag → boundary flag → running sum. Two window passes
    over the SAME (key, ts) sort — Spark reuses the sort, one shuffle."""
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(tie_break).asc())
    flagged = with_gaps(df, key, ts, tie_break).withColumn(
        "__new_session",
        F.when(
            F.col("gap_us").isNull() | (F.col("gap_us") > gap_tolerance_us), 1
        ).otherwise(0),
    )
    return flagged.withColumn(
        "session_id",
        F.sum("__new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    ).drop("__new_session")


def session_summary(
    df: DataFrame,
    key: str,
    ts: str,
    tie_break: str,
    gap_tolerance_us: int,
) -> DataFrame:
    """One row per (key, session): event count + span. The jane analogue:
    continuous-coverage spans per channel with gap tolerance."""
    s = sessionize(df, key, ts, tie_break, gap_tolerance_us)
    return s.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
    )
