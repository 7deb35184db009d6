"""Time-range rolling aggregates (SURVEY.md §2 E5 — round 2).

The "coverage seconds in the trailing hour per channel" family: a
window frame bounded by a TIME interval, not a row count. jane's
availability views imply exactly this shape [ref: waveforms coverage
queries, conf=L; SURVEY.md §0 caveat]; it is also the training-pipeline
"events in the trailing window per user" rate feature.

Spark's ``Window.rangeBetween`` needs a numeric ordering column, so the
frame is expressed over ``unix_micros(ts)`` with the interval in µs —
semantically identical to ANSI ``RANGE BETWEEN INTERVAL x PRECEDING AND
CURRENT ROW`` (peers at equal ts are included in both). ONE shuffle on
the partition key; the frame scan is linear per key (Spark keeps a
sliding frame, not O(n²) re-aggregation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from jane_spark.functions.time import ntz_epoch_us

_UNITS_US = {
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
}


def interval_micros(interval: str) -> int:
    """'2 hours' / '30 minutes' / '1 day' -> microseconds."""
    try:
        n, unit = interval.split()
        return int(n) * _UNITS_US[unit.rstrip("s")]
    except (ValueError, KeyError):
        raise ValueError(
            f"interval must be '<n> {'/'.join(_UNITS_US)}[s]', got {interval!r}"
        ) from None


def trailing_window_agg(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    aggs: dict[str, Column],
    interval: str = "1 hour",
) -> DataFrame:
    """Append, per input row, each aggregate evaluated over that row's
    key-partition restricted to ``[ts - interval, ts]`` (inclusive both
    ends — ANSI RANGE frame semantics, equal-ts peers included).

    ``aggs`` maps output column name -> aggregate Column, e.g.
    ``{"n_1h": F.count(F.lit(1)), "sum_1h": F.sum("value")}``.
    """
    us = interval_micros(interval)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ntz_epoch_us(F.col(ts_col)))  # tz-free (functions/time.py)
        .rangeBetween(-us, 0)
    )
    out = df
    for name, agg in aggs.items():
        out = out.withColumn(name, agg.over(w))
    return out
