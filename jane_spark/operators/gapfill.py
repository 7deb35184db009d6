"""Time-spine densification with fill-forward (SURVEY.md §2 D13) —
the hypertable "gapfill" shape: a regular bucket grid per key with
empty intervals materialized (count 0) and last-observation-carried-
forward for sampled metrics. jane's per-interval coverage views imply
exactly this; TimescaleDB calls it ``time_bucket_gapfill`` + ``locf``.

Scale shape: the spine derives from a tiny per-key (min, max) aggregate
— ``sequence()`` + ``explode`` is a narrow expansion of one row per
key, never a shuffle of the fact table. The join back to the hourly
aggregate shuffles on (key, bucket) — uniform keys. The LOCF window
partitions by key; with few keys and long histories, re-chunk the
window key to (key, coarse_period) and seed each chunk with the
previous chunk's last value to restore parallelism — noted here, not
needed at contract scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_spine_fill(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket: str = "1 hour",
) -> DataFrame:
    """Per-key regular grid from min to max bucket: ``n`` (0 on empty
    buckets) and ``locf_sum`` (per-bucket sum of ``value_col``, rounded,
    carried forward across empty buckets).

    ``bucket`` drives BOTH the spine step and the aggregate truncation,
    so grid and aggregate stay aligned; only single-unit calendar
    buckets are supported (a '15 minutes' grid needs anchored bucketing,
    not date_trunc — refuse rather than emit a misaligned spine).
    """
    trunc_unit = {
        "1 minute": "minute",
        "1 hour": "hour",
        "1 day": "day",
        "1 week": "week",
    }.get(bucket)
    if trunc_unit is None:
        raise ValueError(
            "bucket must be one of '1 minute', '1 hour', '1 day', '1 week'"
        )
    h = F.date_trunc(trunc_unit, F.col(ts_col))
    bounds = events.groupBy(key_col).agg(
        F.min(h).alias("h_min"), F.max(h).alias("h_max")
    )
    spine = bounds.select(
        key_col,
        F.explode(
            F.expr(f"sequence(h_min, h_max, interval {bucket})")
        ).alias("window_start"),
    )
    agg = events.groupBy(key_col, h.alias("window_start")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(value_col), 3).alias("s"),
    )
    j = spine.join(agg, [key_col, "window_start"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("window_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        key_col,
        "window_start",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.last("s", ignorenulls=True).over(w).alias("locf_sum"),
    )
