"""Stream-stream joins (SURVEY.md §2.9 I9).

jane's users correlate two live feeds: event notifications (QuakeML
ingest) against the continuously-updated waveform index — "which trace
segments cover this event's time window?" [ref: the dataselect-after-
event workflow jane's docs describe, conf=M; SURVEY.md §0 caveat].
Batch-side that is the C4 interval join; on live feeds it is Spark's
watermarked stream-stream join: both sides declare event-time
watermarks and the join condition carries an explicit time bound, so
each side's state store can evict rows that can no longer match —
without the bound, stream-stream state grows forever, which is the
100 TB/day failure mode this module exists to prevent.

The same function runs on batch frames (no watermark, no state) with
bit-identical results — the contract oracle checks the batch path and
the pytest proves stream ≡ batch under an availableNow trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jane_spark.streaming.windows import _with_event_time


def correlate_within(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "1 hour",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join each left row to right rows of the same key whose event
    time falls in ``[left_ts - lookback, left_ts]`` — the notification↔
    coverage correlation (and the classic attribution shape).

    Column-name discipline: callers pre-project both sides to disjoint
    column names (the established posture for self-joins); key and ts
    columns are referenced by name, everything else passes through.

    Streaming semantics: when either side is a stream, BOTH sides get
    the watermark (Spark requires it for state cleanup on inner joins
    with a time-range condition; outer joins additionally need it to
    emit NULL matches). The time columns are cast NTZ→LTZ for the
    state machinery (session timezone pinned UTC ⇒ value-preserving)
    and cast back on the way out, so batch and stream emit identical
    rows.
    """
    streaming = left.isStreaming or right.isStreaming

    def prep(df: DataFrame, ts: str) -> DataFrame:
        if not streaming:
            return df
        if df.isStreaming:
            return _with_event_time(df, ts, watermark)
        # stream-batch mix: the static side still needs the LTZ cast so
        # the range comparison is same-typed
        return df.withColumn(ts, F.col(ts).cast("timestamp"))

    l = prep(left, left_ts)
    r = prep(right, right_ts)

    interval = F.expr(f"INTERVAL {lookback}")
    cond = (
        (l[left_key] == r[right_key])
        & (r[right_ts] >= l[left_ts] - interval)
        & (r[right_ts] <= l[left_ts])
    )
    joined = l.join(r, on=cond, how=how)
    if streaming:
        joined = joined.withColumn(
            left_ts, F.col(left_ts).cast("timestamp_ntz")
        ).withColumn(right_ts, F.col(right_ts).cast("timestamp_ntz"))
    return joined
