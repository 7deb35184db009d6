"""Custom stateful streaming operators (SURVEY.md §2.10 J5, §2.9 I4/I5).

jane's waveform monitor keeps an *open segment* per channel and extends
or closes it as files arrive [ref: src/jane/waveforms/ — monitor +
ContinuousTrace bookkeeping, conf=M; SURVEY.md §0 caveat]. Here that is
``applyInPandasWithState``: per-key state holds the open segment; an
event within the gap tolerance extends it, a jump emits the closed
segment and opens a new one. Timeouts flush idle keys.
"""

# NOTE: no `from __future__ import annotations` — pandas-UDF machinery
# reads runtime type hints.
from collections.abc import Iterator
from typing import Any, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("segment_start", T.TimestampType()),
        T.StructField("segment_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("seg_start", T.LongType()),  # epoch microseconds:
        T.StructField("seg_end", T.LongType()),    # float seconds would
        T.StructField("n_events", T.LongType()),   # add sub-µs noise that
    ]                                              # Arrow rejects as unsafe
)


def make_segment_tracker(
    gap_seconds: float,
    idle_timeout_ms: int | None = None,
    event_time_timeout: bool = False,
):
    """Returns the applyInPandasWithState function tracking open
    segments per key with the given gap tolerance.

    ``idle_timeout_ms`` flushes idle keys on a long-running stream; leave
    None under availableNow/batch-equivalence harnesses — a pending
    processing-time timeout keeps scheduling no-data micro-batches, so
    an availableNow query would never terminate.

    ``event_time_timeout`` flushes by WATERMARK instead of wall clock:
    after each update the key's timeout is set to ``seg_end + gap``
    (event time), so once the stream's watermark passes the point
    where the gap rule would have closed the segment anyway, the idle
    key flushes — deterministically, because watermarks advance with
    the DATA, not the clock. This is the flush mode whose semantics a
    batch oracle can replay (q_j5_event_timeout); wall-clock timeouts
    cannot be (pytest-only by construction)."""
    gap_us = int(gap_seconds * 1_000_000)

    def track(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            if state.exists:
                s, e, n = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "key": [key[0]],
                        "segment_start": pd.to_datetime([s], unit="us", utc=True),
                        "segment_end": pd.to_datetime([e], unit="us", utc=True),
                        "n_events": [n],
                        "closed": [True],
                    }
                )
            return

        ts_values = []
        for pdf in pdfs:
            ts_values.extend(pdf["ts"].tolist())
        ts_values.sort()
        if not ts_values:
            return

        if state.exists:
            seg_start, seg_end, n = state.get
        else:
            seg_start, seg_end, n = None, None, 0

        closed_rows = []
        for t in ts_values:
            epoch = t.value // 1000  # pandas ns -> µs int, no float round-trip
            if seg_start is None:
                seg_start, seg_end, n = epoch, epoch, 1
            elif epoch - seg_end <= gap_us:
                seg_end, n = max(seg_end, epoch), n + 1
            else:
                closed_rows.append((seg_start, seg_end, n, True))
                seg_start, seg_end, n = epoch, epoch, 1

        state.update((int(seg_start), int(seg_end), int(n)))
        if event_time_timeout:
            # flush when the watermark passes the gap horizon — the
            # moment the gap rule would close this segment no matter
            # what arrives later (timeout timestamps are epoch ms).
            # Clamp to watermark+1: a straggler key fed events more
            # than gap behind the current watermark would otherwise
            # compute a horizon at/below it, and GroupState raises
            # ('Timeout timestamp cannot be earlier than the current
            # watermark') — killing the whole query, not just the key
            # (ADVICE r13). At watermark+1 the very next watermark
            # advance (or the end-of-run no-data sweep) flushes it —
            # the same emission the unclamped horizon would produce.
            horizon_ms = (int(seg_end) + gap_us) // 1000
            state.setTimeoutTimestamp(
                max(horizon_ms, state.getCurrentWatermarkMs() + 1)
            )
        elif idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        rows = closed_rows + [(seg_start, seg_end, n, False)]
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(rows),
                "segment_start": pd.to_datetime(
                    [s for s, _, _, _ in rows], unit="us", utc=True
                ),
                "segment_end": pd.to_datetime(
                    [e for _, e, _, _ in rows], unit="us", utc=True
                ),
                "n_events": [n for _, _, n, _ in rows],
                "closed": [c for _, _, _, c in rows],
            }
        )

    return track


def open_segments_stream(
    events: DataFrame,
    key: str,
    ts: str,
    gap_seconds: float,
    idle_timeout_ms: int | None = None,
    event_time_timeout: bool = False,
) -> DataFrame:
    """J5 entry point: per-key open-segment tracking over a stream.
    Emits every touched segment per micro-batch (closed=True when a gap
    ended it; the final open segment rides along with closed=False).
    Pass ``idle_timeout_ms`` on continuous streams to flush idle keys
    by wall clock, or ``event_time_timeout=True`` to flush them by
    WATERMARK (deterministic — the oracle-checkable mode; attaches a
    0-second watermark to the event-time column)."""
    tracker = make_segment_tracker(
        gap_seconds, idle_timeout_ms, event_time_timeout
    )
    if event_time_timeout:
        timeout = GroupStateTimeout.EventTimeTimeout
    elif idle_timeout_ms is not None:
        timeout = GroupStateTimeout.ProcessingTimeTimeout
    else:
        timeout = GroupStateTimeout.NoTimeout
    src = events.selectExpr(
        f"{key} AS key", f"cast({ts} as timestamp) AS ts"
    )
    if event_time_timeout:
        src = src.withWatermark("ts", "0 seconds")
    return src.groupBy("key").applyInPandasWithState(
        tracker,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
