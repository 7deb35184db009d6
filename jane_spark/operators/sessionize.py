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


def transition_counts(
    df: "DataFrame",
    key: str,
    ts: str,
    state: str,
    id_col: str,
) -> "DataFrame":
    """Markov transition matrix over per-key event sequences: counts of
    (state -> next state) for consecutive events ordered by (ts, id).
    ONE window shuffle on the key + one count aggregate over
    (from, to) pairs — the shuffle after the window carries only the
    two state columns."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(id_col).asc())
    pairs = df.select(
        F.col(state).alias("from_state"),
        F.lead(state).over(w).alias("to_state"),
    ).filter(F.col("to_state").isNotNull())
    return pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n")
    )


def funnel_counts(
    df: "DataFrame",
    key: str,
    ts: str,
    state: str,
    id_col: str,
    stages: "list[str]",
) -> "DataFrame":
    """Ordered funnel: how many keys reached stage i — meaning there
    exist events s_1 < s_2 < … < s_i (strictly increasing (ts, id))
    matching the stage sequence. Classic product-analytics shape over
    the event stream.

    Implementation is one aggregation pass per key: events sort
    row-locally (collect_list of (ts, id, state) structs per key —
    bounded by a key's own event count, the sessionize state argument),
    then a linear scan advances a stage cursor. Output: stage,
    stage_idx, n_keys reached. No joins, ONE key-keyed shuffle."""
    from pyspark.sql import functions as F

    seq = df.groupBy(key).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(ts).alias("t"),
                    F.col(id_col).alias("i"),
                    F.col(state).alias("s"),
                )
            )
        ).alias("ev")
    )
    # fold: cursor = number of stages matched so far; an event matching
    # stages[cursor] advances it (strict order comes free: the array is
    # (t, i)-sorted and the cursor only moves forward)
    stage_arr = F.array(*[F.lit(s) for s in stages])
    reached = F.aggregate(
        F.col("ev"),
        F.lit(0),
        lambda acc, e: F.when(
            (acc < F.size(stage_arr))
            & (e["s"] == F.element_at(stage_arr, acc + 1)),
            acc + 1,
        ).otherwise(acc),
    )
    per_key = seq.select(reached.alias("reached"))
    counts = per_key.groupBy("reached").agg(F.count(F.lit(1)).alias("n"))
    # stage i row = keys whose cursor reached >= i
    stage_rows = per_key.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(stages)], "stage_idx int, stage string"
    )
    return (
        stage_rows.join(
            counts, on=counts["reached"] >= stage_rows["stage_idx"], how="left"
        )
        .groupBy("stage_idx", "stage")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_keys"))
    )
