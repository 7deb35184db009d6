"""§2.9 I — streaming-surface contracts (batch-equivalent semantics).

The DuckDB oracle cannot run a stream, so contract queries run the
batch-equivalent transformation (identical code path under an
``availableNow`` trigger ≡ batch — SURVEY.md §2.9). q_i1 actually
drives Structured Streaming end-to-end (rows-only check).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from jane_spark.contracts.registry import contract
from jane_spark.engine.catalog import Catalog
from jane_spark.operators.sessionize import session_summary

THIRTY_MIN_US = 30 * 60 * 1_000_000


@contract(
    "q_i1_stream_ingest",
    oracle=None,  # streaming execution — rows-only smoke via memory sink
    survey_rows="I1",
    doc="continuous file-arrival ingest: real readStream + availableNow "
    "trigger + memory sink (streaming/ingest.py)",
)
def q_i1(spark, sf_dir):
    import shutil
    import tempfile

    from jane_spark.streaming.ingest import run_available_now, stream_parquet_dir

    # file streams need a directory basePath; stage the single parquet
    # file into a temp "arrival" dir (read-only testdata stays untouched)
    arrival = tempfile.mkdtemp(prefix="jane_stream_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{arrival}/events.parquet")

    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = stream_parquet_dir(spark, arrival, batch.schema)

    def transform(df):
        return df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))

    try:
        return run_available_now(stream, transform, "q_i1_sink")
    finally:
        shutil.rmtree(arrival, ignore_errors=True)


@contract(
    "q_i2_tumbling",
    oracle="""
        SELECT date_trunc('hour', ts) AS window_start,
               count(*) AS n, round(sum(value), 3) AS sum_value
        FROM events GROUP BY date_trunc('hour', ts)
    """,
    survey_rows="I2",
    doc="tumbling-window rollup (rolling per-interval index stats)",
)
def q_i2(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    return ev.groupBy(F.window("ts", "1 hour").alias("w")).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 3).alias("sum_value")
    ).select(
        F.col("w.start").cast("timestamp_ntz").alias("window_start"), "n", "sum_value"
    )


@contract(
    "q_i3_sliding",
    oracle="""
        WITH w AS (
            SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS window_start, value
            FROM events
            UNION ALL
            SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE,
                   value
            FROM events)
        SELECT window_start, count(*) AS n, round(sum(value), 3) AS sum_value
        FROM w GROUP BY window_start
    """,
    survey_rows="I3",
    doc="sliding window 1h/30m — each event in exactly two windows; the "
    "DuckDB twin is the two-anchor union (window = 2 x slide)",
)
def q_i3(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    return ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w")).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 3).alias("sum_value")
    ).select(
        F.col("w.start").cast("timestamp_ntz").alias("window_start"), "n", "sum_value"
    )


@contract(
    "q_i4_sessionize",
    oracle=f"""
        WITH g AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id)
                            IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id)
                            > {THIRTY_MIN_US}
                        THEN 1 ELSE 0 END AS new_s
            FROM events),
        s AS (
            SELECT user_id, ts,
                   CAST(sum(new_s) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM g)
        SELECT user_id, session_id, count(*) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end
        FROM s GROUP BY user_id, session_id
    """,
    survey_rows="I4,E4",
    doc="segment sessionization: merge spans with gaps < 30 min "
    "(operators.sessionize — jane's gap/overlap bookkeeping, batch twin "
    "of session_window)",
)
def q_i4(spark, sf_dir):
    ev = Catalog(spark, sf_dir).clustered("events", "user_id")
    return session_summary(ev, "user_id", "ts", "event_id", THIRTY_MIN_US)
