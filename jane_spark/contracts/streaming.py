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


def _ts_ntz(df):
    """Mirror Catalog._normalize_events for streaming reads: legacy
    nanosecond-LONG ``ts`` -> microsecond TIMESTAMP_NTZ; native
    timestamp parquet (current testdata) just casts to NTZ. The stream
    schema comes straight from the parquet file, so both layouts occur."""
    ts_type = dict(df.dtypes)["ts"]
    if ts_type == "bigint":
        return df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    if ts_type.startswith("timestamp"):
        return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    raise TypeError(
        f"events.ts has unexpected type {ts_type!r}; expected bigint "
        "(legacy nanosecond LONG) or a timestamp type — mirror of "
        "Catalog._normalize_events"
    )


def _self_configure(spark, sf_dir):
    """These contracts read the nanosecond-timestamp events parquet
    directly (file-stream schema inference bypasses Catalog), so on a
    bare driver session the defensive runtime confs
    (engine.session.configure — nanosAsLong et al.) must be applied
    first; Catalog construction is the configure-on-first-touch hook."""
    Catalog(spark, sf_dir)



@contract(
    "q_i1_stream_ingest",
    oracle="""
        SELECT event_type, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type
    """,
    survey_rows="I1",
    doc="continuous file-arrival ingest: real readStream + availableNow "
    "trigger + memory sink (streaming/ingest.py). TRUE ORACLE since "
    "r10 (the q_i10 pattern): availableNow + complete mode over a "
    "single-file arrival emits exactly the batch group-by, so the "
    "ingest path itself — schema application, file listing, trigger, "
    "sink — is hash-checked, not just smoke-run",
)
def q_i1(spark, sf_dir):
    _self_configure(spark, sf_dir)
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
    "q_i10_stream_rollup",
    oracle="""
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
               event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents,
               min(CAST(round(value * 100) AS BIGINT)) AS min_cents,
               max(CAST(round(value * 100) AS BIGINT)) AS max_cents
        FROM events
        GROUP BY date_trunc('hour', ts), event_type
    """,
    survey_rows="I2,I1,D16",
    doc="STREAMING continuous aggregate — the rollup cascade's "
    "(q_d16) level-1 hourly monoid built by real Structured "
    "Streaming: readStream file-arrival source + event-time watermark "
    "+ 1 h tumbling window + integer-cent (n, sum, min, max) state, "
    "availableNow trigger into a memory sink. Unlike the other I-row "
    "streaming executions this one carries a TRUE ORACLE: with "
    "availableNow + complete mode the emitted windows equal the batch "
    "group-by exactly, so the hash check pins streaming==batch "
    "semantics end-to-end (SURVEY §5.2.5), not just execution. At "
    "scale the same query with an append watermark is the hypertable "
    "ingest path: bounded state per open window, coarser levels "
    "derive from this rollup by the q_d16 monoid merge",
)
def q_i10_stream_rollup(spark, sf_dir):
    _self_configure(spark, sf_dir)
    import shutil
    import tempfile

    from jane_spark.streaming.ingest import run_available_now, stream_parquet_dir

    arrival = tempfile.mkdtemp(prefix="jane_stream_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{arrival}/events.parquet")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = stream_parquet_dir(spark, arrival, batch.schema)

    def transform(df):
        # watermarks require TIMESTAMP (not NTZ); the session is pinned
        # to UTC (engine.session.configure), so the cast is
        # value-preserving and the emitted window starts cast back to
        # NTZ land on the same instants the oracle's date_trunc hits
        d = _ts_ntz(df).withColumn("ts", F.col("ts").cast("timestamp"))
        cents = F.round(F.col("value") * 100, 0).cast("bigint")
        return (
            d.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(cents).alias("sum_cents"),
                F.min(cents).alias("min_cents"),
                F.max(cents).alias("max_cents"),
            )
            .select(
                F.col("w.start").cast("timestamp_ntz").alias("bucket"),
                "event_type",
                "n",
                "sum_cents",
                "min_cents",
                "max_cents",
            )
        )

    try:
        return run_available_now(stream, transform, "q_i10_sink")
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


@contract(
    "q_i5_late_drop",
    # TRUE ORACLE (r11, the q_i10 pattern + VERDICT r10 stretch): the
    # three-batch construction makes the append-mode emission set
    # derivable in closed form. Accepted rows = batch 0 (full history)
    # + the batch-1 filler (a clone of the LATEST row, whose tail
    # window can never finalize: window_end = trunc(max)+1h > max-1h);
    # the batch-2 late clones are dropped by the watermark filter and
    # never touch state. Append emits exactly the windows with
    # window_end <= final watermark = max(ts) - 1h. So emitted ==
    # batch hourly stats over the original events, cut at that bound —
    # no streaming-only value remains in the hashed surface.
    oracle="""
        WITH m AS (SELECT max(ts) AS mx FROM events)
        SELECT date_trunc('hour', ts) AS window_start,
               count(*) AS n, round(sum(value), 3) AS sum_value
        FROM events, m
        GROUP BY date_trunc('hour', ts), mx
        HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR
                   <= mx - INTERVAL 1 HOUR
    """,
    survey_rows="I5,I2",
    doc="late-data watermark contract: three micro-batches "
    "(maxFilesPerTrigger=1); batch 0 is the full history, batch 1 an "
    "on-time filler, batch 2 re-delivers clones of the EARLIEST rows — "
    "days beyond the watermark — which the stream must drop. The filler "
    "batch matters: since SPARK-40925 (3.4) late-record FILTERING uses "
    "the previous micro-batch's watermark while state eviction uses the "
    "current one, so a late row arriving exactly one batch after the "
    "history is still accepted; one batch later it is dropped. Append "
    "mode: each finalized window is emitted exactly once with its "
    "on-time count (jane's mtime-based late-reindex with an explicit "
    "lateness bound, SURVEY.md §2.9 I5). The drop-vs-keep assertion "
    "also lives in tests/test_streaming.py::test_i5_late_rows_dropped",
)
def q_i5(spark, sf_dir):
    _self_configure(spark, sf_dir)
    import glob
    import os
    import shutil
    import tempfile

    from jane_spark.streaming.ingest import run_available_now, stream_parquet_dir
    from jane_spark.streaming.windows import tumbling_stats

    arrival = tempfile.mkdtemp(prefix="jane_i5_")
    stage = tempfile.mkdtemp(prefix="jane_i5_stage_")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    try:
        # batch 0: full on-time history
        shutil.copy(f"{sf_dir}/events.parquet", f"{arrival}/batch0.parquet")

        def stage_file(df, name):
            df.coalesce(1).write.mode("overwrite").parquet(stage)
            shutil.copy(glob.glob(f"{stage}/part-*.parquet")[0], f"{arrival}/{name}")

        # batch 1: on-time filler (clone of the latest row; its tail
        # window is never finalized, so it cannot skew emitted counts) —
        # commits batch 0's watermark into the late-record filter
        stage_file(raw.orderBy(F.desc("ts"), F.desc("event_id")).limit(1),
                   "batch1_filler.parquet")
        # batch 2: clones of the 10 earliest rows — far older than the
        # watermark batch 0 established (the events table spans days)
        stage_file(raw.orderBy("ts", "event_id").limit(10), "batch2_late.parquet")
        # deterministic micro-batch order: the file source orders by
        # modification time — pin it explicitly
        now = os.path.getmtime(f"{arrival}/batch2_late.parquet")
        os.utime(f"{arrival}/batch0.parquet", (now - 200, now - 200))
        os.utime(f"{arrival}/batch1_filler.parquet", (now - 100, now - 100))

        stream = stream_parquet_dir(spark, arrival, raw.schema, max_files_per_trigger=1)

        def transform(df):
            return tumbling_stats(_ts_ntz(df), "ts", "1 hour", watermark="1 hour")

        return run_available_now(
            stream, transform, "q_i5_sink", output_mode="append"
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(arrival, ignore_errors=True)


@contract(
    "q_i6_stream_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    survey_rows="I6",
    doc="idempotent re-ingest: dropDuplicatesWithinWatermark over a real "
    "file stream (streaming/windows.dedup_within_watermark); batch twin "
    "is q_a4_sha_dedup. TRUE ORACLE via the q_i10 pattern: with "
    "availableNow over a single-file arrival the whole input is ONE "
    "microbatch, the watermark only advances BETWEEN batches, so no "
    "dedup state can expire mid-run and the emitted set is exactly "
    "DISTINCT(keys) — streaming dedup ≡ batch dedup, hash-checked. "
    "(i5 late-drop and j5 stateful segments can NOT follow: their "
    "semantics are defined by cross-batch watermark movement and "
    "custom state timeouts, which no single-batch run exercises and "
    "no batch SQL reproduces)",
)
def q_i6(spark, sf_dir):
    import shutil
    import tempfile

    _self_configure(spark, sf_dir)
    from jane_spark.streaming.ingest import run_available_now, stream_parquet_dir
    from jane_spark.streaming.windows import dedup_within_watermark

    arrival = tempfile.mkdtemp(prefix="jane_i6_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{arrival}/events.parquet")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = stream_parquet_dir(spark, arrival, schema)

    def transform(df):
        df = _ts_ntz(df)
        return dedup_within_watermark(
            df, ["user_id", "event_type"], "ts", "1 hour"
        ).select("user_id", "event_type")

    try:
        return run_available_now(stream, transform, "q_i6_sink")
    finally:
        shutil.rmtree(arrival, ignore_errors=True)


@contract(
    "q_i7_stream_upsert",
    oracle="""
        WITH d AS (SELECT doc_id, lang AS network, n_chars
                   FROM documents ORDER BY doc_id LIMIT 200)
        SELECT doc_id, network,
               CASE WHEN doc_id IN (SELECT doc_id FROM d
                                    ORDER BY doc_id LIMIT 50)
                    THEN CAST(-1 AS BIGINT) ELSE n_chars END AS n_chars
        FROM d
    """,
    survey_rows="I7",
    doc="per-document index upsert: foreachBatch + per-doc partition "
    "overwrite (streaming/upsert.start_index_upsert_stream); the second "
    "arrival of doc_id replaces its rows, matching jane's reindex "
    "delete-then-insert transaction. TRUE ORACLE via the q_i10 "
    "pattern: the upsert law (last write per doc wins) is "
    "batch-expressible, so the final store content is hash-checked — "
    "the 200 lowest doc_ids with the re-arrived 50 carrying their "
    "updated n_chars = -1. The ingest subsets are orderBy(doc_id)-"
    "deterministic so both engines pick identical rows",
)
def q_i7(spark, sf_dir):
    import tempfile

    from jane_spark.sources.index_store import IndexStore
    from jane_spark.streaming.ingest import stream_parquet_dir
    from jane_spark.streaming.upsert import start_index_upsert_stream

    root = tempfile.mkdtemp(prefix="jane_i7_")
    src = f"{root}/parsed"
    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id", F.col("lang").alias("network"), "n_chars"
    )
    docs.orderBy("doc_id").limit(200).write.parquet(src)
    store = IndexStore(spark, f"{root}/store")
    schema = spark.read.parquet(src).schema
    q = start_index_upsert_stream(
        stream_parquet_dir(spark, src, schema), store, "doc", f"{root}/ckpt"
    )
    q.awaitTermination()
    # re-arrival of the first docs with updated rows -> upsert replaces
    docs.orderBy("doc_id").limit(50).withColumn(
        "n_chars", F.lit(-1).cast("bigint")
    ).write.mode("append").parquet(src)
    q = start_index_upsert_stream(
        stream_parquet_dir(spark, src, schema), store, "doc", f"{root}/ckpt"
    )
    q.awaitTermination()
    return store.index("doc").select("doc_id", "network", "n_chars")


@contract(
    "q_j5_stateful_segments",
    oracle="""
        WITH f AS (SELECT user_id AS key, ts FROM events
                   WHERE user_id % 10 = 0),
        o AS (SELECT key, ts,
                     CASE WHEN lag(ts) OVER (PARTITION BY key
                                             ORDER BY ts) IS NULL
                          OR epoch_us(ts)
                             - epoch_us(lag(ts) OVER (PARTITION BY key
                                                      ORDER BY ts))
                             > 1800000000
                          THEN 1 ELSE 0 END AS brk
              FROM f),
        s AS (SELECT key, ts,
                     sum(brk) OVER (PARTITION BY key ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS seg
              FROM o),
        g AS (SELECT key, seg,
                     CAST(epoch_us(min(ts)) AS BIGINT) AS seg_start_us,
                     CAST(epoch_us(max(ts)) AS BIGINT) AS seg_end_us,
                     CAST(count(*) AS BIGINT) AS n_events
              FROM s GROUP BY key, seg)
        SELECT CAST(key AS BIGINT) AS key, seg_start_us, seg_end_us,
               n_events,
               seg <> max(seg) OVER (PARTITION BY key) AS closed
        FROM g
    """,
    survey_rows="J5,I4",
    doc="applyInPandasWithState open-segment tracking per key over a "
    "real stream (streaming/state.open_segments_stream) — jane's "
    "waveform-monitor open-segment bookkeeping. TRUE ORACLE since "
    "r12 (the q_i6 single-batch argument): the single-file "
    "availableNow arrival is ONE microbatch and the tracker runs "
    "NoTimeout, so per key the emission is exactly the sorted-pass "
    "gap sessionization — every gap-closed segment with closed=true "
    "plus the final open segment with closed=false, all derivable as "
    "batch SQL (lag-break + running sum + per-segment agg; the LAST "
    "segment per key is the open one). Timestamps hash as epoch "
    "MICROSECOND BIGINTs (unix_micros vs epoch_us — the session tz "
    "is pinned UTC by engine.session.configure, making the NTZ->LTZ "
    "cast the identity), so no tz/precision ambiguity reaches the "
    "hashed surface. Cross-batch watermark movement and state "
    "TIMEOUTS remain pytest-only territory (tests/test_streaming.py) "
    "— this oracle pins the single-batch law, which is what the "
    "driver can replay",
)
def q_j5(spark, sf_dir):
    import shutil
    import tempfile

    _self_configure(spark, sf_dir)
    from jane_spark.streaming.ingest import run_available_now, stream_parquet_dir
    from jane_spark.streaming.state import open_segments_stream

    arrival = tempfile.mkdtemp(prefix="jane_j5_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{arrival}/events.parquet")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = stream_parquet_dir(spark, arrival, schema)

    def transform(df):
        df = _ts_ntz(df).filter(F.col("user_id") % 10 == 0)  # bound state for the smoke
        return open_segments_stream(df, "user_id", "ts", gap_seconds=1800)

    try:
        out = run_available_now(stream, transform, "q_j5_sink")
        return out.select(
            F.col("key").cast("bigint").alias("key"),
            F.expr("cast(unix_micros(segment_start) as bigint)").alias(
                "seg_start_us"
            ),
            F.expr("cast(unix_micros(segment_end) as bigint)").alias(
                "seg_end_us"
            ),
            F.col("n_events").cast("bigint").alias("n_events"),
            "closed",
        )
    finally:
        shutil.rmtree(arrival, ignore_errors=True)


@contract(
    "q_i8_stream_quality_gate",
    oracle="""
        WITH f AS (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tok,
                   len(list_filter(string_split(text, ' '),
                       t -> list_contains(['data','table','row','value'], t)))
                       / CAST(len(string_split(text, ' ')) AS DOUBLE)
                       AS stop_ratio,
                   CAST(concat('0x', substr(md5(concat('split:',
                       CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 10000
                       AS bucket
            FROM documents)
        SELECT CASE WHEN bucket < 8000 THEN 'train'
                    WHEN bucket < 9000 THEN 'val'
                    ELSE 'test' END AS split,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM f WHERE n_tok >= 30 AND stop_ratio <= 0.25
        GROUP BY 1
    """,
    survey_rows="I1,P1,K6",
    doc="the training-pipeline quality gate as a STREAM: file-arrival "
    "ingest -> row-local quality features + deterministic hash split "
    "(pure projections, stateless until the final agg) -> per-split "
    "survivor counts under an availableNow trigger. TRUE ORACLE since "
    "r10 (the q_i10 pattern): complete-mode availableNow over one "
    "file equals the batch gate, whose logic is the q_p5 oracle's "
    "filter + the q_p1 salted-bucket split — end-to-end hash-checked",
)
def q_i8(spark, sf_dir):
    import shutil
    import tempfile

    _self_configure(spark, sf_dir)
    from jane_spark.streaming.ingest import run_available_now, stream_parquet_dir

    arrival = tempfile.mkdtemp(prefix="jane_stream_")
    shutil.copy(f"{sf_dir}/documents.parquet", f"{arrival}/documents.parquet")
    batch = spark.read.parquet(f"{sf_dir}/documents.parquet")
    try:
        return run_available_now(
            stream_parquet_dir(spark, arrival, batch.schema),
            _quality_gate,
            "q_i8_sink",
        )
    finally:
        shutil.rmtree(arrival, ignore_errors=True)


def _quality_gate(df):
    """Shared stream/batch transform for the quality gate (the batch-
    equivalence test runs the SAME function on a static DataFrame)."""
    from jane_spark.functions.sampling import split_assign
    from jane_spark.functions.text import stopword_ratio, token_count

    stops = ["data", "table", "row", "value"]
    f = df.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tok"),
        stopword_ratio(F.col("text"), stops).alias("stop_ratio"),
        split_assign(
            F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1}, salt="split:"
        ).alias("split"),
    ).filter((F.col("n_tok") >= 30) & (F.col("stop_ratio") <= 0.25))
    return f.groupBy("split").agg(F.count(F.lit(1)).alias("n_docs"))


@contract(
    "q_i9_stream_join",
    oracle="""
        WITH e AS (SELECT event_id, user_id, event_type,
                          date_trunc('microseconds', ts) AS ts
                   FROM events)
        SELECT p.event_id AS purchase_id, c.event_id AS click_id,
               p.user_id AS user_id
        FROM e p JOIN e c
          ON p.user_id = c.user_id
         AND p.event_type = 'purchase' AND c.event_type = 'click'
         AND c.ts >= p.ts - INTERVAL 72 HOUR
         AND c.ts <= p.ts
    """,
    survey_rows="I9,C4",
    doc="stream-stream interval join, batch path (streaming/joins."
    "correlate_within): each purchase matched to same-user clicks in "
    "the trailing 72 h — the notification-to-coverage correlation; "
    "the real two-stream execution is proven stream≡batch in "
    "tests/test_streaming.py under availableNow",
)
def q_i9(spark, sf_dir):
    from jane_spark.streaming.joins import correlate_within

    ev = Catalog(spark, sf_dir).events
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    joined = correlate_within(
        purchases, clicks, "p_user", "c_user", "p_ts", "c_ts",
        lookback="72 hours",
    )
    return joined.select(
        "purchase_id", "click_id", F.col("p_user").alias("user_id")
    )


@contract(
    "q_i11_stream_join",
    # TRUE ORACLE (the q_i10 argument, join edition): with availableNow
    # over one arrival file, both sides see ALL data in a single
    # micro-batch, no row is ever late vs the watermark, and an
    # append-mode INNER stream-stream join emits each qualifying pair
    # exactly once — so the emitted set equals the batch interval join.
    oracle="""
        SELECT c.user_id,
               CAST(c.event_id AS BIGINT) AS click_id,
               CAST(p.event_id AS BIGINT) AS purchase_id,
               CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS lag_us
        FROM events c
        JOIN events p
          ON c.user_id = p.user_id
         AND c.event_type = 'click'
         AND p.event_type = 'purchase'
         AND p.ts >= c.ts
         AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
    survey_rows="I11,I4,C4",
    doc="STREAM-STREAM event-time interval join (click->purchase "
    "attribution within 1 h, per user): two watermarked sides of one "
    "readStream source self-joined on user_id + an event-time range — "
    "Structured Streaming's buffered two-sided state join, the "
    "real-time attribution/sessionization primitive. Both sides carry "
    "1 h watermarks, so at steady state each side buffers only rows "
    "younger than watermark+range (bounded state); availableNow + "
    "append makes the emitted pairs equal the batch interval join "
    "(the q_i10 batch-equivalence argument), giving a true oracle",
)
def q_i11(spark, sf_dir):
    _self_configure(spark, sf_dir)
    import shutil
    import tempfile

    from jane_spark.streaming.ingest import run_available_now, stream_parquet_dir

    arrival = tempfile.mkdtemp(prefix="jane_i11_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{arrival}/events.parquet")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = stream_parquet_dir(spark, arrival, batch.schema)

    def transform(df):
        d = _ts_ntz(df).withColumn("ts", F.col("ts").cast("timestamp"))
        clicks = (
            d.where(F.col("event_type") == "click")
            .select(
                F.col("user_id").alias("c_user"),
                F.col("event_id").cast("long").alias("click_id"),
                F.col("ts").alias("c_ts"),
            )
            .withWatermark("c_ts", "1 hour")
        )
        purchases = (
            d.where(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("p_user"),
                F.col("event_id").cast("long").alias("purchase_id"),
                F.col("ts").alias("p_ts"),
            )
            .withWatermark("p_ts", "1 hour")
        )
        return clicks.join(
            purchases,
            F.expr(
                "c_user = p_user AND p_ts >= c_ts "
                "AND p_ts <= c_ts + INTERVAL 1 HOUR"
            ),
        ).select(
            F.col("c_user").alias("user_id"),
            "click_id",
            "purchase_id",
            (
                F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("c_ts"))
            ).cast("bigint").alias("lag_us"),
        )

    try:
        return run_available_now(
            stream, transform, "q_i11_sink", output_mode="append"
        )
    finally:
        shutil.rmtree(arrival, ignore_errors=True)


@contract(
    "q_j5_two_batch",
    oracle="""
        WITH f AS (SELECT user_id AS key, ts FROM events
                   WHERE user_id % 10 = 0),
        a AS (SELECT * FROM f
              WHERE ts < TIMESTAMP '2024-01-16 00:00:00'),
        o1 AS (SELECT key, ts,
                      CASE WHEN lag(ts) OVER (PARTITION BY key
                                              ORDER BY ts) IS NULL
                           OR epoch_us(ts)
                              - epoch_us(lag(ts) OVER (PARTITION BY key
                                                       ORDER BY ts))
                              > 1800000000
                           THEN 1 ELSE 0 END AS brk
               FROM a),
        s1 AS (SELECT key, ts,
                      sum(brk) OVER (PARTITION BY key ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS seg
               FROM o1),
        g1 AS (SELECT key, seg,
                      CAST(epoch_us(min(ts)) AS BIGINT) AS seg_start_us,
                      CAST(epoch_us(max(ts)) AS BIGINT) AS seg_end_us,
                      CAST(count(*) AS BIGINT) AS n_events
               FROM s1 GROUP BY key, seg),
        b1 AS (SELECT key, seg_start_us, seg_end_us, n_events,
                      seg <> max(seg) OVER (PARTITION BY key) AS closed
               FROM g1),
        o2 AS (SELECT key, ts,
                      CASE WHEN lag(ts) OVER (PARTITION BY key
                                              ORDER BY ts) IS NULL
                           OR epoch_us(ts)
                              - epoch_us(lag(ts) OVER (PARTITION BY key
                                                       ORDER BY ts))
                              > 1800000000
                           THEN 1 ELSE 0 END AS brk
               FROM f),
        s2 AS (SELECT key, ts,
                      sum(brk) OVER (PARTITION BY key ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS seg
               FROM o2),
        g2 AS (SELECT key, seg,
                      CAST(epoch_us(min(ts)) AS BIGINT) AS seg_start_us,
                      CAST(epoch_us(max(ts)) AS BIGINT) AS seg_end_us,
                      CAST(count(*) AS BIGINT) AS n_events
               FROM s2 GROUP BY key, seg),
        g2c AS (SELECT key, seg, seg_start_us, seg_end_us, n_events,
                       seg <> max(seg) OVER (PARTITION BY key) AS closed
                FROM g2),
        keys_b AS (SELECT DISTINCT key FROM f
                   WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'),
        open_a AS (SELECT key, seg_start_us AS oa_start
                   FROM b1 WHERE NOT closed),
        b2 AS (SELECT g2c.key, g2c.seg_start_us, g2c.seg_end_us,
                      g2c.n_events, g2c.closed
               FROM g2c
               JOIN keys_b ON g2c.key = keys_b.key
               LEFT JOIN open_a ON g2c.key = open_a.key
               WHERE open_a.key IS NULL
                  OR g2c.seg_start_us >= open_a.oa_start)
        SELECT CAST(key AS BIGINT) AS key, seg_start_us, seg_end_us,
               n_events, closed
        FROM b1
        UNION ALL
        SELECT CAST(key AS BIGINT) AS key, seg_start_us, seg_end_us,
               n_events, closed
        FROM b2
    """,
    survey_rows="J5,I5,I7",
    doc="CROSS-BATCH stateful segment tracking as a TRUE ORACLE "
    "(VERDICT r12 #7 — the q_i5/q_i7 two-file availableNow "
    "construction): events split at a fixed timestamp into file A "
    "then file B, TWO availableNow runs share one checkpoint, so "
    "run 2 recovers the per-key open-segment STATE from run 1's "
    "checkpoint and processes only file B — checkpointed state "
    "recovery, not single-batch folding. The emission multiset is "
    "closed-form: batch 1 = sessionize(A) (open tail closed=false); "
    "batch 2, per key with B rows = the FULL-timeline segments "
    "whose start >= that key's batch-1 open-segment start (the open "
    "segment re-emitted extended or closed, plus every later "
    "segment), keys new in B = their full segments. The oracle "
    "derives both batches as lag-break sessionizations + one "
    "segment-start inequality join — hash equality pins the "
    "tracker's cross-batch STATE SEMANTICS (what survives the "
    "checkpoint, what re-emits, what closes) against batch SQL. "
    "Timeout-based idle flushes (ProcessingTimeTimeout) remain "
    "pytest-only: wall-clock timeouts are nondeterministic by "
    "construction (tests/test_streaming.py pins them)",
)
def q_j5_two_batch(spark, sf_dir):
    import os
    import shutil
    import tempfile

    _self_configure(spark, sf_dir)
    from jane_spark.streaming.ingest import stream_parquet_dir
    from jane_spark.streaming.state import open_segments_stream

    root = tempfile.mkdtemp(prefix="jane_j5b_")
    arrival = os.path.join(root, "arrival")
    os.makedirs(arrival)
    ckpt = os.path.join(root, "ckpt")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp_ntz")
    ev = _ts_ntz(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).select("user_id", "ts")

    def transform(df):
        d = _ts_ntz(df).filter(F.col("user_id") % 10 == 0)
        return open_segments_stream(d, "user_id", "ts", gap_seconds=1800)

    sink = os.path.join(root, "sink")

    def to_sink(batch_df, _batch_id):
        # the memory sink cannot RECOVER from a checkpoint (exactly the
        # property this contract exercises), so emissions land in a
        # parquet sink via foreachBatch — the q_i7 store pattern; both
        # runs append to the same directory
        batch_df.write.mode("append").parquet(sink)

    try:
        parts = [ev.filter(F.col("ts") < cut), ev.filter(F.col("ts") >= cut)]
        for i, part in enumerate(parts):
            part.coalesce(1).write.mode("append").parquet(arrival)
            schema = spark.read.parquet(arrival).schema
            stream = stream_parquet_dir(spark, arrival, schema)
            q = (
                transform(stream)
                .writeStream.foreachBatch(to_sink)
                .queryName(f"q_j5b_run_{i}")
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        return (
            spark.read.parquet(sink)
            .select(
                F.col("key").cast("bigint").alias("key"),
                F.expr("cast(unix_micros(segment_start) as bigint)").alias(
                    "seg_start_us"
                ),
                F.expr("cast(unix_micros(segment_end) as bigint)").alias(
                    "seg_end_us"
                ),
                F.col("n_events").cast("bigint").alias("n_events"),
                "closed",
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@contract(
    "q_j5_event_timeout",
    oracle="""
        WITH f AS (SELECT user_id AS key, ts FROM events
                   WHERE user_id % 10 = 0),
        a AS (SELECT * FROM f
              WHERE ts < TIMESTAMP '2024-01-16 00:00:00'),
        bnew AS (SELECT * FROM f
                 WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
                   AND key % 20 = 0),
        fall AS (SELECT * FROM a UNION ALL SELECT * FROM bnew),
        o1 AS (SELECT key, ts,
                      CASE WHEN lag(ts) OVER (PARTITION BY key
                                              ORDER BY ts) IS NULL
                           OR epoch_us(ts)
                              - epoch_us(lag(ts) OVER (PARTITION BY key
                                                       ORDER BY ts))
                              > 1800000000
                           THEN 1 ELSE 0 END AS brk
               FROM a),
        s1 AS (SELECT key, ts,
                      sum(brk) OVER (PARTITION BY key ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS seg
               FROM o1),
        g1 AS (SELECT key, seg,
                      CAST(epoch_us(min(ts)) AS BIGINT) AS seg_start_us,
                      CAST(epoch_us(max(ts)) AS BIGINT) AS seg_end_us,
                      CAST(count(*) AS BIGINT) AS n_events
               FROM s1 GROUP BY key, seg),
        b1 AS (SELECT key, seg_start_us, seg_end_us, n_events,
                      seg <> max(seg) OVER (PARTITION BY key) AS closed
               FROM g1),
        o2 AS (SELECT key, ts,
                      CASE WHEN lag(ts) OVER (PARTITION BY key
                                              ORDER BY ts) IS NULL
                           OR epoch_us(ts)
                              - epoch_us(lag(ts) OVER (PARTITION BY key
                                                       ORDER BY ts))
                              > 1800000000
                           THEN 1 ELSE 0 END AS brk
               FROM fall),
        s2 AS (SELECT key, ts,
                      sum(brk) OVER (PARTITION BY key ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS seg
               FROM o2),
        g2 AS (SELECT key, seg,
                      CAST(epoch_us(min(ts)) AS BIGINT) AS seg_start_us,
                      CAST(epoch_us(max(ts)) AS BIGINT) AS seg_end_us,
                      CAST(count(*) AS BIGINT) AS n_events
               FROM s2 GROUP BY key, seg),
        g2c AS (SELECT key, seg, seg_start_us, seg_end_us, n_events,
                       seg <> max(seg) OVER (PARTITION BY key) AS closed
                FROM g2),
        keys_b AS (SELECT DISTINCT key FROM bnew),
        open_a AS (SELECT key, seg_start_us AS oa_start,
                          seg_end_us AS oa_end, n_events AS oa_n
                   FROM b1 WHERE NOT closed),
        b2_data AS (SELECT g2c.key, g2c.seg_start_us, g2c.seg_end_us,
                           g2c.n_events, g2c.closed
                    FROM g2c
                    JOIN keys_b ON g2c.key = keys_b.key
                    LEFT JOIN open_a ON g2c.key = open_a.key
                    WHERE open_a.key IS NULL
                       OR g2c.seg_start_us >= open_a.oa_start),
        wmf AS (SELECT CAST(max(epoch_us(ts)) AS BIGINT) AS maxf_us
                FROM fall),
        b2_flush AS (SELECT g2c.key, g2c.seg_start_us, g2c.seg_end_us,
                            g2c.n_events, TRUE AS closed
                     FROM g2c CROSS JOIN wmf
                     WHERE NOT g2c.closed
                       AND (g2c.seg_end_us + 1800000000) // 1000
                           <= wmf.maxf_us // 1000)
        SELECT CAST(key AS BIGINT) AS key, seg_start_us, seg_end_us,
               n_events, closed
        FROM b1
        UNION ALL
        SELECT CAST(key AS BIGINT), seg_start_us, seg_end_us,
               n_events, closed FROM b2_data
        UNION ALL
        SELECT CAST(key AS BIGINT), seg_start_us, seg_end_us,
               n_events, closed FROM b2_flush
    """,
    survey_rows="J5,I5,I2",
    doc="EVENT-TIME TIMEOUT state flush as a TRUE ORACLE — completes "
    "the J5 family: wall-clock (ProcessingTime) timeouts are "
    "nondeterministic by construction, but EventTimeTimeout flushes "
    "by WATERMARK, which advances with the DATA — so the flush set "
    "is closed-form. Construction: file A = pre-cut events, file B = "
    "post-cut events of HALF the keys (key % 20 = 0), two "
    "availableNow runs on one checkpoint with the tracker's timeout "
    "timestamp set to seg_end + gap. Each availableNow run ends with "
    "a no-data sweep batch at the advanced watermark (discovered "
    "empirically against the first-draft oracle, r13), so the flush "
    "law lands simply: EVERY key's final open segment emits exactly "
    "one closed=true flush iff its gap horizon (seg_end + 1800 s, "
    "floored to ms — Spark watermarks are ms) <= the final watermark "
    "(max event time over both files); keys with B data also emit "
    "the ordinary cross-batch data law, and a key whose A-open "
    "segment flushed in run 1's sweep re-sessionizes its B rows "
    "from empty state — the gap rule makes the emitted segments "
    "identical either way, which is WHY the multiset is closed-form. "
    "Hash equality pins the TIMEOUT semantics — which keys flush, "
    "with exactly what state — against batch SQL",
)
def q_j5_event_timeout(spark, sf_dir):
    import os
    import shutil
    import tempfile

    _self_configure(spark, sf_dir)
    from jane_spark.streaming.ingest import stream_parquet_dir
    from jane_spark.streaming.state import open_segments_stream

    root = tempfile.mkdtemp(prefix="jane_j5t_")
    arrival = os.path.join(root, "arrival")
    os.makedirs(arrival)
    ckpt = os.path.join(root, "ckpt")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp_ntz")
    ev = _ts_ntz(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).select("user_id", "ts")
    sink = os.path.join(root, "sink")

    def to_sink(batch_df, _batch_id):
        batch_df.write.mode("append").parquet(sink)

    def transform(df):
        d = _ts_ntz(df).filter(F.col("user_id") % 10 == 0)
        return open_segments_stream(
            d, "user_id", "ts", gap_seconds=1800,
            event_time_timeout=True,
        )

    try:
        parts = [
            ev.filter(F.col("ts") < cut),
            ev.filter(
                (F.col("ts") >= cut) & (F.col("user_id") % 20 == 0)
            ),
        ]
        for i, part in enumerate(parts):
            part.coalesce(1).write.mode("append").parquet(arrival)
            schema = spark.read.parquet(arrival).schema
            stream = stream_parquet_dir(spark, arrival, schema)
            q = (
                transform(stream)
                .writeStream.foreachBatch(to_sink)
                .queryName(f"q_j5t_run_{i}")
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        return (
            spark.read.parquet(sink)
            .select(
                F.col("key").cast("bigint").alias("key"),
                F.expr("cast(unix_micros(segment_start) as bigint)").alias(
                    "seg_start_us"
                ),
                F.expr("cast(unix_micros(segment_end) as bigint)").alias(
                    "seg_end_us"
                ),
                F.col("n_events").cast("bigint").alias("n_events"),
                "closed",
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
