"""Streaming-surface tests (SURVEY.md §5.2.5): availableNow batch
equivalence, session-window vs batch sessionize, watermark dedup,
foreachBatch upsert, stateful segment tracking."""

from __future__ import annotations

import datetime as dt
import shutil

import pytest
from pyspark.sql import functions as F


def _stage_events(spark, sf_dir, tmp_path):
    arrival = tmp_path / "arrival"
    arrival.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", arrival / "events.parquet")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    from jane_spark.streaming.ingest import stream_parquet_dir

    return batch, stream_parquet_dir(spark, str(arrival), batch.schema)


def _norm_events(df):
    # the staged stream reads the parquet schema verbatim — apply the
    # same legacy-long / native-timestamp normalization the catalog does
    from jane_spark.contracts.streaming import _ts_ntz

    return _ts_ntz(df)


def test_tumbling_stream_equals_batch(spark, sf_dir, tmp_path):
    from jane_spark.streaming.ingest import run_available_now
    from jane_spark.streaming.windows import tumbling_stats

    batch, stream = _stage_events(spark, sf_dir, tmp_path)
    got = run_available_now(
        stream,
        lambda df: tumbling_stats(_norm_events(df), "ts", watermark="1 hour"),
        "t_tumbling_sink",
    )
    want = tumbling_stats(_norm_events(batch), "ts")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_session_window_equals_batch_sessionize(spark):
    """session_window spans == operators.sessionize spans (away from the
    exact gap boundary)."""
    from jane_spark.operators.sessionize import session_summary
    from jane_spark.streaming.windows import session_spans

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for uid in range(5):
        t = base + dt.timedelta(minutes=uid * 7)
        for burst in range(3):
            t = t + dt.timedelta(minutes=95)  # > 30 min -> new session
            for i in range(4):
                t = t + dt.timedelta(minutes=5)  # < 30 min -> same session
                rows.append((eid, uid, t))
                eid += 1
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])

    stream_shape = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in session_spans(df, "user_id", "ts", gap="30 minutes").collect()
    }
    batch_shape = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in session_summary(
            df, "user_id", "ts", "event_id", 30 * 60 * 1_000_000
        ).collect()
    }
    assert stream_shape == batch_shape


def test_dedup_within_watermark_stream(spark, tmp_path):
    """I6: duplicate sha1 arriving within the watermark is dropped."""
    import pandas as pd

    from jane_spark.streaming.ingest import run_available_now, stream_parquet_dir
    from jane_spark.streaming.windows import dedup_within_watermark

    src = tmp_path / "docs"
    src.mkdir()
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    pdf = pd.DataFrame(
        {
            "sha1": ["aaa", "bbb", "aaa", "ccc", "bbb"],
            "ts": [base + dt.timedelta(minutes=m) for m in (0, 1, 2, 3, 4)],
            "name": ["f1", "f2", "f1b", "f3", "f2b"],
        }
    )
    # µs precision: ns-unit parquet would read back as raw longs under
    # the engine's nanosAsLong setting
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(src / "batch1.parquet")
    batch = spark.read.parquet(str(src))
    stream = stream_parquet_dir(spark, str(src), batch.schema)
    got = run_available_now(
        stream,
        lambda df: dedup_within_watermark(df, ["sha1"], "ts", "1 hour"),
        "t_dedup_sink",
    )
    assert sorted(r["sha1"] for r in got.collect()) == ["aaa", "bbb", "ccc"]


def test_foreach_batch_upsert(spark, tmp_path):
    """I7: second arrival of a document replaces its index rows."""
    import pandas as pd

    from jane_spark.sources.index_store import IndexStore
    from jane_spark.streaming.ingest import stream_parquet_dir
    from jane_spark.streaming.upsert import start_index_upsert_stream

    src = tmp_path / "parsed"
    src.mkdir()
    store = IndexStore(spark, str(tmp_path / "store"))
    ckpt = str(tmp_path / "ckpt")

    pd.DataFrame(
        {"doc_id": ["d1", "d1", "d2"], "network": ["BW", "BW", "GR"], "val": [1.0, 2.0, 3.0]}
    ).to_parquet(src / "b1.parquet")
    schema = spark.read.parquet(str(src)).schema
    q = start_index_upsert_stream(
        stream_parquet_dir(spark, str(src), schema), store, "stationxml", ckpt
    )
    q.awaitTermination()
    assert store.index("stationxml").count() == 3

    # d1 re-parsed with ONE row now — old two must vanish, d2 untouched
    pd.DataFrame({"doc_id": ["d1"], "network": ["BW"], "val": [9.0]}).to_parquet(
        src / "b2.parquet"
    )
    q = start_index_upsert_stream(
        stream_parquet_dir(spark, str(src), schema), store, "stationxml", ckpt
    )
    q.awaitTermination()
    got = {(r["doc_id"], r["val"]) for r in store.index("stationxml").collect()}
    assert got == {("d1", 9.0), ("d2", 3.0)}


def test_stateful_segment_tracker(spark, tmp_path):
    """J5: applyInPandasWithState merges in-tolerance events into open
    segments and closes them across gaps."""
    import pandas as pd

    from jane_spark.streaming.ingest import run_available_now, stream_parquet_dir
    from jane_spark.streaming.state import open_segments_stream

    src = tmp_path / "seg"
    src.mkdir()
    base = dt.datetime(2024, 1, 1)
    rows = []
    for uid in (1, 2):
        for m in (0, 5, 10, 120, 125):  # gap between 10 and 120
            rows.append((uid, base + dt.timedelta(minutes=m)))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(src / "b1.parquet")
    schema = spark.read.parquet(str(src)).schema
    stream = stream_parquet_dir(spark, str(src), schema)
    got = run_available_now(
        stream,
        lambda df: open_segments_stream(df, "user_id", "ts", gap_seconds=1800),
        "t_state_sink",
    )
    rows = got.collect()
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r["key"], []).append(r)
    for uid in (1, 2):
        segs = sorted(by_key[uid], key=lambda r: r["segment_start"])
        assert len(segs) == 2
        closed, open_seg = segs[0], segs[1]
        assert closed["closed"] is True and closed["n_events"] == 3
        assert open_seg["closed"] is False and open_seg["n_events"] == 2


def test_late_data_beyond_watermark_dropped(spark, tmp_path):
    """I5: rows older than the watermark do not update state.

    Three availableNow runs over one checkpoint: (A) seed a window and
    advance the watermark, (B) deliver late rows far behind it plus one
    on-time row, (C) push the watermark past the seeded window so it
    finalizes. If the late rows had been accepted, their (much older)
    window would finalize in run C too — its absence is the proof.
    """
    import pandas as pd

    from jane_spark.streaming.ingest import stream_parquet_dir
    from jane_spark.streaming.windows import tumbling_stats

    src = tmp_path / "arrivals"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write(name, rows):
        pdf = pd.DataFrame(rows, columns=["event_id", "ts", "value"])
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(src / name)

    sink = str(tmp_path / "sink")

    def run():
        # file sink: supports checkpoint recovery (memory sink does not)
        schema = spark.read.parquet(str(src)).schema
        stream = stream_parquet_dir(spark, str(src), schema)
        out = tumbling_stats(stream, "ts", width="1 hour", watermark="1 hour")
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (r["window_start"], r["n"])
            for r in spark.read.parquet(sink).collect()
        }

    t = dt.datetime
    write("a.parquet", [(1, t(2024, 1, 2, 10, 5), 1.0), (2, t(2024, 1, 2, 10, 10), 1.0)])
    run()  # watermark -> 2024-01-02 09:10
    write("b.parquet", [
        (3, t(2024, 1, 1, 0, 10), 1.0),   # late: 33h behind the watermark
        (4, t(2024, 1, 1, 0, 20), 1.0),   # late
        (5, t(2024, 1, 2, 12, 0), 1.0),   # on time
    ])
    run()  # late rows dropped; watermark -> 11:00
    write("c.parquet", [(6, t(2024, 1, 5, 0, 0), 1.0)])
    got = run()  # finalizes every window ending <= 11:00

    assert (t(2024, 1, 2, 10, 0), 2) in got          # seeded window intact
    assert all(ws != t(2024, 1, 1, 0, 0) for ws, _ in got), (
        f"late rows created a window: {got}"
    )


def test_q_i5_contract_drops_late_clones(spark, sf_dir):
    """q_i5_late_drop: every finalized window the stream emits carries
    the ON-TIME count — the 10 late clones batch 1 re-delivers must not
    inflate any window (the batch twin without a watermark would show
    +10 across the earliest windows)."""
    from jane_spark.contracts import REGISTRY
    from jane_spark.engine.catalog import Catalog

    got = {
        (r["window_start"], r["n"])
        for r in REGISTRY["q_i5_late_drop"].spark_fn(spark, sf_dir).collect()
    }
    assert got, "stream emitted no finalized windows"
    ev = Catalog(spark, sf_dir).events
    want = {
        (r["window_start"], r["n"])
        for r in ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").cast("timestamp_ntz").alias("window_start"), "n")
        .collect()
    }
    # emitted ⊆ on-time batch counts (append mode holds back the tail
    # windows the final watermark has not passed)
    assert got <= want, f"stream windows diverge from on-time counts: {got - want}"
    first_ws = min(ws for ws, _ in want)
    assert first_ws in {ws for ws, _ in got}, "earliest window never finalized"


def test_waveform_stream_ingest_incremental(spark, tmp_path):
    """§3.3 end-to-end: waveform files arrive → parsed trace index rows
    land in the store; a second arrival is processed incrementally
    (checkpoint skips already-ingested files)."""
    from jane_spark.sources.index_store import IndexStore
    from jane_spark.sources.waveform_format import write_record
    from jane_spark.streaming.ingest import stream_waveform_dir
    from jane_spark.streaming.upsert import start_index_upsert_stream

    arrivals = tmp_path / "arrivals"
    arrivals.mkdir()
    store = IndexStore(spark, str(tmp_path / "store"))
    ckpt = str(tmp_path / "ckpt")

    def drop_file(name, station, n_traces):
        blobs = [
            write_record("BW", station, "", "EHZ",
                         1_700_000_000_000_000 + t * 10**9, 100.0, [1, 2, 3])
            for t in range(n_traces)
        ]
        (arrivals / name).write_bytes(b"".join(blobs))

    def ingest():
        q = start_index_upsert_stream(
            stream_waveform_dir(spark, str(arrivals)),
            store, "trace", ckpt, doc_id_col="path",
        )
        q.awaitTermination()

    drop_file("a.jsw", "ST1", 3)
    ingest()
    assert store.index("trace").count() == 3

    drop_file("b.jsw", "ST2", 2)
    ingest()
    idx = store.index("trace")
    assert idx.count() == 5
    assert {r["station"] for r in idx.collect()} == {"ST1", "ST2"}


def test_stream_quality_gate_equals_batch(spark, sf_dir):
    """q_i8's streamed quality gate must produce exactly the batch
    result of the same transform on the same parquet input."""
    from jane_spark.contracts import REGISTRY
    from jane_spark.contracts.streaming import _quality_gate

    streamed = {
        (r["split"], r["n_docs"])
        for r in REGISTRY["q_i8_stream_quality_gate"].spark_fn(spark, sf_dir).collect()
    }
    batch = {
        (r["split"], r["n_docs"])
        for r in _quality_gate(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
        ).collect()
    }
    assert streamed == batch and len(batch) == 3


def test_stream_stream_join_equals_batch(spark, sf_dir, tmp_path):
    """I9: the real two-stream watermarked interval join under an
    availableNow trigger must emit exactly the batch join's rows."""
    import shutil

    from jane_spark.contracts.streaming import _ts_ntz
    from jane_spark.streaming.ingest import run_available_now, stream_parquet_dir
    from jane_spark.streaming.joins import correlate_within

    src = f"{sf_dir}/events.parquet"
    p_dir, c_dir = tmp_path / "purchases", tmp_path / "clicks"
    p_dir.mkdir(), c_dir.mkdir()
    shutil.copy(src, p_dir / "events.parquet")
    shutil.copy(src, c_dir / "events.parquet")

    raw_schema = spark.read.parquet(src).schema

    def purchases(df):
        return _ts_ntz(df).filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )

    def clicks(df):
        return _ts_ntz(df).filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )

    c_stream = clicks(stream_parquet_dir(spark, str(c_dir), raw_schema))

    def transform(p_stream_raw):
        return correlate_within(
            purchases(p_stream_raw), c_stream,
            "p_user", "c_user", "p_ts", "c_ts",
            lookback="72 hours", watermark="1 hour",
        ).select("purchase_id", "click_id", "p_ts", "c_ts")

    streamed = run_available_now(
        stream_parquet_dir(spark, str(p_dir), raw_schema),
        transform,
        "q_i9_sink",
    )
    ev = _ts_ntz(spark.read.parquet(src))
    batch = correlate_within(
        purchases(ev), clicks(ev),
        "p_user", "c_user", "p_ts", "c_ts", lookback="72 hours",
    ).select("purchase_id", "click_id", "p_ts", "c_ts")

    s_rows = {tuple(r) for r in streamed.collect()}
    b_rows = {tuple(r) for r in batch.collect()}
    assert s_rows == b_rows
    assert len(b_rows) > 0


def test_stream_stream_left_outer_null_emission(spark, tmp_path):
    """I9 outer semantics: an unmatched LEFT row emits its null match
    only once the watermark proves no future right row can join it —
    a recent unmatched row is withheld (state still open). This is the
    documented stream/batch divergence for outer joins; the inner join
    is the stream≡batch contract."""
    import datetime as dt

    from jane_spark.streaming.ingest import run_available_now, stream_parquet_dir
    from jane_spark.streaming.joins import correlate_within

    base = dt.datetime(2024, 1, 1)
    p_dir, c_dir = tmp_path / "p", tmp_path / "c"
    purchases = spark.createDataFrame(
        [
            (101, 1, base + dt.timedelta(hours=1)),    # old, unmatched
            (102, 2, base + dt.timedelta(hours=23, minutes=59)),  # recent
        ],
        "purchase_id long, p_user long, p_ts timestamp_ntz",
    )
    clicks = spark.createDataFrame(
        [(201, 99, base + dt.timedelta(hours=24))],  # drives the watermark
        "click_id long, c_user long, c_ts timestamp_ntz",
    )
    purchases.write.parquet(str(p_dir))
    clicks.write.parquet(str(c_dir))

    c_stream = stream_parquet_dir(spark, str(c_dir), clicks.schema)

    def transform(p_stream):
        return correlate_within(
            p_stream, c_stream, "p_user", "c_user", "p_ts", "c_ts",
            lookback="1 hour", watermark="30 minutes", how="left",
        ).select("purchase_id", "click_id")

    out = run_available_now(
        stream_parquet_dir(spark, str(p_dir), purchases.schema),
        transform,
        "q_i9_outer_sink",
    ).collect()
    got = {r.purchase_id: r.click_id for r in out}
    # the old unmatched purchase is finalized: emitted with NULL match
    assert got.get(101, "absent") is None
    # the recent one is still inside the watermark horizon: withheld
    assert 102 not in got


def test_two_batch_checkpoint_state_recovery(spark, sf_dir):
    """q_j5_two_batch's core claim, pinned directly: run 2 RESUMES the
    per-key open-segment state from run 1's checkpoint — so at least
    one batch-2 emission must be a segment whose start lies BEFORE
    the split timestamp while its end lies after (impossible without
    recovered state: batch 2 only ever sees post-cut rows), and the
    union of both batches' emissions contains every full-timeline
    closed segment exactly once."""
    from jane_spark.contracts.registry import REGISTRY

    out = REGISTRY["q_j5_two_batch"].spark_fn(spark, sf_dir).collect()
    cut_us = 1705363200000000  # 2024-01-16 00:00:00 UTC in epoch µs
    # On this fixture every cross-boundary time gap exceeds the 1800 s
    # tolerance (events are hours apart), so recovery manifests as the
    # CLOSURE witness: the pre-cut open segment (emitted closed=false
    # in batch 1) must re-appear with IDENTICAL (key, start, end, n)
    # and closed=true — batch 2 only sees post-cut rows, so those
    # values can only come from the recovered checkpoint state.
    open_b1 = {
        (r.key, r.seg_start_us, r.seg_end_us, r.n_events)
        for r in out
        if not r.closed and r.seg_end_us < cut_us
    }
    closed_b2 = {
        (r.key, r.seg_start_us, r.seg_end_us, r.n_events)
        for r in out
        if r.closed and r.seg_end_us < cut_us
    }
    recovered = open_b1 & closed_b2
    assert recovered, "no pre-cut open segment re-closed in batch 2"
    # and the final open segment per key lives in post-cut time
    finals = [r for r in out if not r.closed and r.seg_end_us >= cut_us]
    assert finals


def test_event_time_timeout_flush(spark, sf_dir):
    """q_j5_event_timeout's core claims, pinned directly: (1) idle
    keys (no post-cut data) get their open segment flushed
    closed=true by the WATERMARK — there is no data emission that
    could have closed it; (2) every flush row's gap horizon is <=
    the final watermark (ms floor); (3) at stream end, a key's
    final open segment appears closed=false from the data batch AND
    closed=true from the sweep when eligible — the re-emission pair
    the law predicts."""
    from jane_spark.contracts.registry import REGISTRY

    out = REGISTRY["q_j5_event_timeout"].spark_fn(spark, sf_dir).collect()
    cut_us = 1705363200000000
    gap_us = 1800 * 1_000_000
    max_us = max(r.seg_end_us for r in out)
    # keys with no post-cut rows: every one of their closed=true rows
    # whose end precedes the cut must obey the horizon rule
    flushes = [r for r in out if r.closed and r.seg_end_us < cut_us]
    assert flushes
    for r in flushes:
        assert (r.seg_end_us + gap_us) // 1000 <= max_us // 1000, r
    # idle-key witness: a pre-cut OPEN emission (closed=false) whose
    # exact values re-appear closed=true — watermark did that, data
    # could not (idle keys have no batch-2 data)
    opens = {
        (r.key, r.seg_start_us, r.seg_end_us, r.n_events)
        for r in out
        if not r.closed and r.seg_end_us < cut_us
    }
    closed = {
        (r.key, r.seg_start_us, r.seg_end_us, r.n_events)
        for r in out
        if r.closed and r.seg_end_us < cut_us
    }
    assert opens & closed
    # keys % 20 == 10 never appear in post-cut data emissions
    post_data = [
        r for r in out
        if not r.closed and r.seg_end_us >= cut_us and r.key % 20 == 10
    ]
    assert not post_data


def test_event_time_timeout_watermark_clamp():
    """ADVICE r13: a key whose gap horizon (seg_end + gap) falls at or
    below the current watermark must have its timeout CLAMPED to
    watermark+1 — an unclamped setTimeoutTimestamp raises 'Timeout
    timestamp cannot be earlier than the current watermark' inside
    GroupState and kills the whole query, not just the key. Pinned at
    the tracker-function level with a recording GroupState double
    (the engine path is pinned separately below: Spark 4.1.2 filters
    late input rows before applyInPandasWithState, so the horizon
    normally clears the watermark — the clamp guards the recovered-
    state / equal-boundary edges)."""
    import pandas as pd

    from jane_spark.streaming.state import make_segment_tracker

    class FakeState:
        hasTimedOut = False

        def __init__(self, wm_ms):
            self._wm = wm_ms
            self.exists = False
            self.timeout_ms = None

        def update(self, v):
            self.exists = True
            self._v = v

        @property
        def get(self):
            return self._v

        def setTimeoutTimestamp(self, ms):
            # the real GroupState raises here when ms <= watermark —
            # replicate the engine contract so a regression fails loudly
            assert ms > self._wm, (ms, self._wm)
            self.timeout_ms = ms

        def getCurrentWatermarkMs(self):
            return self._wm

    track = make_segment_tracker(1800.0, event_time_timeout=True)
    pdf = pd.DataFrame(
        {"ts": pd.to_datetime(["2024-01-10 00:00:00"], utc=True)}
    )
    seg_end_ms = 1704844800000  # 2024-01-10 epoch ms
    # watermark 10 days ahead of the straggler's horizon
    wm = seg_end_ms + 10 * 86_400_000
    st = FakeState(wm)
    out = list(track((2,), iter([pdf]), st))
    assert st.timeout_ms == wm + 1  # clamped, not seg_end+gap
    assert len(out) == 1 and not out[0]["closed"].iloc[0]
    # and when the horizon clears the watermark it is used verbatim
    st2 = FakeState(seg_end_ms - 86_400_000)
    list(track((3,), iter([pdf]), st2))
    assert st2.timeout_ms == seg_end_ms + 1800 * 1000


def test_event_time_timeout_late_rows_dropped(spark, tmp_path):
    """Engine-semantics pin for the clamp's context: with a 0 s
    watermark, input rows that fall behind the recovered watermark
    are FILTERED before applyInPandasWithState (Spark 4.1.2), so a
    straggler key fed only late rows produces no state and no
    emission — and critically the query COMPLETES rather than
    crashing on a timeout-below-watermark."""
    import os

    from jane_spark.streaming.ingest import stream_parquet_dir
    from jane_spark.streaming.state import open_segments_stream

    arrival = str(tmp_path / "arrival")
    os.makedirs(arrival)
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def rows(key, ts_list):
        return spark.createDataFrame(
            [(key, t) for t in ts_list], "user_id bigint, ts string"
        ).select(
            "user_id", F.col("ts").cast("timestamp_ntz").alias("ts")
        )

    batches = [
        rows(1, ["2024-01-20 00:00:00", "2024-01-20 00:10:00"]),
        # straggler key: 10 days behind the recovered watermark
        rows(2, ["2024-01-10 00:00:00"]),
    ]

    def to_sink(batch_df, _batch_id):
        batch_df.write.mode("append").parquet(sink)

    for part in batches:
        part.coalesce(1).write.mode("append").parquet(arrival)
        schema = spark.read.parquet(arrival).schema
        stream = stream_parquet_dir(spark, arrival, schema)
        q = (
            open_segments_stream(
                stream, "user_id", "ts", gap_seconds=1800,
                event_time_timeout=True,
            )
            .writeStream.foreachBatch(to_sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    out = spark.read.parquet(sink).collect()
    assert not [r for r in out if r.key == 2]  # late rows filtered
    assert any(r.key == 1 for r in out)
