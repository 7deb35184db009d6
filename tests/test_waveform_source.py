"""Spark 4 Python Data Source for the synthetic waveform format (A1)."""

from __future__ import annotations

import datetime as dt


def _write_fixture_files(tmp_path, n_files=3, traces_per_file=4):
    from jane_spark.sources.waveform_format import write_record

    base_us = int(dt.datetime(2024, 1, 1).timestamp() * 1_000_000)
    paths = []
    for fi in range(n_files):
        blobs = []
        for ti in range(traces_per_file):
            start = base_us + (fi * traces_per_file + ti) * 3_600_000_000
            samples = [(fi * 100 + ti * 10 + s) % 1000 for s in range(50)]
            blobs.append(
                write_record("BW", f"ST{fi}", "", "EHZ", start, 100.0, samples)
            )
        p = tmp_path / f"wf_{fi}.jsw"
        p.write_bytes(b"".join(blobs))
        paths.append(str(p))
    return paths


def test_roundtrip_codec(tmp_path):
    from jane_spark.sources.waveform_format import read_records, write_record

    rec = write_record("BW", "ALTM", "10", "EHZ", 123_000_000, 200.0, [1, -2, 3])
    got = list(read_records(rec * 2))
    assert len(got) == 2
    assert got[0]["station"] == "ALTM" and got[0]["location"] == "10"
    assert got[0]["samples"] == [1, -2, 3]
    assert got[1]["pos"] == len(rec)
    # end = start + npts/rate
    assert got[0]["end_us"] == 123_000_000 + int(3 / 200.0 * 1_000_000)


def test_waveform_datasource_reads_directory(spark, tmp_path):
    from jane_spark.sources.waveform_datasource import register

    _write_fixture_files(tmp_path)
    register(spark)
    df = spark.read.format("waveform").load(str(tmp_path))
    rows = df.collect()
    assert len(rows) == 12  # 3 files x 4 traces
    assert {r["station"] for r in rows} == {"ST0", "ST1", "ST2"}
    assert all(r["npts"] == 50 and len(r["samples"]) == 50 for r in rows)
    # files became separate partitions
    assert df.rdd.getNumPartitions() == 3
    # projection without samples still works
    small = df.select("network", "station", "start_us").collect()
    assert len(small) == 12


def test_waveform_datasource_mixed_formats(spark, tmp_path):
    """The Data Source sniffs per file: one directory mixing JSW1, SAC,
    MiniSEED v2/v3 and GSE2 scans into one uniform index with float
    samples widened losslessly from the integer codecs."""
    from jane_spark.sources.seismic_formats import (
        write_gse2, write_mseed, write_mseed3, write_sac,
    )
    from jane_spark.sources.waveform_datasource import register
    from jane_spark.sources.waveform_format import write_record

    t0 = 1_704_067_200_000_000
    (tmp_path / "a.jsw").write_bytes(
        write_record("BW", "ALTM", "", "EHZ", t0, 100.0, [1, 2, 3]))
    (tmp_path / "b.sac").write_bytes(
        write_sac("GR", "FUR", "", "BHZ", t0, 20.0, [1.5, -2.5]))
    (tmp_path / "c.mseed").write_bytes(
        write_mseed("IU", "ANMO", "00", "BHZ", t0, 20.0, [7, 8, 9]))
    (tmp_path / "d.ms3").write_bytes(
        write_mseed3("II", "AAK", "10", "BHZ", t0, 40.0, [4, 5]))
    (tmp_path / "e.gse").write_bytes(
        write_gse2("NO", "KONO", "", "LHZ", t0, 1.0, [10, 20]))
    register(spark)
    rows = spark.read.format("waveform").load(str(tmp_path)).collect()
    by_net = {r["network"]: r for r in rows}
    assert set(by_net) == {"BW", "GR", "IU", "II", "NO"}
    assert list(by_net["BW"]["samples"]) == [1.0, 2.0, 3.0]
    assert list(by_net["GR"]["samples"]) == [1.5, -2.5]
    assert list(by_net["NO"]["samples"]) == [10.0, 20.0]
    assert by_net["II"]["location"] == "10"


def test_waveform_datasource_bad_magic(spark, tmp_path):
    import pytest

    from jane_spark.sources.waveform_datasource import register

    (tmp_path / "junk.jsw").write_bytes(b"NOPE" + bytes(700))
    register(spark)
    df = spark.read.format("waveform").load(str(tmp_path))
    with pytest.raises(Exception, match="unrecognized waveform format"):
        df.collect()


def test_dataselect_end_to_end_cut(spark, tmp_path):
    """Full §3.2 lifecycle on real bytes: index files via the data
    source, resolve a request window via dataselect_query, cut at the
    stored offsets, round-trip the re-encoded payload."""
    from pyspark.sql import functions as F

    from jane_spark.services.fdsnws import dataselect_query
    from jane_spark.services.waveform_cut import cut_waveforms
    from jane_spark.sources.waveform_datasource import register
    from jane_spark.sources.waveform_format import read_records

    _write_fixture_files(tmp_path)  # traces start 2024-01-01, hourly, 50 @ 100 Hz
    register(spark)
    scanned = spark.read.format("waveform").load(str(tmp_path))
    index = scanned.select(
        "path", "network", "station", "location", "channel",
        F.timestamp_micros(F.col("start_us")).cast("timestamp_ntz").alias("starttime"),
        F.timestamp_micros(F.col("end_us")).cast("timestamp_ntz").alias("endtime"),
        "sampling_rate", "npts", "quality", "pos",
        (F.col("end_us") - F.col("start_us")).cast("double").alias("duration"),
    )
    # request: 0.25 s into the first trace of file 0, to its end
    cut_plan = dataselect_query(
        index,
        {
            "station": "ST0",
            "starttime": "2024-01-01T00:00:00.250000",
            "endtime": "2024-01-01T01:00:00",
        },
    )
    got = cut_waveforms(cut_plan, reencode=True).collect()
    assert len(got) == 1
    seg = got[0]
    # 50 samples @100 Hz = 0.49 s span; cutting from 0.25 s keeps
    # samples 25..49 (ceil(0.25s * 100Hz) = 25)
    assert seg["npts"] == 25
    assert seg["start_us"] == 1_704_067_200_000_000 + 250_000
    # payload round-trips through the codec with identical samples
    back = list(read_records(bytes(seg["payload"])))
    assert len(back) == 1 and back[0]["samples"] == list(seg["samples"])
    assert back[0]["start_us"] == seg["start_us"]


def test_cut_multiformat_sources_and_output_codec(spark, tmp_path):
    """The cut phase is format-sniffing on the read side (a MiniSEED v2
    archive cuts through the same path as JSW1) and format-dispatched
    on the write side: out_format='same' re-encodes MiniSEED from a
    MiniSEED source; out_format='mseed3' serves v3 from the v2 source."""
    import numpy as np
    from pyspark.sql import functions as F

    from jane_spark.services.waveform_cut import cut_waveforms
    from jane_spark.sources.ingest import parse_waveform_files, scan_files
    from jane_spark.sources.seismic_formats import (
        read_mseed, read_mseed3, write_mseed,
    )

    t0 = 1_704_067_200_000_000  # 2024-01-01 UTC
    series = np.cumsum(np.arange(200) % 17).tolist()
    (tmp_path / "a.mseed").write_bytes(
        write_mseed("BW", "MANZ", "", "BHZ", t0, 100.0, series, quality="R")
    )
    idx = parse_waveform_files(scan_files(spark, str(tmp_path)))
    first = idx.orderBy("start_us").limit(1).select(
        "path", "pos",
        F.timestamp_micros(F.col("start_us") + 250_000)
        .cast("timestamp_ntz").alias("cut_start"),
        F.timestamp_micros(F.col("end_us")).cast("timestamp_ntz").alias("cut_end"),
    )
    seg = cut_waveforms(first, reencode=True).collect()[0]
    rec0 = next(read_mseed(write_mseed("BW", "MANZ", "", "BHZ", t0, 100.0, series)))
    want = rec0["samples"][25:]  # cut 0.25 s into a 100 Hz record
    assert [int(v) for v in seg["samples"]] == want
    assert seg["start_us"] == t0 + 250_000 and seg["quality"] == "R"
    back = next(read_mseed(bytes(seg["payload"])))  # same-format response
    assert back["samples"] == want and back["quality"] == "R"
    # cross-format response: v3 out of the v2 archive
    seg3 = cut_waveforms(first, reencode=True, out_format="mseed3").collect()[0]
    back3 = next(read_mseed3(bytes(seg3["payload"])))
    assert back3["samples"] == want
    assert back3["start_us"] == t0 + 250_000


def test_dataselect_response_stream(spark, tmp_path):
    """End-to-end service response: mixed-format archive in, one
    ordered concatenated-MiniSEED byte stream out, assembled without
    collect() (toLocalIterator), ACL-gated."""
    import numpy as np
    from pyspark.sql import functions as F

    from jane_spark.services.waveform_cut import dataselect_response
    from jane_spark.sources.ingest import parse_waveform_files, scan_files
    from jane_spark.sources.seismic_formats import read_mseed, write_mseed

    t0 = 1_704_067_200_000_000
    s1 = np.cumsum(np.arange(100) % 7).tolist()
    s2 = [v + 1 for v in s1]
    (tmp_path / "a.mseed").write_bytes(
        write_mseed("BW", "ALTM", "", "EHZ", t0, 100.0, s1)
    )
    (tmp_path / "b.mseed").write_bytes(
        write_mseed("BW", "MANZ", "", "BHZ", t0, 100.0, s2)
    )
    idx = parse_waveform_files(scan_files(spark, str(tmp_path))).select(
        "*",
        F.timestamp_micros(F.col("start_us")).cast("timestamp_ntz").alias("starttime"),
        F.timestamp_micros(F.col("end_us")).cast("timestamp_ntz").alias("endtime"),
        ((F.col("end_us") - F.col("start_us")) / 1e6).alias("duration"),
    )
    chunks = list(dataselect_response(idx, {"network": "BW"}))
    recs = list(read_mseed(b"".join(chunks)))
    assert [(r["station"], r["samples"]) for r in recs] == [
        ("ALTM", s1), ("MANZ", s2),
    ]
    # ACL: restrict MANZ, anonymous user gets only ALTM
    gated = idx.withColumn("restricted", F.col("station") == "MANZ")
    acl = spark.createDataFrame(
        [], "network string, station string, location string, channel string"
    )
    got = list(read_mseed(b"".join(dataselect_response(gated, {"network": "BW"}, acl=acl))))
    assert [r["station"] for r in got] == ["ALTM"]


def test_cut_window_misses_all_samples(spark, tmp_path):
    from pyspark.sql import functions as F

    from jane_spark.services.waveform_cut import cut_waveforms
    from jane_spark.sources.waveform_datasource import register

    _write_fixture_files(tmp_path)
    register(spark)
    scanned = spark.read.format("waveform").load(str(tmp_path))
    # cut window entirely after every sample of the chosen record
    plan = scanned.filter("station = 'ST1'").limit(1).select(
        "path", "pos",
        F.timestamp_micros(F.col("end_us") + 1_000_000).cast("timestamp_ntz").alias("cut_start"),
        F.timestamp_micros(F.col("end_us") + 2_000_000).cast("timestamp_ntz").alias("cut_end"),
    )
    assert cut_waveforms(plan).count() == 0


def test_binaryfile_parse_matches_datasource(spark, tmp_path):
    """The mapInPandas ingest path and the data source produce the same
    index rows from the same files (minus the samples column)."""
    from jane_spark.sources.ingest import parse_waveform_files, scan_files
    from jane_spark.sources.waveform_datasource import register

    _write_fixture_files(tmp_path)
    register(spark)
    via_ds = {
        tuple(r)
        for r in spark.read.format("waveform")
        .load(str(tmp_path))
        .select("path", "network", "station", "start_us", "npts", "pos")
        .collect()
    }
    via_ingest = {
        # binaryFile paths are file: URIs; the data source uses raw paths
        (r["path"].removeprefix("file:"), *tuple(r)[1:])
        for r in parse_waveform_files(scan_files(spark, str(tmp_path)))
        .select("path", "network", "station", "start_us", "npts", "pos")
        .collect()
    }
    assert via_ds == via_ingest and len(via_ds) == 12


def test_trace_previews_match_numpy(spark, tmp_path):
    """Preview min/max blocks equal a numpy reference on real traces."""
    import numpy as np

    from jane_spark.services.waveform_cut import trace_previews
    from jane_spark.sources.waveform_datasource import register

    _write_fixture_files(tmp_path)  # 50 samples @ 100 Hz per trace
    register(spark)
    traces = spark.read.format("waveform").load(str(tmp_path))
    # 0.1 s blocks -> 10 samples per block, 5 blocks per trace
    got = trace_previews(traces, seconds_per_block=0.1).collect()
    assert len(got) == 12 * 5
    raw = traces.select("station", "start_us", "samples").collect()
    want = {}
    for r in raw:
        s = np.array(r["samples"])
        for b in range(5):
            blk = s[b * 10 : (b + 1) * 10]
            want[(r["station"], r["start_us"] + b * 100_000)] = (blk.min(), blk.max())
    for r in got:
        w = want[(r["station"], r["block_start_us"])]
        assert (r["pmin"], r["pmax"]) == w


def test_block_minmax_column_api(spark):
    from pyspark.sql import functions as F

    from jane_spark.functions.arrays import block_minmax

    df = spark.createDataFrame([(1, list(range(10)))], ["id", "s"])
    out = df.select(block_minmax(F.col("s"), 4).alias("p")).first()["p"]
    assert [(b["pmin"], b["pmax"]) for b in out] == [(0, 3), (4, 7), (8, 9)]
