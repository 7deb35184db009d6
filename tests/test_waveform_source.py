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


def test_waveform_datasource_bad_magic(spark, tmp_path):
    import pytest

    from jane_spark.sources.waveform_datasource import register

    (tmp_path / "junk.jsw").write_bytes(b"NOPE" + bytes(64))
    register(spark)
    df = spark.read.format("waveform").load(str(tmp_path))
    with pytest.raises(Exception, match="bad magic"):
        df.collect()
