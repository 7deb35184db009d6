"""Reference-shaped fixture generators (FIXTURES.md §B).

Small deterministic DataFrames mirroring jane's entities for the
engine's own unit/golden tests: channel epochs (stationxml analogue),
event catalog (quakeml analogue), waveform trace index
(ContinuousTrace analogue), and before/after filesystem snapshots.
Seeds fixed; shapes include every edge the tests need — wildcardable
ids, open/overlapping epochs, duplicate epochs across source docs,
non-public events, magnitude ties, gaps/overlaps, blank-vs-coded
location codes, quality codes.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from jane_spark.plans.schema import QUAKEML_META, STATIONXML_META, TRACE_META, meta_to_schema


def _t(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def channel_index(spark: SparkSession) -> DataFrame:
    """One row per channel epoch. doc 1 and doc 2 both carry the BW.ALTM
    epochs (duplicate epochs across two source documents — union-dedup
    G1); GR.FUR has an open end_date; IU.ANMO has no waveform coverage
    (C5 semi-join must drop it). IU.ANMO.10.BHZ carries a full 3-stage
    instrument response (PolesZeros → Coefficients → gain-only);
    IU.ANMO.00.BHZ a single PolesZeros stage; the rest total-sensitivity
    only (NULL stages). IU.ANMO.00.BHZ is the restricted channel (B12);
    in trace_index the BW.MANZ..BHZ segments are restricted."""
    anmo10_stages = [
        (1, "PolesZeros", 1500.0, 0.05, "M/S", "V",
         "-0.037:0.037;-0.037:-0.037;-502.65:0.0", "0.0:0.0;0.0:0.0"),
        (2, "Coefficients", 419430.0, 0.0, "V", "COUNTS", "", ""),
        (3, "Gain", 1.0, 0.0, "COUNTS", "COUNTS", None, None),
    ]
    anmo00_stages = [
        (1, "PolesZeros", 2000.0, 0.05, "M/S", "V",
         "-0.0123:0.0123;-0.0123:-0.0123", "0.0:0.0"),
    ]
    rows = [
        # net, sta, loc, cha, lat, lon, elev, depth, start, end, rate,
        # sensor, sens, sensfreq, units, response_stages
        ("BW", "ALTM", "", "EHE", 48.995, 12.207, 430.0, 0.0,
         _t("2010-01-01T00:00:00"), _t("2015-06-30T00:00:00"), 200.0,
         "Streckeisen STS-2", 6.0e8, 1.0, "M/S", None, False),
        ("BW", "ALTM", "", "EHN", 48.995, 12.207, 430.0, 0.0,
         _t("2010-01-01T00:00:00"), _t("2015-06-30T00:00:00"), 200.0,
         "Streckeisen STS-2", 6.0e8, 1.0, "M/S", None, False),
        ("BW", "ALTM", "", "EHZ", 48.995, 12.207, 430.0, 0.0,
         _t("2015-06-30T00:00:00"), None, 200.0,
         "Streckeisen STS-2", 6.1e8, 1.0, "M/S", None, False),
        ("BW", "MANZ", "", "BHZ", 49.986, 12.108, 635.0, 0.0,
         _t("2005-03-01T00:00:00"), None, 20.0,
         "Lennartz LE-3D", 4.0e8, 1.0, "M/S", None, False),
        ("GR", "FUR", "", "BHZ", 48.163, 11.275, 565.0, 3.0,
         _t("2001-01-01T00:00:00"), None, 20.0,
         "Streckeisen STS-2", 5.9e8, 0.02, "M/S", None, False),
        ("GR", "FUR", "", "LHZ", 48.163, 11.275, 565.0, 3.0,
         _t("2001-01-01T00:00:00"), None, 1.0,
         "Streckeisen STS-2", 5.9e8, 0.02, "M/S", None, False),
        ("IU", "ANMO", "00", "BHZ", 34.946, -106.457, 1850.0, 100.0,
         _t("1998-07-01T00:00:00"), _t("2010-01-01T00:00:00"), 20.0,
         "Geotech KS-54000", 8.6e8, 0.05, "M/S", anmo00_stages, True),
        ("IU", "ANMO", "10", "BHZ", 34.946, -106.457, 1850.0, 5.0,
         _t("2010-01-01T00:00:00"), None, 40.0,
         "Nanometrics T-240", 1.2e9, 0.05, "M/S", anmo10_stages, False),
    ]
    schema = meta_to_schema(STATIONXML_META, include_geometry=False, include_extra=False)
    return spark.createDataFrame(rows, schema)


def event_index(spark: SparkSession) -> DataFrame:
    """One row per event. Includes non-public rows (B12) and an exact
    magnitude tie (orderby determinism F1)."""
    rows = [
        ("quakeml:eu/ev001", 46.3, 13.6, 11000.0, _t("2023-01-05T01:02:03.500000"),
         4.1, "ML", "EMSC", "auto", True, "automatic", "earthquake", False, False,
         None, None, None, _t("2023-01-06T00:00:00")),
        ("quakeml:eu/ev002", 45.9, 26.6, 140000.0, _t("2023-02-10T04:05:06"),
         5.5, "Mw", "EMSC", "rev", True, "manual", "earthquake", True, True,
         235.0, 40.0, 95.0, _t("2023-02-20T12:00:00")),   # thrust
        ("quakeml:eu/ev003", 38.1, 15.0, 9000.0, _t("2023-03-15T07:08:09"),
         5.5, "Mw", "INGV", "rev", True, "manual", "earthquake", True, False,
         10.0, 88.0, -5.0, _t("2023-03-16T00:00:00")),    # strike-slip
        ("quakeml:eu/ev004", 63.6, -19.6, 2000.0, _t("2023-04-20T10:11:12"),
         3.2, "ML", "IMO", "auto", False, "automatic", "volcanic eruption", False, False,
         None, None, None, _t("2023-04-21T00:00:00")),
        ("quakeml:eu/ev005", 35.5, 139.8, 35000.0, _t("2023-05-25T13:14:15"),
         6.8, "Mw", "NIED", "rev", True, "manual", "earthquake", True, True,
         None, None, None, _t("2023-07-01T09:00:00")),    # mechanism flagged but no derived planes; late re-review
        ("quakeml:eu/ev006", -21.2, -68.9, 110000.0, _t("2023-06-30T16:17:18"),
         2.9, "ML", "CSN", "auto", False, "automatic", "quarry blast", False, False,
         None, None, None, _t("2023-06-30T17:00:00")),
    ]
    schema = meta_to_schema(QUAKEML_META, include_geometry=False, include_extra=False)
    return spark.createDataFrame(rows, schema)


def trace_index(spark: SparkSession) -> DataFrame:
    """Waveform index segments. BW.ALTM..EHE has a mid-day gap (D6/I4);
    BW.MANZ..BHZ has two overlapping segments in different files;
    locations cover '' and '00' (H10); qualities D/R/Q/M."""
    day = "2023-01-01"
    rows = [
        ("BW", "ALTM", "", "EHE", _t(f"{day}T00:00:00"), _t(f"{day}T06:00:00"),
         200.0, 4320000, 21600.0, "D", 1, 0, False),
        ("BW", "ALTM", "", "EHE", _t(f"{day}T08:00:00"), _t(f"{day}T23:59:59"),
         200.0, 11519800, 57599.0, "D", 1, 1, False),
        ("BW", "ALTM", "", "EHZ", _t(f"{day}T00:00:00"), _t(f"{day}T23:59:59"),
         200.0, 17279800, 86399.0, "D", 2, 0, False),
        ("BW", "MANZ", "", "BHZ", _t(f"{day}T00:00:00"), _t(f"{day}T12:30:00"),
         20.0, 900000, 45000.0, "D", 3, 0, True),
        ("BW", "MANZ", "", "BHZ", _t(f"{day}T12:00:00"), _t(f"{day}T23:59:59"),
         20.0, 863980, 43199.0, "R", 4, 0, True),
        ("GR", "FUR", "", "BHZ", _t(f"{day}T00:00:00"), _t(f"{day}T23:59:59"),
         20.0, 1727980, 86399.0, "Q", 5, 0, False),
        ("GR", "FUR", "", "LHZ", _t(f"{day}T03:00:00"), _t(f"{day}T04:00:00"),
         1.0, 3600, 3600.0, "M", 6, 0, False),
    ]
    schema = meta_to_schema(TRACE_META, include_geometry=False, include_extra=False)
    return spark.createDataFrame(rows, schema)


def fs_snapshots(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    """(before, after) filesystem listings: after adds f4, touches f2
    (mtime bump), deletes f3 (A9/C6 delta + G3 except)."""
    cols = ["path", "name", "size", "mtime", "format"]
    before = spark.createDataFrame(
        [
            ("/data/f1.mseed", "f1.mseed", 1000, _t("2023-01-01T00:00:00"), "MSEED"),
            ("/data/f2.mseed", "f2.mseed", 2000, _t("2023-01-01T00:00:00"), "MSEED"),
            ("/data/f3.mseed", "f3.mseed", 3000, _t("2023-01-01T00:00:00"), "MSEED"),
        ],
        cols,
    )
    after = spark.createDataFrame(
        [
            ("/data/f1.mseed", "f1.mseed", 1000, _t("2023-01-01T00:00:00"), "MSEED"),
            ("/data/f2.mseed", "f2.mseed", 2048, _t("2023-02-01T00:00:00"), "MSEED"),
            ("/data/f4.mseed", "f4.mseed", 4000, _t("2023-02-01T00:00:00"), "MSEED"),
        ],
        cols,
    )
    return before, after
