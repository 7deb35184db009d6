"""Golden tests for the FDSN web-service analogues over the reference-
shaped fixtures (SURVEY.md §5.2.3 — mirrors jane's golden-XML habit with
golden row sets / text lines)."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from jane_spark.services.fdsnws import (
    availability_extent,
    dataselect_query,
    event_query,
    station_query,
    station_text,
)
from jane_spark.testing.fixtures import channel_index, event_index, trace_index


@pytest.fixture(scope="module")
def channels(spark):
    return channel_index(spark)


@pytest.fixture(scope="module")
def events(spark):
    return event_index(spark)


@pytest.fixture(scope="module")
def traces(spark):
    return trace_index(spark)


def _ids(df, *cols):
    return [tuple(r[c] for c in cols) for r in df.collect()]


# --------------------------------------------------------------- station


def test_station_wildcards(channels):
    got = _ids(
        station_query(channels, {"network": "B*", "channel": "EH?"}),
        "network", "station", "channel",
    )
    assert got == [
        ("BW", "ALTM", "EHE"),
        ("BW", "ALTM", "EHN"),
        ("BW", "ALTM", "EHZ"),
    ]


def test_station_epoch_overlap_open_end(channels):
    # window starting 2016: the 2010–2015 EHE/EHN epochs must drop,
    # open-ended epochs stay (end_date NULL = ∞)
    got = _ids(
        station_query(
            channels, {"network": "BW", "starttime": "2016-01-01T00:00:00"}
        ),
        "station", "channel",
    )
    assert got == [("ALTM", "EHZ"), ("MANZ", "BHZ")]


def test_station_edge_filters(channels):
    got = _ids(
        station_query(channels, {"startafter": "2009-01-01T00:00:00",
                                 "startbefore": "2012-01-01T00:00:00"}),
        "network", "station", "channel",
    )
    assert got == [
        ("BW", "ALTM", "EHE"),
        ("BW", "ALTM", "EHN"),
        ("IU", "ANMO", "BHZ"),
    ]


def test_station_bbox_and_radius(channels):
    boxed = station_query(
        channels,
        {"minlatitude": "48", "maxlatitude": "50",
         "minlongitude": "11", "maxlongitude": "13"},
    )
    assert {r["station"] for r in boxed.collect()} == {"ALTM", "MANZ", "FUR"}
    radial = station_query(
        channels,
        {"latitude": "48.0", "longitude": "11.0", "maxradius": "2.0"},
    )
    # MANZ is ~2.11° great-circle from (48, 11) — just outside
    assert {r["station"] for r in radial.collect()} == {"ALTM", "FUR"}


def test_station_blank_location_convention(channels):
    dashes = station_query(channels, {"location": "--"})
    assert {r["location"] for r in dashes.collect()} == {""}
    coded = station_query(channels, {"location": "00"})
    assert {r["location"] for r in coded.collect()} == {"00"}
    both = station_query(channels, {"location": "--,10"})
    assert {r["location"] for r in both.collect()} == {"", "10"}


def test_station_matchtimeseries(channels, traces):
    got = station_query(channels, {"matchtimeseries": "true"}, traces=traces)
    # IU.ANMO has no waveform coverage; BW.ALTM EHN has no traces either
    assert {(r["network"], r["station"], r["channel"]) for r in got.collect()} == {
        ("BW", "ALTM", "EHE"),
        ("BW", "ALTM", "EHZ"),
        ("BW", "MANZ", "BHZ"),
        ("GR", "FUR", "BHZ"),
        ("GR", "FUR", "LHZ"),
    }


def _grants(spark, *seed_ids):
    """ACL grants DataFrame: one row per permitted SEED id. Empty call
    = anonymous user (no grants)."""
    schema = "network string, station string, location string, channel string"
    return spark.createDataFrame(list(seed_ids), schema)


def test_station_query_acl_restricted_channel(channels, spark):
    """VERDICT r4 missing #5: IU.ANMO.00.BHZ is restricted. An
    unauthorized (anonymous) user must not see it; a user whose ACL
    grants it does; acl=None (authorization not in play) keeps the
    pre-ACL behavior."""
    from jane_spark.services.fdsnws import station_query

    params = {"network": "IU"}
    trusted = _ids(station_query(channels, params), "location", "channel")
    assert trusted == [("00", "BHZ"), ("10", "BHZ")]
    anon = station_query(channels, params, acl=_grants(spark))
    assert _ids(anon, "location", "channel") == [("10", "BHZ")]
    authed = station_query(
        channels, params, acl=_grants(spark, ("IU", "ANMO", "00", "BHZ"))
    )
    assert _ids(authed, "location", "channel") == [("00", "BHZ"), ("10", "BHZ")]
    # a grant for a different channel does not open the restricted one
    wrong = station_query(
        channels, params, acl=_grants(spark, ("IU", "ANMO", "10", "BHZ"))
    )
    assert _ids(wrong, "location", "channel") == [("10", "BHZ")]


def test_dataselect_query_acl_restricted_segments(traces, spark):
    """BW.MANZ..BHZ segments are restricted: excluded for anonymous
    users (even under longestonly, where a restricted winner must not
    shadow open segments), included with a grant."""
    from jane_spark.services.fdsnws import dataselect_query

    params = {"network": "BW"}
    anon = dataselect_query(traces, params, acl=_grants(spark))
    assert {r["station"] for r in anon.collect()} == {"ALTM"}
    authed = dataselect_query(
        traces, params, acl=_grants(spark, ("BW", "MANZ", "", "BHZ"))
    )
    assert {r["station"] for r in authed.collect()} == {"ALTM", "MANZ"}
    # acl=None: unchanged legacy behavior
    assert {r["station"] for r in dataselect_query(traces, params).collect()} == {
        "ALTM", "MANZ",
    }
    anon_longest = dataselect_query(
        traces, {"network": "BW", "longestonly": "true"}, acl=_grants(spark)
    )
    assert all(r["station"] == "ALTM" for r in anon_longest.collect())


def test_station_xml_restricted_status_attr(channels):
    """Restricted channels serialize restrictedStatus='closed'; open
    channels carry no restrictedStatus attribute."""
    from jane_spark.services.fdsnws import station_xml

    got = {r["network"]: r["xml"] for r in station_xml(channels).collect()}
    assert got["IU"].count('restrictedStatus="closed"') == 1
    assert 'restrictedStatus' not in got["GR"]


def test_station_text_golden(channels):
    lines = [
        r["line"]
        for r in station_text(
            station_query(channels, {"network": "GR", "channel": "BHZ"})
        ).collect()
    ]
    assert lines == [
        "GR|FUR||BHZ|48.163|11.275|565.0|Streckeisen STS-2|2001-01-01T00:00:00|"
    ]


def test_station_text_per_level_golden(channels):
    """FDSN text layouts differ per level (VERDICT r5 #6): station and
    network lines carry fewer columns than channel lines."""
    sta = [
        r["line"]
        for r in station_text(
            station_query(channels, {"network": "GR", "level": "station"}),
            level="station",
        ).collect()
    ]
    assert sta == ["GR|FUR|48.163|11.275|565.0|2001-01-01T00:00:00||2"]
    net = [
        r["line"]
        for r in station_text(
            station_query(channels, {"level": "network"}), level="network"
        ).collect()
    ]
    assert net == [
        "BW|2005-03-01T00:00:00||2",
        "GR|2001-01-01T00:00:00||1",
        "IU|1998-07-01T00:00:00||1",
    ]
    with pytest.raises(KeyError, match="unknown level"):
        station_text(station_query(channels, {}), level="bogus")


# ----------------------------------------------------------------- event


def test_event_magnitude_orderby_tie(events):
    got = _ids(
        event_query(events, {"minmagnitude": "5.0", "orderby": "magnitude"}),
        "quakeml_id", "magnitude",
    )
    # 6.8 first; the 5.5 tie breaks by id
    assert got == [
        ("quakeml:eu/ev005", 6.8),
        ("quakeml:eu/ev002", 5.5),
        ("quakeml:eu/ev003", 5.5),
    ]


def test_event_visibility_default(events):
    got = event_query(events, {})
    assert all(r["public"] for r in got.collect())
    everything = event_query(events, {"includerestricted": "true"})
    assert everything.count() == 6


def test_event_time_window_paging(events):
    got = _ids(
        event_query(
            events,
            {"starttime": "2023-02-01T00:00:00", "endtime": "2023-06-01T00:00:00",
             "orderby": "time-asc", "limit": "2", "offset": "1",
             "includerestricted": "true"},
        ),
        "quakeml_id",
    )
    assert got == [("quakeml:eu/ev003",), ("quakeml:eu/ev004",)]


def test_event_magnitudetype_filter(events):
    """Case-insensitive magnitude-type match, comma lists allowed."""
    got = event_query(events, {"magnitudetype": "mw"})
    assert {r["quakeml_id"] for r in got.collect()} == {
        "quakeml:eu/ev002", "quakeml:eu/ev003", "quakeml:eu/ev005",
    }
    both = event_query(
        events, {"magnitudetype": "ML,Mw", "includerestricted": "true"}
    )
    assert both.count() == 6


def test_event_catalog_contributor_filters(events):
    got = event_query(events, {"catalog": "EMSC"})
    assert {r["quakeml_id"] for r in got.collect()} == {
        "quakeml:eu/ev001", "quakeml:eu/ev002",
    }
    got = event_query(events, {"contributor": "rev"})
    assert {r["quakeml_id"] for r in got.collect()} == {
        "quakeml:eu/ev002", "quakeml:eu/ev003", "quakeml:eu/ev005",
    }
    assert event_query(events, {"catalog": "EMSC", "contributor": "auto"}).count() == 1


def test_event_updatedafter_filter(events):
    """updatedafter keys on catalog modification time, not origin time:
    ev005 (origin May, re-reviewed July) survives a late cutoff that
    drops June's ev006."""
    got = event_query(
        events, {"updatedafter": "2023-06-30T18:00:00",
                 "includerestricted": "true"}
    )
    assert {r["quakeml_id"] for r in got.collect()} == {"quakeml:eu/ev005"}


def test_event_rejects_unknown_param(events):
    with pytest.raises(KeyError, match="unknown fdsnws-event parameter"):
        event_query(events, {"magtype": "Mw"})


def test_event_type_filter(events):
    got = event_query(
        events, {"eventtype": "quarry blast,volcanic eruption",
                 "includerestricted": "true"}
    )
    assert {r["quakeml_id"] for r in got.collect()} == {
        "quakeml:eu/ev004", "quakeml:eu/ev006",
    }


# ------------------------------------------------------------ dataselect


def test_dataselect_window_and_cut_bounds(traces):
    got = dataselect_query(
        traces,
        {"network": "BW", "station": "ALTM", "channel": "EH?",
         "starttime": "2023-01-01T05:00:00", "endtime": "2023-01-01T09:00:00"},
    ).collect()
    by_seg = {(r["channel"], r["pos"]): (r["cut_start"], r["cut_end"]) for r in got}
    # EHE segment 0 trimmed at the right edge, segment 1 at the left
    assert str(by_seg[("EHE", 0)][0]) == "2023-01-01 05:00:00"
    assert str(by_seg[("EHE", 0)][1]) == "2023-01-01 06:00:00"
    assert str(by_seg[("EHE", 1)][0]) == "2023-01-01 08:00:00"
    assert str(by_seg[("EHE", 1)][1]) == "2023-01-01 09:00:00"
    # EHZ continuous segment trimmed both edges
    assert str(by_seg[("EHZ", 0)][0]) == "2023-01-01 05:00:00"
    assert str(by_seg[("EHZ", 0)][1]) == "2023-01-01 09:00:00"


def test_dataselect_longestonly(traces):
    got = dataselect_query(
        traces, {"network": "BW", "station": "MANZ", "longestonly": "true"}
    ).collect()
    assert len(got) == 1 and got[0]["file_id"] == 3  # 45000 s segment wins


def test_dataselect_quality(traces):
    got = dataselect_query(traces, {"quality": "R"}).collect()
    assert {r["file_id"] for r in got} == {4}
    all_q = dataselect_query(traces, {"quality": "B"}).collect()
    assert len(all_q) == 7


def test_availability_extent(traces):
    ext = {
        (r["network"], r["station"], r["channel"]): r
        for r in availability_extent(traces).collect()
    }
    ehe = ext[("BW", "ALTM", "EHE")]
    assert ehe["n_segments"] == 2
    assert str(ehe["earliest"]) == "2023-01-01 00:00:00"
    assert str(ehe["latest"]) == "2023-01-01 23:59:59"
    assert ehe["total_seconds"] == 79199.0


def test_availability_spans_merge_tolerance(traces):
    """fdsnws-availability query mode: ALTM.EHE has a 2 h mid-day gap —
    two spans at tolerance 0, one span once the tolerance swallows the
    gap. MANZ's overlapping segments differ in QUALITY (D/R): the FDSN
    default reports them as separate spans; merge=('quality',)
    collapses them into one."""
    from jane_spark.services.fdsnws import availability_spans

    strict = availability_spans(traces, 0.0).collect()
    by_chan = {}
    for r in strict:
        by_chan.setdefault((r["station"], r["channel"]), []).append(r)
    ehe = by_chan[("ALTM", "EHE")]
    assert len(ehe) == 2
    assert ehe[0]["span_end"] == dt.datetime(2023, 1, 1, 6, 0, 0)
    assert ehe[1]["span_start"] == dt.datetime(2023, 1, 1, 8, 0, 0)
    assert [r["n_segments"] for r in ehe] == [1, 1]
    # overlapping MANZ segments carry different quality codes → the
    # spec default keeps them apart, one span each
    manz = by_chan[("MANZ", "BHZ")]
    assert len(manz) == 2 and {r["quality"] for r in manz} == {"D", "R"}
    # merge=quality collapses the quality change into one span
    manz_m = [
        r
        for r in availability_spans(traces, 0.0, merge=("quality",)).collect()
        if r["station"] == "MANZ"
    ]
    assert len(manz_m) == 1 and manz_m[0]["n_segments"] == 2
    assert manz_m[0]["span_end"] == dt.datetime(2023, 1, 1, 23, 59, 59)
    assert "quality" not in manz_m[0].asDict()
    # a 2-hour tolerance swallows the EHE gap (same-quality segments)
    merged = availability_spans(traces, 2 * 3600.0).collect()
    ehe_m = [r for r in merged if (r["station"], r["channel"]) == ("ALTM", "EHE")]
    assert len(ehe_m) == 1 and ehe_m[0]["n_segments"] == 2
    assert ehe_m[0]["total_samples"] == 4320000 + 11519800


def test_availability_query_front_door(traces):
    """GET-param surface: wildcards + quality list + window trim +
    mergegaps + extent mode + reject-unknown."""
    from jane_spark.services.fdsnws import availability_query

    spans = availability_query(
        traces,
        {"network": "BW", "station": "ALTM", "channel": "EH?",
         "quality": "D",
         "starttime": "2023-01-01T05:00:00", "endtime": "2023-01-01T09:00:00"},
    ).collect()
    # EHE's two segments (gap 06–08) + EHZ's one, all trimmed to window
    by_chan = {}
    for r in spans:
        by_chan.setdefault(r["channel"], []).append(r)
    assert len(by_chan["EHE"]) == 2 and len(by_chan["EHZ"]) == 1
    assert by_chan["EHE"][0]["span_start"] == dt.datetime(2023, 1, 1, 5, 0, 0)
    assert by_chan["EHE"][0]["span_end"] == dt.datetime(2023, 1, 1, 6, 0, 0)
    assert by_chan["EHE"][1]["span_start"] == dt.datetime(2023, 1, 1, 8, 0, 0)
    assert by_chan["EHE"][1]["span_end"] == dt.datetime(2023, 1, 1, 9, 0, 0)
    # mergegaps swallows the 2 h gap into one trimmed span
    merged = availability_query(
        traces,
        {"network": "BW", "station": "ALTM", "channel": "EHE",
         "mergegaps": "7200",
         "starttime": "2023-01-01T05:00:00", "endtime": "2023-01-01T09:00:00"},
    ).collect()
    assert len(merged) == 1 and merged[0]["n_segments"] == 2
    # extent mode delegates to availability_extent
    ext = availability_query(
        traces, {"network": "GR"}, mode="extent"
    ).collect()
    assert {r["channel"] for r in ext} == {"BHZ", "LHZ"}
    # restricted MANZ hidden from an empty-grant caller
    spark = traces.sparkSession
    grants = spark.createDataFrame([], "network string, station string, "
                                   "location string, channel string")
    gated = availability_query(traces, {"network": "BW"}, acl=grants).collect()
    assert {r["station"] for r in gated} == {"ALTM"}
    with pytest.raises(KeyError, match="unknown fdsnws-availability"):
        availability_query(traces, {"longestonly": "true"})
    with pytest.raises(KeyError, match="unknown merge option"):
        availability_query(traces, {"merge": "bogus"})


def test_availability_spans_contained_segment(spark):
    """A segment fully inside an earlier one must not reopen a span
    (the running-max guard): A covers B, C starts after A ends."""
    from jane_spark.services.fdsnws import availability_spans

    rows = [
        ("N", "S", "", "C", dt.datetime(2023, 1, 1, 0), dt.datetime(2023, 1, 1, 10),
         1.0, 36000, 36000.0, "D", 1, 0, False),
        ("N", "S", "", "C", dt.datetime(2023, 1, 1, 2), dt.datetime(2023, 1, 1, 3),
         1.0, 3600, 3600.0, "D", 1, 1, False),
        ("N", "S", "", "C", dt.datetime(2023, 1, 1, 12), dt.datetime(2023, 1, 1, 13),
         1.0, 3600, 3600.0, "D", 1, 2, False),
    ]
    from jane_spark.plans.schema import TRACE_META, meta_to_schema

    df = spark.createDataFrame(
        rows, meta_to_schema(TRACE_META, include_geometry=False, include_extra=False)
    )
    got = availability_spans(df, 0.0).collect()
    assert [(r["span_start"].hour, r["span_end"].hour, r["n_segments"]) for r in got] == [
        (0, 10, 2), (12, 13, 1),
    ]


def test_dataselect_bulk_matches_union_of_single_queries(spark, traces):
    """POST-bulk resolution ≡ the deduplicated union of the equivalent
    single-window dataselect queries (VERDICT r5 #2) — including SEED
    wildcards, blank-location '--', an overlapping window pair, and a
    global quality constraint."""
    from jane_spark.services.fdsnws import dataselect_bulk_body, dataselect_query

    lines = [
        ("BW", "ALTM", "--", "EH?", "2023-01-01T02:00:00", "2023-01-01T10:00:00"),
        ("BW", "*", "--", "EHZ", "2023-01-01T04:00:00", "2023-01-01T12:00:00"),
        ("GR", "FUR", "--", "?HZ", "2023-01-01T00:30:00", "2023-01-01T03:30:00"),
        ("BW", "MANZ", "--", "BHZ", "2023-01-01T11:00:00", "2023-01-01T13:00:00"),
    ]
    body = "quality=D\n" + "\n".join(" ".join(ln) for ln in lines)
    bulk = dataselect_bulk_body(spark, traces, body)
    cols = list(bulk.columns)
    got = {tuple(r) for r in bulk.select(*cols).collect()}
    want = set()
    for net, sta, loc, cha, s, e in lines:
        single = dataselect_query(
            traces,
            {"network": net, "station": sta, "location": loc, "channel": cha,
             "starttime": s, "endtime": e, "quality": "D"},
        )
        want |= {tuple(r) for r in single.select(*cols).collect()}
    assert got == want and got


def test_dataselect_bulk_longestonly_and_acl(spark, traces):
    """Global longestonly applies per channel across ALL matched lines;
    ACL gating removes restricted hits before the argmax."""
    from jane_spark.services.fdsnws import dataselect_bulk_body

    body = (
        "longestonly=true\n"
        "BW ALTM -- EHE 2023-01-01T00:00:00 2023-01-02T00:00:00\n"
        "BW MANZ -- BHZ 2023-01-01T00:00:00 2023-01-02T00:00:00\n"
    )
    rows = dataselect_bulk_body(spark, traces, body).collect()
    by_chan = {(r["station"], r["channel"]): r for r in rows}
    assert len(rows) == 2
    # ALTM EHE: the longer 08:00–24:00 segment wins
    assert by_chan[("ALTM", "EHE")]["file_id"] == 1
    assert by_chan[("ALTM", "EHE")]["pos"] == 1
    # MANZ BHZ restricted=True on both segments: empty grants hides them
    grants = spark.createDataFrame([], "network string, station string, "
                                   "location string, channel string")
    gated = dataselect_bulk_body(spark, traces, body, acl=grants).collect()
    assert {(r["station"], r["channel"]) for r in gated} == {("ALTM", "EHE")}


def test_station_bulk_matches_union_of_single_queries(spark, channels):
    """fdsnws-station POST-bulk ≡ deduplicated union of the equivalent
    single-window station queries, wildcards and open epochs included."""
    from jane_spark.services.fdsnws import station_bulk_body, station_query

    lines = [
        ("BW", "ALTM", "--", "EH?", "2012-01-01T00:00:00", "2013-01-01T00:00:00"),
        ("*", "*", "--", "BHZ", "2020-01-01T00:00:00", "2021-01-01T00:00:00"),
        ("IU", "ANMO", "?0", "*", "2000-01-01T00:00:00", "2030-01-01T00:00:00"),
    ]
    body = "\n".join(" ".join(ln) for ln in lines)
    bulk = station_bulk_body(spark, channels, body)
    cols = [c for c in bulk.columns if c != "response_stages"]
    got = {tuple(r) for r in bulk.select(*cols).collect()}
    want = set()
    for net, sta, loc, cha, s, e in lines:
        single = station_query(
            channels,
            {"network": net, "station": sta, "location": loc, "channel": cha,
             "starttime": s, "endtime": e},
        )
        want |= {tuple(r) for r in single.select(*cols).collect()}
    assert got == want and got
    # open-ended epochs (end_date NULL) must match late windows
    assert any(r[cols.index("end_date")] is None for r in got)


def test_station_bulk_level_rollup_and_reject(spark, channels):
    from jane_spark.services.fdsnws import station_bulk_body

    body = "level=station\nBW * -- * 2012-01-01T00:00:00 2013-01-01T00:00:00\n"
    rows = station_bulk_body(spark, channels, body).collect()
    assert {(r["network"], r["station"]) for r in rows} == {
        ("BW", "ALTM"), ("BW", "MANZ"),
    }
    with pytest.raises(KeyError, match="unknown fdsnws-station POST"):
        station_bulk_body(
            spark, channels,
            "quality=D\nBW * -- * 2012-01-01T00:00:00 2013-01-01T00:00:00\n",
        )


def test_dataselect_bulk_plan_has_no_nested_loop(spark, traces):
    """The bulk resolve must plan as an equi-join on the time bin —
    broadcast/shuffled HASH join, never BroadcastNestedLoop (the
    quadratic plan the band-bucket rewrite exists to avoid)."""
    from jane_spark.services.fdsnws import dataselect_bulk_body

    body = "BW * -- * 2023-01-01T00:00:00 2023-01-02T00:00:00\n"
    df = dataselect_bulk_body(spark, traces, body)
    explained = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in explained
    assert "HashJoin" in explained or "SortMergeJoin" in explained


def test_parse_bulk_body_rejects_unknown_key_and_malformed_line():
    from jane_spark.services.fdsnws import parse_bulk_body

    with pytest.raises(KeyError, match="unknown fdsnws-dataselect POST"):
        parse_bulk_body("nodata=404\nBW ALTM -- EHE 2023-01-01 2023-01-02")
    with pytest.raises(ValueError, match="malformed bulk request line"):
        parse_bulk_body("BW ALTM EHE 2023-01-01 2023-01-02")
    params, rows = parse_bulk_body(
        "# comment\nquality=D\n\nBW ALTM -- EHE 2023-01-01 2023-01-02\n"
    )
    assert params == {"quality": "D"}
    assert rows == [("BW", "ALTM", "", "EHE", "2023-01-01", "2023-01-02")]


def test_availability_spans_dst_session_zone(spark):
    """Gap measurement must be tz-cast-free: in a DST-observing session
    zone, a timestamp_ntz→timestamp cast is non-linear across the
    spring-forward hour. Two segments around the US 2023-03-12
    transition with a true 30-min gap must stay two spans at
    tolerance 0 and merge at 1800 s — regardless of session zone."""
    from jane_spark.plans.schema import TRACE_META, meta_to_schema
    from jane_spark.services.fdsnws import availability_spans

    rows = [
        # ends 06:50 UTC (01:50 EST); next starts 07:20 UTC (03:20 EDT)
        ("N", "S", "", "C", dt.datetime(2023, 3, 12, 5, 0),
         dt.datetime(2023, 3, 12, 6, 50), 1.0, 6600, 6600.0, "D", 1, 0, False),
        ("N", "S", "", "C", dt.datetime(2023, 3, 12, 7, 20),
         dt.datetime(2023, 3, 12, 9, 0), 1.0, 6000, 6000.0, "D", 1, 1, False),
    ]
    df = spark.createDataFrame(
        rows, meta_to_schema(TRACE_META, include_geometry=False, include_extra=False)
    )
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        assert len(availability_spans(df, 0.0).collect()) == 2
        # 30-min gap: a naive tz cast would measure it as 90 min and
        # refuse to merge at a 1800 s tolerance
        assert len(availability_spans(df, 1800.0).collect()) == 1
        assert len(availability_spans(df, 1799.0).collect()) == 2
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def test_station_level_station(channels):
    from jane_spark.services.fdsnws import station_query

    rows = {
        (r["network"], r["station"]): r
    for r in station_query(channels, {"level": "station"}).collect()}
    assert set(rows) == {("BW", "ALTM"), ("BW", "MANZ"), ("GR", "FUR"), ("IU", "ANMO")}
    altm = rows[("BW", "ALTM")]
    assert altm["n_channels"] == 3
    assert altm["start_date"] == dt.datetime(2010, 1, 1)
    assert altm["end_date"] is None  # EHZ epoch is open -> station open
    anmo = rows[("IU", "ANMO")]
    assert anmo["end_date"] is None  # loc 10 open
    assert anmo["n_channels"] == 2


def test_station_level_network(channels):
    from jane_spark.services.fdsnws import station_query

    rows = {r["network"]: r for r in station_query(channels, {"level": "network"}).collect()}
    assert rows["BW"]["n_stations"] == 2
    assert rows["GR"]["n_stations"] == 1
    assert rows["BW"]["start_date"] == dt.datetime(2005, 3, 1)
    assert rows["BW"]["end_date"] is None


def test_station_level_composes_with_filters(channels):
    from jane_spark.services.fdsnws import station_query

    rows = station_query(
        channels, {"network": "BW", "channel": "EH?", "level": "station"}
    ).collect()
    assert [(r["network"], r["station"], r["n_channels"]) for r in rows] == [
        ("BW", "ALTM", 3)
    ]


def test_station_level_closed_epochs(channels):
    """All member epochs closed -> station epoch end is the latest end."""
    from jane_spark.services.fdsnws import station_query

    rows = station_query(
        channels, {"channel": "EHE,EHN", "level": "station"}
    ).collect()
    assert len(rows) == 1
    assert rows[0]["end_date"] == dt.datetime(2015, 6, 30)


def test_event_text_golden(events):
    from jane_spark.services.fdsnws import event_query, event_text

    rows = event_text(
        event_query(events, {"minmagnitude": "6", "orderby": "magnitude"})
    ).collect()
    assert [r["line"] for r in rows] == [
        "quakeml:eu/ev005|2023-05-25T13:14:15.000|35.5|139.8|35.0|rev|NIED|Mw|6.8|earthquake"
    ]


# ----------------------------------------------------------- xml output


def test_station_xml_golden(channels):
    from jane_spark.services.fdsnws import station_xml

    got = {r["network"]: r["xml"] for r in station_xml(channels).collect()}
    bhz = (
        '<Channel code="BHZ" locationCode="" startDate="2001-01-01T00:00:00">'
        "<Latitude>48.163</Latitude><Longitude>11.275</Longitude>"
        "<Elevation>565.0</Elevation><Depth>3.0</Depth>"
        "<SampleRate>20.0</SampleRate>"
        "<Sensor><Description>Streckeisen STS-2</Description></Sensor>"
        "<Response><InstrumentSensitivity><Value>5.9E8</Value>"
        "<Frequency>0.02</Frequency><InputUnits><Name>M/S</Name></InputUnits>"
        "</InstrumentSensitivity></Response></Channel>"
    )
    lhz = bhz.replace('code="BHZ"', 'code="LHZ"').replace(
        "<SampleRate>20.0</SampleRate>", "<SampleRate>1.0</SampleRate>"
    )
    assert got["GR"] == (
        '<Network code="GR"><Station code="FUR">'
        "<Latitude>48.163</Latitude><Longitude>11.275</Longitude>"
        f"<Elevation>565.0</Elevation>{bhz}{lhz}</Station></Network>"
    )
    # closed epochs carry endDate; open ones omit the attribute
    assert 'endDate="2015-06-30T00:00:00"' in got["BW"]
    assert got["BW"].count("<Station ") == 2
    # two ANMO location epochs roll into ONE station element
    assert got["IU"].count("<Station ") == 1
    assert got["IU"].count("<Channel ") == 2


def test_station_xml_response_stages_golden(channels):
    """VERDICT r4 missing #3: level=response serializes full per-stage
    response detail inside <Channel> — PolesZeros with Pole/Zero
    elements, Coefficients, and gain-only stages."""
    from jane_spark.services.fdsnws import station_query, station_xml

    resp = station_query(
        channels, {"network": "IU", "location": "10", "level": "response"}
    )
    xml = station_xml(resp).collect()[0]["xml"]
    assert (
        '<Stage number="1"><PolesZeros>'
        "<InputUnits><Name>M/S</Name></InputUnits>"
        "<OutputUnits><Name>V</Name></OutputUnits>"
        '<Pole number="0"><Real>-0.037</Real><Imaginary>0.037</Imaginary></Pole>'
        '<Pole number="1"><Real>-0.037</Real><Imaginary>-0.037</Imaginary></Pole>'
        '<Pole number="2"><Real>-502.65</Real><Imaginary>0.0</Imaginary></Pole>'
        '<Zero number="0"><Real>0.0</Real><Imaginary>0.0</Imaginary></Zero>'
        '<Zero number="1"><Real>0.0</Real><Imaginary>0.0</Imaginary></Zero>'
        "</PolesZeros>"
        "<StageGain><Value>1500.0</Value><Frequency>0.05</Frequency></StageGain>"
        "</Stage>"
    ) in xml
    # Coefficients stage: empty poles/zeros payload → units only
    assert (
        '<Stage number="2"><Coefficients>'
        "<InputUnits><Name>V</Name></InputUnits>"
        "<OutputUnits><Name>COUNTS</Name></OutputUnits></Coefficients>"
        "<StageGain><Value>419430.0</Value><Frequency>0.0</Frequency></StageGain>"
        "</Stage>"
    ) in xml
    # gain-only stage: no transfer block at all
    assert (
        '<Stage number="3">'
        "<StageGain><Value>1.0</Value><Frequency>0.0</Frequency></StageGain>"
        "</Stage>"
    ) in xml
    # the InstrumentSensitivity summary still precedes the stages
    assert xml.index("<InstrumentSensitivity>") < xml.index('<Stage number="1">')


def test_station_xml_escapes_stage_free_text(channels):
    """Unit names and pole/zero tokens are index-derived free text —
    a '&' or '<' in them must reach the document as an entity, keeping
    the StationXML well-formed."""
    from pyspark.sql import functions as F

    from jane_spark.services.fdsnws import station_query, station_xml

    hostile = F.array(
        F.struct(
            F.lit(1).alias("number"),
            F.lit("PolesZeros").alias("stage_type"),
            F.lit(1500.0).alias("gain"),
            F.lit(0.05).alias("gain_frequency"),
            F.lit("M/S & <fast>").alias("input_units"),
            F.lit("V").alias("output_units"),
            F.lit("-0.037:<nan>").alias("poles"),
            F.lit("").alias("zeros"),
        )
    )
    resp = station_query(
        channels, {"network": "IU", "location": "10", "level": "response"}
    ).withColumn("response_stages", hostile)
    xml = station_xml(resp).collect()[0]["xml"]
    assert "<Name>M/S &amp; &lt;fast&gt;</Name>" in xml
    assert "<Imaginary>&lt;nan&gt;</Imaginary>" in xml
    import xml.etree.ElementTree as ET

    ET.fromstring(xml)  # must parse


def test_station_level_channel_omits_response_stages(channels):
    """FDSN level semantics: level=channel (the default) strips the
    per-stage payload; level=response keeps it; channels indexed without
    stage detail serialize exactly as before (no <Stage> elements)."""
    from jane_spark.services.fdsnws import station_query, station_xml

    chan = station_query(channels, {"network": "IU", "location": "10"})
    assert [r["response_stages"] for r in chan.collect()] == [None]
    assert "<Stage" not in station_xml(chan).collect()[0]["xml"]
    # stage-free channels are unaffected either way
    gr = station_query(channels, {"network": "GR", "level": "response"})
    assert "<Stage" not in station_xml(gr).collect()[0]["xml"]


def test_stationxml_document_golden(channels):
    from jane_spark.services.fdsnws import station_query, stationxml_document

    doc = stationxml_document(
        station_query(channels, {"network": "GR", "channel": "LHZ"})
    )
    assert doc == (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<FDSNStationXML xmlns="http://www.fdsn.org/xml/station/1" '
        'schemaVersion="1.1"><Source>jane_spark</Source>'
        '<Network code="GR"><Station code="FUR">'
        "<Latitude>48.163</Latitude><Longitude>11.275</Longitude>"
        "<Elevation>565.0</Elevation>"
        '<Channel code="LHZ" locationCode="" startDate="2001-01-01T00:00:00">'
        "<Latitude>48.163</Latitude><Longitude>11.275</Longitude>"
        "<Elevation>565.0</Elevation><Depth>3.0</Depth>"
        "<SampleRate>1.0</SampleRate>"
        "<Sensor><Description>Streckeisen STS-2</Description></Sensor>"
        "<Response><InstrumentSensitivity><Value>5.9E8</Value>"
        "<Frequency>0.02</Frequency><InputUnits><Name>M/S</Name></InputUnits>"
        "</InstrumentSensitivity></Response></Channel>"
        "</Station></Network></FDSNStationXML>"
    )


def test_event_xml_golden(events):
    from jane_spark.services.fdsnws import event_xml

    got = {r["quakeml_id"]: r["xml"] for r in event_xml(events).collect()}
    assert got["quakeml:eu/ev001"] == (
        '<event publicID="quakeml:eu/ev001">'
        "<preferredOriginID>quakeml:eu/ev001#origin</preferredOriginID>"
        "<preferredMagnitudeID>quakeml:eu/ev001#mag</preferredMagnitudeID>"
        '<origin publicID="quakeml:eu/ev001#origin">'
        "<time><value>2023-01-05T01:02:03.500000</value></time>"
        "<latitude><value>46.3</value></latitude>"
        "<longitude><value>13.6</value></longitude>"
        "<depth><value>11000.0</value></depth>"
        "<evaluationMode>automatic</evaluationMode></origin>"
        '<magnitude publicID="quakeml:eu/ev001#mag">'
        "<mag><value>4.1</value></mag><type>ML</type>"
        "<creationInfo><agencyID>EMSC</agencyID><author>auto</author>"
        "</creationInfo></magnitude>"
        "<type>earthquake</type></event>"
    )


def test_event_xml_focal_mechanism_golden(events):
    """Events with cataloged nodal-plane angles nest a <focalMechanism>
    block (QuakeML 1.2 sequence puts it before <origin>); events whose
    mechanism is flagged but angle-less (ev005) get NONE — the
    document-body twin of the beachball no-fabrication rule."""
    from jane_spark.services.fdsnws import event_xml

    got = {r["quakeml_id"]: r["xml"] for r in event_xml(events).collect()}
    assert got["quakeml:eu/ev002"].startswith(
        '<event publicID="quakeml:eu/ev002">'
        '<focalMechanism publicID="quakeml:eu/ev002#fm">'
        "<nodalPlanes><nodalPlane1>"
        "<strike><value>235.0</value></strike>"
        "<dip><value>40.0</value></dip>"
        "<rake><value>95.0</value></rake>"
        "</nodalPlane1></nodalPlanes></focalMechanism>"
        "<preferredOriginID>"
    )
    assert "<focalMechanism" not in got["quakeml:eu/ev005"]
    assert "<focalMechanism" not in got["quakeml:eu/ev001"]
    # with angles, the preferred reference resolves to the emitted block
    assert (
        "<preferredFocalMechanismID>quakeml:eu/ev002#fm"
        "</preferredFocalMechanismID>" in got["quakeml:eu/ev002"]
    )
    assert "preferredFocalMechanismID" not in got["quakeml:eu/ev001"]
    # an index without the fm_* columns serializes exactly as before
    bare = events.drop("fm_strike", "fm_dip", "fm_rake")
    bare_xml = {r["quakeml_id"]: r["xml"] for r in event_xml(bare).collect()}
    assert bare_xml["quakeml:eu/ev002"] == got["quakeml:eu/ev002"].replace(
        '<focalMechanism publicID="quakeml:eu/ev002#fm">'
        "<nodalPlanes><nodalPlane1>"
        "<strike><value>235.0</value></strike>"
        "<dip><value>40.0</value></dip>"
        "<rake><value>95.0</value></rake>"
        "</nodalPlane1></nodalPlanes></focalMechanism>",
        "",
    ).replace(
        "<preferredFocalMechanismID>quakeml:eu/ev002#fm"
        "</preferredFocalMechanismID>",
        "",
    )


def test_document_envelope_escapes_source_and_agency(channels, events):
    from jane_spark.services.fdsnws import (
        event_query,
        quakeml_document,
        station_query,
        stationxml_document,
    )

    doc = stationxml_document(
        station_query(channels, {"network": "GR"}), source="A&B <ops>"
    )
    assert "<Source>A&amp;B &lt;ops&gt;</Source>" in doc
    qdoc = quakeml_document(
        event_query(events, {"minmagnitude": "6"}), agency='a"&b'
    )
    assert 'publicID="quakeml:a&quot;&amp;b/catalog"' in qdoc


def test_document_assembly_streams_without_collect(channels, events, monkeypatch):
    """VERDICT r4 weak #1: document assembly must touch result rows
    iteratively (toLocalIterator), never materialize the whole response
    via collect(). Poisoning DataFrame.collect proves it: both document
    builders still produce byte-identical output with collect disabled."""
    from pyspark.sql import DataFrame

    from jane_spark.services.fdsnws import (
        event_query,
        quakeml_document,
        quakeml_fragments,
        station_query,
        stationxml_document,
        stationxml_fragments,
    )

    sq = station_query(channels, {"network": "GR"})
    eq = event_query(events, {"minmagnitude": "6"})
    want_station = stationxml_document(sq)
    want_event = quakeml_document(eq)

    def poisoned(self):
        raise AssertionError("document assembly called DataFrame.collect()")

    monkeypatch.setattr(DataFrame, "collect", poisoned)
    assert stationxml_document(sq) == want_station
    assert quakeml_document(eq) == want_event
    # fragment streams are consumable chunk-by-chunk (HTTP writer shape)
    chunks = list(stationxml_fragments(sq))
    assert chunks[0].startswith('<?xml version="1.0"')
    assert chunks[-1] == "</FDSNStationXML>"
    assert "".join(chunks) == want_station
    assert "".join(quakeml_fragments(eq)) == want_event


def test_quakeml_document_wraps_filtered_catalog(events):
    from jane_spark.services.fdsnws import event_query, quakeml_document

    doc = quakeml_document(event_query(events, {"minmagnitude": "6"}))
    assert doc.startswith(
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<q:quakeml xmlns:q="http://quakeml.org/xmlns/quakeml/1.2" '
        'xmlns="http://quakeml.org/xmlns/bed/1.2">'
        '<eventParameters publicID="quakeml:jane_spark/catalog">'
    )
    assert doc.count("<event ") == 1 and 'publicID="quakeml:eu/ev005"' in doc
    assert doc.endswith("</event></eventParameters></q:quakeml>")


def test_xml_escaping(spark):
    from jane_spark.functions.xml import xml_attr, xml_element, xml_escape
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [('R&D <"west">', "a&b")], ["name", "code"]
    ).select(
        xml_element(
            "Station", xml_escape(F.col("name")), xml_attr("code", F.col("code"))
        ).alias("xml")
    )
    assert df.collect()[0]["xml"] == (
        '<Station code="a&amp;b">R&amp;D &lt;&quot;west&quot;&gt;</Station>'
    )


def test_event_geojson_document(events):
    """format=geojson: valid FeatureCollection, one Feature per event,
    geometry [lon, lat, depth], no collect() in the assembly."""
    import json as _json

    from jane_spark.services.fdsnws import event_query, geojson_document

    doc = geojson_document(event_query(events, {"minmagnitude": "5.0"}))
    parsed = _json.loads(doc)
    assert parsed["type"] == "FeatureCollection"
    feats = {f["id"]: f for f in parsed["features"]}
    assert set(feats) == {
        "quakeml:eu/ev002", "quakeml:eu/ev003", "quakeml:eu/ev005",
    }
    ev2 = feats["quakeml:eu/ev002"]
    assert ev2["geometry"] == {
        "type": "Point", "coordinates": [26.6, 45.9, 140000.0]
    }
    assert ev2["properties"]["mag"] == 5.5
    assert ev2["properties"]["magtype"] == "Mw"
    assert ev2["properties"]["time"].startswith("2023-02-10T04:05:06")


def test_availability_percent_day_math(spark):
    """Coverage percentage clamps spans to UTC-day boundaries and never
    double-counts overlapping segments (they merge first)."""
    from jane_spark.plans.schema import TRACE_META, meta_to_schema
    from jane_spark.services.fdsnws import availability_percent

    rows = [
        # 18:00 day1 → 06:00 day2 (25% of each day), plus a fully
        # contained overlap that must not double-count
        ("N", "S", "", "C", dt.datetime(2023, 1, 1, 18), dt.datetime(2023, 1, 2, 6),
         1.0, 1, 43200.0, "D", 1, 0, False),
        ("N", "S", "", "C", dt.datetime(2023, 1, 1, 20), dt.datetime(2023, 1, 1, 22),
         1.0, 1, 7200.0, "D", 1, 1, False),
    ]
    df = spark.createDataFrame(
        rows, meta_to_schema(TRACE_META, include_geometry=False, include_extra=False)
    )
    got = {
        (r["day"].isoformat()): r["coverage_pct"]
        for r in availability_percent(df).collect()
    }
    assert got == {"2023-01-01": 25.0, "2023-01-02": 25.0}


# ------------------------------------------------- service metadata docs


def test_service_version_and_wadl_documents():
    import xml.etree.ElementTree as ET

    from jane_spark.services.fdsnws import (
        DATASELECT_PARAMS,
        service_version,
        service_wadl,
    )

    assert service_version() == "1.1.2"
    ns = "{http://wadl.dev.java.net/2009/02}"
    for svc in ("station", "event", "dataselect", "availability"):
        root = ET.fromstring(service_wadl(svc))
        names = {
            p.get("name")
            for p in root.iter(f"{ns}param")
        }
        if svc == "dataselect":
            # the WADL advertises exactly what _validate accepts
            assert names == set(DATASELECT_PARAMS)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        service_wadl("nosuch")


def test_wadl_is_byte_stable():
    from jane_spark.services.fdsnws import service_wadl

    assert service_wadl("event") == service_wadl("event")
    assert '<resource path="query">' in service_wadl("station")


def test_event_catalogs_and_contributors_documents(spark):
    from jane_spark.services.fdsnws import (
        catalogs_document,
        contributors_document,
        event_catalogs,
    )

    ev = spark.createDataFrame(
        [("e1", "EMSC", "auto"), ("e2", "ISC", "bob&co"), ("e3", "EMSC", None)],
        "quakeml_id string, agency string, author string",
    )
    assert {r.catalog for r in event_catalogs(ev).collect()} == {"EMSC", "ISC"}
    doc = catalogs_document(ev)
    assert doc == (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        "<Catalogs>\n"
        "  <Catalog>EMSC</Catalog>\n"
        "  <Catalog>ISC</Catalog>\n"
        "</Catalogs>\n"
    )
    cdoc = contributors_document(ev)
    # escaped content, NULL contributor dropped
    assert "<Contributor>bob&amp;co</Contributor>" in cdoc
    assert cdoc.count("<Contributor>") == 2


def test_event_xml_multi_origin_golden(spark):
    """VERDICT r6 #6: QuakeML one-event-many-solutions container. An
    index row carrying extra_origins/extra_magnitudes arrays serializes
    every solution as an additional <origin>/<magnitude> child
    (#origin2, #mag2, ...) while the preferred*ID references still name
    the primary; rows with empty/NULL arrays emit the single-solution
    block byte-identically to before."""
    import datetime as dt

    from jane_spark.services.fdsnws import event_xml

    t0 = dt.datetime(2023, 1, 2, 3, 4, 5, 250000)
    t1 = dt.datetime(2023, 1, 2, 3, 4, 6, 500000)
    schema = (
        "quakeml_id string, origin_time timestamp_ntz, latitude double, "
        "longitude double, depth_in_m double, evaluation_mode string, "
        "magnitude double, magnitude_type string, agency string, "
        "author string, event_type string, "
        "extra_origins array<struct<origin_time:timestamp_ntz,"
        "latitude:double,longitude:double,depth_in_m:double,"
        "evaluation_mode:string>>, "
        "extra_magnitudes array<struct<magnitude:double,"
        "magnitude_type:string,agency:string,author:string>>"
    )
    rows = [
        (
            "quakeml:eu/multi1", t0, 47.5, 12.25, 8000.0, "manual",
            5.5, "Mw", "GFZ", "alice", "earthquake",
            [(t1, 47.6, 12.3, 9500.0, "automatic")],
            [(5.4, "mb", "EMSC", "bob")],
        ),
        (
            "quakeml:eu/single1", t0, 10.0, 20.0, 1000.0, "manual",
            4.0, "ML", "GFZ", "carol", "earthquake", [], None,
        ),
    ]
    out = {r["quakeml_id"]: r["xml"]
           for r in event_xml(spark.createDataFrame(rows, schema)).collect()}

    assert out["quakeml:eu/multi1"] == (
        '<event publicID="quakeml:eu/multi1">'
        "<preferredOriginID>quakeml:eu/multi1#origin</preferredOriginID>"
        "<preferredMagnitudeID>quakeml:eu/multi1#mag</preferredMagnitudeID>"
        '<origin publicID="quakeml:eu/multi1#origin">'
        "<time><value>2023-01-02T03:04:05.250000</value></time>"
        "<latitude><value>47.5</value></latitude>"
        "<longitude><value>12.25</value></longitude>"
        "<depth><value>8000.0</value></depth>"
        "<evaluationMode>manual</evaluationMode>"
        "</origin>"
        '<origin publicID="quakeml:eu/multi1#origin2">'
        "<time><value>2023-01-02T03:04:06.500000</value></time>"
        "<latitude><value>47.6</value></latitude>"
        "<longitude><value>12.3</value></longitude>"
        "<depth><value>9500.0</value></depth>"
        "<evaluationMode>automatic</evaluationMode>"
        "</origin>"
        '<magnitude publicID="quakeml:eu/multi1#mag">'
        "<mag><value>5.5</value></mag>"
        "<type>Mw</type>"
        "<creationInfo><agencyID>GFZ</agencyID><author>alice</author></creationInfo>"
        "</magnitude>"
        '<magnitude publicID="quakeml:eu/multi1#mag2">'
        "<mag><value>5.4</value></mag>"
        "<type>mb</type>"
        "<creationInfo><agencyID>EMSC</agencyID><author>bob</author></creationInfo>"
        "</magnitude>"
        "<type>earthquake</type>"
        "</event>"
    )
    # empty array and NULL array both collapse to the single-solution
    # form — identical to a frame with no extra_* columns at all
    no_extra = event_xml(
        spark.createDataFrame(rows, schema).drop(
            "extra_origins", "extra_magnitudes"
        )
    )
    plain = {r["quakeml_id"]: r["xml"] for r in no_extra.collect()}
    assert out["quakeml:eu/single1"] == plain["quakeml:eu/single1"]
    assert "#origin2" not in out["quakeml:eu/single1"]


# ------------------------------------------------- r8: event/station params


def test_nodata_status_semantics():
    """FDSN nodata: empty -> 204 (default) or 404 on request; non-empty
    -> 200; any other value is a client error."""
    import pytest as _pytest

    from jane_spark.services.fdsnws import nodata_status

    assert nodata_status(5, {}) == 200
    assert nodata_status(0, {}) == 204
    assert nodata_status(0, {"nodata": "404"}) == 404
    assert nodata_status(3, {"nodata": "404"}) == 200
    for bad in ("500", "200", "true", ""):
        with _pytest.raises(ValueError, match="nodata"):
            nodata_status(0, {"nodata": bad})


def test_event_param_validation(spark):
    """eventid/include* are accepted; junk booleans and unknown params
    fail at the query door."""
    import pytest as _pytest

    from jane_spark.services.fdsnws import EVENT_PARAMS, event_query

    for p in ("eventid", "includeallorigins", "includeallmagnitudes",
              "includearrivals", "nodata"):
        assert p in EVENT_PARAMS
    ev = spark.createDataFrame(
        [("evt:1", True), ("evt:2", False)],
        "quakeml_id string, public boolean",
    ).withColumn("origin_time", F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"))
    got = [r["quakeml_id"] for r in event_query(ev, {"eventid": "evt:1"}).collect()]
    assert got == ["evt:1"]
    # eventid composes with visibility: restricted evt:2 stays hidden
    assert event_query(ev, {"eventid": "evt:2"}).count() == 0
    assert event_query(
        ev, {"eventid": "evt:2", "includerestricted": "true"}
    ).count() == 1
    with _pytest.raises(ValueError, match="includeallorigins"):
        event_query(ev, {"includeallorigins": "yes"})
    with _pytest.raises(KeyError, match="unknown fdsnws-event"):
        event_query(ev, {"evntid": "evt:1"})


def test_event_include_flags_contrast(spark):
    """The same multi-solution frame serializes extra children ONLY
    when the include* flags ask for them (FDSN FALSE defaults)."""
    import datetime as dt

    from jane_spark.services.fdsnws import event_xml_for_params

    t0 = dt.datetime(2023, 1, 2, 3, 4, 5, 250000)
    schema = (
        "quakeml_id string, origin_time timestamp_ntz, latitude double, "
        "longitude double, depth_in_m double, evaluation_mode string, "
        "magnitude double, magnitude_type string, agency string, "
        "author string, event_type string, "
        "extra_origins array<struct<origin_time:timestamp_ntz,"
        "latitude:double,longitude:double,depth_in_m:double,"
        "evaluation_mode:string>>, "
        "extra_magnitudes array<struct<magnitude:double,"
        "magnitude_type:string,agency:string,author:string>>"
    )
    rows = [(
        "quakeml:eu/m1", t0, 47.5, 12.25, 8000.0, "manual",
        5.5, "Mw", "GFZ", "alice", "earthquake",
        [(t0, 47.6, 12.3, 9500.0, "automatic")],
        [(5.4, "mb", "EMSC", "bob")],
    )]
    ev = spark.createDataFrame(rows, schema)
    dflt = event_xml_for_params(ev, {}).collect()[0]["xml"]
    assert "#origin2" not in dflt and "#mag2" not in dflt
    both = event_xml_for_params(
        ev, {"includeallorigins": "true", "includeallmagnitudes": "true"}
    ).collect()[0]["xml"]
    assert "#origin2" in both and "#mag2" in both
    only_o = event_xml_for_params(
        ev, {"includeallorigins": "true"}
    ).collect()[0]["xml"]
    assert "#origin2" in only_o and "#mag2" not in only_o


def test_event_arrivals_refuses_without_pick_data(spark):
    """includearrivals on an index without an arrivals column must
    refuse loudly, not emit an empty pretence of coverage."""
    import pytest as _pytest

    from jane_spark.services.fdsnws import event_xml

    ev = spark.createDataFrame(
        [("evt:1",)], "quakeml_id string"
    ).withColumns({
        "origin_time": F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"),
        "latitude": F.lit(1.0), "longitude": F.lit(2.0),
        "depth_in_m": F.lit(3.0), "evaluation_mode": F.lit("manual"),
        "magnitude": F.lit(4.0), "magnitude_type": F.lit("Mw"),
        "agency": F.lit("A"), "author": F.lit("b"),
        "event_type": F.lit("earthquake"),
    })
    with _pytest.raises(ValueError, match="arrivals"):
        event_xml(ev, include_arrivals=True)


def test_station_params_refusals_and_wadl(spark):
    """updatedafter without an 'updated' column and includeavailability
    without a trace index refuse loudly; the WADL advertises every new
    parameter (generated from the same frozenset _validate enforces)."""
    import pytest as _pytest

    from jane_spark.services.fdsnws import (
        STATION_PARAMS,
        service_wadl,
        station_query,
    )

    for p in ("updatedafter", "includerestricted", "includeavailability",
              "nodata"):
        assert p in STATION_PARAMS
        assert f'name="{p}"' in service_wadl("station")
    for p in ("eventid", "includeallorigins", "includeallmagnitudes",
              "includearrivals"):
        assert f'name="{p}"' in service_wadl("event")
    channels = spark.createDataFrame(
        [("BW", "S1", "", "EHZ")],
        "network string, station string, location string, channel string",
    ).withColumns({
        "start_date": F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"),
        "end_date": F.lit(None).cast("timestamp_ntz"),
    })
    with _pytest.raises(ValueError, match="updated"):
        station_query(channels, {"updatedafter": "2024-01-01T00:00:00"})
    with _pytest.raises(ValueError, match="includeavailability"):
        station_query(channels, {"includeavailability": "true"})
    with _pytest.raises(ValueError, match="includerestricted"):
        station_query(channels, {"includerestricted": "maybe"})


def test_station_xml_data_availability_extent(spark):
    """includeavailability end-to-end: avail columns joined by
    station_query render as <DataAvailability><Extent start end/>;
    channels without coverage emit no element."""
    import datetime as dt

    from jane_spark.services.fdsnws import station_query, station_xml

    mk = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    base = (1.0, 2.0, 3.0, 0.0, 100.0, "STS-2", 1.0, 1.0, "M/S")
    ch_schema = (
        "network string, station string, location string, channel string, "
        "start_date timestamp_ntz, end_date timestamp_ntz, "
        "latitude double, longitude double, elevation_in_m double, "
        "depth_in_m double, sample_rate double, sensor_type string, "
        "total_sensitivity double, sensitivity_frequency double, "
        "units_after_sensitivity string"
    )
    channels = spark.createDataFrame(
        [
            ("BW", "S1", "", "EHZ", mk("2024-01-01T00:00:00"), None, *base),
            ("BW", "S2", "", "EHZ", mk("2024-01-01T00:00:00"), None, *base),
        ],
        ch_schema,
    )
    traces = spark.createDataFrame(
        [("BW", "S1", "", "EHZ", mk("2024-01-03T00:00:00"),
          mk("2024-01-05T12:00:00"))],
        "network string, station string, location string, channel string, "
        "starttime timestamp_ntz, endtime timestamp_ntz",
    )
    out = station_query(channels, {"includeavailability": "true"}, traces=traces)
    xml = station_xml(out).collect()[0]["xml"]
    assert ('<DataAvailability><Extent start="2024-01-03T00:00:00" '
            'end="2024-01-05T12:00:00"/></DataAvailability>') in xml
    assert xml.count("<DataAvailability>") == 1  # S2 has no coverage


def test_availability_params_validation(spark):
    """orderby=latestupdate refuses loudly without an 'updated' column;
    unknown orderby and junk includerestricted fail at the door; the
    WADL advertises the new availability params."""
    import pytest as _pytest

    from jane_spark.services.fdsnws import (
        AVAILABILITY_PARAMS,
        availability_query,
        service_wadl,
    )

    for p in ("orderby", "includerestricted", "nodata"):
        assert p in AVAILABILITY_PARAMS
        assert f'name="{p}"' in service_wadl("availability")
    traces = spark.createDataFrame(
        [("BW", "S1", "", "EHZ", dt.datetime(2024, 1, 1),
          dt.datetime(2024, 1, 2), 100)],
        "network string, station string, location string, channel string, "
        "starttime timestamp_ntz, endtime timestamp_ntz, npts long",
    )
    with _pytest.raises(ValueError, match="latestupdate"):
        availability_query(traces, {"orderby": "latestupdate"})
    with _pytest.raises(KeyError, match="orderby"):
        availability_query(traces, {"orderby": "sideways"})
    with _pytest.raises(ValueError, match="includerestricted"):
        availability_query(traces, {"includerestricted": "maybe"})
    # restricted rows drop only when asked
    t2 = traces.withColumn("restricted", F.lit(True))
    assert availability_query(t2, {}).count() == 1
    assert availability_query(t2, {"includerestricted": "false"}).count() == 0
