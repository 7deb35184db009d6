"""Predicate-compiler tests (SURVEY.md §5.2.4): property-based wildcard/
list/negation translation vs a pure-Python reference matcher, plus Spark
integration on a fixed corpus."""

from __future__ import annotations

import fnmatch

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from jane_spark.plans.predicates import (
    Triple,
    compile_params,
    match_row,
    parse_params,
    search,
    wildcard_to_like,
)

META = {
    "network": "str",
    "station": "str",
    "channel": "str",
    "latitude": "float",
    "sample_rate": "float",
    "npts": "int",
    "public": "bool",
    "start_date": "UTCDateTime",
}

# ---------------------------------------------------------------- parsing


def test_parse_ops():
    triples = parse_params(
        {
            "min_latitude": "-10.5",
            "max_latitude": "45",
            "start_date_before": "2024-01-02T03:04:05.123456",
            "start_date_after": "2020-01-01T00:00:00",
            "network": "BW,GR",
            "npts": "100",
            "public": "true",
        },
        META,
    )
    by_field_op = {(t.field, t.op): t.value for t in triples}
    assert by_field_op[("latitude", "ge")] == -10.5
    assert by_field_op[("latitude", "le")] == 45.0
    assert by_field_op[("start_date", "lt")].microsecond == 123456
    assert by_field_op[("network", "eq")] == ["BW", "GR"]
    assert by_field_op[("npts", "eq")] == 100
    assert by_field_op[("public", "eq")] is True


def test_parse_rejects_unknown_field():
    with pytest.raises(KeyError):
        parse_params({"bogus": "1"}, META)


def test_parse_rejects_range_on_str():
    with pytest.raises(ValueError):
        parse_params({"min_network": "A"}, META)


# ------------------------------------------------------ LIKE translation


def test_wildcard_translation():
    assert wildcard_to_like("BH?") == "BH_"
    assert wildcard_to_like("B*") == "B%"
    assert wildcard_to_like("plain") is None
    assert wildcard_to_like("50%*") == r"50\%%"
    assert wildcard_to_like("a_b?") == r"a\_b_"


# ---------------------------------------------- property: matcher parity

_pattern_alphabet = st.sampled_from(list("abAB01*?%_."))
_value_alphabet = st.sampled_from(list("abAB01%_."))


@settings(max_examples=300, deadline=None)
@given(
    pattern=st.text(_pattern_alphabet, min_size=0, max_size=8),
    value=st.text(_value_alphabet, min_size=0, max_size=8),
)
def test_wildcard_matches_fnmatch(pattern, value):
    """Python-side LIKE evaluation of the translated pattern must agree
    with fnmatch (the FDSN wildcard semantics) on arbitrary strings."""
    row = {"network": value}
    got = match_row(row, {"network": pattern}, {"network": "str"})
    items = [s for s in pattern.split(",") if s]
    if not items:
        want = True  # empty param == no constraint
    else:
        want = (
            fnmatch.fnmatchcase(value, pattern)
            if ("*" in pattern or "?" in pattern)
            else value == pattern
        )
    assert got == want


# --------------------------------------------- Spark integration (fixed)

CORPUS = [
    # network, station, channel, latitude, npts, public
    ("BW", "ALTM", "EHE", 48.0, 100, True),
    ("BW", "ALTM", "EHN", 48.0, 200, True),
    ("BW", "MANZ", "BHZ", 49.9, 300, False),
    ("GR", "FUR", "BHZ", 11.2, 400, True),
    ("GR", "FUR", "LHZ", 11.2, 500, True),
    ("IU", "ANMO", "BH1", -34.9, 600, False),
    ("IU", None, "HHZ", None, 700, True),
]
COLS = ["network", "station", "channel", "latitude", "npts", "public"]
CMETA = {
    "network": "str",
    "station": "str",
    "channel": "str",
    "latitude": "float",
    "npts": "int",
    "public": "bool",
}

PARAM_CASES = [
    {"network": "BW"},
    {"network": "B*"},
    {"channel": "BH?,LH?"},
    {"channel": "-BHZ"},
    {"network": "BW,-GR"},
    {"min_latitude": "0", "max_latitude": "50"},
    {"min_npts": "250", "channel": "*Z"},
    {"public": "true", "network": "*"},
    {"station": "ALTM", "channel": "EH?"},
    {"network": "-BW,-GR"},
]


@pytest.mark.parametrize("params", PARAM_CASES, ids=[str(p) for p in PARAM_CASES])
def test_spark_matches_reference(spark, params):
    df = spark.createDataFrame(CORPUS, COLS)
    got = {
        tuple(r)
        for r in search(df, params, CMETA).select("network", "channel", "npts").collect()
    }
    want = {
        (r[0], r[2], r[4])
        for r in CORPUS
        if match_row(dict(zip(COLS, r)), params, CMETA)
    }
    assert got == want, f"params={params}"
