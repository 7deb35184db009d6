"""Focal-mechanism SVG rendering tests (A6 attachment generation —
pure-SVG beachballs, no ObsPy/matplotlib)."""

from __future__ import annotations

import hashlib
import math

import numpy as np

from jane_spark.services.beachball import (
    PLACEHOLDER_CATEGORY,
    _fault_vectors,
    _plane_of_normal,
    _polarity,
    beachball_svg,
    event_beachballs,
    placeholder_svg,
)
from jane_spark.testing.fixtures import event_index


def test_polarity_strike_slip_quadrants():
    """Left-lateral vertical strike-slip (0/90/0): compression in the
    NE and SW quadrants, dilatation NW/SE — the classic checkerboard."""
    n, u = _fault_vectors(0.0, 90.0, 0.0)
    for az, positive in ((45, True), (135, False), (225, True), (315, False)):
        v = np.array(
            [math.cos(math.radians(az)), math.sin(math.radians(az)), 0.01]
        )
        assert (_polarity(v / np.linalg.norm(v), n, u) > 0) is positive, az


def test_polarity_dip_slip_center():
    """Vertical takeoff (beachball center): compressional for a thrust
    (rake +90), dilatational for a normal fault (rake -90)."""
    down = np.array([0.0, 0.0, 1.0])
    n, u = _fault_vectors(0.0, 45.0, 90.0)
    assert _polarity(down, n, u) > 0
    n, u = _fault_vectors(0.0, 45.0, -90.0)
    assert _polarity(down, n, u) < 0


def test_plane_of_normal_round_trip():
    for strike, dip in ((0.0, 90.0), (30.0, 60.0), (210.0, 45.0), (123.0, 10.0)):
        n, _ = _fault_vectors(strike, dip, 0.0)
        s2, d2 = _plane_of_normal(n)
        assert abs(d2 - dip) < 1e-9
        assert min(abs(s2 - strike), 360 - abs(s2 - strike)) < 1e-9


def test_beachball_svg_structure_and_fill_counts():
    """Every double couple splits the disc into four regions, two of
    them compressional — so every rendering carries exactly 2 filled
    paths, 2 nodal-plane traces, and the disc outline."""
    for mech in ((0, 90, 0), (0, 45, 90), (0, 45, -90), (30, 60, 45)):
        svg = beachball_svg(*mech)
        assert svg.startswith("<svg ") and svg.endswith("</svg>")
        assert svg.count('fill="#333333"') == 2, mech
        assert svg.count('stroke="#000000" stroke-width="1"') == 2, mech
        assert svg.count("<circle ") == 1


def test_beachball_svg_golden_bytes():
    """Deterministic rendering: byte-identical across calls, pinned by
    hash (the golden-SVG habit of the reference's attachment tests)."""
    svg = beachball_svg(30, 60, 45)
    assert svg == beachball_svg(30, 60, 45)
    assert (
        hashlib.sha256(svg.encode()).hexdigest()
        == "e4492523b50c59cfc29de5c5ec0a29c028b10f472be285bc080abaaf3bdd0853"
    )


def test_event_beachballs_attachment_rows(spark):
    """Only events with has_focal_mechanism get an attachment row;
    payloads are real SVG bytes with the attachment-store columns."""
    rows = event_beachballs(event_index(spark)).collect()
    ids = sorted(r["quakeml_id"] for r in rows)
    assert ids == ["quakeml:eu/ev002", "quakeml:eu/ev003", "quakeml:eu/ev005"]
    by_id = {r["quakeml_id"]: r for r in rows}
    for r in rows:
        assert r["content_type"] == "image/svg+xml"
        payload = bytes(r["payload"])
        assert payload.startswith(b"<svg ") and payload.endswith(b"</svg>")
    # cataloged nodal-plane angles drive the rendering when present...
    for eid, mech in (
        ("quakeml:eu/ev002", (235.0, 40.0, 95.0)),
        ("quakeml:eu/ev003", (10.0, 88.0, -5.0)),
    ):
        assert by_id[eid]["category"] == "focal_mechanism"
        payload = bytes(by_id[eid]["payload"])
        assert payload == beachball_svg(*mech).encode()
        assert payload.count(b'fill="#333333"') == 2
    # ...but a mechanism flagged WITHOUT derived planes must never be
    # rendered as one: it becomes a clearly-marked placeholder row
    # (empty dashed disc, zero fill paths), not an invented mechanism
    ev005 = by_id["quakeml:eu/ev005"]
    assert ev005["category"] == PLACEHOLDER_CATEGORY
    assert bytes(ev005["payload"]) == placeholder_svg().encode()
    assert bytes(ev005["payload"]).count(b'fill="#333333"') == 0


def test_event_beachballs_index_without_fm_columns(spark):
    """An index lacking fm_* columns entirely yields only placeholder
    rows — the service never invents mechanism angles."""
    from pyspark.sql import functions as F

    ev = event_index(spark).drop("fm_strike", "fm_dip", "fm_rake")
    rows = event_beachballs(ev).collect()
    assert len(rows) == 3
    assert {r["category"] for r in rows} == {PLACEHOLDER_CATEGORY}
