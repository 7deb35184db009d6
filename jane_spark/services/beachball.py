"""Focal-mechanism ("beachball") SVG rendering (A6 attachment store).

jane renders beachball images for events that carry focal mechanisms
and serves them as document attachments [ref: src/jane/documents — the
attachment model; the reference draws with ObsPy/matplotlib, conf=M;
SURVEY.md §0 caveat]. Neither library exists in this environment, so
the rendering is re-derived from the public textbook math: a
double-couple mechanism (strike/dip/rake, Aki & Richards conventions)
is projected onto the lower hemisphere with the equal-area (Schmidt)
projection, the two nodal-plane traces split the disc into four
regions, and the compressional quadrants (positive P-wave first
motion, sign of (v·n)(v·u)) are filled. Output is pure SVG — no
raster, no third-party code.

Scale shape: rendering is row-local (one event → one small SVG string)
inside an Arrow-batched ``mapInPandas``; a 100 TB catalog renders at
full cluster width with zero shuffles before the attachment-store
write.
"""

from __future__ import annotations

import math

import numpy as np

# ---------------------------------------------------------------- math
# x = north, y = east, z = down (Aki & Richards 4.88).


def _fault_vectors(strike: float, dip: float, rake: float):
    """(normal n, slip u) unit vectors for a double couple."""
    s, d, r = (math.radians(a) for a in (strike, dip, rake))
    n = np.array(
        [-math.sin(d) * math.sin(s), math.sin(d) * math.cos(s), -math.cos(d)]
    )
    u = np.array(
        [
            math.cos(r) * math.cos(s) + math.cos(d) * math.sin(r) * math.sin(s),
            math.cos(r) * math.sin(s) - math.cos(d) * math.sin(r) * math.cos(s),
            -math.sin(r) * math.sin(d),
        ]
    )
    return n, u


def _polarity(v: np.ndarray, n: np.ndarray, u: np.ndarray) -> float:
    """P-wave radiation sign for take-off direction v: 2(v·n)(v·u)."""
    return float(np.dot(v, n) * np.dot(v, u))


def _schmidt(v: np.ndarray) -> tuple[float, float]:
    """Equal-area lower-hemisphere projection of unit vector v (z down,
    v_z >= 0) to unit-disc (x_east, y_north) plot coordinates."""
    theta = math.acos(min(1.0, max(-1.0, v[2])))  # angle from down axis
    # √2·sin(θ/2): the rim (θ=90°) lands exactly at r=1
    r = math.sqrt(2.0) * math.sin(theta / 2.0)
    az = math.atan2(v[1], v[0])  # azimuth from north, toward east
    return r * math.sin(az), r * math.cos(az)


def _plane_trace(strike: float, dip: float, steps: int = 90) -> list[np.ndarray]:
    """Unit vectors along the nodal plane's lower-hemisphere great
    circle, from the strike rim point to the anti-strike rim point."""
    s, d = math.radians(strike), math.radians(dip)
    a = np.array([math.cos(s), math.sin(s), 0.0])  # strike direction
    b = np.array(  # down-dip direction (z down positive)
        [
            -math.cos(d) * math.sin(s),
            math.cos(d) * math.cos(s),
            math.sin(d),
        ]
    )
    out = []
    for i in range(steps + 1):
        t = math.pi * i / steps
        v = math.cos(t) * a + math.sin(t) * b
        if v[2] < 0:  # numerical dust at the rim
            v = v - 2 * v[2] * np.array([0.0, 0.0, 1.0])
        out.append(v / np.linalg.norm(v))
    return out


def _null_axis(n: np.ndarray, u: np.ndarray) -> np.ndarray:
    """B (null) axis = n × u, flipped into the lower hemisphere."""
    b = np.cross(n, u)
    b /= np.linalg.norm(b)
    if b[2] < 0:
        b = -b
    return b


def _fmt(x: float) -> str:
    return f"{x:.2f}"


def beachball_svg(
    strike: float,
    dip: float,
    rake: float,
    size: int = 200,
    fill: str = "#333333",
    stroke: str = "#000000",
) -> str:
    """Render one double-couple mechanism as an SVG string.

    Geometry: both nodal-plane traces are split at the null-axis
    projection into four rim-to-center half-traces; the four regions
    (half-trace, reversed other half-trace, rim arc) are polygonized
    and the two with positive radiation polarity at their rim midpoint
    are filled. Degenerate sampling keeps the output deterministic.
    """
    n, u = _fault_vectors(strike, dip, rake)
    b_axis = _null_axis(n, u)
    # second nodal plane: normal u — its (strike, dip)
    strike2, dip2 = _plane_of_normal(u)
    strike1, dip1 = _plane_of_normal(n)

    t1 = _plane_trace(strike1, dip1)
    t2 = _plane_trace(strike2, dip2)
    # split each trace at the point closest to the null axis
    i1 = int(np.argmax([abs(float(np.dot(v, b_axis))) for v in t1]))
    i2 = int(np.argmax([abs(float(np.dot(v, b_axis))) for v in t2]))
    halves = [
        t1[: i1 + 1][::-1],  # B → rim (strike end)
        t1[i1:],  # B → rim (anti-strike end)
        t2[: i2 + 1][::-1],
        t2[i2:],
    ]
    # order the four rim endpoints by azimuth; pair each adjacent pair
    # of half-traces with the rim arc between their endpoints

    def rim_az(h):
        v = h[-1]
        return math.atan2(v[1], v[0]) % (2 * math.pi)

    halves.sort(key=rim_az)
    cx = cy = size / 2.0
    rad = size / 2.0 - 2.0

    def xy(v):
        px, py = _schmidt(v)
        return cx + px * rad, cy - py * rad  # SVG y grows downward

    # Region polarity: each of the four regions is a fixed sign-pair of
    # (v·n, v·u), so polarity is constant inside a region and ADJACENT
    # regions alternate. A single sample point can still land on the
    # wrong side of a shallow-dipping trace, so instead of trusting one
    # sample per region, score both alternating fill patterns with the
    # spherical-centroid polarity of every region and take the
    # consistent pattern with the larger total weight — exactly two
    # regions fill for every double couple by construction.
    centroid_pol = []
    for k in range(4):
        pts = halves[k] + halves[(k + 1) % 4]
        c = np.sum(pts, axis=0)
        norm = np.linalg.norm(c)
        centroid_pol.append(
            _polarity(c / norm, n, u) if norm > 1e-9 else 0.0
        )
    evens_score = (
        centroid_pol[0] - centroid_pol[1] + centroid_pol[2] - centroid_pol[3]
    )
    filled = {0, 2} if evens_score > 0 else {1, 3}
    paths = []
    for k in range(4):
        if k not in filled:
            continue
        h_out = halves[k]  # B → rim
        h_back = halves[(k + 1) % 4]  # rim → B (reversed below)
        az0, az1 = rim_az(h_out), rim_az(h_back)
        arc = (az1 - az0) % (2 * math.pi)
        pts_out = [xy(v) for v in h_out]
        pts_back = [xy(v) for v in reversed(h_back)]
        x0, y0 = pts_out[0]
        d = [f"M {_fmt(x0)} {_fmt(y0)}"]
        d += [f"L {_fmt(x)} {_fmt(y)}" for x, y in pts_out[1:]]
        # rim arc from h_out end to h_back rim end
        bx, by = pts_back[0]
        large = 1 if arc > math.pi else 0
        d.append(f"A {_fmt(rad)} {_fmt(rad)} 0 {large} 1 {_fmt(bx)} {_fmt(by)}")
        d += [f"L {_fmt(x)} {_fmt(y)}" for x, y in pts_back[1:]]
        d.append("Z")
        paths.append(
            f'<path d="{" ".join(d)}" fill="{fill}" stroke="none"/>'
        )
    trace_paths = []
    for trace in (t1, t2):
        pts = [xy(v) for v in trace]
        d = f"M {_fmt(pts[0][0])} {_fmt(pts[0][1])} " + " ".join(
            f"L {_fmt(x)} {_fmt(y)}" for x, y in pts[1:]
        )
        trace_paths.append(
            f'<path d="{d}" fill="none" stroke="{stroke}" stroke-width="1"/>'
        )
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{size}" '
        f'height="{size}" viewBox="0 0 {size} {size}">'
        f'<circle cx="{_fmt(cx)}" cy="{_fmt(cy)}" r="{_fmt(rad)}" '
        f'fill="#ffffff" stroke="{stroke}" stroke-width="1.5"/>'
        + "".join(paths)
        + "".join(trace_paths)
        + "</svg>"
    )


def _plane_of_normal(n: np.ndarray) -> tuple[float, float]:
    """(strike, dip) in degrees of the plane with unit normal n
    (z down). The normal is flipped to point up (n_z < 0) first, the
    A&R hanging-wall convention."""
    if n[2] > 0:
        n = -n
    dip = math.degrees(math.acos(min(1.0, max(-1.0, -n[2]))))
    if abs(n[0]) < 1e-12 and abs(n[1]) < 1e-12:
        return 0.0, 0.0  # horizontal plane: strike undefined → 0
    strike = math.degrees(math.atan2(-n[0], n[1])) % 360.0
    return strike, dip


# ---------------------------------------------------------- Spark side


BEACHBALL_SCHEMA = (
    "quakeml_id string, category string, content_type string, payload binary"
)

PLACEHOLDER_CATEGORY = "focal_mechanism_placeholder"


def placeholder_svg(size: int = 200) -> str:
    """Clearly-marked stand-in for an event whose focal mechanism is
    flagged but has no cataloged nodal-plane angles: an empty disc with
    a question mark — never mistakable for a rendered mechanism (no
    filled quadrants, no nodal traces)."""
    cx = cy = size / 2.0
    rad = size * 0.45
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{size}" '
        f'height="{size}" viewBox="0 0 {size} {size}">'
        f'<circle cx="{_fmt(cx)}" cy="{_fmt(cy)}" r="{_fmt(rad)}" '
        f'fill="#ffffff" stroke="#999999" stroke-width="1.5" '
        f'stroke-dasharray="4 3"/>'
        f'<text x="{_fmt(cx)}" y="{_fmt(cy + size * 0.12)}" '
        f'text-anchor="middle" font-size="{_fmt(size * 0.38)}" '
        f'fill="#999999">?</text>'
        f"</svg>"
    )


def event_beachballs(events, size: int = 200):
    """Attachment rows (A6) for every event with a focal mechanism:
    one SVG beachball per event, rendered inside Arrow-batched
    mapInPandas. Events without ``has_focal_mechanism`` are filtered
    out before any Python runs, so the scan prunes to the relevant
    partition subset.

    Mechanism angles come ONLY from the index's cataloged
    ``fm_strike``/``fm_dip``/``fm_rake`` columns (QUAKEML_META). A row
    flagged as having a mechanism but missing any nodal-plane angle —
    or an index without the columns at all — is never rendered as a
    mechanism: it yields a clearly-marked placeholder row
    (``category = 'focal_mechanism_placeholder'``, a dashed empty disc)
    so the attachment pipeline stays total without publishing invented
    data for a real event."""
    import pandas as pd
    from pyspark.sql import functions as F

    have_cols = {"fm_strike", "fm_dip", "fm_rake"} <= set(events.columns)
    null_d = F.lit(None).cast("double")
    with_mech = events.filter(F.col("has_focal_mechanism")).select(
        "quakeml_id",
        (F.col("fm_strike").cast("double") if have_cols else null_d).alias("strike"),
        (F.col("fm_dip").cast("double") if have_cols else null_d).alias("dip"),
        (F.col("fm_rake").cast("double") if have_cols else null_d).alias("rake"),
    )
    stub = placeholder_svg(size=size).encode()

    def run(batches):
        for pdf in batches:
            cats, payloads = [], []
            for s, d, r in zip(pdf["strike"], pdf["dip"], pdf["rake"]):
                if pd.isna(s) or pd.isna(d) or pd.isna(r):
                    cats.append(PLACEHOLDER_CATEGORY)
                    payloads.append(stub)
                else:
                    cats.append("focal_mechanism")
                    payloads.append(beachball_svg(s, d, r, size=size).encode())
            yield pd.DataFrame(
                {
                    "quakeml_id": pdf["quakeml_id"],
                    "category": cats,
                    "content_type": "image/svg+xml",
                    "payload": payloads,
                }
            )

    return with_mech.mapInPandas(run, BEACHBALL_SCHEMA)
