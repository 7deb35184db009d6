"""Geographic scalar surface (SURVEY.md §2 B8/B9, H5).

jane's PostGIS usage is only ever point-in-bbox and point-in-radius
(great-circle degrees, fdsnws ``minradius``/``maxradius``). Both are
expressible with built-in column functions — they stay inside
whole-stage codegen; no UDFs, no geometry library.

Reference behavior: [ref: src/jane/fdsnws/views/station_1.py /
event_1.py — radial + bbox params, conf=H; see SURVEY.md §0 for the
citation caveat — /root/reference was empty at survey time].
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bbox_predicate(
    lat: Column,
    lon: Column,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
) -> Column:
    """fdsnws bounding-box filter: two between-predicates; at scale this
    prunes parquet row groups via min/max stats on the lat/lon doubles."""
    return lat.between(min_lat, max_lat) & lon.between(min_lon, max_lon)


def great_circle_degrees(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Central angle in degrees between two points (haversine form).

    Matches jane's fdsnws radial search semantics (radius in degrees of
    arc, as the FDSN spec defines). Built-ins only: radians/sin/cos/
    asin/sqrt/degrees — Catalyst codegens the whole expression.
    """
    dlat = F.radians(lat2) - F.radians(lat1)
    dlon = F.radians(lon2) - F.radians(lon1)
    h = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.degrees(2 * F.asin(F.sqrt(h)))


def radial_predicate(
    lat: Column,
    lon: Column,
    center_lat: float,
    center_lon: float,
    min_radius_deg: float,
    max_radius_deg: float,
) -> Column:
    """fdsnws min/max-radius filter. For scale, callers should combine
    with a cheap bbox pre-filter (radius r ⇒ lat within ±r) so parquet
    stats pruning applies before the trig residual."""
    d = great_circle_degrees(lat, lon, F.lit(float(center_lat)), F.lit(float(center_lon)))
    return (d >= min_radius_deg) & (d <= max_radius_deg)


def radial_search(
    df,
    lat_col: str,
    lon_col: str,
    center_lat: float,
    center_lon: float,
    min_radius_deg: float,
    max_radius_deg: float,
):
    """Radial filter with the scale-side prune applied automatically.

    The exact great-circle predicate cannot reach parquet stats (trig),
    so a covering bounding box for the OUTER radius goes first: lat
    within ±r of the center, lon within ±r/cos(lat) widened to the
    band's worst case. Both are plain comparisons on double columns —
    they push down to the scan and prune row groups — and the exact
    annulus test runs only on survivors. Within ~(90° − r) of a pole
    the lon window wraps the full circle (cos → 0), which the guard
    handles by skipping the lon bound. When the lon window crosses the
    antimeridian (center near ±180) it is emitted as the wrapped OR of
    two in-range windows, so far-side points survive the prune. The
    bbox is a superset of the annulus for lon values normalized to
    [-180, 180] — equivalent to the unpruned predicate there.
    """
    import math

    r = float(max_radius_deg)
    lat, lon = F.col(lat_col), F.col(lon_col)
    pre = lat.between(center_lat - r, center_lat + r)
    worst_lat = min(abs(center_lat) + r, 90.0)
    if worst_lat < 89.0:  # not pole-adjacent: lon bound is meaningful
        widen = r / math.cos(math.radians(worst_lat))
        if widen < 180.0:
            # Normalize the center into [-180, 180) so the window math is
            # well-defined even for callers passing e.g. 185.0.
            clon = ((center_lon + 180.0) % 360.0) - 180.0
            lo, hi = clon - widen, clon + widen
            if lo < -180.0:
                # window wraps westward across the antimeridian
                pre = pre & (lon.between(lo + 360.0, 180.0) | lon.between(-180.0, hi))
            elif hi > 180.0:
                # window wraps eastward across the antimeridian
                pre = pre & (lon.between(lo, 180.0) | lon.between(-180.0, hi - 360.0))
            else:
                pre = pre & lon.between(lo, hi)
    exact = radial_predicate(
        lat, lon, center_lat, center_lon, min_radius_deg, max_radius_deg
    )
    return df.filter(pre & exact)
