"""Grid-blocked proximity pair join (geo north-star, round 9).

"All pairs of stations within r of each other" via a cross join is
|V|² distance evaluations — dead at any scale. The standard answer is
the geohash/grid blocking every spatial engine uses: snap each point
to a cell of side >= r, replicate one side into its 3x3 cell
neighborhood, equi-join on the cell key, then apply the exact distance
predicate to candidates only. No false negatives by construction (two
points within r differ by at most one cell index per axis, floor being
monotone); false positives die in the exact filter.

The join here is in DEGREE space (euclidean on lat/lon) — the blocking
technique is the point; metric refinements (haversine, longitude
wrap — see q_b9_radial_wrap) compose on top by shrinking the cell to
the worst-case degree equivalent of the metric radius.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_pair_join(
    points: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_deg: float,
) -> DataFrame:
    """All unordered point pairs within ``radius_deg`` (euclidean in
    degrees): ``(a_id, b_id, d2)`` with ``a_id < b_id`` and ``d2`` the
    squared distance rounded to 9 dp (a fixed-shape double expression
    an oracle replays; no sqrt — the comparison is against r²).

    Plan shape: one projection computes each point's (ix, iy) cell;
    the probe side replicates 9x via a literal offset explode; ONE
    equi-join on the cell key; candidates per cell pair are bounded by
    local density, never |V|². Skewed cells (dense cities) hit the
    usual hot-key hazard — shrink the cell and widen the neighborhood,
    or salt the hot cells.
    """
    if radius_deg <= 0:
        raise ValueError("radius_deg must be positive")
    r = float(radius_deg)
    ix = F.floor((F.col("lat") + 90.0) / r).cast("long")
    iy = F.floor((F.col("lon") + 180.0) / r).cast("long")
    pts = points.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(lat_col).cast("double").alias("lat"),
        F.col(lon_col).cast("double").alias("lon"),
    ).withColumn("ix", ix).withColumn("iy", iy)
    left = pts.select(
        F.col("id").alias("a_id"),
        F.col("lat").alias("a_lat"),
        F.col("lon").alias("a_lon"),
        "ix",
        "iy",
    )
    one = F.sequence(F.lit(-1), F.lit(1))
    right = (
        pts.withColumn("dx", F.explode(one))
        .withColumn("dy", F.explode(one))
        .select(
            F.col("id").alias("b_id"),
            F.col("lat").alias("b_lat"),
            F.col("lon").alias("b_lon"),
            (F.col("ix") + F.col("dx")).alias("ix"),
            (F.col("iy") + F.col("dy")).alias("iy"),
        )
    )
    d2 = (F.col("a_lat") - F.col("b_lat")) * (
        F.col("a_lat") - F.col("b_lat")
    ) + (F.col("a_lon") - F.col("b_lon")) * (F.col("a_lon") - F.col("b_lon"))
    return (
        left.join(right, ["ix", "iy"])
        .where(F.col("a_id") < F.col("b_id"))
        .where(d2 <= F.lit(r * r))
        .select("a_id", "b_id", F.round(d2, 9).alias("d2"))
    )


def grid_pair_join_salted(
    points: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_deg: float,
    n_salt: int = 8,
) -> DataFrame:
    """Skew-guarded :func:`grid_pair_join`: identical output, but the
    single hot-cell task a dense city creates is split ``n_salt`` ways.

    Standard salted self-join shape: the LEFT side of the cell join
    gets a deterministic salt ``pmod(xxhash64(id), n_salt)``; the
    RIGHT (9x-replicated) side is replicated ``n_salt`` more times so
    every (left-salt, right-point) combination still meets — no pair
    is lost, and the exact-distance filter is unchanged. The worst
    task shrinks from |cell|² candidate evaluations to
    |cell|²/n_salt, at the cost of n_salt× replication of the probe
    side — the right trade only for genuinely hot cells, so keep the
    unsalted operator for uniform data and switch when a cell
    histogram (one groupBy) shows a hot key. No false negatives: the
    salt partitions the LEFT side only; every left point still sees
    the full 3x3 neighborhood.
    """
    if n_salt < 1:
        raise ValueError("n_salt must be >= 1")
    if radius_deg <= 0:
        raise ValueError("radius_deg must be positive")
    r = float(radius_deg)
    ix = F.floor((F.col("lat") + 90.0) / r).cast("long")
    iy = F.floor((F.col("lon") + 180.0) / r).cast("long")
    pts = points.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(lat_col).cast("double").alias("lat"),
        F.col(lon_col).cast("double").alias("lon"),
    ).withColumn("ix", ix).withColumn("iy", iy)
    left = pts.select(
        F.col("id").alias("a_id"),
        F.col("lat").alias("a_lat"),
        F.col("lon").alias("a_lon"),
        "ix",
        "iy",
        F.pmod(F.xxhash64("id"), F.lit(n_salt)).cast("int").alias("salt"),
    )
    one = F.sequence(F.lit(-1), F.lit(1))
    right = (
        pts.withColumn("dx", F.explode(one))
        .withColumn("dy", F.explode(one))
        .withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
        )
        .select(
            F.col("id").alias("b_id"),
            F.col("lat").alias("b_lat"),
            F.col("lon").alias("b_lon"),
            (F.col("ix") + F.col("dx")).alias("ix"),
            (F.col("iy") + F.col("dy")).alias("iy"),
            F.col("salt").cast("int").alias("salt"),
        )
    )
    d2 = (F.col("a_lat") - F.col("b_lat")) * (
        F.col("a_lat") - F.col("b_lat")
    ) + (F.col("a_lon") - F.col("b_lon")) * (F.col("a_lon") - F.col("b_lon"))
    return (
        left.join(right, ["ix", "iy", "salt"])
        .where(F.col("a_id") < F.col("b_id"))
        .where(d2 <= F.lit(r * r))
        .select("a_id", "b_id", F.round(d2, 9).alias("d2"))
    )
