"""§2.2 B — projection/filter/predicate contract queries.

This is jane's REST/FDSN search surface: HTTP params → typed predicates
[ref: src/jane/documents/ index-search queryset builder +
src/jane/fdsnws/views/*, conf=M/H; SURVEY.md §0 caveat]. Queries B2–B6
and B10 deliberately go through the engine's predicate compiler
(jane_spark.plans.predicates) — the front door, not ad-hoc filters —
so the contract exercises the same code path a user would.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from jane_spark.contracts.registry import REGISTRY, contract
from jane_spark.engine.catalog import Catalog
from jane_spark.functions.geo import great_circle_degrees
from jane_spark.plans.predicates import search

EVENTS_META = {
    "event_id": "int",
    "ts": "UTCDateTime",
    "user_id": "int",
    "event_type": "str",
    "value": "float",
}
LINEITEM_META = {
    "l_returnflag": "str",
    "l_linestatus": "str",
    "l_shipdate": "UTCDateTime",
    "l_discount": "float",
    "l_quantity": "float",
}

# deterministic synthetic coordinates derived from the customer key —
# stands in for jane's station/event lat-lon (identical text on both
# engines; CAST AS DOUBLE first so the division is IEEE double, not
# decimal arithmetic).
LAT_EXPR = "CAST((c_custkey * 7919) % 18000 AS DOUBLE) / 100.0 - 90.0"
LON_EXPR = "CAST((c_custkey * 104729) % 36000 AS DOUBLE) / 100.0 - 180.0"


@contract(
    "q_b1_json_extract",
    oracle="""
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               count(*) AS n
        FROM events GROUP BY event_type
    """,
    survey_rows="B1,H7",
    doc="typed field extraction from a JSON payload (jsonb ->> + cast)",
)
def q_b1(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
    )


@contract(
    "q_b2_eq_filter",
    oracle="""
        SELECT l_linestatus, count(*) AS n
        FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_linestatus
    """,
    survey_rows="B2",
)
def q_b2(spark, sf_dir):
    li = Catalog(spark, sf_dir).lineitem
    filtered = search(li, {"l_returnflag": "R"}, LINEITEM_META)
    return filtered.groupBy("l_linestatus").agg(F.count(F.lit(1)).alias("n"))


@contract(
    "q_b3_range_filter",
    oracle="""
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
               count(*) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    survey_rows="B3",
    doc="min_/max_ closed-interval params (TPC-H-Q6 shape) via compiler",
)
def q_b3(spark, sf_dir):
    li = Catalog(spark, sf_dir).lineitem
    filtered = search(
        li,
        {
            "min_l_shipdate": "1996-01-01T00:00:00",
            "l_shipdate_before": "1997-01-01T00:00:00",
            "min_l_discount": "0.05",
            "max_l_discount": "0.07",
            "l_quantity_before": "24",
        },
        LINEITEM_META,
    )
    return filtered.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@contract(
    "q_b4_wildcard",
    oracle="""
        SELECT p_brand, count(*) AS n
        FROM part WHERE p_name LIKE '%re%' GROUP BY p_brand
    """,
    survey_rows="B4",
    doc="FDSN wildcards *? translated to LIKE by the compiler",
)
def q_b4(spark, sf_dir):
    part = Catalog(spark, sf_dir).part
    filtered = search(part, {"p_name": "*re*"}, {"p_name": "str", "p_brand": "str"})
    return filtered.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n"))


@contract(
    "q_b5_isin",
    oracle="""
        SELECT event_type, count(*) AS n, round(sum(value), 3) AS sum_value
        FROM events WHERE event_type IN ('click', 'view') GROUP BY event_type
    """,
    survey_rows="B5",
    doc="comma-separated alternatives (network=BW,GR shape) → isin",
)
def q_b5(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    filtered = search(ev, {"event_type": "click,view"}, EVENTS_META)
    return filtered.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 3).alias("sum_value")
    )


@contract(
    "q_b6_not_in",
    oracle="""
        SELECT user_id % 10 AS user_bucket, count(*) AS n
        FROM events WHERE event_type NOT IN ('click', 'view')
        GROUP BY user_id % 10
    """,
    survey_rows="B6",
    doc="negated list (-prefixed exclusions) → null-safe NOT",
)
def q_b6(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    filtered = search(ev, {"event_type": "-click,-view"}, EVENTS_META)
    return filtered.groupBy((F.col("user_id") % 10).alias("user_bucket")).agg(
        F.count(F.lit(1)).alias("n")
    )


@contract(
    "q_b7_overlap",
    oracle="""
        SELECT o_orderstatus, count(*) AS n
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate >= TIMESTAMP '1997-03-01'
              AND l_shipdate < TIMESTAMP '1997-06-01')
        GROUP BY o_orderstatus
    """,
    survey_rows="B7",
    doc="time-interval overlap as an exists-style semi join",
)
def q_b7(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem.filter(
        "l_shipdate >= TIMESTAMP_NTZ '1997-03-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP_NTZ '1997-06-01 00:00:00'"
    )
    hit = cat.orders.join(
        li, cat.orders.o_orderkey == li.l_orderkey, "left_semi"
    )
    return hit.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))


@contract(
    "q_b8_bbox",
    oracle=f"""
        SELECT c_nationkey, count(*) AS n FROM (
            SELECT c_nationkey, {LAT_EXPR} AS lat, {LON_EXPR} AS lon FROM customer)
        WHERE lat BETWEEN -45.0 AND 45.0 AND lon BETWEEN -90.0 AND 90.0
        GROUP BY c_nationkey
    """,
    survey_rows="B8",
    doc="geographic bounding box (two betweens on lat/lon doubles)",
)
def q_b8(spark, sf_dir):
    cust = Catalog(spark, sf_dir).customer
    pts = cust.select(
        "c_nationkey", F.expr(LAT_EXPR).alias("lat"), F.expr(LON_EXPR).alias("lon")
    )
    boxed = pts.filter(
        F.col("lat").between(-45.0, 45.0) & F.col("lon").between(-90.0, 90.0)
    )
    return boxed.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n"))


@contract(
    "q_b9_radial",
    oracle=f"""
        WITH pts AS (
            SELECT c_custkey, {LAT_EXPR} AS lat, {LON_EXPR} AS lon FROM customer),
        d AS (
            SELECT c_custkey,
                   round(degrees(2 * asin(sqrt(
                       sin((radians(10.0) - radians(lat)) / 2)
                         * sin((radians(10.0) - radians(lat)) / 2)
                       + cos(radians(lat)) * cos(radians(10.0))
                         * sin((radians(20.0) - radians(lon)) / 2)
                         * sin((radians(20.0) - radians(lon)) / 2)))), 6) AS dist_deg
            FROM pts)
        SELECT c_custkey, dist_deg FROM d WHERE dist_deg BETWEEN 20.0 AND 60.0
    """,
    survey_rows="B9,H5",
    doc="fdsnws radial search: great-circle degrees from built-in trig "
    "(PostGIS distance in the reference) — stays in codegen, no UDF",
)
def q_b9(spark, sf_dir):
    cust = Catalog(spark, sf_dir).customer
    pts = cust.select(
        "c_custkey", F.expr(LAT_EXPR).alias("lat"), F.expr(LON_EXPR).alias("lon")
    )
    d = pts.select(
        "c_custkey",
        F.round(
            great_circle_degrees(
                F.col("lat"), F.col("lon"), F.lit(10.0), F.lit(20.0)
            ),
            6,
        ).alias("dist_deg"),
    )
    return d.filter(F.col("dist_deg").between(20.0, 60.0))


@contract(
    "q_b10_edges",
    oracle="""
        SELECT o_orderpriority, count(*) AS n
        FROM orders
        WHERE o_orderdate > TIMESTAMP '1996-03-01'
          AND o_orderdate + INTERVAL 30 DAY < TIMESTAMP '1996-12-01'
        GROUP BY o_orderpriority
    """,
    survey_rows="B10,B11",
    doc="epoch-edge filters (startafter/endbefore) on a derived epoch",
)
def q_b10(spark, sf_dir):
    orders = Catalog(spark, sf_dir).orders
    epochs = orders.withColumn(
        "end_date", F.expr("o_orderdate + INTERVAL 30 DAYS")
    )
    filtered = epochs.filter(
        (F.col("o_orderdate") > F.expr("TIMESTAMP_NTZ '1996-03-01 00:00:00'"))
        & (F.col("end_date") < F.expr("TIMESTAMP_NTZ '1996-12-01 00:00:00'"))
    )
    return filtered.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


@contract(
    "q_b12_semi_acl",
    oracle="""
        SELECT o_orderstatus, count(*) AS n
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        GROUP BY o_orderstatus
    """,
    survey_rows="B12",
    doc="visibility/permission filter as a semi join against an ACL set",
)
def q_b12(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    acl = cat.customer.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    visible = cat.orders.join(
        acl, cat.orders.o_custkey == acl.c_custkey, "left_semi"
    )
    return visible.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))


@contract(
    "q_b9_radial_wrap",
    oracle=f"""
        WITH pts AS (
            SELECT c_custkey, {LAT_EXPR} AS lat, {LON_EXPR} AS lon FROM customer),
        d AS (
            SELECT c_custkey, lat, lon,
                   degrees(2 * asin(sqrt(
                       sin((radians(5.0) - radians(lat)) / 2)
                         * sin((radians(5.0) - radians(lat)) / 2)
                       + cos(radians(lat)) * cos(radians(5.0))
                         * sin((radians(178.5) - radians(lon)) / 2)
                         * sin((radians(178.5) - radians(lon)) / 2)))) AS dist_deg
            FROM pts)
        SELECT c_custkey, round(dist_deg, 6) AS dist_deg
        FROM d WHERE dist_deg >= 0.0 AND dist_deg <= 12.0
    """,
    survey_rows="B9,H5",
    doc="radial search with the annulus CROSSING the antimeridian "
    "(center lon 178.5, r 12): exercises functions.geo.radial_search's "
    "wrapped lon pre-prune (ADVICE r1 fix) against a prune-free DuckDB "
    "haversine — any far-side point dropped by the bbox would "
    "hash-mismatch (round 2). The 12.0 cut sits >=0.12 deg from any "
    "data point (boundary-margin guard: tests/test_contracts.py::"
    "test_float_boundary_margins), so cross-engine ulp drift cannot "
    "flip membership",
)
def q_b9w(spark, sf_dir):
    from jane_spark.functions.geo import great_circle_degrees, radial_search

    cust = Catalog(spark, sf_dir).customer
    pts = cust.select(
        "c_custkey", F.expr(LAT_EXPR).alias("lat"), F.expr(LON_EXPR).alias("lon")
    )
    hits = radial_search(pts, "lat", "lon", 5.0, 178.5, 0.0, 12.0)
    return hits.select(
        "c_custkey",
        F.round(
            great_circle_degrees(
                F.col("lat"), F.col("lon"), F.lit(5.0), F.lit(178.5)
            ),
            6,
        ).alias("dist_deg"),
    )


@contract(
    "q_b13_gridjoin",
    oracle="""
        WITH p AS (SELECT c_custkey AS id,
                          CAST(CAST(concat('0x', substr(md5('glat:' ||
                              CAST(c_custkey AS VARCHAR)), 1, 8))
                              AS BIGINT) % 2000 AS DOUBLE)
                              / 100.0 - 10.0 AS lat,
                          CAST(CAST(concat('0x', substr(md5('glon:' ||
                              CAST(c_custkey AS VARCHAR)), 1, 8))
                              AS BIGINT) % 2000 AS DOUBLE)
                              / 100.0 - 10.0 AS lon
                   FROM customer)
        SELECT a.id AS a_id, b.id AS b_id,
               round((a.lat - b.lat) * (a.lat - b.lat)
                     + (a.lon - b.lon) * (a.lon - b.lon), 9) AS d2
        FROM p a JOIN p b
          ON a.id < b.id
         AND abs(a.lat - b.lat) <= 0.3
         AND abs(a.lon - b.lon) <= 0.3
        WHERE (a.lat - b.lat) * (a.lat - b.lat)
              + (a.lon - b.lon) * (a.lon - b.lon) <= 0.09
    """,
    survey_rows="B9,C4,K2",
    doc="grid-blocked proximity PAIR JOIN (operators.geogrid."
    "grid_pair_join): all pairs within 0.3 degrees (euclidean lat/lon "
    "over a dense md5-scattered 20x20-degree region — the global b9 "
    "MULTIPLICATIVE lattice maximizes point spacing and has zero "
    "close pairs at small sf), found by snapping points to "
    "radius-sized cells, "
    "replicating the probe side into its 3x3 neighborhood, and "
    "equi-joining on the cell key — candidates scale with local "
    "density, never |V|^2, no false negatives by floor monotonicity. "
    "The oracle runs the direct inequality join (DuckDB's IEJoin) — "
    "an independent algorithm, so parity cross-checks blocking "
    "against exhaustive search. Squared distance kept (no sqrt), "
    "rounded 9 dp for the hash",
)
def q_b13_gridjoin(spark, sf_dir):
    from jane_spark.operators.geogrid import grid_pair_join

    cust = Catalog(spark, sf_dir).customer
    coord = (
        "CAST(CAST(conv(substring(md5(concat('{salt}:', "
        "CAST(c_custkey AS STRING))), 1, 8), 16, 10) AS BIGINT) "
        "% 2000 AS DOUBLE) / 100.0 - 10.0"
    )
    pts = cust.select(
        "c_custkey",
        F.expr(coord.format(salt="glat")).alias("lat"),
        F.expr(coord.format(salt="glon")).alias("lon"),
    )
    return grid_pair_join(pts, "c_custkey", "lat", "lon", 0.3)


@contract(
    "q_b13_gridjoin_salted",
    oracle=REGISTRY["q_b13_gridjoin"].oracle,
    survey_rows="B13,B9",
    doc="hot-cell SKEW GUARD for the grid pair join "
    "(operators.geogrid.grid_pair_join_salted): the left side of the "
    "cell equi-join is split into 8 deterministic xxhash salt "
    "buckets, the 3x3-replicated probe side replicates 8x more, so a "
    "pathological dense cell's task shrinks 8x with IDENTICAL output "
    "— the same IEJoin oracle as q_b13_gridjoin certifies "
    "salted == unsalted == exhaustive on real data (the pathological "
    "single-cell fixture is pytest-pinned in tests/test_operators)",
)
def q_b13_gridjoin_salted(spark, sf_dir):
    from jane_spark.operators.geogrid import grid_pair_join_salted

    cust = Catalog(spark, sf_dir).customer
    coord = (
        "CAST(CAST(conv(substring(md5(concat('{salt}:', "
        "CAST(c_custkey AS STRING))), 1, 8), 16, 10) AS BIGINT) "
        "% 2000 AS DOUBLE) / 100.0 - 10.0"
    )
    pts = cust.select(
        "c_custkey",
        F.expr(coord.format(salt="glat")).alias("lat"),
        F.expr(coord.format(salt="glon")).alias("lon"),
    )
    return grid_pair_join_salted(pts, "c_custkey", "lat", "lon", 0.3, n_salt=8)
