"""§2.3 C — join contract queries.

jane's join surface: FK equi joins (document↔index↔attachment,
path↔file↔trace), interval-overlap, semi/anti for matchtimeseries and
sync, as-of epoch resolution [ref: src/jane/documents/models.py FKs;
src/jane/waveforms/models.py; src/jane/fdsnws/views/*, conf=H/M;
SURVEY.md §0 caveat]. Dimension sides are broadcast explicitly — at
100 TB that is the difference between a map-side join and a full
shuffle of the fact table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from jane_spark.contracts.registry import contract
from jane_spark.engine.catalog import Catalog
from jane_spark.operators.asof import asof_join


@contract(
    "q_c1_join2",
    oracle="""
        SELECT c_mktsegment, count(*) AS n,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    survey_rows="C1",
    doc="document↔index FK equi join; small side broadcast",
)
def q_c1(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    joined = cat.orders.join(
        F.broadcast(cat.customer), cat.orders.o_custkey == cat.customer.c_custkey
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@contract(
    "q_c2_left_join",
    oracle="""
        SELECT c_custkey, count(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey
    """,
    survey_rows="C2",
    doc="index↔attachments nullable 1:N (left outer, zero-counts kept)",
)
def q_c2(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    joined = cat.customer.join(
        cat.orders, cat.customer.c_custkey == cat.orders.o_custkey, "left"
    )
    return joined.groupBy("c_custkey").agg(F.count("o_orderkey").alias("n_orders"))


@contract(
    "q_c3_join4",
    oracle="""
        SELECT r_name, count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
        FROM region
        JOIN nation   ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders   ON o_custkey = c_custkey
        GROUP BY r_name
    """,
    survey_rows="C3",
    doc="FK chain multi-way equi join (Path↔File↔Trace shape), dims broadcast",
)
def q_c3(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    joined = (
        cat.orders.join(
            F.broadcast(cat.customer), cat.orders.o_custkey == cat.customer.c_custkey
        )
        .join(
            F.broadcast(cat.nation),
            cat.customer.c_nationkey == cat.nation.n_nationkey,
        )
        .join(
            F.broadcast(cat.region),
            cat.nation.n_regionkey == cat.region.r_regionkey,
        )
    )
    return joined.groupBy("r_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@contract(
    "q_c4_range_join",
    oracle="""
        SELECT l_returnflag, count(*) AS n,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM orders JOIN lineitem
          ON l_orderkey = o_orderkey
         AND l_shipdate >= o_orderdate
         AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
        GROUP BY l_returnflag
    """,
    survey_rows="C4,B7",
    doc="interval join with an equi key: Catalyst plans the equi join and "
    "applies the band as a residual — the key-less case uses "
    "operators.interval_join band bucketing (unit-tested separately)",
)
def q_c4(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    o, l = cat.orders, cat.lineitem
    cond = (
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate >= o.o_orderdate)
        & (l.l_shipdate <= F.expr("o_orderdate + INTERVAL 90 DAYS"))
    )
    return (
        o.join(l, cond)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


@contract(
    "q_c5_semi",
    oracle="""
        SELECT c_mktsegment, count(*) AS n
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment
    """,
    survey_rows="C5,G2",
    doc="matchtimeseries: keep only channels that have waveform data (semi)",
)
def q_c5(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    having = cat.customer.join(
        cat.orders, cat.customer.c_custkey == cat.orders.o_custkey, "left_semi"
    )
    return having.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))


@contract(
    "q_c7_asof",
    oracle="""
        SELECT p.event_id AS purchase_id, p.user_id AS user_id,
               max(c.ts) AS click_ts
        FROM events p
        JOIN events c
          ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts < p.ts
        WHERE p.event_type = 'purchase'
        GROUP BY p.event_id, p.user_id
    """,
    survey_rows="C7",
    doc="as-of resolution (epoch in effect at t): sort-based union as-of "
    "join — ONE shuffle, no pair explosion (operators.asof)",
)
def q_c7(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    resolved = asof_join(
        purchases, clicks, key="user_id", ts="ts", ref_cols=["ts"], strict=True
    )
    return resolved.filter(F.col("ts_ref").isNotNull()).select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts_ref").alias("click_ts"),
    )


@contract(
    "q_c9_asof_nearest",
    oracle="""
        WITH p AS (SELECT event_id AS click_id, user_id,
                          CAST(epoch_us(ts) AS BIGINT) AS pus
                   FROM events WHERE event_type = 'click'),
        r AS (SELECT event_id, user_id,
                     CAST(epoch_us(ts) AS BIGINT) AS rus
              FROM events WHERE event_type = 'purchase'),
        c AS (SELECT p.click_id, p.user_id,
                     r.event_id AS purchase_id,
                     r.rus - p.pus AS dt_us,
                     row_number() OVER (PARTITION BY p.click_id
                         ORDER BY abs(r.rus - p.pus) ASC,
                                  CASE WHEN r.rus <= p.pus
                                       THEN 0 ELSE 1 END ASC,
                                  r.event_id DESC) AS rn
              FROM p JOIN r ON r.user_id = p.user_id
               AND abs(r.rus - p.pus) <= 7200000000)
        SELECT click_id, user_id, purchase_id,
               CAST(dt_us AS BIGINT) AS dt_us
        FROM c WHERE rn = 1
    """,
    survey_rows="C7,C4",
    doc="NEAREST-direction as-of join (operators.asof."
    "asof_join_nearest — pandas merge_asof direction='nearest'; the "
    "seismology pick-to-event matcher): each click attaches the "
    "purchase minimizing |dt| within a 2 h tolerance, backward "
    "preferred on exact ties, max event_id at equal reference ts. "
    "Built as two sort-based as-of passes (forward = backward under "
    "time reversal, negated epoch) + a row-local pick — one keyed "
    "shuffle per pass, no pair explosion; the oracle runs the direct "
    "tolerance join + rank, an independent algorithm",
)
def q_c9_asof_nearest(spark, sf_dir):
    from jane_spark.operators.asof import asof_join_nearest

    ev = Catalog(spark, sf_dir).events
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join_nearest(
        clicks,
        purchases,
        key="user_id",
        ts="ts",
        ref_cols=["event_id"],
        tolerance_us=7_200_000_000,
        ref_tiebreak="event_id",
    )
    return out.where(F.col("event_id_ref").isNotNull()).select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("event_id_ref").alias("purchase_id"),
        F.col("dt_us_ref").alias("dt_us"),
    )


@contract(
    "q_c8_cross",
    oracle="""
        SELECT r_name, o_orderstatus
        FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
    """,
    survey_rows="C8",
    doc="small cross product (catalog grid)",
)
def q_c8(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    statuses = cat.orders.select("o_orderstatus").distinct()
    return cat.region.crossJoin(statuses).select("r_name", "o_orderstatus")


@contract(
    "q_c4_overlap",
    oracle="""
        WITH r AS (
            SELECT event_id,
                   date_trunc('microseconds', ts) AS e_start,
                   date_trunc('microseconds', ts) + INTERVAL 10 MINUTE AS e_end
            FROM events),
        w AS (
            SELECT event_id AS w_id,
                   date_trunc('microseconds', ts) - INTERVAL 30 MINUTE AS w_start,
                   date_trunc('microseconds', ts) + INTERVAL 30 MINUTE AS w_end
            FROM events WHERE event_id % 200 = 0)
        SELECT w_id, count(*) AS n, min(event_id) AS first_event
        FROM w JOIN r ON w_start < e_end AND w_end > e_start
        GROUP BY w_id
    """,
    survey_rows="C4,B7",
    doc="KEY-LESS interval-overlap join (dataselect request windows x "
    "trace index): operators.interval_join.overlap_join band-bucketing "
    "rewrite — explode to covering hour bins, equi-join on bin, exact "
    "residual, row-id dedupe; the oracle is the brute-force non-equi "
    "join Catalyst would BNL (round 2)",
)
def q_c4o(spark, sf_dir):
    from jane_spark.operators.interval_join import overlap_join

    ev = Catalog(spark, sf_dir).events
    right = ev.select(
        "event_id",
        F.col("ts").alias("e_start"),
        F.expr("ts + INTERVAL 10 MINUTES").alias("e_end"),
    )
    left = ev.filter(F.col("event_id") % 200 == 0).select(
        F.col("event_id").alias("w_id"),
        F.expr("ts - INTERVAL 30 MINUTES").alias("w_start"),
        F.expr("ts + INTERVAL 30 MINUTES").alias("w_end"),
    )
    pairs = overlap_join(
        left, right, "w_start", "w_end", "e_start", "e_end", bin_width="1 hour"
    )
    return pairs.groupBy("w_id").agg(
        F.count(F.lit(1)).alias("n"), F.min("event_id").alias("first_event")
    )
