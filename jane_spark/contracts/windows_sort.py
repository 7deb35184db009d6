"""§2.5 E + §2.6 F — window-function and sort/limit/top-k contracts.

jane's orderby/limit params, paging, longestonly, cumulative coverage
[ref: src/jane/fdsnws/views/event_1.py orderby/limit;
dataselect_1.py longestonly, conf=H; SURVEY.md §0 caveat]. Every
ordering carries an id tie-break — determinism rule (FIXTURES.md).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from jane_spark.contracts.registry import contract
from jane_spark.engine.catalog import Catalog
from jane_spark.operators.sessionize import with_gaps
from jane_spark.operators.topk import argmax, paged, top_k_per_group


@contract(
    "q_e3_cumsum",
    oracle="""
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS running_total
        FROM orders
    """,
    survey_rows="E3",
    doc="running cumulative coverage per channel (explicit frame spec)",
)
def q_e3(spark, sf_dir):
    orders = Catalog(spark, sf_dir).clustered("orders", "o_custkey")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@contract(
    "q_f1_order_limit",
    oracle="""
        SELECT event_id, event_type, value
        FROM events ORDER BY value DESC, event_id LIMIT 100
    """,
    survey_rows="F1",
    doc="fdsnws-event orderby=magnitude + limit; id tie-break",
)
def q_f1(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    return (
        ev.orderBy(F.col("value").desc(), F.col("event_id").asc())
        .select("event_id", "event_type", "value")
        .limit(100)
    )


@contract(
    "q_f2_page",
    oracle="""
        SELECT o_orderkey, o_orderdate, o_totalprice
        FROM (SELECT *, row_number() OVER (
                  ORDER BY o_orderdate, o_orderkey) AS rn FROM orders)
        WHERE rn > 100 AND rn <= 200
    """,
    survey_rows="F2",
    doc="stable limit+offset paging (rows 101–200 of a total order)",
)
def q_f2(spark, sf_dir):
    orders = Catalog(spark, sf_dir).orders
    page = paged(
        orders, [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()], 100, 100
    )
    return page.select("o_orderkey", "o_orderdate", "o_totalprice")


@contract(
    "q_f3_topk_group",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice, rn
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (
                         PARTITION BY o_custkey
                         ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders)
        WHERE rn <= 3
    """,
    survey_rows="F3,E1",
    doc="top-k per group (largest magnitude per region shape)",
)
def q_f3(spark, sf_dir):
    orders = Catalog(spark, sf_dir).clustered("orders", "o_custkey")
    top = top_k_per_group(
        orders,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        3,
    )
    return top.select("o_custkey", "o_orderkey", "o_totalprice", "rn")


@contract(
    "q_f4_longest",
    oracle="""
        WITH g AS (
            SELECT user_id, event_id,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
            FROM events),
        f AS (
            SELECT *, row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY gap_us DESC, event_id) AS rn
            FROM g WHERE gap_us IS NOT NULL)
        SELECT user_id, event_id, gap_us FROM f WHERE rn = 1
    """,
    survey_rows="F4,D6",
    doc="longestonly: argmax segment per channel (on a computed delta)",
)
def q_f4(spark, sf_dir):
    ev = Catalog(spark, sf_dir).clustered("events", "user_id")
    gaps = with_gaps(ev, "user_id", "ts", "event_id").filter(
        F.col("gap_us").isNotNull()
    )
    longest = argmax(
        gaps, ["user_id"], [F.col("gap_us").desc(), F.col("event_id").asc()]
    )
    return longest.select("user_id", "event_id", "gap_us")


@contract(
    "q_f5_ntile",
    oracle="""
        SELECT o_orderkey, o_orderpriority,
               ntile(4) OVER w AS quartile,
               round(percent_rank() OVER w, 6) AS pr
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice, o_orderkey)
    """,
    survey_rows="F5,E1",
    doc="distribution ranks (ntile quartiles + percent_rank) per "
    "priority class — quality-threshold calibration shape; total order "
    "via id tie-break keeps both engines bit-identical (round 2)",
)
def q_f5(spark, sf_dir):
    orders = Catalog(spark, sf_dir).clustered("orders", "o_orderpriority")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
    )


@contract(
    "q_e5_rolling",
    oracle="""
        SELECT event_id, user_id,
               count(*) OVER w AS n_1h,
               round(sum(value) OVER w, 3) AS sum_1h
        FROM (SELECT event_id, user_id, value,
                     date_trunc('microseconds', ts) AS ts
              FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                               AND CURRENT ROW)
    """,
    survey_rows="E5",
    doc="trailing-interval rolling aggregate (RANGE frame over time, "
    "not rows): events + value sum in each row's trailing hour per "
    "user — operators.rolling.trailing_window_agg; Spark expresses the "
    "interval frame over unix_micros (round 2)",
)
def q_e5(spark, sf_dir):
    from jane_spark.operators.rolling import trailing_window_agg

    ev = Catalog(spark, sf_dir).clustered("events", "user_id")
    out = trailing_window_agg(
        ev,
        ["user_id"],
        "ts",
        {"n_1h": F.count(F.lit(1)), "sum_1h": F.sum("value")},
        interval="1 hour",
    )
    return out.select(
        "event_id", "user_id", "n_1h", F.round("sum_1h", 3).alias("sum_1h")
    )


@contract(
    "q_e8_m4",
    oracle="""
        WITH base AS (SELECT event_type,
                             CAST(epoch_us(ts) AS BIGINT) AS e,
                             event_id AS id,
                             CAST(round(value * 100) AS BIGINT) AS c
                      FROM events),
        ext AS (SELECT min(e) AS lo, max(e) AS hi FROM base),
        bk AS (SELECT event_type, e, id, c,
                      least(((e - lo) * 48) // (hi - lo + 1),
                            CAST(47 AS BIGINT)) AS bucket
               FROM base, ext),
        rn AS (SELECT *,
                      row_number() OVER (PARTITION BY event_type, bucket
                                         ORDER BY e, id) AS rf,
                      row_number() OVER (PARTITION BY event_type, bucket
                                         ORDER BY e DESC, id DESC) AS rl
               FROM bk)
        SELECT event_type, bucket,
               CAST(count(*) AS BIGINT) AS n,
               min(c) AS min_cents, max(c) AS max_cents,
               max(CASE WHEN rf = 1 THEN e END) AS first_us,
               max(CASE WHEN rf = 1 THEN c END) AS first_cents,
               max(CASE WHEN rl = 1 THEN e END) AS last_us,
               max(CASE WHEN rl = 1 THEN c END) AS last_cents
        FROM rn GROUP BY event_type, bucket
    """,
    survey_rows="E5,F4,A7",
    doc="M4 visualization downsampling (Jugel et al., VLDB 2014 — "
    "operators.rolling.m4_downsample): per event_type and 48 "
    "equal-width time buckets, the min/max/first/last integer-cent "
    "points a pixel-column line rendering needs, ties broken by "
    "(ts, event_id). This is the waveform-browser decimation path "
    "(jane serves preview plots over day-scale waveform windows) and "
    "the dashboard viewport downsample: output is |keys| x 48 rows "
    "REGARDLESS of input size — one broadcast extent agg + one "
    "(key, bucket) shuffle with map-side partial min/max, no sort. "
    "Spark picks first/last via lexicographic min/max over a packed "
    "(ts, id, cents) struct; the oracle replays it with row_number",
)
def q_e8_m4(spark, sf_dir):
    from jane_spark.operators.rolling import m4_downsample

    ev = Catalog(spark, sf_dir).events
    return m4_downsample(
        ev,
        "ts",
        "event_id",
        ["event_type"],
        F.round(F.col("value") * 100, 0),
        n_buckets=48,
    )


@contract(
    "q_e10_stalta",
    oracle="""
        WITH base AS (SELECT event_type,
                             CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                             event_id AS id,
                             CAST(round(value * 100) AS BIGINT) AS c
                      FROM events),
        w AS (SELECT event_type, ts_us, id,
                     sum(c) OVER (PARTITION BY event_type
                                  ORDER BY ts_us, id
                                  ROWS BETWEEN 4 PRECEDING
                                           AND CURRENT ROW) AS sta,
                     sum(c) OVER (PARTITION BY event_type
                                  ORDER BY ts_us, id
                                  ROWS BETWEEN 49 PRECEDING
                                           AND CURRENT ROW) AS lta,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY ts_us, id) AS rn
              FROM base),
        r AS (SELECT event_type, id, ts_us,
                     CAST((sta * 50 * 10000) // (lta * 5) AS BIGINT)
                         AS ratio_e4
              FROM w WHERE rn >= 50 AND lta > 0)
        SELECT event_type, id, ts_us, ratio_e4
        FROM r WHERE ratio_e4 > 15000
    """,
    survey_rows="E5,E2,I4",
    doc="STA/LTA trigger detection (Allen 1978; ObsPy's "
    "classic_sta_lta — operators.rolling.sta_lta_triggers): per "
    "event_type, rows where the 5-sample short-term mean exceeds 1.5x "
    "the 50-sample long-term mean — the standard seismic onset "
    "detector and the metrics-pipeline spike alarm. The ratio is "
    "integer 1e-4 fixed point ((sta*lta_n*10000) div (lta*sta_n)); "
    "warm-up rows before one full LTA window are suppressed, matching "
    "reference implementations. One keyed shuffle; both trailing sums "
    "share a single sorted window pass with sliding-frame (linear) "
    "evaluation",
)
def q_e10_stalta(spark, sf_dir):
    from jane_spark.operators.rolling import sta_lta_triggers

    ev = Catalog(spark, sf_dir).events
    return sta_lta_triggers(
        ev,
        "ts",
        "event_id",
        ["event_type"],
        F.round(F.col("value") * 100, 0),
        sta_n=5,
        lta_n=50,
        threshold_e4=15000,
        # the fixture has FIVE keys: an 8-partition key layout removes
        # the 27 empty window tasks (see the operator's hint note)
        n_partitions=8,
    )


@contract(
    "q_e9_lttb",
    oracle="""
        WITH base AS (SELECT event_type,
                             CAST(epoch_us(ts) AS BIGINT) AS e,
                             event_id AS id,
                             CAST(round(value * 100) AS BIGINT) AS c
                      FROM events),
        ext AS (SELECT min(e) AS lo, max(e) AS hi FROM base),
        bk AS (SELECT event_type, e, id, c, e - lo AS x,
                      least(((e - lo) * 48) // (hi - lo + 1),
                            CAST(47 AS BIGINT)) AS bucket
               FROM base, ext),
        ag AS (SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n,
                      sum(x) AS sx, sum(c) AS sy
               FROM bk GROUP BY event_type, bucket),
        an AS (SELECT event_type, bucket, n,
                      lag(sx) OVER w / lag(n) OVER w AS ax,
                      lag(sy) OVER w / lag(n) OVER w AS ay,
                      lead(sx) OVER w / lead(n) OVER w AS cx,
                      lead(sy) OVER w / lead(n) OVER w AS cy
               FROM ag
               WINDOW w AS (PARTITION BY event_type ORDER BY bucket)),
        j AS (SELECT bk.event_type, bk.bucket, an.n, bk.e, bk.id, bk.c,
                     CAST(bk.x AS DOUBLE) AS px,
                     CAST(bk.c AS DOUBLE) AS py,
                     ax, ay, cx, cy
              FROM bk JOIN an USING (event_type, bucket)),
        s AS (SELECT *,
                     CASE WHEN ax IS NULL THEN -px
                          WHEN cx IS NULL THEN px
                          ELSE round(abs((ax - px) * (cy - py)
                                         - (ay - py) * (cx - px)), 6)
                     END AS score
              FROM j),
        r AS (SELECT *, row_number() OVER (
                  PARTITION BY event_type, bucket
                  ORDER BY score DESC, e ASC, id ASC) AS rn
              FROM s)
        SELECT event_type, bucket, n, e AS sel_us, c AS sel_cents
        FROM r WHERE rn = 1
    """,
    survey_rows="E5,F4",
    doc="LTTB downsampling (Steinarsson 2013, parallel-anchor variant "
    "— operators.rolling.lttb_downsample): per event_type and 48 "
    "buckets keep the ONE point forming the largest triangle with the "
    "neighboring buckets' average points (first/last bucket keep the "
    "series endpoints). The shape-preserving 1-point-per-pixel "
    "companion to q_e8_m4's exact 4-point rendering. x is epoch "
    "micros rebased to the global lo (exact in doubles), y integer "
    "cents; the triangle area is one fixed-shape double expression "
    "rounded to 6 dp BEFORE the rank with (ts, id) tie-breaks — the "
    "pq_adc float discipline. One tiny anchor aggregate + lag/lead "
    "over it + one (key, bucket) row_number; no global sort, output "
    "one row per non-empty bucket at any input size",
)
def q_e9_lttb(spark, sf_dir):
    from jane_spark.operators.rolling import lttb_downsample

    ev = Catalog(spark, sf_dir).events
    return lttb_downsample(
        ev,
        "ts",
        "event_id",
        ["event_type"],
        F.round(F.col("value") * 100, 0),
        n_buckets=48,
    )


@contract(
    "q_d15_scd2",
    oracle="""
        SELECT o_custkey, o_orderkey,
               o_orderdate AS valid_from,
               lead(o_orderdate) OVER w AS valid_to,
               lead(o_orderdate) OVER w IS NULL AS is_current
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)
    """,
    survey_rows="D15,D5",
    doc="SCD2 version history: valid_from/valid_to intervals from "
    "lead() — jane's document-version timeline as a warehouse table; "
    "one shuffle, no self-join (operators.scd2.scd2_history) (round 2)",
)
def q_d15(spark, sf_dir):
    from jane_spark.operators.scd2 import scd2_history

    orders = Catalog(spark, sf_dir).clustered("orders", "o_custkey")
    hist = scd2_history(orders, ["o_custkey"], "o_orderdate", "o_orderkey")
    return hist.select(
        "o_custkey", "o_orderkey", "valid_from", "valid_to", "is_current"
    )


@contract(
    "q_e6_transitions",
    oracle="""
        WITH e AS (SELECT user_id, event_type,
                          date_trunc('microseconds', ts) AS t, event_id
                   FROM events),
        p AS (SELECT event_type AS from_state,
                     lead(event_type) OVER (
                         PARTITION BY user_id ORDER BY t, event_id)
                         AS to_state
              FROM e)
        SELECT from_state, to_state, count(*) AS n
        FROM p WHERE to_state IS NOT NULL
        GROUP BY from_state, to_state
    """,
    survey_rows="E6,E2",
    doc="Markov transition matrix over per-user event sequences "
    "(operators.sessionize.transition_counts): lead() per key ordered "
    "by (ts, id), counted per (from, to) pair — one key shuffle, the "
    "post-window shuffle carries two state columns only",
)
def q_e6(spark, sf_dir):
    from jane_spark.operators.sessionize import transition_counts

    ev = Catalog(spark, sf_dir).clustered("events", "user_id")
    return transition_counts(ev, "user_id", "ts", "event_type", "event_id")


@contract(
    "q_e7_funnel",
    oracle="""
        WITH e AS (SELECT user_id, event_type,
                          concat(lpad(CAST(epoch_us(date_trunc('microseconds',
                                                               ts))
                                           AS VARCHAR), 20, '0'),
                                 lpad(CAST(event_id AS VARCHAR), 12, '0'))
                              AS k
                   FROM events),
        s1 AS (SELECT user_id, min(k) AS k1 FROM e
               WHERE event_type = 'click' GROUP BY user_id),
        s2 AS (SELECT e.user_id, min(e.k) AS k2 FROM e
               JOIN s1 ON e.user_id = s1.user_id AND e.k > s1.k1
               WHERE e.event_type = 'view' GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, min(e.k) AS k3 FROM e
               JOIN s2 ON e.user_id = s2.user_id AND e.k > s2.k2
               WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        SELECT 1 AS stage_idx, 'click' AS stage, count(*) AS n_keys FROM s1
        UNION ALL SELECT 2, 'view', count(*) FROM s2
        UNION ALL SELECT 3, 'purchase', count(*) FROM s3
    """,
    survey_rows="E7,E4,I4",
    doc="ordered funnel over the event stream (operators.sessionize."
    "funnel_counts): keys reaching click->view->purchase as a strictly "
    "(ts,id)-increasing subsequence — one collect+fold pass per key "
    "(greedy earliest match, provably equivalent to the oracle's "
    "min-key cascade), no joins on the fact table",
)
def q_e7(spark, sf_dir):
    from jane_spark.operators.sessionize import funnel_counts

    ev = Catalog(spark, sf_dir).clustered("events", "user_id")
    return funnel_counts(
        ev, "user_id", "ts", "event_type", "event_id",
        ["click", "view", "purchase"],
    )


@contract(
    "q_e12_cusum",
    oracle="""
        WITH base AS (SELECT event_type,
                             CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                             event_id AS id,
                             CAST(round(value * 100) AS BIGINT) AS c
                      FROM events),
        t AS (SELECT *,
                     sum(c) OVER (PARTITION BY event_type) //
                         count(*) OVER (PARTITION BY event_type) AS target
              FROM base),
        p AS (SELECT event_type, ts_us, id,
                     sum(c - target) OVER (PARTITION BY event_type
                                           ORDER BY ts_us, id
                                           ROWS UNBOUNDED PRECEDING) AS ps
              FROM t),
        s AS (SELECT event_type, ts_us,
                     ps - least(0, min(ps) OVER (PARTITION BY event_type
                                                 ORDER BY ts_us, id
                                                 ROWS UNBOUNDED PRECEDING))
                         AS s
              FROM p),
        pk AS (SELECT event_type, max(s) AS peak_s FROM s
               GROUP BY event_type)
        SELECT s.event_type,
               CAST(pk.peak_s AS BIGINT) AS peak_s,
               CAST(min(s.ts_us) AS BIGINT) AS peak_ts_us
        FROM s JOIN pk ON s.event_type = pk.event_type
                      AND s.s = pk.peak_s
        GROUP BY s.event_type, pk.peak_s
    """,
    survey_rows="E12,E3,E10",
    doc="one-sided CUSUM change-point statistic per event_type (Page "
    "1954, operators.rolling.cusum_drift): the classic upward-drift "
    "detector, computed via the closed window form s_i = p_i - "
    "min_{j<=i} p_j over integer-cent deviations from the per-key "
    "integer mean — ONE sorted-window pass per key (the stalta "
    "discipline), no sequential recursion. Emits each key's peak "
    "statistic and its earliest timestamp",
)
def q_e12(spark, sf_dir):
    from jane_spark.operators.rolling import cusum_drift

    ev = Catalog(spark, sf_dir).events
    return cusum_drift(
        ev, ["event_type"], "ts", "event_id",
        F.round(F.col("value") * 100, 0),
    )


@contract(
    "q_e13_seasonal_residual",
    oracle="""
        WITH src AS (SELECT event_type, event_id,
                            CAST(hour(ts) AS BIGINT) AS hod,
                            CAST(round(value * 100) AS BIGINT) AS c
                     FROM events),
        base AS (SELECT event_type, hod,
                        CAST(sum(c) AS BIGINT) // CAST(count(*) AS BIGINT)
                            AS baseline
                 FROM src GROUP BY 1, 2)
        SELECT s.event_type,
               CAST(s.event_id AS BIGINT) AS id,
               s.c AS v,
               b.baseline,
               CAST(s.c - b.baseline AS BIGINT) AS residual
        FROM src s JOIN base b USING (event_type, hod)
        ORDER BY abs(s.c - b.baseline) DESC, s.event_id ASC
        LIMIT 20
    """,
    survey_rows="E13,D24,E10",
    doc="seasonal-NAIVE anomaly readout (the ops-metrics classic: "
    "compare each reading to its own (series, hour-of-day) baseline, "
    "so a daily rhythm is not flagged as drift the way a global "
    "median rule would): integer baseline = sum div count per "
    "(event_type, hour), residual = cents - baseline, top-20 by "
    "|residual| (event_id ties). One map-side-combinable (type, hour) "
    "aggregate (<= 24*|types| rows) broadcast back onto the scan + "
    "one TakeOrdered — no window, no row-scale shuffle",
)
def q_e13(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    src = ev.select(
        "event_type",
        F.col("event_id").cast("long").alias("id"),
        F.hour("ts").cast("bigint").alias("hod"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("c"),
    )
    base = src.groupBy("event_type", "hod").agg(
        F.expr("sum(c) div count(*)").cast("bigint").alias("baseline")
    )
    j = src.join(F.broadcast(base), ["event_type", "hod"]).select(
        "event_type",
        "id",
        F.col("c").alias("v"),
        "baseline",
        (F.col("c") - F.col("baseline")).cast("bigint").alias("residual"),
    )
    return j.orderBy(
        F.abs(F.col("residual")).desc(), F.col("id").asc()
    ).limit(20)


@contract(
    "q_e14_trend",
    oracle="""
        WITH e AS (SELECT event_type,
                          (epoch_us(ts) - epoch_us(TIMESTAMP
                              '2024-01-01 00:00:00')) // 60000000 AS x,
                          CAST(round(value * 100) AS BIGINT) AS y
                   FROM events),
        a AS (SELECT event_type,
                     CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(x) AS BIGINT) AS sx,
                     CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x * y) AS BIGINT) AS sxy,
                     CAST(sum(x * x) AS BIGINT) AS sxx
              FROM e GROUP BY 1)
        SELECT event_type, n, sx, sy, sxy, sxx,
               CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
               CAST(n * sxx - sx * sx AS BIGINT) AS slope_den
        FROM a
    """,
    survey_rows="E14,E13,D14",
    doc="per-series least-squares TREND (operators/profile.py "
    "series_trend) — the is-this-metric-drifting readout E13's "
    "seasonal residuals cannot give (a residual flags points; the "
    "slope names the direction): x = whole minutes since a fixed "
    "origin by integer epoch-us division, y = integer cents, and the "
    "OLS slope travels as the EXACT rational slope_num/slope_den "
    "(n*Sxy - Sx*Sy over n*Sxx - Sx^2 — cross-multiplying the normal "
    "equation clears the division; the float slope is a pytest "
    "formula). The five sufficient statistics are plain BIGINT sums: "
    "mergeable across shards and bit-reproducible under any partition "
    "order (the D14/K47 discipline). ONE scan + ONE map-side-"
    "combinable groupBy; |series| rows out",
)
def q_e14(spark, sf_dir):
    from jane_spark.operators.profile import series_trend

    ev = Catalog(spark, sf_dir).events
    return series_trend(
        ev,
        ["event_type"],
        "ts",
        F.round(F.col("value") * 100, 0),
        t0="2024-01-01 00:00:00",
        unit_seconds=60,
    )


@contract(
    "q_e15_robust_trend",
    oracle="""
        WITH e AS (SELECT event_type,
                          (epoch_us(ts) - epoch_us(TIMESTAMP
                              '2024-01-01 00:00:00')) // 3600000000 AS x,
                          CAST(round(value * 100) AS BIGINT) AS y0
                   FROM events),
        ser AS (SELECT event_type, x, CAST(sum(y0) AS BIGINT) AS y
                FROM e GROUP BY 1, 2),
        n_t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
                FROM ser GROUP BY 1),
        tie AS (SELECT event_type,
                       CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)
                            AS BIGINT) AS tie_term
                FROM (SELECT event_type, y,
                             CAST(count(*) AS BIGINT) AS t
                      FROM ser GROUP BY 1, 2)
                GROUP BY 1),
        p AS (SELECT a.event_type, b.y - a.y AS dy, b.x - a.x AS dx,
                     a.x AS xa
              FROM ser a JOIN ser b
                ON a.event_type = b.event_type AND a.x < b.x),
        mk AS (SELECT event_type, CAST(count(*) AS BIGINT) AS m_pairs,
                      CAST(sum(sign(dy)) AS BIGINT) AS s_mk
               FROM p GROUP BY 1),
        rk AS (SELECT event_type, dy, dx,
                      row_number() OVER (PARTITION BY event_type
                          ORDER BY CAST(dy AS DOUBLE)
                                   / CAST(dx AS DOUBLE) ASC,
                                   dy ASC, dx ASC, xa ASC) AS rn
               FROM p),
        med AS (SELECT rk.event_type, CAST(dy AS BIGINT) AS ts_dy,
                       CAST(dx AS BIGINT) AS ts_dx
                FROM rk JOIN mk ON rk.event_type = mk.event_type
                WHERE rk.rn = (mk.m_pairs + 1) // 2)
        SELECT n_t.event_type, n, m_pairs, s_mk,
               CAST(n * (n - 1) * (2 * n + 5) - tie_term AS BIGINT)
                   AS var18,
               ts_dy, ts_dx
        FROM n_t
        JOIN tie USING (event_type)
        JOIN mk USING (event_type)
        LEFT JOIN med USING (event_type)
    """,
    survey_rows="E15,E14,D18",
    doc="per-series ROBUST trend (operators/profile.robust_trend): "
    "the Mann-Kendall monotonic-trend statistic (Mann 1945; Kendall "
    "1975) with exact tie-corrected 18*Var(S), plus the Theil-Sen "
    "median slope (Sen 1968, ~29% breakdown vs OLS's zero) carried "
    "as the EXACT rational (ts_dy, ts_dx) at the discrete lower-"
    "median pair rank — the outlier-proof companion of q_e14_trend "
    "(one corrupt hour follows OLS's slope_num anywhere; it moves a "
    "median-of-slopes by one rank). Series regularize to hourly "
    "integer-cents totals first (distinct x -> dx > 0 always; ties "
    "only in y), so the per-series pair join is BOUNDED (<= 720 "
    "hourly points -> <= 259k pairs) — an equi-join on the series "
    "key, never corpus x corpus. The ratio ORDER uses one IEEE "
    "double division — exact-rounded, bit-identical cross-engine "
    "(no libm); equal rationals tie-break by (dy, dx, x). Hashed "
    "surface: all BIGINT",
)
def q_e15(spark, sf_dir):
    from jane_spark.operators.profile import robust_trend

    ev = Catalog(spark, sf_dir).events
    return robust_trend(
        ev,
        ["event_type"],
        "ts",
        F.round(F.col("value") * 100, 0),
        t0="2024-01-01 00:00:00",
        unit_seconds=3600,
    )
