"""§2.4 D — aggregation contract queries.

jane's summary endpoints, availability extents, version dedup, gap
detection, preview bucketing [ref: src/jane/documents/views.py + admin;
src/jane/waveforms/ gap analysis + preview computation, conf=M;
SURVEY.md §0 caveat]. All hash aggregations — Spark does partial
(map-side) + final automatically; the expensive rows here are the
window-based ones (argmax, gaps), each one shuffle on its key.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from jane_spark.contracts.registry import contract
from jane_spark.engine.catalog import Catalog
from jane_spark.operators.sessionize import with_gaps
from jane_spark.operators.topk import argmax

THIRTY_MIN_US = 30 * 60 * 1_000_000


@contract(
    "q_d1_count_group",
    oracle="SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
    survey_rows="D1",
)
def q_d1(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    return ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


@contract(
    "q_d2_extent",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    survey_rows="D2",
    doc="availability extent per channel (min/max/sum/avg multi-agg, Q1 shape)",
)
def q_d2(spark, sf_dir):
    li = Catalog(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.count(F.lit(1)).alias("n"),
    )


@contract(
    "q_d3_distinct",
    oracle="""
        SELECT count(DISTINCT user_id) AS n_users,
               count(DISTINCT event_type) AS n_types
        FROM events
    """,
    survey_rows="D3",
)
def q_d3(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    return ev.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
    )


@contract(
    "q_d3_approx",
    oracle=None,  # HLL sketch result is engine-specific — rows-only check
    survey_rows="D3",
    doc="scalable distinct: approx_count_distinct (HLL), the 100 TB variant",
)
def q_d3a(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    return ev.agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


@contract(
    "q_d3_kmv",
    oracle="""
        WITH h AS (SELECT DISTINCT
                       CAST(concat('0x', substr(md5(
                           'kmv:' || CAST(user_id AS VARCHAR)), 1, 8))
                           AS BIGINT) AS h
                   FROM events WHERE user_id IS NOT NULL),
        keep AS (SELECT h FROM h ORDER BY h LIMIT 64),
        agg AS (SELECT CAST(count(*) AS BIGINT) AS k_used,
                       max(h) AS kth_hash
                FROM keep),
        ex AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT)
                   AS exact_distinct
               FROM events WHERE user_id IS NOT NULL)
        SELECT k_used, kth_hash,
               CASE WHEN k_used < 64 THEN k_used
                    ELSE CAST(63 * 4294967296 AS BIGINT)
                         // greatest(kth_hash, CAST(1 AS BIGINT)) END
                   AS est_distinct,
               exact_distinct
        FROM agg, ex
    """,
    survey_rows="D3",
    doc="ORACLE-backed distinct-count sketch: k-minimum-values over "
    "portable md5 hashes (operators.sketch.kmv_sketch, k=64) with the "
    "(k-1)*2^32/h_(k) estimator in INTEGER division — unlike "
    "approx_count_distinct's engine-private HLL++ (q_d3_approx, "
    "rows-only), every value here is cross-engine reproducible. One "
    "hash-distinct shuffle + TakeOrderedAndProject; mergeability "
    "pytest-pinned",
)
def q_d3_kmv(spark, sf_dir):
    from jane_spark.operators.sketch import kmv_estimate, kmv_sketch

    ev = Catalog(spark, sf_dir).events
    est = kmv_estimate(kmv_sketch(ev, "user_id", k=64), k=64)
    exact = ev.where(F.col("user_id").isNotNull()).agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return est.crossJoin(F.broadcast(exact))


@contract(
    "q_d3_hll",
    oracle="""
        WITH h AS (SELECT CAST(concat('0x', substr(md5(
                       'hll:' || CAST(user_id AS VARCHAR)), 1, 8))
                       AS BIGINT) AS h
                   FROM events WHERE user_id IS NOT NULL),
        b AS (SELECT h // 67108864 AS bucket, h % 67108864 AS w FROM h),
        r AS (SELECT bucket,
                     max(CASE WHEN w = 0 THEN 27
                              ELSE 27 - length(to_base(w, 2)) END) AS rho
              FROM b GROUP BY bucket)
        SELECT g.b AS bucket, CAST(coalesce(r.rho, 0) AS BIGINT) AS rho
        FROM generate_series(0, 63) g(b)
        LEFT JOIN r ON r.bucket = g.b
    """,
    survey_rows="D3",
    doc="ORACLE-backed HyperLogLog register table (m=64, p=6) from "
    "portable hashes (operators.sketch.hll_registers): bucket = top 6 "
    "bits, rho = leading-zero rank of the low 26 bits via BASE-2 "
    "STRING LENGTH (conv/to_base) — integer-only, no float log2 whose "
    "floor could disagree at powers of two. The register table is the "
    "mergeable sketch state (elementwise max) a 1000-executor count-"
    "distinct ships instead of raw keys; estimate readout + merge law "
    "pytest-pinned (operators.sketch.hll_estimate)",
)
def q_d3_hll(spark, sf_dir):
    from jane_spark.operators.sketch import hll_registers

    ev = Catalog(spark, sf_dir).events
    return hll_registers(ev, "user_id", p=6)


@contract(
    "q_d3_hll_groups",
    oracle="""
        WITH h AS (SELECT event_type,
                          CAST(concat('0x', substr(md5(
                              'hll:' || CAST(user_id AS VARCHAR)), 1, 8))
                              AS BIGINT) AS h
                   FROM events WHERE user_id IS NOT NULL),
        b AS (SELECT event_type, h // 67108864 AS bucket,
                     h % 67108864 AS w
              FROM h),
        r AS (SELECT event_type, bucket,
                     max(CASE WHEN w = 0 THEN 27
                              ELSE 27 - length(to_base(w, 2)) END) AS rho
              FROM b GROUP BY event_type, bucket),
        grid AS (SELECT et.event_type, g.b AS bucket
                 FROM (SELECT DISTINCT event_type FROM events) et
                 CROSS JOIN generate_series(0, 63) g(b))
        SELECT grid.event_type, grid.bucket,
               CAST(coalesce(r.rho, 0) AS BIGINT) AS rho
        FROM grid LEFT JOIN r
            ON r.event_type = grid.event_type AND r.bucket = grid.bucket
    """,
    survey_rows="D3,D1",
    doc="GROUPED distinct-count sketch — q_d3_hll per event_type "
    "(operators.sketch.hll_registers(group_cols=...)): the 100 TB "
    "'distinct users per segment' dashboard shape. One (group x 64)-"
    "key groupBy whose state is 64 counters per group per task "
    "regardless of user cardinality; the full group x bucket grid is "
    "emitted so register tables from different runs align row-for-row "
    "for the elementwise-max merge",
)
def q_d3_hll_groups(spark, sf_dir):
    from jane_spark.operators.sketch import hll_registers

    ev = Catalog(spark, sf_dir).events
    return hll_registers(ev, "user_id", p=6, group_cols=["event_type"])


@contract(
    "q_d3_kmv_ops",
    oracle="""
        WITH ka AS (SELECT DISTINCT CAST(user_id AS VARCHAR) || '@' ||
                        CAST(CAST(ts AS DATE) AS VARCHAR) AS key
                    FROM events
                    WHERE event_type = 'click' AND user_id IS NOT NULL),
        kb AS (SELECT DISTINCT CAST(user_id AS VARCHAR) || '@' ||
                   CAST(CAST(ts AS DATE) AS VARCHAR) AS key
               FROM events
               WHERE event_type = 'view' AND user_id IS NOT NULL),
        sa AS (SELECT DISTINCT CAST(concat('0x', substr(md5(
                   'kmv:' || key), 1, 8)) AS BIGINT) AS h
               FROM ka ORDER BY h LIMIT 64),
        sb AS (SELECT DISTINCT CAST(concat('0x', substr(md5(
                   'kmv:' || key), 1, 8)) AS BIGINT) AS h
               FROM kb ORDER BY h LIMIT 64),
        u AS (SELECT h FROM (SELECT h FROM sa UNION SELECT h FROM sb)
              ORDER BY h LIMIT 64),
        agg AS (SELECT CAST(count(*) AS BIGINT) AS k_used,
                       max(h) AS theta
                FROM u),
        rho AS (SELECT CAST(count(*) AS BIGINT) AS rho
                FROM u
                WHERE h IN (SELECT h FROM sa)
                  AND h IN (SELECT h FROM sb)),
        est AS (SELECT k_used, theta, rho,
                       CASE WHEN k_used < 64 THEN k_used
                            ELSE CAST(63 * 4294967296 AS BIGINT)
                                 // greatest(theta, CAST(1 AS BIGINT))
                            END AS union_est
                FROM agg, rho),
        ex AS (SELECT
                   CAST((SELECT count(*) FROM
                        (SELECT key FROM ka UNION SELECT key FROM kb))
                       AS BIGINT) AS exact_union,
                   CAST((SELECT count(*) FROM
                        (SELECT key FROM ka
                         INTERSECT SELECT key FROM kb))
                       AS BIGINT) AS exact_inter)
        SELECT k_used, theta, union_est, rho,
               (rho * 10000) // k_used AS jaccard_e4,
               (rho * union_est) // k_used AS inter_est,
               exact_union, exact_inter
        FROM est, ex
    """,
    survey_rows="D3,G2,G1",
    doc="mergeable-sketch SET ALGEBRA (operators.sketch.kmv_set_ops, "
    "theta-sketch style per Beyer et al. 2007): overlap of two "
    "user-day audiences ('click' vs 'view') estimated entirely from "
    "their 64-hash KMV sketches — union via the kth-smallest "
    "threshold, intersection/Jaccard via the rho overlap count inside "
    "the union sketch, all in integer fixed-point so the oracle "
    "replays every cell bit-for-bit. The 100 TB story: each audience "
    "ships <= 64 longs, so ANY pair of sets (shards, days, corpora) "
    "yields overlap without re-touching raw data; exact_union/"
    "exact_inter columns ground the estimates in the same query",
)
def q_d3_kmv_ops(spark, sf_dir):
    from jane_spark.operators.sketch import kmv_set_ops, kmv_sketch

    ev = Catalog(spark, sf_dir).events.where(F.col("user_id").isNotNull())
    key = F.concat(
        F.col("user_id").cast("string"),
        F.lit("@"),
        F.col("ts").cast("date").cast("string"),
    ).alias("key")
    ka = ev.where(F.col("event_type") == "click").select(key)
    kb = ev.where(F.col("event_type") == "view").select(key)
    ops = kmv_set_ops(
        kmv_sketch(ka, "key", k=64), kmv_sketch(kb, "key", k=64), k=64
    )
    ua, ub = ka.distinct(), kb.distinct()
    exact = ua.union(ub).distinct().agg(
        F.count(F.lit(1)).alias("exact_union")
    ).crossJoin(
        ua.intersect(ub).agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    return ops.crossJoin(F.broadcast(exact))


@contract(
    "q_d16_rollup_cascade",
    oracle="""
        WITH c AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP)
                       AS bucket, event_type,
                          CAST(round(value * 100) AS BIGINT) AS cents
                   FROM events)
        SELECT bucket, event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS sum_cents,
               min(cents) AS min_cents, max(cents) AS max_cents,
               CAST((sum(cents) * 100) // count(*) AS BIGINT) AS avg_e4
        FROM c GROUP BY bucket, event_type
    """,
    survey_rows="D1,D2,D6,D7",
    doc="hypertable-style continuous-aggregate cascade "
    "(operators.rolling.time_rollup/rollup_cascade): raw events roll "
    "up ONCE to hourly (n, sum, min, max in integer cents — a "
    "commutative monoid), daily derives from the HOURLY ROLLUP by the "
    "monoid merge, avg at read time as sum/n (never avg-of-avgs). The "
    "oracle aggregates raw events directly at daily grain — parity IS "
    "the cascade law. Integer cents make the two-level re-aggregation "
    "bit-reproducible (float partial sums in a different merge order "
    "are not); at scale the daily query touches <= 24 rollup rows per "
    "key instead of a day of raw events, and an appended hour "
    "incrementally maintains every coarser level. avg is emitted as "
    "FIXED-POINT 1e-4 units ((sum*100) div n): the float form hit a "
    "genuine half-boundary double-rounding divergence between the "
    "engines' round() implementations at sf0.01",
)
def q_d16_rollup_cascade(spark, sf_dir):
    from jane_spark.operators.rolling import rollup_cascade, time_rollup

    ev = Catalog(spark, sf_dir).events
    hourly = time_rollup(
        ev, "ts", "hour", ["event_type"], F.round(F.col("value") * 100, 0)
    )
    daily = rollup_cascade(hourly, "day", ["event_type"])
    return daily.select(
        # day-grain bucket as TIMESTAMP on both engines (DuckDB's
        # date_trunc('day') yields DATE — a type-tag hash mismatch)
        F.col("bucket").cast("timestamp_ntz").alias("bucket"),
        "event_type",
        "n",
        "sum_cents",
        "min_cents",
        "max_cents",
        F.expr("(sum_cents * 100) div n").alias("avg_e4"),
    )


@contract(
    "q_d17_profile",
    oracle="""
        WITH src AS (SELECT event_id, user_id, event_type,
                            CAST(round(value * 100) AS BIGINT) AS cents
                     FROM events)
        SELECT 'event_id' AS col_name, CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) - count(event_id) AS BIGINT) AS n_null,
               CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
               CAST(min(event_id) AS VARCHAR) AS min_val,
               CAST(max(event_id) AS VARCHAR) AS max_val
        FROM src
        UNION ALL
        SELECT 'user_id', CAST(count(*) AS BIGINT),
               CAST(count(*) - count(user_id) AS BIGINT),
               CAST(count(DISTINCT user_id) AS BIGINT),
               CAST(min(user_id) AS VARCHAR),
               CAST(max(user_id) AS VARCHAR)
        FROM src
        UNION ALL
        SELECT 'event_type', CAST(count(*) AS BIGINT),
               CAST(count(*) - count(event_type) AS BIGINT),
               CAST(count(DISTINCT event_type) AS BIGINT),
               min(event_type), max(event_type)
        FROM src
        UNION ALL
        SELECT 'cents', CAST(count(*) AS BIGINT),
               CAST(count(*) - count(cents) AS BIGINT),
               CAST(count(DISTINCT cents) AS BIGINT),
               CAST(min(cents) AS VARCHAR),
               CAST(max(cents) AS VARCHAR)
        FROM src
    """,
    survey_rows="D1,D3,D14",
    doc="ONE-PASS column profiling (operators.profile — the deequ/"
    "dbt-test ingestion report): per-column row/null/distinct counts "
    "and native-type extents for four events columns in a single "
    "scan. Spark compiles the multi-count(DISTINCT) into one Expand + "
    "one shuffle (data duplicated once per profiled column — the "
    "standard trade, vs the per-column re-scan loop the oracle's "
    "UNION ALL literally performs); the wide single row unpivots via "
    "stack. Doubles profile through an integer-cents pre-projection "
    "because float->string forms differ across engines",
)
def q_d17_profile(spark, sf_dir):
    from jane_spark.operators.profile import profile

    ev = Catalog(spark, sf_dir).events.select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    return profile(ev, ["event_id", "user_id", "event_type", "cents"])


@contract(
    "q_d21_cohort",
    oracle="""
        WITH acts AS (SELECT DISTINCT user_id AS u,
                          CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
                      FROM events WHERE user_id IS NOT NULL),
        f AS (SELECT u, min(d) AS cohort FROM acts GROUP BY u),
        off AS (SELECT cohort AS cohort_day,
                       CAST(date_diff('day', CAST(cohort AS DATE),
                                      CAST(d AS DATE)) AS BIGINT)
                           AS offset_days,
                       u
                FROM acts JOIN f USING (u)),
        cells AS (SELECT cohort_day, offset_days,
                         CAST(count(DISTINCT u) AS BIGINT) AS n_users
                  FROM off GROUP BY cohort_day, offset_days)
        SELECT cohort_day, offset_days, n_users,
               CAST((n_users * 10000) //
                    max(CASE WHEN offset_days = 0 THEN n_users END)
                        OVER (PARTITION BY cohort_day) AS BIGINT)
                   AS pct_e4
        FROM cells
    """,
    survey_rows="D1,D3,E6",
    doc="cohort retention matrix (operators.rolling.cohort_retention): "
    "cohort = each user's first active day, cell = distinct users of "
    "that cohort active at each day offset, plus the retention rate "
    "vs the cohort's own offset-0 size in 1e-4 fixed point. One "
    "(user, day) distinct + one user-keyed min + a user-keyed join + "
    "a (cohort, offset) count-distinct — every shuffle keyed, the "
    "normalization window runs over the days x offsets matrix, never "
    "rows",
)
def q_d21_cohort(spark, sf_dir):
    from jane_spark.operators.rolling import cohort_retention

    ev = Catalog(spark, sf_dir).events
    return cohort_retention(ev, "ts", "user_id")


@contract(
    "q_d20_decay",
    oracle="""
        WITH base AS (SELECT event_type,
                             CAST(epoch_us(ts) AS BIGINT) AS e,
                             CAST(round(value * 100) AS BIGINT) AS c
                      FROM events),
        nw AS (SELECT max(e) AS now FROM base),
        wt AS (SELECT event_type, c,
                      CAST(1048576 AS BIGINT)
                      // (1 << least(((now - e) // 86400000000) // 7,
                                     CAST(21 AS BIGINT))) AS w
               FROM base, nw)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c) AS BIGINT) AS raw_cents,
               CAST(sum(c * w) AS BIGINT) AS decayed_e20
        FROM wt GROUP BY event_type
    """,
    survey_rows="D1,D7,E5",
    doc="exponential-time-decay trending score (operators.rolling."
    "decayed_sum, half-life 7 days): age quantizes to whole half-life "
    "periods and the weight is the exact binary 2^(20-k), so the "
    "score is a plain BIGINT sum — bit-reproducible under any "
    "partition merge order and incrementally maintainable (a monoid, "
    "like the rollup cascade), where a float pow(0.5, age/h) varies "
    "by libm ulps and addition order. One broadcast max-ts scalar + "
    "one map-side-combined groupBy",
)
def q_d20_decay(spark, sf_dir):
    from jane_spark.operators.rolling import decayed_sum

    ev = Catalog(spark, sf_dir).events
    return decayed_sum(
        ev, "ts", ["event_type"], F.round(F.col("value") * 100, 0), 7
    )


@contract(
    "q_d19_quantiles",
    oracle="""
        WITH src AS (SELECT event_type,
                            CAST(date_trunc('day', ts) AS TIMESTAMP)
                                AS day,
                            CAST(round(value * 100) AS BIGINT) AS v
                     FROM events),
        c AS (SELECT event_type, day, v,
                     CAST(count(*) AS BIGINT) AS cnt
              FROM src GROUP BY event_type, day, v),
        cum AS (SELECT event_type, day, v,
                       sum(cnt) OVER (PARTITION BY event_type, day
                                      ORDER BY v) AS cum,
                       sum(cnt) OVER (PARTITION BY event_type, day)
                           AS n
                FROM c)
        SELECT event_type, day, CAST(max(n) AS BIGINT) AS n,
               min(CASE WHEN cum >= (50 * n + 99) // 100 THEN v END)
                   AS p50,
               min(CASE WHEN cum >= (95 * n + 99) // 100 THEN v END)
                   AS p95,
               min(CASE WHEN cum >= (99 * n + 99) // 100 THEN v END)
                   AS p99
        FROM cum GROUP BY event_type, day
    """,
    survey_rows="D10,D14,D7",
    doc="per-group discrete quantile bands (operators.profile."
    "grouped_quantiles): p50/p95/p99 of integer cents per "
    "(event_type, day) — the latency/SLO dashboard row. Quantile p = "
    "smallest value whose cumulative count reaches ceil(p*n/100): a "
    "value FROM the data, integer-exact, no interpolation for "
    "engines to disagree over (unlike q_d10's float percentile). "
    "Rows hit ONE (keys, value) groupBy; the cumulative window and a "
    "single conditional-min readout per percent run over the "
    "distinct-value table — the windows-never-touch-rows discipline",
)
def q_d19_quantiles(spark, sf_dir):
    from jane_spark.operators.profile import grouped_quantiles

    ev = Catalog(spark, sf_dir).events.select(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("timestamp_ntz").alias("day"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    return grouped_quantiles(
        ev, ["event_type", "day"], "cents", [50, 95, 99]
    )


@contract(
    "q_d18_mad",
    oracle="""
        WITH src AS (SELECT event_type,
                            CAST(round(value * 100) AS BIGINT) AS v
                     FROM events),
        r1 AS (SELECT event_type, v,
                      row_number() OVER (PARTITION BY event_type
                                         ORDER BY v) AS rn,
                      count(*) OVER (PARTITION BY event_type) AS n
               FROM src),
        med AS (SELECT event_type, CAST(n AS BIGINT) AS n,
                       v AS median_val
                FROM r1 WHERE rn = (n + 1) // 2),
        r2 AS (SELECT s.event_type, med.n, med.median_val,
                      abs(s.v - med.median_val) AS d
               FROM src s JOIN med USING (event_type)),
        r3 AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                            ORDER BY d) AS rn
               FROM r2)
        SELECT event_type, n, median_val, d AS mad_val
        FROM r3 WHERE rn = (n + 1) // 2
    """,
    survey_rows="D14,D10",
    doc="robust per-group location/scale (operators.profile."
    "grouped_median_mad): discrete lower median + median absolute "
    "deviation of integer cents per event_type — the outlier pair a "
    "mean/stddev report (q_d14_stats) cannot provide (one corrupt "
    "1e12 reading moves a mean arbitrarily, a median by one rank). "
    "The DISCRETE median (value at rank ceil(n/2)) is deliberate: a "
    "value from the data, integer-exact, identical in any engine — "
    "no float interpolation to disagree over. Two group-keyed window "
    "ranks + a groups-sized broadcast join; the rank-k value of a "
    "multiset is deterministic even though row_number among ties is "
    "not",
)
def q_d18_mad(spark, sf_dir):
    from jane_spark.operators.profile import grouped_median_mad

    ev = Catalog(spark, sf_dir).events.select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    return grouped_median_mad(ev, ["event_type"], "cents")


@contract(
    "q_d4_collect",
    oracle="""
        SELECT user_id,
               array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
               count(*) AS n
        FROM events GROUP BY user_id
    """,
    survey_rows="D4",
    doc="channel-list-per-station set aggregation; sort_array for determinism. "
    "Projected as a comma-joined string: the driver's comparator "
    "canonicalizes via a pandas sort, which cannot hash array cells "
    "(round-1 'unhashable numpy.ndarray' failure).",
)
def q_d4(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    return ev.groupBy("user_id").agg(
        F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias("types"),
        F.count(F.lit(1)).alias("n"),
    )


@contract(
    "q_d5_argmax",
    oracle="""
        SELECT o_custkey, o_orderkey AS last_orderkey,
               o_orderdate AS last_orderdate
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY o_custkey
                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
              FROM orders)
        WHERE rn = 1
    """,
    survey_rows="D5,E1,K1",
    doc="latest-version-per-document dedup (argmax via operators.topk)",
)
def q_d5(spark, sf_dir):
    orders = Catalog(spark, sf_dir).clustered("orders", "o_custkey")
    latest = argmax(
        orders,
        ["o_custkey"],
        [F.col("o_orderdate").desc(), F.col("o_orderkey").desc()],
    )
    return latest.select(
        "o_custkey",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_orderdate").alias("last_orderdate"),
    )


@contract(
    "q_d6_gaps",
    oracle=f"""
        WITH g AS (
            SELECT user_id,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
            FROM events)
        SELECT user_id, count(*) AS n_gaps
        FROM g WHERE gap_us > {THIRTY_MIN_US} GROUP BY user_id
    """,
    survey_rows="D6,E2",
    doc="waveform gap detection: lag deltas over the per-channel timeline "
    "(µs integers, not intervals — cross-engine hash stability)",
)
def q_d6(spark, sf_dir):
    ev = Catalog(spark, sf_dir).clustered("events", "user_id")
    gaps = with_gaps(ev, "user_id", "ts", "event_id")
    return (
        gaps.filter(F.col("gap_us") > THIRTY_MIN_US)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_gaps"))
    )


@contract(
    "q_d6_availability",
    oracle="""
        WITH seg AS (
            SELECT 'S' || CAST(user_id % 50 AS VARCHAR) AS station,
                   ts AS st, ts + INTERVAL 10 MINUTE AS en,
                   event_id % 1000 + 1 AS npts
            FROM events),
        g AS (
            SELECT station, st, en, npts,
                   CASE WHEN max(epoch_us(en)) OVER (
                            PARTITION BY station ORDER BY st, en
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                            IS NULL
                         OR epoch_us(st) - max(epoch_us(en)) OVER (
                            PARTITION BY station ORDER BY st, en
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                            > 600000000
                        THEN 1 ELSE 0 END AS new_s
            FROM seg),
        s AS (
            SELECT station, st, en, npts,
                   CAST(sum(new_s) OVER (
                       PARTITION BY station ORDER BY st, en
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS span
            FROM g)
        SELECT station, min(st) AS span_start, max(en) AS span_end,
               CAST(count(*) AS BIGINT) AS n_segments,
               CAST(sum(npts) AS BIGINT) AS total_samples
        FROM s GROUP BY station, span
    """,
    survey_rows="D6,E3",
    doc="fdsnws-availability 'query' spans (services/fdsnws."
    "availability_spans) on a deterministic events-derived segment set: "
    "10-min segments per event, running-max merge with a 600 s "
    "tolerance; DuckDB twin is the same lag/running-max/cumsum shape "
    "(VERDICT r5 #3). NTZ-safe interval comparison (no tz casts)",
)
def q_d6_avail(spark, sf_dir):
    from jane_spark.services.fdsnws import availability_spans

    ev = Catalog(spark, sf_dir).clustered("events", "user_id")
    traces = ev.select(
        F.lit("BW").alias("network"),
        F.concat(F.lit("S"), (F.col("user_id") % 50).cast("string")).alias(
            "station"
        ),
        F.lit("").alias("location"),
        F.lit("EHZ").alias("channel"),
        F.col("ts").alias("starttime"),
        (F.col("ts") + F.make_dt_interval(mins=F.lit(10))).alias("endtime"),
        (F.col("event_id") % 1000 + 1).alias("npts"),
    )
    return availability_spans(traces, merge_tolerance_s=600.0).select(
        "station", "span_start", "span_end", "n_segments", "total_samples"
    )


@contract(
    "q_d6_percent",
    oracle="""
        WITH seg AS (
            SELECT 'S' || CAST(user_id % 50 AS VARCHAR) AS station,
                   ts AS st, ts + INTERVAL 10 MINUTE AS en
            FROM events),
        g AS (
            SELECT station, st, en,
                   CASE WHEN max(epoch_us(en)) OVER (
                            PARTITION BY station ORDER BY st, en
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                            IS NULL
                         OR epoch_us(st) - max(epoch_us(en)) OVER (
                            PARTITION BY station ORDER BY st, en
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                            > 600000000
                        THEN 1 ELSE 0 END AS new_s
            FROM seg),
        s AS (
            SELECT station, st, en,
                   CAST(sum(new_s) OVER (
                       PARTITION BY station ORDER BY st, en
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS span
            FROM g),
        spans AS (
            SELECT station, epoch_us(min(st)) AS s_us, epoch_us(max(en)) AS e_us
            FROM s GROUP BY station, span),
        d AS (
            SELECT station, s_us, e_us,
                   unnest(generate_series(
                       s_us // 86400000000,
                       (e_us - 1) // 86400000000)) AS day_id
            FROM spans)
        SELECT station,
               CAST(DATE '1970-01-01' + CAST(day_id AS INT) AS VARCHAR) AS day,
               CAST((sum(least(e_us, (day_id + 1) * 86400000000)
                         - greatest(s_us, day_id * 86400000000))
                     * 100000000 // 86400000000) AS BIGINT) / 1000000.0
                   AS coverage_pct
        FROM d GROUP BY station, day_id
    """,
    survey_rows="D6,D7",
    doc="per-channel per-UTC-day coverage percentage (services/fdsnws."
    "availability_percent — jane's availability plot): disjoint merged "
    "spans exploded into day bins, clamped overlap summed per day. "
    "Same derived segment set as q_d6_availability; DuckDB twin uses "
    "generate_series day bins over the identical span CTE",
)
def q_d6_percent(spark, sf_dir):
    from jane_spark.services.fdsnws import availability_percent

    ev = Catalog(spark, sf_dir).clustered("events", "user_id")
    traces = ev.select(
        F.lit("BW").alias("network"),
        F.concat(F.lit("S"), (F.col("user_id") % 50).cast("string")).alias(
            "station"
        ),
        F.lit("").alias("location"),
        F.lit("EHZ").alias("channel"),
        F.col("ts").alias("starttime"),
        (F.col("ts") + F.make_dt_interval(mins=F.lit(10))).alias("endtime"),
        F.lit(1).alias("npts"),
    )
    return availability_percent(traces, merge_tolerance_s=600.0).select(
        "station", F.col("day").cast("string").alias("day"), "coverage_pct"
    )


@contract(
    "q_d7_bucket",
    oracle="""
        SELECT date_trunc('hour', ts) AS bucket, event_type,
               count(*) AS n, round(sum(value), 3) AS sum_value
        FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
    survey_rows="D7,H2",
    doc="preview down-sampling: fixed time-bucket aggregation",
)
def q_d7(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("bucket"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 3).alias("sum_value"))


@contract(
    "q_d8_rollup",
    oracle="""
        SELECT r_name, n_name, count(*) AS n,
               round(sum(c_acctbal), 2) AS sum_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
    """,
    survey_rows="D8",
    doc="multi-level summaries (per network / station / grand total)",
)
def q_d8(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    joined = cat.customer.join(
        F.broadcast(cat.nation), cat.customer.c_nationkey == cat.nation.n_nationkey
    ).join(F.broadcast(cat.region), cat.nation.n_regionkey == cat.region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("c_acctbal"), 2).alias("sum_bal")
    )


@contract(
    "q_d9_hist",
    oracle="""
        SELECT CAST(floor(value / 50.0) AS BIGINT) AS bin, count(*) AS n
        FROM events GROUP BY CAST(floor(value / 50.0) AS BIGINT)
    """,
    survey_rows="D9,H11",
    doc="histogram binning (magnitude-distribution shape)",
)
def q_d9(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    return ev.groupBy(
        F.expr("CAST(floor(value / 50.0) AS BIGINT)").alias("bin")
    ).agg(F.count(F.lit(1)).alias("n"))


@contract(
    "q_d10_percentile",
    oracle="""
        SELECT lang,
               round(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
               round(quantile_cont(n_chars, 0.9), 4) AS p90_chars
        FROM documents GROUP BY lang
    """,
    survey_rows="D2,K6",
    doc="exact percentiles per group (corpus length distribution — the "
    "quality-threshold calibration stat). Both engines use linear "
    "interpolation (Spark `percentile` == DuckDB `quantile_cont`). "
    "Exact percentile buffers each group's values; the 100 TB path is "
    "q_d10_approx (t-digest sketch, mergeable map-side)",
)
def q_d10(spark, sf_dir):
    docs = Catalog(spark, sf_dir).documents
    return docs.groupBy("lang").agg(
        F.round(F.percentile("n_chars", F.lit(0.5)), 4).alias("p50_chars"),
        F.round(F.percentile("n_chars", F.lit(0.9)), 4).alias("p90_chars"),
    )


@contract(
    "q_d10_approx",
    oracle=None,  # sketch-based — rows-only check (accuracy asserted vs
    # the exact path in tests/test_operators.py)
    survey_rows="D2,K6",
    doc="approx_percentile: the scale path for q_d10_percentile — "
    "constant-memory mergeable sketch, no per-group value buffering",
)
def q_d10a(spark, sf_dir):
    docs = Catalog(spark, sf_dir).documents
    return docs.groupBy("lang").agg(
        F.percentile_approx("n_chars", F.lit(0.5), F.lit(10000)).alias("p50_chars"),
        F.percentile_approx("n_chars", F.lit(0.9), F.lit(10000)).alias("p90_chars"),
    )


@contract(
    "q_d11_pivot",
    oracle="""
        SELECT source,
               CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
               CAST(sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS es,
               CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr,
               CAST(sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh
        FROM documents GROUP BY source
    """,
    survey_rows="D8,K6",
    doc="wide pivot (language-mix matrix per source): groupBy().pivot() "
    "with an EXPLICIT value list — skipping the value-discovery pass "
    "and keeping the output schema static, which is the only sane "
    "pivot at scale (pivot folds to one hash-agg over composite keys; "
    "missing cells are 0 via coalesce)",
)
def q_d11(spark, sf_dir):
    docs = Catalog(spark, sf_dir).documents
    langs = ["de", "en", "es", "fr", "zh"]
    wide = (
        docs.groupBy("source")
        .pivot("lang", langs)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "source", *[F.coalesce(F.col(lg), F.lit(0)).alias(lg) for lg in langs]
    )


@contract(
    "q_d12_unpivot",
    oracle="""
        SELECT doc_id, 'n_chars' AS metric, CAST(n_chars AS BIGINT) AS value
        FROM documents
        UNION ALL
        SELECT doc_id, 'n_tokens' AS metric,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS value
        FROM documents
    """,
    survey_rows="D8,H9",
    doc="unpivot/melt (wide metrics -> long key/value rows, the "
    "serializer-friendly shape): df.unpivot is a narrow per-row "
    "transform — no shuffle, no UNION-ALL double scan (the oracle's "
    "UNION ALL reads the table twice; Spark's unpivot reads it once)",
)
def q_d12(spark, sf_dir):
    from jane_spark.functions.text import token_count

    docs = Catalog(spark, sf_dir).documents
    wide = docs.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        token_count(F.col("text")).cast("bigint").alias("n_tokens"),
    )
    return wide.unpivot("doc_id", ["n_chars", "n_tokens"], "metric", "value")


@contract(
    "q_d13_gapfill",
    oracle="""
        WITH b AS (
            SELECT event_type,
                   date_trunc('hour', min(ts)) AS h_min,
                   date_trunc('hour', max(ts)) AS h_max
            FROM events GROUP BY event_type),
        spine AS (
            SELECT event_type,
                   unnest(generate_series(h_min, h_max, INTERVAL 1 HOUR))
                       AS window_start
            FROM b),
        agg AS (
            SELECT event_type, date_trunc('hour', ts) AS window_start,
                   count(*) AS n, round(sum(value), 3) AS s
            FROM events GROUP BY 1, 2)
        SELECT spine.event_type AS event_type, spine.window_start,
               CAST(coalesce(agg.n, 0) AS BIGINT) AS n,
               last_value(agg.s IGNORE NULLS) OVER (
                   PARTITION BY spine.event_type ORDER BY spine.window_start
                   ROWS UNBOUNDED PRECEDING) AS locf_sum
        FROM spine LEFT JOIN agg
          ON spine.event_type = agg.event_type
         AND spine.window_start = agg.window_start
    """,
    survey_rows="D13,I2",
    doc="time-spine gap-fill (hypertable/time_bucket_gapfill shape): "
    "per-type hourly grid from a tiny (min,max) agg + sequence/explode "
    "(never a fact-table shuffle), empty buckets as n=0, LOCF "
    "fill-forward of the hourly sum (operators.gapfill.time_spine_fill)",
)
def q_d13(spark, sf_dir):
    from jane_spark.operators.gapfill import time_spine_fill

    ev = Catalog(spark, sf_dir).events
    return time_spine_fill(ev, "event_type", "ts", "value")


@contract(
    "q_d8_cube",
    oracle="""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    survey_rows="D8",
    doc="full cube over (returnflag, linestatus) — all 2^2 grouping "
    "sets in one pass; same partial-agg mass as plain groupBy, the "
    "grouping-set expansion happens map-side (round 2)",
)
def q_d8c(spark, sf_dir):
    li = Catalog(spark, sf_dir).lineitem
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@contract(
    "q_d14_stats",
    oracle="""
        SELECT l_returnflag,
               round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
               round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qp,
               round(stddev_samp(l_discount), 6) AS sd_disc,
               round(var_pop(l_quantity), 4) AS var_qty
        FROM lineitem GROUP BY l_returnflag
    """,
    survey_rows="D14",
    doc="statistical aggregate surface (corr/covar/stddev/variance) — "
    "corpus-calibration statistics; all are single-pass partial+final "
    "hash aggregates, no second scan (round 2). Rounded-value hash "
    "compare is boundary-safe on this data: every stat sits >=1e-4 "
    "rounded-units from its .5 rounding boundary (guarded by tests/"
    "test_contracts.py::test_float_boundary_margins)",
)
def q_d14(spark, sf_dir):
    li = Catalog(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qp"),
        F.round(F.stddev_samp("l_discount"), 6).alias("sd_disc"),
        F.round(F.var_pop("l_quantity"), 4).alias("var_qty"),
    )


@contract(
    "q_d22_bottomk",
    oracle="""
        WITH h AS (SELECT lang, doc_id,
                          CAST(concat('0x', substr(md5(concat('bk:',
                              CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
                              AS hv
                   FROM documents)
        SELECT lang, doc_id,
               CAST(row_number() OVER (PARTITION BY lang
                                       ORDER BY hv ASC, doc_id ASC)
                    AS BIGINT) AS rk
        FROM h
        QUALIFY rk <= 5
    """,
    survey_rows="D22,K1,P2",
    doc="deterministic per-group bottom-k sample "
    "(functions.sampling.bottom_k_sample): the 5 rows with smallest "
    "salted md5 hash per language — the MERGEABLE alternative to "
    "reservoir sampling (bottom-k sets compose under union, so "
    "shard-local samples merge into the exact global sample and "
    "re-runs reproduce it byte-for-byte; KMV's keep-the-rows twin). "
    "One hash projection + one per-group rank window",
)
def q_d22(spark, sf_dir):
    from jane_spark.functions.sampling import bottom_k_sample

    docs = Catalog(spark, sf_dir).documents
    return bottom_k_sample(docs, ["lang"], "doc_id", k=5)


@contract(
    "q_d29_weighted_reservoir",
    oracle="""
        WITH h AS (SELECT lang, doc_id,
                          CAST(n_chars AS BIGINT) AS weight,
                          CAST(concat('0x', substr(md5(concat('wrs:',
                              CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
                              AS hv
                   FROM documents WHERE n_chars > 0)
        SELECT lang, doc_id, weight,
               CAST(row_number() OVER (PARTITION BY lang
                   ORDER BY -ln((hv + 1) / 4294967296.0) / weight ASC,
                            doc_id ASC) AS BIGINT) AS rk
        FROM h
        QUALIFY rk <= 5
    """,
    survey_rows="D29,D22,P2",
    doc="deterministic per-group WEIGHTED k-sample without "
    "replacement — A-Res (Efraimidis & Spirakis 2006) with hash-"
    "derived randomness (functions.sampling.weighted_reservoir_"
    "sample): u = (md5-word + 1)/2^32 per doc, rank by the "
    "exponential key -ln(u)/n_chars ascending, keep 5 per language — "
    "probability-proportional-to-size, the mergeable weighted twin "
    "of q_d22_bottomk (bottom-k key sets compose under union, so "
    "shard samples merge into the exact global sample; what A-ExpJ "
    "does for a stream, the bottom-k form does relationally). The "
    "float key is ORDER-only (hashed surface is integers); adjacent-"
    "key margins probed by pytest at ~1e13 x libm ulp. One hash "
    "projection + one per-group rank window",
)
def q_d29(spark, sf_dir):
    from jane_spark.functions.sampling import weighted_reservoir_sample

    docs = Catalog(spark, sf_dir).documents
    return weighted_reservoir_sample(
        docs, ["lang"], "doc_id", "n_chars", k=5
    )


@contract(
    "q_d31_priority",
    oracle="""
        WITH h AS (SELECT lang, doc_id,
                          CAST(n_chars AS BIGINT) AS weight,
                          CAST(concat('0x', substr(md5(concat('pri:',
                              CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
                              + 1 AS h1
                   FROM documents WHERE n_chars > 0),
        r AS (SELECT lang, doc_id, weight, h1,
                     CAST(row_number() OVER (PARTITION BY lang
                         ORDER BY (CAST(weight AS DOUBLE) * 4294967296.0)
                                  / CAST(h1 AS DOUBLE) DESC,
                                  doc_id ASC) AS BIGINT) AS rk
              FROM h),
        tau AS (SELECT lang, weight AS tau_w, h1 AS tau_h1
                FROM r WHERE rk = 6)
        SELECT r.lang, r.doc_id, r.weight, r.rk,
               CAST(coalesce(t.tau_w, 0) AS BIGINT) AS tau_w,
               CAST(coalesce(t.tau_h1, 1) AS BIGINT) AS tau_h1
        FROM r LEFT JOIN tau t ON t.lang IS NOT DISTINCT FROM r.lang
        WHERE r.rk <= 5
    """,
    survey_rows="D31,D29,D22",
    doc="per-group PRIORITY sample — Duffield, Lund & Thorup (JACM "
    "2007), the estimation-optimal member of the weighted-sampling "
    "family (functions.sampling.priority_sample): priority = "
    "w·2^32/(md5-word+1), keep the 5 largest per language, the 6th "
    "priority becomes the group threshold τ carried as the EXACT "
    "integer pair (tau_w, tau_h1), and Σ max(w_i, τ) over any "
    "pre-fixed subset of the sample estimates that subset's weight "
    "sum UNBIASEDLY (pytest-pinned over salts). Determinism is "
    "stronger than D29's ln keys: the ordering ratio is exact-int → "
    "double · 2^32 / exact-int → double — every op IEEE exact-"
    "rounded, bit-identical in any engine, no libm anywhere. "
    "Mergeable (top-(k+1)-by-priority composes under union — the "
    "D22 law with a weighted key). One hash projection + one "
    "per-group rank window",
)
def q_d31(spark, sf_dir):
    from jane_spark.functions.sampling import priority_sample

    docs = Catalog(spark, sf_dir).documents
    return priority_sample(docs, ["lang"], "doc_id", "n_chars", k=5)


@contract(
    "q_k37_overlap_matrix",
    oracle="""
        WITH t AS (SELECT source AS g,
                          unnest(list_distinct(list_transform(
                              generate_series(1,
                                  len(string_split(text, ' ')) - 2),
                              i -> string_split(text, ' ')[i] || ' ' ||
                                   string_split(text, ' ')[i+1] || ' ' ||
                                   string_split(text, ' ')[i+2]))) AS item
                   FROM documents
                   WHERE len(string_split(text, ' ')) >= 3),
        base AS (SELECT DISTINCT g,
                        CAST(concat('0x', substr(md5('kmv:' || item), 1, 8))
                            AS BIGINT) AS h
                 FROM t),
        sk AS (SELECT g, h FROM (
                   SELECT g, h, row_number() OVER (
                       PARTITION BY g ORDER BY h ASC) AS rk
                   FROM base) WHERE rk <= 32),
        pairs AS (SELECT a.g AS g_a, b.g AS g_b
                  FROM (SELECT DISTINCT g FROM sk) a,
                       (SELECT DISTINCT g FROM sk) b
                  WHERE a.g < b.g),
        u AS (SELECT p.g_a, p.g_b, s.h, 1 AS ia, 0 AS ib
              FROM pairs p JOIN sk s ON s.g = p.g_a
              UNION ALL
              SELECT p.g_a, p.g_b, s.h, 0, 1
              FROM pairs p JOIN sk s ON s.g = p.g_b),
        m AS (SELECT g_a, g_b, h, max(ia) AS ia, max(ib) AS ib
              FROM u GROUP BY g_a, g_b, h),
        kept AS (SELECT * FROM (
                     SELECT *, row_number() OVER (
                         PARTITION BY g_a, g_b ORDER BY h ASC) AS rk
                     FROM m) WHERE rk <= 32)
        SELECT g_a, g_b,
               CAST(count(*) AS BIGINT) AS k_used,
               CAST(max(h) AS BIGINT) AS theta,
               CAST(sum(ia * ib) AS BIGINT) AS rho,
               CAST((sum(ia * ib) * 10000) // greatest(count(*), 1)
                    AS BIGINT) AS jaccard_e4
        FROM kept GROUP BY g_a, g_b
    """,
    survey_rows="K37,D3,T5",
    doc="cross-source OVERLAP MATRIX from per-group KMV sketches "
    "(operators.sketch.kmv_overlap_matrix): pairwise theta-sketch "
    "Jaccard estimates over every source pair's distinct-trigram "
    "sets — 'which sources copy from each other', the corpus-"
    "governance statistic behind mixture dedup and license auditing, "
    "in ONE bounded pass (|groups|×k sketch rows, two equi-joins, "
    "one (pair, h) re-rank — no driver loop over pairs, no all-pairs "
    "document scan). Same integer arithmetic as q_d3_kmv_ops, "
    "generalized from one pair to the matrix",
)
def q_k37(spark, sf_dir):
    from jane_spark.functions.text import shingles
    from jane_spark.operators.sketch import kmv_overlap_matrix

    docs = Catalog(spark, sf_dir).documents
    items = docs.select(
        F.col("source"),
        F.explode(F.array_distinct(shingles(F.col("text"), 3))).alias(
            "item"
        ),
    )
    return kmv_overlap_matrix(items, "source", "item", k=32)


@contract(
    "q_d23_log2_hist",
    oracle="""
        WITH b AS (SELECT event_type,
                          CAST(floor(log2(greatest(
                              CAST(round(value * 100) AS BIGINT), 1)))
                              AS BIGINT) AS bucket,
                          CAST(round(value * 100) AS BIGINT) AS c
                   FROM events)
        SELECT event_type, bucket,
               CAST(count(*) AS BIGINT) AS n,
               min(c) AS min_cents, max(c) AS max_cents
        FROM b GROUP BY event_type, bucket
    """,
    survey_rows="D23,D9",
    doc="LOG-SCALE (HDR-style) histogram per event_type: bucket = "
    "floor(log2(cents)) — constant relative resolution across five "
    "orders of magnitude where the linear q_d9 histogram wastes its "
    "buckets on the head (the latency-histogram standard). One "
    "map-side-combinable groupBy; log2 of positive integers is "
    "boundary-exact at powers of two in both engines",
)
def q_d23(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    bucket = F.floor(F.log2(F.greatest(cents, F.lit(1)))).cast("bigint")
    return (
        ev.select("event_type", bucket.alias("bucket"), cents.alias("c"))
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c").alias("min_cents"),
            F.max("c").alias("max_cents"),
        )
    )


@contract(
    "q_d24_outliers",
    oracle="""
        WITH src AS (SELECT event_type, event_id,
                            CAST(round(value * 100) AS BIGINT) AS v
                     FROM events),
        r1 AS (SELECT event_type, v,
                      row_number() OVER (PARTITION BY event_type
                                         ORDER BY v) AS rn,
                      count(*) OVER (PARTITION BY event_type) AS n
               FROM src),
        med AS (SELECT event_type, v AS median_val
                FROM r1 WHERE rn = (n + 1) // 2),
        r2 AS (SELECT s.event_type, s.v,
                      abs(s.v - med.median_val) AS d
               FROM src s JOIN med USING (event_type)),
        r3 AS (SELECT event_type, d,
                      row_number() OVER (PARTITION BY event_type
                                         ORDER BY d) AS rn,
                      count(*) OVER (PARTITION BY event_type) AS n
               FROM r2),
        mad AS (SELECT r3.event_type, med.median_val, r3.d AS mad_val
                FROM r3 JOIN med USING (event_type)
                WHERE rn = (n + 1) // 2)
        SELECT s.event_type,
               CAST(s.event_id AS BIGINT) AS id,
               s.v,
               CAST(abs(s.v - m.median_val) AS BIGINT) AS dev,
               m.median_val,
               m.mad_val
        FROM src s JOIN mad m USING (event_type)
        WHERE 100 * abs(s.v - m.median_val) > 300 * m.mad_val
    """,
    survey_rows="D24,D18,D14",
    doc="robust MAD z-score outlier flags per event_type (Hampel "
    "identifier, Leys et al. 2013 — operators.profile.mad_outliers): "
    "every reading whose integer-cent deviation from the group's "
    "discrete median exceeds 3x MAD, the data-quality gate a "
    "mean±k*sigma rule fails on (one corrupt reading moves the mean "
    "arbitrarily, the median by one rank). Pure integer test "
    "100*|v-median| > 300*mad — engine-portable flagged set. Stats "
    "via the weighted-median formulation (one (key, value) count "
    "shuffle, windows over distinct values), broadcast back onto one "
    "row scan",
)
def q_d24(spark, sf_dir):
    from jane_spark.operators.profile import mad_outliers

    ev = Catalog(spark, sf_dir).events.select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    return mad_outliers(ev, ["event_type"], "event_id", "cents", k_e2=300)


@contract(
    "q_d25_hdr_quantiles",
    oracle="""
        WITH src AS (SELECT event_type,
                            CAST(round(value * 100) AS BIGINT) AS c
                     FROM events),
        b AS (SELECT event_type,
                     CAST(floor(log2(greatest(c, 1))) AS BIGINT) AS bucket,
                     CAST(count(*) AS BIGINT) AS n
              FROM src GROUP BY 1, 2),
        w AS (SELECT event_type, bucket, n,
                     sum(n) OVER (PARTITION BY event_type
                                  ORDER BY bucket
                                  ROWS UNBOUNDED PRECEDING) AS cum,
                     sum(n) OVER (PARTITION BY event_type) AS total
              FROM b)
        SELECT event_type,
               CAST(max(total) AS BIGINT) AS n,
               CAST(min(CASE WHEN cum >= (50 * total + 99) // 100
                             THEN CAST(1 AS BIGINT) << bucket END) AS BIGINT) AS p50_lb,
               CAST(min(CASE WHEN cum >= (95 * total + 99) // 100
                             THEN CAST(1 AS BIGINT) << bucket END) AS BIGINT) AS p95_lb,
               CAST(min(CASE WHEN cum >= (99 * total + 99) // 100
                             THEN CAST(1 AS BIGINT) << bucket END) AS BIGINT) AS p99_lb
        FROM w GROUP BY event_type
    """,
    survey_rows="D25,D23,D19",
    doc="MERGEABLE approximate quantiles from the D23 log-scale "
    "histogram (the HdrHistogram/latency-SLO readout): per key, "
    "p50/p95/p99 reported as the power-of-two LOWER BOUND of the "
    "first bucket whose cumulative count reaches ceil(p*n/100) — "
    "constant relative error by construction, and the underlying "
    "buckets are plain integer counts, so shards/days/sources merge "
    "by addition and a 1000-executor tree-agg reproduces the exact "
    "same readout (the D19 exact quantiles need the value-level "
    "shuffle this avoids). Integer-exact: ceil via (p*n+99) div 100, "
    "bound via shiftleft. One map-side-combinable (key, bucket) "
    "groupBy + windows over <= 64 buckets per key",
)
def q_d25(spark, sf_dir):
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    bucket = F.floor(F.log2(F.greatest(cents, F.lit(1)))).cast("bigint")
    b = (
        ev.select("event_type", bucket.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    kw = Window.partitionBy("event_type")
    ow = kw.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    w = b.withColumn("cum", F.sum("n").over(ow)).withColumn(
        "total", F.sum("n").over(kw)
    )
    # F.shiftleft takes a literal int only — column shift goes through
    # the SQL function (the r10 bloom lesson)
    lb = F.expr("shiftleft(cast(1 as bigint), cast(bucket as int))")

    def pick(p: int):
        thr = F.expr(f"({p} * total + 99) div 100")
        return F.min(F.when(F.col("cum") >= thr, lb)).cast("bigint")

    return w.groupBy("event_type").agg(
        F.max("total").cast("bigint").alias("n"),
        pick(50).alias("p50_lb"),
        pick(95).alias("p95_lb"),
        pick(99).alias("p99_lb"),
    )


@contract(
    "q_d27_hll_timeline",
    oracle="""
        WITH h AS (SELECT CAST(ts AS DATE) AS day,
                          CAST(concat('0x', substr(md5(
                              'hll:' || CAST(user_id AS VARCHAR)), 1, 8))
                              AS BIGINT) AS h
                   FROM events WHERE user_id IS NOT NULL),
        b AS (SELECT day, h // 67108864 AS bucket, h % 67108864 AS w
              FROM h),
        r AS (SELECT day, bucket,
                     max(CASE WHEN w = 0 THEN 27
                              ELSE 27 - length(to_base(w, 2)) END) AS rho
              FROM b GROUP BY day, bucket),
        grid AS (SELECT d.day, g.b AS bucket
                 FROM (SELECT DISTINCT day FROM h) d
                 CROSS JOIN generate_series(0, 63) g(b)),
        f AS (SELECT grid.day, grid.bucket,
                     coalesce(r.rho, 0) AS rho
              FROM grid LEFT JOIN r
                  ON r.day = grid.day AND r.bucket = grid.bucket),
        cum AS (SELECT day, bucket,
                       max(rho) OVER (PARTITION BY bucket ORDER BY day
                                      ROWS UNBOUNDED PRECEDING) AS crho
                FROM f)
        SELECT CAST(day AS TIMESTAMP) AS day,
               CAST(count(*) AS BIGINT) AS m,
               CAST(sum(CASE WHEN crho = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS zeros,
               CAST(sum(CAST(1 AS BIGINT) << (32 - CAST(crho AS INTEGER)))
                   AS BIGINT) AS inv_scaled
        FROM cum GROUP BY day
    """,
    survey_rows="D27,D3,D16",
    doc="cumulative distinct-cardinality TIMELINE via the HLL merge "
    "law (operators.sketch.hll_cumulative_timeline): day d's sketch "
    "= elementwise max of days 1..d's register tables, so 'unique "
    "users to date' never re-scans history — the incremental readout "
    "exact distinct cannot give. Hashed surface is the INTEGER sketch "
    "state per day (m, zero-register count, 2^32-scaled harmonic "
    "denominator sum(2^(32-rho))); the float estimate is a driver "
    "formula over those integers. One (day x 64) groupBy + one window "
    "over the days axis per bucket + one per-day readout",
)
def q_d27(spark, sf_dir):
    from jane_spark.operators.sketch import hll_cumulative_timeline

    ev = Catalog(spark, sf_dir).events
    return hll_cumulative_timeline(ev, "ts", "user_id", p=6)


@contract(
    "q_d28_merge_rollup",
    oracle="""
        WITH e AS (SELECT date_trunc('day', ts) AS bucket, event_type,
                          CAST(round(value * 100) AS BIGINT) AS c,
                          CAST(concat('0x', substr(md5(concat('shard:',
                              CAST(event_id AS VARCHAR))), 1, 8))
                              AS BIGINT) % 2 AS h
                   FROM events)
        SELECT CAST(bucket AS TIMESTAMP) AS bucket, event_type,
               CAST(count(DISTINCT h) AS BIGINT) AS n_parts,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c) AS BIGINT) AS sum_cents,
               CAST(min(c) AS BIGINT) AS min_cents,
               CAST(max(c) AS BIGINT) AS max_cents,
               CAST(sum(c) // count(*) AS BIGINT) AS avg_cents
        FROM e GROUP BY 1, 2
    """,
    survey_rows="D28,D16,D2",
    doc="partial-aggregate MERGE law as a hashed contract "
    "(operators/rolling.py merge_rollups): the events table splits "
    "into two disjoint hash shards, each shard computes its own "
    "level-1 (day, event_type) rollup (time_rollup — integer cents, "
    "so partial sums are exact under ANY merge order), and the merge "
    "re-aggregates the partials (sum of n/sum, min of min, max of "
    "max). The ORACLE computes the rollup DIRECTLY from the raw "
    "table in one scan — hash equality IS the algebraic rebalance "
    "law that two-phase aggregation, AQE partial combines, and "
    "incremental view maintenance (yesterday's rollup + today's "
    "delta, |rollup|-sized work, never re-scanning history) all rest "
    "on. n_parts stays in the surface (oracle twin: distinct shards "
    "per group) so the merge is auditable; avg derives by integer "
    "division of exact sums. Plan: two map-side-combined shard "
    "rollups + one |groups| x 2-row merge aggregate",
)
def q_d28(spark, sf_dir):
    from jane_spark.functions.sampling import hash_bucket
    from jane_spark.operators.rolling import merge_rollups, time_rollup

    ev = Catalog(spark, sf_dir).events.withColumn(
        "__h", hash_bucket(F.col("event_id"), 2, salt="shard:")
    )
    cents = F.round(F.col("value") * 100, 0)
    parts = [
        time_rollup(
            ev.filter(F.col("__h") == i),
            "ts",
            "day",
            ["event_type"],
            cents,
        )
        for i in (0, 1)
    ]
    merged = merge_rollups(*parts)
    return merged.select(
        "bucket",
        "event_type",
        "n_parts",
        "n",
        "sum_cents",
        "min_cents",
        "max_cents",
        F.expr("sum_cents div n").cast("bigint").alias("avg_cents"),
    )


@contract(
    "q_d30_bootstrap",
    oracle="""
        WITH reps AS (SELECT unnest(range(0, 16)) AS rep),
        h AS (SELECT d.lang, d.n_chars, r.rep,
                     (CAST(concat('0x', substr(md5(concat('boot:',
                          CAST(r.rep AS VARCHAR), ':',
                          CAST(d.doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
                      + 1) / 4294967296.0 AS u
              FROM documents d CROSS JOIN reps r),
        w AS (SELECT lang, rep, n_chars,
                     CASE WHEN u < 0.36787944117144233 THEN 0
                  WHEN u < 0.7357588823428847 THEN 1
                  WHEN u < 0.9196986029286058 THEN 2
                  WHEN u < 0.9810118431238462 THEN 3
                  WHEN u < 0.9963401531726563 THEN 4
                  WHEN u < 0.9994058151824183 THEN 5
                  WHEN u < 0.9999167588507119 THEN 6
                          ELSE 7 END AS w
              FROM h)
        SELECT lang, CAST(rep AS INT) AS rep,
               CAST(sum(w) AS BIGINT) AS n_rep,
               CAST(sum(w * n_chars) AS BIGINT) AS sum_rep
        FROM w GROUP BY lang, rep
""",
    survey_rows="D30,D14,P19",
    doc="deterministic POISSON BOOTSTRAP replicate sums per language "
    "(operators/bootstrap.bootstrap_replicates — the Chamandy et al. "
    "2012 large-scale bootstrap): every corpus statistic ships with "
    "an error bar computed in the SAME single pass — replicate "
    "weight w_r(doc) ~ Poisson(1) via the inverse CDF over "
    "u = (md5(rep:doc)+1)/2^32 against FIXED literal thresholds "
    "(both engines evaluate the identical rational u against the "
    "identical literals — no libm, engine-exact by construction), "
    "16 replicates as a generated stack, ONE combinable groupBy to "
    "|langs| x 16 BIGINT rows. Var(S_r) = sum(x_i^2) exactly under "
    "Poisson(1) — the SE law the pytest pins",
)
def q_d30(spark, sf_dir):
    from jane_spark.operators.bootstrap import bootstrap_replicates

    docs = Catalog(spark, sf_dir).documents
    return bootstrap_replicates(
        docs, ["lang"], "doc_id", "n_chars", n_replicates=16
    )
