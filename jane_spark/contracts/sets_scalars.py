"""§2.7 G — set operations + §2.8 H — scalar function surface.

jane merges inventories/catalogs across documents (union+dedup),
intersects metadata with waveform coverage, subtracts deleted docs;
its scalar surface is ISO timestamps, SEED-id split/join, regex
channel matching, hashing, JSON extraction, NULL epoch conventions
[ref: scattered across src/jane/documents/, fdsnws/, waveforms/,
behavior conf=H; SURVEY.md §0 caveat].
"""

from __future__ import annotations

from pyspark.sql import functions as F

from jane_spark.contracts.registry import contract
from jane_spark.engine.catalog import Catalog


@contract(
    "q_g1_union",
    oracle="""
        SELECT event_id FROM events WHERE event_type = 'click'
        UNION
        SELECT event_id FROM events WHERE value > 400.0
    """,
    survey_rows="G1",
    doc="merge catalogs from many documents + dedup (UNION DISTINCT)",
)
def q_g1(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    a = ev.filter(F.col("event_type") == "click").select("event_id")
    b = ev.filter(F.col("value") > 400.0).select("event_id")
    return a.union(b).distinct()


@contract(
    "q_g2_intersect",
    oracle="""
        SELECT c_custkey AS custkey FROM customer
        INTERSECT
        SELECT o_custkey AS custkey FROM orders
    """,
    survey_rows="G2",
)
def q_g2(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    return cat.customer.select(F.col("c_custkey").alias("custkey")).intersect(
        cat.orders.select(F.col("o_custkey").alias("custkey"))
    )


@contract(
    "q_g3_except",
    oracle="""
        SELECT c_custkey AS custkey FROM customer
        EXCEPT
        SELECT o_custkey AS custkey FROM orders
        WHERE o_orderdate < TIMESTAMP '1995-07-01'
    """,
    survey_rows="G3",
    doc="index minus superseded docs — subtrahend snapshot-scoped so the "
    "difference is non-empty at every sf",
)
def q_g3(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    early = cat.orders.filter(
        "o_orderdate < TIMESTAMP_NTZ '1995-07-01 00:00:00'"
    )
    return cat.customer.select(F.col("c_custkey").alias("custkey")).subtract(
        early.select(F.col("o_custkey").alias("custkey"))
    )


@contract(
    "q_h1_ts_parse",
    oracle="""
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS ts_str,
               strftime(strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
                                 '%Y-%m-%d %H:%M:%S') + INTERVAL 1 DAY,
                        '%Y/%m/%d') AS next_day
        FROM orders
    """,
    survey_rows="H1,H2",
    doc="ISO/UTCDateTime parse+format round trip with date arithmetic",
)
def q_h1(spark, sf_dir):
    orders = Catalog(spark, sf_dir).orders
    ts_str = F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
    reparsed = F.to_timestamp(ts_str, "yyyy-MM-dd HH:mm:ss").cast("timestamp_ntz")
    return orders.select(
        "o_orderkey",
        ts_str.alias("ts_str"),
        F.date_format(reparsed + F.expr("INTERVAL 1 DAY"), "yyyy/MM/dd").alias(
            "next_day"
        ),
    )


@contract(
    "q_h3_seedid",
    oracle="""
        SELECT c_custkey,
               concat_ws('.', c_mktsegment, CAST(c_nationkey AS VARCHAR),
                         CAST(c_custkey AS VARCHAR)) AS seed_id,
               string_split(concat_ws('.', c_mktsegment,
                         CAST(c_nationkey AS VARCHAR),
                         CAST(c_custkey AS VARCHAR)), '.')[2] AS mid_part
        FROM customer
    """,
    survey_rows="H3",
    doc="SEED id NET.STA.LOC.CHA join + re-split",
)
def q_h3(spark, sf_dir):
    cust = Catalog(spark, sf_dir).customer
    sid = F.concat_ws(
        ".",
        "c_mktsegment",
        F.col("c_nationkey").cast("string"),
        F.col("c_custkey").cast("string"),
    )
    return cust.select(
        "c_custkey",
        sid.alias("seed_id"),
        F.element_at(F.split(sid, "[.]"), 2).alias("mid_part"),
    )


@contract(
    "q_h4_regex",
    oracle="""
        SELECT regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
               count(*) AS n
        FROM part WHERE regexp_matches(p_name, 're')
        GROUP BY regexp_extract(p_name, '^([a-z]+)', 1)
    """,
    survey_rows="H4",
    doc="regex channel matching (wildcard → regex path)",
)
def q_h4(spark, sf_dir):
    part = Catalog(spark, sf_dir).part
    return (
        part.filter(F.col("p_name").rlike("re"))
        .groupBy(F.regexp_extract("p_name", "^([a-z]+)", 1).alias("first_word"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@contract(
    "q_h8_array",
    oracle="""
        SELECT label,
               round(avg(list_aggregate(embedding, 'sum')), 4) AS avg_sum,
               count(*) AS n
        FROM embeddings GROUP BY label
    """,
    survey_rows="H8",
    doc="float-array preview ops: sequential fold (higher-order aggregate)",
)
def q_h8(spark, sf_dir):
    from jane_spark.functions.arrays import array_sum

    emb = Catalog(spark, sf_dir).embeddings
    return emb.groupBy("label").agg(
        F.round(F.avg(array_sum(F.col("embedding"))), 4).alias("avg_sum"),
        F.count(F.lit(1)).alias("n"),
    )


@contract(
    "q_h9_tojson",
    # int/string struct fields serialize byte-identically in both
    # engines (compact, insertion-ordered keys). The one divergence is
    # NULL fields — Spark's to_json omits them, DuckDB emits
    # "k":null — and this corpus has none; floats/timestamps would
    # also format differently and are deliberately excluded here.
    oracle="""
        SELECT doc_id,
               to_json(struct_pack(lang := lang, n_chars := n_chars,
                                   source := source)) AS js
        FROM documents
    """,
    survey_rows="H9",
    doc="serializer output shape: struct construction → JSON text, "
    "byte-exact cross-engine on non-null int/string fields",
)
def q_h9(spark, sf_dir):
    docs = Catalog(spark, sf_dir).documents
    return docs.select(
        "doc_id",
        F.to_json(F.struct("lang", "n_chars", "source")).alias("js"),
    )


@contract(
    "q_h10_null_epoch",
    oracle="""
        WITH e AS (
            SELECT o_orderstatus, o_orderdate,
                   CASE WHEN o_orderkey % 7 = 0 THEN NULL
                        ELSE o_orderdate + INTERVAL 30 DAY END AS end_date
            FROM orders)
        SELECT o_orderstatus, count(*) AS n,
               CAST(sum(CASE WHEN end_date IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_open
        FROM e
        WHERE (end_date IS NULL OR end_date > TIMESTAMP '1997-01-01')
          AND o_orderdate < TIMESTAMP '1997-06-01'
        GROUP BY o_orderstatus
    """,
    survey_rows="H10",
    doc="open-epoch NULL conventions (end_date NULL = ∞)",
)
def q_h10(spark, sf_dir):
    orders = Catalog(spark, sf_dir).orders
    e = orders.withColumn(
        "end_date",
        F.expr(
            "CASE WHEN o_orderkey % 7 = 0 THEN NULL "
            "ELSE o_orderdate + INTERVAL 30 DAYS END"
        ),
    )
    filtered = e.filter(
        (
            F.col("end_date").isNull()
            | (F.col("end_date") > F.expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
        )
        & (F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1997-06-01 00:00:00'"))
    )
    return filtered.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("end_date").isNull(), 1).otherwise(0)).alias("n_open"),
    )


@contract(
    "q_g4_intersect_all",
    oracle="""
        SELECT user_id, count(*) AS n
        FROM (SELECT user_id FROM events WHERE event_type = 'click'
              INTERSECT ALL
              SELECT user_id FROM events WHERE event_type = 'view')
        GROUP BY user_id
    """,
    survey_rows="G2",
    doc="bag-semantics intersection (INTERSECT ALL): per-user overlap "
    "multiplicity between two activity slices — min(count_a, count_b) "
    "per key, one shuffle (round 2)",
)
def q_g4(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    return (
        clicks.intersectAll(views)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@contract(
    "q_s1_sql_door",
    oracle="""
        SELECT e.event_type AS event_type,
               count(*) AS n,
               round(avg(e.value), 4) AS avg_value,
               round(max(e.value), 3) AS max_value
        FROM events e
        WHERE e.ts >= TIMESTAMP '2024-01-03 00:00:00'
          AND e.ts <  TIMESTAMP '2024-01-20 00:00:00'
          AND e.event_type IN ('click', 'view', 'purchase')
        GROUP BY e.event_type
    """,
    survey_rows="S1,B3,B5,D1",
    doc="the SQL front door (engine/sql.register_views): the catalog "
    "tables published as temp views and the fdsnws-event-search shape "
    "run as PURE spark.sql text — identical Catalyst plan to the "
    "DataFrame path (pushdown, AQE), proving the whole surface is "
    "SQL-reachable with zero extra machinery",
)
def q_s1(spark, sf_dir):
    from jane_spark.engine.sql import sql

    return sql(
        spark,
        sf_dir,
        """
        SELECT e.event_type AS event_type,
               count(*) AS n,
               round(avg(e.value), 4) AS avg_value,
               round(max(e.value), 3) AS max_value
        FROM events e
        WHERE e.ts >= TIMESTAMP '2024-01-03 00:00:00'
          AND e.ts <  TIMESTAMP '2024-01-20 00:00:00'
          AND e.event_type IN ('click', 'view', 'purchase')
        GROUP BY e.event_type
        """,
    )
