"""Contract queries for the generic REST front door (services/rest_api):
jane's ``/rest/document_indices/<type>/`` and ``/rest/documents/<type>/``
endpoints — search → ordering → paging → serialization as one lifecycle
(SURVEY.md §3.1), each stage oracle-checked end to end.

Fixture derivations follow the established pattern: jane-shaped index /
document tables are derived with deterministic expressions from the
driver testdata so the DuckDB oracle can rebuild byte-identical inputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from jane_spark.contracts.registry import contract
from jane_spark.engine.catalog import Catalog
from jane_spark.services.rest_api import (
    document_list,
    index_search,
    serialize_indices,
)

_EVENT_META = {
    "quakeml_id": "str",
    "magnitude": "float",
    "origin_time": "UTCDateTime",
    "event_type": "str",
}


@contract(
    "q_r1_rest_search",
    oracle="""
        WITH idx AS (
            SELECT concat('evt:', CAST(event_id AS VARCHAR)) AS quakeml_id,
                   value AS magnitude,
                   date_trunc('microseconds', ts) AS origin_time,
                   event_type, event_id
            FROM events)
        SELECT quakeml_id, magnitude, origin_time, event_type
        FROM (SELECT *, row_number() OVER (
                  ORDER BY magnitude DESC, origin_time ASC, event_id ASC) AS rn
              FROM idx
              WHERE (event_type LIKE 'c%' OR event_type = 'view')
                AND magnitude >= 50.0
                AND origin_time > TIMESTAMP '2024-01-05 00:00:00')
        WHERE rn > 25 AND rn <= 125
    """,
    survey_rows="R1,B3,B4,B5,F1,F2",
    doc="generic REST index search: typed params (wildcard list + range "
    "+ timestamp edge) -> DRF ordering -> limit/offset page, the full "
    "/rest/document_indices lifecycle through one front door",
)
def q_r1(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    idx = ev.select(
        F.concat(F.lit("evt:"), F.col("event_id").cast("string")).alias("quakeml_id"),
        F.col("value").alias("magnitude"),
        F.col("ts").alias("origin_time"),
        "event_type",
        "event_id",
    )
    params = {
        "event_type": "c*,view",
        "min_magnitude": "50.0",
        "origin_time_after": "2024-01-05T00:00:00",
        "ordering": "-magnitude,origin_time",
        "limit": "100",
        "offset": "25",
    }
    page = index_search(idx, _EVENT_META, params, id_col="event_id")
    return page.select("quakeml_id", "magnitude", "origin_time", "event_type")


_DOC_META = {
    "name": "str",
    "lang": "str",
    "filesize": "int",
}


@contract(
    "q_r2_rest_doc_list",
    oracle="""
        WITH d AS (
            SELECT doc_id,
                   concat('doc_', CAST(doc_id % 250 AS VARCHAR)) AS name,
                   doc_id // 250 AS version,
                   'text/plain' AS content_type,
                   n_chars AS filesize,
                   md5(text) AS fingerprint,
                   lang
            FROM documents),
        hits AS (SELECT * FROM d WHERE lang IN ('en', 'fr')),
        latest AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY name
                    ORDER BY version DESC, doc_id DESC) AS vrn
                FROM hits)
            WHERE vrn = 1)
        SELECT name, version, content_type, filesize, fingerprint
        FROM (SELECT *, row_number() OVER (
                  ORDER BY name ASC, doc_id ASC) AS rn
              FROM latest)
        WHERE rn > 10 AND rn <= 70
    """,
    survey_rows="R2,A4,D5,F2",
    doc="REST raw-document listing: metadata search -> latest-version "
    "collapse per name (argmax BEFORE paging: a page never shows two "
    "versions) -> ordered page with content fingerprint",
)
def q_r2(spark, sf_dir):
    docs = Catalog(spark, sf_dir).documents
    derived = docs.select(
        "doc_id",
        F.concat(F.lit("doc_"), (F.col("doc_id") % 250).cast("string")).alias("name"),
        (F.col("doc_id") / 250).cast("long").alias("version"),
        F.lit("text/plain").alias("content_type"),
        F.col("n_chars").alias("filesize"),
        F.md5(F.col("text")).alias("fingerprint"),
        "lang",
    )
    params = {"lang": "en,fr", "ordering": "name", "limit": "60", "offset": "10"}
    page = document_list(derived, params, _DOC_META)
    return page.select("name", "version", "content_type", "filesize", "fingerprint")


_ORDER_META = {
    "o_totalprice": "float",
    "o_orderpriority": "str",
}


@contract(
    "q_r3_rest_serialize",
    oracle="""
        WITH page AS (
            SELECT * FROM (
                SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
                       o_totalprice,
                       row_number() OVER (
                           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
                FROM orders
                WHERE o_totalprice >= 100000.0)
            WHERE rn <= 200),
        counts AS (
            SELECT l_orderkey, count(*) AS attachments_count
            FROM lineitem GROUP BY l_orderkey)
        SELECT p.o_orderkey AS id,
               to_json(struct_pack(status := o_orderstatus,
                                   priority := o_orderpriority)) AS payload,
               c.c_name AS document_name,
               'application/xml' AS document_content_type,
               COALESCE(ct.attachments_count, 0) AS attachments_count,
               concat('/rest/document_indices/orders/',
                      CAST(p.o_orderkey AS VARCHAR)) AS url
        FROM page p
        LEFT JOIN customer c ON p.o_custkey = c.c_custkey
        LEFT JOIN counts ct ON p.o_orderkey = ct.l_orderkey
    """,
    survey_rows="R3,C1,C2,H9",
    doc="REST response serialization: searched+paged index rows joined "
    "to parent-document metadata (C1) and pre-aggregated attachment "
    "counts (C2), payload as byte-stable JSON (q_h9 rules), plus the "
    "resource url — the DRF serializer shape over Spark joins",
)
def q_r3(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    indices = cat.orders  # one "index row" per order
    documents = cat.customer.select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_name").alias("name"),
        F.lit("application/xml").alias("content_type"),
    )
    attachments = cat.lineitem.select(F.col("l_orderkey").alias("index_id"))
    params = {
        "min_o_totalprice": "100000.0",
        "ordering": "-o_totalprice",
        "limit": "200",
    }
    page = index_search(indices, _ORDER_META, params, id_col="o_orderkey")
    return serialize_indices(
        page,
        documents,
        attachments,
        payload_fields=[
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        ],
        id_col="o_orderkey",
        doc_type="orders",
        doc_id_col="o_custkey",
    )


_ESC = (
    "replace(replace(replace(replace({c}, '&', '&amp;'), "
    "'<', '&lt;'), '>', '&gt;'), '\"', '&quot;')"
)


@contract(
    "q_r4_rest_xml",
    oracle=f"""
        WITH page AS (
            SELECT * FROM (
                SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
                       row_number() OVER (
                           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
                FROM orders
                WHERE o_totalprice >= 100000.0)
            WHERE rn <= 200),
        counts AS (
            SELECT l_orderkey, count(*) AS n
            FROM lineitem GROUP BY l_orderkey)
        SELECT p.o_orderkey AS id,
               concat('<index id="', CAST(p.o_orderkey AS VARCHAR),
                      '" type="orders"',
                      -- xml_attr omits the WHOLE attribute for NULL
                      -- (DuckDB concat would skip only the NULL piece,
                      -- leaving document="" — semantics must match)
                      CASE WHEN c.c_name IS NULL THEN ''
                           ELSE concat(' document="',
                                       {_ESC.format(c="c.c_name")}, '"')
                      END,
                      ' attachments="',
                      CAST(COALESCE(ct.n, 0) AS VARCHAR), '">',
                      '<status>', {_ESC.format(c="p.o_orderstatus")},
                      '</status><priority>',
                      {_ESC.format(c="p.o_orderpriority")},
                      '</priority></index>') AS xml
        FROM page p
        LEFT JOIN customer c ON p.o_custkey = c.c_custkey
        LEFT JOIN counts ct ON p.o_orderkey = ct.l_orderkey
    """,
    survey_rows="R3,A8",
    doc="REST format=xml renderer: same search→page→join shape as the "
    "JSON serializer, payload fields as ESCAPED child elements and "
    "metadata as escaped attributes — the DRF XML renderer over pure "
    "string expressions, byte-checked against a replace-chain oracle",
)
def q_r4(spark, sf_dir):
    from jane_spark.services.rest_api import serialize_indices_xml

    cat = Catalog(spark, sf_dir)
    documents = cat.customer.select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_name").alias("name"),
    )
    attachments = cat.lineitem.select(F.col("l_orderkey").alias("index_id"))
    params = {
        "min_o_totalprice": "100000.0",
        "ordering": "-o_totalprice",
        "limit": "200",
    }
    page = index_search(cat.orders, _ORDER_META, params, id_col="o_orderkey")
    return serialize_indices_xml(
        page,
        documents,
        attachments,
        payload_fields=[
            ("status", F.col("o_orderstatus")),
            ("priority", F.col("o_orderpriority")),
        ],
        id_col="o_orderkey",
        doc_type="orders",
        doc_id_col="o_custkey",
    )
