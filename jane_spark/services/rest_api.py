"""Generic REST document/index API — jane's ``/rest/`` surface.

Besides the three FDSN services, jane exposes a generic REST API over
every registered document type: ``/rest/documents/<type>/`` (raw
document listing, versioned) and ``/rest/document_indices/<type>/``
(typed index search) [ref: src/jane/documents/ — DRF viewsets/urls +
serializers, conf=H on the surface (it is documented at
krischer.github.io/jane), M on exact symbols; SURVEY.md §0 caveat].
Request features: typed search params validated against the plugin
``meta`` dict (the predicate compiler), DRF-style ``ordering`` (comma
list, ``-`` prefix for descending), ``limit``/``offset`` pagination,
and JSON serialization of each index row together with its parent
document's metadata and its attachment count.

Spark redesign (SURVEY.md §3.1): reserved params are split off, search
params compile to one pushdown-visible Column predicate, ordering maps
to an explicit total order (id tie-break — nondeterministic pages are
unacceptable), paging is the F2 row_number window, and serialization is
``to_json(struct(...))`` plus two equi-joins (document metadata,
attachment counts) — the C1/C2 join shapes behind one front door.
At scale the serializer never shuffles the index on anything but the
join keys; attachment counts aggregate BEFORE the join so the index
rows join against one pre-reduced row per index id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jane_spark.operators.topk import paged
from jane_spark.plans.predicates import compile_params

RESERVED_PARAMS = frozenset({"limit", "offset", "ordering", "format"})

#: jane's REST endpoints serve JSON by default; xml mirrors the DRF
#: renderer set. Anything else is a client error (same posture as
#: fdsnws._validate: reject, don't guess).
FORMATS = frozenset({"json", "xml"})


def parse_rest_params(
    params: dict[str, str], meta: dict[str, str]
) -> tuple[dict[str, str], list[str], int | None, int, str]:
    """Split an HTTP param dict into (search, ordering, limit, offset,
    format). Search keys are validated against ``meta`` by the
    predicate compiler at compile time; reserved keys are never field
    lookups. Unknown ordering fields raise (jane's DRF ordering filter
    silently ignores unknown fields, but silent acceptance of a typo'd
    sort is exactly the un-debuggable behavior we refuse elsewhere —
    the stricter contract is deliberate and documented)."""
    search = {k: v for k, v in params.items() if k not in RESERVED_PARAMS}
    ordering = [s for s in params.get("ordering", "").split(",") if s]
    for item in ordering:
        field = item[1:] if item.startswith("-") else item
        if field not in meta:
            raise KeyError(f"unknown ordering field: {field}")
    limit = int(params["limit"]) if "limit" in params else None
    offset = int(params.get("offset", "0"))
    if limit is not None and limit < 0:
        raise ValueError(f"negative limit: {limit}")
    if offset < 0:
        raise ValueError(f"negative offset: {offset}")
    fmt = params.get("format", "json")
    if fmt not in FORMATS:
        raise ValueError(f"unknown format: {fmt!r}; supported: json, xml")
    return search, ordering, limit, offset, fmt


def ordering_columns(ordering: list[str], id_col: str) -> list[Column]:
    """DRF ordering list → Column sort spec with the id tie-break
    appended (total order ⇒ stable pages, FIXTURES.md determinism
    rules)."""
    cols: list[Column] = []
    for item in ordering:
        if item.startswith("-"):
            cols.append(F.col(item[1:]).desc())
        else:
            cols.append(F.col(item).asc())
    cols.append(F.col(id_col).asc())
    return cols


def index_search(
    indices: DataFrame,
    meta: dict[str, str],
    params: dict[str, str],
    id_col: str,
) -> DataFrame:
    """``GET /rest/document_indices/<type>/?...`` — filter, order, page.

    The compiled predicate is pure Column ops, so Catalyst pushes it
    into the parquet scan; paging runs AFTER the filter on the (much
    smaller) hit set. Rows come back in page order."""
    search, ordering, limit, offset, _fmt = parse_rest_params(params, meta)
    out = indices.filter(compile_params(search, meta))
    order = ordering_columns(ordering, id_col)
    return _apply_paging(out, order, limit, offset).orderBy(*order)


def _apply_paging(
    df: DataFrame, order: list[Column], limit: int | None, offset: int
) -> DataFrame:
    """Shared paging tail for both endpoints: limit+offset is the F2
    window; offset WITHOUT limit = "the rest" (DRF allows it) as a
    one-sided row_number cut rather than a bogus huge limit."""
    if limit is not None:
        return paged(df, order, offset, limit)
    if offset:
        from pyspark.sql import Window

        w = Window.orderBy(*order)
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") > offset)
            .drop("__rn")
        )
    return df


def _join_document_and_counts(
    indices: DataFrame,
    documents: DataFrame,
    attachments: DataFrame | None,
    id_col: str,
    doc_id_col: str,
    attachment_fk: str,
    doc_cols: list[Column],
    count_alias: str,
) -> DataFrame:
    """Shared serializer prelude (both renderers): left-join parent-
    document metadata (C1) and PRE-AGGREGATED attachment counts (C2 —
    the index never meets raw attachment rows; plan-guarded)."""
    doc_meta = documents.select(F.col(doc_id_col), *doc_cols)
    out = indices.join(doc_meta, on=doc_id_col, how="left")
    if attachments is not None:
        counts = attachments.groupBy(
            F.col(attachment_fk).alias("__att_fk")
        ).agg(F.count(F.lit(1)).alias(count_alias))
        out = out.join(
            counts, on=out[id_col] == counts["__att_fk"], how="left"
        ).drop("__att_fk")
    else:
        out = out.withColumn(count_alias, F.lit(None).cast("long"))
    return out


def serialize_indices(
    indices: DataFrame,
    documents: DataFrame,
    attachments: DataFrame | None,
    payload_fields: list[str | Column],
    id_col: str,
    doc_type: str,
    doc_id_col: str = "doc_id",
    attachment_fk: str = "index_id",
) -> DataFrame:
    """DRF-style response rows for an index page.

    Output columns (one row per index row): ``id``, ``payload`` (the
    typed index fields as one JSON object — insertion-ordered keys,
    byte-stable for non-null int/string fields, the q_h9 contract),
    ``document_name``/``document_content_type`` from the parent
    document (C1), ``attachments_count`` (C2, zero for none), and the
    resource ``url`` path. Attachment counts are aggregated before the
    join — the index never joins against raw attachment rows."""
    out = _join_document_and_counts(
        indices,
        documents,
        attachments,
        id_col,
        doc_id_col,
        attachment_fk,
        doc_cols=[
            F.col("name").alias("document_name"),
            F.col("content_type").alias("document_content_type"),
        ],
        count_alias="attachments_count",
    )
    return out.select(
        F.col(id_col).alias("id"),
        F.to_json(F.struct(*payload_fields)).alias("payload"),
        "document_name",
        "document_content_type",
        F.coalesce(F.col("attachments_count"), F.lit(0)).alias("attachments_count"),
        F.concat(
            F.lit(f"/rest/document_indices/{doc_type}/"),
            F.col(id_col).cast("string"),
        ).alias("url"),
    )


def document_list(
    documents: DataFrame,
    params: dict[str, str],
    meta: dict[str, str],
    name_col: str = "name",
    version_col: str = "version",
    id_col: str = "doc_id",
) -> DataFrame:
    """``GET /rest/documents/<type>/`` — the versioned raw-document
    listing: searchable on document metadata, collapsed to the latest
    version per name (A4/D5 argmax), then ordered and paged. The
    version collapse happens BEFORE paging — a page must never show
    two versions of one document."""
    from jane_spark.operators.topk import argmax

    search, ordering, limit, offset, _fmt = parse_rest_params(params, meta)
    hits = documents.filter(compile_params(search, meta))
    latest = argmax(
        hits, [name_col], [F.col(version_col).desc(), F.col(id_col).desc()]
    )
    order = ordering_columns(ordering, id_col)
    return _apply_paging(latest, order, limit, offset).orderBy(*order)


def serialize_indices_xml(
    indices: DataFrame,
    documents: DataFrame,
    attachments: DataFrame | None,
    payload_fields: list[tuple[str, Column]],
    id_col: str,
    doc_type: str,
    doc_id_col: str = "doc_id",
    attachment_fk: str = "index_id",
) -> DataFrame:
    """``format=xml`` twin of ``serialize_indices`` (jane's DRF
    renderer set serves both): one ``<index>`` element per row, payload
    fields as escaped child elements, document metadata and attachment
    count as attributes. Same join shape as the JSON path — pure
    row-local string construction on top (functions/xml)."""
    from jane_spark.functions.xml import xml_attr, xml_element, xml_escape

    out = _join_document_and_counts(
        indices,
        documents,
        attachments,
        id_col,
        doc_id_col,
        attachment_fk,
        doc_cols=[F.col("name").alias("__doc_name")],
        count_alias="__att_n",
    )
    # index payloads are free text — escaped in content position, the
    # same discipline xml_attr applies to attributes
    children = F.concat(
        *[
            xml_element(name, xml_escape(col.cast("string")))
            for name, col in payload_fields
        ]
    )
    return out.select(
        F.col(id_col).alias("id"),
        xml_element(
            "index",
            children,
            xml_attr("id", F.col(id_col)),
            xml_attr("type", F.lit(doc_type)),
            xml_attr("document", F.col("__doc_name")),
            xml_attr("attachments", F.coalesce(F.col("__att_n"), F.lit(0))),
        ).alias("xml"),
    )
