"""Unit tests for the generic REST front door (services/rest_api):
param splitting, ordering validation, paging semantics, the version
collapse, and the DRF-style serialization row shape."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from jane_spark.services.rest_api import (
    document_list,
    index_search,
    ordering_columns,
    parse_rest_params,
    serialize_indices,
)

META = {"mag": "float", "kind": "str", "when": "UTCDateTime"}


def test_parse_rest_params_splits_reserved():
    search, ordering, limit, offset, fmt = parse_rest_params(
        {"kind": "a,b", "min_mag": "2.0", "ordering": "-mag,kind",
         "limit": "10", "offset": "5", "format": "xml"},
        META,
    )
    assert search == {"kind": "a,b", "min_mag": "2.0"}
    assert ordering == ["-mag", "kind"]
    assert (limit, offset, fmt) == (10, 5, "xml")


def test_parse_rest_params_defaults():
    search, ordering, limit, offset, fmt = parse_rest_params({}, META)
    assert search == {} and ordering == []
    assert limit is None and offset == 0 and fmt == "json"


@pytest.mark.parametrize(
    "params, err",
    [
        ({"ordering": "-nope"}, KeyError),
        ({"limit": "-1"}, ValueError),
        ({"offset": "-3"}, ValueError),
        ({"format": "csv"}, ValueError),
    ],
)
def test_parse_rest_params_rejects(params, err):
    with pytest.raises(err):
        parse_rest_params(params, META)


def test_ordering_always_tiebreaks_by_id(spark):
    cols = ordering_columns(["-mag"], "id")
    assert len(cols) == 2  # requested order + id tie-break
    cols = ordering_columns([], "id")
    assert len(cols) == 1


def _idx(spark):
    rows = [(i, float(i % 7), ["x", "y", "z"][i % 3]) for i in range(30)]
    return spark.createDataFrame(rows, "id long, mag double, kind string")


def test_index_search_filter_order_page(spark):
    meta = {"mag": "float", "kind": "str"}
    out = index_search(
        _idx(spark),
        meta,
        {"kind": "x,y", "min_mag": "1.0", "ordering": "-mag",
         "limit": "5", "offset": "2"},
        id_col="id",
    ).collect()
    assert len(out) == 5
    mags = [r.mag for r in out]
    assert mags == sorted(mags, reverse=True)
    # within equal mag, ids ascend (tie-break)
    for a, b in zip(out, out[1:]):
        if a.mag == b.mag:
            assert a.id < b.id
    assert all(r.kind in ("x", "y") and r.mag >= 1.0 for r in out)


def test_index_search_offset_without_limit(spark):
    meta = {"mag": "float", "kind": "str"}
    base = index_search(_idx(spark), meta, {}, id_col="id").collect()
    rest = index_search(_idx(spark), meta, {"offset": "25"}, id_col="id").collect()
    assert len(rest) == len(base) - 25
    assert [r.id for r in rest] == [r.id for r in base][25:]


def test_index_search_unknown_param_rejected(spark):
    with pytest.raises(KeyError):
        index_search(_idx(spark), {"mag": "float"}, {"nope": "1"}, id_col="id")


def test_document_list_version_collapse_before_paging(spark):
    # name n0 has versions 0..2; the page must show only version 2
    rows = [(i, f"n{i % 4}", i // 4) for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, name string, version long")
    out = document_list(
        docs, {"ordering": "name", "limit": "10"},
        {"name": "str", "version": "int"},
    ).collect()
    assert len(out) == 4  # one per name
    assert all(r.version == 2 for r in out)
    assert [r.name for r in out] == sorted(r.name for r in out)


def test_serialize_indices_row_shape(spark):
    indices = spark.createDataFrame(
        [(1, 10, "A", 5), (2, 11, "B", 6), (3, 99, "C", 7)],
        "iid long, doc_id long, status string, n long",
    )
    documents = spark.createDataFrame(
        [(10, "docA", "text/xml"), (11, "docB", "text/xml")],
        "doc_id long, name string, content_type string",
    )
    attachments = spark.createDataFrame(
        [(1,), (1,), (2,)], "index_id long"
    )
    out = {
        r.id: r
        for r in serialize_indices(
            indices, documents, attachments,
            payload_fields=[F.col("status"), F.col("n")],
            id_col="iid", doc_type="t",
        ).collect()
    }
    assert json.loads(out[1].payload) == {"status": "A", "n": 5}
    assert out[1].document_name == "docA"
    assert out[1].attachments_count == 2
    assert out[2].attachments_count == 1
    assert out[3].attachments_count == 0  # no attachments
    assert out[3].document_name is None  # orphan index row: left join
    assert out[1].url == "/rest/document_indices/t/1"


def test_serialize_indices_no_attachment_table(spark):
    indices = spark.createDataFrame([(1, 10, "A")], "iid long, doc_id long, s string")
    documents = spark.createDataFrame(
        [(10, "d", "ct")], "doc_id long, name string, content_type string"
    )
    row = serialize_indices(
        indices, documents, None, [F.col("s")], "iid", "t"
    ).collect()[0]
    assert row.attachments_count == 0


def test_serialize_indices_xml_escapes_content(spark):
    from jane_spark.services.rest_api import serialize_indices_xml

    indices = spark.createDataFrame(
        [(1, 10, 'a<b&"c')], "iid long, doc_id long, status string"
    )
    documents = spark.createDataFrame(
        [(10, 'Doc<&>"', "ct")], "doc_id long, name string, content_type string"
    )
    row = serialize_indices_xml(
        indices, documents, None,
        [("status", F.col("status"))], "iid", "t",
    ).collect()[0]
    assert row.xml == (
        '<index id="1" type="t" document="Doc&lt;&amp;&gt;&quot;"'
        ' attachments="0">'
        "<status>a&lt;b&amp;&quot;c</status></index>"
    )


def test_document_list_offset_without_limit(spark):
    docs = spark.createDataFrame(
        [(i, f"n{i}", 0) for i in range(10)],
        "doc_id long, name string, version long",
    )
    meta = {"name": "str", "version": "int"}
    base = document_list(docs, {"ordering": "name"}, meta).collect()
    rest = document_list(docs, {"ordering": "name", "offset": "7"}, meta).collect()
    assert [r.name for r in rest] == [r.name for r in base][7:]


def test_serialize_xml_null_document_omits_attribute(spark):
    from jane_spark.services.rest_api import serialize_indices_xml

    indices = spark.createDataFrame([(1, 99, "A")], "iid long, doc_id long, s string")
    documents = spark.createDataFrame(
        [(10, "d", "ct")], "doc_id long, name string, content_type string"
    )
    row = serialize_indices_xml(
        indices, documents, None, [("s", F.col("s"))], "iid", "t"
    ).collect()[0]
    # orphan index row: the document attribute is OMITTED, not empty
    assert 'document=' not in row.xml
    assert row.xml.startswith('<index id="1" type="t" attachments="0">')
