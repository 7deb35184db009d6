"""Upload-validation gate for XML document ingest (SURVEY.md §2.1 A2/A3).

jane refuses invalid QuakeML/StationXML at upload time: every document
runs through the doc-type's validator plugin BEFORE any index row is
written, and a failing document is rejected with a reason — it never
becomes a (partially) indexed document [ref: src/jane/documents/
plugins.py — ValidatorPluginPoint; src/jane/documents/views.py —
upload path, conf=H; SURVEY.md §0 caveat].

Spark translation: an Arrow-batched validator stage producing a
``reject_reason`` column (NULL = accepted), a splitter, and an
IndexStore front door that writes ONLY accepted documents and returns
the rejected ones as a quarantine frame with reasons — the reject lane
is data, not a log line.

Validation is structural (well-formedness + root element + required
container + identity attributes), not full XSD — the checks that stop
a bad upload from poisoning an index. The stage is a pandas UDF by
necessity (XML parsing has no JVM expression); it is Arrow-batched,
row-local, and zero-shuffle, so at 100 TB it scales with the scan.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _validate_one(data: bytes | str | None, doc_type: str) -> str | None:
    """Reason string for a rejected payload, None when valid. Reasons
    are a closed vocabulary so the quarantine lane is groupable."""
    import xml.etree.ElementTree as ET

    if data is None:
        return "empty-document"
    if isinstance(data, (bytes, bytearray)):
        try:
            text = bytes(data).decode("utf-8")
        except UnicodeDecodeError:
            return "not-utf8"
    else:
        text = data
    if not text.strip():
        return "empty-document"
    try:
        root = ET.fromstring(text)
    except ET.ParseError:
        return "malformed-xml"
    if doc_type == "quakeml":
        if _localname(root.tag) != "quakeml":
            return "wrong-root-element"
        eps = [c for c in root if _localname(c.tag) == "eventParameters"]
        if not eps:
            return "missing-eventParameters"
        for ep in eps:
            for ev in ep:
                if _localname(ev.tag) == "event" and not ev.get("publicID"):
                    return "event-missing-publicID"
        return None
    if doc_type == "stationxml":
        if _localname(root.tag) != "FDSNStationXML":
            return "wrong-root-element"
        nets = [c for c in root if _localname(c.tag) == "Network"]
        if not nets:
            return "missing-Network"
        if any(not n.get("code") for n in nets):
            return "network-missing-code"
        return None
    raise ValueError(f"no validator registered for doc_type {doc_type!r}")


def validate_documents(
    df: DataFrame, doc_type: str, payload_col: str = "data"
) -> DataFrame:
    """Add ``reject_reason`` (NULL = valid) + ``valid`` columns via one
    Arrow-batched validator pass over the payload column."""
    # bind doc_type now so an unknown type fails at plan build, not in
    # an executor traceback
    if doc_type not in ("quakeml", "stationxml"):
        raise ValueError(f"no validator registered for doc_type {doc_type!r}")

    @F.pandas_udf(StringType())
    def _reason(payloads: pd.Series) -> pd.Series:
        return payloads.map(lambda d: _validate_one(d, doc_type))

    out = df.withColumn("reject_reason", _reason(F.col(payload_col)))
    return out.withColumn("valid", F.col("reject_reason").isNull())


def partition_documents(
    df: DataFrame, doc_type: str, payload_col: str = "data"
) -> tuple[DataFrame, DataFrame]:
    """(accepted, rejected): one validator pass, two filtered lanes."""
    checked = validate_documents(df, doc_type, payload_col)
    accepted = checked.filter(F.col("valid")).drop("valid", "reject_reason")
    rejected = checked.filter(~F.col("valid")).drop("valid")
    return accepted, rejected


def write_documents_validated(
    store, docs: DataFrame, doc_type: str, payload_col: str = "data"
) -> DataFrame:
    """The gated ingest front door: write ONLY accepted documents into
    the store; return the rejected quarantine frame (with reasons) for
    the caller to persist/report. jane's upload 400-with-reason,
    re-expressed as two DataFrame lanes."""
    accepted, rejected = partition_documents(docs, doc_type, payload_col)
    store.write_documents(accepted)
    return rejected
