"""JSONL ingest with corrupt-record quarantine (round 10, A11).

The other ubiquitous corpus container besides WARC/parquet: one JSON
object per line, usually hand-rolled by upstream producers and
therefore routinely broken — truncated lines, bad escapes, trailing
garbage. jane's analogue is its upload path rejecting invalid
documents into an error state [ref: src/jane/documents — validation on
PUT, conf=M; SURVEY.md §0 caveat]; the Spark-native translation is
PERMISSIVE-mode parsing with ``columnNameOfCorruptRecord``: good rows
flow typed, broken rows are QUARANTINED with their raw bytes intact
for re-processing — never dropped silently, never failing the batch
(the 100 TB posture: one bad shard must not kill a 10k-file read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_jsonl_quarantine(
    spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL at ``path`` with the given DDL ``schema``; return
    ``(good, quarantine)``. ``good`` carries the typed columns;
    ``quarantine`` carries the raw line of every record that failed to
    parse. PERMISSIVE + corrupt-column is the documented Spark recipe;
    the quarantine filter requires the corrupt column to be part of
    the user schema (Spark drops it otherwise)."""
    full = f"{schema}, {CORRUPT_COL} string"
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        # Spark refuses corrupt-column-only queries against the raw
        # source (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — caching the
        # parsed frame is the documented recipe, and the quarantine
        # split reads the parse once instead of twice anyway
        .cache()
    )
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
    )
    return good, quarantine


def read_csv_quarantine(
    spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """CSV twin of ``read_jsonl_quarantine`` — same PERMISSIVE +
    corrupt-column recipe through ``spark.read.csv``: malformed rows
    (wrong token count, uncastable values) land raw in the quarantine
    frame instead of silently nulling or failing the batch. CSV is
    the other container hand-rolled upstream exporters actually emit;
    the quarantine split must behave identically to the JSON path so
    a pipeline can swap containers without changing its error
    handling. Same cache requirement (corrupt-column-only queries are
    refused against the raw source)."""
    full = f"{schema}, {CORRUPT_COL} string"
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
        .cache()
    )
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
    )
    return good, quarantine


def read_xml_quarantine(
    spark: SparkSession, path: str, schema: str, row_tag: str = "doc"
) -> tuple[DataFrame, DataFrame]:
    """XML twin of ``read_jsonl_quarantine`` — the THIRD container
    through the same PERMISSIVE + corrupt-column contract. One XML
    record per line (the newline-delimited export shape upstream
    producers hand-roll, like JSONL): lines read as text, parsed with
    ``from_xml`` per record. The whole-file ``spark.read.format("xml")``
    reader is deliberately NOT used here: a single malformed record
    poisons the remainder of its FILE into one corrupt blob (measured
    r12 — file-granularity quarantine), while ``from_xml`` over lines
    quarantines exactly the broken record. PERMISSIVE keeps whatever
    fields still parsed; quarantine membership is corrupt-col IS NOT
    NULL, identical to the JSON/CSV paths, so pipelines swap
    containers without changing error handling."""
    full = f"{schema}, {CORRUPT_COL} string"
    parsed = spark.read.text(path).select(
        F.from_xml(
            "value",
            full,
            {
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": CORRUPT_COL,
                "rowTag": row_tag,
            },
        ).alias("r")
    ).select("r.*")
    good = parsed.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = parsed.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
    )
    return good, quarantine
