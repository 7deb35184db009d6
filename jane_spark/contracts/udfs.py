"""§2.10 J — UDF/UDAF/UDTF surface contracts.

jane's per-record Python logic (ObsPy parsing, preview computation) maps
to Spark's Arrow-batched pandas-UDF family [ref:
src/jane/waveforms/process_waveforms.py; plugin index(), conf=H;
SURVEY.md §0 caveat]. Hot relational paths stay UDF-free; these rows
prove the Python escape hatch works where it is genuinely needed.
"""

# NOTE: no `from __future__ import annotations` here — pandas_udf infers
# its eval type from *runtime* type hints; stringified annotations break it.
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jane_spark.contracts.registry import contract
from jane_spark.engine.catalog import Catalog


@contract(
    "q_j1_parse_files",
    oracle=None,  # binaryFile + parser plumbing — rows-only check
    survey_rows="J1,A1",
    doc="per-file parse: binaryFile scan → mapInPandas parser → index rows "
    "(sources/ingest.py; parser pluggable, ObsPy absent here)",
)
def q_j1(spark, sf_dir):
    from jane_spark.sources.ingest import parse_files, scan_files

    files = scan_files(spark, f"{sf_dir}/region.parquet")
    parsed = parse_files(files)
    return parsed.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_blocks"), F.sum("n_bytes").alias("total_bytes")
    )


@contract(
    "q_j2_grouped_map",
    oracle="""
        SELECT event_id, user_id,
               round(CASE WHEN stddev_samp(value) OVER w IS NULL
                           OR stddev_samp(value) OVER w = 0 THEN NULL
                          ELSE (value - avg(value) OVER w)
                               / stddev_samp(value) OVER w END, 4)
                   AS norm_value
        FROM events
        WINDOW w AS (PARTITION BY user_id)
    """,
    survey_rows="J2",
    doc="grouped-map applyInPandas: per-channel trace ops (z-normalize "
    "per user) vs the pure-SQL window twin",
)
def q_j2(spark, sf_dir):
    ev = Catalog(spark, sf_dir).clustered("events", "user_id")

    out_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("norm_value", T.DoubleType()),
        ]
    )

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["value"].std()  # ddof=1 == stddev_samp
        if pd.isna(std) or std == 0:
            norm = pd.Series([None] * len(pdf), dtype="float64")
        else:
            norm = (pdf["value"] - pdf["value"].mean()) / std
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "norm_value": norm}
        )

    normalized = ev.groupBy("user_id").applyInPandas(normalize, out_schema)
    return normalized.select(
        "event_id", "user_id", F.round("norm_value", 4).alias("norm_value")
    )


@contract(
    "q_j3_udaf",
    oracle="""
        SELECT event_type, round(avg(value), 4) AS mean_value, count(*) AS n
        FROM events GROUP BY event_type
    """,
    survey_rows="J3",
    doc="pandas GROUPED_AGG UDAF (custom reducer) vs built-in avg twin",
)
def q_j3(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events

    @F.pandas_udf(T.DoubleType())
    def pd_mean(v: pd.Series) -> float:
        return float(v.mean())

    @F.pandas_udf(T.LongType())
    def pd_count(v: pd.Series) -> int:
        return int(len(v))

    # grouped-agg pandas UDFs cannot mix with non-pandas aggregates in
    # one Aggregate — both reducers are pandas UDFs here
    return ev.groupBy("event_type").agg(
        F.round(pd_mean("value"), 4).alias("mean_value"),
        pd_count("value").alias("n"),
    )


@contract(
    "q_j4_udtf",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   unnest(string_split(text, ' ')) AS term,
                   unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
            FROM documents)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(pos) AS BIGINT) AS sum_pos,
               min_by(term, pos) AS first_term,
               max_by(term, pos) AS last_term
        FROM t GROUP BY doc_id
    """,
    survey_rows="J4",
    doc="a REAL Python UDTF (PySpark @udtf + SQL LATERAL): one document "
    "row fans out to (pos, term) rows, re-aggregated per doc so the "
    "oracle (zipped unnest + range ordinality in DuckDB) hash-checks "
    "position fidelity. Covers the UDTF API row itself — production "
    "explodes stay on the built-in JVM path (A2), this is the "
    "escape-hatch shape for logic explode() cannot express",
)
def q_j4(spark, sf_dir):
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, term string")
    class _Tokenize:
        def eval(self, text: str):
            for i, t in enumerate((text or "").split(" "), 1):
                yield i, t

    spark.udtf.register("jane_tokenize_udtf", _Tokenize)
    Catalog(spark, sf_dir).documents.createOrReplaceTempView("__j4_docs")
    rows = spark.sql(
        "SELECT d.doc_id, t.pos, t.term "
        "FROM __j4_docs d, LATERAL jane_tokenize_udtf(d.text) t"
    )
    return rows.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("pos").alias("sum_pos"),
        F.min_by("term", "pos").alias("first_term"),
        F.max_by("term", "pos").alias("last_term"),
    )
