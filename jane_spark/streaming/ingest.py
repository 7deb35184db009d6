"""Structured-Streaming ingest surface (SURVEY.md §2.9 I).

jane's "streaming" is a filesystem monitor (watchdog + task queue) that
keeps indices continuously up to date [ref: src/jane/waveforms/ —
monitor/mgmt commands, conf=M; SURVEY.md §0 caveat]. Spark redesign:
file-source streams with ``availableNow`` batch-equivalence — the same
transformation runs as a stream in production and as a batch in tests
and oracle checks, which is the correctness story for the whole I-row
family.

Exactly-once posture: checkpointed source progress + idempotent
``foreachBatch`` sinks (dynamic partition overwrite keyed by source
file — I7) — the Spark translation of jane's delete-then-insert
per-file reindex transaction.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession


def stream_parquet_dir(
    spark: SparkSession, path: str, schema, max_files_per_trigger: int | None = None
):
    """File-arrival stream over a parquet directory (I1)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def run_available_now(
    stream_df: DataFrame, transform, query_name: str = "jane_stream",
    output_mode: str | None = None,
) -> DataFrame:
    """Run ``transform(stream_df)`` to completion with the availableNow
    trigger into an in-memory sink; return the materialized result.

    This is the batch-equivalence harness: stream result == batch result
    on the same input (SURVEY.md §5.2.5). ``output_mode`` overrides the
    default (complete for aggregations, else append) — watermark-drop
    contracts (I5) need append so finalized windows are emitted once and
    late rows can actually be discarded (complete mode never drops).
    """
    spark = stream_df.sparkSession
    out = transform(stream_df)
    mode = output_mode or ("complete" if _has_aggregation(out) else "append")
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            out.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(query_name)


def _has_aggregation(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().logical().toString()
    return "Aggregate" in plan


def stream_waveform_dir(spark: SparkSession, path: str, max_files_per_trigger: int | None = None):
    """I1+J1+A1 composed: the reference's monitor loop as a stream —
    waveform files appearing in a directory are parsed into per-trace
    index rows continuously. Pair with ``start_index_upsert_stream``
    (keyed by path) for the full §3.3 ingest pipeline."""
    from jane_spark.sources.ingest import parse_waveform_files

    # binaryFile's schema is fixed but streaming sources require it spelled out
    schema = (
        "path string, modificationTime timestamp, length long, content binary"
    )
    reader = spark.readStream.format("binaryFile").schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    binary = reader.load(path)
    return parse_waveform_files(binary)
