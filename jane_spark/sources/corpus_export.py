"""Corpus export sink: the last stage of a training-data pipeline
(SURVEY.md §2.11 P-rows) — materialize the filtered/deduped/split
corpus as hive-partitioned Parquet that a downstream tokenizer fleet
can read partition-pruned.

Small-files discipline is the whole design. A naive
``df.write.partitionBy(...)`` lets EVERY task write one file per
partition value it happens to hold: with 10k tasks × (3 splits ×
5 langs) that is ~150k files per run — the classic 100 TB small-files
failure. The fix is to repartition on (partition cols + shard) FIRST,
so each output file is written by exactly one task, and the file count
is exactly ``n_partition_values × shards`` (± empty shards), chosen to
match the cluster's read parallelism. ``maxRecordsPerFile`` caps file
size as a backstop when a shard is unexpectedly large.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def export_corpus(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = ("split", "lang"),
    shards: int = 4,
    shard_key: str | None = None,
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as hive-partitioned Parquet with a bounded, layout-
    independent file count.

    ``shards`` files per partition value, assigned by a deterministic
    hash of ``shard_key`` (defaults to the first non-partition column)
    — so re-running the export on the same data produces the same
    row→shard assignment regardless of input partitioning, mirroring
    the determinism rules of functions/sampling.py.
    """
    data_cols = [c for c in df.columns if c not in set(partition_cols)]
    if not data_cols:
        raise ValueError("export needs at least one non-partition column")
    key = shard_key or data_cols[0]
    shard = F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(shards))
    out = df.repartition(*[F.col(c) for c in partition_cols], shard)
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def export_manifest(
    spark: SparkSession,
    path: str,
    partition_cols: Sequence[str] = ("split", "lang"),
) -> DataFrame:
    """Read-back manifest of an exported corpus: one row per hive
    partition with row/file counts — the post-export audit (file counts
    bounded by ``shards``, totals match the input)."""
    return (
        spark.read.parquet(path)
        .withColumn("_file", F.input_file_name())
        .groupBy(*partition_cols)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("_file").alias("n_files"),
        )
    )
