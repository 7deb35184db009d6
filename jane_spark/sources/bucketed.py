"""Bucketed table layout (SURVEY.md §4.1 joins): pre-shuffle data ONCE
at write time so every later equi-join/aggregation on the bucket key
runs with no exchange at all — the on-disk counterpart of the catalog's
pinned in-memory clustering, and the right trade at 100 TB whenever a
key is joined repeatedly (fact-to-fact joins AQE can't broadcast).

Both sides must agree on (key, bucket count); ``sortBy`` additionally
lets sort-merge join skip its sorts. Spark persists bucketing metadata
through the session catalog, so readers must go through
``spark.table(name)`` — a plain ``read.parquet(path)`` sees files, not
buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str,
    buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (optionally sort-bucketed) table.
    ``path`` makes it an external table (tests use a temp dir)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def drop_table(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {name}")
