"""Zone-map (min/max statistics) file-skipping audit — the scan-pruning
story that layout operators exist to serve (round 12).

Every columnar lake format carries per-file min/max statistics (parquet
footers, ORC stripe stats, Delta/Iceberg manifests), and every engine
prunes files whose [min, max] interval misses the predicate before a
single byte is read. Whether that pruning WORKS is a property of the
physical layout: a file set range-clustered on column A prunes
perfectly on A-predicates and not at all on B-predicates; a Z-ordered
layout (operators/zorder.py) prunes usefully on EVERY participating
dimension. At 100 TB the difference between scanning 3% and 100% of
files IS the query budget — so the layout decision deserves a
measured, queryable audit, not folklore.

This module computes that audit as a relational query over the table
itself: per-file zone maps via one map-side-combinable groupBy, then a
files-axis aggregate that replays the engine's pruning rule
(interval-overlap against the predicate box). Everything is integer
arithmetic over BIGINT counts — engine-portable, no float anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zonemap_stats(
    df: DataFrame, file_col: str, cols: list[str]
) -> DataFrame:
    """Per-file zone maps: ``(file_col, n, min_<c>, max_<c> ...)`` —
    the statistics a parquet footer / lakehouse manifest stores per
    file. One map-side-combinable groupBy; output is |files| rows
    regardless of table size."""
    if not cols:
        raise ValueError("cols must be non-empty")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for c in cols:
        aggs.append(F.min(F.col(c).cast("long")).alias(f"min_{c}"))
        aggs.append(F.max(F.col(c).cast("long")).alias(f"max_{c}"))
    return df.groupBy(file_col).agg(*aggs)


def zonemap_prune_audit(
    df: DataFrame,
    file_col: str,
    ranges: dict[str, tuple[int, int]],
) -> DataFrame:
    """One-row pruning audit of the layout in ``file_col`` against the
    closed-interval predicate box ``ranges`` (``{col: (lo, hi)}``):

    ``(n_files, files_scanned, rows_total, rows_scanned,
    rows_matching)``

    where a file is *scanned* iff every column's zone map overlaps its
    predicate interval (``min_c <= hi AND max_c >= lo`` — exactly the
    rule parquet row-group / Delta file skipping applies), and
    ``rows_matching`` is the exact predicate count. Zone-map pruning
    is LOSSLESS by construction — every matching row lives in a
    scanned file — so ``rows_matching <= rows_scanned`` always; the
    layout's quality is ``rows_scanned / rows_matching`` (read
    amplification) and ``files_scanned / n_files`` (skip rate).

    Two map-side-combinable aggregates chained on the same keys: the
    per-file stats shuffle is |files|-bounded and the audit folds
    those |files| rows to one — at any table size the driver sees six
    BIGINTs.
    """
    if not ranges:
        raise ValueError("ranges must be non-empty")
    pred = F.lit(True)
    for c, (lo, hi) in ranges.items():
        pred = pred & F.col(c).between(int(lo), int(hi))
    stats = df.groupBy(file_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(pred, 1).otherwise(0)).cast("bigint").alias("n_match"),
        *[
            m(F.col(c).cast("long")).alias(f"{tag}_{c}")
            for c in ranges
            for tag, m in (("min", F.min), ("max", F.max))
        ],
    )
    scanned = F.lit(True)
    for c, (lo, hi) in ranges.items():
        scanned = scanned & (
            (F.col(f"min_{c}") <= int(hi)) & (F.col(f"max_{c}") >= int(lo))
        )
    # coalesce: an EMPTY table audits to all-zeros, not NULLs
    return stats.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.coalesce(F.sum(F.when(scanned, 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias("files_scanned"),
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("rows_total"),
        F.coalesce(
            F.sum(F.when(scanned, F.col("n")).otherwise(0)), F.lit(0)
        )
        .cast("bigint")
        .alias("rows_scanned"),
        F.coalesce(F.sum("n_match"), F.lit(0))
        .cast("bigint")
        .alias("rows_matching"),
    )
