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


def shard_balance_audit(
    df: DataFrame,
    shard_col: str,
    weight_col: str,
    n_shards_expected: int | None = None,
) -> DataFrame:
    """One-row balance audit of a shard layout — the skew alarm every
    partitioned write should publish next to its manifest: straggler
    tasks, hot-spot files, and lopsided splits all start as weight
    imbalance across shards. Returns

    ``(n_shards, total_w, min_w, max_w, gini_num, gini_den, gini_e4,
    skew_e4)``

    where the Gini coefficient travels as the exact integer rational
    ``gini_num / gini_den`` with ``gini_num = sum_i (2i - n - 1) w_i``
    over the ascending weight order (i 1-based, ties broken by shard
    id — deterministic) and ``gini_den = n * total_w``; 0 = perfectly
    even, -> 1 = all mass on one shard. ``skew_e4 = max_w * n * 1e4
    div total_w`` is the straggler ratio (10000 = even; the slowest
    task runs skew_e4/1e4 x the average). Integer arithmetic end to
    end; gini_num >= 0 by construction so floor == trunc.

    ``n_shards_expected``: a groupBy only sees shards that RECEIVED
    rows, so a completely starved shard — the worst imbalance the
    audit exists to flag — would otherwise vanish from the
    statistics. Pass the layout's shard count (integer shard ids
    0..S-1) and empty shards enter as weight-0 rows, dragging min_w
    to 0 and gini/skew up where they belong. A shard id outside
    [0, S) (or NULL) fails LOUDLY: the old LEFT join from the 0..S-1
    universe silently dropped such rows, understating exactly the
    imbalance the audit exists to flag (ADVICE r12).

    Plan: one map-side-combinable per-shard aggregate (|shards| rows
    out of the scan), one |shards|-row window, one fold to a single
    row — nothing data-sized after the first aggregate.
    """
    from pyspark.sql import Window

    per = df.groupBy(F.col(shard_col).alias("__s")).agg(
        F.sum(F.col(weight_col).cast("long")).alias("__w")
    )
    if n_shards_expected is not None:
        s = int(n_shards_expected)
        # fail-loud range check BEFORE the universe join: a NULL or
        # out-of-[0,S) shard id would otherwise be dropped by the LEFT
        # join and vanish from the very statistics meant to flag it
        per = per.withColumn(
            "__s",
            F.expr(
                f"CASE WHEN __s >= 0 AND __s < {s} THEN __s "
                f"ELSE raise_error(concat('shard_balance_audit: shard "
                f"id ', coalesce(cast(__s as string), 'NULL'), "
                f"' outside [0, {s})')) END"
            ),
        )
        universe = df.sparkSession.range(int(n_shards_expected)).select(
            F.col("id").cast(per.schema["__s"].dataType).alias("__s")
        )
        per = universe.join(per, "__s", "left").select(
            "__s", F.coalesce(F.col("__w"), F.lit(0)).alias("__w")
        )
    w = Window.orderBy(F.col("__w").asc(), F.col("__s").asc())
    ranked = per.select(
        "__w", F.row_number().over(w).alias("__i")
    )
    # gini_num = sum_i (2i - n - 1) w_i  ==  2*sum(i*w) - (n+1)*sum(w):
    # the n-dependence folds out of the per-row term, so one aggregate
    # suffices (no window-inside-aggregate)
    return (
        ranked.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shards"),
            F.sum("__w").cast("bigint").alias("total_w"),
            F.min("__w").cast("bigint").alias("min_w"),
            F.max("__w").cast("bigint").alias("max_w"),
            F.sum(F.col("__i").cast("long") * F.col("__w"))
            .cast("bigint")
            .alias("__s_iw"),
        )
        .withColumn(
            "gini_num",
            (
                2 * F.col("__s_iw")
                - (F.col("n_shards") + 1) * F.col("total_w")
            ).cast("bigint"),
        )
        .withColumn(
            "gini_den", (F.col("n_shards") * F.col("total_w")).cast("bigint")
        )
        .withColumn(
            "gini_e4",
            F.expr(
                "CASE WHEN gini_den = 0 THEN NULL "
                "ELSE (gini_num * 10000) div gini_den END"
            ).cast("bigint"),
        )
        .withColumn(
            "skew_e4",
            F.expr(
                "CASE WHEN total_w = 0 THEN NULL "
                "ELSE (max_w * n_shards * 10000) div total_w END"
            ).cast("bigint"),
        )
        .select(
            "n_shards",
            "total_w",
            "min_w",
            "max_w",
            "gini_num",
            "gini_den",
            "gini_e4",
            "skew_e4",
        )
    )


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


def bloom_probe_positions(
    value: str, n_bits_log2: int = 12, n_hashes: int = 3,
    salt: str = "bf",
) -> list[tuple[int, int]]:
    """(word, bit) requirements of an equality probe against the
    md5-derived per-file bloom words of :func:`bloom_skip_audit` —
    computed driver-side (probe values are query CONSTANTS, so their
    positions inline as literals in both the Spark plan and the
    DuckDB twin; hashlib.md5 == both engines' md5 by definition).
    Words are 62 bits wide: DuckDB raises on ``1 << 63`` where Spark
    wraps, so the shared word layout stays inside both envelopes."""
    import hashlib

    nb = 1 << n_bits_log2
    out = []
    for i in range(n_hashes):
        h = int(
            hashlib.md5(f"{salt}{i}:{value}".encode()).hexdigest()[:8], 16
        ) % nb
        out.append((h // 62, 1 << (h % 62)))
    return out


def bloom_skip_audit(
    df: DataFrame,
    file_col: str,
    key_col: str,
    probes: list[str],
    n_bits_log2: int = 12,
    n_hashes: int = 3,
    salt: str = "bf",
) -> DataFrame:
    """Per-file BLOOM-filter file-skipping audit — the EQUALITY-
    predicate complement of :func:`zonemap_prune_audit`: min/max zone
    maps prune range predicates but are useless for ``key = v`` on a
    high-cardinality column scattered through the key range; parquet
    column bloom filters (and Delta/Iceberg equivalents) exist for
    exactly that, and whether they WORK is again a property of the
    layout — a key-clustered layout concentrates each key in few
    files (bloom prunes the rest), a row-hash layout smears every key
    everywhere (bloom admits all files). This audit measures it: per
    equality probe,

    ``(probe, n_files, files_scanned, files_matching, rows_matching)``

    where a file is *scanned* iff ALL ``n_hashes`` of the probe's bit
    positions are set in that file's bloom words (no false negatives
    — ``files_matching <= files_scanned`` always, the lossless law in
    the hashed surface; false positives are the deterministic md5
    sliver both engines reproduce bit-for-bit).

    Plan: one position-explode (n_hashes rows per input row) into a
    (file, word)-keyed bit_or — map-side-combinable, |files| × words
    rows out; one per-file match aggregate; one |files|-row fold per
    probe. Nothing data-sized past the first aggregates.
    """
    if not probes:
        raise ValueError("probes must be non-empty")
    nb = 1 << n_bits_log2

    def pos(i: int):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"{salt}{i}:"),
                            F.col(key_col).cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % nb
        )

    fw = (
        df.select(
            F.col(file_col).alias("__f"),
            F.explode(
                F.array(*[pos(i) for i in range(n_hashes)])
            ).alias("__pos"),
        )
        .select(
            "__f",
            F.expr("__pos div 62").alias("__w"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("__pos") % 62).cast("int"),
            ).alias("__bit"),
        )
        .groupBy("__f", "__w")
        .agg(F.bit_or("__bit").alias("__word"))
    )
    flag_cols = []
    for p in probes:
        req = bloom_probe_positions(p, n_bits_log2, n_hashes, salt)
        hit = None
        for w, bit in req:
            h = (
                F.coalesce(
                    F.max(F.when(F.col("__w") == w, F.col("__word"))),
                    F.lit(0).cast("long"),
                ).bitwiseAND(F.lit(bit).cast("long"))
                != 0
            )
            hit = h if hit is None else (hit & h)
        flag_cols.append(hit.alias(f"__scan_{probes.index(p)}"))
    flags = fw.groupBy("__f").agg(*flag_cols)
    matches = df.groupBy(F.col(file_col).alias("__f")).agg(
        *[
            F.sum(
                F.when(F.col(key_col).cast("string") == p, 1).otherwise(0)
            ).cast("bigint").alias(f"__m_{j}")
            for j, p in enumerate(probes)
        ]
    )
    joined = flags.join(matches, "__f")
    out = None
    for j, p in enumerate(probes):
        row = joined.agg(
            F.lit(p).alias("probe"),
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum(F.when(F.col(f"__scan_{j}"), 1).otherwise(0))
            .cast("bigint")
            .alias("files_scanned"),
            F.sum(F.when(F.col(f"__m_{j}") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("files_matching"),
            F.sum(F.col(f"__m_{j}")).cast("bigint").alias("rows_matching"),
        )
        out = row if out is None else out.unionByName(row)
    return out
