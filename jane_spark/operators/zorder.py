"""Z-order (Morton-curve) layout keys — multi-dimensional data
clustering for scan pruning (round 10).

The lakehouse staple (Delta/Iceberg `ZORDER BY`): interleave the bits
of several normalized columns so rows close in EVERY dimension land
close on the curve; files/buckets written in z-key ranges then serve
range predicates on ANY of the dimensions with bounded file overlap —
the multi-column generalization of sorting by one column, which prunes
perfectly on that column and not at all on the others.

Everything here is integer-exact: values min-max-normalize to a fixed
bit width with integer arithmetic, the interleave is a fixed fold of
shift/mask terms (whole-stage codegen), so an independent engine
replays keys bit-for-bit. The min/max normalization bounds come from
one tiny aggregate broadcast back into the projection — at 100 TB
that's a two-pass scan (bounds, then keys), the same shape every
stats-based layout job has; bounds can also be supplied from catalog
statistics to make it one pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(cols: list[Column], bits: int = 16) -> Column:
    """Morton interleave of ``len(cols)`` already-normalized integer
    columns (each in [0, 2^bits)): bit b of column i lands at output
    bit ``b * n + i``. Fixed expression fold — n*bits shift/mask terms,
    all codegen; n * bits must fit a BIGINT (<= 63)."""
    n = len(cols)
    if n < 2:
        raise ValueError("need >= 2 columns to interleave")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds BIGINT")
    out = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        x = c.cast("long")
        for b in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(
                    F.shiftrightunsigned(x, b).bitwiseAND(F.lit(1)),
                    b * n + i,
                )
            )
    return out


def zorder_keys(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
) -> DataFrame:
    """Append ``zkey``: the Morton key over ``cols`` after integer
    min-max normalization of each column to [0, 2^bits). Normalization
    is ``((v - min) * (2^bits - 1)) div max(max - min, 1)`` — pure
    BIGINT, so keys are engine-portable. Constant columns normalize to
    0 (div guard). Two jobs: one bounds aggregate (a handful of longs,
    broadcast as literals via collect — the IVF-centroid bounded-
    collect contract), one projection."""
    top = (1 << bits) - 1
    bounds = df.agg(
        *[F.min(F.col(c).cast("long")).alias(f"mn_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("long")).alias(f"mx_{i}") for i, c in enumerate(cols)],
    ).first()
    if any(bounds[f"mn_{i}"] is None for i in range(len(cols))):
        raise ValueError(
            "empty input: no min/max bounds to normalize against "
            "(zorder_keys needs at least one non-null row per column)"
        )
    norm = []
    for i, c in enumerate(cols):
        mn = int(bounds[f"mn_{i}"])
        rng = max(int(bounds[f"mx_{i}"]) - mn, 1)
        # (v - mn) * top is evaluated in BIGINT: a column range wider
        # than ~2^47 with the default bits=16 would silently wrap
        if rng > (1 << 62) // max(top, 1):
            raise ValueError(
                f"column {c!r} range {rng} x {top} overflows BIGINT; "
                f"lower bits or pre-scale the column"
            )
        norm.append(
            F.expr(
                f"(({'`' + c + '`'} - CAST({mn} AS BIGINT)) * {top}) "
                f"div CAST({rng} AS BIGINT)"
            )
        )
    return df.withColumn("zkey", interleave_bits(norm, bits))


def zorder_buckets(
    df: DataFrame,
    cols: list[str],
    n_buckets: int,
    bits: int = 16,
) -> DataFrame:
    """Bucket assignment for a z-ordered layout: equal-width slices of
    the key space (``zbucket = zkey div (keyspace / n_buckets)``).
    Write with ``.repartition('zbucket').write.partitionBy('zbucket')``
    and range predicates on ANY participating column prune buckets via
    partition filters (plan-guard pytest). Equal-width (not
    equi-depth) keeps the bucket function data-independent so
    incremental ingest lands in stable buckets; combine with P17's
    equi-depth splits when balance matters more than stability."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    n = len(cols)
    width = max((1 << (n * bits)) // n_buckets, 1)
    return zorder_keys(df, cols, bits).withColumn(
        "zbucket", F.expr(f"zkey div CAST({width} AS BIGINT)")
    )


def _minmax_norm(df: DataFrame, cols: list[str], bits: int):
    """Shared integer min-max normalization (the zorder_keys contract):
    one bounds aggregate collected as literals, each column mapped to
    [0, 2^bits) with pure-BIGINT arithmetic."""
    top = (1 << bits) - 1
    bounds = df.agg(
        *[F.min(F.col(c).cast("long")).alias(f"mn_{i}")
          for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("long")).alias(f"mx_{i}")
          for i, c in enumerate(cols)],
    ).first()
    if any(bounds[f"mn_{i}"] is None for i in range(len(cols))):
        raise ValueError(
            "empty input: no min/max bounds to normalize against"
        )
    norm = []
    for i, c in enumerate(cols):
        mn = int(bounds[f"mn_{i}"])
        rng = max(int(bounds[f"mx_{i}"]) - mn, 1)
        if rng > (1 << 62) // max(top, 1):
            raise ValueError(
                f"column {c!r} range {rng} x {top} overflows BIGINT; "
                f"lower bits or pre-scale the column"
            )
        norm.append(
            F.expr(
                f"((`{c}` - CAST({mn} AS BIGINT)) * {top}) "
                f"div CAST({rng} AS BIGINT)"
            )
        )
    return norm


def hilbert_keys(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
) -> DataFrame:
    """Append ``hkey``: the 2-D HILBERT-curve index over two integer
    min-max-normalized columns — the locality upgrade over
    :func:`zorder_keys`: the Hilbert curve never jumps (consecutive
    indices are always grid neighbors, unlike Morton's quadrant
    seams), so range boxes touch fewer, more contiguous key ranges —
    the measured difference between scanning 3% and 5% of files at
    100 TB (Faloutsos & Roseman PODS 1989; Moon et al. TKDE 2001 —
    the clustering analysis every Hilbert-layout lakehouse feature
    cites).

    The classic per-level fold (reflect+rotate state machine, the
    public xy2d algorithm) unrolls into ``bits`` chained PROJECTIONS
    — each level's (x, y, d) columns derive from the previous
    level's, so the expression tree stays LINEAR in bits (inlining
    the recurrence into one expression would double per level:
    2^bits terms). Everything is BIGINT shift/mask/CASE — codegen,
    engine-portable, and the DuckDB twin replays the same 16 CTEs.

    Scale shape: identical to zorder_keys — one bounds aggregate,
    then a pure projection chain; no shuffle, no Python.
    """
    if len(cols) != 2:
        raise ValueError("hilbert_keys is the 2-D curve: pass 2 cols")
    # the level fold re-selects every input column alongside the
    # working columns, so a frame that ALREADY carries one of these
    # names (e.g. re-keying hilbert_keys output) would hit a runtime
    # ambiguous-column AnalysisException mid-plan — reject up front
    # (ADVICE r13; the other layout operators' guard style)
    clash = [c for c in df.columns if c in ("__hx", "__hy", "__hd", "hkey")]
    if clash:
        raise ValueError(
            f"hilbert_keys: input already carries reserved column(s) "
            f"{clash}; drop or rename them first"
        )
    norm = _minmax_norm(df, cols, bits)
    n_full = 1 << bits
    out = df.withColumn("__hx", norm[0].cast("long")).withColumn(
        "__hy", norm[1].cast("long")
    ).withColumn("__hd", F.lit(0).cast("long"))
    base = [c for c in df.columns]
    for lev in range(bits - 1, -1, -1):
        rx = F.shiftrightunsigned(F.col("__hx"), lev).bitwiseAND(F.lit(1))
        ry = F.shiftrightunsigned(F.col("__hy"), lev).bitwiseAND(F.lit(1))
        quad = (rx * 3).bitwiseXOR(ry).cast("long")
        d_new = F.col("__hd") + F.lit(1 << (2 * lev)).cast("long") * quad
        x_new = (
            F.when(
                ry == 0,
                F.when(
                    rx == 1, F.lit(n_full - 1) - F.col("__hy")
                ).otherwise(F.col("__hy")),
            )
            .otherwise(F.col("__hx"))
        )
        y_new = (
            F.when(
                ry == 0,
                F.when(
                    rx == 1, F.lit(n_full - 1) - F.col("__hx")
                ).otherwise(F.col("__hx")),
            )
            .otherwise(F.col("__hy"))
        )
        # materialize each level as its own projection: the recurrence
        # references __hx AND __hy on both outputs, so textual inlining
        # would double the tree per level
        out = out.select(
            *base,
            x_new.alias("__hx"),
            y_new.alias("__hy"),
            d_new.alias("__hd"),
        )
    return out.select(*base, F.col("__hd").alias("hkey"))


def hilbert_buckets(
    df: DataFrame,
    cols: list[str],
    n_buckets: int,
    bits: int = 16,
) -> DataFrame:
    """Equal-width bucket slices of the Hilbert key space — the
    drop-in locality upgrade of :func:`zorder_buckets` (same write
    recipe, same stable data-independent bucket function)."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    width = max((1 << (2 * bits)) // n_buckets, 1)
    return hilbert_keys(df, cols, bits).withColumn(
        "hbucket", F.expr(f"hkey div CAST({width} AS BIGINT)")
    )
