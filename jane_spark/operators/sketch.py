"""Bounded-memory frequent-items (heavy hitters) sketch
(SURVEY.md §2 K north-star, round 6).

Corpus-wide top-k n-gram statistics via an exact groupBy are fine until
the n-gram vocabulary outgrows the shuffle (5-grams over 100 TB reach
trillions of keys). The classic answer is a *mergeable* Misra–Gries /
Space-Saving summary (Agarwal et al. 2012, "Mergeable Summaries"):

- each partition keeps at most ``capacity`` counters; overflow
  subtracts the (capacity+1)-th largest count from every counter and
  drops the non-positive ones, accumulating the subtraction into a
  per-partition error bound;
- summaries merge by summing per-item counts (a tiny shuffle of
  ``partitions x capacity`` rows), and error bounds sum likewise.

Guarantees: every reported count is a LOWER bound; the true count
exceeds it by at most ``err_bound`` (the summed subtractions), and any
item with true frequency > N/capacity is guaranteed present. With
``capacity`` >= the number of distinct items per partition nothing is
ever subtracted — ``err_bound`` is 0 and the result is exact, which is
what the DuckDB-oracle contract pins.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _mg_prune(cnt: Counter, capacity: int) -> int:
    """Misra–Gries overflow step: subtract the (capacity+1)-th largest
    count from everything, drop non-positives. Returns the subtracted
    amount (0 if within capacity)."""
    if len(cnt) <= capacity:
        return 0
    counts = sorted(cnt.values(), reverse=True)
    cut = counts[capacity]  # (capacity+1)-th largest
    for item in [i for i, c in cnt.items() if c <= cut]:
        del cnt[item]
    for item in cnt:
        cnt[item] -= cut
    return cut


def frequent_items(
    df: DataFrame,
    item_col: str,
    k: int,
    capacity: int = 4096,
) -> DataFrame:
    """Top-k most frequent values of ``item_col`` with bounded executor
    memory: ``(item, est_count, err_bound)`` ordered by
    (est_count desc, item asc).

    ``est_count`` is the Misra–Gries lower bound; ``err_bound`` is the
    summed per-partition subtractions (identical on every row — a
    corpus-level certificate: true_count <= est_count + err_bound, and
    err_bound == 0 certifies the result exact).

    Distributed shape: one ``mapInPandas`` pass builds a
    <= capacity-row summary per partition (memory bound is the
    capacity, NOT the vocabulary); the merge shuffles only
    ``partitions x capacity`` summary rows; top-k plans as
    TakeOrderedAndProject. The full-vocabulary groupBy this replaces
    shuffles every distinct item.
    """
    if k < 1 or capacity < 1:
        raise ValueError("k and capacity must be >= 1")

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cnt: Counter = Counter()
        err = 0
        for pdf in batches:
            cnt.update(pdf["__item"].dropna())
            err += _mg_prune(cnt, capacity)
        if not cnt and err == 0:
            return
        yield pd.DataFrame(
            {
                "__item": list(cnt.keys()),
                "__cnt": list(cnt.values()),
                # partition error rides on ONE row (summing it from
                # every row would multiply it by the summary size)
                "__err": [err] + [0] * (len(cnt) - 1),
            }
        )

    items = df.select(F.col(item_col).cast("string").alias("__item"))
    summaries = items.mapInPandas(
        summarize, schema="__item string, __cnt long, __err long"
    )
    merged = summaries.groupBy("__item").agg(F.sum("__cnt").alias("est_count"))
    total_err = summaries.agg(F.sum("__err").alias("err_bound"))
    return (
        merged.crossJoin(F.broadcast(total_err))
        .select(
            F.col("__item").alias("item"),
            "est_count",
            F.coalesce(F.col("err_bound"), F.lit(0)).alias("err_bound"),
        )
        .orderBy(F.col("est_count").desc(), F.col("item").asc())
        .limit(k)
    )


def frequent_ngrams(
    df: DataFrame,
    text_col: str,
    n: int,
    k: int,
    capacity: int = 4096,
) -> DataFrame:
    """Top-k word n-grams across the corpus through the bounded-memory
    sketch: shingle row-locally (functions.text.shingles — empty for
    short docs), explode, then ``frequent_items``."""
    from jane_spark.functions.text import shingles, tokens

    col: Column = (
        tokens(F.col(text_col)) if n == 1 else shingles(F.col(text_col), n)
    )
    exploded = df.select(F.explode(col).alias("gram"))
    return frequent_items(exploded, "gram", k=k, capacity=capacity)


# ---------------------------------------------------------------------
# Mergeable cardinality + frequency sketches (round 9). All three are
# built from PORTABLE md5-derived hashes (operators.dedup.portable_hash32)
# and pure integer arithmetic, so — unlike approx_count_distinct's
# engine-private HLL++ — every cell of the sketch is reproducible in any
# engine and the contracts are ORACLE-backed (q_d3_kmv, q_d3_hll,
# q_k17_cms), closing the evidence gap the rows-only q_d3_approx row
# documents. Production pipelines can swap portable_hash32 for xxhash64
# (same shapes, ~2-3x cheaper hash) once certified.


def kmv_sketch(df: DataFrame, col: str, k: int = 64, salt: str = "kmv") -> DataFrame:
    """K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002):
    the ``k`` smallest distinct 32-bit hash values of ``col``, one
    ``h`` column, <= k rows.

    Mergeable: union two sketches, re-take the k smallest — identical
    to sketching the unioned input (pytest-pinned). Distributed shape:
    hash projection -> hash-distinct (one shuffle, map-side combined)
    -> global k-smallest via TakeOrderedAndProject (no full sort); the
    driver ever holds only k longs.
    """
    from jane_spark.operators.dedup import portable_hash32

    if k < 1:
        raise ValueError("k must be >= 1")
    h = portable_hash32(
        F.concat(F.lit(f"{salt}:"), F.col(col).cast("string"))
    )
    return (
        df.where(F.col(col).isNotNull())
        .select(h.alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_estimate(sketch: DataFrame, k: int) -> DataFrame:
    """Distinct-count estimate from a ``kmv_sketch``: one row
    ``(k_used, kth_hash, est_distinct)``, all BIGINT.

    If fewer than ``k`` distinct hashes exist the sketch IS the exact
    distinct set (est = k_used); otherwise the classic unbiased
    estimator (k-1) * 2^32 / h_(k) — kept in INTEGER division (`div`)
    so the oracle can reproduce it bit-for-bit (`//` in DuckDB).
    """
    return (
        sketch.agg(
            F.count("h").alias("k_used"),
            F.max("h").alias("kth_hash"),
        )
        .select(
            "k_used",
            "kth_hash",
            F.when(F.col("k_used") < k, F.col("k_used"))
            .otherwise(
                F.expr(
                    f"CAST(({k} - 1) * 4294967296 AS BIGINT) "
                    "div greatest(kth_hash, CAST(1 AS BIGINT))"
                )
            )
            .alias("est_distinct"),
        )
    )


def kmv_set_ops(a: DataFrame, b: DataFrame, k: int) -> DataFrame:
    """Theta-sketch-style set algebra over two ``kmv_sketch`` outputs
    built with the SAME ``k`` and salt (Beyer et al. 2007, "On synopses
    for distinct-value estimation under multiset operations").

    One row, all BIGINT::

        k_used     rows in the union sketch (k smallest of A ∪ B)
        theta      its largest hash h_(k) — the sampling threshold
        union_est  (k-1) * 2^32 div theta  (exact k_used when < k)
        rho        union-sketch hashes present in BOTH input sketches
        jaccard_e4 (rho * 10000) div k_used  — fixed-point 1e-4
        inter_est  (rho * union_est) div k_used

    The union sketch of two KMV sketches IS the KMV sketch of the
    unioned input (merge law, pytest-pinned on ``kmv_sketch``), so the
    estimates compose across shards: 1000 executors each ship <= k
    longs per set, and ANY pair of sets — shards, days, corpora —
    yields overlap/Jaccard without re-touching raw data. When the true
    union has < k distinct keys every value is exact (union_est =
    k_used, inter_est = rho). All integer division, so an engine
    replaying the same md5-derived hashes reproduces every cell
    bit-for-bit.

    Plan shape: the inputs are <= k rows each, so everything below is
    broadcast-joined driver-light work; the heavy lifting (hash +
    distinct + TakeOrdered) already happened inside ``kmv_sketch``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    u = a.unionByName(b).distinct().orderBy("h").limit(k)
    both = a.join(F.broadcast(b), "h").select("h")
    rho = u.join(F.broadcast(both), "h").agg(
        F.count("h").cast("long").alias("rho")
    )
    agg = u.agg(
        F.count("h").alias("k_used"),
        F.max("h").alias("theta"),
    )
    return (
        agg.crossJoin(F.broadcast(rho))
        .select(
            "k_used",
            "theta",
            F.when(F.col("k_used") < k, F.col("k_used"))
            .otherwise(
                F.expr(
                    f"CAST(({k} - 1) * 4294967296 AS BIGINT) "
                    "div greatest(theta, CAST(1 AS BIGINT))"
                )
            )
            .alias("union_est"),
            "rho",
        )
        .select(
            "k_used",
            "theta",
            "union_est",
            "rho",
            # greatest(...,1) guard: two empty input sketches give
            # k_used=0 (rho is 0 there too, so the guarded result is a
            # clean 0 instead of NULL / ANSI divide-by-zero)
            F.expr("(rho * 10000) div greatest(k_used, 1)")
            .alias("jaccard_e4"),
            F.expr("(rho * union_est) div greatest(k_used, 1)")
            .alias("inter_est"),
        )
    )


def hll_registers(
    df: DataFrame,
    col: str,
    p: int = 6,
    salt: str = "hll",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Portable HyperLogLog register table (Flajolet et al. 2007):
    ``m = 2^p`` rows ``(bucket, rho)`` per group, all BIGINT — bucket =
    top p bits of the 32-bit portable hash, rho = leading-zero count of
    the remaining ``32-p`` bits + 1 (0 for never-touched buckets).
    With ``group_cols`` this IS "approx count distinct ... GROUP BY"
    as a first-class relational artifact: the full (group x m) grid is
    emitted (absent buckets as rho 0) so two runs' registers align
    row-for-row for merging.

    Integer-only: the bit-length of the remainder comes from the length
    of its base-2 string (Spark ``conv(w,10,2)`` / DuckDB
    ``to_base(w,2)``) — no float log2 whose floor could disagree at
    exact powers of two. Mergeable by elementwise ``max(rho)``
    (pytest-pinned). Distributed shape: projection -> (group x m)-key
    groupBy (map-side combined; state = m counters per group per
    task) -> group-count x m output rows; the estimate
    (``hll_estimate``) reads just those.
    """
    from jane_spark.operators.dedup import portable_hash32

    if not 2 <= p <= 16:
        raise ValueError("p must be in [2, 16]")
    groups = list(group_cols or [])
    m = 1 << p
    rem_bits = 32 - p
    rem_mod = 1 << rem_bits
    h = portable_hash32(
        F.concat(F.lit(f"{salt}:"), F.col(col).cast("string"))
    )
    hashed = df.where(F.col(col).isNotNull()).select(*groups, h.alias("h"))
    bucketed = hashed.select(
        *groups,
        F.expr(f"h div CAST({rem_mod} AS BIGINT)").alias("bucket"),
        F.pmod(F.col("h"), F.lit(rem_mod)).alias("w"),
    )
    rho = (
        F.when(F.col("w") == 0, F.lit(rem_bits + 1))
        .otherwise(
            F.lit(rem_bits + 1)
            - F.length(F.conv(F.col("w").cast("string"), 10, 2))
        )
        .cast("bigint")
    )
    regs = (
        bucketed.select(*groups, "bucket", rho.alias("rho"))
        .groupBy(*groups, "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    buckets = (
        df.sparkSession.range(m)
        .select(F.col("id").cast("bigint").alias("bucket"))
    )
    if groups:
        # null-safe equality on the group keys: a group whose key is
        # NULL exists in the grid and must still match its computed
        # registers (a plain equi-join would silently zero it out)
        grid = df.select(*groups).distinct().crossJoin(buckets)
        regs_r = regs.select(
            *[F.col(g).alias(f"_r_{g}") for g in groups],
            F.col("bucket").alias("_r_bucket"),
            "rho",
        )
        cond = grid["bucket"] == regs_r["_r_bucket"]
        for g in groups:
            cond = cond & grid[g].eqNullSafe(regs_r[f"_r_{g}"])
        joined = grid.join(regs_r, cond, "left")
    else:
        grid = buckets
        joined = grid.join(regs, ["bucket"], "left")
    return joined.select(
        *[grid[g] for g in groups],
        grid["bucket"],
        F.coalesce(F.col("rho"), F.lit(0).cast("bigint")).alias("rho"),
    )


def hll_estimate(registers: DataFrame, p: int) -> float:
    """Cardinality estimate from an ``hll_registers`` table (driver-side
    float — the register TABLE is the oracle-checked artifact; this is
    the bounded m-row readout). Applies the standard small-range
    linear-counting correction."""
    import math

    m = 1 << p
    rows = registers.collect()  # exactly m rows — bounded by construction
    if len(rows) != m:
        raise ValueError(f"expected {m} registers, got {len(rows)}")
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1 + 1.079 / m))
    inv_sum = sum(2.0 ** -r.rho for r in rows)
    est = alpha * m * m / inv_sum
    zeros = sum(1 for r in rows if r.rho == 0)
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return est


def cms_build(
    df: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 256,
    weight_col: str | None = None,
    salt: str = "cms",
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over the values
    of ``key_col``: nonzero cells ``(r, b, cnt)``, all BIGINT — row r's
    bucket is ``portable_hash32('{salt}:{r}:' || key) % w``.

    Point estimates (``cms_query``) are min over the d cells and NEVER
    undercount; overcount is bounded by e*N/w with prob 1-e^-d.
    Mergeable by cellwise sum. Distributed shape: the corpus is touched
    once (d in-row bucket computations, then explode), the groupBy
    state is bounded by d*w cells per task regardless of vocabulary —
    the whole point vs an exact groupBy whose key space is unbounded at
    100 TB — and the finished sketch (<= d*w rows) broadcasts.
    """
    from jane_spark.operators.dedup import portable_hash32

    if d < 1 or w < 2:
        raise ValueError("d must be >= 1 and w >= 2")
    key = F.col(key_col).cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(r).cast("bigint").alias("r"),
                F.pmod(
                    portable_hash32(F.concat(F.lit(f"{salt}:{r}:"), key)),
                    F.lit(w),
                ).alias("b"),
            )
            for r in range(d)
        ]
    )
    wt = F.lit(1).cast("bigint") if weight_col is None else F.col(weight_col).cast("bigint")
    return (
        df.where(F.col(key_col).isNotNull())
        .select(F.explode(cells).alias("c"), wt.alias("wt"))
        .groupBy(F.col("c.r").alias("r"), F.col("c.b").alias("b"))
        .agg(F.sum("wt").alias("cnt"))
    )


def cms_query(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Frequency estimate per key: ``keys`` plus an ``est_count`` BIGINT
    column (min over the d probed cells; 0 for never-seen keys). The
    sketch side is broadcast (<= d*w rows) — probing is shuffle-free."""
    from jane_spark.operators.dedup import portable_hash32

    key = F.col(key_col).cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(r).cast("bigint").alias("r"),
                F.pmod(
                    portable_hash32(F.concat(F.lit(f"{salt}:{r}:"), key)),
                    F.lit(w),
                ).alias("b"),
            )
            for r in range(d)
        ]
    )
    probes = keys.select(*keys.columns, F.explode(cells).alias("c")).select(
        *keys.columns, F.col("c.r").alias("r"), F.col("c.b").alias("b")
    )
    joined = probes.join(F.broadcast(cms), ["r", "b"], "left")
    return joined.groupBy(*keys.columns).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("bigint"))).alias(
            "est_count"
        )
    )


def kmv_overlap_matrix(
    items: DataFrame,
    group_col: str,
    item_col: str,
    k: int = 32,
    salt: str = "kmv",
) -> DataFrame:
    """Pairwise corpus-overlap matrix from per-group KMV sketches —
    'which sources copy from each other' in ONE bounded pass: for
    every unordered group pair, the theta-sketch Jaccard estimate over
    the groups' bottom-k hash sets (kmv_set_ops generalized from one
    pair to the full matrix, without a driver loop over pairs).

    Relational shape: one grouped bottom-k rank window builds ALL the
    sketches (|groups| × k rows — dimension-sized); the pair table is
    |groups|² / 2 rows of group ids; each side attaches by one
    equi-join (never an OR-join / nested loop); the union-sketch
    re-rank and rho count share one (pair, h) groupBy + rank window.
    Every value BIGINT, identical arithmetic to kmv_set_ops. Emits
    ``(g_a, g_b, k_used, theta, rho, jaccard_e4)`` per pair a < b.
    """
    from jane_spark.operators.dedup import portable_hash32

    if k < 1:
        raise ValueError("k must be >= 1")
    h = portable_hash32(
        F.concat(F.lit(f"{salt}:"), F.col(item_col).cast("string"))
    )
    base = (
        items.where(F.col(item_col).isNotNull())
        .select(F.col(group_col).alias("g"), h.alias("h"))
        .distinct()
    )
    wk = Window.partitionBy("g").orderBy(F.col("h").asc())
    sk = (
        base.withColumn("__rk", F.row_number().over(wk))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )
    groups = sk.select("g").distinct()
    pairs = (
        groups.select(F.col("g").alias("g_a"))
        .join(groups.select(F.col("g").alias("g_b")))
        .where(F.col("g_a") < F.col("g_b"))
    )
    ua = pairs.join(sk.withColumnRenamed("g", "g_a"), "g_a").select(
        "g_a", "g_b", "h",
        F.lit(1).alias("ia"), F.lit(0).alias("ib"),
    )
    ub = pairs.join(sk.withColumnRenamed("g", "g_b"), "g_b").select(
        "g_a", "g_b", "h",
        F.lit(0).alias("ia"), F.lit(1).alias("ib"),
    )
    merged = (
        ua.unionByName(ub)
        .groupBy("g_a", "g_b", "h")
        .agg(F.max("ia").alias("ia"), F.max("ib").alias("ib"))
    )
    wp = Window.partitionBy("g_a", "g_b").orderBy(F.col("h").asc())
    kept = merged.withColumn("__rk", F.row_number().over(wp)).where(
        F.col("__rk") <= k
    )
    return kept.groupBy("g_a", "g_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("k_used"),
        F.max("h").cast("bigint").alias("theta"),
        F.sum(F.col("ia") * F.col("ib")).cast("bigint").alias("rho"),
        F.expr(
            "CAST((sum(ia * ib) * 10000) div greatest(count(1), 1)"
            " AS BIGINT)"
        ).alias("jaccard_e4"),
    )


def hll_cumulative_timeline(
    df: DataFrame,
    ts_col: str,
    col: str,
    p: int = 6,
    salt: str = "hll",
) -> DataFrame:
    """Cumulative distinct-cardinality TIMELINE from mergeable HLL
    registers — the "unique users to date, per day" dashboard series
    that exact distinct cannot produce incrementally: day d's sketch
    is the elementwise max of days 1..d's register tables (the HLL
    merge law), so yesterday's line never re-scans history and a
    backfill is one register-table union.

    Emits one row per day with the INTEGER sketch readout:
    ``(day, m, zeros, inv_scaled)`` where ``inv_scaled =
    sum(2^(32 - rho))`` over the cumulative registers — i.e.
    ``2^32 * sum(2^-rho)``, the harmonic denominator of the HLL
    estimate as an exact BIGINT (the float alpha*m^2/inv_sum readout
    and the linear-counting correction are a driver-side formula over
    these three integers — `hll_estimate` shape). No float in the
    hashed surface.

    Scale shape: one (day x m)-key groupBy (map-side combined, state
    = m counters per day per task), one window over the DAYS axis per
    bucket (rows = |days| x m, never data-scale), one per-day
    m-row aggregate.
    """
    days = df.select(
        F.col(ts_col).cast("date").alias("day"), F.col(col).alias("__k")
    )
    regs = hll_registers(days, "__k", p=p, salt=salt, group_cols=["day"])
    w = (
        Window.partitionBy("bucket")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = regs.withColumn("crho", F.max("rho").over(w))
    return cum.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum(F.when(F.col("crho") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("zeros"),
        F.sum(
            F.expr("shiftleft(cast(1 as bigint), 32 - cast(crho as int))")
        )
        .cast("bigint")
        .alias("inv_scaled"),
    ).select(
        F.col("day").cast("timestamp_ntz").alias("day"),
        "m",
        "zeros",
        "inv_scaled",
    )
