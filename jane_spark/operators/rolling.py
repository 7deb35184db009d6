"""Time-range rolling aggregates (SURVEY.md §2 E5 — round 2).

The "coverage seconds in the trailing hour per channel" family: a
window frame bounded by a TIME interval, not a row count. jane's
availability views imply exactly this shape [ref: waveforms coverage
queries, conf=L; SURVEY.md §0 caveat]; it is also the training-pipeline
"events in the trailing window per user" rate feature.

Spark's ``Window.rangeBetween`` needs a numeric ordering column, so the
frame is expressed over ``unix_micros(ts)`` with the interval in µs —
semantically identical to ANSI ``RANGE BETWEEN INTERVAL x PRECEDING AND
CURRENT ROW`` (peers at equal ts are included in both). ONE shuffle on
the partition key; the frame scan is linear per key (Spark keeps a
sliding frame, not O(n²) re-aggregation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from jane_spark.functions.time import ntz_epoch_us

_UNITS_US = {
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
}


def interval_micros(interval: str) -> int:
    """'2 hours' / '30 minutes' / '1 day' -> microseconds."""
    try:
        n, unit = interval.split()
        return int(n) * _UNITS_US[unit.rstrip("s")]
    except (ValueError, KeyError):
        raise ValueError(
            f"interval must be '<n> {'/'.join(_UNITS_US)}[s]', got {interval!r}"
        ) from None


def trailing_window_agg(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    aggs: dict[str, Column],
    interval: str = "1 hour",
) -> DataFrame:
    """Append, per input row, each aggregate evaluated over that row's
    key-partition restricted to ``[ts - interval, ts]`` (inclusive both
    ends — ANSI RANGE frame semantics, equal-ts peers included).

    ``aggs`` maps output column name -> aggregate Column, e.g.
    ``{"n_1h": F.count(F.lit(1)), "sum_1h": F.sum("value")}``.
    """
    us = interval_micros(interval)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ntz_epoch_us(F.col(ts_col)))  # tz-free (functions/time.py)
        .rangeBetween(-us, 0)
    )
    out = df
    for name, agg in aggs.items():
        out = out.withColumn(name, agg.over(w))
    return out


# ---------------------------------------------------------------------
# Hierarchical time rollups (round 9) — the hypertable "continuous
# aggregate" pattern: pre-aggregate raw events once at fine
# granularity, then derive every coarser level FROM THE ROLLUP, never
# re-reading raw rows. Sound because the state (n, sum, min, max) is a
# commutative monoid — re-aggregation is the monoid merge. avg is NOT
# in the state (avg of avgs is wrong); it's derived at read time as
# sum/n. At 100 TB this is the difference between a daily dashboard
# query scanning 24 hourly rows per key and re-scanning a day of raw
# events: the rollup is incrementally maintainable (append a new
# hour's partial, coarser levels recompute from <= 24/7/30 rows).


def time_rollup(
    df: DataFrame,
    ts_col: str,
    bucket: str,
    keys: list[str],
    cents: Column,
) -> DataFrame:
    """Level-1 continuous aggregate of an integer measure at ``bucket``
    granularity ('hour', 'day', ...): (bucket, *keys, n, sum_cents,
    min_cents, max_cents) — all BIGINT, so every later merge is exact
    integer arithmetic (float sums re-aggregated in a different order
    are not reproducible; integer cents are)."""
    c = cents.cast("bigint")
    return (
        df.select(
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
            *[F.col(k) for k in keys],
            c.alias("__c"),
        )
        .groupBy("bucket", *keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__c").alias("sum_cents"),
            F.min("__c").alias("min_cents"),
            F.max("__c").alias("max_cents"),
        )
    )


def merge_rollups(*parts: DataFrame) -> DataFrame:
    """Merge level-1 rollups (time_rollup outputs) by the algebraic
    partial-aggregate law: union the partial tables and re-aggregate —
    ``n = sum(n)``, ``sum = sum(sum)``, ``min = min(min)``,
    ``max = max(max)`` — plus ``n_parts`` (how many partials fed each
    group) so the merge itself stays auditable. This is THE primitive
    distributed aggregation rests on (map-side combine is exactly this
    law applied per partition) and the incremental-view-maintenance
    move at 100 TB: yesterday's materialized rollup + today's delta
    rollup merge in |rollup| work, never re-scanning history. Exact by
    construction because time_rollup's measures are integer cents —
    a float sum re-added in a different order would not be.

    The output is itself MERGEABLE: a level-1 rollup (no ``n_parts``
    column) counts as one partial, a previously-merged rollup carries
    its ``n_parts`` forward, and merging mixes of both re-aggregates
    correctly — so "yesterday's merged rollup + today's level-1
    delta" composes without special-casing (``n_parts`` always counts
    ORIGINAL level-1 partials).

    One union (no shuffle) + one map-side-combinable groupBy over
    |groups| x |parts| rows — never data-scale.
    """
    if not parts:
        raise ValueError("need at least one rollup to merge")
    measure_cols = {"n_parts", "n", "sum_cents", "min_cents", "max_cents"}
    # grouping keys are inferred as "columns that are not measures",
    # so a part carrying any extra derived column (a re-fed avg, a
    # user key literally named 'n') would silently become — or collide
    # with — a group key and the merge would emit wrong-grain rows.
    # Validate the shape instead of guessing (ADVICE r12): every part
    # must be exactly keys + (n, sum_cents, min_cents, max_cents)
    # with n_parts optional, and all parts must agree on the keys.
    required = {"n", "sum_cents", "min_cents", "max_cents"}
    keys0 = [c for c in parts[0].columns if c not in measure_cols]
    for idx, p in enumerate(parts):
        cols = set(p.columns)
        missing = (required | set(keys0)) - cols
        extras = cols - required - {"n_parts"} - set(keys0)
        if missing or extras:
            raise ValueError(
                f"merge_rollups: part {idx} columns {sorted(p.columns)} "
                f"do not match keys {sorted(keys0)} + measures "
                f"{sorted(required)} (+ optional n_parts): "
                f"missing={sorted(missing)} extras={sorted(extras)} — "
                "drop derived columns before merging; a rollup part "
                "must be a raw time_rollup (or prior merge) output"
            )
    normed = [
        p if "n_parts" in p.columns
        else p.withColumn("n_parts", F.lit(1).cast("bigint"))
        for p in parts
    ]
    u = normed[0]
    for p in normed[1:]:
        u = u.unionByName(p)
    keys = [c for c in u.columns if c not in measure_cols]
    return u.groupBy(*[F.col(k) for k in keys]).agg(
        F.sum("n_parts").cast("bigint").alias("n_parts"),
        F.sum("n").cast("bigint").alias("n"),
        F.sum("sum_cents").cast("bigint").alias("sum_cents"),
        F.min("min_cents").cast("bigint").alias("min_cents"),
        F.max("max_cents").cast("bigint").alias("max_cents"),
    )


def m4_downsample(
    df: DataFrame,
    ts_col: str,
    id_col: str,
    keys: list[str],
    cents: Column,
    n_buckets: int,
) -> DataFrame:
    """M4 visualization-oriented downsampling (Jugel et al., VLDB 2014):
    per series key and equal-width time bucket, keep the FOUR extreme
    points a pixel-column line rendering needs — min-value, max-value,
    first (earliest ts), last — plus the row count. With ``n_buckets``
    = display width in pixels the decimated series renders the exact
    same polyline as the raw data; this is the waveform-browser
    decimation path (jane's spectrogram/preview images imply exactly
    this reduction) and the standard dashboard "downsample to the
    viewport" op.

    Determinism: the measure is integer cents; first/last resolve ties
    by (ts, id) via lexicographic MIN/MAX over a packed struct, so the
    output is reproducible and oracle-expressible (row_number twin).
    The bucket index uses the GLOBAL [lo, hi] extent — two broadcast
    longs — and pure integer arithmetic:
    ``least((e - lo) * n div (hi - lo + 1), n - 1)``.

    Plan shape: one tiny extent agg (broadcast back), then ONE shuffle
    on (keys, bucket) with map-side partial min/max/count — output is
    |keys| x n_buckets rows regardless of input size, so a 100 TB
    channel-year decimates to a constant-size frame without a sort.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    e = ntz_epoch_us(F.col(ts_col))
    ext = df.agg(
        F.min(e).cast("long").alias("__lo"),
        F.max(e).cast("long").alias("__hi"),
    )
    base = df.select(
        *[F.col(k) for k in keys],
        e.cast("long").alias("__e"),
        F.col(id_col).cast("long").alias("__id"),
        cents.cast("bigint").alias("__c"),
    )
    bucketed = base.crossJoin(F.broadcast(ext)).withColumn(
        "bucket",
        F.least(
            F.expr(f"((__e - __lo) * {n_buckets}) div (__hi - __lo + 1)"),
            F.lit(n_buckets - 1).cast("long"),
        ),
    )
    # The paper's own join-back formulation, kept hash-aggregable: any
    # min/max or min_by/max_by whose buffer holds a STRUCT degrades the
    # whole groupBy to SortAggregate + per-partition sort, so the edge
    # POINTS are recovered by joining the (tiny, keys x n_buckets)
    # aggregate back against the bucketed rows — a broadcast join — and
    # tie-breaking on the LONG id with a primitive-buffer min_by.
    agg = bucketed.groupBy(*keys, "bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("__c").alias("min_cents"),
        F.max("__c").alias("max_cents"),
        F.min("__e").alias("first_us"),
        F.max("__e").alias("last_us"),
    )
    edges = (
        bucketed.join(
            F.broadcast(agg.select(*keys, "bucket", "first_us", "last_us")),
            [*keys, "bucket"],
        )
        .where(
            (F.col("__e") == F.col("first_us"))
            | (F.col("__e") == F.col("last_us"))
        )
        .groupBy(*keys, "bucket")
        .agg(
            F.expr(
                "min_by(__c, CASE WHEN __e = first_us THEN __id END)"
            ).alias("first_cents"),
            F.expr(
                "max_by(__c, CASE WHEN __e = last_us THEN __id END)"
            ).alias("last_cents"),
        )
    )
    return agg.join(edges, [*keys, "bucket"]).select(
        *keys,
        "bucket",
        "n",
        "min_cents",
        "max_cents",
        "first_us",
        "first_cents",
        "last_us",
        "last_cents",
    )


def lttb_downsample(
    df: DataFrame,
    ts_col: str,
    id_col: str,
    keys: list[str],
    cents: Column,
    n_buckets: int,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013),
    parallel-anchor variant: per series key and equal-width bucket,
    keep the ONE point forming the largest triangle with the AVERAGE
    points of the neighboring (nearest non-empty) buckets. Classic
    LTTB anchors on the previously *selected* point — inherently
    sequential; anchoring both sides on bucket averages is the
    standard parallel approximation (visually indistinguishable, and
    exactly one point per bucket either way). First/last non-empty
    buckets keep the series' first/last point, per the original
    algorithm.

    Where M4 keeps 4 extreme points per bucket (pixel-exact line
    rendering), LTTB keeps 1 perceptually-chosen point — half the
    output for dashboards that want shape, not exactness; ship both,
    like the hypertable ecosystems do.

    Determinism: x = epoch micros minus the global lo (exact in
    doubles), y = integer cents; the triangle area is one fixed-shape
    double expression rounded to 6 dp BEFORE the rank (the pq_adc
    discipline), ties by (ts, id). Oracle-expressible: the area
    replays bit-for-bit, the pick is a row_number.

    Plan shape: one (key, bucket) hash aggregate for the anchor
    table (|keys| x n_buckets rows), lag/lead over that tiny table,
    broadcast back onto the rows, one row_number window per (key,
    bucket) — no global sort, output exactly one row per non-empty
    bucket regardless of input size.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    e = ntz_epoch_us(F.col(ts_col))
    ext = df.agg(
        F.min(e).cast("long").alias("__lo"),
        F.max(e).cast("long").alias("__hi"),
    )
    base = df.select(
        *[F.col(k) for k in keys],
        e.cast("long").alias("__e"),
        F.col(id_col).cast("long").alias("__id"),
        cents.cast("bigint").alias("__c"),
    )
    bucketed = (
        base.crossJoin(F.broadcast(ext))
        .withColumn("__x", F.col("__e") - F.col("__lo"))
        .withColumn(
            "bucket",
            F.least(
                F.expr(f"(__x * {n_buckets}) div (__hi - __lo + 1)"),
                F.lit(n_buckets - 1).cast("long"),
            ),
        )
    )
    agg = bucketed.groupBy(*keys, "bucket").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum("__c").alias("__sy"),
    )
    wk = Window.partitionBy(*keys).orderBy("bucket")
    anchors = agg.select(
        *keys,
        "bucket",
        F.col("__n").alias("n"),
        (F.lag("__sx").over(wk) / F.lag("__n").over(wk)).alias("__ax"),
        (F.lag("__sy").over(wk) / F.lag("__n").over(wk)).alias("__ay"),
        (F.lead("__sx").over(wk) / F.lead("__n").over(wk)).alias("__cx"),
        (F.lead("__sy").over(wk) / F.lead("__n").over(wk)).alias("__cy"),
    )
    joined = bucketed.join(F.broadcast(anchors), [*keys, "bucket"])
    px = F.col("__x").cast("double")
    py = F.col("__c").cast("double")
    area = F.abs(
        (F.col("__ax") - px) * (F.col("__cy") - py)
        - (F.col("__ay") - py) * (F.col("__cx") - px)
    )
    # endpoints (or a missing neighbor anchor) degrade to first/last
    score = (
        F.when(F.col("__ax").isNull(), -px)
        .when(F.col("__cx").isNull(), px)
        .otherwise(F.round(area, 6))
    )
    wr = Window.partitionBy(*keys, "bucket").orderBy(
        F.desc("__score"), F.asc("__e"), F.asc("__id")
    )
    return (
        joined.withColumn("__score", score)
        .withColumn("__rn", F.row_number().over(wr))
        .where(F.col("__rn") == 1)
        .select(
            *keys,
            "bucket",
            "n",
            F.col("__e").alias("sel_us"),
            F.col("__c").alias("sel_cents"),
        )
    )


def decayed_sum(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    cents: Column,
    halflife_days: int,
) -> DataFrame:
    """Exponential-time-decay mass per key — the trending/recency score
    (recent activity counts full, week-old counts half, ...), in a
    STAIRCASE formulation that stays integer-exact: age quantizes to
    whole half-life periods k = age_days div halflife, the weight is
    the exact binary 2^(20-k) (0 beyond 20 periods ~ a 1e-6 floor),
    and the score is sum(cents * weight) — a plain BIGINT sum, so the
    result is bit-reproducible on any engine and any partition merge
    order. A float pow(0.5, age/h) score differs in the last ulp
    between libm implementations AND under re-ordered float addition;
    the staircase is the version you can oracle-check and
    incrementally maintain (it is a monoid, like the rollup cascade).

    "Now" is the global max timestamp (deterministic from the data;
    production pins it to the query time). Output: (keys..., n,
    raw_cents, decayed_e20) where decayed_e20 is in cents * 2^20 units
    at age 0. ONE broadcast scalar + one keys-keyed map-side-combined
    groupBy; at 100 TB the score merges across shards exactly.
    """
    if halflife_days < 1:
        raise ValueError("halflife_days must be >= 1")
    e = ntz_epoch_us(F.col(ts_col))
    now = df.agg(F.max(e).cast("long").alias("__now"))
    day_us = 86_400_000_000
    base = df.select(
        *[F.col(k) for k in keys],
        e.cast("long").alias("__e"),
        cents.cast("bigint").alias("__c"),
    ).crossJoin(F.broadcast(now))
    k = F.expr(f"((__now - __e) div {day_us}) div {halflife_days}")
    w = F.expr(
        "CAST(1048576 AS BIGINT) div shiftleft(CAST(1 AS BIGINT), "
        "CAST(least(__k, CAST(21 AS BIGINT)) AS INT))"
    )
    return (
        base.withColumn("__k", k)
        .withColumn("__w", w)
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__c").alias("raw_cents"),
            F.sum(F.col("__c") * F.col("__w")).alias("decayed_e20"),
        )
    )


def rollup_cascade(
    rollup: DataFrame, bucket: str, keys: list[str]
) -> DataFrame:
    """Coarser rollup derived from a finer one by the monoid merge:
    counts and sums add, min/max fold — identical to aggregating the
    raw rows directly (the cascade law; oracle-pinned by
    q_d16_rollup_cascade). Input partitions by the fine bucket merge
    map-side; the shuffle carries only rollup rows, never raw data."""
    return (
        rollup.groupBy(
            F.date_trunc(bucket, F.col("bucket")).alias("bucket"), *keys
        )
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_cents").alias("sum_cents"),
            F.min("min_cents").alias("min_cents"),
            F.max("max_cents").alias("max_cents"),
        )
    )


def cohort_retention(
    df: DataFrame, ts_col: str, user_col: str
) -> DataFrame:
    """Cohort retention matrix — the product-analytics staple: cohort =
    each user's FIRST active day, offset = days since it, cell =
    distinct users of that cohort active at that offset, plus the
    retention rate in 1e-4 fixed point against the cohort's own
    offset-0 size. ``(cohort_day, offset_days, n_users, pct_e4)``.

    Scale shape: one (user, day) distinct + one user-keyed min
    aggregate, joined on user (both shuffles keyed on user_id — the
    raw event table never carries anything wider), then a
    (cohort, offset) count-distinct. The matrix itself is
    days x offsets — tiny — so the offset-0 normalization is a window
    over it, not over data.
    """
    day = F.date_trunc("day", F.col(ts_col)).cast("timestamp_ntz")
    acts = (
        df.where(F.col(user_col).isNotNull())
        .select(F.col(user_col).alias("__u"), day.alias("__d"))
        .distinct()
    )
    firsts = acts.groupBy("__u").agg(F.min("__d").alias("__cohort"))
    cells = (
        acts.join(firsts, "__u")
        .select(
            "__u",
            "__cohort",
            F.datediff(F.col("__d").cast("date"), F.col("__cohort").cast("date"))
            .cast("bigint")
            .alias("offset_days"),
        )
        .groupBy(F.col("__cohort").alias("cohort_day"), "offset_days")
        .agg(F.countDistinct("__u").alias("n_users"))
    )
    w0 = Window.partitionBy("cohort_day")
    size0 = F.max(
        F.when(F.col("offset_days") == 0, F.col("n_users"))
    ).over(w0)
    return (
        cells.withColumn("__s0", size0)
        .select(
            "cohort_day",
            "offset_days",
            "n_users",
            F.expr("(n_users * 10000) div __s0").alias("pct_e4"),
        )
    )


def sta_lta_triggers(
    df: DataFrame,
    ts_col: str,
    id_col: str,
    keys: list[str],
    cents: Column,
    sta_n: int,
    lta_n: int,
    threshold_e4: int,
    n_partitions: int | None = None,
) -> DataFrame:
    """Classic STA/LTA trigger detection (Allen 1978; the ObsPy
    ``classic_sta_lta`` staple): per series key, the ratio of the
    short-term to the long-term trailing mean of an amplitude measure,
    flagged where it exceeds a threshold — the standard seismic
    event-onset detector, and the same spike detector a metrics
    pipeline runs on request rates. Emits only triggered rows:
    ``(keys..., id, ts_us, ratio_e4)``.

    Integer-exact: with integer-cent amplitudes the ratio is
    ``(sta_sum * lta_n * 10000) div (lta_sum * sta_n)`` — 1e-4 fixed
    point, no float division for engines to disagree over. Rows
    earlier than one full LTA window are suppressed (the warm-up
    region, matching the reference implementations).

    ONE shuffle on the key; both trailing sums share the single sorted
    window pass (same partition/order, ROWS frames of different
    lengths). 100 TB note: the frame scan is linear per key (sliding
    sums), and a per-channel day of samples is window-sized state.
    """
    if not (0 < sta_n < lta_n):
        raise ValueError("need 0 < sta_n < lta_n")
    e = ntz_epoch_us(F.col(ts_col))
    base = df.select(
        *[F.col(k) for k in keys],
        e.cast("long").alias("ts_us"),
        F.col(id_col).cast("long").alias("id"),
        cents.cast("bigint").alias("__c"),
    )
    if n_partitions is not None:
        # low-key-cardinality hint: an explicit k-partition hash layout
        # satisfies the window's ClusteredDistribution (which accepts
        # ANY partition count), so the window stage runs k full tasks
        # instead of shuffle.partitions tasks that are mostly EMPTY —
        # measured 0.24 s → 0.15 s on the 5-key sf0.1 fixture (r10).
        # Leave None at scale: with thousands of keys the default
        # shuffle + AQE coalescing is the right layout.
        base = base.repartition(n_partitions, *keys)
    order = [F.col("ts_us").asc(), F.col("id").asc()]
    wsta = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(-(sta_n - 1), 0)
    )
    wlta = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(-(lta_n - 1), 0)
    )
    # warm-up guard via count over the SAME frame as the LTA sum — one
    # frame processor instead of an extra growing row_number frame
    scored = (
        base.withColumn("__sta", F.sum("__c").over(wsta))
        .withColumn("__lta", F.sum("__c").over(wlta))
        .withColumn("__nl", F.count(F.lit(1)).over(wlta))
        .where(F.col("__nl") == lta_n)
        .where(F.col("__lta") > 0)
        .withColumn(
            "ratio_e4",
            F.expr(f"(__sta * {lta_n} * 10000) div (__lta * {sta_n})"),
        )
    )
    return scored.where(F.col("ratio_e4") > threshold_e4).select(
        *keys, "id", "ts_us", "ratio_e4"
    )


def cusum_drift(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    id_col: str,
    cents: Column,
) -> DataFrame:
    """One-sided CUSUM change-point statistic per series key (Page
    1954): the classic upward-drift detector over an amplitude/metric
    stream — flags when a series' level shifts above its own baseline
    (sensor drift, traffic regime change, corpus-quality drift over
    ingest order).

    The textbook recursion ``s_i = max(0, s_{i-1} + (x_i - target))``
    looks inherently sequential, but it has a closed window form:
    ``s_i = p_i - min(0, min_{j<=i} p_j)`` with ``p`` the running sum
    of deviations (the 0 is the implicit p_0 baseline: when prefix
    sums stay positive — a series that starts ABOVE its mean — the
    running min must not eat the head of the drift)
    — so ONE sorted-window pass per key computes the whole
    statistic (cumsum and running-min share the frame, the stalta
    discipline). Integer-exact: target = per-key integer mean
    (``sum div count``), every value BIGINT. Emits one row per key:
    the peak statistic and its earliest timestamp —
    ``(keys..., peak_s, peak_ts_us)``.
    """
    e = ntz_epoch_us(F.col(ts_col))
    base = df.select(
        *[F.col(k) for k in keys],
        e.cast("long").alias("ts_us"),
        F.col(id_col).cast("long").alias("id"),
        cents.cast("bigint").alias("__c"),
    )
    kw = Window.partitionBy(*keys)
    # integer target (sum div count) — floor-exact BIGINT, no float
    with_t = base.withColumn("__sum", F.sum("__c").over(kw)).withColumn(
        "__n", F.count(F.lit(1)).over(kw)
    ).withColumn(
        "__target", F.expr("__sum div __n").cast("bigint")
    ).drop("__sum", "__n")
    ow = (
        Window.partitionBy(*keys)
        .orderBy(F.col("ts_us").asc(), F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dev = F.col("__c") - F.col("__target")
    p = F.sum(dev).over(ow)
    s = (p - F.least(F.lit(0).cast("bigint"), F.min(p).over(ow))).alias("s")
    scored = with_t.select(*keys, "ts_us", F.col("__c"), s)
    peak = scored.groupBy(*keys).agg(F.max("s").alias("peak_s"))
    first_peak = (
        scored.join(peak, keys)
        .filter(F.col("s") == F.col("peak_s"))
        .groupBy(*keys)
        .agg(
            F.max("s").cast("bigint").alias("peak_s"),
            F.min("ts_us").cast("bigint").alias("peak_ts_us"),
        )
    )
    return first_peak
