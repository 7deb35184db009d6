"""One-pass column profiling (data-quality family, round 9).

Every ingestion pipeline fronts its tables with a profile report —
per-column row/null/distinct counts and value extents (the
deequ/dbt-test shape). At 100 TB the only acceptable plan is ONE scan
producing every statistic at once; per-column loops re-reading the
table are the classic accidental-quadratic. Spark compiles the
multi-``count(DISTINCT ...)`` aggregate into a single Expand + one
shuffle (data duplicated once per profiled column — the standard
trade), and the wide single-row result unpivots to the report via
``stack`` without touching the scan again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Profile ``cols`` in one scan: returns one row per column —
    ``(col_name, n, n_null, n_distinct, min_val, max_val)`` with the
    extents taken on the NATIVE type (true min/max, not lexicographic)
    then cast to string for a uniform schema. Callers profile types
    whose string form is not engine-stable — timestamps, doubles — by
    pre-projecting a canonical form (epoch micros, integer cents).

    ``n_distinct`` is exact (nulls excluded, matching ANSI
    ``count(DISTINCT col)``); swap in ``approx_count_distinct`` at
    cardinalities where exact is uneconomical — the report shape is
    unchanged.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    # index-based internal aliases + escaped name literals: a column
    # named with quotes/spaces/dots must not break the stack() SQL
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"__null_{i}"),
            F.countDistinct(c).alias(f"__nd_{i}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{i}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{i}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        "'{lit}', __null_{i}, __nd_{i}, __min_{i}, __max_{i}".format(
            lit=c.replace("\\", "\\\\").replace("'", "\\'"), i=i
        )
        for i, c in enumerate(cols)
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_null, n_distinct, min_val, max_val)"
        ),
        F.col("__n").alias("n"),
    ).select("col_name", "n", "n_null", "n_distinct", "min_val", "max_val")


def grouped_median_mad(
    df: DataFrame, keys: list[str], value: str
) -> DataFrame:
    """Robust per-group location/scale: the LOWER (discrete) median and
    the median absolute deviation, both exact and integer when the
    input is integer — the outlier-detection pair that survives the
    exact data quality a mean/stddev report dies on (one corrupt 1e12
    reading shifts a mean arbitrarily; it moves a median by at most
    one rank). ``(keys..., n, median_val, mad_val)``.

    The discrete lower median (value at rank ceil(n/2) under
    (value, tie) order) is chosen over the interpolated median
    deliberately: it is a value FROM the data, integer-exact, and
    identically defined in any engine — no float interpolation to
    disagree over.

    Plan shape — the WEIGHTED-median formulation: rows hit exactly ONE
    (keys, value) groupBy; every rank thereafter (cumulative counts,
    median pick, deviation re-rank) runs over the distinct-value
    table, never row-scale data. The rank-k value of a multiset equals
    the smallest value whose cumulative count reaches ceil(n/2), so
    this is value-identical to a per-row row_number formulation (the
    oracle runs that one) while shuffling O(distinct values) instead
    of O(rows) through the windows — the same windows-never-touch-rows
    discipline as systematic_weighted_sample.
    """
    counts = (
        df.select(*[F.col(k) for k in keys], F.col(value).alias("__v"))
        .groupBy(*keys, "__v")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    wv = (
        Window.partitionBy(*keys)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = counts.withColumn("__cum", F.sum("__cnt").over(wv)).withColumn(
        "__n", F.sum("__cnt").over(Window.partitionBy(*keys))
    )
    med = (
        cum.where(F.col("__cum") >= F.expr("(__n + 1) div 2"))
        .groupBy(*keys)
        .agg(
            F.min("__v").alias("median_val"),
            F.max("__n").alias("n"),
        )
    )
    dagg = (
        counts.join(F.broadcast(med), keys)
        .select(
            *keys,
            "n",
            "median_val",
            F.abs(F.col("__v") - F.col("median_val")).alias("__d"),
            "__cnt",
        )
        .groupBy(*keys, "n", "median_val", "__d")
        .agg(F.sum("__cnt").alias("__dc"))
    )
    wd = (
        Window.partitionBy(*keys)
        .orderBy("__d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        dagg.withColumn("__cum", F.sum("__dc").over(wd))
        .where(F.col("__cum") >= F.expr("(n + 1) div 2"))
        .groupBy(*keys, "n", "median_val")
        .agg(F.min("__d").alias("mad_val"))
        .select(*keys, "n", "median_val", "mad_val")
    )


def mad_outliers(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    value: str,
    k_e2: int = 300,
) -> DataFrame:
    """Robust per-group outlier FLAGS — the standard MAD z-score rule
    (Hampel identifier; Leys et al. 2013 recommend it over mean±k·σ
    because one corrupt reading moves a mean arbitrarily but a median
    by one rank): emit every row whose absolute deviation from its
    group's discrete median exceeds ``k_e2/100 × MAD``. Pure integer
    test — ``100·|v − median| > k_e2·mad`` — so the flagged set is
    engine-portable (no float z-scores to disagree over). Groups with
    MAD 0 (>= half the mass on one value) flag ANY deviation: in a
    constant series every departure is anomalous, the documented
    Hampel degenerate case. Returns ``(keys..., id, v, dev,
    median_val, mad_val)``.

    Scale shape: the median/MAD pair comes from grouped_median_mad
    (rows hit ONE (keys, value) groupBy; windows run over distinct
    values), then the |keys|-sized stats table broadcasts back onto
    the rows — one scan, one count shuffle, zero row-scale windows.
    """
    stats = grouped_median_mad(
        df.select(*[F.col(k) for k in keys], F.col(value)), keys, value
    )
    base = df.select(
        *[F.col(k) for k in keys],
        F.col(id_col).cast("long").alias("id"),
        F.col(value).cast("bigint").alias("__v"),
    )
    dev = F.abs(F.col("__v") - F.col("median_val"))
    return (
        base.join(F.broadcast(stats), keys)
        .where(dev * 100 > F.lit(int(k_e2)) * F.col("mad_val"))
        .select(
            *keys,
            "id",
            F.col("__v").alias("v"),
            dev.cast("bigint").alias("dev"),
            "median_val",
            "mad_val",
        )
    )


def grouped_quantiles(
    df: DataFrame, keys: list[str], value: str, percents: list[int]
) -> DataFrame:
    """Discrete per-group quantiles — the p50/p95/p99 latency-dashboard
    row, one column per requested integer percent. Quantile p = the
    smallest value whose cumulative count reaches ceil(p*n/100) (the
    same rank-k definition as ``grouped_median_mad``; values FROM the
    data, integer-exact, no interpolation for engines to disagree
    over).

    Same weighted formulation: rows hit ONE (keys, value) groupBy;
    the cumulative window and the conditional-min readout (one
    ``min(CASE cum >= k_p THEN v)`` per percent — a single pass, not
    one rank per quantile) run over the distinct-value table.
    """
    if not percents or any(p < 1 or p > 100 for p in percents):
        raise ValueError("percents must be ints in [1, 100]")
    counts = (
        df.select(*[F.col(k) for k in keys], F.col(value).alias("__v"))
        .groupBy(*keys, "__v")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    wv = (
        Window.partitionBy(*keys)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = counts.withColumn("__cum", F.sum("__cnt").over(wv)).withColumn(
        "__n", F.sum("__cnt").over(Window.partitionBy(*keys))
    )
    return cum.groupBy(*keys).agg(
        F.max("__n").alias("n"),
        *[
            F.min(
                F.when(
                    F.col("__cum") >= F.expr(f"({p} * __n + 99) div 100"),
                    F.col("__v"),
                )
            ).alias(f"p{p}")
            for p in percents
        ],
    )


def embedding_moments(
    df: DataFrame, keys: list[str], vec_col: str, dim: int
) -> DataFrame:
    """Per-group per-dimension embedding distribution moments — the
    drift monitor every embedding pipeline fronts retraining with:
    ``(keys..., dim, n, sum_e6, sumsq_e12, mean_e6, var_e12)`` where
    components are quantized to 1e-6 units BEFORE aggregation, so the
    sums are plain BIGINTs — bit-reproducible under any partition
    merge order (a float sum is not) and a mergeable monoid: shards
    ship (n, sum, sumsq) triples, a coordinator adds them, and
    yesterday-vs-today drift is a subtraction. mean/var derive by
    integer division (floor semantics, documented); ``dim`` is
    1-based.

    One posexplode projection + one (keys, dim) map-side-combined
    groupBy — output is |groups| x dim rows regardless of corpus size.
    """
    if dim < 1:
        raise ValueError("dim must be >= 1")
    q = F.round(F.col("__x").cast("double") * 1_000_000, 0).cast("bigint")
    exploded = df.select(
        *[F.col(k) for k in keys],
        F.posexplode(F.col(vec_col)).alias("__p", "__x"),
    ).select(
        *[F.col(k) for k in keys],
        (F.col("__p") + 1).cast("bigint").alias("dim"),
        q.alias("__q"),
    )
    return (
        exploded.groupBy(*keys, "dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__q").alias("sum_e6"),
            F.sum(F.col("__q") * F.col("__q")).alias("sumsq_e12"),
        )
        .select(
            *keys,
            "dim",
            "n",
            "sum_e6",
            "sumsq_e12",
            F.expr("sum_e6 div n").alias("mean_e6"),
            F.expr(
                "sumsq_e12 div n - (sum_e6 div n) * (sum_e6 div n)"
            ).alias("var_e12"),
        )
    )


def gram_matrix(
    df: DataFrame,
    keys: list[str],
    vec_col: str,
    dim: int,
    max_component: float = 2.0,
    scale_log10: int = 6,
) -> DataFrame:
    """Per-group fixed-point GRAM / covariance accumulator over the
    first ``dim`` embedding dimensions — the sufficient statistic for
    PCA / whitening / Mahalanobis on a corpus of embeddings: one row
    per ``(keys..., i, j)`` with ``i <= j`` (upper triangle) carrying

    ``(n, sx_e6, sy_e6, sxy_e12, cov_num_e12)``

    where components are quantized to 1e-6 units BEFORE any sum (the
    K31 embedding_moments discipline), so every statistic is a plain
    BIGINT: bit-reproducible under any partition merge order, and a
    mergeable monoid — shards ship (n, sx, sy, sxy) tuples, a
    coordinator adds them, and the covariance numerator derives as
    ``n * sxy - sx * sy`` (the eigendecomposition itself is a
    driver-side numpy call over the d x d result, exactly the
    IVF-centroid bounded-collect contract).

    Plan shape: ONE scan, ONE map-side-combinable groupBy — the
    d(d+1)/2 product sums are generated column expressions (whole-
    stage codegen; no explode, no self-join, no Python). Output is
    |groups| x d(d+1)/2 rows at any corpus size.

    Overflow envelope (exact, not hand-waved): with |component| <=
    ``max_component`` the worst case is |cov_num| <= 2 * n^2 *
    (max_component * 1e6)^2, which stays under 2^63 only up to
    ``n <= 2^31 / (max_component * 1e6)`` rows per group — ~1073 at
    the default max_component=2.0, ~2147 for unit-norm components.
    That is SMALL: beyond it, rescale components upstream (e4 scaling
    buys 100x: ~1e5 rows/group) — so the operator guards the bound at
    runtime and fails LOUDLY (raise_error) instead of letting int64
    silently wrap into garbage covariances. Rows whose vector is
    shorter than ``dim`` fail loudly the same way (the sq_topk
    precedent) rather than vanishing as nulls, and BOTH halves of the
    envelope are enforced: a component with |c| > max_component (the
    assumption n_safe rests on) or a NULL component inside a
    long-enough vector (sum() would skip it while n counts the row,
    silently skewing cov_num — the series_trend pre-filter rationale)
    raise_error in the quantized projection (ADVICE r12).
    """
    if dim < 1:
        raise ValueError("dim must be >= 1")
    if max_component <= 0:
        raise ValueError("max_component must be > 0")
    if not 1 <= scale_log10 <= 6:
        raise ValueError("scale_log10 must be in [1, 6]")
    # quantization unit = 10^-scale_log10; the int64 envelope scales
    # inversely with the unit (e6 -> ~1073 rows/group at mc=2.0, e4 ->
    # ~107k) — callers with bigger groups trade precision for headroom
    # (pca_fit/opq_fit auto-select; ADVICE r12's loud guard stays)
    q_unit = 10 ** scale_log10
    n_safe = int((float(2**62) ** 0.5) / (max_component * q_unit))
    if dim > 64:
        raise ValueError("dim > 64: d(d+1)/2 expression count is the "
                         "practical ceiling; project the vector first")
    guarded = F.expr(
        f"CASE WHEN size({vec_col}) >= {int(dim)} THEN {vec_col} "
        f"ELSE raise_error(concat('gram_matrix: vector has ', "
        f"cast(size({vec_col}) as string), ' dims, need {int(dim)}')) "
        "END"
    )

    # quantize each component ONCE in a projection (d expressions),
    # so the d(d+1)/2 aggregate inputs are plain column products —
    # not d^2 re-evaluations of element_at/round per row.
    # Each quantized component is range-guarded: the n_safe overflow
    # envelope assumes |component| <= max_component, so a component
    # past that bound (or a NULL inside a long-enough vector, which
    # sum() would silently skip while n still counts the row) must
    # fail LOUDLY instead of skewing the e12 product sums (ADVICE r12)
    q_max = int(round(max_component * q_unit))
    base = df.select(
        *[F.col(k) for k in keys], guarded.alias("__v")
    ).select(
        *[F.col(k) for k in keys],
        *[
            F.expr(
                f"CASE WHEN abs(cast(round(cast(element_at(__v, {i}) "
                f"as double) * {q_unit}, 0) as bigint)) <= {q_max} "
                f"THEN cast(round(cast(element_at(__v, {i}) as double) "
                f"* {q_unit}, 0) as bigint) "
                f"ELSE raise_error(concat('gram_matrix: component {i} "
                f"= ', coalesce(cast(element_at(__v, {i}) as string), "
                f"'NULL'), ' outside [-{max_component}, "
                f"{max_component}] (null or overflow-unsafe; rescale "
                f"upstream or raise max_component)')) END"
            ).alias(f"__q_{i}")
            for i in range(1, dim + 1)
        ],
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    aggs += [F.sum(f"__q_{i}").alias(f"__s_{i}") for i in range(1, dim + 1)]
    aggs += [
        F.sum(F.col(f"__q_{i}") * F.col(f"__q_{j}")).alias(f"__p_{i}_{j}")
        for i in range(1, dim + 1)
        for j in range(i, dim + 1)
    ]
    wide = base.groupBy(*[F.col(k) for k in keys]).agg(*aggs)
    pairs = [(i, j) for i in range(1, dim + 1) for j in range(i, dim + 1)]
    branches = ", ".join(
        f"{i}, {j}, __s_{i}, __s_{j}, __p_{i}_{j}" for i, j in pairs
    )
    # loud overflow guard: past n_safe the cov_num arithmetic can wrap
    # int64 silently — refuse instead (rescale upstream, docstring)
    guarded_n = F.expr(
        f"CASE WHEN n <= {n_safe} THEN n ELSE raise_error(concat("
        f"'gram_matrix: group of ', cast(n as string), ' rows exceeds "
        f"the int64-safe bound {n_safe} at e{scale_log10} scaling "
        f"(max_component={max_component}); lower scale_log10 or "
        f"rescale components')) END"
    )
    return wide.select(
        *keys,
        guarded_n.alias("n"),
        F.expr(
            f"stack({len(pairs)}, {branches}) "
            "AS (i, j, sx_e6, sy_e6, sxy_e12)"
        ),
    ).select(
        *keys,
        "i",
        "j",
        "n",
        "sx_e6",
        "sy_e6",
        "sxy_e12",
        (
            F.col("n") * F.col("sxy_e12") - F.col("sx_e6") * F.col("sy_e6")
        ).alias("cov_num_e12"),
    )


def series_trend(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_cents,
    t0: str,
    unit_seconds: int = 60,
) -> DataFrame:
    """Per-series least-squares TREND as exact integer sufficient
    statistics — the monitoring primitive behind "is this metric
    drifting": one row per series with

    ``(keys..., n, sx, sy, sxy, sxx, slope_num, slope_den)``

    where x = whole ``unit_seconds`` intervals since the fixed origin
    ``t0`` (integer division of epoch-µs — identical in any engine),
    y = the integer-cents measure, and the OLS slope is carried as the
    EXACT rational ``slope_num / slope_den`` with
    ``slope_num = n·Σxy − Σx·Σy``, ``slope_den = n·Σx² − (Σx)²``
    (cross-multiplying the normal equation clears the division; the
    float slope is a driver/pytest formula). Every statistic is a
    plain BIGINT sum — mergeable (shards add the tuples) and
    bit-reproducible under any partition order, the D14/K47
    discipline. ``slope_den = 0`` marks a degenerate series (all
    observations in one time unit).

    Overflow envelope (exact): |slope_num| <= 2 * n^2 * x_max * y_max,
    so int64 holds while n <= sqrt(2^62 / (x_max * y_max)) — with
    minutes over a 30-day window (x <= 43,200) and y <= 5e4 cents
    that is ~4.6e4 rows per series; hours (x <= 720) stretch it to
    ~3.6e5. Widen ``unit_seconds`` (or pre-aggregate per unit) for
    longer windows or denser series.

    Plan: ONE scan + ONE map-side-combinable groupBy; output is
    |series| rows at any corpus size.
    """
    # cast covers TIMESTAMP_NTZ sources (the events.ts nanos-parquet
    # path); the session timezone is pinned UTC so NTZ->TZ is identity
    x = F.expr(
        f"(unix_micros(cast({ts_col} as timestamp)) "
        f"- unix_micros(timestamp'{t0}')) "
        f"div {int(unit_seconds) * 1_000_000}"
    ).cast("bigint")
    y = value_cents.cast("bigint")
    # drop null observations BEFORE aggregating: sum() skips nulls but
    # count(1) would not, silently skewing every derived statistic
    agg = df.select(
        *[F.col(k) for k in keys], x.alias("__x"), y.alias("__y")
    ).filter(
        F.col("__x").isNotNull() & F.col("__y").isNotNull()
    ).groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__x").cast("bigint").alias("sx"),
        F.sum("__y").cast("bigint").alias("sy"),
        F.sum(F.col("__x") * F.col("__y")).cast("bigint").alias("sxy"),
        F.sum(F.col("__x") * F.col("__x")).cast("bigint").alias("sxx"),
    )
    return agg.select(
        *keys,
        "n",
        "sx",
        "sy",
        "sxy",
        "sxx",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("bigint")
        .alias("slope_num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("bigint")
        .alias("slope_den"),
    )


def chance_corrected_agreement(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """Cohen's kappa (Cohen 1960) as ONE-row integer arithmetic — the
    chance-corrected upgrade of T42's raw confusion matrix: accuracy
    alone flatters a classifier whose majority class dominates (a
    lang-ID gate predicting 'en' everywhere scores high accuracy on an
    English-heavy corpus and kappa ~ 0). Returns

    ``(n, agree, exp_num, kappa_num, kappa_den, kappa_e4)``

    where ``exp_num = sum_k row_k * col_k`` (the chance-agreement
    numerator over the marginals), and kappa is carried as the EXACT
    integer rational ``kappa_num / kappa_den`` with
    ``kappa_num = n * agree - exp_num``, ``kappa_den = n^2 - exp_num``
    (cross-multiplying kappa = (p_o - p_e) / (1 - p_e) clears every
    division) plus a 1e4 fixed-point readout whose integer division is
    sign-split so floor == trunc on both engines. ``kappa_e4`` is NULL
    when the marginals are fully concentrated (kappa undefined).

    Plan: one |classes|^2 map-side-combinable cell aggregate, then
    marginal sums + one full-outer marginal join and two 1-row folds —
    everything after the first shuffle is |classes|-bounded.
    """
    cells = df.groupBy(
        F.col(label_col).alias("__l"), F.col(pred_col).alias("__p")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    tot = cells.agg(
        F.sum("__n").cast("bigint").alias("n"),
        F.sum(F.when(F.col("__l") == F.col("__p"), F.col("__n")).otherwise(0))
        .cast("bigint")
        .alias("agree"),
    )
    rm = cells.groupBy(F.col("__l").alias("k")).agg(
        F.sum("__n").cast("bigint").alias("rn")
    )
    cm = cells.groupBy(F.col("__p").alias("k")).agg(
        F.sum("__n").cast("bigint").alias("cn")
    )
    e = (
        rm.join(cm, "k", "full")
        .agg(
            F.sum(
                F.coalesce(F.col("rn"), F.lit(0))
                * F.coalesce(F.col("cn"), F.lit(0))
            )
            .cast("bigint")
            .alias("exp_num")
        )
    )
    return (
        tot.crossJoin(e)
        .withColumn("kappa_num", F.col("n") * F.col("agree") - F.col("exp_num"))
        .withColumn("kappa_den", F.col("n") * F.col("n") - F.col("exp_num"))
        .withColumn(
            "kappa_e4",
            F.expr(
                "CASE WHEN kappa_den = 0 THEN NULL "
                "WHEN kappa_num >= 0 "
                "THEN (kappa_num * 10000) div kappa_den "
                "ELSE -(((-kappa_num) * 10000) div kappa_den) END"
            ).cast("bigint"),
        )
    )


def percentile_calibrate(
    df: DataFrame, keys: list[str], score: str, id_col: str
) -> DataFrame:
    """Cross-group score calibration: replace each row's raw score with
    its integer percentile rank WITHIN its group —
    ``pctl_e4 = ((rank - 1) * 10000) div (n - 1)`` (0 for singleton
    groups). The mixing prerequisite: quality scores from different
    sources/classifiers live on incomparable scales, and "keep the top
    30% of each source" only means one thing after per-source
    percentile normalization (the CCNet-bucket idea generalized to any
    score). Rank ties break by ``id_col``, so equal scores get
    adjacent (deterministic) percentiles rather than equal ones —
    exactly what a downstream threshold needs to cut a precise
    fraction.

    ONE shuffle on the group key; rank + count share the sorted pass.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(
        F.col(score).asc(), F.col(id_col).asc()
    )
    wn = Window.partitionBy(*keys)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wn))
        .withColumn(
            "pctl_e4",
            F.when(F.col("__n") > 1,
                   F.expr("((__rk - 1) * 10000) div (__n - 1)"))
            .otherwise(F.lit(0))
            .cast("bigint"),
        )
        .drop("__rk", "__n")
    )


def equi_depth_splits(
    df: DataFrame, value: str, n_splits: int
) -> DataFrame:
    """Deterministic equi-depth split points for range partitioning:
    the ``n_splits`` interior boundaries that divide the value
    distribution into ``n_splits + 1`` equal-count ranges — what
    ``repartitionByRange`` ESTIMATES by sampling, computed exactly and
    reproducibly (plan a stable layout once, reuse it across runs;
    sampled boundaries change layout run-to-run and break file-level
    diffing). ``(split_idx, boundary)`` with boundary = the discrete
    quantile at rank ceil(i*n/(n_splits+1)).

    Same weighted machinery as ``grouped_quantiles``: one (value)
    groupBy, cumulative window over the distinct-value table, one
    conditional-min readout per split.
    """
    from pyspark.sql import Window

    if n_splits < 1:
        raise ValueError("n_splits must be >= 1")
    counts = (
        df.select(F.col(value).alias("__v"))
        .groupBy("__v")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    wv = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.withColumn("__cum", F.sum("__cnt").over(wv)).withColumn(
        "__n", F.sum("__cnt").over(Window.partitionBy())
    )
    parts = n_splits + 1
    agg = cum.agg(
        *[
            F.min(
                F.when(
                    F.col("__cum")
                    >= F.expr(f"({i} * __n + {parts} - 1) div {parts}"),
                    F.col("__v"),
                )
            ).alias(f"__s{i}")
            for i in range(1, parts)
        ]
    )
    stack = ", ".join(f"{i}, __s{i}" for i in range(1, parts))
    return agg.select(
        F.expr(
            f"stack({n_splits}, {stack}) AS (split_idx, boundary)"
        )
    ).select(F.col("split_idx").cast("bigint").alias("split_idx"), "boundary")


def curriculum_phases(
    df: DataFrame,
    keys: list[str],
    score: str,
    id_col: str,
    token_col: str,
    phase_floors_e4: list[int],
) -> DataFrame:
    """Quality-curriculum data schedule (the annealed-mixture idea:
    later training phases admit progressively lower-quality data):
    phase ``p`` admits every row whose per-group calibrated percentile
    (``percentile_calibrate``) is >= ``phase_floors_e4[p]``, and the
    schedule reports per (phase, group) admitted doc/token quotas —
    the table a training loader consumes, derived deterministically
    from the corpus instead of hand-maintained configs.

    Floors must be non-increasing so phases are SUPERSETS of their
    predecessors (a doc admitted early never disappears later — the
    property that keeps data order curricula stable across re-runs).
    One calibration shuffle + one (phase x group) aggregate over an
    exploded phase membership (rows replicate only into phases that
    admit them, <= len(phases) each).
    Emits ``(phase, keys..., n_docs, n_tokens)``.
    """
    if not phase_floors_e4:
        raise ValueError("need at least one phase floor")
    if any(
        a < b for a, b in zip(phase_floors_e4, phase_floors_e4[1:])
    ):
        raise ValueError("phase floors must be non-increasing")
    cal = percentile_calibrate(df, keys, score, id_col)
    floors = F.array(
        *[F.lit(int(x)).cast("bigint") for x in phase_floors_e4]
    )
    phases = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.lit(len(phase_floors_e4) - 1)),
            lambda p: F.when(
                F.col("pctl_e4") >= F.element_at(floors, p + 1), p
            ),
        ),
        lambda x: x.isNotNull(),
    )
    return (
        cal.withColumn("phase", F.explode(phases))
        .groupBy("phase", *keys)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col(token_col)).cast("bigint").alias("n_tokens"),
        )
    )


def ks_drift_matrix(
    df: DataFrame,
    source_col: str,
    value_col: str,
) -> DataFrame:
    """Pairwise Kolmogorov–Smirnov drift matrix over a per-document
    SCORE column: for every two sources, the KS statistic
    ``sup_x |F_a(x) - F_b(x)|`` between their empirical score CDFs —
    the ORDER-sensitive complement of the q_t41 total-variation
    matrix (TV over hashed unigrams sees token-mix shift; KS over a
    quality score sees DISTRIBUTIONAL shift of the score itself, the
    statistic a curation pipeline alarms on when a new snapshot's
    quality profile slides even though its vocabulary doesn't).

    Pure integer (the pmi discipline), division-free by
    cross-multiplication: with cumulative counts ``c_a(x)``, ``c_b(x)``
    and totals ``n_a``, ``n_b``,

        ks_num = max_x |c_a(x)*n_b - c_b(x)*n_a|
        KS     = ks_num / (n_a*n_b)         (in [0, 1])

    so the hashed surface is ``(src_a, src_b, n_a, n_b, ks_num,
    ks_e4)`` — every value BIGINT, ``ks_e4 = (ks_num*10000) div
    (n_a*n_b)`` exact in any engine. The max is evaluated on the
    UNION support (every distinct score value), which is where the
    sup of a pair of step functions is attained.

    Scale shape (the source_drift_matrix posture): one combinable
    (source, value) count shuffle out of the data scan; CDFs are one
    windowed pass over the S×V grid (V = distinct score values —
    quantize the score upstream if its support is unbounded, exactly
    as a production KS monitor buckets to ~1e4 cut points); the pair
    stage runs on an S²×V/2 grid of SKETCH rows, never data.

    Count-overflow envelope: the cross-multiplied terms peak at
    ``cum_a * n_b`` (~n²) and ``ks_num * 10^4``, so int64 holds while
    per-source row counts stay under ~1e7; at corpus scale compute
    the CDFs over a DETERMINISTIC row sample per source (D22
    bottom-k) — a KS monitor needs distributional shape, not a
    census — or rescale the 1e4 readout.
    """
    counts = (
        df.select(
            F.col(source_col).alias("src"),
            F.col(value_col).cast("bigint").alias("x"),
        )
        .groupBy("src", "x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )
    srcs = counts.select("src").distinct()
    support = counts.select("x").distinct()
    grid = srcs.crossJoin(support)
    cum = (
        grid.join(counts, ["src", "x"], "left")
        .select("src", "x", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
        .withColumn(
            "cum",
            F.sum("c")
            .over(
                Window.partitionBy("src")
                .orderBy("x")
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            .cast("bigint"),
        )
    )
    totals = counts.groupBy("src").agg(F.sum("c").cast("bigint").alias("n"))
    a = cum.select(
        F.col("src").alias("src_a"), "x", F.col("cum").alias("cum_a")
    )
    b = cum.select(
        F.col("src").alias("src_b"), "x", F.col("cum").alias("cum_b")
    )
    ta = totals.select(F.col("src").alias("src_a"), F.col("n").alias("n_a"))
    tb = totals.select(F.col("src").alias("src_b"), F.col("n").alias("n_b"))
    return (
        a.join(b, "x")
        .where(F.col("src_a") < F.col("src_b"))
        .join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
        .groupBy("src_a", "src_b", "n_a", "n_b")
        .agg(
            F.max(
                F.abs(
                    F.col("cum_a") * F.col("n_b")
                    - F.col("cum_b") * F.col("n_a")
                )
            )
            .cast("bigint")
            .alias("ks_num")
        )
        .withColumn(
            "ks_e4",
            F.expr("(ks_num * 10000) div (n_a * n_b)").cast("bigint"),
        )
    )


def pca_fit(
    df: DataFrame,
    vec_col: str,
    dim: int,
    k: int,
    max_component: float = 2.0,
    scale_log10: int | None = None,
):
    """PCA over an embedding column, completing the K47 story: the
    cluster aggregates the EXACT fixed-point Gram statistics
    (:func:`gram_matrix` with no grouping keys — one combinable
    shuffle of d(d+1)/2 BIGINT cells), the driver reconstructs the
    d x d covariance from those integers and eigendecomposes it —
    a bounded numpy call on a d x d matrix, the IVF-centroid
    bounded-collect contract; the corpus is never collected.

    Returns ``(means, components, explained_var)``: per-dimension
    means (length d, float), the top-``k`` principal axes as a
    (k, d) row matrix (orthonormal, descending eigenvalue order,
    sign fixed so each axis' largest-|entry| coordinate is positive —
    deterministic across LAPACK builds), and their eigenvalues.

    Feed ``(means, components)`` to :func:`pca_project` for the
    whitening/dim-reduction projection, or use the axes directly for
    OPQ-style rotations ahead of PQ (q_k23) — exactly what the K47
    docstring promises the Gram statistics are FOR.
    """
    import numpy as np

    if not 1 <= k <= dim:
        raise ValueError("need 1 <= k <= dim")
    if scale_log10 is None:
        # auto-select the finest quantization whose int64 envelope
        # covers the corpus (one cheap count; the r13 opq lesson —
        # the fixed e6 guard fired on a 2000-row corpus at sf0.1)
        n_rows = df.count()
        scale_log10 = 6
        while scale_log10 > 1 and n_rows > int(
            (float(2**62) ** 0.5) / (max_component * 10 ** scale_log10)
        ):
            scale_log10 -= 1
    rows = gram_matrix(
        df, [], vec_col, dim=dim, max_component=max_component,
        scale_log10=scale_log10,
    ).collect()
    # keys=[] makes gram_matrix a GLOBAL aggregate, which yields one
    # row (n=0, NULL sums) even on an empty frame — so the empty-input
    # check must inspect n, not row count (ADVICE r12)
    if not rows or rows[0]["n"] == 0:
        raise ValueError("pca_fit: empty input")
    n = rows[0]["n"]
    unit2 = float(10 ** (2 * scale_log10))
    C = np.zeros((dim, dim))
    S = np.zeros(dim)
    for r in rows:
        i, j = r["i"] - 1, r["j"] - 1
        # exact integer numerator -> float covariance (divide LAST)
        C[i, j] = C[j, i] = r["cov_num_e12"] / (n * n * unit2)
        S[i] = r["sx_e6"]
        S[j] = r["sy_e6"]
    means = S / (n * float(10 ** scale_log10))
    evals, evecs = np.linalg.eigh(C)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    for row in comps:
        if row[np.argmax(np.abs(row))] < 0:
            row *= -1.0
    return means, comps, evals[order]


def pca_project(
    df: DataFrame,
    vec_col: str,
    means,
    components,
    out_col: str = "pca",
) -> DataFrame:
    """Project ``vec_col`` onto the axes from :func:`pca_fit`:
    appends ``out_col`` = array of k scores, each
    ``sum_i (v_i - mean_i) * W_ji``. The (k x d) weights inline as
    literal expression terms — whole-stage codegen, zero shuffle,
    zero Python: the projection is a pure scan-side map at any corpus
    size (the jl_project posture, but with LEARNED axes)."""
    k, d = len(components), len(components[0])
    comps = []
    for j in range(k):
        terms = None
        for i in range(d):
            w = float(components[j][i])
            if w == 0.0:
                continue
            t = (
                F.element_at(F.col(vec_col), i + 1).cast("double")
                - float(means[i])
            ) * w
            terms = t if terms is None else terms + t
        comps.append(terms if terms is not None else F.lit(0.0))
    return df.withColumn(out_col, F.array(*comps))


def robust_trend(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_cents,
    t0: str,
    unit_seconds: int = 3600,
) -> DataFrame:
    """Per-series ROBUST trend — the outlier-proof companion of
    :func:`series_trend`: the Mann–Kendall monotonic-trend test
    (Mann 1945; Kendall 1975 — the hydrology/climatology standard)
    plus the Theil–Sen median slope (Theil 1950; Sen 1968, the
    estimator with ~29% breakdown vs OLS's zero). One corrupted
    hour cannot flip either; OLS's slope_num follows any single
    outlier.

    The series is first REGULARIZED: observations aggregate to
    integer-cents totals per whole ``unit_seconds`` bucket since
    ``t0`` (distinct x per series — so every Theil–Sen pair has
    dx > 0, and Mann–Kendall's tie correction only concerns y ties).
    Per series key the output row carries

    ``(n, m_pairs, s_mk, var18, ts_dy, ts_dx)``

    all BIGINT: ``s_mk = Σ sign(y_j − y_i)`` over the m = n(n−1)/2
    ordered pairs; ``var18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)`` (the
    tie-corrected 18·Var(S) — the z-statistic
    S/sqrt(var18/18) is a pytest/driver formula, the division never
    enters the hashed surface); ``(ts_dy, ts_dx)`` is the EXACT
    rational Theil–Sen slope: the pair at the discrete lower-median
    rank (the D18 discipline) when pairs are ordered by dy/dx. The
    ratio ordering uses one IEEE double DIVISION — exact-rounded and
    therefore bit-identical in every engine (unlike libm
    transcendentals); equal rationals (1/2 vs 2/4) tie-break
    deterministically by (dy, dx, x_i).

    Scale shape: the pair join is per-series bounded — regularizing
    to hours caps n at window/3600 (720 for 30 days → ≤ 259k pairs
    per series), so the join is an equi-join on keys with a bounded
    fan-out, never corpus × corpus. One groupBy (regularize) + one
    bounded self-join + two per-key aggregates + one rank window.
    """
    if unit_seconds < 1:
        raise ValueError("unit_seconds must be >= 1")
    # fail-loud on ts < t0: Spark `div` truncates toward zero while a
    # SQL oracle's `//` floors, so a negative epoch delta lands in a
    # DIFFERENT bucket per engine — a driver-hash mismatch invisible
    # to pytest parity (ADVICE r13). Rejecting the row loudly keeps
    # the bucket law single-semantics instead of silently skewed.
    delta = (
        f"(unix_micros(cast({ts_col} as timestamp)) "
        f"- unix_micros(timestamp'{t0}'))"
    )
    x = F.expr(
        f"CASE WHEN {delta} IS NULL THEN NULL "
        f"WHEN {delta} >= 0 THEN {delta} "
        f"div {int(unit_seconds) * 1_000_000} "
        f"ELSE raise_error(concat('robust_trend: ts ', "
        f"cast({ts_col} as string), ' precedes t0 {t0}; trunc-vs-"
        f"floor bucket semantics diverge across engines')) END"
    ).cast("bigint")
    y = value_cents.cast("bigint")
    ser = (
        df.select(*[F.col(k) for k in keys], x.alias("__x"), y.alias("__y"))
        .filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
        .groupBy(*[F.col(k) for k in keys], "__x")
        .agg(F.sum("__y").alias("__y"))
    )
    n_tbl = ser.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    ties = (
        ser.groupBy(*keys, "__y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .groupBy(*keys)
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).cast("bigint").alias("tie_term")
        )
    )
    a = ser.select(
        *[F.col(k) for k in keys],
        F.col("__x").alias("__xa"),
        F.col("__y").alias("__ya"),
    )
    b = ser.select(
        *[F.col(k) for k in keys],
        F.col("__x").alias("__xb"),
        F.col("__y").alias("__yb"),
    )
    pairs = a.join(b, on=keys).filter(F.col("__xa") < F.col("__xb")).select(
        *keys,
        (F.col("__yb") - F.col("__ya")).alias("__dy"),
        (F.col("__xb") - F.col("__xa")).alias("__dx"),
        F.col("__xa"),
    )
    mk = pairs.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("m_pairs"),
        F.sum(F.signum(F.col("__dy")).cast("bigint"))
        .cast("bigint")
        .alias("s_mk"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(
        (F.col("__dy").cast("double") / F.col("__dx").cast("double")).asc(),
        F.col("__dy").asc(),
        F.col("__dx").asc(),
        F.col("__xa").asc(),
    )
    med = (
        pairs.withColumn("__rk", F.row_number().over(w))
        .join(mk.select(*keys, "m_pairs"), on=keys)
        .filter(F.col("__rk") == F.expr("(m_pairs + 1) div 2"))
        .select(
            *keys,
            F.col("__dy").cast("bigint").alias("ts_dy"),
            F.col("__dx").cast("bigint").alias("ts_dx"),
        )
    )
    return (
        n_tbl.join(ties, on=keys)
        .join(mk, on=keys)
        .join(med, on=keys, how="left")
        .select(
            *keys,
            "n",
            "m_pairs",
            "s_mk",
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.col("tie_term")
            ).cast("bigint").alias("var18"),
            "ts_dy",
            "ts_dx",
        )
    )
