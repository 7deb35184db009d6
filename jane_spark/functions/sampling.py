"""Deterministic sampling / splitting primitives (north-star pipeline ops).

A training-data pipeline needs *reproducible* row selection: the same
document must land in the same train/val/test split on every run, on
every cluster size, with no RNG state. Spark's ``df.sample`` is
seed-dependent per-partition — repartitioning changes the sample — so
these helpers derive all randomness from a salted content hash instead:

    bucket = int(md5(salt || key)[:8 hex]) % n_buckets

which is partition-layout-independent, cross-engine reproducible (the
DuckDB oracle computes the identical expression), and embarrassingly
parallel — a pure projection, no shuffle, codegen'd end-to-end.

At 100 TB this is the only sane shape: splitting/sampling never moves
data, never needs a seed broadcast, and composes with predicate
pushdown (a ``bucket < r`` filter prunes before any join/agg).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash_bucket(key: Column, n_buckets: int, salt: str = "") -> Column:
    """Uniform deterministic bucket in [0, n_buckets) from a salted md5.

    Uses the first 8 hex chars (32 bits) — unbiased enough for any
    n_buckets ≤ ~1e6. Distinct salts give independent bucketings, so a
    sampling decision never correlates with a split decision.

    DuckDB twin fragment::

        CAST(concat('0x', substr(md5(concat('<salt>', CAST(k AS VARCHAR))),
                    1, 8)) AS BIGINT) % n
    """
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % n_buckets


def split_assign(
    key: Column,
    fractions: dict[str, float],
    salt: str = "split:",
) -> Column:
    """Assign each row a named split ('train'/'val'/'test'/…) by hash
    bucket over cumulative fraction thresholds. ``fractions`` must sum
    to 1.0; insertion order defines the threshold order."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    b = hash_bucket(key, 10_000, salt)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = b < int(round(acc * 10_000))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return (expr.otherwise(names[-1])) if expr is not None else F.lit(names[-1])


def stratified_keep(
    key: Column,
    stratum: Column,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: str = "sample:",
) -> Column:
    """Boolean keep-filter for per-stratum downsampling (e.g. rebalance
    an over-represented language). Pure projection — the filter pushes
    down to the scan."""
    b = hash_bucket(key, 10_000, salt)
    expr = None
    for name, rate in rates.items():
        cond = stratum == name
        thr = b < int(round(rate * 10_000))
        expr = F.when(cond, thr) if expr is None else expr.when(cond, thr)
    default = b < int(round(default_rate * 10_000))
    return expr.otherwise(default) if expr is not None else default


def repeat_factor(stratum: Column, factors: dict[str, int]) -> Column:
    """Per-stratum integer upsampling factor (epoch mixing weights).
    Use with ``F.explode(F.sequence(F.lit(1), repeat_factor(...)))`` to
    materialize repeats — a narrow flatMap, no shuffle."""
    expr = None
    for name, k in factors.items():
        cond = stratum == name
        expr = F.when(cond, k) if expr is None else expr.when(cond, k)
    return expr.otherwise(1) if expr is not None else F.lit(1)


def mixture_sample(
    df,
    id_col: str,
    source_col: str,
    tokens_col: str,
    weights: dict[str, float],
    token_budget: float,
    salt: str = "mix:",
):
    """Token-budget mixture sampling — the "data mixture" stage of a
    training run (public recipe in GPT-3/LLaMA/DoReMi reports): given a
    per-source weight table and a global token budget, each source s
    gets a target of ``budget * w_s / sum(w)`` tokens, realized as a
    deterministic per-source keep-fraction

        frac_s = min(1, target_s / available_tokens_s)

    applied by the salted content hash (same scheme as ``hash_bucket``,
    so the sample is stable across runs, cluster sizes, and partition
    layouts; a new salt draws an independent sample). Sources absent
    from ``weights`` are excluded (weight 0).

    Returns the kept rows of ``df`` unchanged (minus nothing): a pure
    filter. Scale shape: ONE tiny per-source aggregate (rows = number
    of sources) broadcast back onto the corpus — the corpus itself
    never shuffles, and the hash filter pushes down to the scan on
    re-read. ``tokens_col`` is the caller's token-count column (cheap
    whitespace count or a real tokenizer count).
    """
    wsum = float(sum(weights.values()))
    wmap = F.create_map(
        *[x for k, v in weights.items() for x in (F.lit(k), F.lit(float(v)))]
    )
    avail = df.groupBy(source_col).agg(F.sum(tokens_col).alias("__avail"))
    w = wmap[F.col(source_col)]
    raw = (F.lit(float(token_budget)) * w / F.lit(wsum)) / F.col(
        "__avail"
    ).cast("double")
    # least() SKIPS nulls in Spark, so an absent-weight source would get
    # frac 1.0 instead of exclusion — gate on the weight lookup explicitly
    frac = F.when(w.isNotNull(), F.least(F.lit(1.0), raw))
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return (
        df.join(F.broadcast(avail), source_col)
        .filter(u.cast("double") < frac * F.lit(4294967296.0))
        .drop("__avail")
    )


def systematic_weighted_sample(
    df,
    id_col: str,
    weight_col: str,
    n: int,
    bucket_width: int = 4096,
):
    """Deterministic weighted sampling by SYSTEMATIC resampling (the
    particle-filter / stratified-mixture classic): lay all rows on the
    cumulative-weight line in ``id_col`` order, drop ``n`` equally
    spaced probes at positions (2j+1)·W/(2n), and give each row one
    copy per probe landing in its [lo, hi) interval. Expected copies
    are exactly n·w/W with variance strictly below multinomial
    sampling, zero RNG state, and — because every formula is integer —
    bit-identical output on any engine and any cluster size. Rows with
    weight > W/n receive multiple copies (upsampling), rows with
    non-positive weight are excluded.

    Returns ``(id_col, weight, n_copies)`` for rows with at least one
    copy; ``sum(n_copies) == n`` always (the probe grid telescopes).

    Scale shape — NO single-partition pass over the data: the global
    prefix sum is two-level. Level 1 groups ids into
    ``bucket_width``-wide ranges and cumsums the per-bucket totals (a
    window over rows/bucket_width rows — tiny); level 2 cumsums within
    each bucket (window PARTITIONED by bucket), then adds the
    broadcast bucket offset. Probe-count arithmetic keeps every
    numerator non-negative so Spark's truncating ``div`` and the
    oracle's flooring ``//`` agree.
    """
    from pyspark.sql import Window

    if n < 1:
        raise ValueError("n must be >= 1")
    if bucket_width < 1:
        raise ValueError("bucket_width must be >= 1")
    base = (
        df.select(
            F.col(id_col).cast("long").alias("__id"),
            F.col(weight_col).cast("long").alias("__w"),
        )
        .where(F.col("__w") > 0)
        .withColumn("__b", F.expr(f"__id div {bucket_width}"))
    )
    bsum = base.groupBy("__b").agg(F.sum("__w").alias("__bw"))
    wb = (
        Window.orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = bsum.select(
        "__b",
        F.coalesce(F.sum("__bw").over(wb), F.lit(0)).alias("__off"),
    )
    total = base.agg(F.sum("__w").alias("__W"))
    wrow = (
        Window.partitionBy("__b")
        .orderBy("__id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # rename before crossing with `total`: in Spark 4 an Aggregate's
    # child attributes stay resolvable as hidden output, so a shared-
    # lineage crossJoin makes bare `__id`/`__w` references ambiguous
    cum = (
        base.join(F.broadcast(offs), "__b")
        .withColumn("__hi", F.col("__off") + F.sum("__w").over(wrow))
        .select(
            F.col("__id").alias("__sid"),
            F.col("__w").alias("__swt"),
            F.col("__hi").alias("__shi"),
            (F.col("__hi") - F.col("__w")).alias("__slo"),
        )
        .crossJoin(F.broadcast(total))
    )
    j_lo = F.expr(f"(2 * {n} * __slo + __W - 1) div (2 * __W)")
    j_hi = F.expr(f"(2 * {n} * __shi + __W - 1) div (2 * __W)")
    return (
        cum.select(
            F.col("__sid").alias(id_col),
            F.col("__swt").alias("weight"),
            (j_hi - j_lo).alias("n_copies"),
        )
        .where(F.col("n_copies") > 0)
    )


def corpus_shuffle(
    df, id_col: str, n_shards: int, salt: str = "shuffle:"
):
    """Deterministic global training-order permutation: every row gets
    ``(shard, pos)`` — its output shard and 0-based rank within that
    shard — derived entirely from a salted content hash. The order is
    reproducible across runs, cluster sizes, and partition layouts
    (unlike ``orderBy(rand())``), and changing the salt gives an
    independent epoch permutation.

    Scale shape: NO global sort. The hash assigns shards uniformly
    (pure projection), then ONE window per shard ranks rows by the full
    128-bit hash (id tie-break for identical hashes) — shard count
    bounds the per-task sort, so the permutation costs one shuffle
    regardless of corpus size. A tokenizer fleet consumes shard files
    in (shard, pos) order for an unbiased stream.
    """
    from pyspark.sql import Window

    key = F.col(id_col)
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    shard = hash_bucket(key, n_shards, salt)
    w = Window.partitionBy("shard").orderBy(F.col("__h"), key)
    return (
        df.withColumn("__h", h)
        .withColumn("shard", shard.cast("int"))
        .withColumn("pos", (F.row_number().over(w) - F.lit(1)).cast("bigint"))
        .drop("__h")
    )


def bottom_k_sample(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    k: int,
    salt: str = "bk:",
) -> DataFrame:
    """Deterministic per-group k-sample: the k rows whose salted md5
    hash is smallest within each group — the MERGEABLE alternative to
    reservoir sampling. Bottom-k sets compose under union (min-k of
    mins), so shard-local samples merge into the exact global sample,
    re-runs and re-partitions reproduce it byte-for-byte, and a new
    ingest batch updates it incrementally (KMV's sample-side twin —
    same idea, keeps the ROWS instead of the hash sketch). The per-
    group inspection sample every 100 TB curation pipeline keeps.

    One hash projection + one per-group TOP-K window (rank, not full
    sort output); ties broken by id. Emits (group_cols..., id, rk).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from pyspark.sql import Window

    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("__h").asc(), F.col(id_col).asc()
    )
    return (
        df.select(*group_cols, F.col(id_col), h.alias("__h"))
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
        .drop("__h")
    )


def weighted_reservoir_sample(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "wrs:",
) -> DataFrame:
    """Deterministic per-group WEIGHTED k-sample without replacement —
    the A-Res scheme of Efraimidis & Spirakis (IPL 2006): each row
    draws ``u = (h + 1) / 2^32`` from the salted md5 of its id
    (u ∈ (0, 1], layout-independent, cross-engine identical) and is
    ranked by the exponential key ``e = -ln(u) / w`` ascending — the
    order statistic of Exp(rate=w) — so the k SMALLEST keys per group
    are a probability-proportional-to-size sample without replacement
    (equivalently the classic ``u^(1/w)`` descending). The mergeable
    weighted twin of :func:`bottom_k_sample`: bottom-k key sets
    compose under union (min-k of mins), so shard-local samples merge
    into the exact global sample, re-runs and re-partitions reproduce
    it byte-for-byte, and a new ingest batch updates it incrementally
    — what A-ExpJ's jump skipping does for a sequential stream, the
    bottom-k formulation does relationally. Rows with non-positive
    weight are excluded (their inclusion probability is 0).

    Emits ``(group_cols..., id, weight, rk)`` — weight as BIGINT, rk
    the 1-based rank. The float key is ORDER-only, never emitted:
    the hashed surface stays integer. Ties (same hash AND same
    weight give bit-equal keys in any IEEE engine) break by id; the
    cross-engine ulp margin of the ln is probed by pytest on the
    fixture (adjacent-key gaps ~1e-3, ~1e13 × libm ulp).

    One hash projection + one per-group TOP-K rank window — no
    shuffle beyond the window's, no driver state, no RNG. 100 TB
    shape: identical to D22 (rank window over |group| rows).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from pyspark.sql import Window

    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    base = df.select(
        *group_cols,
        F.col(id_col),
        F.col(weight_col).cast("bigint").alias("weight"),
        h.alias("__h"),
    ).where(F.col("weight") > 0)
    key = -F.log((F.col("__h") + F.lit(1)) / F.lit(4294967296.0)) / F.col(
        "weight"
    )
    w = Window.partitionBy(*group_cols).orderBy(
        key.asc(), F.col(id_col).asc()
    )
    return (
        base.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
        .drop("__h")
    )


def priority_sample(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "pri:",
) -> DataFrame:
    """Per-group PRIORITY sample — Duffield, Lund & Thorup (JACM
    2007, "Priority sampling for estimation of arbitrary subset
    sums"): the estimation-optimal member of the weighted-sampling
    family next to :func:`weighted_reservoir_sample` (A-Res answers
    "give me a PPS sample"; priority sampling answers "let me
    ESTIMATE any subset sum from k kept rows", with variance no
    worse than the best possible k+1-row scheme — the paper's
    headline theorem).

    Each row draws ``u = (h + 1) / 2^32`` from the salted md5 of its
    id and gets priority ``q = w / u = w · 2^32 / (h + 1)``; the k
    LARGEST priorities per group are kept and the (k+1)-th priority
    becomes the group's threshold τ, carried as the EXACT INTEGER
    pair ``(tau_w, tau_h1)`` (τ = tau_w · 2^32 / tau_h1; groups with
    ≤ k rows get (0, 1): every row kept, estimates exact). The
    subset-sum estimator is ``Σ_{i ∈ sample ∩ S} max(w_i, τ)`` —
    unbiased for ANY subset S fixed in advance (pytest-pinned).

    Determinism is STRONGER than the A-Res ln keys: the ordering
    ratio is (exact int → double) · 2^32 / (exact int → double) —
    every op IEEE exact-rounded (2^32 multiply is a power of two),
    so the priorities are BIT-IDENTICAL in any engine, no libm
    anywhere, no margin argument needed. The emitted surface is all
    integers. Mergeable: top-(k+1)-by-priority sets compose under
    union exactly like bottom-k, so shard samples merge into the
    global sample and a new ingest batch updates it incrementally.

    Emits ``(group_cols..., id, weight, rk, tau_w, tau_h1)``, rk
    1-based by (priority desc, id asc). One hash projection + one
    per-group rank window — the D22/D29 plan, no extra shuffle. NULL
    group keys form a regular group (window semantics): the threshold
    join is NULL-SAFE, so a NULL-keyed group with > k rows gets its
    true τ, not the ≤k-rows (0, 1) sentinel.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from pyspark.sql import Window

    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    base = df.select(
        *group_cols,
        F.col(id_col),
        F.col(weight_col).cast("bigint").alias("weight"),
        (h + F.lit(1)).alias("__h1"),
    ).where(F.col("weight") > 0)
    pri = (
        F.col("weight").cast("double") * F.lit(4294967296.0)
    ) / F.col("__h1").cast("double")
    w = Window.partitionBy(*group_cols).orderBy(
        pri.desc(), F.col(id_col).asc()
    )
    ranked = base.withColumn("rk", F.row_number().over(w).cast("bigint"))
    tau = (
        ranked.filter(F.col("rk") == k + 1)
        .select(
            *group_cols,
            F.col("weight").alias("tau_w"),
            F.col("__h1").alias("tau_h1"),
        )
    )
    kept = ranked.filter(F.col("rk") <= k).drop("__h1")
    if group_cols:
        # NULL-SAFE group join (ADVICE r14): the rank window's
        # partitionBy treats NULL as a regular group, so a NULL-keyed
        # group with > k rows HAS a tau row — a plain equality join
        # would null-reject it and silently hand the group
        # (tau_w, tau_h1) = (0, 1), breaking the unbiased-subset-sum
        # law for exactly that group. eqNullSafe on every group col
        # keeps the window and the join under the same grouping.
        t = tau.select(
            *[F.col(c).alias(f"__t_{c}") for c in group_cols],
            "tau_w",
            "tau_h1",
        )
        cond = None
        for c in group_cols:
            leg = F.col(c).eqNullSafe(F.col(f"__t_{c}"))
            cond = leg if cond is None else (cond & leg)
        joined = kept.join(t, on=cond, how="left").drop(
            *[f"__t_{c}" for c in group_cols]
        )
    else:
        # global sample: constant-key LEFT join (a crossJoin against
        # an EMPTY tau — every row kept — would wipe the result)
        joined = (
            kept.withColumn("__g", F.lit(1))
            .join(
                F.broadcast(tau.withColumn("__g", F.lit(1))), "__g", "left"
            )
            .drop("__g")
        )
    return joined.select(
        *group_cols,
        F.col(id_col),
        F.col("weight"),
        F.col("rk"),
        F.coalesce(F.col("tau_w"), F.lit(0)).cast("bigint").alias("tau_w"),
        F.coalesce(F.col("tau_h1"), F.lit(1)).cast("bigint").alias(
            "tau_h1"
        ),
    )


def release_manifest(
    df: DataFrame,
    bucket_col: str,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Per-bucket release manifest — the audit artifact a corpus
    release ships next to its shards: row count, token count, id
    extent, and an ORDER-INDEPENDENT content fingerprint (bit_xor of
    each row's salted content hash), so two independently-produced
    releases compare shard-by-shard without sorting anything: equal
    fingerprints == identical content sets, any single changed /
    dropped / duplicated-an-even-number-of-times row flips or hides
    in the xor, which is why the row COUNT rides alongside (count +
    xor together catch duplication). One groupBy, all map-side
    combinable; xor never overflows.
    Emits ``(bucket, n_rows, n_tokens, min_id, max_id, fp_xor)``.
    """
    from jane_spark.functions.text import token_count

    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("mf:"),
                    F.col(id_col).cast("string"),
                    F.lit(":"),
                    F.md5(F.col(text_col)),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        df.groupBy(F.col(bucket_col).alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(token_count(F.col(text_col)))
            .cast("bigint")
            .alias("n_tokens"),
            F.min(F.col(id_col)).cast("bigint").alias("min_id"),
            F.max(F.col(id_col)).cast("bigint").alias("max_id"),
            F.bit_xor(h).alias("fp_xor"),
        )
    )


def dsir_select(
    raw,
    target,
    id_col: str,
    text_col: str,
    n: int,
    n_buckets: int = 1024,
    salt: str = "dsir:",
):
    """Data Selection with Importance Resampling (Xie et al. 2023,
    NeurIPS — the DoReMi-adjacent standard for matching a raw web
    corpus to a target domain): fit hashed unigram bucket LMs over the
    TARGET and the RAW corpus, weight every raw document by its
    importance log-ratio, and keep the top ``n``.

    Per-bucket score (add-1 smoothed, centi-log integer):

        score(b) = round(100 · ln( (ct_b+1)/(Ct+B) · (Cr+B)/(cr_b+1) ))

    A document's weight is the SUM of its tokens' bucket scores — pure
    BIGINT once the ≤ B bucket scores are fixed, so the selected set
    is engine-portable. The single float op per bucket (one ln, one
    round) cannot land on an exact half: ln of a positive rational ≠ 1
    is irrational (Lindemann–Weierstrass), so 100·ln(ratio) is never
    exactly k+0.5 — the tie the r10 pmi red taught us to fear is
    mathematically impossible here; cross-libm ulp differences would
    need a near-tie within ~1e-13, margin-probed in pytest. Bucket
    hash is the portable salted-md5 (`hash_bucket`), replayable in any
    engine.

    Emits the selected docs: ``(id, n_tok, weight_c, rank)`` — rank by
    (weight desc, id asc).

    Scale shape: two token-bucket count shuffles (map-side combinable,
    ≤ B rows out), the two scalar totals broadcast, the B-row score
    table broadcast-joined onto ONE raw-corpus token pass, then one
    doc-keyed sum and one top-n (TakeOrdered — no global sort).
    ``n_buckets`` bounds every broadcast; the corpus is scanned twice
    (once for raw counts, once for scoring) and shuffled only by
    doc id.
    """
    from pyspark.sql import Window

    if n < 1:
        raise ValueError("n must be >= 1")
    B = int(n_buckets)

    def bucket_counts(df):
        return (
            df.select(
                F.explode(F.split(F.col(text_col), " ", -1)).alias("tok")
            )
            .select(hash_bucket(F.col("tok"), B, salt).alias("b"))
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    tb = bucket_counts(target).withColumnRenamed("c", "ct")
    rb = bucket_counts(raw).withColumnRenamed("c", "cr")
    # totals named tot_t/tot_r: Spark resolution is case-insensitive,
    # so Ct would collide with the per-bucket ct
    tt = target.select(
        F.explode(F.split(F.col(text_col), " ", -1)).alias("t")
    ).agg(F.count(F.lit(1)).alias("tot_t"))
    rt = raw.select(
        F.explode(F.split(F.col(text_col), " ", -1)).alias("t")
    ).agg(F.count(F.lit(1)).alias("tot_r"))
    scores = (
        rb.join(tb, "b", "full_outer")
        .select(
            "b",
            F.coalesce(F.col("ct"), F.lit(0)).alias("ct"),
            F.coalesce(F.col("cr"), F.lit(0)).alias("cr"),
        )
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(rt))
        .select(
            "b",
            F.round(
                F.lit(100.0)
                * F.log(
                    ((F.col("ct") + 1).cast("double") / (F.col("tot_t") + B))
                    * ((F.col("tot_r") + B).cast("double") / (F.col("cr") + 1))
                ),
                0,
            )
            .cast("bigint")
            .alias("score_c"),
        )
    )
    doc_toks = raw.select(
        F.col(id_col).cast("long").alias("id"),
        F.explode(F.split(F.col(text_col), " ", -1)).alias("tok"),
    ).select("id", hash_bucket(F.col("tok"), B, salt).alias("b"))
    weights = (
        doc_toks.join(F.broadcast(scores), "b")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tok"),
            F.sum("score_c").cast("bigint").alias("weight_c"),
        )
    )
    # TakeOrdered (orderBy+limit), never a global row_number window —
    # the rank is then a window over the n-row selection only
    sel = weights.orderBy(F.col("weight_c").desc(), F.col("id").asc()).limit(n)
    w = Window.orderBy(F.col("weight_c").desc(), F.col("id").asc())
    return sel.withColumn("rank", F.row_number().over(w).cast("int"))


def waterfill_allocation(
    sources,
    source_col: str,
    avail_col: str,
    weight_col: str,
    budget: int,
    max_rounds: int = 22,
):
    """Token-budget WATER-FILLING across sources — the data-mixture
    allocator every training run needs once weights meet reality: a
    source gets its weight-proportional share of the remaining budget
    UNLESS that share exceeds what it has (availability cap), in which
    case it contributes everything and the excess re-distributes over
    the still-unsaturated sources (the classic water-filling /
    progressive-filling allocation; the GPT-3/LLaMA mixture reports
    describe exactly this "weights subject to corpus size" shape).

    Synchronous integer rounds: with remaining budget ``rem`` and
    active weight mass ``W``, round r saturates every active source
    whose floor share ``(rem*w) div W`` meets its availability, pays
    them their full ``avail``, and recurses on the rest; terminal
    round pays floor shares (the ≤|sources|-token floor residue stays
    unallocated — documented, deterministic). All quantities BIGINT,
    every division has non-negative operands (floor == trunc in any
    engine). At most |sources|+1 rounds.

    ``sources`` is the per-source frame (one row per source) —
    collected to the driver for the loop, which is the bounded-collect
    contract (source counts are dozens, not data-scale; the expensive
    part, computing ``avail`` per source, happens distributed BEFORE
    this). Returns a DataFrame ``(source, avail, weight_e4, alloc)``.
    """
    spark = sources.sparkSession
    rows = sources.select(
        F.col(source_col).alias("source"),
        F.col(avail_col).cast("long").alias("avail"),
        F.col(weight_col).cast("long").alias("w"),
    ).collect()
    avail = {r.source: int(r.avail) for r in rows}
    w = {r.source: int(r.w) for r in rows}
    if any(v < 0 for v in avail.values()) or any(v <= 0 for v in w.values()):
        raise ValueError("avail must be >= 0 and weights > 0")
    alloc: dict = {}
    active = sorted(avail)
    rem = int(budget)
    # At most |sources| saturation rounds can occur (each removes >= 1
    # source) before a no-saturation round breaks, so |sources|+1 rounds
    # always suffice — derive the bound from the data rather than trust
    # the caller's max_rounds (which, if too small, would reach the
    # terminal else with still-active capped sources).
    rounds = max(int(max_rounds), len(rows) + 1)
    for _ in range(rounds):
        if not active or rem <= 0:
            for s in active:
                alloc[s] = 0
            break
        W = sum(w[s] for s in active)
        sat = [s for s in active if (rem * w[s]) // W >= avail[s]]
        if not sat:
            for s in active:
                alloc[s] = (rem * w[s]) // W
            break
        for s in sat:
            alloc[s] = avail[s]
            rem -= avail[s]
        active = [s for s in active if s not in sat]
    else:
        # Unreachable with rounds >= |sources|+1 (see above), kept as a
        # defensive terminal payout: cap each floor share at the
        # source's availability so the cap invariant alloc <= avail
        # holds even here (the uncapped share could exceed avail when
        # saturation rounds were cut short).
        W = sum(w[s2] for s2 in active)
        for s in active:
            alloc[s] = min((rem * w[s]) // W, avail[s])
    out = [
        (s, avail[s], w[s], int(alloc.get(s, 0))) for s in sorted(avail)
    ]
    return spark.createDataFrame(
        out, "source string, avail long, weight_e4 long, alloc long"
    )


def hrw_shard(key_expr_sql: str, n_shards: int, salt: str = "hrw:"):
    """Rendezvous (highest-random-weight) shard assignment (Thaler &
    Ravishankar 1996 — the consistent-placement scheme behind cache
    rings and shard maps): ``shard(k) = argmax_s h(k, s)`` over a
    salted per-(key, shard) hash. THE property mod-hashing lacks:
    growing S -> S+1 moves ONLY the keys whose new-shard hash wins
    (~1/(S+1) of them, each moving TO the new shard) — every other
    assignment is untouched, so a reshard re-shuffles 1/(S+1) of a
    100 TB corpus instead of (S-1)/S of it.

    Portable and integer-exact: h = first 15 md5 hex chars (60 bits,
    always a positive BIGINT) of ``salt || key || ':' || shard``; the
    argmax folds over a literal shard sequence in ONE column
    expression (no explode, no window), ties — unobservable at 60
    bits but pinned anyway — break to the SMALLER shard id (strict >
    in the fold keeps the earlier/smaller winner).

    ``key_expr_sql`` is the SQL text of a STRING key expression (a
    column name after a cast — see :func:`hrw_assignments`).

    DuckDB twin fragment (per shard s, then argmax by (h DESC, s))::

        CAST(concat('0x', substr(md5(concat('<salt>',
            CAST(k AS VARCHAR), ':', CAST(s AS VARCHAR))), 1, 15))
            AS BIGINT)
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    hv = (
        f"cast(conv(substring(md5(concat('{salt}', {key_expr_sql}, ':', "
        "cast(i as string))), 1, 15), 16, 10) as bigint)"
    )
    # transform materializes each (hv, s) ONCE, then the fold compares
    # structs — lambda bodies get no common-subexpression elimination,
    # so an IF({hv} > acc.hv, struct({hv}...)) fold would evaluate
    # every md5 twice (2S instead of S hashes/row on the scan-rate-
    # bound assignment path; r12 review)
    return F.expr(
        f"aggregate(transform(sequence(0, {int(n_shards) - 1}), "
        f"i -> struct({hv} as hv, i as s)), "
        "struct(cast(-1 as bigint) as hv, -1 as s), "
        "(acc, e) -> IF(e.hv > acc.hv, e, acc), "
        "acc -> acc.s)"
    )


def hrw_assignments(
    df,
    id_col: str,
    n_shards: int,
    salt: str = "hrw:",
):
    """Frame-level wrapper for :func:`hrw_shard`: returns ``df`` plus a
    ``shard`` column in ``[0, n_shards)`` (the key string is
    materialized under an internal name so the fold body references a
    plain column)."""
    out = df.withColumn("__hrw_key", F.col(id_col).cast("string"))
    return out.withColumn(
        "shard", hrw_shard("__hrw_key", n_shards, salt).cast("int")
    ).drop("__hrw_key")
