"""Hashed-feature logistic-regression quality classifier — the public
fastText-style "model-based quality filtering" stage (GPT-3's LR filter
against WebText, DCLM's fastText classifier) reduced to DataFrame math.

Features are the hashing trick (Weinberger et al. 2009): token →
``portable_hash32(token) % dim`` bucket, per-document counts normalized
by document length. The model is plain logistic regression trained by
full-batch gradient descent — deterministic (zero init, fixed
iterations/learning rate, weights rounded to 9 decimals per step so
float shuffle-order noise never compounds, the kmeans_assign precedent).

Distributed shape (the 100 TB plan):
- the feature table ``(doc, bucket, x)`` is built ONCE (explode +
  groupBy keyed on (doc, bucket)) and cached by the caller if iterating;
- each GD step is two bounded shuffles: a doc-keyed aggregate for the
  margins, a bucket-keyed aggregate for the gradient — the gradient
  result is ``dim``-bounded (thousands of rows), so collecting it to
  the driver per step is the same bounded-collect pattern as IVF
  centroid training (operators/vector.py);
- scoring broadcasts the ``dim``-bounded weight table and never
  shuffles the corpus (one doc-keyed aggregate for the margin).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jane_spark.operators.dedup import portable_hash32


def hashed_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 1024,
    binary: bool = False,
) -> DataFrame:
    """``(id, bucket, x)`` hashed bag-of-words rows: lowercase
    whitespace tokens, md5-portable bucket in [0, dim). Default x =
    count normalized by document token count (feature vector sums to
    1); ``binary=True`` gives presence features (x = 1 per active
    bucket) — unit feature scale, which full-batch GD separates on in
    far fewer steps than the ~1/doc_len count features."""
    toks = df.select(
        F.col(id_col),
        F.size(F.split(F.lower(F.col(text_col)), " ")).alias("__n"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("__tok"),
    )
    agg = toks.withColumn(
        "__b", portable_hash32(F.col("__tok")) % dim
    ).groupBy(id_col, "__b")
    x = (
        F.min(F.lit(1.0))
        if binary
        else (F.count(F.lit(1)) / F.first("__n"))
    )
    return agg.agg(x.alias("x")).select(
        F.col(id_col), F.col("__b").alias("bucket"), "x"
    )


def train_logreg(
    feats: DataFrame,
    labels: DataFrame,
    id_col: str,
    label_col: str,
    dim: int = 1024,
    iters: int = 20,
    lr: float = 2.0,
) -> tuple[dict[int, float], float]:
    """Full-batch GD on logistic loss over ``hashed_features`` rows.

    ``labels`` carries ``(id, label)`` with label in {0, 1}. Returns
    ``(weights, bias)`` — a dict over buckets (dim-bounded) plus the
    intercept, both rounded to 9 decimals per step for run-to-run and
    partitioning determinism. Each step runs two shuffles and collects
    only the dim-bounded gradient — never the corpus.
    """
    # the feature-label table feeds every GD step twice — materialize
    # it once instead of re-running tokenize/hash/join per action
    fl = feats.join(labels.select(id_col, label_col), id_col).persist()
    n = fl.select(id_col).distinct().count()
    w: dict[int, float] = {}
    b = 0.0
    spark = feats.sparkSession
    try:
        for _ in range(iters):
            if w:
                wdf = spark.createDataFrame(
                    [(k, v) for k, v in w.items()], "bucket long, w double"
                )
                j = fl.join(F.broadcast(wdf), "bucket", "left").withColumn(
                    "w", F.coalesce(F.col("w"), F.lit(0.0))
                )
            else:
                j = fl.withColumn("w", F.lit(0.0))
            margins = j.groupBy(id_col).agg(
                (F.lit(b) + F.sum(F.col("w") * F.col("x"))).alias("z"),
                F.first(label_col).alias("y"),
            )
            # per-step residual table cached: the margin aggregate runs
            # ONCE, then both the bucket gradient and the bias gradient
            # read it from cache (no lineage re-execution)
            p = margins.withColumn(
                "r",
                F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))) - F.col("y"),
            ).persist()
            try:
                grad = (
                    fl.join(p.select(id_col, "r"), id_col)
                    .groupBy("bucket")
                    .agg(F.sum(F.col("r") * F.col("x")).alias("g"))
                    .collect()
                )
                gb = p.agg(F.sum("r").alias("gb")).collect()[0]["gb"]
            finally:
                p.unpersist()
            for row in grad:
                k = row["bucket"]
                w[k] = round(w.get(k, 0.0) - lr * row["g"] / n, 9)
            b = round(b - lr * gb / n, 9)
    finally:
        fl.unpersist()
    return w, b


def score_logreg(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: dict[int, float],
    bias: float,
    dim: int = 1024,
    binary: bool = False,
    margin: bool = False,
) -> DataFrame:
    """``(id, prob)`` — sigmoid quality score of every document under a
    trained (or fixed) weight table. The weight table is dim-bounded →
    broadcast; the margin is one doc-keyed aggregate over the hashed
    features; the corpus never shuffles on anything else. ``prob`` is
    rounded to 6 decimals (contract convention). ``margin=True``
    returns ``(id, z6)`` — the raw 6dp-rounded margin instead (rank-
    equivalent, transcendental-free)."""
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(int(k), float(v)) for k, v in weights.items()],
        "bucket long, w double",  # explicit: an empty dict (bias-only
        # model) must not fail schema inference
    )
    feats = hashed_features(df, id_col, text_col, dim, binary=binary)
    z = (
        feats.join(F.broadcast(wdf), "bucket", "left")
        .groupBy(id_col)
        .agg(
            (
                F.lit(float(bias))
                + F.sum(F.coalesce(F.col("w"), F.lit(0.0)) * F.col("x"))
            ).alias("z")
        )
    )
    if margin:
        # rank-equivalent raw margin (sigmoid is monotone), rounded to
        # the same 6 dp — rational arithmetic only, no transcendental,
        # so rankers built on it (AUC) avoid the cross-libm tie class
        return z.select(F.col(id_col), F.round(F.col("z"), 6).alias("z6"))
    return z.select(
        F.col(id_col),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))), 6).alias(
            "prob"
        ),
    )


def logreg_reference(
    docs: list[tuple[int, str, int]],
    dim: int = 1024,
    iters: int = 20,
    lr: float = 2.0,
    binary: bool = False,
) -> tuple[dict[int, float], float]:
    """Pure-Python twin of ``train_logreg`` over ``(id, text, label)``
    rows — the test oracle (hash buckets via the same md5 math)."""
    import hashlib

    def bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % dim

    feats: dict[int, dict[int, float]] = {}
    ys: dict[int, int] = {}
    for doc_id, text, y in docs:
        toks = text.lower().split(" ")
        c: dict[int, float] = {}
        for t in toks:
            k = bucket(t)
            c[k] = 1.0 if binary else c.get(k, 0.0) + 1.0 / len(toks)
        feats[doc_id] = c
        ys[doc_id] = y
    n = len(docs)
    w: dict[int, float] = {}
    b = 0.0
    for _ in range(iters):
        gw: dict[int, float] = {}
        gb = 0.0
        for doc_id, c in feats.items():
            z = b + sum(w.get(k, 0.0) * x for k, x in c.items())
            r = 1.0 / (1.0 + math.exp(-z)) - ys[doc_id]
            for k, x in c.items():
                gw[k] = gw.get(k, 0.0) + r * x
            gb += r
        for k, g in gw.items():
            w[k] = round(w.get(k, 0.0) - lr * g / n, 9)
        b = round(b - lr * gb / n, 9)
    return w, b


def rank_auc(
    scored: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Mann–Whitney AUC of a score against a boolean label, computed
    rank-wise and INTEGER-EXACT — the evaluation a pipeline runs to
    ask "does the cheap classifier agree with the expensive gate?"
    (the DCLM/GPT-3 pattern: a fast LR score stands in for a heavy
    quality rule-set; AUC is the agreement metric).

    With average ranks for ties, ``U = R_pos − n_pos(n_pos+1)/2`` and
    ``AUC = U/(n_pos·n_neg)``. Everything doubles to stay integral:
    per distinct score value (ascending, with ``cum_prev`` rows below
    and ``cnt`` rows at the value) each member's doubled average rank
    is ``2·cum_prev + cnt + 1``, so

        u2 = Σ_groups pos·(2·cum_prev + cnt + 1) − n_pos·(n_pos+1)
        auc_e4 = (u2 · 10000) div (2·n_pos·n_neg)

    — one row out, every value BIGINT. Scores land in 1e6 fixed point
    first (one multiply + round; feed a transcendental-free score
    like the LR margin to stay out of the cross-libm tie class).

    Scale shape: one combinable (score, label) count aggregate out of
    the scan (≤ V distinct-score rows), one windowed pass over those V
    rows, one scalar aggregate. V is the sketch knob — at corpus scale
    quantize the score coarser upstream exactly as a production AUC
    monitor buckets its ROC sweep.

    Count-overflow envelope: ``u2`` peaks near ``2·n_pos·n`` and the
    readout multiplies by 10^4, so int64 holds while total row count
    stays under ~1e7; beyond that, compute AUC on a deterministic row
    sample (D22 bottom-k) — it is a rank statistic, a sample estimates
    it — or drop the 1e4 readout and carry the exact (u2, n_pos,
    n_neg) rational. One-class inputs yield auc_e4 NULL (undefined),
    never a divide-by-zero.
    """
    from pyspark.sql import Window

    s = F.round(F.col(score_col) * 1e6, 0).cast("bigint")
    g = (
        scored.select(
            s.alias("s"), F.col(label_col).cast("int").alias("y")
        )
        .groupBy("s")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.sum("y").cast("bigint").alias("pos"),
        )
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    r = g.withColumn(
        "cum_prev", F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("bigint")
    )
    return (
        r.agg(
            F.sum("pos").cast("bigint").alias("n_pos"),
            (F.sum("cnt") - F.sum("pos")).cast("bigint").alias("n_neg"),
            F.sum(
                F.col("pos")
                * (F.lit(2) * F.col("cum_prev") + F.col("cnt") + F.lit(1))
            )
            .cast("bigint")
            .alias("r2_pos"),
        )
        .select(
            "n_pos",
            "n_neg",
            (F.col("r2_pos") - F.col("n_pos") * (F.col("n_pos") + 1))
            .cast("bigint")
            .alias("u2"),
        )
        .withColumn(
            "auc_e4",
            # one-class inputs (gate passes/fails everything) make AUC
            # undefined: NULL, matching the q_k45 oracle's CASE guard —
            # not an ANSI DIVIDE_BY_ZERO crash
            F.expr(
                "CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL "
                "ELSE (u2 * 10000) div (2 * n_pos * n_neg) END"
            ).cast("bigint"),
        )
    )
