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
from pyspark.sql import Column, DataFrame
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
