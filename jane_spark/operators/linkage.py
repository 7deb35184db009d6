"""Probabilistic record linkage — the Fellegi–Sunter (JASA 1969)
decision model with blocking (round 12).

Entity resolution beyond exact/fuzzy string dedup (K1/K14): two records
describing the SAME real-world entity rarely agree on every field, so
linkage scores a candidate pair by summing per-field log-odds weights —
``log(m_f / u_f)`` for agreement on field f (m = P(agree | match),
u = P(agree | non-match)), a negative ``log((1-m_f)/(1-u_f))`` for
disagreement — and declares a match above a threshold. The classic
production shape (Splink, dedupe.io, hospital/census MDM) is exactly
this: BLOCK to kill the quadratic, score with precomputed integer
weights, threshold, then feed the match pairs to K10's connected
components for cluster resolution.

Engine mapping: blocking is an equi-join on the block key (shuffle on
block, never a cross product — the K14 pigeonhole discipline), each
field weight is one integer CASE expression (whole-stage codegen), and
the decision is a filter. Weights are CENTIBITS (100 x log2 odds,
pre-rounded integers supplied by the caller) so every score is plain
BIGINT arithmetic — no float, no libm, engine-portable. At 100 TB the
only tuning knob that matters is block selectivity; weights are
|fields|-bounded metadata.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# a field comparator: name -> fn(prefix_a, prefix_b) -> integer-weight
# Column in centibits, built from `a_<col>` / `b_<col>` references
FieldWeight = tuple[str, Callable[[str, str], Column]]


def linkage_pairs(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    fields: list[FieldWeight],
    threshold_cb: int,
    probe_partitions: int | None = None,
) -> DataFrame:
    """Fellegi–Sunter linkage over one table (self-linkage / dedup
    framing): candidate pairs share every ``block_cols`` value
    (equi-join; ``id_a < id_b`` kills mirror/self pairs), each field
    in ``fields`` contributes its centibit weight column, and pairs
    with ``w_total >= threshold_cb`` are returned as

    ``(id_a, id_b, w_<field>..., w_total)``.

    Blocking is the scale contract: candidate count is the sum of
    per-block C(n,2), never N² — pick block keys the way K14 picks
    pigeonhole chunks (high selectivity, guaranteed recall for the
    match class you care about; union several blockings for OR-recall).
    All weights integer CASE expressions -> the join + score + filter
    is one codegen stage after the block shuffle.

    NULL semantics: a NULL in any compared field makes that field's
    weight NULL, hence ``w_total`` NULL, hence the pair FAILS the
    threshold filter (SQL three-valued logic) — a pair with missing
    evidence is never declared a match. Give a field an explicit
    missing-level weight (``coalesce`` in its weight fn) to score
    missingness instead of excluding it; rows with a NULL block key
    never enter the candidate set at all (equi-join).

    ``probe_partitions``: optional round-robin repartition of the
    PROBE side before the join. Local fixture parquet is a single row
    group, so when Catalyst picks a broadcast join the probe runs as
    ONE task and the pair scoring serializes (measured 6x at sf0.1);
    a cluster-scale scan is already thousands of tasks, where this
    exchange would be pure waste — leave it None there. No broadcast
    HINT is forced: Catalyst broadcasts the build side while it fits
    the threshold and falls back to a shuffle join beyond it — in the
    shuffle-join regime the join itself re-shuffles the probe (the
    repartition becomes redundant but harmless). Placement never
    affects correctness.
    """
    if not block_cols:
        raise ValueError("block_cols must be non-empty (the quadratic "
                         "guard): blocking IS the linkage scale plan")
    if not fields:
        raise ValueError("fields must be non-empty")
    probe = (
        df.repartition(int(probe_partitions))
        if probe_partitions
        else df
    )
    a = probe.select([F.col(c).alias(f"a_{c}") for c in df.columns])
    b = df.select([F.col(c).alias(f"b_{c}") for c in df.columns])
    cond = reduce(
        Column.__and__,
        [F.col(f"a_{c}") == F.col(f"b_{c}") for c in block_cols]
        + [F.col(f"a_{id_col}") < F.col(f"b_{id_col}")],
    )
    pairs = a.join(b, on=cond)
    weight_cols = [
        fn("a_", "b_").cast("bigint").alias(f"w_{name}")
        for name, fn in fields
    ]
    scored = pairs.select(
        F.col(f"a_{id_col}").alias("id_a"),
        F.col(f"b_{id_col}").alias("id_b"),
        *weight_cols,
    ).withColumn(
        "w_total",
        reduce(
            Column.__add__, [F.col(f"w_{name}") for name, _ in fields]
        ),
    )
    return scored.filter(F.col("w_total") >= int(threshold_cb))
