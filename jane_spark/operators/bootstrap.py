"""Deterministic Poisson bootstrap — error bars for corpus statistics
(round 13).

Every number a 100 TB curation pipeline reports (mean quality score,
per-language token share, dedup rate) is a point estimate; shipping it
without a standard error invites over-reading one-run noise. The
classic scalable answer is the POISSON BOOTSTRAP (the large-scale
approximation of Efron's bootstrap, standard in production A/B
pipelines — Chamandy et al., "Estimating Uncertainty for Massive Data
Streams", Google 2012): resample weight w_r(i) ~ Poisson(1) per row
per replicate, so each replicate is computable in the SAME single
pass as the statistic itself — no resampled copies of the data, no
driver-side RNG state.

Determinism discipline (functions/sampling.py): the Poisson draw
derives from a salted md5 of (replicate, id) through the inverse CDF —
u = (hash+1)/2^32 against FIXED literal cumulative-probability
thresholds. Both engines evaluate the identical rational u and the
identical literals, so every comparison lands identically (no libm
anywhere) and replicate sums are bit-reproducible across runs,
partitionings, and engines.

Why it is right at scale: weights are a pure projection; the replicate
axis is a generated ``stack`` (B terms, whole-stage codegen); ONE
map-side-combinable groupBy emits |keys| x B rows regardless of corpus
size. Var(S_r) = sum(x_i^2) exactly under Poisson(1) weights — the
pytest pins replicate mean == true sum (in expectation) and replicate
variance ~= sum of squares.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# cumulative Poisson(1) CDF, truncated at 7 (P(w>7) < 1e-5); fixed
# public constants — both engines compare the same doubles, so the
# ladder is engine-exact by construction
_POISSON1_CDF = (
    0.36787944117144233,  # P(0)
    0.7357588823428847,   # + P(1)
    0.9196986029286058,   # + P(2)
    0.9810118431238462,   # + P(3)
    0.9963401531726563,   # + P(4)
    0.9994058151824183,   # + P(5)
    0.9999167588507119,   # + P(6)
)


def _u_expr(id_col: str, rep: int, salt: str):
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{salt}:{rep}:"), F.col(id_col).cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    return (h + F.lit(1)) / F.lit(4294967296.0)


def _w_expr(id_col: str, rep: int, salt: str):
    u = _u_expr(id_col, rep, salt)
    w = F.lit(7)
    for k in range(len(_POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    return w.cast("bigint")


def bootstrap_replicates(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    value_col: str,
    n_replicates: int = 16,
    salt: str = "boot",
) -> DataFrame:
    """Per-group Poisson-bootstrap replicate sums: one row per
    ``(keys..., rep)`` with ``(n_rep, sum_rep)`` — the resampled row
    count and resampled value sum, all BIGINT. Downstream, the
    standard error of the group sum is the sample SD of ``sum_rep``
    over replicates (Var(S_r) = sum(x_i^2) exactly); of the mean,
    SD of ``sum_rep / n_rep``. The replicate axis is a generated
    ``stack`` over per-replicate weight projections — B CASE ladders,
    no explode of data values, no RNG, no shuffle beyond the single
    combinable groupBy emitting |keys| x B rows."""
    if n_replicates < 2:
        raise ValueError("need >= 2 replicates")
    base = df.select(
        *keys,
        F.col(id_col).cast("string").alias("__id"),
        F.col(value_col).cast("bigint").alias("__v"),
        *[
            _w_expr(id_col, r, salt).alias(f"__w_{r}")
            for r in range(n_replicates)
        ],
    )
    branches = ", ".join(
        f"{r}, __w_{r}" for r in range(n_replicates)
    )
    long = base.select(
        *keys,
        F.col("__v"),
        F.expr(f"stack({n_replicates}, {branches}) AS (rep, __w)"),
    )
    return (
        long.groupBy(*keys, "rep")
        .agg(
            F.sum("__w").cast("bigint").alias("n_rep"),
            F.sum(F.col("__w") * F.col("__v")).cast("bigint").alias(
                "sum_rep"
            ),
        )
        .select(
            *keys,
            F.col("rep").cast("int").alias("rep"),
            "n_rep",
            "sum_rep",
        )
    )
