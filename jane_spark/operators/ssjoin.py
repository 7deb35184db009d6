"""Exact set-similarity self-join via prefix filtering (SURVEY.md
§2.11 K2/K14 family — the EXACT counterpart of the MinHash/SimHash
approximate dedup: all pairs with token-set Jaccard ≥ t, no false
negatives, no all-pairs scan).

Prefix filtering (Chaudhuri et al., "A Primitive Operator for
Similarity Joins"; Xiao et al., PPJoin — public literature): order each
document's distinct tokens by ascending global frequency (rarest
first). If Jaccard(A, B) ≥ t, the two sets must share at least one
token within each other's first ``|X| − ⌈t·|X|⌉ + 1`` tokens — so an
equi-join on PREFIX tokens only finds every qualifying pair while
generating orders of magnitude fewer candidates than a cross join
(rare tokens appear in few prefixes). A length filter
(``t·|A| ≤ |B|``) prunes further before exact verification.

Scale shape: two token-level shuffles (global frequencies, per-doc
arrays), one equi-join keyed on prefix token (rare tokens → small
groups; the frequency ordering is exactly what keeps hot tokens OUT of
prefixes), then row-local array verification. Thresholds are checked in
INTEGER arithmetic (``u·inter ≥ l·union`` for t = l/u) — no float
comparisons anywhere, so results hash identically across engines.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def jaccard_similarity_join(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
) -> DataFrame:
    """All pairs (id_a < id_b) whose distinct-token Jaccard ≥ threshold.

    Returns (id_a, id_b, n_intersect, n_union) — integer columns only;
    compute the ratio downstream if needed. Exact: prefix filtering
    never drops a qualifying pair.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    frac = Fraction(threshold).limit_denominator(1_000_000)
    t_num, t_den = frac.numerator, frac.denominator

    toks = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.array_distinct(F.split(F.lower(F.col(text_col)), " "))
        ).alias("__tok"),
    )
    freq = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__freq"))
    # rarest-first global order; token string tie-break for determinism
    ranked = toks.join(freq, "__tok").withColumn(
        "__rank",
        F.row_number().over(
            Window.partitionBy("__id").orderBy("__freq", "__tok")
        ),
    )
    arrs = ranked.groupBy("__id").agg(
        F.array_sort(
            F.collect_list(F.struct("__rank", "__tok"))
        ).alias("__ranked"),
        F.count(F.lit(1)).alias("__len"),
    ).select(
        "__id",
        F.transform(F.col("__ranked"), lambda s: s["__tok"]).alias("__toks"),
        "__len",
    )
    # prefix length: L - ceil(t*L) + 1, pure-integer ceil
    # (ceil(a/b) = (a + b - 1) div b — float ceil could misround)
    ceil_tl = ((F.col("__len") * t_num + t_den - 1) / t_den).cast("long")
    prefix_len = (F.col("__len") - ceil_tl + 1).cast("int")
    prefixes = arrs.select(
        "__id", "__toks", "__len",
        F.explode(F.slice(F.col("__toks"), 1, prefix_len)).alias("__ptok"),
    )
    left = prefixes.select(
        F.col("__id").alias("id_a"),
        F.col("__toks").alias("__toks_a"),
        F.col("__len").alias("__len_a"),
        "__ptok",
    )
    right = prefixes.select(
        F.col("__id").alias("id_b"),
        F.col("__toks").alias("__toks_b"),
        F.col("__len").alias("__len_b"),
        "__ptok",
    )
    cands = (
        left.join(right, "__ptok")
        .filter(F.col("id_a") < F.col("id_b"))
        # length filter: t·|A| ≤ |B| when |A| ≥ |B| (symmetric) —
        # integer form to avoid float edges
        .filter(
            (F.col("__len_b") * t_den >= F.col("__len_a") * t_num)
            & (F.col("__len_a") * t_den >= F.col("__len_b") * t_num)
        )
        .select("id_a", "id_b", "__toks_a", "__toks_b", "__len_a", "__len_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect(F.col("__toks_a"), F.col("__toks_b")))
    union = F.col("__len_a") + F.col("__len_b") - inter
    return (
        cands.withColumn("n_intersect", inter)
        .withColumn("n_union", union.cast("long"))
        # integer threshold test: inter/union ≥ num/den
        .filter(
            F.col("n_intersect").cast("long") * t_den
            >= F.col("n_union") * t_num
        )
        .select(
            F.col("id_a"), F.col("id_b"),
            F.col("n_intersect").cast("long").alias("n_intersect"),
            "n_union",
        )
        .orderBy("id_a", "id_b")
    )
