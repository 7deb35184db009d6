"""As-of resolution (SURVEY.md §2 C7): "which row was in effect at time t".

jane resolves channel epochs / latest document versions in effect at a
query time [ref: fdsnws station epoch matching + Document versioning,
conf=M; SURVEY.md §0 caveat]. OSS Spark has no native as-of join; the
naive translation (range join + argmax) shuffles the *pair explosion*.

This implementation is the sort-based union trick — the scalable form:

1. tag both inputs (probe rows and reference rows), union them;
2. one shuffle: partition by key, sort by (ts, tag) — probes sort
   *before* reference rows at equal ts, giving strict "prior" semantics;
3. ``last(ref_value, ignorenulls)`` over rows unbounded-preceding →
   each probe row sees the most recent earlier reference row;
4. keep probe rows.

Cost: ONE shuffle of |probe| + |ref| rows — no pair blowup, skew bounded
by per-key cardinality. This is how you do an as-of join on 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    reference: DataFrame,
    key: str,
    ts: str,
    ref_cols: list[str],
    strict: bool = True,
    suffix: str = "_ref",
    ref_tiebreak: str | None = None,
) -> DataFrame:
    """For each probe row, attach the latest reference row with
    ``ref.ts < probe.ts`` (strict) or ``<=`` (not strict), per key.

    Probe rows with no prior reference row get NULLs (left semantics).

    Determinism at equal (key, ts) among reference rows: the window
    orders by ``ref_tiebreak`` (ascending — the max tiebreak wins) when
    given, else by the ``ref_cols`` values themselves, so the chosen row
    never depends on partition order (repo total-order rule, cf.
    topk.py). All ``ref_cols`` are filled from ONE packed struct —
    the winner is a single reference ROW, never a per-column mix of
    tied rows with NULLs in different columns (ADVICE r2 chimera case).
    """
    # probe tag 0 sorts first at equal ts when strict (ref not yet seen)
    probe_tag, ref_tag = (0, 1) if strict else (2, 1)
    dtypes = dict(reference.dtypes)
    struct_ddl = "struct<" + ",".join(f"{c}:{dtypes[c]}" for c in ref_cols) + ">"
    p = probe.withColumn("__tag", F.lit(probe_tag)).withColumn(
        "__ref", F.lit(None).cast(struct_ddl)
    )
    r = reference.select(
        F.col(key),
        F.col(ts),
        F.lit(ref_tag).alias("__tag"),
        F.struct(*[F.col(c) for c in ref_cols]).alias("__ref"),
    )
    unioned = p.unionByName(r, allowMissingColumns=True)
    if ref_tiebreak is not None:
        if ref_tiebreak not in ref_cols:
            raise ValueError("ref_tiebreak must be one of ref_cols")
        tie_order = [F.col("__ref").getField(ref_tiebreak).asc()]
    else:
        # struct ordering = field-wise lexicographic over ref_cols
        tie_order = [F.col("__ref").asc()]
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__tag").asc(), *tie_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        "__ref", F.last(F.col("__ref"), ignorenulls=True).over(w)
    )
    out = filled.filter(F.col("__tag") == probe_tag)
    for c in ref_cols:
        out = out.withColumn(f"{c}{suffix}", F.col("__ref").getField(c))
    return out.drop("__tag", "__ref")
