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


def asof_join_nearest(
    probe: DataFrame,
    reference: DataFrame,
    key: str,
    ts: str,
    ref_cols: list[str],
    tolerance_us: int | None = None,
    ref_tiebreak: str | None = None,
    suffix: str = "_ref",
) -> DataFrame:
    """Nearest-direction as-of join (pandas ``merge_asof
    direction='nearest'``; the seismology pick-to-event matcher): each
    probe row attaches the reference row minimizing |Δt| within
    ``tolerance_us`` (unbounded when None), preferring the BACKWARD
    candidate on exact |Δt| ties; at equal reference ts the
    ``ref_tiebreak`` maximum wins (``asof_join``'s rule). Adds
    ``dt_us{suffix}`` — signed reference-minus-probe microseconds.
    Probe rows with no candidate in tolerance keep NULLs.

    ONE sorted pass over the key-partitioned union: references are
    first deduped to the max-tiebreak row per (key, ts) — the only row
    either direction could ever pick — then the backward candidate is
    ``last(ref) IGNORE NULLS`` over (unbounded, current) and the
    forward candidate ``first(ref)`` over (current, unbounded), both
    frames sharing one sort. A same-ts reference lands only in the
    backward frame, which is harmless: its Δt is 0 and backward wins
    all ties. No pair explosion, no second shuffle of the union (the
    dedup window runs over the reference side alone).
    """
    from jane_spark.functions.time import ntz_epoch_us

    p0 = probe.withColumn("__us", ntz_epoch_us(F.col(ts)).cast("long"))
    r0 = reference.withColumn("__us", ntz_epoch_us(F.col(ts)).cast("long"))
    if ref_tiebreak is not None:
        if ref_tiebreak not in ref_cols:
            raise ValueError("ref_tiebreak must be one of ref_cols")
        tie_desc = [F.col(ref_tiebreak).desc()]
    else:
        tie_desc = [F.struct(*[F.col(c) for c in ref_cols]).desc()]
    wded = Window.partitionBy(key, "__us").orderBy(*tie_desc)
    r = (
        r0.withColumn("__rn", F.row_number().over(wded))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )

    dtypes = dict(r.dtypes)
    fields = ["__us"] + [c for c in ref_cols if c != "__us"]
    struct_ddl = "struct<" + ",".join(f"{c}:{dtypes[c]}" for c in fields) + ">"
    # ref tag 0 sorts before probe tag 1 at equal ts -> the backward
    # frame (non-strict) sees same-ts references
    p = p0.withColumn("__tag", F.lit(1)).withColumn(
        "__ref", F.lit(None).cast(struct_ddl)
    )
    rr = r.select(
        F.col(key),
        F.col("__us"),
        F.lit(0).alias("__tag"),
        F.struct(*[F.col(c) for c in fields]).alias("__ref"),
    )
    unioned = p.unionByName(rr, allowMissingColumns=True)
    order = [F.col("__us").asc(), F.col("__tag").asc()]
    wb = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = (
        unioned.withColumn(
            "__b", F.last(F.col("__ref"), ignorenulls=True).over(wb)
        )
        .withColumn("__f", F.first(F.col("__ref"), ignorenulls=True).over(wf))
        .filter(F.col("__tag") == 1)
    )

    dt_b = F.col("__us") - F.col("__b.__us")
    dt_f = F.col("__f.__us") - F.col("__us")
    if tolerance_us is not None:
        ok_b = F.col("__b").isNotNull() & (dt_b <= tolerance_us)
        ok_f = F.col("__f").isNotNull() & (dt_f <= tolerance_us)
    else:
        ok_b = F.col("__b").isNotNull()
        ok_f = F.col("__f").isNotNull()
    take_back = ok_b & (~ok_f | (dt_b <= dt_f))
    take_fwd = ok_f & ~take_back

    out = filled
    for c in ref_cols:
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(take_back, F.col(f"__b.{c}"))
            .when(take_fwd, F.col(f"__f.{c}")),
        )
    out = out.withColumn(
        f"dt_us{suffix}",
        F.when(take_back, -dt_b).when(take_fwd, dt_f),
    )
    return out.drop("__us", "__tag", "__ref", "__b", "__f")
