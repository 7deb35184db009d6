"""SemDeDup-style semantic deduplication over embedding columns
(SURVEY.md §2 K north-star, round 6).

Public recipe (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication"): k-means-cluster the corpus
embeddings, then look for near-duplicate pairs ONLY within a cluster —
the cluster bound turns the quadratic pair search into a sum of small
quadratics, which is what makes semantic dedup feasible at 100 TB.

Two pieces, composable:

- ``kmeans_assign`` — a deterministic distributed Lloyd's iteration
  built from DataFrame aggregations (no MLlib dependency, no RNG:
  centroids initialize from the k smallest-id vectors and ties break
  toward the smaller centroid id, so the assignment is reproducible
  across runs and cluster sizes).
- ``semantic_dedup`` — within given clusters, a document is a
  duplicate iff some SMALLER-id member of its cluster has cosine
  similarity >= threshold (greedy keep-first in id order — the
  deterministic analogue of SemDeDup's keep-one-per-ball). Returns
  every id with its verdict, so callers can filter or audit.

Cluster assignment can come from ``kmeans_assign`` or from any
existing label column — the dedup stage is agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jane_spark.functions.arrays import cosine_from_norms, norm


def _sql_double(x: float) -> str:
    """Exact SQL double literal: ``repr(x)`` is the shortest decimal
    that round-trips to the same IEEE-754 double in Python, and SQL's
    string→double cast (Java ``Double.parseDouble``) is correctly
    rounded, so the parsed value is bit-identical to ``F.lit(x)``.
    String form instead of ``F.lit`` because building k×d literal
    arrays element-by-element through py4j costs ~1.4 s per centroid
    table (measured, r15 optimization round) vs ~3 ms for one
    ``F.expr`` string — driver time that REBUILD-class training loops
    pay every Lloyd round."""
    return f"CAST('{x!r}' AS DOUBLE)"


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 5,
) -> tuple[DataFrame, list[list[float]]]:
    """``kmeans_assign`` plus the FITTED centroid matrix (rank-ordered
    by cluster id, each coordinate already rounded 9 dp by the update
    step) — the coarse-quantizer training surface IVF builds on
    (r7: the centroids are the same ones the final assignment used,
    so downstream list assignment is self-consistent)."""
    assign_df, cents = _kmeans_loop(df, id_col, vec_col, k, iters)
    return assign_df, cents


def _kmeans_loop(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    iters: int,
) -> "tuple[DataFrame, list[list[float]]]":
    """Deterministic Lloyd's k-means over an ``array<float>`` column;
    returns ``(id, cluster)``.

    Distributed shape per iteration: assignment is a broadcast of the
    k×d centroid table (tiny) against every row — a narrow map; the
    update is posexplode → groupBy(cluster, dim) mean → rebuild, i.e.
    ONE shuffle whose key cardinality is k×d, independent of corpus
    size. ``iters`` is fixed (no convergence test) so the plan depth is
    static and the result reproducible.

    Driver memory holds only the k×d centroid matrix between
    iterations — the same bounded footprint as IVF training
    (operators/vector.py train_ivf_centroids).
    """
    vecs = df.select(
        F.col(id_col).alias("__id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    )
    # deterministic seeding: the k smallest ids' vectors
    seed_rows = (
        vecs.orderBy("__id").limit(k).select("__id", "__v").collect()
    )
    centroids = [(i, list(r["__v"])) for i, r in enumerate(seed_rows)]

    def assign(cdf: list[tuple[int, list[float]]]) -> DataFrame:
        # argmin squared-L2 with ties toward the smaller centroid id:
        # array_min over (dist, cid) structs compares lexicographically.
        # The whole expression is ONE SQL string (see _sql_double): the
        # k×d centroid literals are the same IEEE doubles F.lit would
        # produce, without the ~1.4 s/round of py4j element calls.
        carr = ",".join(
            "named_struct('cid', %d, 'cv', array(%s))"
            % (cid, ",".join(_sql_double(float(x)) for x in cv))
            for cid, cv in cdf
        )
        dists = (
            f"array_min(transform(array({carr}), c -> named_struct("
            "'dist', aggregate(zip_with(__v, c.cv, (a, b) -> "
            "(a - b) * (a - b)), CAST(0.0 AS DOUBLE), "
            "(acc, x) -> acc + x), 'cid', c.cid))).cid"
        )
        return vecs.withColumn("cluster", F.expr(dists))

    for _ in range(iters):
        assigned = assign(centroids)
        # round the mean to 9 dp: double addition is order-dependent
        # under shuffle, and an unrounded ulp wobble in a centroid could
        # flip a near-tie assignment between runs/partitionings.
        # Collect the (cluster, dim, m) cells directly — k x d rows,
        # driver-sized — and assemble the arrays here instead of paying
        # a SECOND shuffle per round just to collect_list them into
        # arrays engine-side (the train_ivf_centroids collect shape;
        # guide §2.4 remove shuffles outright — one stage fewer per
        # Lloyd round, same avg + round arithmetic, values identical).
        means = (
            assigned.select("cluster", F.posexplode("__v").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.round(F.avg("val"), 9).alias("m"))
            .collect()
        )
        cells: dict[int, dict[int, float]] = {}
        for r in means:
            cells.setdefault(r["cluster"], {})[r["dim"]] = r["m"]
        # empty clusters keep their previous centroid (deterministic);
        # a dim missing from a non-empty cluster's cells (ragged/short
        # input vectors) keeps that coordinate too instead of raising
        # (ADVICE r15 — fixed-dim inputs are unaffected: every cell is
        # present and the .get never falls back)
        centroids = [
            (cid, [cells[cid].get(d, cv[d]) for d in range(len(cv))])
            if cid in cells else (cid, cv)
            for cid, cv in centroids
        ]

    assigned = assign(centroids).select(
        F.col("__id").alias(id_col), F.col("cluster").cast("int").alias("cluster")
    )
    return assigned, [cv for _, cv in centroids]


def kmeans_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 5,
) -> DataFrame:
    """Backwards-compatible assignment-only view of ``_kmeans_loop``
    (docstring above on the loop)."""
    return _kmeans_loop(df, id_col, vec_col, k, iters)[0]


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cluster_col: str,
    threshold: float = 0.95,
) -> DataFrame:
    """Within-cluster near-duplicate verdicts: ``(id, cluster,
    is_dup)`` where ``is_dup`` means some smaller-id same-cluster
    member has ``round(cosine, 6) >= threshold`` (rounding BEFORE the
    compare keeps boundary pairs engine-stable).

    The pair join is an equi-join on the cluster id with an id-order
    band — never a corpus cross product; per-cluster work is bounded
    by the cluster size SemDeDup's k controls. Skewed giant clusters
    are the known failure mode; mitigate upstream with larger k (the
    paper uses k ~ sqrt(n)) before reaching for pair-level salting.
    """
    # norms once per row, not per within-cluster pair (cosine_from_norms)
    a = df.select(
        F.col(cluster_col).alias("__c"),
        F.col(id_col).alias("a_id"),
        F.col(vec_col).alias("a_vec"),
        norm(F.col(vec_col)).alias("a_nrm"),
    )
    b = df.select(
        F.col(cluster_col).alias("__c"),
        F.col(id_col).alias("b_id"),
        F.col(vec_col).alias("b_vec"),
        norm(F.col(vec_col)).alias("b_nrm"),
    )
    dup_ids = (
        a.join(b, "__c")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(
            F.round(
                cosine_from_norms(
                    F.col("a_vec"), F.col("b_vec"), F.col("a_nrm"), F.col("b_nrm")
                ),
                6,
            )
            >= F.lit(threshold)
        )
        .select(F.col("b_id").alias("__dup_id"))
        .distinct()
    )
    return (
        df.join(dup_ids, F.col(id_col) == F.col("__dup_id"), "left")
        .select(
            F.col(id_col),
            F.col(cluster_col).cast("int").alias("cluster"),
            F.col("__dup_id").isNotNull().alias("is_dup"),
        )
    )


def capped_survivors(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cluster_col: str,
    threshold: float = 0.95,
    cap: int = 3,
) -> DataFrame:
    """Cluster-size-CAPPED SemDeDup — the output-mix guard on top of
    ``semantic_dedup``: after within-cluster near-dup removal, keep at
    most ``cap`` survivors per cluster (deterministic id-asc rank), so
    one over-represented semantic region cannot dominate the deduped
    corpus (SemDeDup removes REDUNDANCY but not IMBALANCE — a cluster
    with 10k distinct-but-same-topic docs still emits 10k survivors;
    the cap is the standard mix-control knob layered on it, the
    per-domain-cap q_t23 idea in embedding space).

    Emits ``(id, cluster, rk, n_survivors)`` for kept rows —
    ``n_survivors`` (pre-cap survivor count) stays in the surface so
    the cap's effect is auditable per cluster. One window over the
    survivor table (partitioned by cluster — per-task work is bounded
    by the largest cluster's survivor count, which ``cap``'s upstream
    k-means k already bounds); no new pair work beyond semantic_dedup.
    """
    if cap < 1:
        raise ValueError("cap must be >= 1")
    from pyspark.sql import Window

    verdicts = semantic_dedup(df, id_col, vec_col, cluster_col, threshold)
    surv = verdicts.filter(~F.col("is_dup")).select(id_col, "cluster")
    w = Window.partitionBy("cluster").orderBy(F.col(id_col).asc())
    return (
        surv.withColumn("rk", F.row_number().over(w).cast("int"))
        .withColumn(
            "n_survivors",
            F.count(F.lit(1)).over(Window.partitionBy("cluster")).cast(
                "bigint"
            ),
        )
        .filter(F.col("rk") <= int(cap))
    )
