"""Density-based clustering (DBSCAN, Ester et al. KDD'96) over an
embedding column — the clustering complement to SemDeDup's k-means:
no cluster count to pick, arbitrary-shaped clusters, and an explicit
noise lane (exactly what curation wants: "dense semantic regions" for
downsampling, "noise" for manual review).

Spark-first decomposition — every step is an existing relational
operator, so the WHOLE algorithm is oracle-expressible:

1. eps-neighborhood pairs  -> ``embedding_near_pairs`` (cosine >= the
   similarity threshold; ``method="lsh"`` is the 100 TB prefilter —
   near-neighbor pairs rarely split across few hyperplanes);
2. core points             -> one groupBy degree count (>= min_pts,
   count includes the point itself, per the paper);
3. cluster backbone        -> ``connected_components`` over core-core
   edges (min-label propagation, the q_k10 fixpoint);
4. border assignment       -> min component label over a border
   point's core neighbors (deterministic tie-break — the paper leaves
   border ties arbitrary, we pin the smallest label);
5. everything else         -> noise, cluster = -1.

Shuffle shape at scale: the pair join dominates (LSH-bucketed — never
all-pairs); steps 2-4 are keyed shuffles on node id bounded by the
pair count; the components fixpoint converges in O(cluster diameter)
rounds of two shuffles (or the large-star fallback's O(log^2 n)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dbscan(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    sim_threshold: float,
    min_pts: int,
    method: str = "exact",
    n_planes: int = 2,
    n_tables: int = 8,
) -> DataFrame:
    """Cluster rows of ``vectors`` by cosine density: returns
    ``(id_col, cluster, role, n_nbrs)`` — ``cluster`` = smallest core
    id reachable through core-core eps-edges (-1 for noise), ``role``
    in {'core','border','noise'}, ``n_nbrs`` = eps-neighborhood size
    including self. All label arithmetic is integer; the only float is
    the cosine cut, whose fixture margin is pytest-pinned.
    """
    from jane_spark.operators.components import connected_components
    from jane_spark.operators.vector import embedding_near_pairs, gemm_near_pairs

    if min_pts < 1:
        raise ValueError("min_pts must be >= 1")
    if method == "gemm":
        # same exact pair set as method='exact', vectorized: the
        # expression-cosine crossJoin evaluates three interpreted
        # array folds PER PAIR and was measured 10-40x slower (r10)
        pairs = gemm_near_pairs(
            vectors, id_col, vec_col, threshold=sim_threshold
        ).select("a_id", "b_id")
    else:
        pairs = embedding_near_pairs(
            vectors,
            id_col,
            vec_col,
            threshold=sim_threshold,
            method=method,
            n_planes=n_planes,
            n_tables=n_tables,
        ).select("a_id", "b_id")
    sym = pairs.unionByName(
        pairs.select(
            F.col("b_id").alias("a_id"), F.col("a_id").alias("b_id")
        )
        # the symmetric pair table feeds THREE consumers (degree
        # count, core-core edges, border assignment) and the
        # components fixpoint below — materialize once instead of
        # re-running the pair search per consumer (r10: this plus the
        # GEMM path took the sf0.1 DBSCAN from 124 s to seconds)
    ).localCheckpoint(eager=True)
    ids = vectors.select(F.col(id_col).cast("long").alias("id"))
    deg = (
        ids.join(
            sym.groupBy("a_id").agg(
                (F.count(F.lit(1)) + 1).alias("n_nbrs")
            ),
            ids.id == F.col("a_id"),
            "left",
        )
        .select(
            "id",
            F.coalesce(F.col("n_nbrs"), F.lit(1)).cast("bigint").alias(
                "n_nbrs"
            ),
        )
    )
    core = deg.where(F.col("n_nbrs") >= min_pts).select("id")
    core_a = core.select(F.col("id").alias("a_id"))
    core_edges = (
        sym.join(core_a, "a_id")
        .join(core.select(F.col("id").alias("b_id")), "b_id")
        .select("a_id", "b_id")
    )
    labels = connected_components(
        core_edges, "a_id", "b_id", nodes=core
    ).select(F.col("id"), F.col("comp").alias("core_comp"))

    # labels holds CORE nodes only, so joining on b_id both restricts
    # to core neighbors and fetches their component in one go
    border = (
        sym.join(labels.select(F.col("id").alias("b_id"), "core_comp"), "b_id")
        .join(core_a, "a_id", "left_anti")
        .groupBy(F.col("a_id").alias("id"))
        .agg(F.min("core_comp").alias("border_comp"))
    )

    return (
        deg.join(labels, "id", "left")
        .join(border, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(
                F.col("core_comp"), F.col("border_comp"), F.lit(-1)
            )
            .cast("bigint")
            .alias("cluster"),
            F.when(F.col("core_comp").isNotNull(), F.lit("core"))
            .when(F.col("border_comp").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            "n_nbrs",
        )
    )
