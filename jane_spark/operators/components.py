"""Connected components over near-duplicate pair graphs (SURVEY.md §2.11
K2/K10): resolve pair lists (MinHash/SimHash/Jaccard output) into
duplicate CLUSTERS so one canonical document per cluster survives —
the step between "candidate pairs" and "deduped corpus".

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round, labels flow across edges and every node keeps
the minimum seen; fixed point = components (the label is the smallest
doc id in the cluster — a natural canonical-representative choice).

Scale shape: each round is one join + one min-aggregate — two shuffles
on uniformly-hashed ids — and the round count is the largest cluster
DIAMETER, not the corpus size. Near-dup clusters are dense and shallow
(diameter ≲ 3 in practice), so this converges in a handful of rounds.
``localCheckpoint(eager=True)`` truncates lineage each round, keeping
plans O(1) instead of O(rounds). For adversarial chain-shaped graphs at
extreme scale, the two-phase large-star/small-star variant (Kiveris et
al., "Connected Components in MapReduce") halves diameter per round;
not needed for dedup workloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    nodes: DataFrame | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """Return (id, comp) with ``comp`` = min node id reachable from
    ``id``. ``nodes`` (single-column) adds isolated vertices — pass the
    full doc-id set so singletons keep their own component.

    Convergence check: labels only ever decrease, so an unchanged
    ``sum(comp)`` means a fixed point; each round costs one extra
    scalar aggregate, which is noise next to the join.
    """
    e = edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.distinct().localCheckpoint(eager=True)

    if nodes is None:
        labels = e.select(F.col("src").alias("id")).distinct()
    else:
        labels = nodes.select(F.col(nodes.columns[0]).alias("id")).distinct()
    labels = labels.select("id", F.col("id").alias("comp")).localCheckpoint(
        eager=True
    )
    total = labels.agg(F.sum("comp")).first()[0]

    for _ in range(max_iter):
        msgs = e.join(labels, e.src == labels.id).select(
            F.col("dst").alias("id"), "comp"
        )
        new = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        new_total = new.agg(F.sum("comp")).first()[0]
        labels = new
        if new_total == total:
            break
        total = new_total
    return labels


def cluster_canonical(labels: DataFrame) -> DataFrame:
    """Collapse a component labeling to one row per cluster:
    (comp, n_members) — the keep-list is ``id == comp`` rows."""
    return labels.groupBy("comp").agg(F.count(F.lit(1)).alias("n_members"))
