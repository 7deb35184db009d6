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
plans O(1) instead of O(rounds). For adversarial chain-shaped graphs
(diameter > ``max_iter``) the solver falls back to the two-phase
large-star/small-star alternation (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14 — public algorithm),
which contracts the graph toward star forests in O(log²) rounds
independent of diameter; label propagation stays the default because
near-dup clusters are dense and shallow (diameter ≲ 3) and one
propagation round is cheaper than a star round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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

    If propagation has not converged after ``max_iter`` rounds (long
    chains: diameter > max_iter), the large-star/small-star fallback
    finishes the job in O(log² n) rounds regardless of diameter.
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

    converged = False
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
            converged = True
            break
        total = new_total
    if not converged:
        return _star_components(e, labels.select("id"))
    return labels


def _symmetrize(pairs: DataFrame) -> DataFrame:
    """Undirected edge set as both directions, self-loops removed."""
    fwd = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    return (
        fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _star_components(e: DataFrame, node_ids: DataFrame) -> DataFrame:
    """Large-star/small-star alternation (Kiveris et al., SoCC'14).

    large-star: every node's strictly-larger neighbors re-attach to the
    minimum of its closed neighborhood; small-star: every node and its
    smaller neighbors attach to that minimum. Alternating the two
    preserves connectivity and reaches a fixed point where every edge
    is (member, component-min) — a star forest — in O(log²) rounds.
    Each half-round is one groupBy + one equi-join on node id: the same
    two-shuffle shape as a propagation round, but diameter-independent.
    """
    s = e  # symmetric, distinct, no self-loops (built by caller)

    def checksum(df: DataFrame) -> tuple:
        canon = df.filter(F.col("src") < F.col("dst"))
        row = canon.agg(
            F.count(F.lit(1)).alias("n"),
            # xor-fold (not sum): order-free and cannot overflow ANSI longs
            F.expr("bit_xor(xxhash64(src, dst))").alias("h"),
        ).first()
        return (row["n"], row["h"])

    prev = checksum(s)
    for _ in range(100):  # safety cap >> the proven O(log^2) bound
        # large-star
        mins = s.groupBy("src").agg(F.min("dst").alias("mn"))
        mm = mins.select("src", F.least(F.col("src"), F.col("mn")).alias("m"))
        large = (
            s.join(mm, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("a"), F.col("m").alias("b"))
        )
        s = _symmetrize(large).localCheckpoint(eager=True)
        # small-star (directed larger -> smaller)
        d = s.filter(F.col("dst") < F.col("src"))
        dmins = d.groupBy("src").agg(F.min("dst").alias("m"))
        small = (
            d.join(dmins, "src")
            .select(F.col("dst").alias("a"), F.col("m").alias("b"))
            .unionByName(
                dmins.select(F.col("src").alias("a"), F.col("m").alias("b"))
            )
        )
        s = _symmetrize(small).localCheckpoint(eager=True)
        cur = checksum(s)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError("star alternation failed to converge in 100 rounds")
    # fixed point: edges are (member, root) stars — comp = min over the
    # closed neighborhood; isolated nodes keep their own id
    lbl = s.groupBy("src").agg(F.min("dst").alias("mn"))
    lbl = lbl.select(
        F.col("src").alias("id"), F.least(F.col("src"), F.col("mn")).alias("comp")
    )
    return node_ids.join(lbl, "id", "left").select(
        "id", F.coalesce(F.col("comp"), F.col("id")).alias("comp")
    )


def cluster_canonical(labels: DataFrame) -> DataFrame:
    """Collapse a component labeling to one row per cluster:
    (comp, n_members) — the keep-list is ``id == comp`` rows."""
    return labels.groupBy("comp").agg(F.count(F.lit(1)).alias("n_members"))


def label_propagation(
    edges: DataFrame, lo: str = "lo", hi: str = "hi", iters: int = 4
) -> DataFrame:
    """Deterministic SYNCHRONOUS label propagation (Raghavan, Albert &
    Kumara 2007 — the near-linear community detector): every node
    starts labeled with its own id; each round, every node adopts the
    most frequent label among its NEIGHBORS PLUS ITSELF (the
    self-vote damps the period-2 oscillation synchronous updates
    suffer on symmetric structures — without it an isolated pair
    swaps labels forever and the smallest dup-cluster never forms;
    ties to the smallest label — the determinism the original's
    random tie-break lacks; synchronous update so the result is
    independent of visit order), for a FIXED ``iters`` rounds. Communities refine connected
    components: K10's components merge everything reachable — one
    boilerplate bridge chains two unrelated dup-clusters into one
    canonical group — while LPA keeps densely-linked cores apart
    (the barbell pytest pins exactly that), which is the right grain
    for choose-one-canonical-doc dedup.

    Plan shape: per round ONE join of the symmetric edge list against
    the |V|-row label table + ONE (node, label) count + ONE argmax
    window — shuffles scale with |E|, never |V|². The loop builds a
    LAZY plan (fixed rounds, no driver data, no action at build), so
    the whole detector is one job; the oracle unrolls the same
    rounds as CTEs.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    both = edges.select(
        F.col(lo).alias("v"), F.col(hi).alias("u")
    ).unionByName(
        edges.select(F.col(hi).alias("v"), F.col(lo).alias("u"))
    )
    nodes = both.select(F.col("v")).distinct()
    # self-vote = a self-loop per node (see docstring)
    sym = both.unionByName(nodes.withColumn("u", F.col("v")))
    labels = nodes.select(F.col("v").alias("node")).withColumn(
        "label", F.col("node")
    )
    for _ in range(iters):
        counts = (
            sym.join(
                labels.select(
                    F.col("node").alias("u"), F.col("label")
                ),
                "u",
            )
            .groupBy("v", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("v").orderBy(
            F.col("c").desc(), F.col("label").asc()
        )
        labels = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("v").alias("node"), "label")
        )
    return labels.select("node", F.col("label").alias("community"))
