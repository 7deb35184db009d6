"""Weighted PageRank in exact integer arithmetic (round 9).

Web-corpus curation ranks DOMAINS by link authority before sampling
(the CommonCrawl/Gopher lineage weights hosts by graph centrality);
clickstream analytics ranks event states by stationary visit mass.
Both are PageRank over an edge table — and both belong in the engine,
not a sidecar graph system, when the edges already live in a
DataFrame.

Determinism design: the classic float iteration is NOT cross-engine
reproducible (group-by float sums are order-dependent). Here every
rank is a BIGINT scaled by 1e9 and every step is integer arithmetic —
``contrib = (rank * w) div out_w``, damping applied as ``(num * x)
div den`` — so addition is associative, iteration order is
irrelevant, and a SQL engine reproduces the ranks BIT-FOR-BIT
(the q_k16_kmeans "unrolled deterministic iteration" precedent,
applied to graphs). Integer-division dust (< 1 unit per edge per
round, i.e. < 1e-9 of mass) leaks out of the total instead of
accumulating into any rank.

Scale shape per iteration: one equi-join of edges against the rank
table on ``src`` (broadcast when the node set is dimension-sized —
domains, event types; shuffle-on-src otherwise, and the edge table's
partitioning is REUSED across iterations since it never changes) plus
one groupBy ``dst`` (map-side combined). The dangling-mass term is a
scalar aggregate per round, same as the components fixpoint's
convergence probe. 5 fixed iterations — rank ordering stabilizes in
3-4 rounds on power-law graphs; fixed count keeps the plan static and
the oracle unrollable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jane_spark.engine.ckpt import persistent_rdd_ids, unpersist_ids

SCALE = 10**9


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    damping: tuple[int, int] = (85, 100),
    iters: int = 5,
) -> DataFrame:
    """Integer-scaled weighted PageRank: ``(node, rank_scaled)`` with
    ``rank_scaled`` summing to ~1e9 (minus deterministic integer-
    division dust). ``damping`` is an exact rational (num, den) —
    (85, 100) is the classic 0.85."""
    num, den = damping
    if not (0 < num < den):
        raise ValueError("damping must be a proper fraction (num, den)")
    if iters < 1:
        raise ValueError("iters must be >= 1")

    spark = edges.sparkSession
    scaffold_pre = persistent_rdd_ids(spark)
    w = (F.lit(1) if weight is None else F.col(weight)).cast("bigint")
    e = (
        edges.select(
            F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w")
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        # checkpoint the aggregated edge table FIRST: everything below
        # (nodes, outw, the per-iteration dangling probe) derives from
        # it, and an unchecked lineage re-runs the upstream corpus-
        # sized edge build once per materialization — measured 7x the
        # whole-graph cost on the TextRank word graph (r10)
        .localCheckpoint(eager=True)
    )
    # lazy mark + the node count as its materializer (the
    # connected_components single-consumer pattern): the count's plan
    # contains the mark exactly once, so there is no concurrent-
    # consumer duplication, and the scaffold costs one action fewer.
    # Every later consumer (ranks init, dangling, per-round joins)
    # reads the already-materialized blocks.
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("edge table is empty: no nodes to rank")
    # outw is consumed exactly twice below (ew build, dangling set) and
    # derives from the CHECKPOINTED e — recomputing that one groupBy
    # inside each consumer is cheaper than an extra eager checkpoint
    # action (r15 optimization round: every eager materialization is a
    # blocking driver round-trip)
    outw = e.groupBy("src").agg(F.sum("w").alias("ow"))
    # ew and dangling as lazy marks: each appears exactly ONCE in the
    # first round's ranks-checkpoint action (inflow's plan holds ew
    # once, dang_row's holds dangling once — disjoint subtrees), so
    # both materialize there without the 6c40351 duplication mode and
    # the scaffold saves two more blocking actions. Rounds 2+ read
    # their materialized blocks.
    ew = e.join(outw, "src").localCheckpoint(eager=False)
    # the dangling-node set (no out-edges) is FIXED across iterations:
    # derive it once instead of re-running the anti-join per round
    dangling = (
        nodes.join(outw, nodes.node == outw.src, "left_anti")
        .select("node")
        .localCheckpoint(eager=False)
    )

    base = ((den - num) * SCALE) // (den * n)
    # scaffolding (e, nodes, ew, dangling) is only needed until the
    # final round's ranks materialize; the returned plan scans the last
    # ranks checkpoint alone (engine.ckpt doc)
    scaffold_ids = persistent_rdd_ids(spark) - scaffold_pre
    pre = persistent_rdd_ids(spark)
    ranks = nodes.select(
        "node", F.lit(SCALE // n).cast("bigint").alias("r")
    ).localCheckpoint(eager=True)
    gen_ids = persistent_rdd_ids(spark) - pre

    for _ in range(iters):
        inflow = (
            ew.join(ranks, ew.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                F.expr("(r * w) div ow").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        # dangling mass IN-PLAN (one-row broadcast) instead of a
        # blocking driver first() per round: the update expression is
        # the same BIGINT arithmetic — sum(r) over the fixed dangling
        # set, div n — evaluated by the engine instead of the driver,
        # so each iteration costs ONE action (the checkpoint) and the
        # driver never stalls on a scalar round-trip (guide §5: the
        # driver should do almost no data work)
        dang_row = (
            ranks.join(dangling, "node", "left_semi")
            .agg(
                F.expr(
                    f"coalesce(sum(r), CAST(0 AS BIGINT)) div {n}"
                ).alias("__dshare")
            )
        )
        pre = persistent_rdd_ids(spark)
        ranks = (
            nodes.join(inflow, "node", "left")
            .crossJoin(F.broadcast(dang_row))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({num} * (coalesce(inflow, CAST(0 AS BIGINT))"
                        f" + __dshare)) div {den}"
                    )
                )
                .cast("bigint")
                .alias("r"),
            )
            .localCheckpoint(eager=True)
        )
        new_ids = persistent_rdd_ids(spark) - pre
        unpersist_ids(spark, gen_ids)  # round r-1's ranks are dead
        gen_ids = new_ids
    unpersist_ids(spark, scaffold_ids)
    return ranks.select("node", F.col("r").alias("rank_scaled"))


def event_transition_edges(events: DataFrame) -> DataFrame:
    """Per-user event-type transition graph from an event log: edge
    (prev_type -> type) with weight = transition count, ordered by
    (ts, event_id) within user. The clickstream Markov chain whose
    PageRank is the stationary visit mass."""
    from pyspark.sql import Window

    win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = events.select(
        F.lag("event_type").over(win).alias("src"),
        F.col("event_type").alias("dst"),
    ).where(F.col("src").isNotNull())
    return tr.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("bigint").alias("w")
    )


def word_adjacency_edges(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Symmetric word co-occurrence graph from adjacent-token pairs
    (TextRank's window-2 graph, Mihalcea & Tarau 2004): edge weight =
    corpus-wide adjacency count, emitted in BOTH directions so the
    directed PageRank walks an undirected graph; self-loops (repeated
    words) dropped. One explode + one groupBy — corpus-sized shuffle
    only on the bigram table, which the vocabulary bounds."""
    toks = F.split(F.col(text_col), " ")
    pairs = docs.select(
        F.explode(
            F.filter(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.greatest(F.size(toks) - 1, F.lit(1)),
                    ),
                    # try_element_at: a 1-token doc generates i=1 with
                    # no i+1 — NULL (filtered below), not an ANSI
                    # out-of-bounds error
                    lambda i: F.struct(
                        F.try_element_at(toks, i).alias("a"),
                        F.try_element_at(toks, i + 1).alias("b"),
                    ),
                ),
                lambda s: (s["a"] != "")
                & (s["b"] != "")
                & s["b"].isNotNull()
                & (s["a"] != s["b"]),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    cnt = pairs.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("w")
    )
    sym = cnt.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "w"
    ).unionByName(
        cnt.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
    )
    return sym.groupBy("src", "dst").agg(F.sum("w").alias("w"))
