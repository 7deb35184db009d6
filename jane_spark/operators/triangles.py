"""Triangle counting + local clustering coefficient (north-star K10
diagnostics, round 9).

Near-dup pipelines end in a pair graph (MinHash bands, rare-token
blocking, embedding k-NN); its TRIANGLE structure is the standard
health diagnostic — a clean duplicate cluster is near-clique (local
clustering coefficient ~1), while a hub node chaining unrelated docs
through a common boilerplate token shows high degree with low
coefficient. Downstream: cut hub edges before connected components to
stop cluster snowballing.

Algorithm: the classic ordered-edge join enumeration (each triangle
{a<b<c} materializes exactly once as e(a,b) ⋈ e(b,c) ⋈ e(a,c)) —
two shuffle joins on node keys, no all-pairs stage; this is the shape
every distributed triangle count uses (node-iterator-with-ordering,
cf. Suri & Vassilvitskii, WWW 2011). Coefficients are emitted in
integer 1e-4 fixed point so the DuckDB oracle reproduces every cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirect_edges(pairs: DataFrame, a: str, b: str) -> DataFrame:
    """Canonical undirected edge list (lo < hi, distinct) from any pair
    table — self-loops dropped."""
    return (
        pairs.select(
            F.least(F.col(a), F.col(b)).alias("lo"),
            F.greatest(F.col(a), F.col(b)).alias("hi"),
        )
        .where(F.col("lo") < F.col("hi"))
        .distinct()
    )


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Per-node (node, degree, n_tri, cc_e4) over a canonical
    undirected edge list (``lo < hi``, distinct).

    ``n_tri`` = triangles through the node; ``cc_e4`` = local
    clustering coefficient 2·tri/(deg·(deg−1)) in 1e-4 fixed point
    (0 for degree < 2). Only nodes with at least one edge appear.

    Plan shape: triangle enumeration joins the ordered edge list with
    itself twice — shuffles keyed on single node columns, proportional
    to sum of deg² (the wedge count), never |V|². Degree is one
    groupBy over the exploded orientation. At 100 TB-scale graphs the
    wedge join is the canonical bottleneck; cap hub degrees upstream
    (the diagnostic this operator exists to inform).
    """
    e1 = edges.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    e2 = edges.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    e3 = edges.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    tris = e1.join(e2, "b").join(e3, ["a", "c"])

    per_node = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    deg = (
        edges.select(F.explode(F.array("lo", "hi")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("bigint").alias("n_tri"),
            F.when(
                F.col("degree") >= 2,
                F.expr(
                    "(2 * coalesce(n_tri, 0) * 10000)"
                    " div (degree * (degree - 1))"
                ),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("cc_e4"),
        )
    )


def rare_shingle_edges(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 3,
    min_docs: int = 2,
    max_docs: int = 5,
) -> DataFrame:
    """Blocking graph: an edge links two docs sharing a word ``ngram``
    shingle whose document frequency lies in [min_docs, max_docs]. The
    max_docs cap is the scale guard — it bounds each shingle's pair
    fan-out at C(max_docs, 2), so the edge build is a bounded
    self-join on the rare-shingle key (boilerplate shingles generate
    no pairs at all)."""
    from jane_spark.functions.text import shingles

    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(shingles(F.col(text_col), ngram)).alias("tok"),
    ).distinct()
    rare = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .where((F.col("df") >= min_docs) & (F.col("df") <= max_docs))
        .select("tok")
    )
    blocked = toks.join(rare, "tok")
    pairs = blocked.alias("x").join(blocked.alias("y"), "tok").select(
        F.col("x.doc").alias("a"), F.col("y.doc").alias("b")
    )
    return undirect_edges(pairs, "a", "b")
