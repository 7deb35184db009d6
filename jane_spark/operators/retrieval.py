"""Lexical top-k retrieval (BM25) over the documents table (SURVEY.md
§2.11 K5 family — the reference's document search surface re-expressed
as ranked retrieval; also the decontamination/quality-curation lookup a
training-data pipeline runs against a reference corpus).

BM25 (Robertson & Spärck Jones probabilistic model, the Okapi BM25
formulation — public literature) computed entirely in DataFrame ops:

    score(d, Q) = Σ_{t∈Q} idf(t) · tf(t,d)·(k1+1)
                           / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
    idf(t) = ln( (N − df(t) + 0.5) / (df(t) + 0.5) + 1 )

Scale shape: the token explode is row-local; ``tf`` aggregates only the
query terms (an ``isin`` filter prunes the explode before any shuffle),
``df`` reduces that to one row per query term (broadcast back), and the
only corpus-wide aggregates are the per-doc length and the global
(N, avgdl) scalars — all partial-aggregated map-side. The final top-k
is an orderBy+limit, which Spark executes as TakeOrdered (per-partition
heap + driver merge of k rows), never a full sort-shuffle. No
``collect()``; N/avgdl travel as a broadcast one-row cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for a bag-of-words query, scored with BM25.

    Tokenization is lowercase whitespace split (the engine's K4/K5
    convention — oracle-portable). Returns (id, score) with the score
    rounded to 6 decimals and ties broken by id, so the ranking is
    deterministic across engines and summation orders.
    """
    if not query_terms:
        raise ValueError("bm25_topk: empty query")
    terms = sorted({t.lower() for t in query_terms})
    toks = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("__term"),
    )
    dl = toks.groupBy("__id").agg(F.count(F.lit(1)).alias("__dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("__n"), F.avg("__dl").alias("__avgdl")
    )
    tf = (
        toks.filter(F.col("__term").isin(terms))
        .groupBy("__id", "__term")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    df_ = tf.groupBy("__term").agg(
        F.count_distinct("__id").alias("__df")
    )
    scored = (
        tf.join(F.broadcast(df_), "__term")
        .join(dl, "__id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__idf",
            F.log(
                (F.col("__n") - F.col("__df") + F.lit(0.5))
                / (F.col("__df") + F.lit(0.5))
                + F.lit(1.0)
            ),
        )
        .withColumn(
            "__s",
            F.col("__idf")
            * (F.col("__tf") * F.lit(k1 + 1.0))
            / (
                F.col("__tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("__dl") / F.col("__avgdl")
                )
            ),
        )
        .groupBy("__id")
        .agg(F.round(F.sum("__s"), 6).alias("score"))
    )
    return (
        scored.select(F.col("__id").alias(id_col), "score")
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def rrf_fuse(
    ranked: "list[DataFrame]",
    id_col: str,
    k: int = 60,
    topk: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of candidate lists —
    the standard way to combine lexical (BM25) and dense (embedding)
    retrieval without score calibration:

        rrf(d) = Σ_lists 1 / (k + rank_list(d))

    Each input DataFrame carries ``(id, score)``; ranks are assigned by
    ``(score desc, id asc)`` so fusion is deterministic across engines.
    Returns ``(id, rrf_score, n_lists)`` — the fused top-``topk``.

    Scale shape: RRF operates on CANDIDATE LISTS, which are top-k-bounded
    by construction (each retriever already did its TakeOrdered), so the
    single-partition rank windows here touch ≤ k rows per list — the
    corpus itself was reduced before fusion ever runs. The fuse is one
    tiny union + groupBy.
    """
    if not ranked:
        raise ValueError("rrf_fuse: no candidate lists")
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    parts = [
        df.select(F.col(id_col), F.row_number().over(w).alias("__r"))
        for df in ranked
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy(id_col)
        .agg(
            F.round(F.sum(F.lit(1.0) / (F.lit(k) + F.col("__r"))), 6).alias(
                "rrf_score"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_lists"),
        )
        .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
        .limit(topk)
    )


def phrase_search(
    docs: DataFrame, id_col: str, text_col: str, phrase: str
) -> DataFrame:
    """Exact token-phrase search over a positional inverted index:
    ``(doc_id, n_hits)`` for every document containing the phrase's
    tokens consecutively, counting ALL (including overlapping)
    token-aligned occurrences.

    The distributed shape is the classic positional-postings
    intersection: tokenize once with positions, take the first
    token's postings, and for token i equi-join postings shifted by
    -i on (doc, pos) — each join is keyed, each side pre-filtered to
    ONE token (a selective predicate that pushes into the scan of a
    real postings table), never a substring scan over the corpus.
    The oracle deliberately implements the OTHER obvious algorithm
    (per-document token-array window comparison), so parity checks
    two independent constructions against each other rather than a
    replay.
    """
    toks = phrase.split()
    if not toks:
        raise ValueError("phrase must contain at least one token")
    postings = docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"),
    )
    hits = postings.where(F.col("tok") == toks[0]).select("doc", "pos")
    for i, t in enumerate(toks[1:], start=1):
        nxt = postings.where(F.col("tok") == t).select(
            "doc", (F.col("pos") - i).alias("pos")
        )
        hits = hits.join(nxt, ["doc", "pos"])
    return (
        hits.groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .select(F.col("doc").alias(id_col), "n_hits")
    )
