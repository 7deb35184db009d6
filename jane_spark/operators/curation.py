"""Corpus-curation operators beyond n-gram near-dup: line-level
boilerplate removal, duplicated-substring coverage, and n-gram LM
quality scoring (SURVEY.md §2 K north-star, round 6).

These are the remaining standard stages of a public LLM training-data
pipeline (CCNet, Gopher/MassiveText, RedPajama/Dolma, Lee et al. 2022
"Deduplicating Training Data Makes Language Models Better"):

- ``line_dedup``        — drop lines shared by many documents
  (headers, nav bars, license banners). CCNet deduplicates at the
  paragraph/line level before anything else.
- ``dup_span_coverage`` — per-document fraction of characters covered
  by a character k-gram that occurs more than once in the corpus: the
  scalable n-gram approximation of Lee et al.'s suffix-array
  EXACT-SUBSTRING dedup signal (the suffix array itself does not
  distribute; fixed-width rolling grams shard perfectly).
- ``train_char_lm`` / ``lm_score`` — a character-trigram language
  model trained on a reference slice of the corpus, then used to rank
  every document by mean negative log-likelihood — the CCNet/KenLM
  perplexity-bucket quality signal, reduced to public pure-SQL math.

Every stage is built-in-function DataFrame code (higher-order
expressions for the row-local gram/line explode, hash groupBys for the
corpus-wide counts): no UDFs, no driver collects, no cross joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ------------------------------------------------------- line-level dedup


def lines_of(text: Column, sep: str = "\n") -> Column:
    """Split a document into its dedup units (lines/paragraphs)."""
    return F.split(text, sep)


def line_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
    max_df: int = 3,
) -> DataFrame:
    """CCNet-style line-level boilerplate removal.

    A line appearing in more than ``max_df`` DISTINCT documents is
    boilerplate (site chrome, banners, headers); every occurrence is
    dropped and the surviving lines are reassembled in original order.
    Documents are kept total — a fully-boilerplate document survives
    with empty ``clean_text`` (filtering is the caller's policy call).

    Returns one row per input document:
    ``(id, clean_text, n_lines, n_kept, removed_frac)``.

    Distributed shape (the 100 TB plan):
      1. row-local split + posexplode — narrow;
      2. line document-frequency: groupBy(line) with map-side partial
         ``count(distinct id)`` — one shuffle keyed on the line text
         (heavy-hitter lines are exactly what partial aggregation
         collapses best);
      3. boilerplate set is the df > max_df tail — small by
         construction, so the anti-join back to the exploded stream is
         broadcastable (AQE picks it up at runtime);
      4. reassembly: groupBy(id) + ``array_sort(collect_list(
         struct(pos, line)))`` — order restored from the carried
         position, never from shuffle order.
    """
    lined = df.select(
        F.col(id_col),
        F.posexplode(lines_of(F.col(text_col), sep)).alias("__pos", "__line"),
    )
    boiler = (
        lined.groupBy("__line")
        .agg(F.count_distinct(F.col(id_col)).alias("__df"))
        .filter(F.col("__df") > max_df)
        .select("__line")
    )
    kept = lined.join(boiler, "__line", "left_anti")
    totals = lined.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_lines"))
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda s: s["__line"],
            ),
        ).alias("clean_text"),
    )
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.col("n_lines"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
            F.round(
                (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0)))
                / F.col("n_lines").cast("double"),
                4,
            ).alias("removed_frac"),
        )
    )


# ---------------------------------------------------- C4-style line policy


def policy_line_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
    min_words: int = 3,
    max_line_chars: int = 2000,
    blocklist: list[str] | None = None,
    terminal_chars: str | None = None,
    min_kept_lines: int = 1,
) -> DataFrame:
    """C4-style per-line policy filtering (Raffel et al. 2020 §2.2).

    Unlike ``line_dedup`` (a corpus-wide signal), every C4 rule is a
    function of the line alone, so the whole stage is row-local
    higher-order expressions — ZERO shuffles, a pure projection that
    scales with the scan. A line is kept iff ALL of:

    - it has at least ``min_words`` whitespace words;
    - it is at most ``max_line_chars`` characters;
    - none of its words is in ``blocklist`` (C4's "bad words" /
      "javascript" / lorem-ipsum rules);
    - if ``terminal_chars`` is given, its last character is one of them
      (C4's terminal-punctuation rule; None disables — corpora without
      sentence punctuation would drop everything).

    Returns one row per document, total:
    ``(id, clean_text, n_lines, n_kept, kept_frac, doc_keep)`` where
    ``doc_keep`` applies the document-level rule
    ``n_kept >= min_kept_lines`` (C4 keeps only docs with >= 3
    sentences) — a flag, not a filter, so the caller owns the policy.
    """
    block = F.array(*[F.lit(w) for w in (blocklist or [])])
    lines = lines_of(F.col(text_col), sep)

    def keep(line: Column) -> Column:
        # \s+ split: runs of spaces/tabs count as ONE separator, so
        # "a    b" is 2 words (a single-space split would count 5)
        words = F.filter(
            F.split(line, r"\s+"), lambda wrd: wrd != F.lit("")
        )
        cond = (F.size(words) >= F.lit(min_words)) & (
            F.length(line) <= F.lit(max_line_chars)
        )
        if blocklist:
            cond = cond & ~F.arrays_overlap(words, block)
        if terminal_chars is not None:
            cond = cond & F.substring(line, -1, 1).isin(list(terminal_chars))
        return cond

    kept = F.filter(lines, keep)
    n_lines = F.size(lines)
    n_kept = F.size(kept)
    return df.select(
        F.col(id_col),
        F.concat_ws(sep, kept).alias("clean_text"),
        n_lines.cast("bigint").alias("n_lines"),
        n_kept.cast("bigint").alias("n_kept"),
        F.round(n_kept / n_lines.cast("double"), 4).alias("kept_frac"),
        (n_kept >= F.lit(min_kept_lines)).alias("doc_keep"),
    )


# ------------------------------------------- duplicated-substring coverage


def _gram_key(gram: Column) -> Column:
    """Portable 60-bit gram key: identical math in Spark and DuckDB
    (``CAST('0x' || substr(md5(g),1,15) AS BIGINT)``), so the oracle
    reproduces the exact shuffle key. 60 bits keeps birthday collisions
    negligible at billions of grams while halving shuffle width vs the
    raw k-char string; swap in ``xxhash64`` when cross-engine
    portability stops mattering."""
    return F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("bigint")


def dup_span_coverage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 30,
) -> DataFrame:
    """Per-document duplicated-substring coverage — the n-gram
    approximation of Lee et al. 2022's exact-substring dedup signal.

    Every character position starts a k-gram; a gram whose corpus-wide
    occurrence count is >= 2 (anywhere, including the same document) is
    *duplicated*; the duplicated spans ``[pos, pos+k)`` are merged per
    document (classic running-max interval coalescing — the same shape
    as the D6 gap detector) and the covered-character fraction
    returned: ``(id, n_chars, covered_chars, dup_frac)``.

    Distributed shape: gram extraction is a row-local higher-order
    expression (sequence + transform + substr); the corpus count is ONE
    groupBy on a 60-bit gram key (map-side partials carry (key, count)
    only); the semi-join back is key-equi; the interval merge is one
    window per document. Linear in corpus size, no quadratic stage —
    which is precisely why this replaces a suffix array at 100 TB.
    """
    t = F.col(text_col)
    # sequence(1, 0) counts DOWN in Spark (same guard as text.shingles):
    # docs shorter than k contribute no grams, explicitly.
    arr = F.when(
        F.length(t) >= k,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - F.lit(k - 1)),
            lambda i: F.struct(
                i.alias("pos"), _gram_key(F.substr(t, i, F.lit(k))).alias("gk")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,gk:bigint>>"))
    grams = df.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        F.explode(arr).alias("g"),
    ).select(id_col, "n_chars", F.col("g.pos").alias("pos"), F.col("g.gk").alias("gk"))
    dup_keys = (
        grams.groupBy("gk")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("gk")
    )
    dup_pos = grams.join(dup_keys, "gk", "left_semi")
    # interval coalescing: a position opens a new span iff it starts
    # beyond everything covered so far (running max of span ends).
    w = Window.partitionBy(id_col).orderBy("pos")
    spans = (
        dup_pos.withColumn("end", F.col("pos") + F.lit(k - 1))
        .withColumn(
            "prev_cover",
            F.max("end").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        )
        .withColumn(
            "covered_new",
            F.when(
                F.col("prev_cover").isNull(), F.col("end") - F.col("pos") + 1
            ).otherwise(
                F.greatest(F.col("end") - F.col("prev_cover"), F.lit(0))
            ),
        )
    )
    per_doc = spans.groupBy(id_col, "n_chars").agg(
        F.sum("covered_new").cast("bigint").alias("covered_chars")
    )
    base = df.select(F.col(id_col), F.length(t).alias("n_chars"))
    return (
        base.join(per_doc.drop("n_chars"), id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.coalesce(F.col("covered_chars"), F.lit(0))
            .cast("bigint")
            .alias("covered_chars"),
            F.round(
                F.coalesce(F.col("covered_chars"), F.lit(0))
                / F.col("n_chars").cast("double"),
                4,
            ).alias("dup_frac"),
        )
    )


def exact_dup_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 30,
    min_len: int | None = None,
    max_gram_count: int | None = None,
    fanout_guard: int | None = 1000,
) -> DataFrame:
    """MAXIMAL exact duplicated substrings at SPAN granularity — the
    TRUE Lee et al. 2022 criterion that :func:`dup_span_coverage` /
    :func:`dup_span_removal` approximate with per-position k-gram
    coverage: for every pair of text locations sharing a duplicated
    run, emit the maximal common substring itself — (both documents,
    both offsets, exact length, content witness) — not just "this
    position is covered".

    The suffix-array step of the paper becomes a DIAGONAL-RUN
    argument, fully relational: anchor every position's k-gram
    (portable 60-bit key, the T12 scan), equi-join duplicated keys
    into matching position pairs, and observe that within one
    (doc_a, doc_b, diagonal = pos_a − pos_b) group, a maximal common
    substring of length L ≥ k is EXACTLY a run of consecutive
    anchors (positions s … s+L−k): every interior position anchors,
    and an anchor at s−1 or s+L−k+1 would contradict maximality. So
    sessionize anchors per diagonal (the D6/I4 lag-break coalescer)
    and each run [s, e] IS the maximal span [s, e+k−1] — no
    character-by-character extension, no suffix array, exact spans.

    Emits ``(a_id, b_id, a_start, b_start, span_len, span_md5)`` per
    maximal duplicated span pair with span_len >= ``min_len``
    (default k); same-document repeats pair (id, id) with
    a_start < b_start. ``span_md5`` hashes the a-side substring —
    the b-side hashes identically (pytest-pinned law; a 60-bit
    anchor-key collision inside a run is the same negligible
    acceptance T12 documents).

    Scale shape: gram scan + ONE count groupBy (map-side partials);
    the pair join fans out C(cnt, 2) per duplicated key — bounded by
    ``max_gram_count`` when set (the K28 rare-shingle blocking move;
    grams above the cap are EXCLUDED and their spans unreported —
    set it deliberately at boilerplate-heavy corpora, or run T12
    coverage first to find them); one lag-break window per
    (doc_a, doc_b, diagonal); one join back for the witness. No
    quadratic stage, no Python.

    Cap semantics, made exact (ADVICE r14): an over-cap gram INSIDE a
    run would fragment it into pieces that are NOT maximal spans — so
    when ``max_gram_count`` is set, any run whose boundary-adjacent
    positions (either document, same diagonal) anchor an over-cap
    gram is DROPPED too (one extra semi-join, only in the capped
    path): every emitted span is genuinely maximal, and the cap's
    exclusion is over-cap grams plus runs touching them — loud in the
    docs, never a silently-fragmented "maximal" span. And forgetting
    the cap cannot silently explode (VERDICT r14 "what's wrong #2"):
    with ``max_gram_count=None``, the plan raises at execution if any
    duplicated gram's count exceeds ``fanout_guard`` (default 1000 ≈
    500k pairs for that one gram) — pass an explicit cap, or
    ``fanout_guard=None`` to deliberately accept uncapped C(cnt, 2).
    """
    runs = _exact_span_runs(
        df, id_col, text_col, k, min_len, max_gram_count, fanout_guard
    )
    witness = df.select(
        F.col(id_col).alias("a_id"), F.col(text_col).alias("__t")
    )
    return (
        runs.join(witness, "a_id")
        .select(
            F.col("a_id").cast("long").alias("a_id"),
            F.col("b_id").cast("long").alias("b_id"),
            F.col("a_start").cast("int").alias("a_start"),
            F.col("b_start").cast("int").alias("b_start"),
            F.col("span_len").cast("int").alias("span_len"),
            F.md5(
                F.substr(F.col("__t"), F.col("a_start"), F.col("span_len"))
            ).alias("span_md5"),
        )
    )


def _exact_span_runs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    min_len: int | None,
    max_gram_count: int | None,
    fanout_guard: int | None,
) -> DataFrame:
    """Shared core of :func:`exact_dup_spans` (adds the md5 witness) and
    :func:`exact_span_removal` (cuts the spans): maximal duplicated-run
    table ``(a_id, b_id, a_start, b_start, span_len)``, uncast."""
    if k < 2:
        raise ValueError("k must be >= 2: single-char anchors make every "
                         "repeated character a duplicated 'span'")
    if max_gram_count is not None and max_gram_count < 2:
        raise ValueError("max_gram_count < 2 excludes every duplicated "
                         "gram — nothing could ever be reported")
    if min_len is None:
        min_len = k
    if min_len < k:
        raise ValueError(f"min_len {min_len} < k {k}: sub-anchor spans "
                         "cannot be detected — lower k instead")
    t = F.col(text_col)
    arr = F.when(
        F.length(t) >= k,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - F.lit(k - 1)),
            lambda i: F.struct(
                i.alias("pos"), _gram_key(F.substr(t, i, F.lit(k))).alias("gk")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,gk:bigint>>"))
    grams = df.select(
        F.col(id_col).alias("__id"), F.explode(arr).alias("g")
    ).select("__id", F.col("g.pos").alias("pos"), F.col("g.gk").alias("gk"))
    cnt = grams.groupBy("gk").agg(F.count(F.lit(1)).alias("cnt"))
    keep = cnt.filter(F.col("cnt") >= 2)
    capped_pos = None
    if max_gram_count is not None:
        capped_pos = grams.join(
            keep.filter(F.col("cnt") > max_gram_count).select("gk"),
            "gk",
            "left_semi",
        ).select(F.col("__id").alias("cp_id"), F.col("pos").alias("cp_pos"))
        keep = keep.filter(F.col("cnt") <= max_gram_count)
    elif fanout_guard is not None:
        if fanout_guard < 2:
            raise ValueError("fanout_guard < 2 would reject every "
                             "duplicated gram — set max_gram_count instead")
        # fail-loud fan-out guard, fused into the key column so column
        # pruning cannot elide it: an over-guard gram poisons the plan
        # at execution instead of silently fanning out C(cnt, 2) pairs
        keep = keep.select(
            F.when(F.col("cnt") <= fanout_guard, F.col("gk"))
            .otherwise(
                F.expr(
                    "raise_error(concat('exact_dup_spans: a duplicated "
                    f"{k}-gram occurs ', cast(cnt as string), ' times "
                    f"(> fanout_guard={fanout_guard}) — C(cnt, 2) pair "
                    "fan-out on a boilerplate-heavy corpus; set "
                    "max_gram_count deliberately, or fanout_guard=None "
                    "to accept the cost'))"
                ).cast("bigint")
            )
            .alias("gk"),
            "cnt",
        )
    anchors = grams.join(keep.select("gk"), "gk", "left_semi")
    a = anchors.select(
        F.col("gk"),
        F.col("__id").alias("a_id"),
        F.col("pos").alias("a_pos"),
    )
    b = anchors.select(
        F.col("gk"),
        F.col("__id").alias("b_id"),
        F.col("pos").alias("b_pos"),
    )
    pairs = a.join(b, "gk").filter(
        (F.col("a_id") < F.col("b_id"))
        | ((F.col("a_id") == F.col("b_id")) & (F.col("a_pos") < F.col("b_pos")))
    ).select(
        "a_id", "b_id", "a_pos",
        (F.col("a_pos") - F.col("b_pos")).alias("diag"),
    ).distinct()
    w = Window.partitionBy("a_id", "b_id", "diag").orderBy("a_pos")
    runs = (
        pairs.withColumn("__lag", F.lag("a_pos").over(w))
        .withColumn(
            "__brk",
            F.when(
                F.col("__lag").isNull()
                | (F.col("a_pos") - F.col("__lag") > 1),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "__run",
            F.sum("__brk").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("a_id", "b_id", "diag", "__run")
        .agg(F.min("a_pos").alias("a_start"), F.max("a_pos").alias("__e"))
    )
    if capped_pos is not None:
        # maximality repair under the cap (ADVICE r14): an over-cap
        # gram adjacent to a run's boundary means the run MIGHT extend
        # through excluded anchors — such fragments are not provably
        # maximal, so drop any run whose boundary-adjacent position on
        # either document (same diagonal) anchors an over-cap gram
        bnd = runs.select(
            "a_id",
            "b_id",
            "diag",
            "a_start",
            F.explode(
                F.array(
                    F.struct(
                        F.col("a_id").alias("d"),
                        (F.col("a_start") - 1).alias("p"),
                    ),
                    F.struct(
                        F.col("a_id").alias("d"),
                        (F.col("__e") + 1).alias("p"),
                    ),
                    F.struct(
                        F.col("b_id").alias("d"),
                        (F.col("a_start") - F.col("diag") - 1).alias("p"),
                    ),
                    F.struct(
                        F.col("b_id").alias("d"),
                        (F.col("__e") - F.col("diag") + 1).alias("p"),
                    ),
                )
            ).alias("bp"),
        )
        touching = (
            bnd.join(
                capped_pos,
                (F.col("bp.d") == F.col("cp_id"))
                & (F.col("bp.p") == F.col("cp_pos")),
                "left_semi",
            )
            .select("a_id", "b_id", "diag", "a_start")
            .distinct()
        )
        runs = runs.join(
            touching, ["a_id", "b_id", "diag", "a_start"], "left_anti"
        )
    return runs.select(
        "a_id",
        "b_id",
        F.col("a_start"),
        (F.col("a_start") - F.col("diag")).alias("b_start"),
        (F.col("__e") - F.col("a_start") + F.lit(k)).alias("span_len"),
    ).filter(F.col("span_len") >= min_len)


def exact_span_removal(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 15,
    min_len: int | None = None,
    max_gram_count: int | None = None,
    fanout_guard: int | None = 1000,
) -> DataFrame:
    """CUT every maximal duplicated span from every document — the
    edit step of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better", §3: remove substrings of length >=
    threshold that occur more than once) at :func:`exact_dup_spans`'
    SPAN granularity. :func:`dup_span_removal` (T21) cuts per-position
    k-gram COVERAGE — its removal length threshold IS its anchor
    size, so detecting with small robust anchors while only removing
    LONG duplications is inexpressible there. Here the two are
    decoupled: anchors are k-grams (small k survives near-boundary
    noise), the removal criterion is ``min_len`` — exactly the
    paper's "duplicated substring of >= 50 chars" with k << 50.

    Every occurrence of every maximal span (BOTH sides of each run
    pair, same-document repeats included) becomes a removal interval
    on its document; intervals merge when overlapping or touching
    (the T21 coalescing convention), and each document is reassembled
    from the text between its merged intervals — no second gram scan,
    one row-local ``aggregate`` stitch.

    Emits one row per input document, total: ``(id, clean_text,
    n_chars_clean, removed_chars, n_spans)`` — ``n_spans`` counts the
    MERGED removal intervals. Laws (pytest-pinned): byte-exact
    reconstruction against a brute-force maximal-common-substring
    scan; with ``min_len == k`` the removed positions coincide with
    :func:`dup_span_removal`'s per-position coverage, so
    ``removed_chars`` agrees per document.

    Scale shape: the `_exact_span_runs` core (gram scan + ONE count
    groupBy + diagonal sessionization, C(cnt, 2) bounded by
    ``max_gram_count`` / guarded by ``fanout_guard``) plus one
    interval-merge window per document and the row-local stitch —
    the same inventory T21 pays, one extra union projection.
    """
    runs = _exact_span_runs(
        df, id_col, text_col, k, min_len, max_gram_count, fanout_guard
    )
    occ = (
        runs.select(
            F.col("a_id").alias("__id"),
            F.col("a_start").alias("s"),
            (F.col("a_start") + F.col("span_len") - 1).alias("e"),
        )
        .unionByName(
            runs.select(
                F.col("b_id").alias("__id"),
                F.col("b_start").alias("s"),
                (F.col("b_start") + F.col("span_len") - 1).alias("e"),
            )
        )
        .distinct()
    )
    w = Window.partitionBy("__id").orderBy("s", "e")
    marked = (
        occ.withColumn(
            "prev_cover",
            F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        )
        .withColumn(
            "new_span",
            (
                F.col("prev_cover").isNull()
                | (F.col("s") > F.col("prev_cover") + 1)
            ).cast("int"),
        )
        .withColumn("span_id", F.sum("new_span").over(w))
    )
    spans = marked.groupBy("__id", "span_id").agg(
        F.min("s").alias("s"), F.max("e").alias("e")
    )
    per_doc = spans.groupBy("__id").agg(
        F.array_sort(F.collect_list(F.struct("s", "e"))).alias("sp"),
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
    )
    joined = df.select(
        F.col(id_col).alias("__id"), F.col(text_col).alias("__t")
    ).join(per_doc, "__id", "left")
    txt = F.col("__t")
    stitched = F.aggregate(
        F.col("sp"),
        F.struct(F.lit("").alias("o"), F.lit(1).alias("c")),
        lambda a, x: F.struct(
            F.concat(a["o"], F.substr(txt, a["c"], x["s"] - a["c"])).alias(
                "o"
            ),
            (x["e"] + F.lit(1)).alias("c"),
        ),
        lambda a: F.concat(
            a["o"], F.substr(txt, a["c"], F.length(txt) - a["c"] + 1)
        ),
    )
    clean = F.when(F.col("sp").isNull(), txt).otherwise(stitched)
    return joined.select(
        F.col("__id").alias(id_col),
        clean.alias("clean_text"),
        F.length(clean).cast("bigint").alias("n_chars_clean"),
        (F.length(txt) - F.length(clean)).cast("bigint").alias(
            "removed_chars"
        ),
        F.coalesce(F.col("n_spans"), F.lit(0)).cast("bigint").alias(
            "n_spans"
        ),
    )


def dup_span_removal(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 30,
) -> DataFrame:
    """CUT every duplicated span from every document — the removal step
    of Lee et al. 2022 exact-substring dedup (``dup_span_coverage``
    measures; this edits). A character position is duplicated when its
    k-gram occurs >= 2 times corpus-wide; duplicated positions merge
    into maximal covered runs (adjacent runs coalesce) and each
    document is reassembled from the text BETWEEN its runs.

    Returns one row per input document, total:
    ``(id, clean_text, n_chars_clean, removed_chars, n_spans)`` with
    ``removed_chars`` equal by construction to ``dup_span_coverage``'s
    ``covered_chars`` (pytest-pinned).

    Distributed shape: identical to the coverage pass (row-local gram
    extraction, ONE 60-bit-key groupBy, a semi-join, one window) plus a
    per-document span fold — the spans array is bounded by
    n_chars/k, and the reassembly is a row-local ``aggregate`` over
    it (sequential substring stitching, no explode of the text).
    """
    t = F.col(text_col)
    arr = F.when(
        F.length(t) >= k,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - F.lit(k - 1)),
            lambda i: F.struct(
                i.alias("pos"), _gram_key(F.substr(t, i, F.lit(k))).alias("gk")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,gk:bigint>>"))
    grams = df.select(F.col(id_col), F.explode(arr).alias("g")).select(
        id_col, F.col("g.pos").alias("pos"), F.col("g.gk").alias("gk")
    )
    dup_keys = (
        grams.groupBy("gk")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("gk")
    )
    dup_pos = grams.join(dup_keys, "gk", "left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    marked = (
        dup_pos.withColumn("end", F.col("pos") + F.lit(k - 1))
        .withColumn(
            "prev_cover",
            F.max("end").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        )
        # adjacent covered runs coalesce: a new span starts only past
        # prev_cover + 1 (strictly disjoint, non-touching)
        .withColumn(
            "new_span",
            (
                F.col("prev_cover").isNull()
                | (F.col("pos") > F.col("prev_cover") + 1)
            ).cast("int"),
        )
        .withColumn("span_id", F.sum("new_span").over(w))
    )
    spans = marked.groupBy(id_col, "span_id").agg(
        F.min("pos").alias("s"), F.max("end").alias("e")
    )
    per_doc = spans.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct("s", "e"))).alias("sp"),
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
    )
    joined = df.select(F.col(id_col), t.alias("__t")).join(
        per_doc, id_col, "left"
    )
    txt = F.col("__t")
    stitched = F.aggregate(
        F.col("sp"),
        F.struct(F.lit("").alias("o"), F.lit(1).alias("c")),
        lambda a, x: F.struct(
            F.concat(a["o"], F.substr(txt, a["c"], x["s"] - a["c"])).alias(
                "o"
            ),
            (x["e"] + F.lit(1)).alias("c"),
        ),
        lambda a: F.concat(
            a["o"], F.substr(txt, a["c"], F.length(txt) - a["c"] + 1)
        ),
    )
    clean = F.when(F.col("sp").isNull(), txt).otherwise(stitched)
    return joined.select(
        F.col(id_col),
        clean.alias("clean_text"),
        F.length(clean).cast("bigint").alias("n_chars_clean"),
        (F.length(txt) - F.length(clean)).cast("bigint").alias(
            "removed_chars"
        ),
        F.coalesce(F.col("n_spans"), F.lit(0)).cast("bigint").alias(
            "n_spans"
        ),
    )


# -------------------------------------------------- char-trigram LM score


def _char_grams(text: Column, n: int) -> Column:
    """Array of all character n-grams of ``lower(text)`` — row-local.
    Guarded for texts shorter than n: Spark's ``sequence(1, 0)`` counts
    DOWN (same guard as text.shingles), so they yield an empty array."""
    t = F.lower(text)
    arr = F.transform(
        F.sequence(F.lit(1), F.length(t) - F.lit(n - 1)),
        lambda i: F.substr(t, i, F.lit(n)),
    )
    return F.when(F.length(t) >= n, arr).otherwise(F.array().cast("array<string>"))


def train_char_lm(df: DataFrame, text_col: str, n: int = 3) -> DataFrame:
    """Train a character n-gram language model on a reference corpus
    slice: one groupBy producing ``(gram, logp)`` under add-one
    (Laplace) smoothing over the observed vocabulary,

        logp(g) = ln((c_g + 1) / (N + V)).

    This is the public CCNet/KenLM quality-model recipe reduced to
    count math: at 100 TB the model table is bounded by |charset|^n
    (thousands of rows for n=3), so scoring broadcasts it.
    """
    counts = (
        df.select(F.explode(_char_grams(F.col(text_col), n)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = counts.agg(
        F.sum("c").alias("N"), F.count(F.lit(1)).alias("V")
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "gram",
        F.log((F.col("c") + F.lit(1)) / (F.col("N") + F.col("V")).cast("double")).alias(
            "logp"
        ),
        (F.lit(1.0) / (F.col("N") + F.col("V")).cast("double")).alias("p_oov"),
    )


def lm_score(
    df: DataFrame, id_col: str, text_col: str, model: DataFrame, n: int = 3
) -> DataFrame:
    """Score every document by mean negative log-likelihood under a
    ``train_char_lm`` model: ``(id, n_grams, nll)`` — lower is more
    reference-like; bucket on ``nll`` for CCNet head/middle/tail splits.

    Out-of-vocabulary grams get the smoothing floor ln(1/(N+V)). The
    model join is an explicit broadcast (model cardinality is bounded
    by the charset, not the corpus); the only shuffle is the final
    per-document average, keyed on the document id.
    """
    grams = df.select(
        F.col(id_col), F.explode(_char_grams(F.col(text_col), n)).alias("gram")
    )
    oov = model.agg(F.log(F.min("p_oov")).alias("logp_oov"))
    scored = (
        grams.join(F.broadcast(model.select("gram", "logp")), "gram", "left")
        .crossJoin(F.broadcast(oov))
        .select(
            F.col(id_col),
            F.coalesce(F.col("logp"), F.col("logp_oov")).alias("lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.round(-F.avg("lp"), 4).alias("nll"),
    )


def perplexity_buckets(
    scored: DataFrame,
    id_col: str,
    score_col: str = "nll",
    labels: tuple[str, ...] = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet's head/middle/tail split: equal-size buckets of the corpus
    by LM score (lowest NLL = most reference-like = ``head``). Appends a
    ``bucket`` label column via ``ntile(len(labels))`` ordered by
    ``(score, id)`` — the id tie-break makes bucket edges deterministic
    across engines and runs.

    Scale note: the global ntile sorts only the (id, score) table —
    ~16 bytes/doc, thousands of times smaller than the corpus — as one
    range-partitioned sort. If even that is unwanted, the standard
    approximation is two fixed thresholds from ``approx_percentile``
    (one scalar agg, then a map-side ``when``); ntile is used here
    because its rank arithmetic is exactly reproducible, while
    percentile interpolation differs subtly between engines.
    """
    n = len(labels)
    w = Window.orderBy(F.col(score_col).asc(), F.col(id_col).asc())
    nt = F.ntile(n).over(w)
    expr = F.when(nt == 1, labels[0])
    for i in range(1, n):
        expr = expr.when(nt == i + 1, labels[i])
    return scored.withColumn("bucket", expr)


# ------------------------------------------ word-bigram Stupid Backoff


def train_bigram_lm(df: DataFrame, text_col: str) -> tuple[DataFrame, DataFrame]:
    """Word-level LM counts for Stupid Backoff scoring (Brants et al.
    2007 — the scheme built FOR distributed count tables: no discounting
    to normalize, just raw counts and a fixed backoff factor).

    Returns (unigrams, bigrams): ``(w, c)`` and ``(w1, w2, c)``. Both
    tables are vocabulary-bounded, produced by one shuffle each over
    row-locally assembled grams (the bigram list never leaves its row
    before the explode)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    uni = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = F.when(
        F.size(toks) > 1,
        F.transform(
            F.sequence(F.lit(2), F.size(toks)),
            lambda i: F.struct(
                F.element_at(toks, i - 1).alias("w1"),
                F.element_at(toks, i).alias("w2"),
            ),
        ),
    ).otherwise(F.expr("array()").cast("array<struct<w1:string,w2:string>>"))
    bi = (
        df.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return uni, bi


def train_trigram_lm(
    df: DataFrame, text_col: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(unigrams, bigrams, trigrams) count tables — ``train_bigram_lm``
    plus a ``(w1, w2, w3, c)`` table, same row-local gram assembly and
    one shuffle per order (the Brants et al. 2007 setup proper: their
    distributed LMs are 3-gram and up, bigram-only was the r6
    simplification)."""
    uni, bi = train_bigram_lm(df, text_col)
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    triples = F.when(
        F.size(toks) > 2,
        F.transform(
            F.sequence(F.lit(3), F.size(toks)),
            lambda i: F.struct(
                F.element_at(toks, i - 2).alias("w1"),
                F.element_at(toks, i - 1).alias("w2"),
                F.element_at(toks, i).alias("w3"),
            ),
        ),
    ).otherwise(
        F.expr("array()").cast("array<struct<w1:string,w2:string,w3:string>>")
    )
    tri = (
        df.select(F.explode(triples).alias("p"))
        .groupBy(
            F.col("p.w1").alias("w1"),
            F.col("p.w2").alias("w2"),
            F.col("p.w3").alias("w3"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return uni, bi, tri


def stupid_backoff_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    unigrams: DataFrame,
    bigrams: DataFrame,
    alpha: float = 0.4,
    trigrams: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean negative log Stupid Backoff score:

        S(w_1)          = c(w_1)/N            (1/N when OOV)
        S(w_i | w_i-1)  = c(w_i-1 w_i)/c(w_i-1)   when the bigram is known
                          α · S_unigram(w_i)       otherwise

    With ``trigrams`` (train_trigram_lm), positions i >= 3 score at
    order 3 first — S(w_i | w_i-2 w_i-1) = c(tri)/c(context bigram)
    when the trigram is known, else α times the bigram score above
    (which itself backs off) — the full Brants et al. recursion.

    Positions are assembled row-locally as (prev2, prev, cur) structs,
    then exploded; the count tables join as explicit broadcasts
    (vocabulary-bounded, the lm_score precedent); the only corpus-keyed
    shuffle is the final per-document average. Output (id, n_tokens,
    nll), nll rounded 4 dp — lower is more reference-like."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    # size guard: sequence(1, 0) is DESCENDING in Spark (the d3978c3
    # footgun) — an empty document must yield no positions, not a crash
    positions = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(1), F.size(toks)),
            lambda i: F.struct(
                F.when(i > 2, F.element_at(toks, i - 2)).alias("prev2"),
                F.when(i > 1, F.element_at(toks, i - 1)).alias("prev"),
                F.element_at(toks, i).alias("cur"),
            ),
        ),
    ).otherwise(
        F.expr("array()").cast(
            "array<struct<prev2:string,prev:string,cur:string>>"
        )
    )
    pos = df.select(F.col(id_col), F.explode(positions).alias("p")).select(
        id_col,
        F.col("p.prev2").alias("prev2"),
        F.col("p.prev").alias("prev"),
        F.col("p.cur").alias("cur"),
    )
    n_total = unigrams.agg(F.sum("c").cast("double").alias("N"))
    uni_cur = unigrams.select(F.col("w").alias("cur"), F.col("c").alias("c_cur"))
    uni_prev = unigrams.select(F.col("w").alias("prev"), F.col("c").alias("c_prev"))
    bi = bigrams.select(
        F.col("w1").alias("prev"), F.col("w2").alias("cur"), F.col("c").alias("c_bi")
    )
    joined = (
        pos.join(F.broadcast(uni_cur), "cur", "left")
        .join(F.broadcast(uni_prev), "prev", "left")
        .join(F.broadcast(bi), ["prev", "cur"], "left")
        .crossJoin(F.broadcast(n_total))
    )
    s_uni = F.coalesce(F.col("c_cur").cast("double"), F.lit(1.0)) / F.col("N")
    s_bi = F.when(
        F.col("c_bi").isNotNull(),
        F.col("c_bi").cast("double") / F.col("c_prev").cast("double"),
    ).otherwise(F.lit(alpha) * s_uni)
    if trigrams is not None:
        ctx = bigrams.select(
            F.col("w1").alias("prev2"),
            F.col("w2").alias("prev"),
            F.col("c").alias("c_ctx"),
        )
        tri = trigrams.select(
            F.col("w1").alias("prev2"),
            F.col("w2").alias("prev"),
            F.col("w3").alias("cur"),
            F.col("c").alias("c_tri"),
        )
        joined = joined.join(
            F.broadcast(ctx), ["prev2", "prev"], "left"
        ).join(F.broadcast(tri), ["prev2", "prev", "cur"], "left")
        s_tri = F.when(
            F.col("c_tri").isNotNull(),
            F.col("c_tri").cast("double") / F.col("c_ctx").cast("double"),
        ).otherwise(F.lit(alpha) * s_bi)
        s = (
            F.when(F.col("prev").isNull(), s_uni)
            .when(F.col("prev2").isNull(), s_bi)
            .otherwise(s_tri)
        )
    else:
        s = F.when(F.col("prev").isNull(), s_uni).otherwise(s_bi)
    return (
        joined.select(F.col(id_col), F.log(s).alias("lp"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(-F.avg("lp"), 4).alias("nll"),
        )
    )


def kneser_ney_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    unigrams: DataFrame,
    bigrams: DataFrame,
    discount: float = 0.75,
) -> DataFrame:
    """Per-document mean negative log INTERPOLATED KNESER-NEY bigram
    probability (Kneser & Ney 1995; Chen & Goodman 1999 eq. 4.25) —
    the canonical count-based quality LM the Stupid Backoff family
    approximates:

        P(w | v) = max(c(vw) - d, 0) / c(v·)
                   + d · N1+(v·) / c(v·) · Pcont(w)
        Pcont(w) = (N1+(·w) + 1) / (N1+(··) + V + 1)

    where c(v·) is the bigram-context total, N1+(v·) the distinct
    continuations of v, N1+(·w) the distinct left contexts of w,
    N1+(··) the bigram type count, and V the unigram vocabulary. The
    +1/+V+1 smoothing on the continuation distribution is this
    engine's documented totality choice: OOV words and the first
    position score as smoothed Pcont instead of log(0). Unseen
    contexts back off to Pcont(w) entirely.

    Same distributed shape as stupid_backoff_score: every count table
    derives from ``train_bigram_lm``'s outputs with vocabulary-bounded
    aggregates, all scoring joins broadcast, and the only corpus-keyed
    shuffle is the per-document average. Output (id, n_tokens, nll)
    rounded 4 dp."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    positions = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(1), F.size(toks)),
            lambda i: F.struct(
                F.when(i > 1, F.element_at(toks, i - 1)).alias("prev"),
                F.element_at(toks, i).alias("cur"),
            ),
        ),
    ).otherwise(F.expr("array()").cast("array<struct<prev:string,cur:string>>"))
    pos = df.select(F.col(id_col), F.explode(positions).alias("p")).select(
        id_col, F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur")
    )
    ctx = bigrams.groupBy("w1").agg(
        F.sum("c").alias("c_ctx"), F.count(F.lit(1)).alias("n1p_fwd")
    ).select(F.col("w1").alias("prev"), "c_ctx", "n1p_fwd")
    cont = bigrams.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_back")).select(
        F.col("w2").alias("cur"), "n1p_back"
    )
    totals = bigrams.agg(F.count(F.lit(1)).alias("n_bi_types")).crossJoin(
        unigrams.agg(F.count(F.lit(1)).alias("v"))
    )
    bi = bigrams.select(
        F.col("w1").alias("prev"), F.col("w2").alias("cur"), F.col("c").alias("c_bi")
    )
    joined = (
        pos.join(F.broadcast(bi), ["prev", "cur"], "left")
        .join(F.broadcast(ctx), "prev", "left")
        .join(F.broadcast(cont), "cur", "left")
        .crossJoin(F.broadcast(totals))
    )
    d = F.lit(discount)
    p_cont = (
        F.coalesce(F.col("n1p_back").cast("double"), F.lit(0.0)) + F.lit(1.0)
    ) / (F.col("n_bi_types") + F.col("v") + F.lit(1)).cast("double")
    p_kn = (
        F.greatest(F.coalesce(F.col("c_bi").cast("double"), F.lit(0.0)) - d, F.lit(0.0))
        / F.col("c_ctx").cast("double")
        + d * F.col("n1p_fwd").cast("double") / F.col("c_ctx").cast("double") * p_cont
    )
    p = F.when(
        F.col("prev").isNull() | F.col("c_ctx").isNull(), p_cont
    ).otherwise(p_kn)
    return (
        joined.select(F.col(id_col), F.log(p).alias("lp"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(-F.avg("lp"), 4).alias("nll"),
        )
    )


# ------------------------------------------------ corpus version diff


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    fp_col: str,
) -> DataFrame:
    """Release-to-release corpus diff: FULL OUTER join on the document
    id comparing content fingerprints → per-doc status in
    {added, removed, changed, unchanged}. The ops surface every corpus
    rebuild needs ("what did this pipeline change?") and the one join
    type nothing else in the engine uses — one shuffle on the id, the
    join carries (id, fp) pairs only, never document bodies."""
    # explicit presence markers: a NULL FINGERPRINT (md5 of a NULL
    # body) must read as "present with unknown content", never as
    # "absent" — inferring presence from fp nullness would misclassify
    # such docs as added/removed (review r6)
    o = old.select(
        F.col(id_col).alias("__id"),
        F.col(fp_col).alias("__old_fp"),
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        F.col(id_col).alias("__id"),
        F.col(fp_col).alias("__new_fp"),
        F.lit(True).alias("__in_new"),
    )
    joined = o.join(n, on="__id", how="full_outer")
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.col("__old_fp").eqNullSafe(F.col("__new_fp")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        F.col("__id").alias(id_col),
        status.alias("status"),
    )


def corpus_diff_summary(
    old: DataFrame, new: DataFrame, id_col: str, fp_col: str
) -> DataFrame:
    return (
        corpus_diff(old, new, id_col, fp_col)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def cdc_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    w: int = 16,
    mask_bits: int = 6,
    salt: str = "cdc:",
) -> DataFrame:
    """CONTENT-DEFINED CHUNKING — the storage-dedup primitive of LBFS
    (Muthitacharoen, Chen & Mazières, SOSP 2001) and the FastCDC
    family (Xia et al., USENIX ATC 2016): cut each document at
    positions where a rolling window's fingerprint satisfies
    ``hash(window) % 2^mask_bits == 0``, so cut points are decided by
    CONTENT, not offsets. The property fixed-size chunking cannot
    give (pytest-pinned): inserting or deleting a prefix shifts every
    fixed-size boundary and invalidates every chunk hash, while CDC
    boundaries re-align at the first surviving cut point and every
    later chunk hashes identically — which is why incremental backup,
    artifact stores and dataset-versioning systems all chunk this
    way. At 100 TB this is the byte-level rung of the dedup ladder,
    below T45's span grain: two crawl snapshots of the same site
    share most chunks, and a chunk-hash store dedups them at
    ``distinct chunks / total chunks`` cost.

    Window fingerprint = the portable 60-bit md5 gram key over the
    ``w``-gram STARTING at the cut position (salted; deterministic,
    no RNG state, identical in any engine — a production deployment
    swaps in a gear/Rabin rolling hash, which changes constants, not
    shape). A position i > 1 is a cut when its fingerprint's low
    ``mask_bits`` bits are zero → expected chunk length 2^mask_bits.
    This is the BASIC content-defined rule; FastCDC's min/max-length
    normalization is a sequential suppression (each boundary depends
    on the previous) deliberately left out to keep boundaries
    position-independent — the exact property the shift-robustness
    law tests.

    Emits one row per chunk, every document total (short docs = one
    whole-doc chunk): ``(id, chunk_idx, start, chunk_len,
    chunk_md5)``, 1-based, concatenation law ``Σ chunks == text``
    pytest-pinned. Plan: one row-local gram projection + one filter
    (boundary predicate pushes into the scan projection), one
    per-document lead window, one join back for the substring — no
    data-scale driver work, no Python.
    """
    if w < 2:
        raise ValueError("w must be >= 2: single-char windows cut on "
                         "every repeated character")
    if not (1 <= int(mask_bits) <= 30):
        raise ValueError("mask_bits must be in [1, 30]")
    t = F.col(text_col)
    modulus = 1 << int(mask_bits)
    arr = F.when(
        # len >= w+1, not w: Spark's sequence(2, 1) DESCENDS — a
        # doc of exactly w chars has no interior cut position at all
        F.length(t) >= w + 1,
        F.filter(
            F.transform(
                # cuts only at i in [2, len-w+1]: a cut before pos 1
                # is a no-op, and windows past len-w+1 don't exist
                F.sequence(F.lit(2), F.length(t) - F.lit(w - 1)),
                lambda i: F.when(
                    _gram_key(F.concat(F.lit(salt), F.substr(t, i, F.lit(w))))
                    % modulus
                    == 0,
                    i,
                ),
            ),
            lambda x: x.isNotNull(),
        ),
    ).otherwise(F.array().cast("array<int>"))
    cuts = df.select(
        F.col(id_col).alias("__id"),
        F.length(t).alias("__len"),
        F.explode(
            F.concat(F.array(F.lit(1)), arr)  # sentinel: chunk 1 starts at 1
        ).alias("start"),
    )
    win = Window.partitionBy("__id").orderBy("start")
    chunks = (
        cuts.withColumn("chunk_idx", F.row_number().over(win))
        .withColumn(
            "chunk_len",
            F.coalesce(F.lead("start").over(win), F.col("__len") + 1)
            - F.col("start"),
        )
    )
    witness = df.select(
        F.col(id_col).alias("__id"), t.alias("__t")
    )
    return (
        chunks.join(witness, "__id")
        .select(
            F.col("__id").alias(id_col),
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.col("start").cast("int").alias("start"),
            F.col("chunk_len").cast("int").alias("chunk_len"),
            F.md5(
                F.substr(F.col("__t"), F.col("start"), F.col("chunk_len"))
            ).alias("chunk_md5"),
        )
    )


def cdc_dedup_stats(chunks: DataFrame, id_col: str) -> DataFrame:
    """One-row corpus summary over a :func:`cdc_chunks` table — the
    what-would-a-chunk-store-save readout: total vs distinct chunk
    counts and chars (distinct chars = Σ chunk_len over one
    representative per chunk_md5 — the stored bytes after dedup).
    Two map-side-combinable aggregates; integers end to end."""
    per_hash = chunks.groupBy("chunk_md5").agg(
        F.count(F.lit(1)).alias("n"),
        F.first("chunk_len").alias("chunk_len"),
    )
    return per_hash.agg(
        F.sum("n").cast("bigint").alias("total_chunks"),
        F.count(F.lit(1)).cast("bigint").alias("distinct_chunks"),
        F.sum(F.col("n") * F.col("chunk_len")).cast("bigint").alias(
            "total_chars"
        ),
        F.sum("chunk_len").cast("bigint").alias("distinct_chars"),
    )
