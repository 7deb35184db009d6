"""Text-analysis surface (north-star: SURVEY.md §2 K4–K6 + pipeline ops).

Everything here operates on the ``documents`` table shape
(doc_id, text, lang, source, n_chars). Hot paths are built-in column
functions (split/explode/higher-order) — JVM-side and codegen-friendly;
language-ID is the one pandas-UDF (score tables don't vectorize well in
SQL), batched via Arrow.
NOTE: no `from __future__ import annotations` — pandas_udf infers its
eval type from runtime type hints; stringified annotations break it.
"""

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOKEN_SPLIT = " "  # contract corpus is space-separated lowercase words

# A BPE-ish fallback splitter for realistic text: words, numbers, or
# single punctuation — used by token_count_bpe below.
BPE_ISH_REGEX = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens(text: Column) -> Column:
    return F.split(text, TOKEN_SPLIT)


def token_count(text: Column) -> Column:
    """Whitespace token count — the cheap length signal."""
    return F.size(tokens(text))


def token_count_bpe(text: Column) -> Column:
    """Approximate BPE token count: regexp-extract-all word/number/punct
    pieces (a standard ~token-per-4-chars heuristic substitute)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_REGEX), 0))


def stopword_ratio(text: Column, stopwords: list[str]) -> Column:
    """Fraction of tokens in a stopword list — quality-scoring feature.
    Higher-order filter keeps it JVM-side."""
    toks = tokens(text)
    arr = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return n_stop.cast("double") / F.size(toks).cast("double")


def avg_token_len(text: Column) -> Column:
    """Mean token length ((chars − separators) / tokens), in double."""
    n = token_count(text)
    return (F.length(text) - (n - F.lit(1))).cast("double") / n.cast("double")


def quality_features(df: DataFrame, text_col: str, stopwords: "list[str]") -> DataFrame:
    """Append standard quality-score features (length/stopword/token
    stats) — the filter basis of an LLM training-data pipeline."""
    t = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(t))
        .withColumn("avg_tok_len", F.round(avg_token_len(t), 4))
        .withColumn("stop_ratio", F.round(stopword_ratio(t, stopwords), 4))
    )


#: The Gopher stop-word list (Rae et al. 2021, MassiveText A1.1): a
#: document must contain at least 2 of these to pass the rule.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(text: Column) -> Column:
    """The Gopher/MassiveText document-quality rules (Rae et al. 2021
    Appendix A1.1) as ONE struct column of per-rule booleans plus the
    conjunction — the published preset every web pipeline starts from,
    beside the C4 line rules (T16) and the generic scorecard (T9):

    - ``words_ok``       50 <= word count <= 100,000
    - ``word_len_ok``    3 <= mean word length <= 10
    - ``symbol_ok``      (# of '#' or '...') / words < 0.1
    - ``bullet_ok``      < 90% of lines start with a bullet
    - ``ellipsis_ok``    < 30% of lines end with '...'
    - ``alpha_ok``       >= 80% of words contain a letter
    - ``stop_ok``        contains >= 2 Gopher stop words
    - ``keep``           all of the above

    Pure row-local higher-order expressions — zero shuffles, zero
    UDFs; every sub-ratio derives from the same token/line arrays so
    the struct costs one projection."""
    toks = F.filter(F.split(text, " "), lambda t: t != "")
    n_words = F.size(toks)
    mean_len = F.aggregate(
        toks, F.lit(0), lambda a, t: a + F.length(t)
    ).cast("double") / F.greatest(n_words, F.lit(1)).cast("double")
    n_hash_in = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ellipsis = F.size(
        F.split(F.concat(F.lit(" "), text, F.lit(" ")), r"\.\.\.")
    ) - F.lit(1)
    symbol_ratio = (n_hash_in + n_ellipsis).cast("double") / F.greatest(
        n_words, F.lit(1)
    ).cast("double")
    lines = F.split(text, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_frac = F.size(
        F.filter(
            lines,
            lambda l: l.startswith("-")
            | l.startswith("*")
            | l.startswith("•"),
        )
    ).cast("double") / n_lines.cast("double")
    ellipsis_line_frac = F.size(
        F.filter(lines, lambda l: l.endswith("..."))
    ).cast("double") / n_lines.cast("double")
    alpha_frac = F.size(
        F.filter(toks, lambda t: t.rlike("[A-Za-z]"))
    ).cast("double") / F.greatest(n_words, F.lit(1)).cast("double")
    lower_toks = F.filter(F.split(F.lower(text), " "), lambda t: t != "")
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(lower_toks),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )
    flags = {
        "words_ok": (n_words >= 50) & (n_words <= 100000),
        "word_len_ok": (mean_len >= 3.0) & (mean_len <= 10.0),
        "symbol_ok": symbol_ratio < 0.1,
        "bullet_ok": bullet_frac < 0.9,
        "ellipsis_ok": ellipsis_line_frac < 0.3,
        "alpha_ok": alpha_frac >= 0.8,
        "stop_ok": n_stop >= 2,
    }
    keep = None
    for c in flags.values():
        keep = c if keep is None else (keep & c)
    return F.struct(
        *[v.alias(k) for k, v in flags.items()], keep.alias("keep")
    )


def fingerprint64(text: Column) -> Column:
    """64-bit document fingerprint: xxhash64 of the normalized token
    stream (order-sensitive — a content id, not a similarity hash)."""
    return F.xxhash64(F.concat_ws(" ", tokens(F.lower(text))))


def fingerprint_hex(text: Column) -> Column:
    """Cross-engine document fingerprint: md5 hex of the normalized
    token stream. Same normalization as fingerprint64 but oracle-
    checkable (DuckDB twin: ``md5(array_to_string(string_split(
    lower(text), ' '), ' '))``). Use fingerprint64 when 8-byte ids
    matter (join keys at scale); this when auditability does."""
    return F.md5(F.concat_ws(" ", tokens(F.lower(text))))


def shingles(text: Column, n: int) -> Column:
    """Word n-gram shingle array from the space-token stream — the
    decontamination / near-dup unit. Pure higher-order expression
    (sequence + transform + slice): JVM-side, no UDF, no shuffle.

    Guarded for short docs: Spark's ``sequence(1, 0)`` would count
    DOWN ([1, 0]), so texts with fewer than n tokens yield an empty
    array explicitly."""
    toks = tokens(text)
    idx = F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    arr = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    empty = F.array().cast("array<string>")
    return F.when(F.size(toks) >= n, arr).otherwise(empty)


def repetition_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition quality signals, per document:

    - ``top2_gram`` / ``top2_count`` — the most frequent word 2-gram
      (ties broken by lexicographically greatest gram, deterministic)
    - ``top2_char_frac`` — chars covered by that 2-gram's occurrences
      over total chars (the "fraction of characters in the most common
      n-gram" filter from the Gopher/MassiveText quality rules)
    - ``dup3_frac`` — fraction of 3-gram occurrences that are repeats
      (1 − distinct/total), the duplicate-n-gram filter

    Distributed shape: shingling is row-local (higher-order exprs, no
    UDF); counting shuffles on (doc, gram) then doc — high-cardinality,
    skew-free keys with map-side partial aggregation, so the plan is
    linear in corpus size and survives a 100× scale-up. The struct-max
    arg-max avoids a window sort over every gram.
    """
    t = F.col(text_col)
    base = df.select(
        F.col(id_col),
        F.length(t).alias("nc"),
        shingles(t, 2).alias("g2"),
        shingles(t, 3).alias("g3"),
    )
    c2 = (
        base.select(id_col, "nc", F.explode("g2").alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count("*").alias("cnt"), F.first("nc").alias("nc"))
    )
    top = (
        c2.groupBy(id_col)
        .agg(
            F.max(F.struct(F.col("cnt"), F.col("gram"))).alias("top"),
            F.first("nc").alias("nc"),
        )
        .select(
            id_col,
            F.col("top.gram").alias("top2_gram"),
            F.col("top.cnt").alias("top2_count"),
            F.round(
                F.col("top.cnt") * F.length("top.gram") / F.col("nc"), 4
            ).alias("top2_char_frac"),
        )
    )
    d3 = (
        base.select(id_col, F.explode("g3").alias("gram"))
        .groupBy(id_col)
        .agg(F.count("*").alias("total3"), F.countDistinct("gram").alias("distinct3"))
        .select(
            id_col,
            F.round(
                (F.col("total3") - F.col("distinct3"))
                / F.col("total3").cast("double"),
                4,
            ).alias("dup3_frac"),
        )
    )
    return top.join(d3, id_col)


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS algorithm): hash every
    word k-gram, slide a w-position window, keep each window's minimum
    — the guaranteed-coverage fingerprint set for local similarity.

    Entirely row-local (k-gram hashing, sliding-window min, and distinct
    all run as higher-order array expressions) — a pure projection +
    explode, no shuffle anywhere; matching fingerprints across docs is
    then a plain equi-join on ``fp``. Uses the portable md5-derived
    32-bit hash so the fingerprint set reproduces outside Spark."""
    from jane_spark.operators.dedup import portable_hash32

    sh = shingles(F.col(text_col), k)
    hashes = F.transform(sh, lambda g: portable_hash32(g))
    m = F.size(hashes)
    wins = F.when(
        m >= w,
        F.transform(
            F.sequence(F.lit(1), m - F.lit(w - 1)),
            lambda j: F.array_min(F.slice(hashes, j, w)),
        ),
    ).otherwise(F.when(m > 0, F.array(F.array_min(hashes))).otherwise(
        F.array().cast("array<bigint>")
    ))
    return df.select(
        F.col(id_col), F.explode(F.array_distinct(wins)).alias("fp")
    )


def token_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Shannon entropy (bits) of each document's token distribution —
    the low-entropy filter for templated/repetitive text. Computed as
    ``log2(n) - sum(c*log2(c))/n`` so the per-token shuffle aggregates
    plain counts (map-side combinable) and the entropy math happens on
    one row per document."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), TOKEN_SPLIT)).alias("tok")
    )
    counts = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("cnt"))
    agg = counts.groupBy(id_col).agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("cnt") * F.log2("cnt")).alias("clog"),
    )
    ent = F.log2(F.col("n")) - F.col("clog") / F.col("n")
    return agg.select(F.col(id_col), F.round(ent, 4).alias("token_entropy"))


def pmi_collocations(
    df: DataFrame, text_col: str, min_count: int = 10
) -> DataFrame:
    """Pointwise-mutual-information collocation mining (Church & Hanks
    1990): for every adjacent token pair seen at least ``min_count``
    times corpus-wide, ``pmi = log2(p(xy) / (p(x) p(y)))`` computed as

        log2(n_pair) + 2*log2(N_uni) - log2(N_bi) - log2(c1) - log2(c2)

    — the decomposition keeps every aggregate an integer count. The
    output carries BOTH the full BIGINT count tuple ``(n_pair, c1,
    c2, nu, nb)`` — the exact, engine-portable surface (the PMI is a
    deterministic function of it; no two libms promise bit-equal
    log2, so ``round(pmi, 4)`` can flip a ±1-ULP difference into
    ±1e-4 on a round-half tie — the r10 lesson) — and the float
    ``pmi`` rounded to 4 dp for human ranking / pytest-with-tolerance
    use. High-PMI pairs are multiword expressions; a corpus whose top
    PMI table is template boilerplate needs dedup before training.

    Scale shape: one token-keyed and one bigram-keyed count shuffle
    (both map-side combinable, vocabulary-sized outputs), the two
    scalar totals broadcast back, and the marginals attached by
    vocabulary-keyed joins — the corpus itself is touched twice and
    never carries more than (token, count) rows into any exchange.
    """
    toks = df.select(
        F.explode(F.split(F.col(text_col), TOKEN_SPLIT)).alias("tok")
    )
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    bi = (
        df.select(F.explode(shingles(F.col(text_col), 2)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= min_count)
        .select(
            F.split_part(F.col("gram"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("gram"), F.lit(" "), F.lit(2)).alias("w2"),
            "n_pair",
        )
    )
    nu = toks.agg(F.count(F.lit(1)).alias("__nu"))
    nb = df.select(
        F.explode(shingles(F.col(text_col), 2)).alias("g")
    ).agg(F.count(F.lit(1)).alias("__nb"))
    c1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    c2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    pmi = (
        F.log2("n_pair")
        + F.lit(2.0) * F.log2("__nu")
        - F.log2("__nb")
        - F.log2("c1")
        - F.log2("c2")
    )
    return (
        bi.join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
        .select(
            "w1",
            "w2",
            F.col("n_pair").cast("bigint").alias("n_pair"),
            F.col("c1").cast("bigint").alias("c1"),
            F.col("c2").cast("bigint").alias("c2"),
            F.col("__nu").cast("bigint").alias("nu"),
            F.col("__nb").cast("bigint").alias("nb"),
            F.round(pmi, 4).alias("pmi"),
        )
    )


def compression_ratio(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """DEFLATE compression ratio per document (compressed/raw bytes) —
    the Gopher/MassiveText-family redundancy signal token_entropy
    approximates from the token distribution: near-1 means high-entropy
    text, near-0 means templated/repeated content a dictionary coder
    collapses. Fixed level 6 and a raw-byte floor of 1 keep the value
    deterministic and total ('' → ratio 0.0 convention? no — empty
    text compresses to the 8-byte zlib envelope; the raw floor avoids
    the division, and NULL text yields NULL row-for-row).

    Arrow-batched Series→Series pandas UDF — zlib is the one thing the
    JVM expression library can't do; the projection shape (no shuffle,
    no grouping) is identical to the built-in feature columns, so this
    composes into quality_features-style scorecards for free."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<raw_bytes:long,zlib_bytes:long,ratio:double>")
    def _cr(texts: pd.Series) -> pd.DataFrame:
        import zlib as _z

        raw, comp, ratio = [], [], []
        for t in texts:
            if t is None:
                raw.append(None)
                comp.append(None)
                ratio.append(None)
                continue
            b = t.encode("utf-8")
            c = _z.compress(b, 6)
            raw.append(len(b))
            comp.append(len(c))
            ratio.append(round(len(c) / max(len(b), 1), 4))
        return pd.DataFrame(
            {"raw_bytes": raw, "zlib_bytes": comp, "ratio": ratio}
        )

    out = df.select(F.col(id_col), _cr(F.col(text_col)).alias("c"))
    return out.select(
        id_col,
        F.col("c.raw_bytes").alias("raw_bytes"),
        F.col("c.zlib_bytes").alias("zlib_bytes"),
        F.col("c.ratio").alias("compression_ratio"),
    )


# ------------------------------------------------------------ language ID

# character-frequency profiles for a tiny trigram-free heuristic;
# deliberately simple and deterministic (the container has no langid lib).
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "de", "la", "los", "que"],
    "de": ["der", "die", "und", "das", "ist"],
    "zh": [],  # CJK detected by codepoint range below
}


def detect_language_expr(text: Column) -> Column:
    """Pure-Column language ID — same decision function as
    detect_language_udf (CJK codepoint scan over the first 200 chars,
    else marker-word argmax over the first 200 tokens, first-listed
    language wins ties, 'und' on zero hits) but built entirely from
    array_intersect/greatest/when: whole-stage-codegen'd, no Python
    worker, and DuckDB-oracle-expressible. This is the default path;
    the pandas UDF remains as the extensibility example (J-surface)
    and is parity-tested against this expression."""
    hits = {}
    toks = F.array_distinct(F.slice(tokens(F.lower(text)), 1, 200))
    for lang, markers in _LANG_MARKERS.items():
        if markers:
            arr = F.array(*[F.lit(m) for m in markers])
            hits[lang] = F.size(F.array_intersect(toks, arr))
    best = F.greatest(*hits.values())
    decided = F.when(F.substring(text, 1, 200).rlike("[一-鿿]"), F.lit("zh")).when(
        best <= 0, F.lit("und")
    )
    for lang in _LANG_MARKERS:  # dict order == UDF's strict-> tie-break order
        if lang in hits:
            decided = decided.when(hits[lang] == best, F.lit(lang))
    return decided.otherwise(F.lit("und"))


def detect_language_udf():
    """pandas UDF: marker-word + codepoint-range language heuristic.
    Returns 'und' when nothing matches — callers treat that as a filter
    signal, mirroring a real pipeline's lang-ID stage."""
    import pandas as pd

    @F.pandas_udf(T.StringType())
    def detect(texts: pd.Series) -> pd.Series:
        def one(t: str) -> str:
            if not t:
                return "und"
            if any("一" <= c <= "鿿" for c in t[:200]):
                return "zh"
            toks = set(t.lower().split()[:200])
            best, best_hits = "und", 0
            for lang, markers in _LANG_MARKERS.items():
                hits = sum(1 for m in markers if m in toks)
                if hits > best_hits:
                    best, best_hits = lang, hits
            return best

        return texts.map(one)

    return detect


# ------------------------------------------------------------------ PII
# Multi-class PII redaction (T6 extension, round 6). Regex classes stay
# conservative so Java regex (Spark) and RE2 (DuckDB) agree byte-exactly;
# card numbers add a Luhn checksum gate — a higher-order-expression
# validation pure regex cannot express, so digit strings that merely
# LOOK like cards survive redaction.

PII_EMAIL = r"[a-z0-9.]+@[a-z0-9.]+"
PII_PHONE = r"[0-9]{3}-[0-9]{4}"
PII_IPV4 = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
PII_CARD = r"[0-9]{16}"  # contiguous PAN; separator variants upstream


def luhn_valid(num: Column) -> Column:
    """Luhn (mod-10) checksum over a digit string — pure higher-order
    expression (sequence + transform + aggregate), JVM-side."""
    ds = F.reverse(num)
    digit = lambda i: F.substr(ds, i, F.lit(1)).cast("int")  # noqa: E731
    term = lambda i: F.when(  # noqa: E731
        i % 2 == 0,
        F.when(digit(i) * 2 > 9, digit(i) * 2 - 9).otherwise(digit(i) * 2),
    ).otherwise(digit(i))
    total = F.aggregate(
        F.sequence(F.lit(1), F.length(ds)), F.lit(0), lambda acc, i: acc + term(i)
    )
    return total % 10 == 0


def valid_cards(text: Column) -> Column:
    """Luhn-passing 16-digit candidates in a text, in match order."""
    return F.filter(
        F.regexp_extract_all(text, F.lit(PII_CARD), 0), luhn_valid
    )


def pii_redact(text: Column) -> Column:
    """Redact card numbers (Luhn-gated), then emails, phones, IPv4 —
    in that fixed order, so the result is engine-reproducible. Card
    replacement folds the validated candidates over the text with a
    literal replace (no regex re-scan per candidate)."""
    t = F.aggregate(
        valid_cards(text),
        text,
        lambda acc, c: F.replace(acc, c, F.lit("<CARD>")),
    )
    t = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    t = F.regexp_replace(t, PII_PHONE, "<PHONE>")
    return F.regexp_replace(t, PII_IPV4, "<IP>")


def pii_counts(text: Column) -> Column:
    """Struct of per-class PII hit counts (cards split into found vs
    Luhn-valid) — the audit view a redaction pass reports."""
    return F.struct(
        F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(text, F.lit(PII_PHONE), 0)).alias("n_phones"),
        F.size(F.regexp_extract_all(text, F.lit(PII_IPV4), 0)).alias("n_ips"),
        F.size(F.regexp_extract_all(text, F.lit(PII_CARD), 0)).alias("n_cards_found"),
        F.size(valid_cards(text)).alias("n_cards_valid"),
    )


# ------------------------------------------------------------ HTML strip
# The WET step of a CommonCrawl-style pipeline: markup out, text kept.
# Patterns are deliberately RE2-safe (no backreferences, no lookaround)
# so Java regex (Spark) and RE2 (DuckDB) agree byte-exactly; entity
# decode is literal-replace, not regex.

_HTML_ENTITIES: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last: decodes doubly-escaped forms conservatively
]


def strip_html(text: Column) -> Column:
    """Strip HTML to visible text — the extraction stage CommonCrawl
    calls WET: drop ``<script>``/``<style>`` blocks INCLUDING their
    contents (code is never training text), strip every remaining tag
    (keeping element text), decode the common entities, and collapse
    runs of whitespace to single spaces.

    Pure projection (regexp_replace + replace chain): whole-stage
    codegen'd, no shuffle, scales with the scan. Entity order matters
    and is fixed: ``&amp;`` decodes last so ``&amp;lt;`` becomes the
    literal ``&lt;``, never ``<`` — decoding must not re-introduce
    markup that tag stripping already passed."""
    t = F.regexp_replace(text, r"(?is)<script[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"<[^>]+>", " ")
    for ent, rep in _HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


#: Block-level tags whose boundaries segment a page into candidate
#: content blocks (the justext/readability block model). <br> counts:
#: boilerplate is often <br>-separated.
_BLOCK_TAG_RE = (
    r"(?i)</?(p|div|section|article|main|h[1-6]|li|ul|ol|table|tr|td|"
    r"blockquote|header|footer|nav|aside|br)[^>]*>"
)


def extract_main_content(
    html: Column,
    min_chars: int = 25,
    max_link_density: float = 0.33,
) -> Column:
    """Main-content extraction — the boilerplate-removal stage
    (justext / readability / trafilatura shape, the step RefinedWeb
    and FineWeb run between WET extraction and quality filtering):
    segment the page into blocks at block-level tag boundaries, score
    each block by visible-text length and LINK DENSITY (chars inside
    ``<a>`` / total chars), and keep only long, low-link-density
    blocks — navigation bars, footers, and related-links boxes are
    short or link-saturated, article bodies are neither. Kept blocks
    join with newlines in document order.

    Execution shape: every regex (script/style drop, link-content
    sentinel wrap, block segmentation, tag strip, whitespace collapse)
    runs ONCE per row at full-string scope inside whole-stage codegen;
    the per-block lambda uses only translate/length/substring_index —
    no per-element regex, the measured urlnorm lesson (docs/SCALE.md
    §9). Link contents are delimited with \\x01/\\x02 sentinels before
    tags are stripped, so per-block link mass survives as plain
    substring arithmetic. Zero shuffles; scales with the scan. A link
    spanning a block boundary attributes its text to the block where
    it opens (documented approximation)."""
    t = F.regexp_replace(html, r"(?is)<script[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    # sentinel-wrap anchor CONTENTS, then segment blocks, then strip
    # the remaining tags — order matters: the <a> tags themselves must
    # still exist when the wrap runs
    t = F.regexp_replace(t, r"(?is)<a(\s[^>]*)?>(.*?)</a>", "\x01$2\x02")
    t = F.regexp_replace(t, _BLOCK_TAG_RE, "\x00")
    t = F.regexp_replace(t, r"<[^>]+>", " ")
    for ent, rep in _HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    t = F.regexp_replace(t, r"\s+", " ")

    blocks = F.split(t, "\x00")

    def clean(b: Column) -> Column:
        return F.trim(F.translate(b, "\x01\x02", ""))

    def link_chars(b: Column) -> Column:
        # sum of lengths between each \x01 and its \x02: split on
        # \x01; for every later part, chars before the first \x02
        parts = F.split(b, "\x01")
        return F.aggregate(
            F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0))),
            F.lit(0),
            lambda acc, p: acc + F.length(F.substring_index(p, "\x02", 1)),
        )

    kept = F.filter(
        blocks,
        lambda b: (F.length(clean(b)) >= min_chars)
        & (
            link_chars(b).cast("double")
            <= F.lit(max_link_density) * F.length(clean(b)).cast("double")
        ),
    )
    return F.array_join(F.transform(kept, clean), "\n")


# ------------------------------------------------------- text normalization
# Typographic / control-character cleanup (the ftfy-lite step every web
# corpus runs after extraction). Pure replace/regexp_replace chain with
# RE2-safe classes — zero shuffles, byte-reproducible cross-engine.

_NORMALIZE_MAP: list[tuple[str, str]] = [
    (" ", " "),  # no-break space
    ("‘", "'"),
    ("’", "'"),
    ("“", '"'),
    ("”", '"'),
    ("–", "-"),  # en dash
    ("—", "-"),  # em dash
    ("…", "..."),
    ("​", ""),  # zero-width space
    ("‌", ""),  # zero-width non-joiner
    ("‍", ""),  # zero-width joiner
    ("﻿", ""),  # BOM / zero-width no-break
]


def normalize_text(text: Column) -> Column:
    """Normalize typographic noise to plain ASCII forms: NBSP to space,
    curly quotes to straight, en/em dashes to hyphen, ellipsis to three
    dots, zero-width characters removed, C0/DEL control characters to
    space, whitespace runs collapsed, ends trimmed. Literal-replace for
    the mapped characters (fixed order), one regex class for controls —
    no lookaround, no backreferences, so Java regex and RE2 agree."""
    t = text
    for src, dst in _NORMALIZE_MAP:
        t = F.replace(t, F.lit(src), F.lit(dst))
    t = F.regexp_replace(t, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", " ")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def split_sentences(text: Column) -> Column:
    """Deterministic rule-based sentence segmentation (the primitive
    sentence-level dedup and chunk-boundary alignment build on): a
    sentence ends at a run of terminal punctuation ``[.!?]`` followed
    by whitespace. Implemented by inserting a \\x1e separator after
    each terminal run and splitting — NO lookarounds, because RE2
    (DuckDB, and the 100 TB-safe regex subset this repo sticks to)
    has none, so the exact same rule is twin-derivable. Abbreviation
    handling ("Dr. Who") is out of scope and documented: a rule split
    is deterministic and cross-engine byte-stable, which the dedup
    keys care about more than linguistic perfection. Empty/whitespace
    sentences are dropped; '' and NULL input yield an empty array.
    Row-local projection — zero shuffles."""
    marked = F.regexp_replace(text, r"([.!?]+)\s+", "$1\x1e")
    parts = F.transform(F.split(marked, "\x1e"), F.trim)
    return F.filter(parts, lambda x: x != "")


def chunk_tokens(
    text: Column, chunk_size: int, overlap: int = 0
) -> Column:
    """Split a document into fixed-token-budget chunks with optional
    overlap — the retrieval/embedding chunking pass (every RAG and
    embedding pipeline runs one). Returns array<struct<chunk_idx int,
    chunk string, n_tokens int>>; chunks step by ``chunk_size -
    overlap`` and the last partial chunk is kept. Row-local higher-
    order expressions only — the corpus explodes AFTER chunking, so
    the shuffle (if any downstream) carries chunk rows, never
    re-splits text."""
    if chunk_size <= 0:
        raise ValueError(f"chunk_size must be positive: {chunk_size}")
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"overlap must be in [0, chunk_size): {overlap}")
    step = chunk_size - overlap
    toks = F.filter(F.split(text, TOKEN_SPLIT), lambda t: t != "")
    n = F.size(toks)
    # greatest(…, 1) guards 0 < n <= overlap: a tiny doc is ONE chunk,
    # not zero (the raw formula floors to 0 there); the outer n_chunks
    # > 0 branch below still maps truly empty docs to []
    n_chunks = F.when(
        n > 0,
        F.greatest(
            F.ceil((n - F.lit(overlap)) / F.lit(step)).cast("int"), F.lit(1)
        ),
    ).otherwise(F.lit(0))
    chunks = F.transform(
        F.sequence(F.lit(1), n_chunks),
        lambda i: F.struct(
            (i - 1).cast("int").alias("chunk_idx"),
            F.array_join(
                F.slice(toks, (i - 1) * step + 1, chunk_size), TOKEN_SPLIT
            ).alias("chunk"),
            F.least(
                F.lit(chunk_size), n - (i - 1) * step
            ).cast("int").alias("n_tokens"),
        ),
    )
    # empty documents chunk to [] (and the guard keeps sequence() from
    # going descending — the d3978c3 footgun)
    return F.when(n_chunks > 0, chunks).otherwise(
        F.expr("array()").cast(
            "array<struct<chunk_idx:int,chunk:string,n_tokens:int>>"
        )
    )


def vocab_growth(
    df: DataFrame,
    id_col: str,
    text_col: str,
    batch_width: int,
    ngram: int = 1,
) -> DataFrame:
    """Vocabulary growth curve over ingestion order — the Heaps'-law
    corpus freshness signal: per ``batch_width``-document ingest
    batch, how many NEVER-SEEN-BEFORE tokens appear and the cumulative
    vocabulary size (``ngram`` > 1 tracks n-gram-type growth — the
    signal that keeps moving after a small unigram vocab saturates).
    A growth curve that flattens says new data is
    recombining old vocabulary (crawl saturation / duplication); a
    jump flags a domain shift worth inspecting before training.
    ``(batch, n_new, vocab_cum)``.

    One (token)-keyed min-batch aggregate (map-side combinable — the
    corpus never shuffles more than (token, batch) pairs), one tiny
    per-batch count, and a cumulative window over the batch table
    (rows = corpus/batch_width, never token- or row-scale).
    """
    from pyspark.sql import Window

    if batch_width < 1:
        raise ValueError("batch_width must be >= 1")
    unit = (
        F.split(F.col(text_col), TOKEN_SPLIT)
        if ngram == 1
        else shingles(F.col(text_col), ngram)
    )
    toks = df.select(
        F.expr(f"CAST({id_col} AS BIGINT) div {batch_width}").alias("__b"),
        F.explode(unit).alias("tok"),
    )
    first_seen = toks.groupBy("tok").agg(F.min("__b").alias("batch"))
    per_batch = first_seen.groupBy("batch").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    w = (
        Window.orderBy("batch")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return per_batch.select(
        "batch", "n_new", F.sum("n_new").over(w).alias("vocab_cum")
    )


def zipf_fit(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Zipf's-law fit over the corpus rank-frequency curve: OLS slope
    and intercept of ln(freq) against ln(rank) — the one-row corpus
    health metric (natural text sits near slope −1; templated/
    duplicated corpora flatten the head, OCR noise fattens the tail;
    drift between crawls flags distribution shift before any model
    sees the data).

    One token groupBy (the vocabulary shuffle every corpus stat
    shares), one row_number sort over the VOCAB table (types, not
    tokens), one scalar aggregate. Double sums over vocab-sized
    inputs round to 6 dp in 1e6 fixed point — accumulation-order
    noise (~1e-12 relative) is far below the rounding grain, so the
    result is engine-portable (the lsh/mmr cosine precedent).
    Returns ``(n_types, n_tokens, slope_e6, intercept_e6)``.
    """
    from pyspark.sql import Window

    tok = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("tok").asc())
    pts = vocab.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("cnt").cast("double")).alias("y"),
        "cnt",
    )
    agg = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    return agg.select(
        F.col("n").alias("n_types"),
        "n_tokens",
        F.round(slope * 1e6, 0).cast("bigint").alias("slope_e6"),
        F.round(intercept * 1e6, 0).cast("bigint").alias("intercept_e6"),
    )


def ngram_novelty(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's
    DISTINCT word n-grams that appear in NO other document (df == 1)
    — high novelty marks genuinely fresh content; low novelty marks
    boilerplate, template spam, or memorization-prone duplication that
    survived exact dedup. The leave-one-out complement of the T5/T12
    duplication signals.

    One n-gram explode (distinct per doc) + one gram-keyed df count +
    one doc-keyed ratio — the standard inverted-index shuffle pair,
    vocabulary-bounded on the gram side. Integer 1e4 fixed-point
    output: ``(id, n_grams, novel_e4)``; docs shorter than n words
    emit n_grams = 0, novel_e4 = 0 (div guard).
    """
    toks = F.split(F.col(text_col), " ")
    grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            # guard: sequence(1, 0) DESCENDS in Spark — short docs must
            # yield no grams, not bogus ones
            F.when(
                F.size(toks) >= n,
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
                    )
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    )
    df_counts = grams.groupBy("gram").agg(
        F.countDistinct("id").alias("df")
    )
    per_doc = (
        grams.join(df_counts, "gram")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum((F.col("df") == 1).cast("bigint")).alias("novel"),
        )
    )
    ids = docs.select(F.col(id_col).alias("id"))
    return ids.join(per_doc, "id", "left").select(
        "id",
        F.coalesce(F.col("n_grams"), F.lit(0)).cast("bigint").alias("n_grams"),
        F.expr(
            "(10000 * coalesce(novel, 0)) div greatest(coalesce(n_grams, 0), 1)"
        ).cast("bigint").alias("novel_e4"),
    )


def source_drift_matrix(
    df: DataFrame,
    source_col: str,
    text_col: str,
    n_buckets: int = 1024,
    salt: str = "drift:",
) -> DataFrame:
    """Pairwise corpus-DRIFT matrix: total-variation distance between
    every two sources' hashed-unigram distributions — the monitoring
    statistic a pipeline alarms on when a new crawl snapshot's token
    mix shifts against the previous one (the distribution-shift twin
    of the KMV overlap matrix, which only sees set membership).

    Pure integer (the pmi discipline): with bucket counts ``c_a``,
    ``c_b`` and totals ``N_a``, ``N_b``,

        l1_num = sum_b |c_a[b]*N_b - c_b[b]*N_a|
        TV     = l1_num / (2*N_a*N_b)      (in [0, 1])

    so the hashed surface is ``(src_a, src_b, n_a, n_b, l1_num,
    tv_e4)`` — every value BIGINT, ``tv_e4 = (l1_num*10000) div
    (2*n_a*n_b)`` exact in any engine. Buckets are the portable
    salted-md5 hash, so the statistic replays outside Spark.

    Scale shape: ONE token pass -> one (source, bucket)-keyed count
    shuffle (map-side combinable, <= |sources|*B rows out); the
    matrix is computed on an explicit (pair x union-bucket) grid —
    S^2*B rows of SKETCH, never data (the kmv_overlap_matrix
    posture). B bounds memory; raw text is touched once.
    """
    from jane_spark.functions.sampling import hash_bucket

    B = int(n_buckets)
    counts = (
        df.select(
            F.col(source_col).alias("src"),
            F.explode(F.split(F.col(text_col), TOKEN_SPLIT, -1)).alias(
                "tok"
            ),
        )
        .select("src", hash_bucket(F.col("tok"), B, salt).alias("b"))
        .groupBy("src", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    srcs = counts.select("src").distinct()
    buckets = counts.select("b").distinct()
    grid = (
        srcs.select(F.col("src").alias("src_a"))
        .crossJoin(srcs.select(F.col("src").alias("src_b")))
        .where(F.col("src_a") < F.col("src_b"))
        .crossJoin(buckets)
    )
    ca = counts.select(
        F.col("src").alias("src_a"), "b", F.col("c").alias("ca")
    )
    cb = counts.select(
        F.col("src").alias("src_b"), "b", F.col("c").alias("cb")
    )
    totals = counts.groupBy("src").agg(F.sum("c").alias("n"))
    ta = totals.select(F.col("src").alias("src_a"), F.col("n").alias("n_a"))
    tb = totals.select(F.col("src").alias("src_b"), F.col("n").alias("n_b"))
    scored = (
        grid.join(ca, ["src_a", "b"], "left")
        .join(cb, ["src_b", "b"], "left")
        .join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_a",
            "n_b",
            F.abs(
                F.coalesce(F.col("ca"), F.lit(0)) * F.col("n_b")
                - F.coalesce(F.col("cb"), F.lit(0)) * F.col("n_a")
            ).alias("term"),
        )
    )
    return (
        scored.groupBy("src_a", "src_b", "n_a", "n_b")
        .agg(F.sum("term").cast("bigint").alias("l1_num"))
        .select(
            "src_a",
            "src_b",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            "l1_num",
            F.expr("(l1_num * 10000) div (2 * n_a * n_b)")
            .cast("bigint")
            .alias("tv_e4"),
        )
    )
