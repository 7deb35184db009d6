"""Deduplication operators (SURVEY.md §2 A4/D5/K1/K2 + north-star).

jane dedups uploads by content sha1 (unique per document type) and
resolves re-uploads to new versions [ref: src/jane/documents/models.py —
Document sha1 + upload path, conf=M; SURVEY.md §0 caveat]. The
north-star pipeline extends this to near-duplicate text detection at
100 TB: MinHash banding (LSH) and SimHash, both expressed as DataFrame
transformations whose joins are *equi* joins on bucket keys — never a
pairwise cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from jane_spark.operators.topk import argmax


# ------------------------------------------------------------ exact dedup


def exact_dedup(
    df: DataFrame,
    content_col: str,
    keep_order: list[Column],
    hash_fn: str = "md5",
) -> DataFrame:
    """Content-hash dedup keeping the first row per hash under
    ``keep_order`` (jane: sha1 unique + earliest wins; contract uses md5
    because DuckDB 1.0 lacks sha1 — SURVEY.md §2 H6).

    One shuffle on the hash. At 100 TB the hash groupBy is the cheapest
    possible dedup: map-side partial aggregation does most of the work.
    """
    hashed = df.withColumn("__h", getattr(F, hash_fn)(F.col(content_col)))
    return argmax(hashed, ["__h"], keep_order).drop("__h")


def duplicate_groups(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """All hash groups with >1 member — the audit view of exact dedup."""
    return (
        df.groupBy(F.md5(F.col(content_col)).alias("content_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_dupes"),
            F.sort_array(F.collect_set(F.col(id_col))).alias("ids"),
        )
        .filter(F.col("n_dupes") > 1)
    )


# ------------------------------------------------------- near-dup: MinHash


def _minhash_cols(token_array: Column, n_hashes: int) -> list[Column]:
    """k independent min-hashes of a token array via xxhash64 with per-
    function seeds. Higher-order functions only — JVM-side, no UDF."""
    cols = []
    for seed in range(n_hashes):
        hashed = F.transform(token_array, lambda t: F.xxhash64(t, F.lit(seed)))
        cols.append(F.array_min(hashed).alias(f"mh_{seed}"))
    return cols


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int = 32, shingle: int = 3
) -> DataFrame:
    """Word-shingle MinHash signature per document.

    shingles: k consecutive tokens joined — built with transform over a
    sequence of start offsets, then min-hashed per hash function.
    """
    tokens = F.split(F.col(text_col), " ")
    n = F.greatest(F.size(tokens) - (shingle - 1), F.lit(1))
    shingles = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, shingle)),
    )
    return df.select(F.col(id_col), *_minhash_cols(shingles, n_hashes))


def minhash_candidate_pairs(
    sigs: DataFrame, id_col: str, n_hashes: int = 32, bands: int = 8
) -> DataFrame:
    """LSH banding: split the signature into bands, hash each band to a
    bucket, equi-join on (band, bucket) → candidate pairs. This is the
    100 TB shape: shuffle keyed by band-bucket, never all-pairs."""
    rows_per_band = n_hashes // bands
    band_cols = [
        F.xxhash64(*[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]).alias(
            f"band_{b}"
        )
        for b in range(bands)
    ]
    banded = sigs.select(F.col(id_col), *band_cols)
    melted = banded.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"band_{b}").alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    a = melted.alias("a")
    b = melted.alias("b")
    pairs = (
        a.join(
            b,
            on=(
                (F.col(f"a.band") == F.col(f"b.band"))
                & (F.col(f"a.bucket") == F.col(f"b.bucket"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            ),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .dropDuplicates()
    )
    return pairs


# ------------------------------------------------------- near-dup: SimHash


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """64-bit SimHash per document from word tokens: sum per-bit ±1 votes
    of each token's xxhash64, take the sign bit-vector. Expressed with
    explode + groupBy bit-votes (map-side combinable)."""
    from functools import reduce

    tokens = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    # bit i of each token hash via unsigned shift (no 1<<63 long literals —
    # those overflow under ANSI arithmetic)
    votes = [
        F.sum(
            F.when(F.shiftrightunsigned(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    agg = tokens.groupBy(id_col).agg(*votes)
    bit_cols = [
        F.when(
            F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        for i in range(bits)
    ]
    sig = agg.select(
        F.col(id_col),
        reduce(lambda a, b: a.bitwiseOR(b), bit_cols).alias("simhash"),
    )
    return sig


def simhash_near_pairs(sig: DataFrame, id_col: str, max_hamming: int = 3) -> DataFrame:
    """Candidate pairs within a Hamming radius via 4-block banding
    (pigeonhole: ≤3 differing bits ⇒ at least one 16-bit block equal) —
    equi-join per block, exact Hamming residual via bit_count(xor)."""
    blocks = [
        F.shiftrightunsigned(F.col("simhash"), 16 * b)
        .bitwiseAND(F.lit(0xFFFF))
        .alias(f"blk_{b}")
        for b in range(4)
    ]
    b_df = sig.select(id_col, "simhash", *blocks)
    out = None
    for b in range(4):
        a = b_df.alias("a")
        c = b_df.alias("b")
        p = a.join(
            c,
            on=(
                (F.col(f"a.blk_{b}") == F.col(f"b.blk_{b}"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            ),
        ).select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        out = p if out is None else out.unionByName(p)
    return out.filter(F.col("hamming") <= max_hamming).dropDuplicates(["id_a", "id_b"])


# ------------------------------- portable-hash variants (oracle-checkable)
#
# xxhash64 is Spark-only; these variants derive every hash from md5 hex
# (the one digest Spark and DuckDB share), so MinHash and SimHash
# signatures are bit-for-bit reproducible outside Spark — the audit path
# for cross-engine pipelines. ~2-3x the hash cost of xxhash64: keep the
# xxhash64 paths for production scale, use portable mode to certify.


def portable_hash32(s: Column) -> Column:
    """32-bit integer hash from the first 8 md5 hex chars.

    DuckDB twin: ``CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT)``.
    """
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")


def minhash_signatures_portable(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int = 16, shingle: int = 3
) -> DataFrame:
    """MinHash signature from salted portable hashes (seed-salted md5
    instead of seeded xxhash64); shingling identical to
    minhash_signatures."""
    tokens = F.split(F.col(text_col), " ")
    n = F.greatest(F.size(tokens) - (shingle - 1), F.lit(1))
    shingles = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, shingle)),
    )
    def salted(seed: int):
        # NB: must stay a ONE-arg lambda — F.transform hands a second
        # positional arg (the element index) to two-arg callables, so a
        # `s=seed` default would silently receive the index instead
        return lambda t: portable_hash32(F.concat(F.lit(f"{seed}:"), t))

    cols = [
        F.array_min(F.transform(shingles, salted(seed))).alias(f"mh_{seed}")
        for seed in range(n_hashes)
    ]
    return df.select(F.col(id_col), *cols)


def simhash32_portable(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """32-bit SimHash from portable token hashes — same vote/sign
    construction as simhash(); cross-engine reproducible."""
    from functools import reduce

    bits = 32
    tokens = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).withColumn("h", portable_hash32(F.col("tok")))
    votes = [
        F.sum(
            F.when(F.shiftrightunsigned(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    agg = tokens.groupBy(id_col).agg(*votes)
    bit_cols = [
        F.when(
            F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        for i in range(bits)
    ]
    return agg.select(
        F.col(id_col),
        reduce(lambda a, b: a.bitwiseOR(b), bit_cols).alias("simhash32"),
    )


# ---------------------------------------- near-dup: fuzzy string matching


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 1,
    hot_block_threshold: int = 128,
    max_salts: int = 256,
) -> DataFrame:
    """Equal-length string pairs within Levenshtein distance 1, via
    lossless pigeonhole blocking — the record-linkage primitive
    (near-identical names/titles/urls differing in one character).

    Why the blocking is exact, not approximate: two EQUAL-LENGTH
    strings with Levenshtein ≤ 1 are identical or differ in exactly one
    substitution (any single indel would change the length), so
    splitting both into two halves guarantees one half is identical
    (pigeonhole). Equi-joining on (length, half index, half value)
    therefore finds EVERY qualifying pair; the exact
    ``levenshtein() <= 1`` residual discards false candidates.
    Same-length-only semantics are part of the operator contract.

    ``max_dist`` must be 1: for d ≥ 2 an insertion+deletion pair keeps
    the length but SHIFTS every chunk, so positional chunk blocking is
    no longer lossless (unit-test-demonstrated). Radius ≥ 2 needs
    substring-seed blocking with a position-shift window (PassJoin /
    Ed-Join family) — out of scope here; use minhash/simhash for larger
    radii.

    Scale shape: the join is an equi-join on (length, chunk index,
    chunk text) — shuffle-partitioned by block, never a cross product.
    The residual runs on the COMPLEMENTARY half only: with one half
    equal and lengths equal, lev(full) ≤ 1 ⇔ lev(other half) ≤ 1 and
    the distances coincide in that range — half-length levenshtein is
    ~4× cheaper (O(L²) DP), which matters in hot blocks.

    Hot-block salting: a chunk value shared by a huge cluster (a common
    name prefix — the classic LSH hot-bucket problem) funnels m² pair
    candidates through ONE join key, serializing the stage. Blocks
    larger than ``hot_block_threshold`` are split into
    ``s = ceil(size / threshold)`` salt groups (deterministic hash of
    the complement half + id, capped at ``max_salts``), and the m²
    candidate grid is tiled into s·(s+1)/2 triangle cells — row with
    salt g joins as the LEFT side of cells (g, j≥g) and the RIGHT side
    of cells (i≤g, g), so every unordered salt pair lands in exactly
    one cell and the pair set is EXACTLY the unsalted one (equivalence
    proven in tests against the brute-force oracle). Quadratic WORK is
    inherent to the pair semantics; salting distributes it across the
    cluster instead of one task. Cold blocks get s = 1 — a single cell,
    zero row inflation.
    """
    if max_dist != 1:
        raise ValueError(
            "fuzzy_pairs supports max_dist=1 only: positional chunk "
            "blocking is not lossless for Levenshtein >= 2 (indel pairs "
            "shift chunks); use minhash/simhash for larger radii"
        )
    n_chunks = max_dist + 1
    length = F.length(F.col(text_col))
    half = F.floor(length / n_chunks).cast("int")
    # chunk 0 = first half, chunk 1 = second half (1-based substr);
    # each row carries its block half (cv) AND the complement (ov) so
    # the residual never touches the full string.
    first = F.substring(F.col(text_col), F.lit(1), half)
    second = F.substring(F.col(text_col), half + 1, length.cast("int"))
    chunks = F.array(
        F.struct(F.lit(0).alias("ci"), first.alias("cv"), second.alias("ov")),
        F.struct(F.lit(1).alias("ci"), second.alias("cv"), first.alias("ov")),
    )
    blocked = df.select(
        F.col(id_col), length.alias("__len"), F.explode(chunks).alias("__c")
    ).select(
        id_col,
        "__len",
        F.col("__c.ci").alias("__ci"),
        F.col("__c.cv").alias("__cv"),
        F.col("__c.ov").alias("__ov"),
    )
    # per-block salt count: 1 for cold blocks (no inflation), size/N
    # salt groups for hot ones. The count is one shuffle of m ROWS per
    # block (not m² pairs) on the same key the join uses.
    block_w = Window.partitionBy("__len", "__ci", "__cv")
    salted = (
        blocked.withColumn("__bs", F.count(F.lit(1)).over(block_w))
        .withColumn(
            "__s",
            F.least(
                F.ceil(F.col("__bs") / F.lit(hot_block_threshold)),
                F.lit(max_salts),
            ).cast("int"),
        )
        .withColumn(
            "__g",
            F.pmod(F.xxhash64(F.col("__ov"), F.col(id_col)), F.col("__s")).cast(
                "int"
            ),
        )
        .drop("__bs")
    )
    # triangle tiling: left covers cells (g, j >= g), right covers
    # cells (i <= g, g); an unordered salt pair {ga, gb} meets in
    # exactly the cell (min, max).
    a = salted.withColumn(
        "__j", F.explode(F.sequence(F.col("__g"), F.col("__s") - 1))
    ).withColumnRenamed("__g", "__i").alias("a")
    b = salted.withColumn(
        "__i", F.explode(F.sequence(F.lit(0), F.col("__g")))
    ).withColumnRenamed("__g", "__j").alias("b")
    # A pair meets in cell (min salt, max salt) with SIDES FIXED by
    # salt (left = smaller salt), so ids can arrive in either order:
    # canonicalize with least/greatest. Diagonal cells (i == j) hold
    # both orientations — keep id< there to halve candidates and drop
    # self-pairs; off-diagonal sides are disjoint salt groups, so no
    # self-pairs exist and every pair appears exactly once.
    diag = F.col("a.__i") == F.col("a.__j")
    cand = a.join(
        b,
        on=(
            (F.col("a.__len") == F.col("b.__len"))
            & (F.col("a.__ci") == F.col("b.__ci"))
            & (F.col("a.__cv") == F.col("b.__cv"))
            & (F.col("a.__i") == F.col("b.__i"))
            & (F.col("a.__j") == F.col("b.__j"))
            & F.when(
                diag, F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
            ).otherwise(F.lit(True))
        ),
    ).select(
        F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_a"),
        F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_b"),
        # one half equal + equal length ⇒ lev(full) == lev(complement)
        # whenever either is <= 1 (a single substitution lives entirely
        # in the complementary half)
        F.levenshtein(F.col("a.__ov"), F.col("b.__ov")).alias("dist"),
    )
    return cand.filter(F.col("dist") <= max_dist).dropDuplicates(["id_a", "id_b"])
