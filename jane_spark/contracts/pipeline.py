"""Training-data pipeline contracts (north-star, beyond SURVEY §2.11 K):
deterministic splits/sampling/mixing, benchmark decontamination, PII
redaction, sequence packing, plus oracle-checkable upgrades of the
language-ID and fingerprint rows (K6/K1 — previously rows-only).

These are the operations a 100 TB pre-training corpus build runs between
"raw documents" and "tokenizer input". Design rules applied throughout:
every sampling decision is a salted-hash projection (no RNG, no shuffle,
partition-layout-independent — functions/sampling.py), the decontam join
broadcasts the benchmark side, and everything stays in built-in column
functions (whole-stage codegen; zero Python UDFs in this module).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from jane_spark.contracts.northstar import LANGID_ORACLE
from jane_spark.contracts.registry import contract
from jane_spark.engine.catalog import Catalog

# DuckDB fragment mirroring functions.sampling.hash_bucket
_DUCK_BUCKET = (
    "CAST(concat('0x', substr(md5(concat('{salt}', CAST({key} AS VARCHAR))),"
    " 1, 8)) AS BIGINT) % {n}"
)


@contract(
    "q_p1_hash_split",
    oracle=f"""
        WITH b AS (
            SELECT n_chars,
                   {_DUCK_BUCKET.format(salt="split:", key="doc_id", n=10000)}
                       AS bucket
            FROM documents)
        SELECT CASE WHEN bucket < 8000 THEN 'train'
                    WHEN bucket < 9000 THEN 'val'
                    ELSE 'test' END AS split,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM b GROUP BY split
    """,
    survey_rows="K1,K6",
    doc="deterministic 80/10/10 train/val/test split via salted hash "
    "bucket (functions.sampling.split_assign) — reproducible across "
    "runs/cluster sizes, pure projection, no RNG state",
)
def q_p1(spark, sf_dir):
    from jane_spark.functions.sampling import split_assign

    docs = Catalog(spark, sf_dir).documents
    split = split_assign(
        F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1}, salt="split:"
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@contract(
    "q_p2_stratified_sample",
    oracle=f"""
        WITH b AS (
            SELECT lang, text,
                   {_DUCK_BUCKET.format(salt="sample:", key="doc_id", n=10000)}
                       AS bucket
            FROM documents)
        SELECT lang, count(*) AS n_kept,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                   AS tokens_kept
        FROM b
        WHERE bucket < (CASE lang WHEN 'en' THEN 5000
                                  WHEN 'zh' THEN 2500
                                  ELSE 10000 END)
        GROUP BY lang
    """,
    survey_rows="K6,K1",
    doc="stratified deterministic downsampling (rebalance the language "
    "mix: keep 50% en, 25% zh, 100% rest) — the hash filter is a pure "
    "pushed-down predicate (functions.sampling.stratified_keep)",
)
def q_p2(spark, sf_dir):
    from jane_spark.functions.sampling import stratified_keep
    from jane_spark.functions.text import token_count

    docs = Catalog(spark, sf_dir).documents
    keep = stratified_keep(
        F.col("doc_id"), F.col("lang"), {"en": 0.5, "zh": 0.25}, salt="sample:"
    )
    return (
        docs.filter(keep)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum(token_count(F.col("text"))).cast("bigint").alias("tokens_kept"),
        )
    )


@contract(
    "q_p3_upsample",
    oracle="""
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM (SELECT lang, doc_id,
                     unnest(generate_series(1, CASE lang WHEN 'fr' THEN 3
                                                         WHEN 'de' THEN 2
                                                         ELSE 1 END)) AS epoch
              FROM documents)
        GROUP BY lang
    """,
    survey_rows="K6",
    doc="epoch-weighted upsampling (mixture weights: fr x3, de x2): "
    "explode(sequence(1, factor)) — a narrow per-row flatMap, no "
    "shuffle until the final agg (functions.sampling.repeat_factor)",
)
def q_p3(spark, sf_dir):
    from jane_spark.functions.sampling import repeat_factor

    docs = Catalog(spark, sf_dir).documents
    k = repeat_factor(F.col("lang"), {"fr": 3, "de": 2})
    return (
        docs.select(
            "lang", "doc_id", F.explode(F.sequence(F.lit(1), k)).alias("epoch")
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


@contract(
    "q_p4_pack",
    oracle="""
        WITH t AS (
            SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tok
            FROM documents),
        c AS (
            SELECT lang, n_tok,
                   sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) AS cum
            FROM t),
        blk AS (
            SELECT lang, n_tok,
                   CAST(floor((cum - n_tok) / 2048.0) AS BIGINT) AS block
            FROM c)
        SELECT lang,
               CAST(count(DISTINCT block) AS BIGINT) AS n_blocks,
               round(CAST(sum(n_tok) AS DOUBLE) / count(DISTINCT block), 4)
                   AS avg_block_tokens
        FROM blk GROUP BY lang
    """,
    survey_rows="E3,K4",
    doc="sequence packing: assign docs to fixed 2048-token context "
    "blocks per language via running token count (window cumsum — the "
    "standard pre-tokenization packing pass). Deterministic order: "
    "(lang, doc_id)",
)
def q_p4(spark, sf_dir):
    from jane_spark.functions.text import token_count

    docs = Catalog(spark, sf_dir).documents
    t = docs.select(
        "lang", "doc_id", token_count(F.col("text")).cast("bigint").alias("n_tok")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    blk = t.select(
        "lang",
        "n_tok",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / 2048.0).alias("block"),
    )
    return blk.groupBy("lang").agg(
        F.countDistinct("block").alias("n_blocks"),
        F.round(
            F.sum("n_tok").cast("double") / F.countDistinct("block"), 4
        ).alias("avg_block_tokens"),
    )


@contract(
    "q_p5_pipeline",
    oracle=f"""
        WITH f AS (
            SELECT doc_id, text,
                   len(string_split(text, ' ')) AS n_tok,
                   len(list_filter(string_split(text, ' '),
                       t -> list_contains(['data','table','row','value'], t)))
                       / CAST(len(string_split(text, ' ')) AS DOUBLE)
                       AS stop_ratio
            FROM documents),
        q AS (SELECT * FROM f WHERE n_tok >= 30 AND stop_ratio <= 0.25),
        d AS (SELECT md5(array_to_string(string_split(lower(text), ' '), ' '))
                         AS fp,
                     min(doc_id) AS doc_id,
                     min(n_tok) AS n_tok
              FROM q GROUP BY fp),
        s AS (SELECT n_tok,
                     {_DUCK_BUCKET.format(salt="split:", key="doc_id", n=10000)}
                         AS bucket
              FROM d)
        SELECT CASE WHEN bucket < 8000 THEN 'train'
                    WHEN bucket < 9000 THEN 'val'
                    ELSE 'test' END AS split,
               count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS total_tokens
        FROM s GROUP BY split
    """,
    survey_rows="K1,K6,P1",
    doc="END-TO-END training-data pipeline in ONE composed plan: quality "
    "filter (token count + stopword ratio) -> exact dedup on the "
    "normalized md5 fingerprint (argmin doc_id via struct-min, no "
    "join-back) -> deterministic 80/10/10 hash split -> per-split "
    "corpus stats. Physical shape: pushed-down projection/filter, then "
    "exactly two shuffles (fingerprint agg, split agg) — the minimum "
    "for a dedup pipeline at any scale; every sampling decision is a "
    "salted-hash projection",
)
def q_p5(spark, sf_dir):
    from jane_spark.functions.sampling import split_assign
    from jane_spark.functions.text import (
        fingerprint_hex,
        stopword_ratio,
        token_count,
    )

    docs = Catalog(spark, sf_dir).documents
    stops = ["data", "table", "row", "value"]
    f = docs.select(
        "doc_id",
        "text",
        token_count(F.col("text")).alias("n_tok"),
        stopword_ratio(F.col("text"), stops).alias("stop_ratio"),
    )
    q = f.filter((F.col("n_tok") >= 30) & (F.col("stop_ratio") <= 0.25))
    d = (
        q.select(fingerprint_hex(F.col("text")).alias("fp"), "doc_id", "n_tok")
        .groupBy("fp")
        .agg(F.min(F.struct("doc_id", "n_tok")).alias("keep"))
        .select(F.col("keep.doc_id").alias("doc_id"), F.col("keep.n_tok").alias("n_tok"))
    )
    split = split_assign(
        F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1}, salt="split:"
    )
    return (
        d.select(split.alias("split"), "n_tok")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
        )
    )


# word-3-gram shingle prep shared by the decontamination contracts
# (q_t5 drop + q_t26 attribution): ONE definition each side so the
# shingle unit can never silently diverge between the two
_SHINGLE_CTE = """
        t AS (SELECT doc_id, string_split(text, ' ') AS toks
                   FROM documents),
        s AS (SELECT doc_id,
                     list_distinct(list_transform(
                         generate_series(1, len(toks) - 2),
                         i -> array_to_string(toks[i:i+2], ' '))) AS sh
              FROM t WHERE len(toks) >= 3)
"""


def _shingled_docs(spark, sf_dir):
    from jane_spark.functions.text import shingles

    docs = Catalog(spark, sf_dir).documents
    return docs.filter(F.size(F.split("text", " ")) >= 3).select(
        "doc_id", F.array_distinct(shingles(F.col("text"), 3)).alias("sh")
    )


@contract(
    "q_t5_decontam",
    oracle=f"""
        WITH {_SHINGLE_CTE},
        bench AS (SELECT DISTINCT unnest(sh) AS shingle FROM s
                  WHERE doc_id % 37 = 0),
        cand AS (SELECT doc_id, unnest(sh) AS shingle FROM s
                 WHERE doc_id % 37 <> 0)
        SELECT cand.doc_id, CAST(count(*) AS BIGINT) AS n_shared
        FROM cand JOIN bench USING (shingle)
        GROUP BY cand.doc_id
    """,
    survey_rows="K1,K4,B12",
    doc="benchmark decontamination: flag training docs sharing any word "
    "3-gram with the held-out set (doc_id%37=0 stands in for the "
    "benchmark corpus). Shingling is a pure higher-order expression "
    "(functions.text.shingles); the benchmark shingle set is broadcast "
    "— at 100 TB the eval corpus stays tiny, so the contaminated-doc "
    "scan is one shuffle-free broadcast-semi pass + final agg",
)
def q_t5(spark, sf_dir):
    s = _shingled_docs(spark, sf_dir)
    bench = (
        s.filter(F.col("doc_id") % 37 == 0)
        .select(F.explode("sh").alias("shingle"))
        .distinct()
    )
    cand = s.filter(F.col("doc_id") % 37 != 0).select(
        "doc_id", F.explode("sh").alias("shingle")
    )
    return (
        cand.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


@contract(
    "q_t6_redact",
    oracle="""
        WITH aug AS (
            SELECT doc_id,
                   concat(text, ' contact ', source,
                          '@example.com for details') AS raw
            FROM documents),
        red AS (
            SELECT doc_id, raw,
                   regexp_replace(raw, '[a-z0-9.]+@[a-z0-9.]+',
                                  '<EMAIL>', 'g') AS clean
            FROM aug)
        SELECT doc_id,
               CAST(length(raw) - length(clean) AS BIGINT) AS chars_removed,
               md5(clean) AS clean_md5
        FROM red
    """,
    survey_rows="H4,K6",
    doc="PII redaction: regexp_replace email-shaped spans with a "
    "placeholder (emails synthesized deterministically — the driver "
    "corpus contains none). Per-doc md5 of the redacted text makes the "
    "oracle check byte-exact; the alternation is identical under Java "
    "regex and RE2",
)
def q_t6(spark, sf_dir):
    # per-row regex+md5 is the cost: prefer the pinned clustered layout
    # (bench pins documents; unpinned falls back to the parquet scan,
    # where a single-row-group file would serialize into one task)
    docs = Catalog(spark, sf_dir).clustered("documents", "doc_id")
    raw = F.concat(
        F.col("text"), F.lit(" contact "), F.col("source"),
        F.lit("@example.com for details"),
    )
    clean = F.regexp_replace(raw, r"[a-z0-9.]+@[a-z0-9.]+", "<EMAIL>")
    return docs.select(
        "doc_id",
        (F.length(raw) - F.length(clean)).cast("bigint").alias("chars_removed"),
        F.md5(clean).alias("clean_md5"),
    )


def _zorder_oracle(bits: int = 16, n_buckets: int = 32) -> str:
    """Morton-interleave twin: same integer min-max normalization,
    same shift/mask fold, generated term by term."""
    top = (1 << bits) - 1
    width = max((1 << (2 * bits)) // n_buckets, 1)
    terms = " | ".join(
        f"(((n{i} >> {b}) & 1) << {b * 2 + i})"
        for b in range(bits)
        for i in range(2)
    )
    return f"""
        WITH b AS (SELECT min(l_partkey) AS mn0, max(l_partkey) AS mx0,
                          min(l_suppkey) AS mn1, max(l_suppkey) AS mx1
                   FROM lineitem),
        n AS (SELECT ((l_partkey - b.mn0) * {top})
                         // greatest(b.mx0 - b.mn0, 1) AS n0,
                     ((l_suppkey - b.mn1) * {top})
                         // greatest(b.mx1 - b.mn1, 1) AS n1
              FROM lineitem, b),
        z AS (SELECT CAST({terms} AS BIGINT) AS zkey FROM n)
        SELECT CAST(zkey // {width} AS BIGINT) AS zbucket,
               CAST(count(*) AS BIGINT) AS n,
               CAST(min(zkey) AS BIGINT) AS min_zkey,
               CAST(max(zkey) AS BIGINT) AS max_zkey
        FROM z GROUP BY 1
    """


@contract(
    "q_p18_zorder",
    oracle=_zorder_oracle(),
    survey_rows="P18,P8,P17",
    doc="Z-ORDER (Morton-curve) layout keys (operators.zorder): "
    "lakehouse-style multi-dimensional clustering — interleave the "
    "bits of integer-min-max-normalized (l_partkey, l_suppkey) so a "
    "bucketed/partitioned write serves range predicates on EITHER "
    "column with bounded bucket overlap. Pure-BIGINT normalization + "
    "fixed shift/mask fold (codegen, engine-portable); per-bucket "
    "count and zkey extent returned. Partition-pruning on the bucket "
    "column is plan-guard-tested in tests/test_operators.py",
)
def q_p18(spark, sf_dir):
    from jane_spark.operators.zorder import zorder_buckets

    li = Catalog(spark, sf_dir).lineitem
    return (
        zorder_buckets(li, ["l_partkey", "l_suppkey"], n_buckets=32)
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("zkey").alias("min_zkey"),
            F.max("zkey").alias("max_zkey"),
        )
    )


@contract(
    "q_p25_hrw",
    oracle="""
        WITH k AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS ks
                   FROM documents),
        h8 AS (SELECT doc_id, t.s,
                      CAST(concat('0x', substr(md5(concat('hrw:', ks, ':',
                          CAST(t.s AS VARCHAR))), 1, 15)) AS BIGINT) AS hv
               FROM k, (SELECT unnest(range(0, 8)) AS s) t),
        a8 AS (SELECT doc_id, s AS s8 FROM (
                   SELECT doc_id, s, row_number() OVER (
                       PARTITION BY doc_id ORDER BY hv DESC, s ASC) AS rn
                   FROM h8) WHERE rn = 1),
        h9 AS (SELECT doc_id, t.s,
                      CAST(concat('0x', substr(md5(concat('hrw:', ks, ':',
                          CAST(t.s AS VARCHAR))), 1, 15)) AS BIGINT) AS hv
               FROM k, (SELECT unnest(range(0, 9)) AS s) t),
        a9 AS (SELECT doc_id, s AS s9 FROM (
                   SELECT doc_id, s, row_number() OVER (
                       PARTITION BY doc_id ORDER BY hv DESC, s ASC) AS rn
                   FROM h9) WHERE rn = 1)
        SELECT CAST(s8 AS INT) AS shard8, CAST(s9 AS INT) AS shard9,
               CAST(count(*) AS BIGINT) AS n
        FROM a8 JOIN a9 USING (doc_id) GROUP BY 1, 2
    """,
    survey_rows="P25,P8,P1",
    doc="rendezvous-hash (HRW) shard placement + the RESHARD movement "
    "matrix (functions/sampling.hrw_shard — Thaler & Ravishankar "
    "1996): shard = argmax over shards of a salted 60-bit md5 hash "
    "per (key, shard). The contract assigns every document at S=8 "
    "AND S=9 and emits the (shard8, shard9, n) transition matrix — "
    "the HRW law (a grown ring moves ~1/(S+1) of keys, every one of "
    "them TO the new shard; no old->old movement) is visible in the "
    "hashed surface itself: off-diagonal mass exists only in the "
    "shard9=8 column. The operational point at 100 TB: growing a "
    "shard map re-placements 1/(S+1) of the corpus instead of "
    "mod-hashing's (S-1)/S. One column-expression fold per "
    "assignment (no explode, no window, no shuffle before the final "
    "|S8 x S9|-row aggregate); the oracle replays the argmax as a "
    "per-key rank over an unnested shard dimension",
)
def q_p25(spark, sf_dir):
    from jane_spark.functions.sampling import hrw_assignments

    docs = Catalog(spark, sf_dir).documents.select("doc_id")
    a8 = hrw_assignments(docs, "doc_id", 8).withColumnRenamed(
        "shard", "shard8"
    )
    a9 = hrw_assignments(docs, "doc_id", 9).withColumnRenamed(
        "shard", "shard9"
    )
    return (
        a8.join(a9, "doc_id")
        .groupBy("shard8", "shard9")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


@contract(
    "q_p27_shard_balance",
    oracle="""
        WITH k AS (SELECT doc_id, n_chars,
                          CAST(doc_id AS VARCHAR) AS ks
                   FROM documents),
        h AS (SELECT doc_id, n_chars, t.s,
                     CAST(concat('0x', substr(md5(concat('hrw:', ks, ':',
                         CAST(t.s AS VARCHAR))), 1, 15)) AS BIGINT) AS hv
              FROM k, (SELECT unnest(range(0, 16)) AS s) t),
        a AS (SELECT doc_id, n_chars, s FROM (
                  SELECT doc_id, n_chars, s, row_number() OVER (
                      PARTITION BY doc_id ORDER BY hv DESC, s ASC) AS rn
                  FROM h) WHERE rn = 1),
        per AS (SELECT s, CAST(sum(n_chars) AS BIGINT) AS w
                FROM a GROUP BY s),
        r AS (SELECT w, row_number() OVER (ORDER BY w ASC, s ASC) AS i
              FROM per),
        g AS (SELECT CAST(count(*) AS BIGINT) AS n_shards,
                     CAST(sum(w) AS BIGINT) AS total_w,
                     CAST(min(w) AS BIGINT) AS min_w,
                     CAST(max(w) AS BIGINT) AS max_w,
                     CAST(sum(i * w) AS BIGINT) AS s_iw
              FROM r)
        SELECT n_shards, total_w, min_w, max_w,
               CAST(2 * s_iw - (n_shards + 1) * total_w AS BIGINT)
                   AS gini_num,
               CAST(n_shards * total_w AS BIGINT) AS gini_den,
               CAST(CASE WHEN n_shards * total_w = 0 THEN NULL
                    ELSE ((2 * s_iw - (n_shards + 1) * total_w) * 10000)
                         // (n_shards * total_w) END AS BIGINT) AS gini_e4,
               CAST(CASE WHEN total_w = 0 THEN NULL
                    ELSE (max_w * n_shards * 10000) // total_w
               END AS BIGINT) AS skew_e4
        FROM g
    """,
    survey_rows="P27,P25,P19",
    doc="shard-BALANCE audit (operators/zonemaps.py "
    "shard_balance_audit) over P25's rendezvous-hash placement at "
    "S=16, weighted by document chars — the skew alarm every "
    "partitioned write publishes next to its P19 manifest: straggler "
    "tasks and hot files start as weight imbalance. Gini travels as "
    "the exact integer rational gini_num/gini_den via the rank "
    "identity sum_i (2i-n-1)w_i = 2*sum(i*w) - (n+1)*sum(w) "
    "(ascending order, shard-id tie-break — deterministic), plus "
    "skew_e4 = max*n*1e4 div total (the straggler ratio). One "
    "|shards|-row aggregate out of the scan, one |shards|-row "
    "window, one fold — nothing data-sized after the first shuffle",
)
def q_p27(spark, sf_dir):
    from jane_spark.functions.sampling import hrw_assignments
    from jane_spark.operators.zonemaps import shard_balance_audit

    docs = Catalog(spark, sf_dir).documents.select("doc_id", "n_chars")
    assigned = hrw_assignments(docs, "doc_id", 16)
    return shard_balance_audit(assigned, "shard", "n_chars")


def _zonemap_oracle(bits: int = 16, n_buckets: int = 32) -> str:
    """Zone-map pruning-audit twin: replays the natural (orderkey
    equal-width) and z-order layouts, the per-file min/max stats, and
    the interval-overlap skip rule, all in integer SQL."""
    top = (1 << bits) - 1
    width = max((1 << (2 * bits)) // n_buckets, 1)
    terms = " | ".join(
        f"(((n{i} >> {b}) & 1) << {b * 2 + i})"
        for b in range(bits)
        for i in range(2)
    )
    scan = "p0 <= 299 AND p1 >= 100 AND s0 <= 39 AND s1 >= 10"
    stats = """
        SELECT file_id, count(*) AS n, sum(m) AS nm,
               min(l_partkey) AS p0, max(l_partkey) AS p1,
               min(l_suppkey) AS s0, max(l_suppkey) AS s1
        FROM {src} GROUP BY 1"""
    audit = f"""
        SELECT '{{name}}' AS layout,
               CAST(count(*) AS BIGINT) AS n_files,
               CAST(sum(CASE WHEN {scan} THEN 1 ELSE 0 END) AS BIGINT)
                   AS files_scanned,
               CAST(sum(n) AS BIGINT) AS rows_total,
               CAST(sum(CASE WHEN {scan} THEN n ELSE 0 END) AS BIGINT)
                   AS rows_scanned,
               CAST(sum(nm) AS BIGINT) AS rows_matching
        FROM {{src}}"""
    return f"""
        WITH b AS (SELECT min(l_orderkey) AS omn, max(l_orderkey) AS omx,
                          min(l_partkey) AS mn0, max(l_partkey) AS mx0,
                          min(l_suppkey) AS mn1, max(l_suppkey) AS mx1
                   FROM lineitem),
        base AS (SELECT l_orderkey, l_partkey, l_suppkey,
                        CASE WHEN l_partkey BETWEEN 100 AND 299
                              AND l_suppkey BETWEEN 10 AND 39
                             THEN 1 ELSE 0 END AS m
                 FROM lineitem),
        nat AS (SELECT ((l_orderkey - b.omn) * 31)
                           // greatest(b.omx - b.omn, 1) AS file_id,
                       l_partkey, l_suppkey, m
                FROM base, b),
        zn AS (SELECT ((l_partkey - b.mn0) * {top})
                          // greatest(b.mx0 - b.mn0, 1) AS n0,
                      ((l_suppkey - b.mn1) * {top})
                          // greatest(b.mx1 - b.mn1, 1) AS n1,
                      l_partkey, l_suppkey, m
               FROM base, b),
        zf AS (SELECT CAST({terms} AS BIGINT) // {width} AS file_id,
                      l_partkey, l_suppkey, m
               FROM zn),
        sn AS ({stats.format(src="nat")}),
        sz AS ({stats.format(src="zf")})
        {audit.format(name="natural", src="sn")}
        UNION ALL
        {audit.format(name="zorder", src="sz")}
    """


@contract(
    "q_p26_zonemaps",
    oracle=_zonemap_oracle(),
    survey_rows="P26,P18,P8",
    doc="zone-map FILE-SKIPPING audit (operators/zonemaps.py): per-file "
    "min/max statistics (the parquet-footer / lakehouse-manifest "
    "shape) + the interval-overlap pruning rule, measured against the "
    "SAME 2-D range predicate under two physical layouts — natural "
    "(orderkey equal-width, i.e. insertion/time order) vs Z-ORDER "
    "over (l_partkey, l_suppkey) (P18's operator). The hashed surface "
    "is the audit itself: files scanned, rows scanned, rows matching "
    "per layout — the natural layout scans ~every file for a "
    "partkey x suppkey box while z-order skips most, which is the "
    "entire case for multi-dimensional clustering at 100 TB. Pruning "
    "losslessness (every matching row lives in a scanned file) is "
    "visible as rows_matching <= rows_scanned and equal rows_matching "
    "across layouts. Integer arithmetic end to end; two map-side-"
    "combinable aggregates per layout (|files| then 1 row); the "
    "orderkey/zorder bounds passes are the documented two-pass "
    "stats-layout shape (bounds collect, then keys)",
)
def q_p26(spark, sf_dir):
    from jane_spark.operators.zonemaps import zonemap_prune_audit
    from jane_spark.operators.zorder import zorder_buckets

    li = Catalog(spark, sf_dir).lineitem
    b = li.agg(
        F.min("l_orderkey").alias("omn"), F.max("l_orderkey").alias("omx")
    ).first()
    omn = int(b["omn"])
    rng = max(int(b["omx"]) - omn, 1)
    nat = li.withColumn(
        "file_id",
        F.expr(
            f"((l_orderkey - CAST({omn} AS BIGINT)) * 31) "
            f"div CAST({rng} AS BIGINT)"
        ),
    )
    zor = zorder_buckets(li, ["l_partkey", "l_suppkey"], 32).withColumnRenamed(
        "zbucket", "file_id"
    )
    ranges = {"l_partkey": (100, 299), "l_suppkey": (10, 39)}
    cols = [
        "layout",
        "n_files",
        "files_scanned",
        "rows_total",
        "rows_scanned",
        "rows_matching",
    ]
    a = zonemap_prune_audit(nat, "file_id", ranges).withColumn(
        "layout", F.lit("natural")
    )
    z = zonemap_prune_audit(zor, "file_id", ranges).withColumn(
        "layout", F.lit("zorder")
    )
    return a.select(*cols).unionByName(z.select(*cols))


@contract(
    "q_p19_manifest",
    oracle=f"""
        WITH b AS (
            SELECT CASE
                WHEN {_DUCK_BUCKET.format(salt="split:", key="doc_id",
                                          n=10000)} < 8000 THEN 'train'
                WHEN {_DUCK_BUCKET.format(salt="split:", key="doc_id",
                                          n=10000)} < 9000 THEN 'val'
                ELSE 'test' END AS bucket,
                doc_id, text
            FROM documents)
        SELECT bucket,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                   AS n_tokens,
               CAST(min(doc_id) AS BIGINT) AS min_id,
               CAST(max(doc_id) AS BIGINT) AS max_id,
               CAST(bit_xor(CAST(concat('0x', substr(md5(
                   'mf:' || CAST(doc_id AS VARCHAR) || ':' || md5(text)),
                   1, 15)) AS BIGINT)) AS BIGINT) AS fp_xor
        FROM b GROUP BY bucket
    """,
    survey_rows="P19,P1,P7",
    doc="corpus-release MANIFEST per split bucket "
    "(functions.sampling.release_manifest): row/token counts, id "
    "extent, and an ORDER-INDEPENDENT bit_xor content fingerprint of "
    "salted per-row hashes — two independently-produced releases "
    "compare shard-by-shard with no sorting (equal xor + equal count "
    "== identical content set); the release-diff complement of "
    "q_p13_corpus_diff. One map-side-combinable groupBy",
)
def q_p19(spark, sf_dir):
    from jane_spark.functions.sampling import release_manifest, split_assign

    docs = Catalog(spark, sf_dir).documents
    b = docs.withColumn(
        "bucket",
        split_assign(
            F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1},
            salt="split:",
        ),
    )
    return release_manifest(b, "bucket", "doc_id", "text")


@contract(
    "q_t2_langid_sql",
    oracle=LANGID_ORACLE,
    survey_rows="K6",
    doc="language-ID as a pure codegen expression (marker-word argmax + "
    "CJK codepoint scan, functions.text.detect_language_expr) — the "
    "default scale path; the pandas-UDF variant (q_t2_langid) is "
    "parity-tested against it in tests/test_operators.py",
)
def q_t2_sql(spark, sf_dir):
    from jane_spark.functions.text import detect_language_expr

    docs = Catalog(spark, sf_dir).documents
    return (
        docs.select(detect_language_expr(F.col("text")).alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@contract(
    "q_t3_fingerprint_md5",
    oracle="""
        SELECT doc_id,
               md5(array_to_string(string_split(lower(text), ' '), ' '))
                   AS fp
        FROM documents
    """,
    survey_rows="K1,H6",
    doc="cross-engine document fingerprint: md5 of the normalized token "
    "stream, checked per-doc byte-exact (functions.text.fingerprint_hex; "
    "the xxhash64 variant q_t3_fingerprint stays the 8-byte scale path)",
)
def q_t3_md5(spark, sf_dir):
    from jane_spark.functions.text import fingerprint_hex

    docs = Catalog(spark, sf_dir).documents
    return docs.select("doc_id", fingerprint_hex(F.col("text")).alias("fp"))


_PII_ORACLE = r"""
WITH aug AS (
    SELECT doc_id,
           concat(text, ' call 555-',
                  lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                  ' from 10.0.', CAST(doc_id % 256 AS VARCHAR), '.1 card ',
                  CASE WHEN doc_id % 2 = 0 THEN '4111111111111111'
                       ELSE '4111111111111112' END,
                  ' mail ', source, '@example.com') AS raw
    FROM documents),
c AS (SELECT doc_id, raw,
             regexp_extract_all(raw, '[0-9]{16}') AS cards
      FROM aug),
v AS (SELECT doc_id, raw, cards,
             list_filter(cards, x ->
                 list_sum(list_transform(generate_series(1, length(x)), i ->
                     CASE WHEN i % 2 = 0 THEN
                         CASE WHEN CAST(substr(reverse(x), i, 1) AS INT) * 2 > 9
                              THEN CAST(substr(reverse(x), i, 1) AS INT) * 2 - 9
                              ELSE CAST(substr(reverse(x), i, 1) AS INT) * 2 END
                     ELSE CAST(substr(reverse(x), i, 1) AS INT) END)) % 10 = 0
             ) AS valid
      FROM c),
r AS (SELECT doc_id, raw, cards, valid,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   CASE WHEN len(valid) > 0
                        THEN replace(raw, valid[1], '<CARD>') ELSE raw END,
                   '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
                 '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
               '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g')
                 AS clean
      FROM v)
SELECT doc_id,
       CAST(len(cards) AS BIGINT) AS n_cards_found,
       CAST(len(valid) AS BIGINT) AS n_cards_valid,
       CAST(length(raw) - length(clean) AS BIGINT) AS chars_removed,
       md5(clean) AS clean_md5
FROM r
"""


@contract(
    "q_t15_pii",
    oracle=_PII_ORACLE,
    survey_rows="T6,H4,H8",
    doc="multi-class PII redaction with Luhn gating "
    "(functions.text.pii_redact): cards (16-digit, mod-10-checked via "
    "higher-order aggregate — regex alone cannot express the checksum), "
    "then emails, phones, IPv4, in a fixed order; synthesized "
    "deterministically per doc with the Luhn check FAILING on odd "
    "doc_ids, so the gate provably fires. Per-doc md5 of the redacted "
    "text makes the check byte-exact in both engines",
)
def q_t15(spark, sf_dir):
    from jane_spark.functions.text import pii_counts, pii_redact

    docs = Catalog(spark, sf_dir).documents
    raw = F.concat(
        F.col("text"),
        F.lit(" call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".1 card "),
        F.when(F.col("doc_id") % 2 == 0, F.lit("4111111111111111")).otherwise(
            F.lit("4111111111111112")
        ),
        F.lit(" mail "),
        F.col("source"),
        F.lit("@example.com"),
    )
    aug = docs.select("doc_id", raw.alias("raw"))
    clean = pii_redact(F.col("raw"))
    cnt = pii_counts(F.col("raw"))
    return aug.select(
        "doc_id",
        cnt["n_cards_found"].cast("bigint").alias("n_cards_found"),
        cnt["n_cards_valid"].cast("bigint").alias("n_cards_valid"),
        (F.length(F.col("raw")) - F.length(clean)).cast("bigint").alias(
            "chars_removed"
        ),
        F.md5(clean).alias("clean_md5"),
    )


@contract(
    "q_p10_wds_shards",
    oracle=None,  # shard assignment is xxhash64 (no DuckDB twin); the
    # archive layout/determinism guarantees are pytest-pinned
    survey_rows="P10,K7",
    doc="WebDataset tar-shard packing (sources/corpus_export."
    "webdataset_shards): samples → hash-assigned shards, key-sorted "
    "within shard, zeroed tar metadata ⇒ byte-identical re-runs "
    "(md5 column witnesses it); ONE shuffle, each archive built in "
    "one task's memory — the real multimodal loader format",
)
def q_p10(spark, sf_dir):
    docs = Catalog(spark, sf_dir).documents
    src = docs.select(
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("key"),
        "text",
        F.to_json(F.struct("lang", "source", "n_chars")).alias("meta"),
    )
    from jane_spark.sources.corpus_export import webdataset_shards

    shards = webdataset_shards(
        src, "key", {"txt": "text", "json": "meta"}, n_shards=8
    )
    return shards.select(
        "shard_id",
        "n_samples",
        F.length("tar").alias("tar_bytes"),
        F.md5("tar").alias("tar_md5"),
    )


@contract(
    "q_p10_roundtrip",
    oracle="""
        WITH s AS (SELECT lpad(CAST(doc_id AS VARCHAR), 8, '0') AS key,
                          text, source
                   FROM documents),
        a AS (SELECT key,
                     CAST(CAST(concat('0x',
                         substr(md5(concat('wds:', key)), 1, 8))
                         AS BIGINT) % 8 AS INTEGER) AS shard_id,
                     text, source
              FROM s)
        SELECT shard_id, concat(key, '.src') AS name,
               CAST(strlen(source) AS BIGINT) AS size,
               md5(source) AS content_md5
        FROM a WHERE source IS NOT NULL
        UNION ALL
        SELECT shard_id, concat(key, '.txt') AS name,
               CAST(strlen(text) AS BIGINT) AS size,
               md5(text) AS content_md5
        FROM a WHERE text IS NOT NULL
    """,
    survey_rows="P10,K7",
    doc="WebDataset shard ROUND TRIP as a true oracle (VERDICT r13 "
    "#4, the q_a10_warc constructing-oracle pattern): Spark packs "
    "documents into real USTAR tar shards (portable md5 hash-bucket "
    "assignment — sources/corpus_export.webdataset_shards "
    "assign='md5'), then a real tar parser re-reads the BYTES it "
    "wrote (webdataset_members) and emits per-member (shard_id, "
    "name, size, content_md5); the oracle never touches a tar — it "
    "CONSTRUCTS the expected member table arithmetically from "
    "documents (lpad key, md5-bucket shard, strlen sizes, md5 "
    "contents; NULL member columns are excluded on BOTH sides — the "
    "packer's optional-member skip mirrored by IS NOT NULL arms, "
    "ADVICE r14), so hash equality proves the container round-trips "
    "losslessly: every sample in its assigned shard, correct member "
    "naming, byte-exact contents. The xxhash leg (q_p10_wds_shards) "
    "stays rows-only for the archive-level byte-identity law",
)
def q_p10_roundtrip(spark, sf_dir):
    from jane_spark.sources.corpus_export import (
        webdataset_members,
        webdataset_shards,
    )

    docs = Catalog(spark, sf_dir).documents
    src = docs.select(
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("key"),
        "text",
        "source",
    )
    shards = webdataset_shards(
        src, "key", {"txt": "text", "src": "source"}, n_shards=8,
        assign="md5",
    )
    return webdataset_members(shards)


@contract(
    "q_p11_webpipeline",
    oracle=None,  # assembled below after the curation module defines the
    # shared URL-parts SQL (set post-definition to avoid import-order
    # coupling) — see _install_p11_oracle() at the bottom of this module
    survey_rows="P5,T22,T23,K1,P1",
    doc="end-to-end WEB corpus pipeline in one plan: URL normalize -> "
    "domain blocklist -> per-domain cap (best-3 by length) -> exact "
    "text dedup (min doc_id per md5) -> deterministic 80/10/10 split "
    "-> per-split stats. Shuffle inventory: ONE domain-keyed window, "
    "ONE fingerprint-keyed window, ONE split aggregate — everything "
    "else is pushdown-visible projection",
)
def q_p11(spark, sf_dir):
    from jane_spark.contracts.curation import _synth_urls
    from jane_spark.functions.sampling import split_assign
    from jane_spark.functions.urls import domain_blocklist_filter, domain_cap
    from jane_spark.operators.topk import argmax

    u = _synth_urls(spark, sf_dir)
    kept = domain_blocklist_filter(u, "url", ["site0.com", "site1.co.uk"])
    capped = domain_cap(
        kept.drop("domain"), "url", 3,
        [F.col("n_chars").desc(), F.col("doc_id").asc()],
    )
    deduped = argmax(
        capped.withColumn("fp", F.md5(F.col("text"))),
        ["fp"],
        [F.col("doc_id").asc()],
    )
    split = split_assign(
        F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1}, salt="split:"
    )
    return (
        deduped.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("domain").alias("n_domains"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def _install_p11_oracle() -> None:
    from jane_spark.contracts.curation import (
        _URL_PARTS_SQL,
        _URL_UNBLOCKED_CAPPED_SQL,
    )
    from jane_spark.contracts.registry import REGISTRY

    bucket = _DUCK_BUCKET.format(salt="split:", key="doc_id", n=10000)
    REGISTRY["q_p11_webpipeline"].oracle = f"""
        WITH parts AS ({_URL_PARTS_SQL}),
        {_URL_UNBLOCKED_CAPPED_SQL},
        dedup AS (SELECT * FROM (
                      SELECT *, row_number() OVER (
                          PARTITION BY md5(text)
                          ORDER BY doc_id ASC) AS dn
                      FROM capped)
                  WHERE dn = 1),
        b AS (SELECT *, {bucket} AS bucket FROM dedup)
        SELECT CASE WHEN bucket < 8000 THEN 'train'
                    WHEN bucket < 9000 THEN 'val'
                    ELSE 'test' END AS split,
               count(*) AS n_docs,
               count(DISTINCT expect_domain) AS n_domains,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM b GROUP BY split
    """


_install_p11_oracle()


def _ffd_oracle_sql(budget: int = 512, n_packers: int = 8) -> str:
    """Recursive-CTE DuckDB twin of pack_ffd + packing_stats (r7, the
    closed-form-oracle family): each recursion step places the next
    item of its packer's (length desc, id asc) order, carrying the
    bins' remaining capacities as a LIST column — first fit = lowest
    index with room, oversize items seal a -1 bin exactly like the
    Spark pass. Sequential-by-construction, so it derives the greedy
    state machine independently of the pandas implementation."""
    pos = (
        "coalesce(list_filter(generate_series(1, len(r.bins)), "
        "x -> r.bins[x] >= i.l)[1], 0)"
    )
    return f"""
        WITH RECURSIVE
        src AS MATERIALIZED (
            SELECT CAST(concat('0x', substr(md5(concat('pack:',
                       CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
                       % {n_packers} AS packer,
                   doc_id AS id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS l
            FROM documents),
        items AS MATERIALIZED (
            SELECT packer, id, l, row_number() OVER (
                PARTITION BY packer ORDER BY l DESC, id ASC) AS rn
            FROM src),
        r(packer, rn, bins, bin_idx, over, l) AS (
            SELECT packer, CAST(0 AS BIGINT), CAST([] AS BIGINT[]),
                   NULL, NULL, NULL
            FROM (SELECT DISTINCT packer FROM items)
            UNION ALL
            SELECT i.packer, i.rn,
                   CASE WHEN i.l > {budget}
                            THEN list_append(r.bins, CAST(-1 AS BIGINT))
                        WHEN {pos} = 0
                            THEN list_append(r.bins, {budget} - i.l)
                        ELSE list_transform(
                            generate_series(1, len(r.bins)),
                            x -> CASE WHEN x = {pos}
                                      THEN r.bins[x] - i.l
                                      ELSE r.bins[x] END)
                   END,
                   CASE WHEN i.l > {budget} THEN len(r.bins)
                        WHEN {pos} = 0 THEN len(r.bins)
                        ELSE {pos} - 1 END,
                   i.l > {budget},
                   i.l
            FROM r JOIN items i
              ON i.packer = r.packer AND i.rn = r.rn + 1),
        fills AS (
            SELECT packer, bin_idx, sum(l) AS fill,
                   max(CASE WHEN over THEN 1 ELSE 0 END) AS solo
            FROM r WHERE rn >= 1 GROUP BY packer, bin_idx)
        SELECT count(*) AS n_bins,
               CAST(sum(solo) AS BIGINT) AS n_oversize_bins,
               coalesce(round(sum(CASE WHEN solo = 0 THEN fill END)
                        / (sum(1 - solo) * {budget}.0), 4), 0.0)
                   AS utilization
        FROM fills
    """


@contract(
    "q_p12_ffd_pack",
    oracle=_ffd_oracle_sql(),
    survey_rows="P4",
    doc="best-fit-decreasing sequence packing (operators/packing.py): "
    "documents hash to packer partitions, each runs exact FFD "
    "(length desc, id tie-break) in one Arrow batch, bins globalized "
    "as partition/local — ONE (id,length)-pair shuffle; utilization "
    "and bin-budget invariants pytest-enforced, vs P4's simpler "
    "cumsum packing. Oracle-backed since r7: a recursive-CTE twin "
    "replays the greedy state machine (bins as a LIST column, one "
    "item per recursion step) independently of the pandas pass",
)
def q_p12(spark, sf_dir):
    from jane_spark.functions.text import token_count
    from jane_spark.operators.packing import pack_ffd, packing_stats

    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id", token_count(F.col("text")).alias("n_tok")
    )
    packed = pack_ffd(docs, "doc_id", "n_tok", budget=512, n_packers=8)
    return packing_stats(packed, budget=512)


def _pack_sequences_oracle(budget: int = 512, n_packers: int = 8) -> str:
    """Packed-example twin: reuse the FFD recursive state machine
    (everything up to CTE r), join item ids back by (packer, rn), and
    aggregate per bin with ORDER BY (length desc, id asc) — placement
    order — building doc-id lists and cumulative token boundaries with
    window sums. Integers end to end."""
    base = _ffd_oracle_sql(budget, n_packers).rsplit("fills AS (", 1)[0]
    return (
        base
        + """a AS (
            SELECT concat(CAST(r.packer AS VARCHAR), '/',
                          CAST(r.bin_idx AS VARCHAR)) AS bin_id,
                   i.id, r.l,
                   CAST(sum(r.l) OVER (
                       PARTITION BY r.packer, r.bin_idx
                       ORDER BY r.l DESC, i.id ASC
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS bound
            FROM r JOIN items i
              ON i.packer = r.packer AND i.rn = r.rn
            WHERE r.rn >= 1)
        SELECT bin_id,
               string_agg(CAST(id AS VARCHAR), '|'
                          ORDER BY l DESC, id ASC) AS doc_ids,
               string_agg(CAST(bound AS VARCHAR), '|'
                          ORDER BY l DESC, id ASC) AS boundaries,
               CAST(sum(l) AS BIGINT) AS total_tokens,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM a GROUP BY bin_id
    """
    )


@contract(
    "q_p15_pack_boundaries",
    oracle=_pack_sequences_oracle(),
    survey_rows="P4,P12,K4",
    doc="packed-example materialization with attention-mask boundaries "
    "(operators/packing.pack_sequences): per FFD bin, member documents "
    "in placement order + the cumulative token offsets a trainer masks "
    "attention across — the step between bin ASSIGNMENT (q_p12) and "
    "writing training shards. One bin-keyed shuffle; the boundary fold "
    "is row-local over a budget-bounded member list. Oracle reuses the "
    "FFD recursive state machine and rebuilds the same strings with "
    "ordered window sums — integers end to end",
)
def q_p15(spark, sf_dir):
    from jane_spark.functions.text import token_count
    from jane_spark.operators.packing import pack_ffd, pack_sequences

    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id", token_count(F.col("text")).alias("n_tok")
    )
    packed = pack_ffd(docs, "doc_id", "n_tok", budget=512, n_packers=8)
    return pack_sequences(packed)


@contract(
    "q_t26_contam_report",
    oracle=f"""
        WITH {_SHINGLE_CTE},
        bench AS (SELECT doc_id AS eval_id, unnest(sh) AS shingle FROM s
                  WHERE doc_id % 37 = 0),
        cand AS (SELECT doc_id AS train_id, unnest(sh) AS shingle FROM s
                 WHERE doc_id % 37 <> 0)
        SELECT train_id, eval_id, CAST(count(*) AS BIGINT) AS n_shared
        FROM cand JOIN bench USING (shingle)
        GROUP BY train_id, eval_id
    """,
    survey_rows="T26,T5,K4",
    doc="contamination ATTRIBUTION (the debug twin of T5's drop): "
    "which eval item leaked into which training doc, with the shared "
    "distinct-3-gram count per (train, eval) pair — T5 says THAT a "
    "doc is contaminated, this says BY WHAT. Same broadcast shape: "
    "the eval shingle table stays benchmark-sized, the pair agg keys "
    "on (train, eval) ids only",
)
def q_t26(spark, sf_dir):
    s = _shingled_docs(spark, sf_dir)
    bench = s.filter(F.col("doc_id") % 37 == 0).select(
        F.col("doc_id").alias("eval_id"), F.explode("sh").alias("shingle")
    )
    cand = s.filter(F.col("doc_id") % 37 != 0).select(
        F.col("doc_id").alias("train_id"), F.explode("sh").alias("shingle")
    )
    return (
        cand.join(F.broadcast(bench), "shingle")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


@contract(
    "q_p14_warc_pipeline",
    oracle=None,  # assembled below from curation's shared T29 fragment
    # (post-definition install, the q_p11 precedent)
    survey_rows="P14,A10,T29,K1,P1",
    doc="the FineWeb-shaped ingest chain END TO END in one job: per-doc "
    "WARC response archives (writer twin, gzip members) -> distributed "
    "parse_warc -> HTTP payload split -> main-content extraction "
    "(block + link-density) -> exact dedup on the extracted text "
    "(min doc_id per md5) -> deterministic 80/10/10 split -> per-split "
    "stats. The Python stage is ONE mapInPandas (archive bytes in, "
    "html out); everything downstream is JVM expression + one "
    "fingerprint window + one split aggregate. The oracle never "
    "touches WARC or HTML — it constructs the surviving text "
    "arithmetically (shared T29 fragment), so a one-byte error "
    "anywhere in the archive/extract chain hash-mismatches",
)
def q_p14(spark, sf_dir):
    import pandas as pd

    from jane_spark.engine.catalog import Catalog
    from jane_spark.functions.sampling import split_assign
    from jane_spark.functions.text import extract_main_content
    from jane_spark.operators.topk import argmax

    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text")

    def to_html(batches):
        from jane_spark.sources.warc import (
            encode_warc,
            http_payload,
            parse_warc,
        )

        for pdf in batches:
            ids, pages = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                page = (
                    "<html><head><title>t</title><style>p{margin:0}</style>"
                    '</head><body><nav><a href="/">Home</a> '
                    '<a href="/a">About</a> <a href="/c">Contact</a></nav>'
                    "<!-- boilerplate --><article><p>"
                    + text
                    + "</p><p>Validation paragraph for document "
                    + str(doc_id)
                    + " keeps enough characters to stay.</p></article>"
                    '<p>Tiny.</p><footer><a href="/x">A very long '
                    "related-articles caption that is pure link text and "
                    "must drop</a></footer></body></html>"
                )
                blob = encode_warc(
                    [
                        {
                            "warc_type": "response",
                            "target_uri": f"https://corpus.example/doc/{doc_id}",
                            "content_type": "application/http;msgtype=response",
                            "content": b"HTTP/1.1 200 OK\r\n"
                            b"Content-Type: text/html\r\n\r\n"
                            + page.encode("utf-8"),
                        }
                    ],
                    gzip_members=True,
                )
                (rec,) = parse_warc(blob)
                _status, body = http_payload(rec["content"])
                ids.append(doc_id)
                pages.append(body.decode("utf-8"))
            yield pd.DataFrame({"doc_id": ids, "html": pages})

    pages = docs.mapInPandas(to_html, "doc_id long, html string")
    extracted = pages.select(
        "doc_id", extract_main_content(F.col("html")).alias("main_text")
    )
    deduped = argmax(
        extracted.withColumn("fp", F.md5(F.col("main_text"))),
        ["fp"],
        [F.col("doc_id").asc()],
    )
    split = split_assign(
        F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1}, salt="warc:"
    )
    return (
        deduped.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("main_text")).alias("total_chars"),
        )
    )


def _install_p14_oracle() -> None:
    from jane_spark.contracts.curation import _T29_MAIN_CTE
    from jane_spark.contracts.registry import REGISTRY

    bucket = _DUCK_BUCKET.format(salt="warc:", key="doc_id", n=10000)
    REGISTRY["q_p14_warc_pipeline"].oracle = f"""
        WITH {_T29_MAIN_CTE},
        dedup AS (SELECT * FROM (
                      SELECT *, row_number() OVER (
                          PARTITION BY md5(main_text)
                          ORDER BY doc_id ASC) AS dn
                      FROM t29m)
                  WHERE dn = 1),
        b AS (SELECT *, {bucket} AS bucket FROM dedup)
        SELECT CASE WHEN bucket < 8000 THEN 'train'
                    WHEN bucket < 9000 THEN 'val'
                    ELSE 'test' END AS split,
               count(*) AS n_docs,
               CAST(sum(length(main_text)) AS BIGINT) AS total_chars
        FROM b GROUP BY split
    """


_install_p14_oracle()


@contract(
    "q_p21_dsir",
    oracle="""
        WITH raw AS (SELECT doc_id, text FROM documents),
        tgt AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0),
        rtok AS (SELECT doc_id,
                        CAST(concat('0x', substr(md5('dsir:' || tok), 1, 8))
                             AS BIGINT) % 1024 AS b
                 FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                       FROM raw)),
        ttok AS (SELECT CAST(concat('0x', substr(md5('dsir:' || tok), 1, 8))
                             AS BIGINT) % 1024 AS b
                 FROM (SELECT unnest(string_split(text, ' ')) AS tok
                       FROM tgt)),
        rb AS (SELECT b, CAST(count(*) AS BIGINT) AS cr FROM rtok GROUP BY b),
        tb AS (SELECT b, CAST(count(*) AS BIGINT) AS ct FROM ttok GROUP BY b),
        tot AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM ttok) AS tot_t,
                       (SELECT CAST(count(*) AS BIGINT) FROM rtok) AS tot_r),
        sc AS (SELECT coalesce(rb.b, tb.b) AS b,
                      CAST(round(100.0 * ln(
                          (CAST(coalesce(ct, 0) + 1 AS DOUBLE)
                               / (tot_t + 1024))
                          * (CAST(tot_r + 1024 AS DOUBLE)
                               / (coalesce(cr, 0) + 1)))) AS BIGINT)
                          AS score_c
               FROM rb FULL OUTER JOIN tb ON rb.b = tb.b, tot),
        w AS (SELECT doc_id AS id,
                     CAST(count(*) AS BIGINT) AS n_tok,
                     CAST(sum(score_c) AS BIGINT) AS weight_c
              FROM rtok JOIN sc USING (b) GROUP BY doc_id)
        SELECT CAST(id AS BIGINT) AS id, n_tok, weight_c,
               CAST(row_number() OVER (ORDER BY weight_c DESC, id ASC)
                    AS INTEGER) AS rank
        FROM w ORDER BY weight_c DESC, id ASC LIMIT 200
    """,
    survey_rows="P21,K6,P1",
    doc="DSIR importance resampling (Xie et al. 2023, NeurIPS — "
    "functions.sampling.dsir_select): hashed-unigram bucket LMs over "
    "a TARGET domain (here the deterministic doc_id%7 slice) and the "
    "raw corpus; every raw doc weighted by the sum of its tokens' "
    "add-1-smoothed centi-log importance ratios round(100*ln((ct+1)/"
    "(Ct+B) * (Cr+B)/(cr+1))); top-200 kept (weight desc, id asc). "
    "The per-bucket ln cannot tie on a round-half (ln of a rational "
    "!= 1 is irrational — Lindemann), so the integer weights are "
    "engine-portable. Portable salted-md5 buckets; two combinable "
    "count shuffles + a B-row broadcast score join + one TakeOrdered",
)
def q_p21(spark, sf_dir):
    from jane_spark.functions.sampling import dsir_select

    docs = Catalog(spark, sf_dir).documents
    target = docs.where(F.col("doc_id") % 7 == 0)
    return dsir_select(docs, target, "doc_id", "text", n=200, n_buckets=1024)


def _waterfill_oracle(rounds: int = 22) -> str:
    """Unrolled water-filling rounds (the Lloyd/PQ/unigram/mmr
    unrolling precedent): round i saturates active sources whose floor
    share meets availability, a scalar CTE carries the remaining
    budget, and the terminal select pays floor shares to survivors."""
    parts = ["""base AS MATERIALIZED (
        SELECT source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
               CAST((CAST(substr(source, 4) AS BIGINT) % 5 + 1) * 1000
                   AS BIGINT) AS w
        FROM documents),
    src AS MATERIALIZED (
        SELECT source, CAST(sum(nt) AS BIGINT) AS avail, max(w) AS w
        FROM base GROUP BY source),
    bud AS (SELECT CAST((sum(avail) * 6) // 10 AS BIGINT) AS b FROM src),
    st0 AS MATERIALIZED (
        SELECT source, avail, w, CAST(NULL AS BIGINT) AS alloc
        FROM src),
    rem0 AS MATERIALIZED (SELECT b AS rem FROM bud)"""]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(f"""tot{i} AS MATERIALIZED (
        SELECT CAST(sum(w) AS BIGINT) AS W FROM st{p} WHERE alloc IS NULL),
    st{i} AS MATERIALIZED (
        SELECT s.source, s.avail, s.w,
               CASE WHEN s.alloc IS NOT NULL THEN s.alloc
                    WHEN t.W IS NOT NULL AND r.rem > 0
                         AND (r.rem * s.w) // t.W >= s.avail
                        THEN s.avail
                    ELSE NULL END AS alloc
        FROM st{p} s, rem{p} r, tot{i} t),
    rem{i} AS MATERIALIZED (
        SELECT r.rem - coalesce(
            (SELECT CAST(sum(s2.avail) AS BIGINT)
             FROM st{p} s2, rem{p} r2, tot{i} t2
             WHERE s2.alloc IS NULL AND t2.W IS NOT NULL AND r2.rem > 0
               AND (r2.rem * s2.w) // t2.W >= s2.avail),
            CAST(0 AS BIGINT)) AS rem
        FROM rem{p} r)""")
    k = rounds
    return (
        "WITH " + ",\n    ".join(parts) + f""",
    totf AS (SELECT CAST(sum(w) AS BIGINT) AS W FROM st{k}
             WHERE alloc IS NULL)
    SELECT s.source, s.avail, s.w AS weight_e4,
           CAST(CASE WHEN s.alloc IS NOT NULL THEN s.alloc
                     WHEN r.rem <= 0 THEN 0
                     ELSE (r.rem * s.w) // t.W END AS BIGINT) AS alloc
    FROM st{k} s, rem{k} r, totf t
    """
    )


@contract(
    "q_p24_waterfill",
    oracle=_waterfill_oracle(22),
    survey_rows="P24,P9,P7",
    doc="token-budget WATER-FILLING allocation across sources "
    "(functions.sampling.waterfill_allocation): each source gets its "
    "weight-proportional share of the remaining budget unless that "
    "share exceeds its availability, in which case it contributes "
    "everything and the excess re-distributes over the unsaturated "
    "rest — the 'mixture weights subject to corpus size' allocation "
    "the GPT-3/LLaMA-style mix reports describe, which the plain "
    "per-source keep-fraction (P9 mixture_sample) cannot express. "
    "Synchronous integer rounds (<= |sources|+1), every division "
    "non-negative so floor == trunc in any engine; budget = 60% of "
    "corpus tokens, weights the deterministic (srcN%5+1)*1000 table. "
    "Oracle = the rounds unrolled as saturation CTEs with a scalar "
    "remaining-budget chain (the Lloyd/unigram/mmr precedent). The "
    "per-source avail aggregate runs distributed; the loop itself is "
    "a bounded |sources|-row driver computation",
)
def q_p24(spark, sf_dir):
    from jane_spark.functions.sampling import waterfill_allocation

    docs = Catalog(spark, sf_dir).documents
    src = (
        docs.select(
            "source",
            F.size(F.split(F.col("text"), " ", -1))
            .cast("long")
            .alias("nt"),
            (
                (F.substring(F.col("source"), 4, 10).cast("long") % 5 + 1)
                * 1000
            ).alias("w"),
        )
        .groupBy("source")
        .agg(F.sum("nt").alias("avail"), F.max("w").alias("w"))
    )
    budget = src.agg(
        F.expr("(sum(avail) * 6) div 10").cast("long").alias("b")
    ).first()["b"]
    return waterfill_allocation(src, "source", "avail", "w", int(budget))


@contract(
    "q_p7_export",
    oracle=f"""
        WITH b AS (
            SELECT lang, n_chars,
                   {_DUCK_BUCKET.format(salt="split:", key="doc_id",
                                        n=10000)} AS bucket
            FROM documents)
        SELECT CASE WHEN bucket < 8000 THEN 'train'
                    WHEN bucket < 9000 THEN 'val'
                    ELSE 'test' END AS split,
               lang,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               TRUE AS files_ok
        FROM b GROUP BY split, lang
    """,
    survey_rows="P7,P1,A16",
    doc="hive-partitioned corpus-export sink ROUNDTRIP "
    "(sources/corpus_export.export_corpus — converts P7 from "
    "write-side/pytest-only to a registry contract, the q_a16 ORC "
    "losslessness pattern): documents get the deterministic 80/10/10 "
    "hash split, export as REAL hive-partitioned parquet "
    "(partitionBy split/lang, 2 hash shards via repartition-before-"
    "partitionBy — the small-files discipline), read BACK through "
    "partition discovery into a per-(split, lang) typed aggregate. "
    "The oracle computes the same aggregate + split arithmetic "
    "straight from the source table, so hash equality pins BOTH "
    "write+read losslessness of the hive layout AND the split "
    "determinism; files_ok carries the FILE-COUNT LAW in the hashed "
    "surface (per-partition file count within [1, shards] — exact "
    "counts are task-placement-dependent under AQE, so the law is "
    "the bound the repartition guarantees; exact counts stay pinned "
    "in tests/test_index_store.py). The oracle does no file work "
    "(the orc_roundtrip adjudication)",
)
def q_p7_export(spark, sf_dir):
    import shutil
    import tempfile

    from jane_spark.functions.sampling import split_assign
    from jane_spark.sources.corpus_export import export_corpus

    docs = Catalog(spark, sf_dir).documents
    split = split_assign(
        F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1},
        salt="split:",
    )
    root = tempfile.mkdtemp(prefix="jane_export_")
    try:
        export_corpus(
            docs.select(
                "doc_id", "n_chars", split.alias("split"), "lang"
            ),
            root,
            partition_cols=("split", "lang"),
            shards=2,
            shard_key="doc_id",
        )
        back = spark.read.parquet(root).withColumn(
            "_f", F.input_file_name()
        )
        out = (
            back.groupBy("split", "lang")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("n_chars").cast("bigint").alias("sum_chars"),
                F.countDistinct("_f").alias("nf"),
            )
            .select(
                "split",
                "lang",
                "n",
                "sum_chars",
                ((F.col("nf") >= 1) & (F.col("nf") <= 2)).alias(
                    "files_ok"
                ),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _hilbert_oracle(bits: int = 16, n_buckets: int = 32) -> str:
    """Hilbert twin: the same integer min-max normalization as the
    z-order oracle, then the public xy2d reflect+rotate fold unrolled
    into ``bits`` chained CTEs (one per level — the same linear-chain
    shape the Spark side uses to keep the expression tree from
    doubling per level)."""
    top = (1 << bits) - 1
    n_full = 1 << bits
    width = max((1 << (2 * bits)) // n_buckets, 1)
    ctes = [
        "b AS (SELECT min(l_partkey) AS mn0, max(l_partkey) AS mx0, "
        "min(l_suppkey) AS mn1, max(l_suppkey) AS mx1 FROM lineitem)",
        f"h{bits} AS (SELECT "
        f"((l_partkey - b.mn0) * {top}) // greatest(b.mx0 - b.mn0, 1) "
        f"AS x, "
        f"((l_suppkey - b.mn1) * {top}) // greatest(b.mx1 - b.mn1, 1) "
        f"AS y, CAST(0 AS BIGINT) AS d FROM lineitem, b)",
    ]
    for lev in range(bits - 1, -1, -1):
        s2 = 1 << (2 * lev)
        ctes.append(
            f"h{lev} AS (SELECT "
            f"CASE WHEN ((y >> {lev}) & 1) = 0 THEN "
            f"CASE WHEN ((x >> {lev}) & 1) = 1 "
            f"THEN {n_full - 1} - y ELSE y END ELSE x END AS x, "
            f"CASE WHEN ((y >> {lev}) & 1) = 0 THEN "
            f"CASE WHEN ((x >> {lev}) & 1) = 1 "
            f"THEN {n_full - 1} - x ELSE x END ELSE y END AS y, "
            f"d + {s2} * CAST(xor(((x >> {lev}) & 1) * 3, "
            f"(y >> {lev}) & 1) AS BIGINT) AS d "
            f"FROM h{lev + 1})"
        )
    return (
        "WITH " + ",\n".join(ctes) + f"""
        SELECT CAST(d // {width} AS BIGINT) AS hbucket,
               CAST(count(*) AS BIGINT) AS n,
               CAST(min(d) AS BIGINT) AS min_hkey,
               CAST(max(d) AS BIGINT) AS max_hkey
        FROM h0 GROUP BY 1
    """
    )


@contract(
    "q_p28_hilbert",
    oracle=_hilbert_oracle(),
    survey_rows="P28,P18,P26",
    doc="HILBERT-curve layout keys (operators/zorder.hilbert_buckets) "
    "— the locality upgrade over P18's Morton keys on the SAME "
    "(l_partkey, l_suppkey) surface: the Hilbert curve never jumps "
    "(consecutive indices are always grid neighbors), so range boxes "
    "map to FEWER contiguous key runs — measured 2.02 vs 2.65 "
    "runs/box against Morton on the 16x16-box grid (Moon et al. "
    "TKDE 2001's clustering result, reproduced and pytest-pinned). "
    "The public xy2d reflect+rotate fold unrolls into 16 chained "
    "BIGINT projections (linear expression growth; inlining would "
    "double per level), all shift/mask/CASE codegen; the oracle "
    "replays the identical 16-CTE chain. Per-bucket count + key "
    "extent returned — the q_p18 surface, so the two layouts "
    "hash-audit side by side",
)
def q_p28(spark, sf_dir):
    from jane_spark.operators.zorder import hilbert_buckets

    li = Catalog(spark, sf_dir).lineitem
    return (
        hilbert_buckets(li, ["l_partkey", "l_suppkey"], n_buckets=32)
        .groupBy("hbucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("hkey").alias("min_hkey"),
            F.max("hkey").alias("max_hkey"),
        )
    )


def _bloom_skip_oracle(
    probes: tuple = ("src0", "src7", "src19"),
    n_bits_log2: int = 12,
    n_hashes: int = 3,
) -> str:
    """DuckDB twin of the two-layout bloom file-skipping audit: per
    (file, word) bit_or bloom words from the same md5 positions, probe
    requirements inlined as constants (query literals — hashlib.md5
    at contract-definition time equals both engines' md5)."""
    from jane_spark.operators.zonemaps import bloom_probe_positions

    nb = 1 << n_bits_log2
    layouts = {
        "rowhash": (
            "CAST(concat('0x', substr(md5(concat('rowshard:', "
            "CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 8"
        ),
        "clustered": (
            "CAST(concat('0x', substr(md5(concat('shard:', source)), "
            "1, 8)) AS BIGINT) % 8"
        ),
    }
    ctes, selects = [], []
    for tag, fexpr in layouts.items():
        pos_union = " UNION ALL ".join(
            f"SELECT f, CAST(concat('0x', substr(md5(concat('bf{i}:', "
            f"source)), 1, 8)) AS BIGINT) % {nb} AS pos FROM b_{tag}"
            for i in range(n_hashes)
        )
        ctes.append(
            f"b_{tag} AS (SELECT {fexpr} AS f, source FROM documents)"
        )
        ctes.append(f"p_{tag} AS ({pos_union})")
        ctes.append(
            f"w_{tag} AS (SELECT f, pos // 62 AS w, "
            f"bit_or(CAST(1 AS BIGINT) << CAST(pos % 62 AS INT)) AS word "
            f"FROM p_{tag} GROUP BY 1, 2)"
        )
        flag_exprs = []
        for j, p in enumerate(probes):
            req = bloom_probe_positions(p, n_bits_log2, n_hashes)
            conj = " AND ".join(
                f"(coalesce(max(CASE WHEN w = {w} THEN word END), 0) "
                f"& {bit}) <> 0"
                for w, bit in req
            )
            flag_exprs.append(f"({conj}) AS scan_{j}")
        ctes.append(
            f"fl_{tag} AS (SELECT f, {', '.join(flag_exprs)} "
            f"FROM w_{tag} GROUP BY f)"
        )
        m_exprs = ", ".join(
            f"CAST(sum(CASE WHEN source = '{p}' THEN 1 ELSE 0 END) "
            f"AS BIGINT) AS m_{j}"
            for j, p in enumerate(probes)
        )
        ctes.append(
            f"mt_{tag} AS (SELECT {fexpr} AS f, {m_exprs} "
            f"FROM documents GROUP BY 1)"
        )
        ctes.append(
            f"j_{tag} AS (SELECT * FROM fl_{tag} JOIN mt_{tag} USING (f))"
        )
        for j, p in enumerate(probes):
            selects.append(
                f"SELECT '{tag}' AS layout, '{p}' AS probe, "
                f"CAST(count(*) AS BIGINT) AS n_files, "
                f"CAST(sum(CASE WHEN scan_{j} THEN 1 ELSE 0 END) "
                f"AS BIGINT) AS files_scanned, "
                f"CAST(sum(CASE WHEN m_{j} > 0 THEN 1 ELSE 0 END) "
                f"AS BIGINT) AS files_matching, "
                f"CAST(sum(m_{j}) AS BIGINT) AS rows_matching "
                f"FROM j_{tag}"
            )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


@contract(
    "q_p29_bloom_skip",
    oracle=_bloom_skip_oracle(),
    survey_rows="P29,P26,K15",
    doc="per-file BLOOM-filter file-skipping audit "
    "(operators/zonemaps.bloom_skip_audit) — the EQUALITY-predicate "
    "complement of P26's min/max zone maps (useless for key = v on a "
    "high-cardinality column; parquet column bloom filters exist for "
    "exactly this). Two layouts audit side by side: a row-hash "
    "layout (md5 of doc_id -> 8 files; every source smeared "
    "everywhere, bloom admits ~all files) vs a source-clustered "
    "layout (md5 of source -> 8 files; each probe concentrates in "
    "ONE file, bloom prunes the other 7) — the measured difference "
    "IS the layout decision at 100 TB. Per-file bloom words build "
    "cluster-side via a (file, word)-keyed bit_or (62-bit words: "
    "DuckDB raises on 1<<63 where Spark wraps); probe bit positions "
    "are query constants inlined in both engines; no false "
    "negatives, so files_matching <= files_scanned is a law of the "
    "hashed surface itself",
)
def q_p29(spark, sf_dir):
    from jane_spark.functions.sampling import hash_bucket
    from jane_spark.operators.zonemaps import bloom_skip_audit

    docs = Catalog(spark, sf_dir).documents
    probes = ["src0", "src7", "src19"]
    out = None
    for tag, fcol in (
        ("rowhash", hash_bucket(F.col("doc_id"), 8, "rowshard:")),
        ("clustered", hash_bucket(F.col("source"), 8, "shard:")),
    ):
        part = bloom_skip_audit(
            docs.withColumn("__file", fcol), "__file", "source", probes
        ).select(F.lit(tag).alias("layout"), "*")
        out = part if out is None else out.unionByName(part)
    return out
