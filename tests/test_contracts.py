"""The primary test suite: every registered contract query vs its DuckDB
oracle (the driver's check, run locally first). Rows-only queries are
smoke-checked for execution + stable schema."""

from __future__ import annotations

import pytest

from jane_spark.contracts import REGISTRY
from tests.oracle_compare import compare

ORACLE_QUERIES = sorted(n for n, c in REGISTRY.items() if c.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, c in REGISTRY.items() if c.oracle is None)


def test_registry_nonempty():
    assert len(REGISTRY) >= 50, f"only {len(REGISTRY)} contract queries registered"


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, sf_dir, name):
    cq = REGISTRY[name]
    spark_pdf = cq.spark_fn(spark, sf_dir).toPandas()
    duck_pdf = duck.execute(cq.oracle).fetchdf()
    problems = compare(spark_pdf, duck_pdf)
    assert not problems, f"{name}: " + "; ".join(problems[:6])
    assert len(spark_pdf) > 0, f"{name}: empty result (weak contract)"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_smoke(spark, sf_dir, name):
    cq = REGISTRY[name]
    df = cq.spark_fn(spark, sf_dir)
    rows = df.collect()
    assert df.schema is not None
    assert len(rows) >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    names = set(e.queries())
    oracles = set(e.oracle_sql())
    assert oracles <= names


def test_oracle_no_hugeint_columns(duck):
    """Registry-wide lint for the r7 q_k22_bpe_pairs failure class: the
    driver's value-hash is type-tagged, and DuckDB's sum(BIGINT) returns
    HUGEINT (int128) where Spark emits int64 — identical values still
    hash-mismatch. Every oracle's final projection must cast integer
    aggregates (CAST(... AS BIGINT)). Enforced structurally: bind each
    oracle as a relation (no execution) and assert no HUGEINT/UHUGEINT
    survives to the result schema."""
    bad = {}
    for name, cq in REGISTRY.items():
        if cq.oracle is None:
            continue
        rel = duck.sql(cq.oracle)
        hug = [
            c
            for c, t in zip(rel.columns, rel.types)
            if "HUGEINT" in str(t).upper()
        ]
        if hug:
            bad[name] = hug
    assert not bad, (
        "oracles returning int128 columns (type-tagged driver hash "
        f"mismatches Spark int64): {bad}"
    )


def test_oracle_no_date_columns(duck):
    """Registry-wide lint for the r12 q_d28 failure class: DuckDB
    ``date_trunc('day', ts)`` returns DATE while Spark's returns
    TIMESTAMP — values agree, the driver's TYPE-TAGGED hash does not
    (pytest's pandas comparison silently coerces date -> datetime64
    and misses it; the driver-style sorted-tuple check caught it).
    Repo convention (registry docstring): time buckets stay
    TIMESTAMP — every oracle must ``CAST(... AS TIMESTAMP)`` its
    bucket columns (the q_d27 pattern). Structural like the hugeint
    lint: bind, no execution. A future contract that genuinely emits
    DateType on the Spark side gets an allowlist entry here."""
    date_ok: set[str] = set()  # contracts whose Spark side emits DateType
    bad = {}
    for name, cq in REGISTRY.items():
        if cq.oracle is None or name in date_ok:
            continue
        rel = duck.sql(cq.oracle)
        dates = [
            c
            for c, t in zip(rel.columns, rel.types)
            if str(t).upper() == "DATE"
        ]
        if dates:
            bad[name] = dates
    assert not bad, (
        "oracles returning DATE columns where Spark emits TIMESTAMP "
        f"(type-tagged driver hash mismatch — CAST AS TIMESTAMP): {bad}"
    )


def test_verify_first_window_invariants():
    """The driver checks only the first 50 queries() entries: the front
    list must be exactly 50 known names, dense in oracle-backed queries,
    and ordered_registry must put them first."""
    from jane_spark.contracts import REGISTRY, VERIFY_FIRST, ordered_registry

    assert len(VERIFY_FIRST) == 50
    assert len(set(VERIFY_FIRST)) == 50
    missing = [n for n in VERIFY_FIRST if n not in REGISTRY]
    assert not missing, missing
    ordered = list(ordered_registry())
    assert ordered[:50] == VERIFY_FIRST
    assert set(ordered) == set(REGISTRY)
    n_oracle = sum(1 for n in VERIFY_FIRST if REGISTRY[n].oracle is not None)
    # round 3 deliberately fronts the entire never-driver-run rows-only
    # backlog (streaming/UDF/multimodal/ANN — VERDICT r2 item 1), which
    # caps the oracle density this one round; with that backlog cleared,
    # later rounds return to >= 40.
    assert n_oracle >= 35, f"only {n_oracle}/50 window slots oracle-backed"


def test_float_boundary_margins(duck):
    """ADVICE r2: q_b9_radial_wrap cuts unrounded dist_deg at exactly
    12.0 and q_d14_stats hash-compares round(stat, dp) across two
    engines — a value within an ulp of a cut/rounding boundary would
    flip the hash nondeterministically. Pin that the synthetic data
    keeps wide margins at the driver's check scale (any margin above
    ~1e-9 dwarfs cross-engine ulp differences; observed: b9 >= 0.12,
    d14 >= 1e-4)."""
    from jane_spark.contracts.filters import LAT_EXPR, LON_EXPR

    dmin = duck.execute(
        f"""
        WITH pts AS (SELECT {LAT_EXPR} AS lat, {LON_EXPR} AS lon FROM customer),
        d AS (SELECT degrees(2*asin(sqrt(
            sin((radians(5.0)-radians(lat))/2)*sin((radians(5.0)-radians(lat))/2)
            + cos(radians(lat))*cos(radians(5.0))
              * sin((radians(178.5)-radians(lon))/2)
              * sin((radians(178.5)-radians(lon))/2)))) AS dd FROM pts)
        SELECT min(abs(dd - 12.0)) FROM d
        """
    ).fetchone()[0]
    assert dmin > 1e-6, f"b9 radius cut margin too thin: {dmin}"

    stats = duck.execute(
        """
        SELECT corr(l_quantity, l_extendedprice) AS c,
               covar_samp(l_quantity, l_extendedprice) AS cv,
               stddev_samp(l_discount) AS sd,
               var_pop(l_quantity) AS vp
        FROM lineitem GROUP BY l_returnflag
        """
    ).fetchall()
    for row in stats:
        for v, dp in zip(row, (4, 2, 6, 4)):
            margin = abs((v * 10**dp) % 1 - 0.5)
            assert margin > 1e-6, f"d14 rounding margin too thin: {v} @ {dp}dp"


def test_sql_views_idempotent_and_complete(spark, sf_dir):
    """engine/sql.register_views publishes all ten catalog tables and
    re-registration replaces cleanly (same session, repeated calls)."""
    from jane_spark.engine.catalog import TABLES
    from jane_spark.engine.sql import register_views

    names = register_views(spark, sf_dir)
    assert names == list(TABLES)
    again = register_views(spark, sf_dir)  # idempotent
    assert again == names
    n = spark.sql("SELECT count(*) AS n FROM documents").collect()[0].n
    assert n > 0
    joined = spark.sql(
        "SELECT count(*) AS n FROM nation JOIN region ON n_regionkey = r_regionkey"
    ).collect()[0].n
    assert joined == 25


def test_sql_views_persistent_catalog(spark, sf_dir):
    """register_views(persistent=True): external parquet tables (no
    data copy) + catalog views under the same names, the q_s1 SQL text
    unchanged, physical plan identical to the temp-view path (modulo
    expression ids), and re-registration idempotent."""
    import re

    from jane_spark.engine.catalog import TABLES
    from jane_spark.engine.sql import register_views

    q = """
        SELECT e.event_type AS event_type,
               count(*) AS n,
               round(avg(e.value), 4) AS avg_value,
               round(max(e.value), 3) AS max_value
        FROM events e
        WHERE e.ts >= TIMESTAMP '2024-01-03 00:00:00'
          AND e.ts <  TIMESTAMP '2024-01-20 00:00:00'
          AND e.event_type IN ('click', 'view', 'purchase')
        GROUP BY e.event_type
    """

    def normalized_plan(df):
        p = df._jdf.queryExecution().executedPlan().toString()
        p = re.sub(r"#\d+L?", "#x", p)
        p = re.sub(r"plan_id=\d+", "plan_id=x", p)
        # the catalog path labels its scan `spark_catalog.default.X_src`
        # — cosmetic, but it also shifts the point where Spark
        # truncates the DataFilters string, so normalize both
        p = re.sub(r"FileScan parquet \S*\[", "FileScan parquet [", p)
        return re.sub(r"DataFilters: .*?, Format:", "DataFilters: <n>, Format:", p)

    # temp-view baseline FIRST (temp views shadow catalog views, so
    # drop them before the persistent run)
    register_views(spark, sf_dir)
    temp_rows = sorted(tuple(r) for r in spark.sql(q).collect())
    temp_plan = normalized_plan(spark.sql(q))
    for t in TABLES:
        spark.catalog.dropTempView(t)

    names = register_views(spark, sf_dir, persistent=True)
    assert names == list(TABLES)
    assert spark.catalog.tableExists("events_src")
    pers_rows = sorted(tuple(r) for r in spark.sql(q).collect())
    pers_plan = normalized_plan(spark.sql(q))
    assert pers_rows == temp_rows and len(pers_rows) > 0
    assert pers_plan == temp_plan

    # events view carries the ns->us normalization as SQL text
    assert dict(spark.table("events").dtypes)["ts"] == "timestamp_ntz"

    # idempotent re-register; external semantics: the parquet survives
    again = register_views(spark, sf_dir, persistent=True)
    assert again == names
    assert spark.sql("SELECT count(*) AS n FROM documents").collect()[0].n > 0
    for t in TABLES:  # leave no catalog state behind for other tests
        spark.sql(f"DROP VIEW IF EXISTS `{t}`")
        spark.sql(f"DROP TABLE IF EXISTS `{t}_src`")
    import os
    assert os.path.exists(f"{sf_dir}/events.parquet")


# ---------------------------------------------------------------------
# Float-tie lint (VERDICT r10 #6 — the q_k29_pmi failure class): any
# oracle that HASHES a round() of a transcendental over data-dependent
# values is one round-half tie away from a cross-libm red (Spark's
# log2 = Math.log/ln2 vs DuckDB libm log2 differ at ULP level; GEMM
# vs sequential dot sums likewise). Every such contract must either
# convert its hashed surface to integers (what q_k29_pmi did) or be
# allowlisted here with the reason ties cannot flip on the fixture.

_ROUND_TRANSCENDENTAL = (
    r"round\s*\((?:[^()]|\([^()]*(?:\([^()]*\)[^()]*)*\))*?"
    r"(?:\blog2\b|\blog10\b|\blog\b|\bln\b|\bexp\b|\bsqrt\b|\bpow\b|"
    r"\blist_cosine_similarity\b|\bacos\b|\basin\b|\batan\b|\bcos\b|"
    r"\bsin\b|\bdegrees\b|\bradians\b)"
)

FLOAT_TIE_ALLOWLIST = {
    # cosine-similarity family: round(cos, 6) over random float
    # embeddings — values carry no arithmetic structure that can land
    # on a half boundary; measured min scaled margin over ALL pairs at
    # sf0.01 is 1.6e-6 (test below), ~1e3x the accumulated dim-64
    # GEMM ulp error. 9 rounds of green driver hashes.
    "q_k16_semdedup": "cosine e6 rounding, margin probed below",
    "q_k16_capped": "same q_k16 cosine e6 cut (capped view), same probe",
    "q_k19_hybrid": "cosine e6 rounding, margin probed below",
    "q_k23_ivf_pq": "cosine e6 rounding, margin probed below",
    "q_k23_ivf_pq_residual": "same coarse-probe cosine 9dp rounding as "
    "q_k23_ivf_pq (shared CTE chain); margin probed below",
    "q_k24_jl": "cosine e6 rounding, margin probed below",
    "q_k24_two_stage": "cosine e6 rounding, margin probed below",
    "q_k33_mmr": "cosine e6 rounding, margin probed below",
    "q_k36_hardneg": "cosine e6 rounding, margin probed below",
    "q_k39_ann_audit": "recall ratio of integer hit counts; sims only "
    "SELECT candidates (cosine e6 margin probed below)",
    "q_k3_ivf_portable": "cosine e6 rounding, margin probed below",
    "q_k50_ivf_incr": "same rounded-cosine argmax as q_k3_ivf_portable "
    "(frozen-centroid assignment leg), same all-pairs margin probe",
    "q_k3_lsh": "cosine e6 rounding, margin probed below",
    "q_k3_lsh_portable": "cosine e6 rounding, margin probed below",
    "q_k8_embed_neardup": "cosine e6 rounding, margin probed below",
    "q_k48_graph": "cosine e6 rounding (edge build + rerank), same "
    "all-pairs margin probe below",
    "q_k48_nn_descent": "cosine e6 rounding (seed + both refinement "
    "rounds score subsets of all pairs), same all-pairs margin probe "
    "below",
    "q_k48_incr": "cosine e6 rounding (stored build + insert seeds + "
    "one closed refinement round — all score subsets of all pairs), "
    "same all-pairs margin probe below",
    # q_k49_opq2 rounds a sqrt-bearing expression too, but the sqrt
    # sits below the regex's nesting depth so no entry is needed; its
    # tie-impossibility argument (exact ints -> one cast -> IEEE
    # exact-rounded ops only -> bit-identical doubles) lives in the
    # operator docstring and contract doc.
    "q_t14_embed_decontam": "cosine e6 rounding, margin probed below",
    # log-over-count family (the pmi class) — kept because the margins
    # are probed below at the driver's own data; entropy is the
    # thinnest at 9.7e-5 scaled (raw distance ~1e-8 vs ~1e-15 ulp).
    "q_t8_entropy": "log2-over-counts at 4dp, margin probed below",
    "q_t9_scorecard": "same entropy expression as q_t8, probed below",
    "q_k5_df": "ln(nd/df) at 4dp, margin probed below",
    "q_k5_tfidf": "tf*ln(nd/df) at 4dp, margin probed below",
    "q_k26_unigram_train": "EM scores are round(100*ln(ratio)) centi-"
    "logs re-rounded once; two full driver-green hashes (r10) and the "
    "score MAP keys are exact strings — a tie would need 100*ln of a "
    "count ratio exactly on a half integer, impossible (ln of a "
    "rational != 1 is irrational, Lindemann-Weierstrass)",
    "q_p21_dsir": "per-bucket round(100*ln(count ratio)) centi-log: an "
    "exact half-integer tie would need ln of a rational to be "
    "rational, impossible (Lindemann-Weierstrass); cross-libm ulp "
    "near-ties would need margin < ~1e-13 on a single ln call",
    # fixed-basis constructs: both engines evaluate identical
    # deterministic basis constants (DCT/mel/hyperplane tables), not
    # data-dependent transcendentals of counts
    "q_k7_audio_portable": "fixed mel/DCT basis constants",
    "q_k7_phash_portable": "fixed DCT basis constants",
    # covered by test_float_boundary_margins (b9 cut margin >= 0.12)
    "q_b9_radial": "haversine cut margin pinned by "
    "test_float_boundary_margins",
}


def test_float_tie_lint():
    """Structural: every oracle hashing round(transcendental) must be
    allowlisted with a justification; stale allowlist entries fail too
    so the list can only shrink as surfaces convert to integers."""
    import re

    pat = re.compile(_ROUND_TRANSCENDENTAL, re.I | re.S)
    hits = {
        name
        for name, cq in REGISTRY.items()
        if cq.oracle is not None and pat.search(cq.oracle)
    }
    unjustified = hits - set(FLOAT_TIE_ALLOWLIST)
    assert not unjustified, (
        "oracles hashing round(transcendental) without a documented "
        f"tie-impossibility argument: {sorted(unjustified)} — convert "
        "the hashed surface to integer counts (the q_k29_pmi fix) or "
        "add a justified allowlist entry"
    )
    stale = set(FLOAT_TIE_ALLOWLIST) - hits
    assert not stale, f"allowlist entries no longer needed: {sorted(stale)}"


def test_log_class_rounding_margins(duck):
    """Empirical half of the lint: the allowlisted log-over-count and
    cosine surfaces keep wide margins to their rounding boundaries on
    the fixture (any scaled margin above ~1e-6 dwarfs cross-libm ulp
    differences; observed at sf0.01: entropy 9.7e-5, idf 3.3e-2,
    cosine-e6 1.6e-6 over ALL pairs)."""
    ent = duck.execute(
        """
        WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
                      FROM documents),
        c AS (SELECT doc_id, tok, count(*) AS cnt FROM toks GROUP BY 1,2),
        a AS (SELECT doc_id, sum(cnt) AS n, sum(cnt*log2(cnt)) AS clog
              FROM c GROUP BY 1),
        e AS (SELECT log2(CAST(n AS DOUBLE)) - clog/n AS ent FROM a)
        SELECT min(abs(fmod(ent*10000, 1) - 0.5)) FROM e
        """
    ).fetchone()[0]
    assert ent > 1e-6, f"entropy 4dp margin too thin: {ent}"
    idf = duck.execute(
        """
        WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
                      FROM documents),
        f AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        d AS (SELECT count(DISTINCT doc_id) AS nd FROM toks)
        SELECT min(abs(fmod(ln(CAST(nd AS DOUBLE)/df)*10000, 1) - 0.5))
        FROM f, d
        """
    ).fetchone()[0]
    assert idf > 1e-6, f"idf 4dp margin too thin: {idf}"
    cos = duck.execute(
        """
        WITH v AS (SELECT vec_id AS id,
                          list_transform(embedding, x -> CAST(x AS DOUBLE))
                              AS v
                   FROM embeddings)
        SELECT min(abs(fmod(abs(list_cosine_similarity(a.v, b.v))
                            * 1000000, 1) - 0.5))
        FROM v a JOIN v b ON a.id < b.id
        """
    ).fetchone()[0]
    assert cos > 1e-7, f"cosine 6dp margin too thin: {cos}"
