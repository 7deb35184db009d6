"""Unit tests for URL curation (functions/urls): normalization
table-driven cases, registrable-domain heuristic, cap/blocklist
operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jane_spark.functions.urls import (
    domain_blocklist_filter,
    domain_cap,
    registrable_domain,
    url_domain,
    url_normalize,
)

NORM_CASES = [
    # lowercase scheme + host, fragment dropped
    ("HTTP://WWW.Example.COM/Path#frag", "http://www.example.com/Path"),
    # default ports dropped, per scheme
    ("http://a.com:80/x", "http://a.com/x"),
    ("https://a.com:443/x", "https://a.com/x"),
    # non-default ports kept — https:80 is NOT a default
    ("https://a.com:80/x", "https://a.com:80/x"),
    ("http://a.com:8080/x", "http://a.com:8080/x"),
    # empty path becomes /
    ("http://a.com", "http://a.com/"),
    ("http://a.com?z=1", "http://a.com/?z=1"),
    # tracking params stripped; survivors sorted; empty query dropped
    ("http://a.com/p?utm_source=t&b=2&a=1", "http://a.com/p?a=1&b=2"),
    ("http://a.com/p?utm_campaign=x&fbclid=y&gclid", "http://a.com/p"),
    ("http://a.com/p?ref=hn&refresh=1", "http://a.com/p?refresh=1"),
    # userinfo stripped
    ("http://bob:pw@a.com/p", "http://a.com/p"),
    # path case preserved, query value case preserved
    ("https://A.com/CaseD?Q=Vv", "https://a.com/CaseD?Q=Vv"),
    # malformed: no scheme -> NULL
    ("not a url", None),
    ("/relative/path", None),
]


def test_url_normalize_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in NORM_CASES], "url string")
    got = [r.norm for r in df.select(url_normalize(F.col("url")).alias("norm")).collect()]
    for (url, want), g in zip(NORM_CASES, got):
        assert g == want, f"{url!r}: {g!r} != {want!r}"


DOMAIN_CASES = [
    ("www.example.com", "example.com"),
    ("a.b.c.example.org", "example.org"),
    ("news.bbc.co.uk", "bbc.co.uk"),
    ("shop.something.com.au", "something.com.au"),
    ("example.com", "example.com"),
    ("bbc.co.uk", "bbc.co.uk"),
    # bare 2-level suffix falls back to itself
    ("co.uk", "co.uk"),
    ("localhost", "localhost"),
]


def test_registrable_domain_cases(spark):
    df = spark.createDataFrame([(h,) for h, _ in DOMAIN_CASES], "host string")
    got = [r.d for r in df.select(registrable_domain(F.col("host")).alias("d")).collect()]
    for (host, want), g in zip(DOMAIN_CASES, got):
        assert g == want, f"{host!r}: {g!r} != {want!r}"


def test_url_domain_from_raw(spark):
    df = spark.createDataFrame(
        [("HTTPS://User@News.BBC.CO.UK:8443/x?a=1",), ("garbage",)],
        "url string",
    )
    got = [r.d for r in df.select(url_domain(F.col("url")).alias("d")).collect()]
    assert got == ["bbc.co.uk", None]


def _corpus(spark):
    rows = [
        (i, f"http://site{i % 3}.com/p/{i}", 100 - i)  # 3 domains, 10 docs each
        for i in range(30)
    ]
    return spark.createDataFrame(rows, "doc_id long, url string, score long")


def test_domain_cap_keeps_best(spark):
    out = domain_cap(
        _corpus(spark), "url", 2, [F.col("score").desc(), F.col("doc_id").asc()]
    ).collect()
    assert len(out) == 6  # 3 domains x cap 2
    by_dom = {}
    for r in out:
        by_dom.setdefault(r.domain, []).append(r.doc_id)
    # highest score == lowest doc_id in this fixture
    assert sorted(by_dom["site0.com"]) == [0, 3]
    assert sorted(by_dom["site1.com"]) == [1, 4]


def test_domain_blocklist(spark):
    out = domain_blocklist_filter(_corpus(spark), "url", ["site1.com"]).collect()
    assert len(out) == 20
    assert all(r.domain != "site1.com" for r in out)


def test_blocklist_keeps_null_domain_rows(spark):
    df = spark.createDataFrame([(1, "junk")], "doc_id long, url string")
    out = domain_blocklist_filter(df, "url", ["x.com"]).collect()
    assert len(out) == 1 and out[0].domain is None


def test_urlnorm_plan_stays_codegen(spark):
    """The normalization chain must compile to pure projection — no
    UDFs, no exchanges (scale posture: projection over the corpus
    scan)."""
    df = spark.createDataFrame([("http://a.com/x?b=1",)], "url string")
    plan = df.select(
        url_normalize(F.col("url")).alias("n"), url_domain(F.col("url")).alias("d")
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ------------------------------------------------- randomized batch test

import random
import re

_TRACK_RE = re.compile(r"^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid|ref)(=|$)")


def _ref_normalize(scheme, user, host, port, path, params, frag):
    """Pure-Python spec twin built from COMPONENTS (never parses), the
    randomized analogue of the q_t22 construct-vs-parse oracle."""
    s, h = scheme.lower(), host.lower()
    keep_port = port not in ("",) and not (
        (s == "http" and port == "80") or (s == "https" and port == "443")
    )
    kept = sorted(p for p in params if p != "" and not _TRACK_RE.match(p))
    return (
        s + "://" + h
        + (":" + port if keep_port else "")
        + (path if path else "/")
        + ("?" + "&".join(kept) if kept else "")
    )


def test_url_normalize_randomized_components(spark):
    rng = random.Random(42)
    schemes = ["http", "HTTP", "https", "HtTpS", "Ftp"]
    tlds = ["com", "org", "co.uk", "com.au", "io"]
    param_pool = [
        "a=1", "b=2", "Z=z", "k", "k=", "refresh=1", "ref=hn", "ref",
        "utm_source=x", "utm_campaign", "fbclid=abc", "gclid", "msclkid=1",
        "mc_eid=7", "x=%41", "dup=1", "dup=2",
    ]
    cases = []
    for i in range(400):
        scheme = rng.choice(schemes)
        user = rng.choice(["", "", "bob@", "a:pw@"])
        host = (
            rng.choice(["", "WWW.", "Sub.DOM."])
            + f"Host{i % 37}."
            + rng.choice(tlds)
        )
        port = rng.choice(["", "", "80", "443", "8080", "1"])
        n_seg = rng.randint(0, 3)
        path = "".join(f"/Seg{rng.randint(0, 9)}" for _ in range(n_seg))
        params = rng.sample(param_pool, rng.randint(0, 5))
        frag = rng.choice(["", "#frag", "#a?b=1"])
        url = (
            scheme + "://" + user + host
            + (":" + port if port else "")
            + path
            + ("?" + "&".join(params) if params else "")
            + frag
        )
        cases.append((url, _ref_normalize(scheme, user, host, port, path, params, frag)))

    from jane_spark.functions.urls import url_normalize

    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r.norm for r in df.select(url_normalize(F.col("url")).alias("norm")).collect()
    ]
    for (url, want), g in zip(cases, got):
        assert g == want, f"{url!r}: {g!r} != {want!r}"


def test_trailing_dot_host_normalizes(spark):
    df = spark.createDataFrame(
        [("http://Example.COM./x",), ("https://news.bbc.co.uk.:8443/y",)],
        "url string",
    )
    rows = df.select(
        url_normalize(F.col("url")).alias("n"), url_domain(F.col("url")).alias("d")
    ).collect()
    assert rows[0].n == "http://example.com/x"
    assert rows[0].d == "example.com"
    assert rows[1].n == "https://news.bbc.co.uk:8443/y"
    assert rows[1].d == "bbc.co.uk"


def test_malformed_empty_label_hosts_stay_distinct(spark):
    """Review r6: 'a..com'-style hosts must NOT collapse to a shared
    '.com' domain key — an empty label in the suffix position makes
    the extraction fall back to the full host. A LEADING empty label
    is harmless: '.x.leading.com' keys to 'leading.com' exactly like
    its well-formed subdomain variants (desired grouping)."""
    df = spark.createDataFrame(
        [("a..com",), ("b..com",), ("example.com.",), (".leading.com",)],
        "host string",
    )
    got = [r.d for r in df.select(registrable_domain(F.col("host")).alias("d")).collect()]
    assert got == ["a..com", "b..com", "example.com.", "leading.com"]


# ------------------------------------------- Public Suffix List loader


_PSL_TEXT = """
// fixture: every rule kind the publicsuffix.org format defines
com
uk
co.uk
gov.uk
us
ma.us
k12.ma.us
ck
*.ck
!www.ck
com.au trailing-garbage-after-whitespace-is-ignored
"""


def test_parse_psl():
    from jane_spark.functions.urls import parse_psl

    rules = parse_psl(_PSL_TEXT)
    assert "com" in rules and "*.ck" in rules and "!www.ck" in rules
    assert "com.au" in rules  # whitespace-tail stripped per the spec
    assert not any(r.startswith("//") for r in rules)
    assert all(r == r.strip() and r for r in rules)


def test_registrable_domain_psl_algorithm(spark):
    """The publicsuffix.org matching algorithm end-to-end: longest
    rule wins, '*' consumes one label, '!' exceptions prevail, the
    implicit '*' default applies to unknown TLDs, suffix-only and
    empty-label hosts return unchanged."""
    from jane_spark.functions.urls import parse_psl, registrable_domain_psl

    rules = parse_psl(_PSL_TEXT)
    cases = [
        ("www.site1.com", "site1.com"),          # plain 1-label rule
        ("a.b.site2.gov.uk", "site2.gov.uk"),    # 2-label rule, deep host
        ("x3.k12.ma.us", "x3.k12.ma.us"),        # 3-label rule
        ("school.x.k12.ma.us", "x.k12.ma.us"),   # 3-label rule, deeper
        ("a4.b.ck", "a4.b.ck"),                  # wildcard *.ck
        ("www.ck", "www.ck"),                    # exception !www.ck
        ("co.uk", "co.uk"),                      # host IS a suffix
        ("ck", "ck"),                            # 1-label suffix host
        ("site7.unknowntld", "site7.unknowntld"),  # implicit '*' rule
        ("deep.q.site8.unknowntld", "site8.unknowntld"),
        ("a..com", "a..com"),                    # empty-label guard
        (".com", ".com"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = [
        r.d
        for r in df.select(
            registrable_domain_psl(F.col("host"), rules).alias("d")
        ).collect()
    ]
    assert got == [want for _, want in cases]


def test_psl_agrees_with_heuristic_where_overlapping(spark):
    """On hosts whose suffixes both paths know (com/org + the built-in
    2-level set), the PSL matcher and the heuristic must agree — the
    heuristic is the PSL restricted to SECOND_LEVEL_SUFFIXES."""
    from jane_spark.functions.urls import (
        SECOND_LEVEL_SUFFIXES,
        parse_psl,
        registrable_domain,
        registrable_domain_psl,
    )

    rules = parse_psl("\n".join(("com", "org") + SECOND_LEVEL_SUFFIXES))
    hosts = [
        ("www.example.com",), ("a.b.example.org",), ("x.gov.uk",),
        ("sub.site.co.uk",), ("news.co.jp",), ("shop.com.au",),
        ("one.two.three.com.br",), ("plain.com",),
    ]
    df = spark.createDataFrame(hosts, "host string")
    rows = df.select(
        registrable_domain(F.col("host")).alias("heur"),
        registrable_domain_psl(F.col("host"), rules).alias("psl"),
    ).collect()
    for r in rows:
        assert r.heur == r.psl, (r.heur, r.psl)


def test_psl_plan_stays_codegen(spark):
    """A big rule set must stay a zero-shuffle projection: the depth
    sets compile to InSet probes, no Exchange, no join, no UDF."""
    from jane_spark.functions.urls import registrable_domain_psl

    rules = ["com", "co.uk", "*.ck", "!www.ck"] + [
        f"suffix{i}.zz" for i in range(2000)
    ]
    df = spark.range(10).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".example.com")).alias("host")
    )
    out = df.select(registrable_domain_psl(F.col("host"), rules).alias("d"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert [r.d for r in out.collect()] == ["example.com"] * 10


def test_domain_cap_salted_viral_domain(spark):
    """VERDICT r6 #5: the documented-but-unexercised skew path. One
    viral domain carries >=10x the median domain's rows; the salted
    two-stage cap must return EXACTLY the unsalted result, and its
    plan must show the two-stage shape (two window sort+exchange
    rounds instead of one)."""
    from jane_spark.functions.urls import domain_cap

    rows = []
    # viral.com: 200 docs; 20 long-tail domains: 5 docs each (median 5)
    for i in range(200):
        rows.append((1000 + i, f"https://viral.com/p/{i}", (i * 37) % 100))
    for d in range(20):
        for i in range(5):
            rows.append((5000 + d * 10 + i, f"https://tail{d}.org/p/{i}", i))
    df = spark.createDataFrame(rows, "doc_id long, url string, score long")
    order = [F.col("score").desc(), F.col("doc_id").asc()]

    plain = domain_cap(df, "url", 3, order)
    salted = domain_cap(df, "url", 3, order, salted=True, n_salts=8)
    key = lambda r: (r["domain"], r["doc_id"], r["score"])  # noqa: E731
    p = sorted(map(key, plain.collect()))
    s = sorted(map(key, salted.collect()))
    assert p == s and len(p) == 3 + 20 * 3

    # plan guard: stage-1 (domain, salt) rank + stage-2 domain rank
    import re as _re

    def n_windows(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]  # AQE prints both
        return len(_re.findall(r"\bWindow \[", final)), final

    nw_s, sp = n_windows(salted)
    nw_p, pp = n_windows(plain)
    assert nw_s == 2, sp
    assert nw_p == 1, pp
    assert "__salt" in sp and "__salt" not in pp

    # a different salt count is still exact (bucket-count independence)
    s4 = sorted(map(key, domain_cap(df, "url", 3, order, salted=True, n_salts=4).collect()))
    assert s4 == p


# ------------------------------- PSL property tests (pure-Python twin)


def _psl_twin(host: str, rules: list) -> str:
    """Reference implementation of the publicsuffix.org algorithm,
    written independently of the Column expression: label-list walk,
    exceptions prevail, longest rule wins, '*' matches one label,
    implicit '*' default; suffix-only and empty-label hosts return
    unchanged."""
    if not host or host.startswith(".") or ".." in host:
        return host
    labels = host.split(".")
    n = len(labels)
    best, best_exc = 0, None
    for r in rules:
        exc = r.startswith("!")
        body = r[1:] if exc else r
        rl = body.split(".")
        if len(rl) > n:
            continue
        tail = labels[n - len(rl):]
        if all(a == "*" or a == b for a, b in zip(rl, tail)):
            if exc:
                if best_exc is None or len(rl) > best_exc:
                    best_exc = len(rl)
            else:
                best = max(best, len(rl))
    ps = (best_exc - 1) if best_exc is not None else max(best, 1)
    return host if n <= ps else ".".join(labels[n - ps - 1:])


def test_psl_property_vs_twin(spark):
    """Randomized rule sets x hosts: the per-depth InSet expression must
    agree with the independent label-walk twin on every combination."""
    import itertools
    import random

    from jane_spark.functions.urls import registrable_domain_psl

    rng = random.Random(77)
    labels = ["a", "b", "co", "gov", "uk", "jp", "com", "x1", "site"]
    rules = ["com", "uk", "co.uk", "gov.uk", "jp", "*.jp", "!pref.jp",
             "k12.ma.us", "ma.us", "us", "*.ck", "!www.ck", "ck"]
    hosts = []
    for _ in range(300):
        k = rng.randint(1, 5)
        hosts.append(".".join(rng.choice(labels) for _ in range(k)))
    hosts += ["pref.jp", "x.pref.jp", "q.www.ck", "www.ck", "gov.uk",
              "deep.a.b.co.uk", "a..uk", ".uk", "uk"]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = [r.d for r in df.select(
        registrable_domain_psl(F.col("host"), rules).alias("d")).collect()]
    want = [_psl_twin(h, rules) for h in hosts]
    bad = [(h, g, w) for h, g, w in zip(hosts, got, want) if g != w]
    assert not bad, bad[:5]


def test_url_normalize_is_idempotent(spark):
    """Canonicalization must be a FIXPOINT: normalizing an already-
    normalized URL returns it unchanged (dedup keys would otherwise
    drift across re-ingestion passes). Exercised over the synthetic
    corpus plus adversarial hand cases."""
    from jane_spark.contracts.curation import _synth_urls
    from jane_spark.functions.urls import url_normalize

    u = _synth_urls(spark, "/root/testdata/sf0.001").select("url")
    extra = spark.createDataFrame(
        [
            ("HTTPS://User:pw@Ex.COM.:443/a/b?utm_x=1&b=2&a=1#frag",),
            ("http://h:80",),
            ("http://h:8080/p?z=1&y=2",),
            ("ftp://x.y/path",),
            ("not a url",),
        ],
        "url string",
    )
    for df in (u, extra):
        once = df.select(url_normalize(F.col("url")).alias("n1")).filter(
            F.col("n1").isNotNull()
        )
        twice = once.select(
            "n1", url_normalize(F.col("n1")).alias("n2")
        )
        bad = twice.filter(
            F.col("n2").isNull() | (F.col("n1") != F.col("n2"))
        ).collect()
        assert not bad, bad[:3]


def test_with_normalized_url_equals_inline_pair(spark):
    """The materialized helper is a pure performance shape: its (norm,
    domain) must be row-identical to the inline expression pair."""
    from jane_spark.contracts.curation import _synth_urls
    from jane_spark.functions.urls import (
        url_domain,
        url_normalize,
        with_normalized_url,
    )

    u = _synth_urls(spark, "/root/testdata/sf0.001")
    a = sorted(
        (r["doc_id"], r["norm"], r["domain"])
        for r in with_normalized_url(u, "url")
        .select("doc_id", "norm", "domain")
        .collect()
    )
    b = sorted(
        (r["doc_id"], r["norm"], r["domain"])
        for r in u.select(
            "doc_id",
            url_normalize(F.col("url")).alias("norm"),
            url_domain(F.col("url")).alias("domain"),
        ).collect()
    )
    assert a == b
