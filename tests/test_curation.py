"""Unit tests for the round-6 curation operators: line-level
boilerplate dedup, duplicated-substring coverage, trigram LM scoring,
and SemDeDup (k-means + within-cluster dedup) — each pinned against a
brute-force in-memory reference."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

# ------------------------------------------------------------ line dedup


def test_line_dedup_drops_shared_lines_keeps_order(spark):
    docs = [
        (1, "nav bar\nunique one\nfooter"),
        (2, "nav bar\nunique two\nfooter"),
        (3, "nav bar\nonly here\nalso only here"),
        (4, "totally original"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    from jane_spark.operators.curation import line_dedup

    out = {
        r["doc_id"]: r
        for r in line_dedup(df, "doc_id", "text", max_df=1).collect()
    }
    # 'nav bar' (3 docs) and 'footer' (2 docs) are boilerplate at max_df=1
    assert out[1]["clean_text"] == "unique one"
    assert out[2]["clean_text"] == "unique two"
    assert out[3]["clean_text"] == "only here\nalso only here"
    assert out[4]["clean_text"] == "totally original"
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 1
    assert out[4]["removed_frac"] == 0.0


def test_line_dedup_keeps_fully_boilerplate_doc_total(spark):
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "same")], ["doc_id", "text"]
    )
    from jane_spark.operators.curation import line_dedup

    rows = line_dedup(df, "doc_id", "text", max_df=1).collect()
    assert len(rows) == 3  # total: nothing silently dropped
    assert all(r["clean_text"] == "" and r["n_kept"] == 0 for r in rows)
    assert all(r["removed_frac"] == 1.0 for r in rows)


def test_line_dedup_within_doc_repeat_not_boilerplate(spark):
    # a line repeated INSIDE one doc has document-frequency 1
    df = spark.createDataFrame([(1, "echo\necho\nend")], ["doc_id", "text"])
    from jane_spark.operators.curation import line_dedup

    r = line_dedup(df, "doc_id", "text", max_df=1).collect()[0]
    assert r["clean_text"] == "echo\necho\nend"


# ------------------------------------------------------ dup-span coverage


def test_dup_span_coverage_brute_force(spark):
    rng = random.Random(11)
    alph = "abcdefgh"
    shared = "".join(rng.choice(alph) for _ in range(40))
    docs = []
    for i in range(12):
        pre = "".join(rng.choice(alph) for _ in range(rng.randint(30, 80)))
        post = "".join(rng.choice(alph) for _ in range(rng.randint(30, 80)))
        body = pre + (shared if i % 3 == 0 else "") + post
        docs.append((i, body))
    k = 12
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    from jane_spark.operators.curation import dup_span_coverage

    got = {r["doc_id"]: r for r in dup_span_coverage(df, "doc_id", "text", k=k).collect()}

    # brute force: count positions whose k-gram occurs >= 2 times corpus-wide
    from collections import Counter

    cnt = Counter()
    for _, t in docs:
        for i in range(len(t) - k + 1):
            cnt[t[i : i + k]] += 1
    for doc_id, t in docs:
        covered = set()
        for i in range(len(t) - k + 1):
            if cnt[t[i : i + k]] >= 2:
                covered.update(range(i, i + k))
        r = got[doc_id]
        assert r["covered_chars"] == len(covered), doc_id
        assert r["n_chars"] == len(t)
        assert r["dup_frac"] == round(len(covered) / len(t), 4)


def test_dup_span_no_duplicates_is_zero(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghijklmnopqrstuvwxyz0123456789")], ["doc_id", "text"]
    )
    from jane_spark.operators.curation import dup_span_coverage

    r = dup_span_coverage(df, "doc_id", "text", k=10).collect()[0]
    assert r["covered_chars"] == 0 and r["dup_frac"] == 0.0


def test_exact_dup_spans_brute_force(spark):
    """Maximal exact duplicated spans (the true Lee et al. span
    criterion), pinned against a brute-force maximal-common-substring
    scan on constructed docs: (1) the emitted (a_start, b_start,
    span_len) set EQUALS the brute-force set of maximal common
    substrings >= k across all doc pairs (incl. same-doc repeats);
    (2) both sides' substrings are byte-equal and match span_md5;
    (3) maximality — no span extends by one char on either side;
    (4) a unique-content corpus emits nothing; (5) layout
    independence."""
    import hashlib
    import random

    rng = random.Random(7)
    alph = "abcdefgh"
    shared = "".join(rng.choice(alph) for _ in range(47))
    docs = []
    for i in range(10):
        pre = "".join(rng.choice(alph) for _ in range(rng.randint(25, 60)))
        post = "".join(rng.choice(alph) for _ in range(rng.randint(25, 60)))
        body = pre + (shared if i % 3 == 0 else "") + post
        # doc 9 repeats the shared block TWICE (same-doc pair)
        if i == 9:
            body = pre + shared + post + shared
        docs.append((i, body))
    k = 12
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    from jane_spark.operators.curation import exact_dup_spans

    rows = exact_dup_spans(df, "doc_id", "text", k=k).collect()
    got = {(r.a_id, r.b_id, r.a_start, r.b_start, r.span_len) for r in rows}

    # brute force: for every (doc pair, diagonal), scan match runs
    texts = dict(docs)
    expect = set()
    for a in range(10):
        for b in range(a, 10):
            ta, tb = texts[a], texts[b]
            for diag in range(-len(tb), len(ta) + 1):
                run = 0
                for i in range(len(ta) + 1):
                    j = i - diag
                    match = (
                        0 <= i < len(ta)
                        and 0 <= j < len(tb)
                        and ta[i] == tb[j]
                        and not (a == b and i == j)
                    )
                    if match:
                        run += 1
                    else:
                        if run >= k:
                            s = i - run
                            if not (a == b and s >= s - diag):
                                expect.add((a, b, s + 1, s - diag + 1, run))
                        run = 0
    # same-doc pairs: operator emits a_pos < b_pos only (a_start < b_start)
    assert got == expect, (
        sorted(got - expect)[:5], sorted(expect - got)[:5]
    )

    for r in rows:
        sa = texts[r.a_id][r.a_start - 1 : r.a_start - 1 + r.span_len]
        sb = texts[r.b_id][r.b_start - 1 : r.b_start - 1 + r.span_len]
        assert sa == sb
        assert hashlib.md5(sa.encode()).hexdigest() == r.span_md5

    uniq = spark.createDataFrame(
        [(1, "abcdefghijklmnop"), (2, "qrstuvwxyz012345")],
        ["doc_id", "text"],
    )
    assert exact_dup_spans(uniq, "doc_id", "text", k=12).count() == 0

    import pytest

    with pytest.raises(ValueError, match="k must be >= 2"):
        exact_dup_spans(df, "doc_id", "text", k=1)
    with pytest.raises(ValueError, match="max_gram_count"):
        exact_dup_spans(df, "doc_id", "text", k=12, max_gram_count=1)

    again = exact_dup_spans(
        df.repartition(7), "doc_id", "text", k=k
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_exact_dup_spans_cap_stays_maximal(spark):
    """Cap semantics made exact (ADVICE r14): an over-cap gram
    INTERIOR to a run must not fragment it into false 'maximal'
    spans — runs whose boundaries touch an over-cap anchor are
    dropped, so every emitted span is still genuinely maximal; and
    with no cap set, the fanout_guard raises at execution instead of
    silently fanning out C(cnt, 2) pairs."""
    import random

    import pytest

    from jane_spark.operators.curation import exact_dup_spans

    rng = random.Random(11)
    alph = "abcdefgh"
    boiler = "".join(rng.choice(alph) for _ in range(20))
    a_flank = "".join(rng.choice(alph) for _ in range(30))
    b_flank = "".join(rng.choice(alph) for _ in range(30))
    body = a_flank + boiler + b_flank
    docs = [(100, body), (101, body)]
    # 9 more copies of the boilerplate push its interior 12-grams
    # over the cap while the flank-straddling grams stay at count 2
    for i in range(9):
        pad = "".join(rng.choice(alph) for _ in range(25))
        docs.append((102 + i, pad + boiler))
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    # uncapped (guard disabled): the full 80-char span is emitted
    full = exact_dup_spans(
        df, "doc_id", "text", k=12, fanout_guard=None
    ).collect()
    assert any(
        (r.a_id, r.b_id, r.span_len) == (100, 101, 80) for r in full
    )

    # capped at 8: interior boilerplate grams (count 11) are excluded;
    # the two flank fragments of the (100, 101) run border over-cap
    # anchors, so NOTHING fragmented is emitted for that pair — no
    # false maximal spans, pinned by brute maximality on every row
    capped = exact_dup_spans(
        df, "doc_id", "text", k=12, max_gram_count=8
    ).collect()
    texts = dict(docs)
    for r in capped:
        ta, tb = texts[r.a_id], texts[r.b_id]
        i, j, ln = r.a_start - 1, r.b_start - 1, r.span_len
        assert ta[i : i + ln] == tb[j : j + ln]
        left_ext = i > 0 and j > 0 and ta[i - 1] == tb[j - 1]
        right_ext = (
            i + ln < len(ta) and j + ln < len(tb)
            and ta[i + ln] == tb[j + ln]
        )
        assert not left_ext and not right_ext, (r, "not maximal")
    assert not any(
        {r.a_id, r.b_id} == {100, 101} for r in capped
    ), capped

    # fanout guard: no cap + a gram over the guard -> loud failure
    with pytest.raises(Exception, match="fanout_guard"):
        exact_dup_spans(
            df, "doc_id", "text", k=12, fanout_guard=5
        ).collect()
    with pytest.raises(ValueError, match="fanout_guard"):
        exact_dup_spans(df, "doc_id", "text", k=12, fanout_guard=1)


def test_exact_span_removal_brute_force(spark):
    """Span-granularity duplicate REMOVAL (the Lee et al. 2022 edit
    step on T45's exact maximal spans), pinned: (1) byte-exact
    reconstruction — clean_text equals a brute-force removal of every
    position covered by a maximal common substring >= min_len, with
    anchors k << min_len (the decoupling T21 cannot express);
    (2) removed_chars == covered positions, n_spans == merged
    intervals; (3) with min_len == k the removal coincides with
    dup_span_removal per document; (4) untouched and short docs pass
    through byte-identical; (5) layout independence."""
    import random

    from jane_spark.operators.curation import (
        dup_span_removal,
        exact_span_removal,
    )

    rng = random.Random(13)
    alph = "abcdefgh"
    long_block = "".join(rng.choice(alph) for _ in range(55))
    short_block = "".join(rng.choice(alph) for _ in range(20))
    docs = []
    for i in range(12):
        pre = "".join(rng.choice(alph) for _ in range(rng.randint(20, 50)))
        post = "".join(rng.choice(alph) for _ in range(rng.randint(20, 50)))
        body = pre
        if i % 3 == 0:
            body += long_block  # >= min_len in 4 docs -> removed
        if i % 4 == 0:
            body += short_block  # >= k but < min_len -> kept
        body += post
        if i == 11:
            body = pre + long_block + post + long_block  # same-doc repeat
        docs.append((i, body))
    docs.append((12, "tiny"))  # shorter than k
    k, min_len = 12, 40
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {
        r.doc_id: r
        for r in exact_span_removal(
            df, "doc_id", "text", k=k, min_len=min_len
        ).collect()
    }
    assert set(out) == {d for d, _ in docs}

    # brute force: positions covered by any maximal common substring
    # of length >= min_len across all doc pairs / same-doc repeats
    texts = dict(docs)
    covered = {d: set() for d in texts}
    for a in texts:
        for b in texts:
            if a > b:
                continue
            ta, tb = texts[a], texts[b]
            for diag in range(-len(tb), len(ta) + 1):
                run = 0
                for i in range(len(ta) + 1):
                    j = i - diag
                    match = (
                        0 <= i < len(ta)
                        and 0 <= j < len(tb)
                        and ta[i] == tb[j]
                        and not (a == b and i == j)
                    )
                    if match:
                        run += 1
                    else:
                        if run >= min_len:
                            covered[a].update(range(i - run, i))
                            covered[b].update(range(i - run - diag, i - diag))
                        run = 0
    for d, txt in texts.items():
        keep = "".join(
            ch for p, ch in enumerate(txt) if p not in covered[d]
        )
        r = out[d]
        assert r.clean_text == keep, (d, r.clean_text, keep)
        assert r.removed_chars == len(covered[d])
        assert r.n_chars_clean == len(keep)
        # merged-interval count: breaks in the sorted covered set
        ps = sorted(covered[d])
        n_ivl = sum(
            1
            for x, p in enumerate(ps)
            if x == 0 or p - ps[x - 1] > 1
        )
        assert r.n_spans == n_ivl, (d, r.n_spans, n_ivl)

    # (3) min_len == k degenerates to T21 per-position coverage
    a = {
        r.doc_id: (r.clean_text, r.removed_chars)
        for r in exact_span_removal(
            df, "doc_id", "text", k=k, min_len=k
        ).collect()
    }
    b = {
        r.doc_id: (r.clean_text, r.removed_chars)
        for r in dup_span_removal(df, "doc_id", "text", k=k).collect()
    }
    assert a == b

    # (5) layout independence
    again = {
        r.doc_id: tuple(r)
        for r in exact_span_removal(
            df.repartition(7), "doc_id", "text", k=k, min_len=min_len
        ).collect()
    }
    assert again == {d: tuple(out[d]) for d in out}


# ---------------------------------------------------------- trigram LM


def test_lm_score_brute_force(spark):
    docs = [
        (1, "the cat sat"),
        (2, "the cat sat on the mat"),
        (3, "zq zq zq"),  # mostly OOV vs the doc-1 model
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    from jane_spark.operators.curation import lm_score, train_char_lm

    model = train_char_lm(df.filter(F.col("doc_id") == 1), "text", n=3)
    got = {r["doc_id"]: r for r in lm_score(df, "doc_id", "text", model, n=3).collect()}

    from collections import Counter

    ref = "the cat sat".lower()
    cnt = Counter(ref[i : i + 3] for i in range(len(ref) - 2))
    N, V = sum(cnt.values()), len(cnt)
    for doc_id, t in docs:
        t = t.lower()
        lps = []
        for i in range(len(t) - 2):
            g = t[i : i + 3]
            c = cnt.get(g)
            lps.append(
                math.log((c + 1) / (N + V)) if c else math.log(1.0 / (N + V))
            )
        assert got[doc_id]["n_grams"] == len(lps)
        assert got[doc_id]["nll"] == pytest.approx(round(-sum(lps) / len(lps), 4))
    # the in-model doc scores better (lower NLL) than the OOV doc
    assert got[1]["nll"] < got[3]["nll"]


# ------------------------------------------------------------- SemDeDup


def _numpy_kmeans(vecs: np.ndarray, ids: list[int], k: int, iters: int):
    """The reference twin of operators.semdedup.kmeans_assign."""
    order = np.argsort(ids)
    cents = vecs[order[:k]].astype(np.float64).copy()
    v = vecs.astype(np.float64)
    assign = None
    for _ in range(iters):
        d = ((v[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # numpy argmin takes the first min = min cid
        for c in range(k):
            m = v[assign == c]
            if len(m):
                cents[c] = np.round(m.mean(axis=0), 9)
    d = ((v[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1)


def test_kmeans_assign_matches_numpy(spark):
    rng = np.random.RandomState(3)
    n, dim, k = 80, 6, 5
    vecs = rng.randn(n, dim).astype(np.float32)
    ids = list(range(n))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in ids], ["vec_id", "embedding"]
    )
    from jane_spark.operators.semdedup import kmeans_assign

    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(df, "vec_id", "embedding", k=k, iters=5).collect()
    }
    want = _numpy_kmeans(vecs, ids, k, 5)
    mismatch = [i for i in ids if got[i] != want[i]]
    assert not mismatch, mismatch[:10]


def test_kmeans_assign_partitioning_invariant(spark):
    rng = np.random.RandomState(5)
    vecs = rng.randn(40, 4).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    from jane_spark.operators.semdedup import kmeans_assign

    a = kmeans_assign(
        spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(1),
        "vec_id", "embedding", k=4, iters=3,
    ).collect()
    b = kmeans_assign(
        spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(13),
        "vec_id", "embedding", k=4, iters=3,
    ).collect()
    assert {(r["vec_id"], r["cluster"]) for r in a} == {
        (r["vec_id"], r["cluster"]) for r in b
    }


def test_semantic_dedup_greedy_by_id(spark):
    # cluster 0: 1 ~ 2 ~ 3 (all mutually similar) -> keep 1, dup 2 and 3
    # cluster 1: 4 vs 5 dissimilar -> both kept
    rows = [
        (1, [1.0, 0.0, 0.0], 0),
        (2, [0.999, 0.01, 0.0], 0),
        (3, [0.998, 0.02, 0.0], 0),
        (4, [0.0, 1.0, 0.0], 1),
        (5, [0.0, 0.0, 1.0], 1),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    from jane_spark.operators.semdedup import semantic_dedup

    got = {
        r["vec_id"]: r["is_dup"]
        for r in semantic_dedup(df, "vec_id", "embedding", "label", 0.95).collect()
    }
    assert got == {1: False, 2: True, 3: True, 4: False, 5: False}


def test_semantic_dedup_respects_cluster_boundary(spark):
    # identical vectors in DIFFERENT clusters are not compared
    rows = [(1, [1.0, 0.0], 0), (2, [1.0, 0.0], 1)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    from jane_spark.operators.semdedup import semantic_dedup

    got = {
        r["vec_id"]: r["is_dup"]
        for r in semantic_dedup(df, "vec_id", "embedding", "label", 0.9).collect()
    }
    assert got == {1: False, 2: False}


# ------------------------------------------------------- corpus shuffle


def test_corpus_shuffle_is_dense_permutation(spark):
    from jane_spark.functions.sampling import corpus_shuffle

    df = spark.createDataFrame([(i,) for i in range(200)], ["doc_id"])
    rows = corpus_shuffle(df, "doc_id", n_shards=8, salt="e0:").collect()
    assert len(rows) == 200
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard  # dense 0..n-1


def test_corpus_shuffle_partitioning_and_salt(spark):
    from jane_spark.functions.sampling import corpus_shuffle

    rows = [(i,) for i in range(150)]
    a = corpus_shuffle(
        spark.createDataFrame(rows, ["doc_id"]).repartition(1),
        "doc_id", n_shards=4, salt="e0:",
    ).collect()
    b = corpus_shuffle(
        spark.createDataFrame(rows, ["doc_id"]).repartition(17),
        "doc_id", n_shards=4, salt="e0:",
    ).collect()
    key = lambda rs: sorted((r["doc_id"], r["shard"], r["pos"]) for r in rs)
    assert key(a) == key(b)  # layout-independent
    c = corpus_shuffle(
        spark.createDataFrame(rows, ["doc_id"]), "doc_id", n_shards=4, salt="e1:"
    ).collect()
    assert key(a) != key(c)  # a new salt is a new permutation


# --------------------------------------------------- embed decontam


def test_embed_decontam_matches_numpy(spark):
    rng = np.random.RandomState(9)
    tr = rng.randn(60, 8).astype(np.float32)
    ev = rng.randn(25, 8).astype(np.float32)
    train = spark.createDataFrame(
        [(i, [float(x) for x in tr[i]]) for i in range(60)], ["vec_id", "embedding"]
    )
    evdf = spark.createDataFrame(
        [(100 + i, [float(x) for x in ev[i]]) for i in range(25)],
        ["vec_id", "embedding"],
    )
    from jane_spark.operators.vector import embed_decontam

    got = {
        r["vec_id"]: (r["max_eval_sim"], r["contaminated"])
        for r in embed_decontam(
            train, evdf, "vec_id", "embedding", threshold=0.5,
            n_train_blocks=3, n_eval_blocks=2,
        ).collect()
    }
    t64, e64 = tr.astype(np.float64), ev.astype(np.float64)
    sims = (t64 @ e64.T) / (
        np.linalg.norm(t64, axis=1)[:, None] * np.linalg.norm(e64, axis=1)[None, :]
    )
    for i in range(60):
        mx = round(float(sims[i].max()), 6)
        assert got[i] == (pytest.approx(mx), mx >= 0.5), i


def test_embed_decontam_block_invariant(spark):
    rng = np.random.RandomState(13)
    tr = rng.randn(40, 5).astype(np.float32)
    ev = rng.randn(10, 5).astype(np.float32)
    train = spark.createDataFrame(
        [(i, [float(x) for x in tr[i]]) for i in range(40)], ["vec_id", "embedding"]
    )
    evdf = spark.createDataFrame(
        [(200 + i, [float(x) for x in ev[i]]) for i in range(10)],
        ["vec_id", "embedding"],
    )
    from jane_spark.operators.vector import embed_decontam

    outs = []
    for nt, ne in ((1, 1), (4, 1), (2, 3)):
        outs.append(
            sorted(
                tuple(r)
                for r in embed_decontam(
                    train, evdf, "vec_id", "embedding", 0.4,
                    n_train_blocks=nt, n_eval_blocks=ne,
                ).collect()
            )
        )
    assert outs[0] == outs[1] == outs[2]


def test_dup_span_short_docs_no_phantom_grams(spark):
    # docs shorter than k must contribute NO grams (sequence(1,0)
    # counts down in Spark — the guard keeps them out), even when two
    # short docs are identical
    df = spark.createDataFrame(
        [(1, "tiny"), (2, "tiny"), (3, "0123456789abcdef0123456789abcdef")],
        ["doc_id", "text"],
    )
    from jane_spark.operators.curation import dup_span_coverage

    got = {r["doc_id"]: r for r in dup_span_coverage(df, "doc_id", "text", k=10).collect()}
    assert got[1]["covered_chars"] == 0 and got[2]["covered_chars"] == 0
    # doc 3 self-repeats its 16-char block -> some coverage
    assert got[3]["covered_chars"] > 0


def test_char_lm_short_text_empty_grams(spark):
    from jane_spark.operators.curation import lm_score, train_char_lm

    df = spark.createDataFrame([(1, "abcdef"), (2, "ab")], ["doc_id", "text"])
    model = train_char_lm(df, "text", n=3)
    rows = {r["doc_id"]: r for r in lm_score(df, "doc_id", "text", model, n=3).collect()}
    assert 1 in rows and rows[1]["n_grams"] == 4
    assert 2 not in rows  # no trigrams -> no score row (both engines agree)


# ------------------------------------------------------- heavy hitters


def test_frequent_items_exact_when_capacity_suffices(spark):
    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 20 + [("d",)] * 5
    df = spark.createDataFrame(rows, ["w"])
    from jane_spark.operators.sketch import frequent_items

    out = frequent_items(df, "w", k=3, capacity=100).collect()
    assert [(r["item"], r["est_count"], r["err_bound"]) for r in out] == [
        ("a", 50, 0), ("b", 30, 0), ("c", 20, 0)
    ]


def test_frequent_items_bounds_hold_under_pressure(spark):
    # skewed stream, capacity far below distinct count: the heavy item
    # must survive with est <= true <= est + err_bound
    import random

    rng = random.Random(42)
    rows = [("heavy",)] * 400 + [(f"tail{rng.randrange(500)}",) for _ in range(600)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, ["w"]).repartition(4)
    from jane_spark.operators.sketch import frequent_items

    out = frequent_items(df, "w", k=5, capacity=20).collect()
    by_item = {r["item"]: r for r in out}
    assert "heavy" in by_item  # freq > N/capacity => guaranteed present
    r = by_item["heavy"]
    assert r["est_count"] <= 400 <= r["est_count"] + r["err_bound"]


def test_frequent_items_partitioning_changes_only_error(spark):
    # exact regime: result identical across partitionings
    rows = [(f"w{i % 7}",) for i in range(210)]
    from jane_spark.operators.sketch import frequent_items

    a = frequent_items(
        spark.createDataFrame(rows, ["w"]).repartition(1), "w", k=7, capacity=50
    ).collect()
    b = frequent_items(
        spark.createDataFrame(rows, ["w"]).repartition(11), "w", k=7, capacity=50
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


# ------------------------------------------------------------------ PII


def test_pii_redact_classes_and_luhn_gate(spark):
    from jane_spark.functions.text import pii_counts, pii_redact

    rows = [
        (1, "reach me at jane.doe@corp.example or 555-0173 from 192.168.1.17"),
        (2, "pan 4111111111111111 ok but 1234567890123456 fails luhn"),
        (3, "two cards 4111111111111111 and 5500005555555559 both valid"),
        (4, "plain text with digits 12345 and dots a.b.c untouched"),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    out = {
        r["id"]: (r["clean"], r["c"].asDict())
        for r in df.select(
            "id",
            pii_redact(F.col("t")).alias("clean"),
            pii_counts(F.col("t")).alias("c"),
        ).collect()
    }
    assert out[1][0] == "reach me at <EMAIL> or <PHONE> from <IP>"
    assert out[2][0] == "pan <CARD> ok but 1234567890123456 fails luhn"
    assert out[2][1]["n_cards_found"] == 2 and out[2][1]["n_cards_valid"] == 1
    assert out[3][0] == "two cards <CARD> and <CARD> both valid"
    assert out[4][0] == rows[3][1]  # nothing PII-shaped -> unchanged


def test_luhn_valid_reference_numbers(spark):
    from jane_spark.functions.text import luhn_valid

    cases = [
        ("4111111111111111", True),   # Visa test number
        ("5500005555555559", True),   # Mastercard test number
        ("4111111111111112", False),
        ("0000000000000000", True),   # degenerate but mod-10 = 0
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], ["n"])
    got = [r["v"] for r in df.select(luhn_valid(F.col("n")).alias("v")).collect()]
    assert got == [want for _, want in cases]


# ------------------------------------------------- C4 policy line filter


def test_policy_line_filter_rules(spark):
    from jane_spark.operators.curation import policy_line_filter

    rows = [
        # doc 1: one good line, one too-short, one blocklisted
        (1, "alpha beta gamma.\nshort\nclick to subscribe now."),
        # doc 2: terminal-punctuation rule drops the bare line
        (2, "a fine sentence ends well.\nno terminal punct here"),
        # doc 3: over-long line dropped
        (3, "x " * 60 + "tail.\nkeep this one please."),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    out = {
        r["id"]: r.asDict()
        for r in policy_line_filter(
            df,
            "id",
            "t",
            min_words=3,
            max_line_chars=80,
            blocklist=["subscribe"],
            terminal_chars=".!?",
            min_kept_lines=2,
        ).collect()
    }
    assert out[1]["clean_text"] == "alpha beta gamma."
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 1
    assert out[1]["doc_keep"] is False
    assert out[2]["clean_text"] == "a fine sentence ends well."
    assert out[3]["clean_text"] == "keep this one please."
    assert out[3]["n_kept"] == 1


def test_policy_line_filter_total_on_empty(spark):
    from jane_spark.operators.curation import policy_line_filter

    df = spark.createDataFrame([(1, "bad"), (2, "good line here.")], ["id", "t"])
    out = {
        r["id"]: r.asDict()
        for r in policy_line_filter(
            df, "id", "t", min_words=3, terminal_chars="."
        ).collect()
    }
    # fully-filtered doc survives with empty clean_text (caller's policy)
    assert out[1]["clean_text"] == "" and out[1]["n_kept"] == 0
    assert out[2]["n_kept"] == 1 and out[2]["doc_keep"] is True


# ------------------------------------------------------------ HTML strip


def test_strip_html_cases(spark):
    from jane_spark.functions.text import strip_html

    rows = [
        (1, '<p>Hello <b>world</b></p><script>if (a < b) { x(); }</script>ok'),
        (2, "<style>.c { color: red }</style><div>kept   text</div>"),
        (3, "a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp;end"),
        (4, "a &amp;lt; b"),  # double-escaped: must NOT become '<'
        (5, "no markup at all"),
        (6, '<SCRIPT TYPE="x">var y;</SCRIPT><P>upper kept</P>'),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    out = {
        r["id"]: r["c"]
        for r in df.select("id", strip_html(F.col("t")).alias("c")).collect()
    }
    assert out[1] == "Hello world ok"  # script content (with bare <) gone
    assert out[6] == "upper kept"  # tag matching is case-insensitive
    assert out[2] == "kept text"  # style block gone, whitespace collapsed
    assert out[3] == 'a & b <tag> "q" \'s\' end'
    assert out[4] == "a &lt; b"
    assert out[5] == "no markup at all"


# ------------------------------------------------------- mixture sampling


def test_mixture_sample_budget_and_determinism(spark):
    from jane_spark.functions.sampling import mixture_sample

    rows = [
        (i, "over" if i < 800 else ("under" if i < 900 else "off"), 100)
        for i in range(1000)
    ]
    df = spark.createDataFrame(rows, ["id", "src", "n_tok"])
    # budget 30000 tokens, weights 2:1 -> over target 20000/80000 avail
    # (frac .25), under target 10000/10000 (frac 1.0), 'off' excluded
    kept = mixture_sample(
        df, "id", "src", "n_tok", {"over": 2.0, "under": 1.0}, 30000.0
    ).collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r["src"], set()).add(r["id"])
    assert "off" not in by_src  # weight-absent source excluded
    assert by_src["under"] == set(range(800, 900))  # frac 1.0 keeps all
    n_over = len(by_src["over"])
    assert 140 <= n_over <= 260  # hash-uniform around 200 of 800
    # partition-layout independence: same keep set after repartition
    kept2 = mixture_sample(
        df.repartition(7, "id"),
        "id",
        "src",
        "n_tok",
        {"over": 2.0, "under": 1.0},
        30000.0,
    ).collect()
    assert {r["id"] for r in kept2} == {r["id"] for r in kept}
    # a different salt draws a different (same-sized-ish) sample
    kept3 = mixture_sample(
        df, "id", "src", "n_tok", {"over": 2.0, "under": 1.0}, 30000.0,
        salt="mix2:",
    ).collect()
    assert {r["id"] for r in kept3} != {r["id"] for r in kept}


def test_vocab_growth_first_seen_accounting(spark):
    """New-type counts attribute each type to its FIRST batch; the
    cumulative column telescopes; batches introducing nothing new emit
    no row (sparse curve); ngram=2 counts bigram types."""
    from jane_spark.functions.text import vocab_growth

    rows = [
        (0, "a b c"),        # batch 0: types a,b,c
        (1, "a b"),          # batch 0 still
        (2, "c d"),          # batch 1: +d
        (3, "a b c d"),      # batch 1: nothing new
        (4, "a d"),          # batch 2: nothing new -> no row
        (6, "e"),            # batch 3: +e
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.batch: (r.n_new, r.vocab_cum) for r in
           vocab_growth(df, "doc_id", "text", batch_width=2).collect()}
    assert got == {0: (3, 3), 1: (1, 4), 3: (1, 5)}, got

    bi = {r.batch: r.n_new for r in
          vocab_growth(df, "doc_id", "text", 2, ngram=2).collect()}
    # batch 0 bigrams: {a b, b c}; batch 1 adds {c d, b c->seen, a b
    # ->seen}: 'c d' new; batch 2 'a d' new; batch 3: 'e' too short
    assert bi == {0: 2, 1: 1, 2: 1}, bi


def test_pmi_collocations_ranking(spark):
    """A pair that ONLY co-occurs ('new york') scores far above a pair
    of independent frequent tokens; min_count prunes rare pairs; the
    PMI of a perfectly independent pair is ~0."""
    import math

    from jane_spark.functions.text import pmi_collocations

    # 40 docs 'new york', 40 alternating fillers so 'the of' appears
    # with exactly the rate independence predicts
    rows = [(i, "new york") for i in range(40)]
    rows += [(100 + i, "the of the of the of") for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.w1, r.w2): (r.n_pair, r.pmi) for r in
           pmi_collocations(df, "text", min_count=10).collect()}
    assert ("new", "york") in got
    ny_n, ny_pmi = got[("new", "york")]
    assert ny_n == 40
    # exclusive pair scores ABOVE every filler pair (rarity rewarded)
    assert all(
        ny_pmi > pmi for pair, (_, pmi) in got.items()
        if pair != ("new", "york")
    ), got
    # threshold: nothing below min_count leaks in
    assert all(n >= 10 for n, _ in got.values())
    # replay every cell with tolerance (Spark's log2 = ln/ln2 vs CPython
    # libm log2 differ at ULP level; round(,4) can flip a tie — so the
    # hashed contract surface is the count tuple and the float is only
    # ever asserted approximately)
    nu = 40 * 2 + 40 * 6
    nb = 40 * 1 + 40 * 5
    uni = {"new": 40, "york": 40, "the": 120, "of": 120}
    for (w1, w2), (n_pair, pmi) in got.items():
        expect = (
            math.log2(n_pair) + 2 * math.log2(nu) - math.log2(nb)
            - math.log2(uni[w1]) - math.log2(uni[w2])
        )
        assert abs(pmi - expect) < 2e-4, (w1, w2, pmi, expect)


def test_systematic_weighted_sample_properties(spark):
    """Systematic resampling guarantees: sum(n_copies) == n exactly;
    every count is floor or ceil of its expectation n*w/W (the
    sub-multinomial variance property); non-positive weights excluded;
    heavy rows upsample; partition-layout independent."""
    from jane_spark.functions.sampling import systematic_weighted_sample

    # skewed: doc 7 carries half the mass; doc 3 is zero-weight
    rows = [(i, 1000 if i == 7 else (0 if i == 3 else 10)) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    out = systematic_weighted_sample(df, "doc_id", "w", n=50, bucket_width=16)
    got = {r.doc_id: r.n_copies for r in out.collect()}
    W = 1000 + 98 * 10
    assert sum(got.values()) == 50
    assert 3 not in got  # zero weight excluded
    assert got[7] >= 2  # heavy row multi-copied
    import math

    for i, w in rows:
        if w <= 0:
            continue
        e = 50 * w / W
        c = got.get(i, 0)
        assert c in (math.floor(e), math.ceil(e)), (i, c, e)

    # layout independence: same result from a different partitioning
    got2 = {
        r.doc_id: r.n_copies
        for r in systematic_weighted_sample(
            df.repartition(13, "w"), "doc_id", "w", n=50, bucket_width=16
        ).collect()
    }
    assert got2 == got

    # plan: no single-partition window over ROW-scale data — the only
    # unpartitioned window runs over the bucket table (count <= rows/
    # bucket_width); the row-scale window is partitioned by bucket
    plan = (
        systematic_weighted_sample(df, "doc_id", "w", n=50, bucket_width=16)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("Window") == 2, plan[:900]


# ----------------------------------------------------- image perceptual hash


def _text_img(seed_text: str) -> "np.ndarray":
    return np.frombuffer(
        seed_text.encode()[:256].ljust(256, b"\x00"), np.uint8
    ).reshape(16, 16)


def test_phash64_noise_tolerance_and_separation():
    from jane_spark.operators.imagehash import phash64

    a = _text_img("the quick brown fox jumps over the lazy dog " * 6)
    noisy = a.copy()
    noisy[3, 7] ^= 1
    different = 255 - a  # inversion flips every DCT sign bit pattern
    h_a, h_n, h_d = phash64(a), phash64(noisy), phash64(different)
    ham = lambda x, y: bin((x ^ y) & ((1 << 64) - 1)).count("1")  # noqa: E731
    assert ham(h_a, h_n) <= 6
    assert ham(h_a, h_d) > 10
    # grayscale of an RGB stack of the same plane equals the plane's hash
    rgb = np.stack([a, a, a], axis=2)
    assert phash64(rgb) == h_a
    # alpha channel is excluded: RGBA hashes identically to its RGB twin
    rgba = np.concatenate([rgb, np.full_like(a, 255)[..., None]], axis=2)
    assert phash64(rgba) == h_a


def test_phash_images_null_policy_and_parity(spark):
    from jane_spark.operators.imagehash import phash64, phash_images
    from jane_spark.sources.media_codecs import encode_png, encode_ppm

    a = _text_img("alpha " * 60)
    b = _text_img("omega " * 60)
    rows = [
        (1, bytearray(encode_ppm(a)), "image/x-portable-graymap"),
        (2, bytearray(encode_png(b)), "image/png"),
        (3, bytearray(b"\x00\x01"), "video/unknown"),  # no codec -> NULL
        (4, bytearray(b"P5 garbage"), "image/x-portable-graymap"),  # corrupt
    ]
    df = spark.createDataFrame(rows, ["item_id", "payload", "media_type"])
    got = {
        r["item_id"]: r["phash"]
        for r in phash_images(df, "item_id", "payload").collect()
    }
    assert got[1] == phash64(a) and got[2] == phash64(b)
    assert got[3] is None and got[4] is None  # total: no task failure


def test_phash_relational_matches_numpy_phash64(spark):
    """Welds q_k7_phash_portable to the real-codec path: the pure-
    relational pHash (separable rounded DCT + row_number median) must
    produce the SAME 64-bit hash as the numpy phash64 reference on the
    contract's constructed images — the rounding discipline (9 dp
    coefficients, 6 dp partial sums) sits far below any bit-flip
    boundary on these fixtures."""
    import pandas as pd

    from jane_spark.operators.imagehash import phash64, phash_relational

    rr, cc = np.arange(16)[:, None], np.arange(16)[None, :]
    imgs = {
        i: (
            (i * 37 + rr * rr * 3 + cc * cc * 5 + rr * cc * 7 + rr * 16 + cc)
            % 256
        ).astype(np.uint8)
        for i in range(12)
    }
    rows = []
    for i, a16 in imgs.items():
        a32 = a16[np.arange(32) // 2][:, np.arange(32) // 2]
        for r in range(32):
            for c in range(32):
                rows.append((i, r, c, float(a32[r, c])))
    pix = spark.createDataFrame(
        pd.DataFrame(rows, columns=["item_id", "r", "c", "v"])
    )
    got = {
        r["item_id"]: r["phash"]
        for r in phash_relational(pix, "item_id", "r", "c", "v").collect()
    }
    want = {i: phash64(a) for i, a in imgs.items()}
    assert got == want


def test_audio_fp_relational_matches_numpy_audio_fp64(spark):
    """Welds q_k7_audio_portable to the real-codec path: the pure-
    relational spectral fingerprint (direct rounded DFT + band sums +
    row_number median) must produce the SAME 64-bit fingerprint as
    the numpy audio_fp64 reference on the contract's constructed
    clips (min |grid - median| separation ~1.9e-4 on this fixture,
    far above the 6 dp rounding boundary)."""
    import pandas as pd

    from jane_spark.operators.imagehash import (
        audio_fp64,
        audio_fp_relational,
    )

    rows, want = [], {}
    for item in range(8):
        t = np.arange(512)
        s = ((item * 31 + t * t * 7 + t * 13) % 97) / 97.0 - 0.5
        want[item] = audio_fp64(s, 1024)
        for tt in range(512):
            rows.append((item, tt // 64, tt % 64, float(s[tt])))
    smp = spark.createDataFrame(
        pd.DataFrame(rows, columns=["item_id", "seg", "n", "v"])
    )
    got = {
        r["item_id"]: r["afp"]
        for r in audio_fp_relational(
            smp, "item_id", "seg", "n", "v", rate=1024, seg_len=64
        ).collect()
    }
    assert got == want


def test_phash_near_pairs_pigeonhole(spark):
    from jane_spark.operators.imagehash import phash_near_pairs

    base = 0x0123456789ABCDEF
    ham6 = base ^ 0x3F  # 6 low bits differ
    ham8 = base ^ 0xFF  # 8 bits differ -> outside radius
    df = spark.createDataFrame(
        [(1, base), (2, ham6), (3, ham8), (4, None)],
        "item_id long, phash long",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_pairs(df, "item_id", max_hamming=6).collect()
    }
    # (1,3) at hamming 8 excluded; (2,3) differ by 0xC0 = 2 bits; NULL dropped
    assert pairs == {(1, 2): 6, (2, 3): 2}
    with pytest.raises(ValueError):
        phash_near_pairs(df, "item_id", max_hamming=8)


# ------------------------------------------------------------ RRF fusion


def test_rrf_fuse_known_values(spark):
    from jane_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(10, 5.0), (20, 4.0), (30, 3.0)], ["id", "score"]
    )
    dense = spark.createDataFrame(
        [(20, 0.9), (40, 0.8), (10, 0.7)], ["id", "score"]
    )
    got = {
        r["id"]: (r["rrf_score"], r["n_lists"])
        for r in rrf_fuse([lex, dense], "id", k=60, topk=10).collect()
    }
    # doc 20: rank 2 lexical + rank 1 dense; doc 10: rank 1 + rank 3
    assert got[20] == (round(1 / 62 + 1 / 61, 6), 2)
    assert got[10] == (round(1 / 61 + 1 / 63, 6), 2)
    assert got[30] == (round(1 / 63, 6), 1)
    assert got[40] == (round(1 / 62, 6), 1)
    with pytest.raises(ValueError):
        rrf_fuse([], "id")


def test_rrf_fuse_rank_ties_break_by_id(spark):
    from jane_spark.operators.retrieval import rrf_fuse

    tied = spark.createDataFrame([(2, 1.0), (1, 1.0)], ["id", "score"])
    got = {
        r["id"]: r["rrf_score"]
        for r in rrf_fuse([tied], "id", k=60, topk=2).collect()
    }
    assert got[1] == round(1 / 61, 6) and got[2] == round(1 / 62, 6)


# ----------------------------------------------------- perplexity buckets


def test_perplexity_buckets_equal_sizes_and_order(spark):
    from jane_spark.operators.curation import perplexity_buckets

    df = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(9)], ["id", "nll"]
    )
    out = {r["id"]: r["bucket"] for r in
           perplexity_buckets(df, "id", "nll").collect()}
    # lowest nll (highest id here) = head
    assert [out[i] for i in (8, 7, 6)] == ["head"] * 3
    assert [out[i] for i in (5, 4, 3)] == ["middle"] * 3
    assert [out[i] for i in (2, 1, 0)] == ["tail"] * 3


# ------------------------------------------------------ text normalization


def test_normalize_text_cases(spark):
    from jane_spark.functions.text import normalize_text

    rows = [
        (1, "“Hi” – it’s … fine"),
        (2, "a b​c"),  # NBSP collapses, zero-width vanishes
        (3, "ctrl\x07here\x00now"),
        (4, "  spaced\t\tout  "),
        (5, "plain ascii stays"),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    out = {
        r["id"]: r["c"]
        for r in df.select("id", normalize_text(F.col("t")).alias("c")).collect()
    }
    assert out[1] == "\"Hi\" - it's ... fine"
    assert out[2] == "a bc"
    assert out[3] == "ctrl here now"
    assert out[4] == "spaced out"
    assert out[5] == "plain ascii stays"


# ------------------------------------------------------ audio fingerprint


def test_audio_fp64_noise_tolerance_and_separation():
    from jane_spark.operators.imagehash import audio_fp64

    rate = 8000
    t = np.arange(2000, dtype=np.float64) / rate
    base = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    twin = base + 0.002 * np.sin(2 * np.pi * 55.0 * t)
    other = 0.5 * np.sin(2 * np.pi * 1700.0 * t)
    ham = lambda x, y: bin((x ^ y) & ((1 << 64) - 1)).count("1")  # noqa: E731
    assert audio_fp64(base, rate) == audio_fp64(base.copy(), rate)
    assert ham(audio_fp64(base, rate), audio_fp64(twin, rate)) <= 6
    assert ham(audio_fp64(base, rate), audio_fp64(other, rate)) > 10
    # stereo mono-mix of identical channels equals the mono fingerprint
    stereo = np.stack([base, base], axis=1)
    assert audio_fp64(stereo, rate) == audio_fp64(base, rate)


def test_audio_fingerprints_null_policy(spark):
    from jane_spark.operators.imagehash import audio_fingerprints, audio_fp64
    from jane_spark.sources.media_codecs import encode_wav

    rate = 8000
    t = np.arange(1600, dtype=np.float64) / rate
    s = 0.4 * np.sin(2 * np.pi * 330.0 * t)
    rows = [
        (1, bytearray(encode_wav(s, rate)), "audio/wav"),
        (2, bytearray(b"RIFFgarbage"), "audio/wav"),  # corrupt
        (3, bytearray(b"\x00"), "audio/flac"),  # no codec
    ]
    df = spark.createDataFrame(rows, ["item_id", "payload", "media_type"])
    got = {
        r["item_id"]: r["afp"]
        for r in audio_fingerprints(df, "item_id", "payload").collect()
    }
    assert got[1] == audio_fp64(s, rate)
    assert got[2] is None and got[3] is None


# ------------------------------------------------- logistic-regression QC


def _clf_corpus():
    # balanced, separable: positives speak of quality, negatives of spam
    pos = [(i, f"good clean prose document number {i} quality text", 1)
           for i in range(10)]
    neg = [(i + 10, f"buy cheap spam now offer {i} click winner", 0)
           for i in range(10)]
    return pos + neg


def test_train_logreg_matches_reference_and_separates(spark):
    from jane_spark.operators.classifier import (
        hashed_features,
        logreg_reference,
        score_logreg,
        train_logreg,
    )

    corpus = _clf_corpus()
    df = spark.createDataFrame(corpus, ["id", "t", "y"])
    feats = hashed_features(df, "id", "t", dim=128, binary=True)
    w, b = train_logreg(
        feats, df.select("id", "y"), "id", "y", dim=128, iters=15, lr=2.0
    )
    w_ref, b_ref = logreg_reference(
        corpus, dim=128, iters=15, lr=2.0, binary=True
    )
    assert b == pytest.approx(b_ref, abs=1e-6)
    for k in set(w) | set(w_ref):
        assert w.get(k, 0.0) == pytest.approx(w_ref.get(k, 0.0), abs=1e-6), k
    # the trained model must actually separate the classes
    probs = {
        r["id"]: r["prob"]
        for r in score_logreg(df, "id", "t", w, b, dim=128, binary=True).collect()
    }
    pos = [probs[i] for i in range(10)]
    neg = [probs[i + 10] for i in range(10)]
    assert min(pos) > 0.8 and max(neg) < 0.2


def test_train_logreg_partitioning_invariant(spark):
    from jane_spark.operators.classifier import hashed_features, train_logreg

    corpus = _clf_corpus()
    res = []
    for parts in (1, 7):
        df = spark.createDataFrame(corpus, ["id", "t", "y"]).repartition(parts)
        feats = hashed_features(df, "id", "t", dim=64, binary=True)
        res.append(
            train_logreg(feats, df.select("id", "y"), "id", "y",
                         dim=64, iters=5, lr=2.0)
        )
    (w1, b1), (w2, b2) = res
    assert b1 == b2 and w1 == w2  # 9-dp rounding absorbs shuffle-order noise


def test_score_logreg_fixed_weights_manual(spark):
    import hashlib

    from jane_spark.operators.classifier import score_logreg

    df = spark.createDataFrame([(1, "alpha beta alpha")], ["id", "t"])
    dim = 32
    bucket = lambda t: int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % dim  # noqa: E731
    weights = {bucket("alpha"): 1.5, bucket("beta"): -0.5}
    # count features: x_alpha = 2/3, x_beta = 1/3
    z = -0.25 + 1.5 * (2 / 3) - 0.5 * (1 / 3)
    want = round(1.0 / (1.0 + math.exp(-z)), 6)
    got = score_logreg(df, "id", "t", weights, -0.25, dim=dim).collect()[0]
    assert got["prob"] == pytest.approx(want, abs=1e-9)


# ------------------------------------------------------ dup-span removal


def test_dup_span_removal_brute_force(spark):
    from jane_spark.operators.curation import dup_span_removal

    rng = random.Random(23)
    alph = "abcdefgh"
    shared = "".join(rng.choice(alph) for _ in range(30))
    docs = []
    for i in range(10):
        pre = "".join(rng.choice(alph) for _ in range(rng.randint(25, 60)))
        post = "".join(rng.choice(alph) for _ in range(rng.randint(25, 60)))
        docs.append((i, pre + (shared if i % 2 == 0 else "") + post))
    k = 12
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in dup_span_removal(df, "doc_id", "text", k=k).collect()
    }
    from collections import Counter

    cnt = Counter()
    for _, t in docs:
        for i in range(len(t) - k + 1):
            cnt[t[i : i + k]] += 1
    for doc_id, t in docs:
        covered = set()
        for i in range(len(t) - k + 1):
            if cnt[t[i : i + k]] >= 2:
                covered.update(range(i, i + k))
        want = "".join(c for j, c in enumerate(t) if j not in covered)
        r = got[doc_id]
        assert r["clean_text"] == want, doc_id
        assert r["removed_chars"] == len(covered)
        # n_spans = maximal runs of covered positions
        runs = 0
        prev = -2
        for j in sorted(covered):
            if j > prev + 1:
                runs += 1
            prev = j
        assert r["n_spans"] == runs, doc_id


def test_dup_span_removal_consistent_with_coverage(spark, sf_dir):
    from jane_spark.engine.catalog import Catalog
    from jane_spark.operators.curation import (
        dup_span_coverage,
        dup_span_removal,
    )

    docs = Catalog(spark, sf_dir).documents.filter(F.col("doc_id") < 60)
    cov = {
        r["doc_id"]: r["covered_chars"]
        for r in dup_span_coverage(docs, "doc_id", "text", k=30).collect()
    }
    rem = {
        r["doc_id"]: r["removed_chars"]
        for r in dup_span_removal(docs, "doc_id", "text", k=30).collect()
    }
    assert cov == rem  # the measurement IS the edit's size


def test_dup_span_removal_short_and_unique_docs_unchanged(spark):
    from jane_spark.operators.curation import dup_span_removal

    df = spark.createDataFrame(
        [(1, "tiny"), (2, "abcdefghijklmnopqrstuvwxyz0123456789")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in
           dup_span_removal(df, "doc_id", "text", k=10).collect()}
    for i, t in ((1, "tiny"), (2, "abcdefghijklmnopqrstuvwxyz0123456789")):
        assert out[i]["clean_text"] == t
        assert out[i]["removed_chars"] == 0 and out[i]["n_spans"] == 0


def test_stupid_backoff_hand_computed(spark):
    import math

    from jane_spark.operators.curation import (
        stupid_backoff_score,
        train_bigram_lm,
    )

    # train corpus: "a b a b" -> uni: a:2 b:2 (N=4); bi: ab:2, ba:1
    train = spark.createDataFrame([(0, "a b a b")], "doc_id long, text string")
    uni, bi = train_bigram_lm(train, "text")
    assert {(r.w, r.c) for r in uni.collect()} == {("a", 2), ("b", 2)}
    assert {(r.w1, r.w2, r.c) for r in bi.collect()} == {("a", "b", 2), ("b", "a", 1)}

    # score "a b z": S(a)=2/4; S(b|a)=c(ab)/c(a)=2/2=1; S(z|b)=0.4*(1/4) OOV
    docs = spark.createDataFrame([(1, "a b z")], "doc_id long, text string")
    row = stupid_backoff_score(docs, "doc_id", "text", uni, bi).collect()[0]
    want = -(math.log(0.5) + math.log(1.0) + math.log(0.4 * 0.25)) / 3
    assert row.n_tokens == 3
    assert abs(row.nll - round(want, 4)) < 1e-9


def test_stupid_backoff_single_and_empty_token_docs(spark):
    from jane_spark.operators.curation import (
        stupid_backoff_score,
        train_bigram_lm,
    )

    train = spark.createDataFrame([(0, "x y")], "doc_id long, text string")
    uni, bi = train_bigram_lm(train, "text")
    docs = spark.createDataFrame(
        [(1, "x"), (2, "")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in stupid_backoff_score(docs, "doc_id", "text", uni, bi).collect()}
    assert rows[1].n_tokens == 1  # unigram-only doc scores
    assert 2 not in rows  # empty doc yields no positions, no row


def test_chunk_tokens_properties(spark):
    from jane_spark.functions.text import chunk_tokens

    text = " ".join(f"w{i}" for i in range(11))  # 11 tokens
    df = spark.createDataFrame([(1, text), (2, ""), (3, "only")],
                               "doc_id long, text string")
    rows = {
        r.doc_id: r.ch
        for r in df.select(
            "doc_id", chunk_tokens(F.col("text"), 4, overlap=1).alias("ch")
        ).collect()
    }
    ch1 = rows[1]
    # starts step by 3: tokens 0-3, 3-6, 6-9, 9-10
    assert [c.chunk_idx for c in ch1] == [0, 1, 2, 3]
    assert ch1[0].chunk.split(" ") == ["w0", "w1", "w2", "w3"]
    assert ch1[1].chunk.split(" ") == ["w3", "w4", "w5", "w6"]
    assert ch1[3].chunk.split(" ") == ["w9", "w10"]  # last partial kept
    assert [c.n_tokens for c in ch1] == [4, 4, 4, 2]
    # every token covered; consecutive chunks share exactly `overlap`
    for a, b in zip(ch1, ch1[1:]):
        assert a.chunk.split(" ")[-1:] == b.chunk.split(" ")[:1]
    assert rows[2] == []  # empty doc -> no chunks
    assert [c.chunk for c in rows[3]] == ["only"]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_tokens(F.col("text"), 4, overlap=4)
    with _pytest.raises(ValueError):
        chunk_tokens(F.col("text"), 0)


def test_corpus_diff_per_doc_and_null_fingerprints(spark):
    from jane_spark.operators.curation import corpus_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "d")], "doc_id long, fp string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "c"), (5, "e")], "doc_id long, fp string"
    )
    got = {r.doc_id: r.status for r in corpus_diff(old, new, "doc_id", "fp").collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "changed",   # present both sides; NULL fp != 'c', NOT 'added'
        4: "removed",
        5: "added",
    }
    # NULL on both sides is unchanged under null-safe equality
    old2 = spark.createDataFrame([(9, None)], "doc_id long, fp string")
    new2 = spark.createDataFrame([(9, None)], "doc_id long, fp string")
    assert corpus_diff(old2, new2, "doc_id", "fp").collect()[0].status == "unchanged"


def test_chunk_tokens_randomized_vs_python_twin(spark):
    """Randomized params × corpus shapes vs an independent Python
    reference: chunk starts step by (size-overlap), every token is
    covered, last partial kept, tiny docs one chunk."""
    import random

    from jane_spark.functions.text import chunk_tokens

    rng = random.Random(7)

    def py_chunks(text, size, overlap):
        toks = [t for t in text.split(" ") if t]
        if not toks:
            return []
        step = size - overlap
        n_chunks = max(1, -(-(len(toks) - overlap) // step))  # ceil
        out = []
        for i in range(n_chunks):
            window = toks[i * step : i * step + size]
            out.append((i, " ".join(window), len(window)))
        return out

    texts = []
    for i in range(120):
        n = rng.choice([0, 1, 2, 3, 5, 8, 13, 21, 55, 89])
        texts.append((i, " ".join(f"t{j}" for j in range(n))))
    df = spark.createDataFrame(texts, "doc_id long, text string")

    for size, overlap in [(4, 0), (4, 1), (4, 3), (7, 2), (16, 8), (3, 0)]:
        got = {
            r.doc_id: [(c.chunk_idx, c.chunk, c.n_tokens) for c in r.ch]
            for r in df.select(
                "doc_id", chunk_tokens(F.col("text"), size, overlap).alias("ch")
            ).collect()
        }
        for doc_id, text in texts:
            assert got[doc_id] == py_chunks(text, size, overlap), (
                doc_id, size, overlap,
            )


def test_extract_main_content_block_model(spark):
    """justext/readability block model: nav (short + link-dense) and
    footer (long but pure link) drop; article paragraphs keep with
    inline link text; <br><br>-separated boilerplate segments; entities
    decode; comments and script/style vanish."""
    from jane_spark.functions.text import extract_main_content

    html = (
        "<html><head><style>p{x}</style><script>var a = '<p>';</script>"
        "</head><body>"
        '<nav><a href="/">Home</a> <a href="/a">About</a></nav>'
        "<!-- tracking pixel markup -->"
        "<p>First real paragraph, long enough to clear the floor easily.</p>"
        "<div>Copyright line<br><br>"
        "Second real paragraph mentions Fish &amp; Chips and keeps going on.</div>"
        "<p>Tiny.</p>"
        '<footer><a href="/more">Long pure-link caption that must drop '
        "despite its considerable length</a></footer>"
        "</body></html>"
    )
    out = (
        spark.createDataFrame([(html,)], "h string")
        .select(extract_main_content(F.col("h")).alias("m"))
        .collect()[0]
        .m
    )
    assert out == (
        "First real paragraph, long enough to clear the floor easily.\n"
        "Second real paragraph mentions Fish & Chips and keeps going on."
    )


def test_extract_main_content_link_density_boundary(spark):
    """A long block whose link mass sits just above/below the 0.33
    threshold flips keep/drop on the density rule, not the length
    rule; empty/NULL input is total."""
    from jane_spark.functions.text import extract_main_content

    pad = "x" * 60
    low = f"<p>{pad} <a href='#'>{'y' * 10}</a></p>"  # 10/71 kept
    high = f"<p>{pad} <a href='#'>{'y' * 40}</a></p>"  # 40/101 dropped
    rows = spark.createDataFrame(
        [(1, low), (2, high), (3, ""), (4, None)], "i long, h string"
    ).select("i", extract_main_content(F.col("h")).alias("m")).collect()
    got = {r["i"]: r["m"] for r in rows}
    assert "y" * 10 in got[1]
    assert got[2] == ""
    assert got[3] is None or got[3] == ""
    assert got[4] is None or got[4] == ""
    assert "y" * 40 not in got[2] and got[2] == ""


def test_extract_main_content_plan_zero_shuffle(spark):
    """The whole extraction is a projection: no Exchange, no UDF eval
    nodes — every regex runs at full-string scope in codegen."""
    from jane_spark.functions.text import extract_main_content

    df = spark.range(10).select(
        F.concat(F.lit("<p>some body text that is long enough here "),
                 F.col("id").cast("string"), F.lit("</p>")).alias("h")
    ).select(extract_main_content(F.col("h")).alias("m"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_split_sentences_rule(spark):
    from jane_spark.functions.text import split_sentences

    rows = spark.createDataFrame(
        [
            (1, "First sentence. Second one! A question? yes... tail"),
            (2, "No terminal punct"),
            (3, ""),
            (4, None),
            (5, "Multi.  Space.   Runs."),
            (6, "Trailing dot ends."),
        ],
        "i long, t string",
    ).select("i", split_sentences(F.col("t")).alias("s")).collect()
    got = {r["i"]: r["s"] for r in rows}
    assert got[1] == [
        "First sentence.", "Second one!", "A question?", "yes...", "tail",
    ]
    assert got[2] == ["No terminal punct"]
    assert got[3] == []
    assert got[4] is None or got[4] == []
    assert got[5] == ["Multi.", "Space.", "Runs."]
    assert got[6] == ["Trailing dot ends."]


def test_compression_ratio_python_twin(spark):
    """compression_ratio vs a direct zlib twin, including NULL
    totality and the templated-vs-random separation the filter is
    for."""
    import zlib

    from jane_spark.functions.text import compression_ratio

    rows = [
        (1, "abc " * 200),                      # templated: low ratio
        (2, __import__("hashlib").sha256(b"seed").hexdigest() * 1
            + "".join(
                __import__("hashlib").sha256(str(i).encode()).hexdigest()
                for i in range(12)
            )),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in compression_ratio(df, "doc_id", "text").collect()}
    for i, t in rows:
        if t is None:
            assert got[i]["compression_ratio"] is None
            continue
        b = t.encode(); c = zlib.compress(b, 6)
        assert got[i]["raw_bytes"] == len(b)
        assert got[i]["zlib_bytes"] == len(c)
        assert got[i]["compression_ratio"] == round(len(c) / max(len(b), 1), 4)
    assert got[1]["compression_ratio"] < 0.1 < got[2]["compression_ratio"]
    assert got[2]["compression_ratio"] > 0.5


def test_kneser_ney_python_twin(spark):
    """KN formula pinned against a direct Python computation on a tiny
    corpus where every quantity (discounted bigram mass, continuation
    counts, OOV smoothing, first-position backoff) is hand-checkable."""
    import math

    from jane_spark.operators.curation import kneser_ney_score, train_bigram_lm

    train_rows = [(1, "a b a c a b"), (2, "b c")]
    score_rows = [(10, "a b"), (11, "z a"), (12, "c")]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    score = spark.createDataFrame(score_rows, "doc_id long, text string")
    uni, bi = train_bigram_lm(train, "text")
    got = {
        r["doc_id"]: (r["n_tokens"], r["nll"])
        for r in kneser_ney_score(score, "doc_id", "text", uni, bi).collect()
    }

    # python twin
    toks = [t.split() for _, t in train_rows]
    from collections import Counter

    bic = Counter()
    for ts in toks:
        for a, b in zip(ts, ts[1:]):
            bic[(a, b)] += 1
    unic = Counter(w for ts in toks for w in ts)
    ctx_tot = Counter(); ctx_types = Counter(); cont = Counter()
    for (a, b), c in bic.items():
        ctx_tot[a] += c; ctx_types[a] += 1; cont[b] += 1
    n_bi, v, d = len(bic), len(unic), 0.75

    def p_cont(w):
        return (cont.get(w, 0) + 1.0) / (n_bi + v + 1.0)

    def p(w, prev):
        if prev is None or prev not in ctx_tot:
            return p_cont(w)
        return (
            max(bic.get((prev, w), 0) - d, 0.0) / ctx_tot[prev]
            + d * ctx_types[prev] / ctx_tot[prev] * p_cont(w)
        )

    for doc_id, text in score_rows:
        ts = text.split()
        lps = [math.log(p(w, ts[i - 1] if i else None)) for i, w in enumerate(ts)]
        want = (len(ts), round(-sum(lps) / len(lps), 4))
        assert got[doc_id] == want, (doc_id, got[doc_id], want)


def test_cdc_chunks_laws(spark):
    """Content-defined chunking (LBFS/FastCDC), pinned:
    (1) reconstruction — chunks concatenate byte-exactly to every
    document, md5 witnesses match, every doc total (short/empty docs
    = one whole-doc chunk); (2) the SHIFT-ROBUSTNESS law CDC exists
    for — after a prefix insertion, the overlap of chunk-hash sets
    with the original is high (boundaries re-align at the first
    surviving cut) while FIXED-size chunking at the same average
    size shares almost nothing; (3) boundary positions are a pure
    function of content: the shifted doc's chunk STARTS after the
    first shared cut equal original starts + shift; (4) stats law —
    cdc_dedup_stats totals match the chunk table; (5) layout
    independence; (6) parameter guards."""
    import hashlib
    import random

    import pytest

    from jane_spark.operators.curation import cdc_chunks, cdc_dedup_stats

    rng = random.Random(5)
    alph = "abcdefghijklmnop"
    docs = [
        (i, "".join(rng.choice(alph) for _ in range(rng.randint(0, 500))))
        for i in range(30)
    ]
    docs += [(100, ""), (101, "short")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    w, mb = 8, 4
    rows = cdc_chunks(df, "doc_id", "text", w=w, mask_bits=mb).collect()
    texts = dict(docs)
    per: dict = {}
    for r in rows:
        per.setdefault(r.doc_id, []).append(r)
    assert set(per) == set(texts)  # total
    for d, t in texts.items():
        ch = sorted(per[d], key=lambda r: r.chunk_idx)
        assert [r.chunk_idx for r in ch] == list(range(1, len(ch) + 1))
        recon = "".join(
            t[r.start - 1 : r.start - 1 + r.chunk_len] for r in ch
        )
        assert recon == t, d
        for r in ch:
            piece = t[r.start - 1 : r.start - 1 + r.chunk_len]
            assert hashlib.md5(piece.encode()).hexdigest() == r.chunk_md5

    # (2) + (3) shift robustness vs fixed-size chunking
    base = max(texts.values(), key=len)
    shift = 13
    shifted = "".join(rng.choice("XYZ") for _ in range(shift)) + base
    two = spark.createDataFrame(
        [(1, base), (2, shifted)], ["doc_id", "text"]
    )
    r2 = cdc_chunks(two, "doc_id", "text", w=w, mask_bits=mb).collect()
    h1 = {r.chunk_md5 for r in r2 if r.doc_id == 1}
    h2 = {r.chunk_md5 for r in r2 if r.doc_id == 2}
    cdc_overlap = len(h1 & h2) / len(h1)
    assert cdc_overlap >= 0.8, cdc_overlap
    s1 = {r.start for r in r2 if r.doc_id == 1}
    s2 = {r.start for r in r2 if r.doc_id == 2}
    realigned = {s for s in s1 if s + shift in s2}
    assert len(realigned) >= len(s1) - 2  # all but the head re-align
    # fixed-size chunking at the same expected size shares ~nothing
    # (the shift misaligns every boundary)
    size = 1 << mb
    fx1 = {
        hashlib.md5(base[i : i + size].encode()).hexdigest()
        for i in range(0, len(base), size)
    }
    fx2 = {
        hashlib.md5(shifted[i : i + size].encode()).hexdigest()
        for i in range(0, len(shifted), size)
    }
    assert len(fx1 & fx2) / len(fx1) < 0.2

    # (4) stats law
    st = cdc_dedup_stats(
        cdc_chunks(two, "doc_id", "text", w=w, mask_bits=mb), "doc_id"
    ).collect()[0]
    assert st.total_chunks == len(r2)
    assert st.distinct_chunks == len({r.chunk_md5 for r in r2})
    assert st.total_chars == sum(r.chunk_len for r in r2)
    seen: dict = {}
    for r in r2:
        seen.setdefault(r.chunk_md5, r.chunk_len)
    assert st.distinct_chars == sum(seen.values())

    # (5) layout independence
    again = cdc_chunks(
        df.repartition(7), "doc_id", "text", w=w, mask_bits=mb
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    # (6) guards
    with pytest.raises(ValueError, match="w must be"):
        cdc_chunks(df, "doc_id", "text", w=1)
    with pytest.raises(ValueError, match="mask_bits"):
        cdc_chunks(df, "doc_id", "text", mask_bits=0)
