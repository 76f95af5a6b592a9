"""BM25 search + bigram-LM scoring vs pure-Python references."""

from __future__ import annotations

import math

import pytest

DOCS = [
    (1, "spark runs fast and spark scales"),
    (2, "the slow table scan"),
    (3, "spark"),
    (4, "merge sort merge join merge"),
    (5, "x"),  # single token: no bigrams
    (6, "fast fast fast fast fast fast"),
]


def _py_bm25(corpus, terms, k1=1.2, b=0.75):
    toks = {i: t.split(" ") for i, t in corpus}
    n = float(len(toks))
    avgdl = sum(len(w) for w in toks.values()) / n
    df = {
        t: float(sum(1 for w in toks.values() if t in w)) for t in terms
    }
    out = {}
    for i, w in toks.items():
        s, matched = 0.0, 0
        for t in terms:
            tf = float(w.count(t))
            if not tf:
                continue
            matched += 1
            idf = (n - df[t] + 0.5) / (df[t] + 0.5)
            s += idf * ((tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (len(w) / avgdl))))
        if matched:
            out[i] = (s, matched)
    return out


def test_bm25_matches_python_reference(spark):
    from etlutils_spark.operators.search import bm25_topk

    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    terms = ["spark", "merge", "fast"]
    got = {
        r.doc_id: (r.bm25, r.n_terms_matched, r.rank)
        for r in bm25_topk(df, terms, k=10).collect()
    }
    want = _py_bm25(DOCS, terms)
    assert set(got) == set(want)
    for i, (s, m) in want.items():
        assert got[i][1] == m
        # decimal(30,12) accumulation rounds each term to 12 places
        assert got[i][0] == pytest.approx(s, abs=1e-9)
    # ranks follow score desc, doc_id asc
    by_rank = sorted(got.items(), key=lambda kv: kv[1][2])
    scores = [v[0] for _, v in by_rank]
    assert scores == sorted(scores, reverse=True)


def test_bm25_only_matching_docs_and_empty_terms(spark):
    from etlutils_spark.operators.search import bm25_topk

    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = bm25_topk(df, ["nonexistent_token"], k=5).collect()
    assert rows == []
    with pytest.raises(ValueError):
        bm25_topk(df, [])


def _py_bigram(corpus):
    bgs = []
    for i, t in corpus:
        w = t.split(" ")
        bgs += [(i, w[j], w[j + 1]) for j in range(len(w) - 1)]
    from collections import Counter

    c2 = Counter((c, x) for _, c, x in bgs)
    c1 = Counter(c for _, c, _ in bgs)
    out = {}
    for i, _ in corpus:
        ps = [c2[(c, x)] / c1[c] for j, c, x in bgs if j == i]
        if ps:
            out[i] = (len(ps), sum(ps) / len(ps), min(ps))
    return out


def test_bigram_lm_matches_python_reference(spark):
    from etlutils_spark.operators.search import bigram_lm_scores

    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_bigrams, r.avg_bigram_prob, r.min_bigram_prob)
        for r in bigram_lm_scores(df).collect()
    }
    want = _py_bigram(DOCS)
    assert set(got) == set(want)  # single-token doc 5 absent from both
    assert 5 not in got
    for i, (nb, avg, mn) in want.items():
        assert got[i][0] == nb
        assert got[i][1] == pytest.approx(avg, abs=1e-9)
        assert got[i][2] == pytest.approx(mn, abs=1e-12)
    # a doc made of one repeated token has deterministic transitions:
    # P(fast|fast) = c2/c1 with c1 counting only context positions
    assert got[6][2] == pytest.approx(5 / 5, abs=0) or got[6][2] <= 1.0


def test_bigram_lm_shuffled_text_scores_lower(spark):
    """The fluency property the score exists for: a document whose
    transitions are corpus-typical outranks one with the same tokens in
    a corpus-atypical order."""
    from etlutils_spark.operators.search import bigram_lm_scores

    base = [(i, "the quick fox jumps over the lazy dog") for i in range(10)]
    corpus = base + [(100, "dog the over lazy jumps quick the fox")]
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    got = {r.doc_id: r.avg_bigram_prob for r in bigram_lm_scores(df).collect()}
    assert got[100] < got[0]


# ---- property tests vs the pure-Python references on random corpora -------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_words = st.sampled_from("alpha beta gamma delta epsilon zeta".split())
_texts = st.lists(_words, min_size=1, max_size=10).map(" ".join)


@SET
@given(st.lists(_texts, min_size=2, max_size=6))
def test_bm25_property_random_corpus(spark, doc_texts):
    from etlutils_spark.operators.search import bm25_topk

    corpus = list(enumerate(doc_texts))
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    terms = ["alpha", "delta"]
    got = {r.doc_id: (r.bm25, r.n_terms_matched)
           for r in bm25_topk(df, terms, k=100).collect()}
    want = _py_bm25(corpus, terms)
    assert set(got) == set(want)
    for i, (s, m) in want.items():
        assert got[i][1] == m
        assert got[i][0] == pytest.approx(s, abs=1e-9)


@SET
@given(st.lists(_texts, min_size=1, max_size=6))
def test_bigram_lm_property_random_corpus(spark, doc_texts):
    from etlutils_spark.operators.search import bigram_lm_scores

    corpus = list(enumerate(doc_texts))
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    got = {r.doc_id: (r.n_bigrams, r.avg_bigram_prob)
           for r in bigram_lm_scores(df).collect()}
    want = _py_bigram(corpus)
    assert set(got) == set(want)
    for i, (nb, avg, _mn) in want.items():
        assert got[i][0] == nb
        assert got[i][1] == pytest.approx(avg, abs=1e-9)


def test_ccnet_lm_buckets_per_language_tiers(spark):
    """Per-language fluency tiers: word-salad docs (common words in
    orders the corpus never repeats) land in the tail bucket of THEIR
    language, bucket assignment follows the (score desc, id) NTILE
    order exactly, languages are tiered independently, and the approx
    (threshold) mode agrees with exact on the planted extremes."""
    from etlutils_spark.operators.search import ccnet_lm_buckets

    fluent = "the cat sat on the mat"
    rows = [(i, fluent, "en") for i in range(4)] + [
        (4, "mat the on sat the cat", "en"),
        (5, "on the mat the cat sat", "en"),
        # second language: one repeated pattern + one salad
        (6, "le chat dort le chat dort", "fr"),
        (7, "dort chat le dort le chat", "fr"),
        (8, "le chat dort le chat dort", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    out = {r.doc_id: r for r in ccnet_lm_buckets(df, n_buckets=3).collect()}
    assert len(out) == 9
    # NTILE consistency: recompute expected buckets from the returned
    # scores per language
    for lang in ("en", "fr"):
        docs = sorted(
            (r for r in out.values() if r.lang == lang),
            key=lambda r: (-r.avg_bigram_prob, r.doc_id),
        )
        n = len(docs)
        for pos, r in enumerate(docs):
            # SQL NTILE over n rows in 3 buckets: first n%3 buckets get
            # ceil(n/3), the rest floor(n/3)
            big, rem = divmod(n, 3)
            expect = 1
            acc = big + (1 if rem > 0 else 0)
            while pos >= acc:
                expect += 1
                acc += big + (1 if expect <= rem else 0)
            assert r.lm_bucket == expect, (lang, r.doc_id)
    # the en salads score strictly below the repeated pattern
    assert out[4].avg_bigram_prob < out[0].avg_bigram_prob
    assert out[4].lm_bucket == 3 or out[5].lm_bucket == 3
    # approx mode agrees on the planted extremes
    ax = {
        r.doc_id: r
        for r in ccnet_lm_buckets(df, n_buckets=3, mode="approx").collect()
    }
    assert ax[0].lm_bucket == 1
    assert ax[4].lm_bucket == 3 or ax[5].lm_bucket == 3
