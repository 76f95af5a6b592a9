"""Property tests: text operators vs pure-Python reference
implementations on random word-soup documents."""

import itertools

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from etlutils_spark.operators.dedup import jaccard_pairs, shingle_rows
from etlutils_spark.operators.text import word_shingles

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

words = st.sampled_from("alpha beta gamma delta epsilon zeta".split())
texts = st.lists(words, min_size=0, max_size=12).map(" ".join)


def py_shingles(text: str, n: int = 3) -> set[str]:
    toks = text.split(" ")
    if len(toks) < n:
        return set()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


@SET
@given(texts)
def test_word_shingles_match_python(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(word_shingles("text", 3).alias("sh")).first().sh
    assert set(got) == py_shingles(text)
    assert len(got) == len(set(got))  # distinct


@SET
@given(st.lists(texts, min_size=2, max_size=5))
def test_jaccard_pairs_match_python(spark, doc_texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(doc_texts)], "doc_id bigint, text string"
    )
    got = {
        (r.doc_id_1, r.doc_id_2): r.jaccard
        for r in jaccard_pairs(shingle_rows(docs), threshold=0.0).collect()
    }
    for (i, a), (j, b) in itertools.combinations(enumerate(doc_texts), 2):
        sa, sb = py_shingles(a), py_shingles(b)
        inter = len(sa & sb)
        if inter == 0:
            assert (i, j) not in got  # co-shingled pairs only
        else:
            expect = inter / len(sa | sb)
            assert got[(i, j)] == pytest.approx(expect, abs=1e-12)


@SET
@given(
    st.lists(texts, min_size=1, max_size=4),
    st.integers(min_value=2, max_value=6),
    st.integers(min_value=0, max_value=1),
)
def test_chunk_documents_match_python(spark, doc_texts, max_tokens, overlap):
    from etlutils_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(doc_texts)], "doc_id bigint, text string"
    )
    got = {
        (r.doc_id, r.chunk_idx): (r.chunk_start, r.chunk_text, r.n_chunk_tokens)
        for r in chunk_documents(docs, max_tokens, overlap).collect()
    }
    step = max_tokens - overlap
    expect = {}
    for i, t in enumerate(doc_texts):
        toks = t.split(" ")  # '' -> [''], mirroring F.split / string_split
        starts = list(range(1, max(len(toks), 1) + 1, step))
        for idx, s0 in enumerate(starts):
            sl = toks[s0 - 1 : s0 - 1 + max_tokens]
            expect[(i, idx)] = (s0, " ".join(sl), len(sl))
    assert got == expect
