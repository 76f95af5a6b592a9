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
        # bound = len - overlap: a start inside the final overlap region
        # would emit a chunk fully contained in its predecessor (r12)
        starts = list(range(1, max(len(toks) - overlap, 1) + 1, step))
        for idx, s0 in enumerate(starts):
            sl = toks[s0 - 1 : s0 - 1 + max_tokens]
            expect[(i, idx)] = (s0, " ".join(sl), len(sl))
    assert got == expect


def test_winnow_coverage_guarantee(spark):
    # any shared substring of >= window + k - 1 = 6 tokens must yield a
    # common fingerprint (Schleimer et al. coverage theorem)
    from etlutils_spark.operators.dedup import winnow_overlap_pairs
    from etlutils_spark.operators.text import winnow_fingerprints

    shared = "one two three four five six"
    rows = [
        (0, f"aaa bbb {shared} ccc ddd"),
        (1, f"xxx yyy zzz {shared} qqq"),
        (2, "totally disjoint vocabulary with no common trigram at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    fps = winnow_fingerprints(df, k=3, window=4)
    common01 = (
        fps.filter("doc_id = 0").select("fingerprint")
        .intersect(fps.filter("doc_id = 1").select("fingerprint"))
    )
    assert common01.count() >= 1
    pairs = winnow_overlap_pairs(df, k=3, window=4, min_common=1).collect()
    assert {(p["doc_id_1"], p["doc_id_2"]) for p in pairs} == {(0, 1)}


def test_winnow_density(spark):
    # winnowing stores far fewer hashes than the full k-gram set
    from etlutils_spark.operators.text import winnow_fingerprints

    text = " ".join(f"tok{i}" for i in range(200))
    df = spark.createDataFrame([(0, text)], "doc_id bigint, text string")
    n_fp = winnow_fingerprints(df, k=3, window=4).count()
    n_grams = 200 - 2
    assert n_fp < 0.6 * n_grams  # expected density ~2/(w+1) = 0.4


def test_tokens_to_ids_roundtrip_and_oov(spark):
    from etlutils_spark.operators.text import tokens_to_ids

    vocab = spark.createDataFrame(
        [("hello", 1), ("world", 2)], "token string, vocab_rank bigint"
    )
    df = spark.createDataFrame(
        [(0, "hello world hello unseen")], "doc_id bigint, text string"
    )
    row = tokens_to_ids(df, vocab).collect()[0]
    assert row["ids"] == [1, 2, 1, 0]  # order-preserving, OOV -> 0
    assert row["n_ids"] == 4


def test_tokens_to_ids_literal_budget_raises(spark):
    from etlutils_spark.operators.text import tokens_to_ids

    vocab = spark.createDataFrame(
        [(f"t{i}", i + 1) for i in range(5)], "token string, vocab_rank bigint"
    )
    df = spark.createDataFrame([(0, "t0 t1")], "doc_id bigint, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_literal_vocab"):
        tokens_to_ids(df, vocab, max_literal_vocab=3, mode="literal")
    with _pytest.raises(ValueError, match="mode"):
        tokens_to_ids(df, vocab, mode="bogus")


def test_tokens_to_ids_broadcast_matches_literal(spark):
    """mode='broadcast' (the BPE-scale path) must reproduce the literal
    plan's output bit-for-bit — including OOV fills, order preservation,
    and empty documents — and auto must switch to it past the budget
    without embedding the vocab in the plan."""
    from etlutils_spark.operators.text import tokens_to_ids

    vocab = spark.createDataFrame(
        [(f"w{i}", i + 1) for i in range(50)], "token string, vocab_rank bigint"
    )
    df = spark.createDataFrame(
        [(0, "w3 w1 unseen w3"), (1, ""), (2, "unseen only here"), (3, "w49"),
         (4, None)],  # NULL text: split(NULL)=NULL -> ids NULL, both modes
        "doc_id bigint, text string",
    )
    lit_rows = sorted(
        tuple(r) for r in tokens_to_ids(df, vocab, mode="literal").collect()
    )
    bc = tokens_to_ids(df, vocab, mode="broadcast")
    bc_rows = sorted(tuple(r) for r in bc.collect())
    assert bc_rows == lit_rows
    assert dict((r[0], r[1]) for r in bc_rows)[0] == [4, 2, 0, 4]
    # auto past the budget = broadcast result, and the vocab must NOT
    # travel in the plan (no 50-entry literal map / plan-size cliff)
    auto = tokens_to_ids(df, vocab, max_literal_vocab=10, mode="auto")
    assert sorted(tuple(r) for r in auto.collect()) == lit_rows
    plan = auto._jdf.queryExecution().optimizedPlan().toString()
    assert "w49" not in plan and "map(" not in plan
    assert len(plan) < 20_000


def test_winnow_coverage_property_random(spark):
    # property over random corpora: ANY two docs sharing a contiguous
    # run of >= window + k - 1 = 6 tokens must share >= 1 fingerprint
    import random

    from etlutils_spark.operators.text import winnow_fingerprints

    rng = random.Random(7)
    rows = []
    planted = []
    for i in range(12):
        toks = [f"w{rng.randrange(50)}" for _ in range(rng.randrange(8, 20))]
        rows.append((i, " ".join(toks)))
    shared = [f"s{j}" for j in range(6)]
    for i, j in ((100, 101), (102, 103)):
        pre_a = [f"a{rng.randrange(50)}" for _ in range(rng.randrange(0, 5))]
        pre_b = [f"b{rng.randrange(50)}" for _ in range(rng.randrange(0, 5))]
        rows.append((i, " ".join(pre_a + shared)))
        rows.append((j, " ".join(pre_b + shared + ["tail"])))
        planted.append((i, j))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    fps = winnow_fingerprints(df, k=3, window=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    for i, j in planted:
        assert by_doc[i] & by_doc[j], (i, j)


def test_token_gini_known_values(spark):
    from etlutils_spark.operators.text import token_gini_stats

    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "a a b b")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_tokens, r.n_distinct_tokens, r.type_token_ratio, r.token_gini)
           for r in token_gini_stats(df).collect()}
    assert got[1] == (4, 1, 0.25, 0.0)           # one token dominates
    assert got[2] == (4, 4, 1.0, 1.0 - 4 / 16)   # uniform: 0.75
    assert got[3] == (4, 2, 0.5, 1.0 - 8 / 16)   # 2+2: 0.5


def test_token_gini_matches_python_reference(spark):
    from collections import Counter

    from etlutils_spark.operators.text import token_gini_stats

    texts = ["x y z x y x", "w", "p q p q p q p q", "m n o"]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: r.token_gini for r in token_gini_stats(df).collect()}
    for i, t in enumerate(texts):
        c = Counter(t.split(" "))
        n = sum(c.values())
        want = 1.0 - sum(v * v for v in c.values()) / (n * n)
        assert got[i] == pytest.approx(want, abs=1e-12), i


def test_bpe_train_golden(spark):
    """Hand-computed BPE on a tiny corpus: 'abab abc' x2.
    Pair counts round 1: (a,b)x3... wait per word: 'abab' has (a,b)x2,
    (b,a)x1; 'abc' has (a,b),(b,c). Totals with freq 2 docs:
    (a,b)=6, (b,a)=2, (b,c)=2 -> merge ('a','b'). Round 2 words:
    (ab,ab) and (ab,c): pairs (ab,ab)=2, (ab,c)=2 -> lexicographic tie
    -> ('ab','ab')."""
    from etlutils_spark.operators.text import bpe_train

    df = spark.createDataFrame(
        [(0, "abab abc"), (1, "abab abc")], "doc_id long, text string"
    )
    merges = bpe_train(df, num_merges=2)
    assert merges == [("a", "b"), ("ab", "ab")]


def test_bpe_encode_matches_python_reference(spark, star):
    """Differential: the sentinel replace-chain must equal the classic
    per-word greedy merge loop on real corpus text."""
    from etlutils_spark.operators.text import (
        BPE_FS,
        bpe_encode,
        bpe_encode_reference,
        bpe_train,
    )

    docs = star["documents"]
    merges = bpe_train(docs, num_merges=12, sample_limit=200)
    sample = docs.limit(30)
    out = {r.doc_id: r for r in bpe_encode(sample, merges).collect()}
    for r in sample.collect():
        ref = bpe_encode_reference(r.text, merges)
        got = [p[:-1] for p in
               out[r.doc_id].encoded.replace(" ", "").split(BPE_FS) if p]
        assert got == ref
        assert out[r.doc_id].n_pieces == len(ref)


def _naive_bpe_train(texts, num_merges):
    """The pre-r7 quadratic trainer (full pair recount per merge) —
    kept as the differential reference for the indexed incremental
    trainer, which must produce bit-identical merge lists."""
    import re
    from collections import Counter

    word_freq = Counter()
    for t in texts:
        for w in re.split(r"[ \t\n\r\f]+", t or ""):
            if w:
                word_freq[tuple(w)] += 1
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for word, f in word_freq.items():
            for i in range(len(word) - 1):
                pairs[(word[i], word[i + 1])] += f
        if not pairs:
            break
        top = max(pairs.values())
        a, b = min(p for p, c in pairs.items() if c == top)
        merges.append((a, b))
        ab = a + b
        nf = Counter()
        for word, f in word_freq.items():
            out, i = [], 0
            while i < len(word):
                if i + 1 < len(word) and word[i] == a and word[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            nf[tuple(out)] += f
        word_freq = nf
    return merges


def _naive_train_from_word_freq(word_freq, num_merges):
    """Full pair recount per merge, straight off a word-frequency
    table — the independent reference for the heap trainer's property
    test below (the text-level differential above exercises it only on
    corpus-shaped inputs)."""
    from collections import Counter

    wf = Counter(dict(word_freq))
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for word, f in wf.items():
            for i in range(len(word) - 1):
                pairs[(word[i], word[i + 1])] += f
        if not pairs:
            break
        top = max(pairs.values())
        a, b = min(p for p, c in pairs.items() if c == top)
        merges.append((a, b))
        ab = a + b
        nf = Counter()
        for word, f in wf.items():
            out, i = [], 0
            while i < len(word):
                if i + 1 < len(word) and word[i] == a and word[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            nf[tuple(out)] += f
        wf = nf
    return merges


@settings(
    max_examples=200,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    words=st.dictionaries(
        st.lists(
            st.sampled_from("ab c"), min_size=1, max_size=6
        ).map(tuple),
        st.integers(min_value=1, max_value=5),
        max_size=12,
    ),
    k=st.integers(min_value=0, max_value=20),
)
def test_train_from_word_freq_heap_matches_naive(words, k):
    """The r9 lazy-deletion-heap trainer (dirty-batched pushes, stale
    entries discarded when their count no longer matches) must emit
    merge lists bit-identical to the naive full-recount loop on
    ARBITRARY word tables — a tiny alphabet (with a space-adjacent
    char for collision pressure) forces dense count ties, repeated
    merges of merged symbols, and counts that return to previous
    values (the stale-entry-looks-live case)."""
    from etlutils_spark.operators.text import _train_from_word_freq

    assert _train_from_word_freq(dict(words), k) == (
        _naive_train_from_word_freq(words, k)
    )


def test_bpe_train_indexed_matches_naive(spark, star):
    """The indexed incremental trainer (r6 verdict #8: what makes 1k+
    merges practical) must emit the SAME ordered merge list as the
    naive full-recount loop — same max-count selection, same
    lexicographic tie-break — on real corpus text AND on a hash
    corpus that exercises deep merge chains (merged symbols merging
    again)."""
    from pyspark.sql import functions as F

    from etlutils_spark.operators.text import bpe_train

    docs = star["documents"]
    texts = [
        r.text
        for r in docs.select("text")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .limit(10_000)
        .collect()
    ]
    assert bpe_train(docs, num_merges=200) == _naive_bpe_train(texts, 200)
    hashed = docs.select(
        "doc_id",
        F.concat_ws(" ", F.md5("text"), F.md5(F.concat("text", F.lit("a"))))
        .alias("text"),
    )
    h_texts = [
        r.text
        for r in hashed.select("text")
        .orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
        .limit(10_000)
        .collect()
    ]
    assert (
        bpe_train(hashed, num_merges=300) == _naive_bpe_train(h_texts, 300)
    )


def test_bpe_decode_roundtrips(spark, star):
    """encode -> decode must reconstruct the whitespace-normalized
    source exactly, for BOTH physical encode modes, on real corpus
    text and on adversarial rows (unicode, NBSP-inside-word — NBSP is
    not a split boundary by contract — empty string, single char);
    decode is merge-table-independent, so a bigger merge table must
    round-trip to the SAME text."""
    from pyspark.sql import functions as F

    from etlutils_spark.operators.text import (
        bpe_decode,
        bpe_encode,
        bpe_train,
    )

    docs = star["documents"].limit(300)
    merges = bpe_train(docs, num_merges=50)
    norm = F.concat_ws(
        " ",
        F.filter(
            F.split(F.col("text"), "[ \t\n\r\f]+"),
            lambda w: F.length(w) > 0,
        ),
    )

    def _mismatches(src, mode):
        dec = bpe_decode(bpe_encode(src, merges, mode=mode))
        return (
            dec.withColumnRenamed("text", "decoded")
            .join(src.select("doc_id", norm.alias("n")), "doc_id")
            .filter(F.col("decoded") != F.col("n"))
            .count()
        )

    assert _mismatches(docs, "chain") == 0
    assert _mismatches(docs, "pandas") == 0
    weird = spark.createDataFrame(
        [
            (1, "café naïve 中文 words"),
            (2, "nbsp inside stays one-word"),
            (3, ""),
            (4, "x"),
            (5, "  \t padded \n\n with   runs \f"),
        ],
        "doc_id bigint, text string",
    )
    assert _mismatches(weird, "chain") == 0
    assert _mismatches(weird, "pandas") == 0
    # merge-table independence: a different table, same reconstruction
    assert _mismatches(docs, "chain") == 0 and (
        bpe_decode(bpe_encode(docs, merges[:5], mode="chain"))
        .exceptAll(bpe_decode(bpe_encode(docs, merges, mode="pandas")))
        .isEmpty()
    )


def test_bpe_encode_modes_agree(spark, star):
    """chain and pandas encode modes must agree byte-for-byte (and
    match the per-word Python reference) on a deep merge table — the
    cross-mode contract the bigvocab registration pins in-engine."""
    from pyspark.sql import functions as F

    from etlutils_spark.operators.text import (
        BPE_FS,
        bpe_encode,
        bpe_encode_reference,
        bpe_train,
    )

    hashed = star["documents"].select(
        "doc_id",
        F.concat_ws(" ", F.md5("text"), F.md5(F.concat("text", F.lit("a"))))
        .alias("text"),
    )
    merges = bpe_train(hashed, num_merges=200, sample_limit=300)
    assert len(merges) == 200
    sample = hashed.limit(40)
    chain = {r.doc_id: (r.n_pieces, r.encoded)
             for r in bpe_encode(sample, merges, mode="chain").collect()}
    pandas_ = {r.doc_id: (r.n_pieces, r.encoded)
               for r in bpe_encode(sample, merges, mode="pandas").collect()}
    assert chain == pandas_
    for r in sample.collect():
        ref = bpe_encode_reference(r.text, merges)
        got = [p[:-1] for p in
               chain[r.doc_id][1].replace(" ", "").split(BPE_FS) if p]
        assert got == ref and chain[r.doc_id][0] == len(ref)


def test_bpe_encode_auto_mode_switches(spark, star):
    """auto = chain (pure codegen, no Python) within the plan budget;
    pandas (constant plan size) beyond it — the replace-chain is
    measured to StackOverflow Catalyst at 512 nested replaces."""
    import pytest

    from etlutils_spark.operators.text import bpe_encode, bpe_train
    from etlutils_spark.plans.checks import physical_plan

    docs = star["documents"]
    merges = bpe_train(docs, num_merges=4, sample_limit=100)
    fake_big = merges * 64  # 256 entries: repeats are no-ops, mode only
    small_plan = physical_plan(bpe_encode(docs, merges, mode="auto"))
    assert "Python" not in small_plan and "MapInPandas" not in small_plan
    assert "MapInPandas" in physical_plan(
        bpe_encode(docs, fake_big, mode="auto")
    )
    with pytest.raises(ValueError, match="mode"):
        bpe_encode(docs, merges, mode="bogus")


def test_bpe_encode_stays_jvm_side(spark, star):
    from etlutils_spark.operators.text import bpe_encode, bpe_train
    from etlutils_spark.plans.checks import physical_plan

    docs = star["documents"]
    merges = bpe_train(docs, num_merges=4, sample_limit=100)
    plan = physical_plan(bpe_encode(docs, merges))
    assert "Python" not in plan  # no UDF: pure replace-chain codegen


def test_bpe_encode_any_whitespace_boundary(spark):
    """Tabs/newlines are word boundaries exactly as in bpe_train /
    the Python reference (str.split) — they never leak into pieces."""
    from etlutils_spark.operators.text import (
        BPE_FS,
        bpe_encode,
        bpe_encode_reference,
    )

    df = spark.createDataFrame(
        [(0, "ab\tcd\nab  cd")], "doc_id long, text string"
    )
    merges = [("a", "b"), ("c", "d")]
    enc = bpe_encode(df, merges).collect()[0]
    got = [p[:-1] for p in enc.encoded.replace(" ", "").split(BPE_FS) if p]
    assert got == bpe_encode_reference("ab\tcd\nab  cd", merges)
    assert got == ["ab", "cd", "ab", "cd"]
    assert "\t" not in enc.encoded and "\n" not in enc.encoded


def _boilerplate_ref(docs, max_doc_frac, min_doc_count):
    """Pure-Python reference of line_boilerplate_removal."""
    from collections import defaultdict

    per_line_docs = defaultdict(set)
    for did, text in docs:
        for ln in (text or "").split("\n"):
            per_line_docs[ln].add(did)
    n = len(docs)
    boiler = {
        ln for ln, ds in per_line_docs.items()
        if len(ds) >= min_doc_count and len(ds) / n >= max_doc_frac
    }
    out = {}
    for did, text in docs:
        lines = (text or "").split("\n")
        kept = [ln for ln in lines if ln not in boiler]
        out[did] = (len(lines), sum(1 for ln in lines if ln in boiler),
                    "\n".join(kept))
    return out


@SET
@given(
    st.lists(
        st.one_of(
            st.sampled_from(["COMMON", "NAV BAR", "alpha", "beta zz"]),
            st.text("xyz ", min_size=0, max_size=6),
        ),
        min_size=1, max_size=6,
    ).map(lambda ls: "\n".join(ls)),
    st.integers(2, 4),
)
def test_line_boilerplate_matches_python_reference(spark, _doc_text, min_dc):
    """Differential vs the obvious Python algorithm on random corpora:
    same boilerplate set, same per-doc counts, same reassembly."""
    import random

    from etlutils_spark.operators.text import line_boilerplate_removal

    rng = random.Random(hash(_doc_text) & 0xFFFF)
    docs = [(i, "\n".join(
        rng.choice(["COMMON", "NAV BAR", "alpha", f"uniq {i} {j}"])
        for j in range(rng.randint(1, 5))
    )) for i in range(8)]
    docs.append((99, _doc_text))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_lines, r.n_boiler_lines, r.text_clean)
           for r in line_boilerplate_removal(
               df, max_doc_frac=0.25, min_doc_count=min_dc).collect()}
    assert got == _boilerplate_ref(docs, 0.25, min_dc)


def test_bpe_train_corpus_matches_sampled_trainer(spark, star):
    """bpe_train_corpus (Spark-side word counting, driver-side merge
    induction over the distinct-word table) must emit the bit-identical
    merge list as bpe_train when both see the same docs — the
    correctness gate for moving the trainer off the doc-sample bound
    (review item). min_freq changes the table, not the rule: pruning
    hapax words must equal training on a word table with those rows
    absent."""
    from collections import Counter

    from etlutils_spark.operators.text import (
        _train_from_word_freq,
        bpe_train,
        bpe_train_corpus,
    )

    docs = star["documents"]
    n = docs.count()
    # full-corpus sample == full corpus: both paths see identical text
    assert (
        bpe_train_corpus(docs, num_merges=150)
        == bpe_train(docs, num_merges=150, sample_limit=n)
    )
    # corpus form is sample-order/partitioning independent by
    # construction: repartitioning must not move a single merge
    assert (
        bpe_train_corpus(docs.repartition(7), num_merges=60)
        == bpe_train_corpus(docs, num_merges=60)
    )
    # min_freq pruning == training on the pruned word table
    import re as _re

    wf: Counter = Counter()
    for r in docs.select("text").collect():
        for w in _re.split(r"[ \t\n\r\f]+", r[0] or ""):
            if w:
                wf[tuple(w)] += 1
    pruned = {w: f for w, f in wf.items() if f >= 3}
    assert (
        bpe_train_corpus(docs, num_merges=60, min_freq=3)
        == _train_from_word_freq(pruned, 60)
    )
    # the loud guard: a vocab bigger than max_word_rows raises with
    # the min_freq remedy instead of collecting it
    with pytest.raises(ValueError, match="min_freq"):
        bpe_train_corpus(docs, num_merges=4, max_word_rows=10)
