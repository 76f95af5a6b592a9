"""Unit tests for the curation tier: deterministic sampling/sharding,
quality filtering, repetition scoring, PII redaction, sequence packing."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from etlutils_spark.operators.quality import (
    quality_filter,
    redact_pii,
    repetition_stats,
)
from etlutils_spark.operators.sampling import (
    assign_shards,
    hash_sample,
    pack_sequences,
    rate_threshold_hex,
    shard_stats,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"word{i % 7} " * 3 + "the a of tail", "en" if i % 3 else "de")
            for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


# ---- sampling --------------------------------------------------------------

def test_hash_sample_is_deterministic_and_pure(spark, docs):
    a = sorted(r.doc_id for r in hash_sample(docs, 0.3).collect())
    b = sorted(r.doc_id for r in hash_sample(docs, 0.3).collect())
    assert a == b
    # pure function of the key: python replica agrees row-for-row
    thr = rate_threshold_hex(0.3)
    expect = sorted(
        i for i in range(200) if hashlib.md5(str(i).encode()).hexdigest() < thr
    )
    assert a == expect


def test_hash_sample_rate_monotone_and_nested(spark, docs):
    s10 = {r.doc_id for r in hash_sample(docs, 0.1).collect()}
    s50 = {r.doc_id for r in hash_sample(docs, 0.5).collect()}
    assert s10 <= s50  # threshold sampling nests by construction
    assert len(s50) > len(s10)


def test_hash_sample_salt_decorrelates(spark, docs):
    a = {r.doc_id for r in hash_sample(docs, 0.5, salt="s1").collect()}
    b = {r.doc_id for r in hash_sample(docs, 0.5, salt="s2").collect()}
    assert a != b


def test_stratified_sample_rates(spark, docs):
    out = stratified_sample(docs, "lang", {"en": 0.0, "de": 1.0})
    got = out.groupBy("lang").count().collect()
    by_lang = {r.lang: r["count"] for r in got}
    assert "en" not in by_lang  # rate 0 drops all
    assert by_lang["de"] == 67  # rate 1 keeps all de rows


def test_assign_shards_uniform_and_complete(spark, docs):
    out = assign_shards(docs, 8)
    assert out.count() == 200  # narrow projection, no row loss
    shards = {r.shard for r in out.select("shard").distinct().collect()}
    assert shards <= set(range(8)) and len(shards) == 8


def test_shard_stats_mass_conserved(spark, docs):
    st = shard_stats(docs, 4).collect()
    assert sum(r.n_docs for r in st) == 200
    total_tokens = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("t")
    ).collect()[0].t
    assert sum(r.n_tokens for r in st) == total_tokens


# ---- packing ---------------------------------------------------------------

def test_pack_sequences_geometry(spark):
    # group g: token counts 6,5,4 with budget 8 ->
    # doc0 [0,6) pack0; doc1 [6,11) spans packs 0-1; doc2 [11,15) pack1
    rows = [("g", 0, "a b c d e f"), ("g", 1, "a b c d e"), ("g", 2, "a b c d")]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    out = {r.doc_id: r for r in pack_sequences(df, 8, group_col="source").collect()}
    assert (out[0].start_offset, out[0].pack_id, out[0].spans_boundary) == (0, 0, False)
    assert (out[1].start_offset, out[1].pack_id, out[1].spans_boundary) == (6, 0, True)
    assert (out[2].start_offset, out[2].pack_id, out[2].spans_boundary) == (11, 1, False)


def test_pack_sequences_groups_independent(spark):
    rows = [("g1", 0, "a b"), ("g2", 1, "c d")]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    out = pack_sequences(df, 8, group_col="source").collect()
    assert all(r.start_offset == 0 for r in out)  # each group restarts at 0


def test_pack_sequences_plan_is_partitioned(spark, docs):
    plan = pack_sequences(
        docs.withColumn("source", F.lit("s")), 128, group_col="lang"
    )._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(lang" in plan  # parallel per-group windows


# ---- quality ---------------------------------------------------------------

def test_quality_filter_rules(spark):
    good = "the quick brown fox jumps over a lazy dog near the river bank " * 2
    rows = [
        (1, good.strip()),                      # passes all
        (2, "short text only"),                 # fails length
        (3, " ".join(["verylongtokenword" * 2] * 30)),  # fails stopword+len
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in quality_filter(df).collect()}
    assert out[1].passes
    assert not out[2].pass_length and not out[2].passes
    assert not out[3].pass_stopwords and not out[3].pass_token_len


def test_quality_filter_keep_only(spark, docs):
    kept = quality_filter(docs, min_tokens=1, min_stopword_ratio=0.0,
                          keep_only=True)
    assert kept.count() == 200
    assert "passes" not in kept.columns  # original rows, not flags


def test_repetition_stats_known_values(spark):
    # "x y x y x" -> bigrams: [x y, y x, x y, y x] -> 4 total, 2 distinct,
    # dup ratio 0.5, top share 0.5
    df = spark.createDataFrame([(1, "x y x y x")], "doc_id long, text string")
    r = repetition_stats(df).collect()[0]
    assert (r.n_ngrams, r.n_distinct_ngrams) == (4, 2)
    assert r.dup_ngram_ratio == pytest.approx(0.5)
    assert r.top_ngram_share == pytest.approx(0.5)


def test_repetition_stats_all_unique(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    r = repetition_stats(df).collect()[0]
    assert r.dup_ngram_ratio == 0.0
    assert r.top_ngram_share == pytest.approx(0.25)  # every bigram unique, 1/4


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [(1, "mail bob.smith@corp.example.org or 555-867-5309 from 192.168.0.1 ok"),
         (2, "clean text with no secrets")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert out[1].n_email == 1 and out[1].n_phone == 1 and out[1].n_ip == 1
    assert out[1].redacted_text == "mail <EMAIL> or <PHONE> from <IP> ok"
    assert out[2].redacted_text == "clean text with no secrets"
    assert out[2].n_email == out[2].n_phone == out[2].n_ip == 0


# ---- property tests vs pure-Python references ------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@SET
@given(
    st.lists(
        st.tuples(st.sampled_from("ab"), st.integers(1, 12)),
        min_size=1,
        max_size=10,
        unique=True,
    ),
    st.integers(2, 16),
)
def test_pack_sequences_matches_python(spark, groups_and_sizes, budget):
    rows = [
        (g, i, " ".join(["w"] * n))
        for i, (g, n) in enumerate(groups_and_sizes)
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    got = {
        (r.source, r.doc_id): (r.start_offset, r.pack_id, r.spans_boundary)
        for r in pack_sequences(df, budget, group_col="source").collect()
    }
    # pure-python replica: per-group running offsets in doc_id order
    expect = {}
    cur: dict[str, int] = {}
    for doc_id, (g, n) in sorted(enumerate(groups_and_sizes), key=lambda t: (t[1][0], t[0])):
        start = cur.get(g, 0)
        end = start + n - 1
        expect[(g, doc_id)] = (start, start // budget, start // budget != end // budget)
        cur[g] = start + n
    assert got == expect


@SET
@given(st.floats(0.0, 1.0), st.text(st.sampled_from("xyz"), max_size=3))
def test_hash_sample_matches_python(spark, rate, salt):
    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    got = sorted(r.doc_id for r in hash_sample(df, rate, salt=salt).collect())
    thr = rate_threshold_hex(rate)
    expect = sorted(
        i for i in range(50)
        if hashlib.md5(f"{i}{salt}".encode()).hexdigest() < thr
    )
    assert got == expect


# ---- round-2 continuation: mixture / decontamination / survivors / rarity --


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, n_chars long")


def test_mixture_resample_hits_target_ratios(spark):
    from etlutils_spark.operators.sampling import mixture_resample

    rows = [(i, "x", "en" if i % 10 < 8 else "de", 1) for i in range(2000)]
    df = _docs_df(spark, rows)
    out = mixture_resample(df, {"en": 0.5, "de": 0.5}, strata_col="lang")
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # de is binding (400 rows, weight .5 -> total 800): kept whole
    assert got["de"] == 400
    # en should land near 400 (hash-sample variance at rate .25 of 1600)
    assert 320 <= got["en"] <= 480


def test_mixture_resample_deterministic_and_whitelists(spark):
    from etlutils_spark.operators.sampling import mixture_resample

    rows = [(i, "x", ["en", "de", "xx"][i % 3], 1) for i in range(300)]
    df = _docs_df(spark, rows)
    a = mixture_resample(df, {"en": 0.6, "de": 0.4}, strata_col="lang")
    b = mixture_resample(df, {"en": 0.6, "de": 0.4}, strata_col="lang")
    ka = sorted(r["doc_id"] for r in a.collect())
    assert ka == sorted(r["doc_id"] for r in b.collect())
    # stratum not in the weight dict is dropped entirely
    assert a.filter(F.col("lang") == "xx").count() == 0


def test_decontaminate_flags_planted_overlap(spark):
    from etlutils_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high today"),  # shares 3-grams
            (2, "completely unrelated words appear here now"),  # none
            (3, "ab"),  # shorter than n tokens -> 0 shingles
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in decontaminate(docs, bench, n=3, min_overlap=1).collect()}
    assert out[1]["is_contaminated"] and out[1]["n_contaminated"] >= 3
    assert not out[2]["is_contaminated"] and out[2]["n_contaminated"] == 0
    assert out[3]["n_shingles"] == 0 and out[3]["contamination_ratio"] == 0.0


def test_cluster_survivors_keeps_best_per_cluster(spark):
    from etlutils_spark.operators.dedup import cluster_survivors

    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (4, 7)], "doc_id long, quality long"
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "node long, cluster_id long"
    )  # doc 4 is a singleton (absent)
    out = cluster_survivors(docs, clusters, quality_col="quality")
    kept = sorted(r["doc_id"] for r in out.collect())
    # cluster {1,2,3}: quality tie 2 vs 3 -> smaller id (2); singleton 4 survives
    assert kept == [2, 4]


def test_corpus_rarity_known_values(spark):
    from etlutils_spark.operators.text import corpus_rarity_stats

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string"
    )
    # counts: a=3, b=1, c=1
    out = {r["doc_id"]: r for r in corpus_rarity_stats(docs, rare_max_count=1).collect()}
    assert out[1]["n_tokens"] == 3
    assert abs(out[1]["avg_token_count"] - (3 + 3 + 1) / 3) < 1e-12
    assert abs(out[1]["rare_ratio"] - 1 / 3) < 1e-12
    assert abs(out[2]["avg_token_count"] - 2.0) < 1e-12
    assert abs(out[2]["rare_ratio"] - 0.5) < 1e-12


def test_corpus_rarity_shuffle_join_fallback(spark):
    """broadcast_vocab=False must produce identical stats through a
    shuffle join (the 100 TB escape hatch for oversized vocabularies)
    — and the plan must actually drop the broadcast exchange."""
    from etlutils_spark.operators.text import corpus_rarity_stats

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "d d d d")], "doc_id long, text string"
    )
    bcast = corpus_rarity_stats(docs, rare_max_count=1)
    shuf = corpus_rarity_stats(docs, rare_max_count=1, broadcast_vocab=False)
    rows_b = {r["doc_id"]: r.asDict() for r in bcast.collect()}
    rows_s = {r["doc_id"]: r.asDict() for r in shuf.collect()}
    assert rows_b == rows_s
    # the flag controls the *forced* hint; AQE may still choose broadcast
    # at runtime when the vocab fits (and won't when it doesn't)
    assert "strategy=broadcast" in bcast._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in shuf._jdf.queryExecution().optimizedPlan().toString()


def test_shuffle_export_deterministic_range_layout(spark):
    from etlutils_spark.operators.sampling import shuffle_export

    df = spark.createDataFrame([(i, "x") for i in range(500)], "doc_id long, text string")
    out = shuffle_export(df, 4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    assert "Window" not in plan  # no global-window rank
    # same permutation on re-run
    a = [r["doc_id"] for r in out.collect()]
    b = [r["doc_id"] for r in shuffle_export(df, 4).collect()]
    assert a == b and sorted(a) == list(range(500))
    # digest order != input order (it actually shuffles)
    assert a != list(range(500))


def test_chunk_documents_geometry(spark):
    from etlutils_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b"), (3, "")],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, max_tokens=4, overlap=1)
    rows = sorted(
        ((r["doc_id"], r["chunk_idx"]), r) for r in out.collect()
    )
    by_doc = {}
    for (_, __), r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 10 tokens, step 3, bound = 10 - overlap = 9 -> starts
    # 1,4,7. A start at 10 would emit just 't9', which chunk 7..10
    # already fully covers — the zero-new-token duplicate the bound
    # exists to drop (review catch)
    assert [c["chunk_start"] for c in by_doc[1]] == [1, 4, 7]
    assert by_doc[1][0]["chunk_text"] == "t0 t1 t2 t3"
    assert by_doc[1][1]["chunk_text"] == "t3 t4 t5 t6"  # 1-token overlap
    assert by_doc[1][2]["chunk_text"] == "t6 t7 t8 t9"  # tail covered
    # doc 2: 2 tokens -> one chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "a b"
    # doc 3: empty text -> split('') == [''] -> one chunk of the empty token
    assert len(by_doc[3]) == 1 and by_doc[3][0]["n_chunk_tokens"] == 1


# ---- vocab induction / OOV -------------------------------------------------

def test_build_vocab_rank_deterministic(spark):
    from etlutils_spark.operators.text import build_vocab

    rows = [(0, "a a a b b c"), (1, "b d d d c a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = build_vocab(df, top_n=3).collect()
    # counts: a=4, b=3, d=3, c=2 -> top3 = a, b, d (tie b/d broken by token)
    assert [(r.token, r.token_count, r.vocab_rank) for r in out] == [
        ("a", 4, 1), ("b", 3, 2), ("d", 3, 3)
    ]


def test_oov_stats_counts_occurrences_not_types(spark):
    from etlutils_spark.operators.text import build_vocab, oov_stats

    rows = [(0, "a a a b b c"), (1, "b d d d c a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = build_vocab(df, top_n=2)  # a, b
    got = {r.doc_id: r for r in oov_stats(df, vocab).collect()}
    assert got[0].n_tokens == 6 and got[0].n_oov == 1  # the single c
    assert got[1].n_tokens == 6 and got[1].n_oov == 4  # d d d c
    assert got[1].oov_rate == pytest.approx(4 / 6)


# ---- per-group percentile pruning ------------------------------------------

def _scored_df(spark):
    rows = [(i, "g1" if i < 10 else "g2", float(i)) for i in range(15)]
    return spark.createDataFrame(rows, "doc_id long, grp string, score double")


def test_percentile_prune_exact_keeps_top_fraction_per_group(spark):
    from etlutils_spark.operators.quality import percentile_prune

    out = percentile_prune(
        _scored_df(spark), "score", "grp", keep_frac=0.4, id_col="doc_id"
    ).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r.grp, set()).add(r.doc_id)
    # g1 has 10 rows -> keep floor(4) = 4 best scores (9,8,7,6)
    assert by_grp["g1"] == {9, 8, 7, 6}
    # g2 has 5 rows -> keep floor(2) = 2 best (14, 13)
    assert by_grp["g2"] == {14, 13}


def test_percentile_prune_keeps_at_least_one_row_per_group(spark):
    from etlutils_spark.operators.quality import percentile_prune

    df = spark.createDataFrame([(1, "solo", 5.0)], "doc_id long, grp string, score double")
    out = percentile_prune(df, "score", "grp", keep_frac=0.01).collect()
    assert len(out) == 1 and out[0].grp_rank == 1


def test_percentile_prune_approx_mode_contract(spark):
    from etlutils_spark.operators.quality import percentile_prune

    df = _scored_df(spark)
    exact = {r.doc_id for r in percentile_prune(df, "score", "grp", 0.4).collect()}
    approx = {
        r.doc_id
        for r in percentile_prune(df, "score", "grp", 0.4, exact=False).collect()
    }
    # threshold mode keeps every exact survivor (score >= thr includes
    # the boundary row the rank cut may exclude) ...
    assert exact <= approx
    # ... and is threshold-consistent per group: no kept row scores
    # below a dropped row
    rows = {r.doc_id: r for r in df.collect()}
    for grp in {r.grp for r in rows.values()}:
        kept = [rows[i].score for i in approx if rows[i].grp == grp]
        dropped = [r.score for i, r in rows.items()
                   if r.grp == grp and i not in approx]
        assert not dropped or min(kept) >= max(dropped)
    # kept fraction drifts by at most one boundary row per group
    assert len(approx) <= len(exact) + 2


def test_percentile_prune_approx_keeps_null_group(spark):
    """A NULL group is a group like any other (the cap_per_group /
    winsorize convention): exact mode's window partitions NULL rows
    together and prunes them, so the approx mode's broadcast threshold
    join must be null-safe — a plain equality join silently dropped
    every NULL-group row (review catch)."""
    from etlutils_spark.operators.quality import percentile_prune

    rows = [(i, "a", float(i)) for i in range(10)]
    rows += [(100 + i, None, float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id bigint, grp string, score double")
    kept = percentile_prune(df, "score", "grp", 0.5, exact=False).collect()
    by_grp = {}
    for r in kept:
        by_grp.setdefault(r.grp, set()).add(r.doc_id)
    assert None in by_grp  # NULL group thresholded, not dropped
    # top-half scores survive in BOTH groups (threshold includes the
    # boundary row, so 5 or 6 kept)
    assert {7, 8, 9} <= by_grp["a"] and len(by_grp["a"]) <= 6
    assert {107, 108, 109} <= by_grp[None] and len(by_grp[None]) <= 6


def test_rank_blend_approx_all_null_signal_is_loud(spark):
    """An all-NULL signal makes every percentile threshold undefined;
    the old eager collect crashed at plan construction, and the lazy
    rewrite must NOT regress that into silently NULL ranks and a NULL
    blend for the whole corpus (review catch) — it raises in-plan."""
    from etlutils_spark.operators.quality import rank_blend

    df = spark.createDataFrame(
        [(1, None, 2.0), (2, None, 1.0)],
        "doc_id bigint, dead double, live double",
    )
    with pytest.raises(Exception, match="no non-NULL values"):
        rank_blend(
            df, {"dead": True, "live": True}, approx_buckets=4
        ).collect()
    # the healthy signal alone still works; rows with a NULL value in a
    # LIVE signal rank at the bottom (clears no thresholds), matching
    # exact mode's nulls-first ordering
    ok = {r.doc_id: r.rank_live for r in rank_blend(
        df, {"live": True}, approx_buckets=4).collect()}
    assert ok[2] <= ok[1]


def test_percentile_prune_rejects_bad_fraction(spark):
    from etlutils_spark.operators.quality import percentile_prune

    with pytest.raises(ValueError):
        percentile_prune(_scored_df(spark), "score", "grp", keep_frac=0.0)


def test_token_budget_sample_greedy_prefix(spark):
    from etlutils_spark.operators.sampling import token_budget_sample

    rows = [(i, "g", " ".join(["t"] * 10)) for i in range(10)]  # 10 docs x 10 tokens
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    out = token_budget_sample(df, budget_tokens=35, group_col="lang")
    kept = out.collect()
    # greedy prefix: 3 docs fill 30 < 35, the 4th starts under budget
    # (overshoot by at most one doc), the 5th would start at 40 >= 35
    assert len(kept) == 4
    assert sum(r["n_tokens"] for r in kept) == 40
    # deterministic: same rows on re-run
    again = {r["doc_id"] for r in token_budget_sample(df, 35, "lang").collect()}
    assert again == {r["doc_id"] for r in kept}


def test_token_budget_sample_per_group_isolation(spark):
    from etlutils_spark.operators.sampling import token_budget_sample

    rows = [(1, "a", "x y z"), (2, "b", "x y z"), (3, "b", "x y z")]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    out = token_budget_sample(df, budget_tokens=4, group_col="lang")
    by_lang = {}
    for r in out.collect():
        by_lang.setdefault(r["lang"], 0)
        by_lang[r["lang"]] += 1
    # each group budgets independently: 'a' keeps its 1 doc; 'b' keeps
    # 2 (first fills 3 < 4, second starts at 3 < 4)
    assert by_lang == {"a": 1, "b": 2}


def test_pack_ids_export_geometry(spark):
    from etlutils_spark.operators.sampling import pack_ids_export

    vocab = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "token string, vocab_rank bigint"
    )
    rows = [
        (0, "g", "a b c a b"),     # 5 tokens
        (1, "g", "c c a"),         # 3 tokens -> total 8, seq_len 4 -> 2 full packs
        (2, "h", "b b b"),         # separate group: 1 partial pack
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = {(r["source"], r["pack_id"]): r
           for r in pack_ids_export(df, vocab, seq_len=4,
                                    group_col="source").collect()}
    assert out[("g", 0)]["ids"] == [1, 2, 3, 1]          # doc 0 tokens 1-4
    assert out[("g", 1)]["ids"] == [2, 3, 3, 1]          # doc 0 tail + doc 1
    assert out[("g", 0)]["full"] and out[("g", 1)]["full"]
    assert out[("h", 0)]["ids"] == [2, 2, 2] and not out[("h", 0)]["full"]


def test_leakage_safe_split_components_cohere(spark):
    from etlutils_spark.operators.sampling import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(20)], "doc_id bigint, text string"
    )
    # near-dup chain 3-7-11 and pair 4-15; everything else singleton
    pairs = spark.createDataFrame(
        [(3, 7), (7, 11), (4, 15)], "doc_id_1 bigint, doc_id_2 bigint"
    )
    out = leakage_safe_split(docs, pairs).collect()
    split = {r["doc_id"]: r["split"] for r in out}
    key = {r["doc_id"]: r["split_key"] for r in out}
    assert split[3] == split[7] == split[11]
    assert split[4] == split[15]
    # split_key is a STRING (numeric ids render the same digits, so
    # digests/splits are unchanged; a long cast NULLed string ids and
    # dumped every unclustered doc into 'test' — review catch)
    assert key[3] == key[7] == key[11] == "3"  # min-id component label
    assert key[4] == key[15] == "4"
    assert key[0] == "0"                       # singleton keys on itself
    assert set(split.values()) <= {"train", "val", "test"}


def test_gopher_quality_flags_planted_violations(spark):
    """Each Gopher rule (Rae et al. 2021 App. A1.1) must fire on a doc
    planted to violate exactly it, and a clean doc passes all."""
    from etlutils_spark.operators.quality import gopher_quality_flags

    clean = ("the data pipeline reads records and that process have "
             "finished with success " * 5).strip()
    rows = [
        (0, clean),
        (1, "the of and that short"),                 # < 50 words
        (2, ("to be of an it is so we do " * 8).strip()),  # mean word len < 3
        (3, clean + " " + "#" * 1 + " #### ## # " + "# " * 20),  # symbols
        (4, ("123 456 789 0 " * 15).strip() + " the of"),  # alpha frac low
        (5, ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             * 6).strip()),                            # no required stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in gopher_quality_flags(df).collect()}
    assert out[0].passes, out[0]
    assert not out[1].pass_word_count
    assert not out[2].pass_mean_word_len and not out[2].passes
    assert not out[3].pass_symbol_ratio
    assert not out[4].pass_alpha_words
    assert not out[5].pass_required_stopwords
    # stats sanity on the clean doc
    assert out[0].n_words == 60 and out[0].n_required_stopwords >= 10
    # the paper's symbol rule is PER SYMBOL: a doc whose hash ratio and
    # ellipsis ratio are each 0.06 (sum 0.12) must PASS — a summed-
    # ratio implementation would wrongly reject it
    from etlutils_spark.operators.quality import gopher_quality_flags as gq
    body = ("the data rows and that have with of be to " * 6).strip()  # 60 words
    mixed = body + " # # # # # # ... ... ... ... ... ..."
    m = gq(spark.createDataFrame([(9, mixed)], "doc_id bigint, text string")
           ).collect()[0]
    assert 0.05 < m.hash_word_ratio <= 0.1
    assert 0.05 < m.ellipsis_word_ratio <= 0.1
    assert m.hash_word_ratio + m.ellipsis_word_ratio > 0.1
    assert m.pass_symbol_ratio


def test_c4_quality_flags_planted_violations(spark):
    """Each C4 rule (Raffel et al. 2020 §2.2) fires on its planted
    violator; a clean doc passes all."""
    from etlutils_spark.operators.quality import c4_quality_flags

    clean = "First sentence is here. Second one follows! Third ends now?"
    rows = [
        (0, clean),
        (1, "no terminal punctuation on this document at all"),
        (2, "Only one sentence here."),
        (3, clean + " buy cheap SPAM today."),
        (4, clean + " lorem ipsum dolor sit."),
        (5, clean + " var x = { a: 1 }."),
        (6, clean + " enable JavaScript to continue."),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in
           c4_quality_flags(df, blocklist=("spam",)).collect()}
    assert out[0].passes and out[0].n_sentences == 3
    assert not out[1].pass_terminal_punct and not out[1].pass_min_sentences
    assert not out[2].pass_min_sentences
    assert not out[3].pass_blocklist        # case-insensitive match
    assert not out[4].pass_no_lorem
    assert not out[5].pass_no_brace
    assert not out[6].pass_no_javascript
    for d in (1, 2, 3, 4, 5, 6):
        assert not out[d].passes


def test_leakage_safe_split_precomputed_components_match_pairs(spark):
    """components= (the build_dedup_clusters artifact shape) must yield
    the identical assignment as the pairs path, and passing both or
    neither must raise."""
    import pytest

    from etlutils_spark.operators.sampling import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(20)], "doc_id bigint, text string"
    )
    pairs = spark.createDataFrame(
        [(3, 7), (7, 11), (4, 15)], "doc_id_1 bigint, doc_id_2 bigint"
    )
    # full label table as build_dedup_clusters emits it: EVERY doc
    # labeled, singletons to themselves
    comp = {3: 3, 7: 3, 11: 3, 4: 4, 15: 4}
    labels = spark.createDataFrame(
        [(i, comp.get(i, i)) for i in range(20)],
        "doc_id bigint, cluster_id bigint",
    )
    via_pairs = sorted(
        tuple(r) for r in leakage_safe_split(docs, pairs).collect()
    )
    via_comp = sorted(
        tuple(r) for r in leakage_safe_split(docs, components=labels).collect()
    )
    assert via_comp == via_pairs
    with pytest.raises(ValueError, match="exactly one"):
        leakage_safe_split(docs)
    with pytest.raises(ValueError, match="exactly one"):
        leakage_safe_split(docs, pairs, components=labels)


def test_temperature_resample_alpha_zero_flattens_to_min(spark):
    from etlutils_spark.operators.sampling import temperature_resample

    # 1600 en / 400 de: alpha=0 -> uniform weights -> en downsampled
    # toward de's 400; de (binding) kept whole
    rows = [(i, "x", "en" if i % 10 < 8 else "de", 1) for i in range(2000)]
    df = _docs_df(spark, rows)
    out = temperature_resample(df, alpha=0.0, strata_col="lang")
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got["de"] == 400
    assert 320 <= got["en"] <= 480


def test_temperature_resample_alpha_half_sqrt_mass(spark):
    from etlutils_spark.operators.sampling import temperature_resample

    rows = [(i, "x", "en" if i % 10 < 8 else "de", 1) for i in range(2000)]
    df = _docs_df(spark, rows)
    out = temperature_resample(df, alpha=0.5, strata_col="lang")
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got["de"] == 400  # smallest stratum: rate 1
    # expected en mass = sqrt(400 * 1600) = 800 (hash-sample variance)
    assert 700 <= got["en"] <= 900
    # determinism + subset
    again = temperature_resample(df, alpha=0.5, strata_col="lang")
    assert sorted(r["doc_id"] for r in again.collect()) == \
        sorted(r["doc_id"] for r in out.collect())


def test_temperature_resample_rejects_non_dyadic_alpha(spark):
    from etlutils_spark.operators.sampling import temperature_resample

    rows = [(i, "x", "en", 1) for i in range(10)]
    df = _docs_df(spark, rows)
    with pytest.raises(ValueError, match="alpha"):
        temperature_resample(df, alpha=0.3, strata_col="lang")


def test_rank_blend_exact_known_values(spark):
    from etlutils_spark.operators.quality import rank_blend

    rows = [(1, 10.0, 0.9), (2, 20.0, 0.5), (3, 30.0, 0.1)]
    df = spark.createDataFrame(rows, "doc_id long, good double, bad double")
    out = {r.doc_id: (r.rank_good, r.rank_bad, r.blend_rank)
           for r in rank_blend(df, {"good": True, "bad": False}).collect()}
    # good ascending: 10->0, 20->0.5, 30->1; bad descending: 0.9->0 ... 0.1->1
    assert out[1] == (0.0, 0.0, 0.0)
    assert out[2] == (0.5, 0.5, 0.5)
    assert out[3] == (1.0, 1.0, 1.0)
    import pytest as _pt

    with _pt.raises(ValueError, match="signal_cols"):
        rank_blend(df, {})


def test_rank_blend_rejects_degenerate_approx_buckets(spark):
    """approx_buckets=1 yields an empty threshold array (every rank
    silently 0 / 1.0) and 0 divides by zero (NaN ranks) — both must
    raise like the ccnet_lm_buckets guard instead of producing a
    constant blend (review catch)."""
    import pytest as _pt

    from etlutils_spark.operators.quality import rank_blend

    df = spark.createDataFrame([(1, 1.0)], "doc_id long, s double")
    for bad in (1, 0, -3):
        with _pt.raises(ValueError, match="approx_buckets"):
            rank_blend(df, {"s": True}, approx_buckets=bad)


def test_rank_blend_approx_mode_monotone(spark):
    from etlutils_spark.operators.quality import rank_blend

    rows = [(i, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, s double")
    exact = {r.doc_id: r.blend_rank
             for r in rank_blend(df, {"s": True}).collect()}
    approx = {r.doc_id: r.blend_rank
              for r in rank_blend(df, {"s": True}, approx_buckets=10).collect()}
    # bucket ranks never invert the exact ordering (monotone contract)
    ids = sorted(exact, key=exact.get)
    vals = [approx[i] for i in ids]
    assert all(a <= b + 1e-12 for a, b in zip(vals, vals[1:]))
    assert set(vals) <= {i / 10 for i in range(11)}


def test_knn_label_consistency_flags_planted_mislabel(spark):
    from etlutils_spark.operators.similarity import (
        cosine_topk,
        knn_label_consistency,
    )

    # two tight clusters; vec 5 sits in cluster A but carries label B
    a = [1.0, 0.0, 0.0, 0.0]
    b = [0.0, 1.0, 0.0, 0.0]
    rows = []
    for i in range(5):
        rows.append((i, [x + 0.01 * i for x in a], 0))
    for i in range(6, 11):
        rows.append((i, [x + 0.01 * i for x in b], 1))
    rows.append((5, [x + 0.05 for x in a], 1))  # mislabeled
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    nn = cosine_topk(emb, emb, k=3)
    out = {r.vec_id: (r.majority_label, r.consistent, r.n_same_label)
           for r in knn_label_consistency(nn, emb.select("vec_id", "label")).collect()}
    assert out[5] == (0, False, 0)   # neighborhood says cluster A
    assert out[0][1] is True and out[7][1] is True


def test_temperature_resample_quarter_alphas(spark):
    """The 0.25/0.75 sqrt-chain branches: expected kept mass follows
    min(n^q)/n^q with q = 1-alpha (n_en=1600, n_de=400 -> rate_en =
    (400/1600)^q)."""
    from etlutils_spark.operators.sampling import temperature_resample

    rows = [(i, "x", "en" if i % 10 < 8 else "de", 1) for i in range(2000)]
    df = _docs_df(spark, rows)
    for alpha, q in ((0.25, 0.75), (0.75, 0.25)):
        got = {r["lang"]: r["n"] for r in
               temperature_resample(df, alpha=alpha, strata_col="lang")
               .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert got["de"] == 400  # binding stratum kept whole
        expected_en = 1600 * (400 / 1600) ** q
        assert abs(got["en"] - expected_en) <= 0.25 * expected_en, (alpha, got)


def test_temperature_resample_token_weighted(spark):
    """weight_col switches stratum mass to a column sum: with en docs
    4x LONGER (same doc counts), token-weighted alpha=0 flattens en's
    TOKEN mass toward de's, keeping ~n_de_tokens/n_en_tokens of en docs."""
    from etlutils_spark.operators.sampling import temperature_resample

    rows = [(i, "x", "en" if i < 1000 else "de", 400 if i < 1000 else 100)
            for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, n_tokens long")
    out = temperature_resample(df, alpha=0.0, strata_col="lang",
                               weight_col="n_tokens")
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got["de"] == 1000                 # binding stratum kept whole
    # en token mass 400k vs de 100k -> rate 0.25 -> ~250 of 1000 docs
    assert 180 <= got["en"] <= 320


def test_mixture_resample_token_weighted(spark):
    from etlutils_spark.operators.sampling import mixture_resample

    # equal doc counts; en docs carry 4x the tokens -> a 50/50 TOKEN
    # mixture must downsample en docs to ~1/4 of de's keep rate
    rows = [(i, "x", "en" if i < 1000 else "de", 400 if i < 1000 else 100, 1)
            for i in range(2000)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_tokens long, pad int")
    out = mixture_resample(df, {"en": 0.5, "de": 0.5}, strata_col="lang",
                           weight_col="n_tokens")
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got["de"] == 1000  # binding stratum (less token mass) whole
    assert 180 <= got["en"] <= 320  # rate 100k/400k = 0.25 of 1000 docs


def test_cap_per_group_exact_and_approx(spark):
    from etlutils_spark.operators.sampling import cap_per_group

    rows = [(i, f"g{i % 4}") for i in range(400)]  # 4 groups x 100
    df = spark.createDataFrame(rows, "doc_id long, source string")
    capped = cap_per_group(df, cap=10, group_col="source")
    sizes = {r.source: r.n for r in
             capped.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes == {f"g{i}": 10 for i in range(4)}
    # deterministic: same selection on re-run and after repartitioning
    again = cap_per_group(df.repartition(7), cap=10, group_col="source")
    assert ({r.doc_id for r in capped.collect()}
            == {r.doc_id for r in again.collect()})
    # groups under the cap are kept whole
    whole = cap_per_group(df, cap=500, group_col="source")
    assert whole.count() == 400
    # approx mode: under-cap groups kept whole exactly; hot groups land
    # near the cap (binomial noise ~ +-sqrt(cap))
    approx = cap_per_group(df, cap=50, group_col="source", approx=True)
    asz = {r.source: r.n for r in
           approx.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(25 <= n <= 75 for n in asz.values()), asz
    assert cap_per_group(df, cap=500, group_col="source",
                         approx=True).count() == 400
    with pytest.raises(ValueError, match="cap"):
        cap_per_group(df, cap=0)


def test_line_boilerplate_removal_golden(spark):
    from etlutils_spark.operators.text import line_boilerplate_removal

    # "FOOTER" appears in 3/4 docs (75% >= 20%): boilerplate.
    # "rare line" appears once: content. Order must be preserved.
    rows = [
        (0, "alpha one\nFOOTER\nbeta two"),
        (1, "FOOTER\ngamma three"),
        (2, "delta four\nFOOTER"),
        (3, "rare line"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           line_boilerplate_removal(df, max_doc_frac=0.2).collect()}
    assert out[0].text_clean == "alpha one\nbeta two"
    assert out[1].text_clean == "gamma three"
    assert out[2].text_clean == "delta four"
    assert out[3].text_clean == "rare line"
    assert out[0].n_lines == 3 and out[0].n_boiler_lines == 1
    assert out[3].n_boiler_lines == 0
    # a doc that is pure boilerplate reassembles to the empty string
    df2 = spark.createDataFrame(
        rows + [(4, "FOOTER")], "doc_id long, text string"
    )
    out2 = {r.doc_id: r for r in
            line_boilerplate_removal(df2, max_doc_frac=0.2).collect()}
    assert out2[4].text_clean == "" and out2[4].n_boiler_lines == 1
    # a line repeated WITHIN one doc counts that doc once (stays content)
    df3 = spark.createDataFrame(
        [(0, "x\nx\nx"), (1, "y")], "doc_id long, text string"
    )
    out3 = {r.doc_id: r.text_clean for r in
            line_boilerplate_removal(df3, max_doc_frac=0.5,
                                     min_doc_count=2).collect()}
    assert out3[0] == "x\nx\nx"


def test_cap_per_group_null_group_both_modes(spark):
    """A NULL group is a group: both modes must cap it, not drop it."""
    from etlutils_spark.operators.sampling import cap_per_group

    rows = [(i, None if i < 50 else "g") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    exact = cap_per_group(df, cap=10, group_col="source")
    ex = {r.source: 0 for r in exact.collect()}
    ncnt = sum(1 for r in exact.collect() if r.source is None)
    assert ncnt == 10
    approx = cap_per_group(df, cap=60, group_col="source", approx=True)
    null_rows = [r for r in approx.collect() if r.source is None]
    assert len(null_rows) == 50  # under the cap: kept whole, not dropped


def test_curate_documents_optional_stages(spark):
    """Opt-in boilerplate removal (pre-dedup) and per-source caps
    (post-dedup, approx mode) compose into the batch curation chain;
    defaults leave behavior unchanged."""
    from etlutils_spark.operators.curation import curate_documents

    body = "the quick brown fox jumps over a lazy dog " * 3
    rows = []
    for i in range(40):
        # every doc shares a FOOTER line; bodies differ per doc
        rows.append((i, f"{body}doc {i} of the corpus\nFOOTER LINE",
                     f"s{i % 2}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    bench = spark.createDataFrame(
        [(0, "benchmark only text nothing shared with corpus")],
        "doc_id long, text string",
    )
    base = curate_documents(docs, bench, min_tokens=5,
                            min_stopword_ratio=0.0)
    assert base.count() == 40
    # boilerplate stage strips the shared FOOTER line from every doc
    nb = curate_documents(docs, bench, min_tokens=5,
                          min_stopword_ratio=0.0,
                          boilerplate_max_doc_frac=0.5)
    assert nb.count() == 40
    assert all("FOOTER" not in r.text for r in nb.collect())
    # per-source cap bounds each source's survivors
    capped = curate_documents(docs, bench, min_tokens=5,
                              min_stopword_ratio=0.0, source_cap=5)
    per_src = {r.source: r.n for r in
               capped.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
               .collect()}
    assert all(n <= 12 for n in per_src.values())  # approx mode: near cap
    assert capped.count() < 40
    # published-rule stages: C4 kills every doc here (no terminal
    # punctuation), and adding a period end + clauses revives them
    c4 = curate_documents(docs, bench, min_tokens=5,
                          min_stopword_ratio=0.0, c4_rules=True)
    assert c4.count() == 0
    punct = docs.select(
        "doc_id",
        F.concat(F.col("text"),
                 F.lit(" It ends. Properly now. Yes indeed.")).alias("text"),
        "source",
    )
    c4b = curate_documents(punct, bench, min_tokens=5,
                           min_stopword_ratio=0.0, c4_rules=True)
    assert c4b.count() == 40
    # gopher stage: these 40-ish-word docs fail the 50-word floor
    gop = curate_documents(docs, bench, min_tokens=5,
                           min_stopword_ratio=0.0, gopher_rules=True)
    assert gop.count() == 0


def test_winsorize_semantics(spark):
    """Clipping matches the obvious Python computation; NULLs pass
    through; grouped thresholds are per-group; bad quantiles raise."""
    from etlutils_spark.operators.quality import winsorize

    vals = [float(v) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 100]]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)] + [(99, None)],
        "id long, v double",
    )
    out = {r.id: r.v_w for r in
           winsorize(df, "v", lower_q=0.1, upper_q=0.9).collect()}
    # order stats at ranks floor(0.1*9)=0 and floor(0.9*9)=8 -> [1, 9]
    assert out[0] == 1.0 and out[9] == 9.0 and out[4] == 5.0
    assert out[99] is None
    g = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 11)]
        + [("b", float(v)) for v in range(100, 1100, 100)],
        "grp string, v double",
    )
    gout = winsorize(g, "v", lower_q=0.0, upper_q=0.5, group_col="grp")
    mx = {r.grp: r.mx for r in
          gout.groupBy("grp").agg(F.max("v_w").alias("mx")).collect()}
    # rank floor(0.5*9)=4 -> 5th smallest: a=5, b=500
    assert mx == {"a": 5.0, "b": 500.0}
    import pytest

    with pytest.raises(ValueError, match="lower_q"):
        winsorize(df, "v", lower_q=0.9, upper_q=0.1)


def test_cap_per_group_order_col_keeps_best(spark):
    from etlutils_spark.operators.sampling import cap_per_group

    rows = [(i, "g", float(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    best = cap_per_group(df, cap=3, group_col="source", order_col="score")
    assert {r.doc_id for r in best.collect()} == {17, 18, 19}
    import pytest

    with pytest.raises(ValueError, match="exact mode"):
        cap_per_group(df, cap=3, order_col="score", approx=True)


def test_winsorize_null_group_is_clipped(spark):
    """A NULL group is a group (same contract as cap_per_group): its
    rows must clip to the NULL group's own band, not pass through."""
    from etlutils_spark.operators.quality import winsorize

    rows = ([(i, None, float(v)) for i, v in
             enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 100])]
            + [(100 + i, "g", float(i)) for i in range(10)])
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    out = {r.id: r.v_w for r in
           winsorize(df, "v", lower_q=0.1, upper_q=0.9,
                     group_col="grp").collect()}
    assert out[9] == 9.0  # the NULL group's 100 clips to its own P90
    assert out[0] == 1.0


def test_nb_classifier_separates_planted_classes(spark):
    """Planted separation: positive docs speak 'signal' words, negative
    docs 'noise' words, a few words are shared. The trained likelihood
    ratios must order signal > shared > noise, and the per-doc mean
    weight must separate the classes with a margin."""
    from etlutils_spark.operators.quality import (
        nb_classifier_scores,
        nb_token_weights,
    )

    rows = []
    for i in range(20):
        rows.append((i, "signal quality insight shared common", 1))
    for i in range(20, 40):
        rows.append((i, "noise junk garble shared common", 0))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, y int")
    w = nb_token_weights(docs, label=F.col("y") == 1)
    wm = {r.token: r.weight for r in w.collect()}
    assert wm["signal"] > wm["shared"] > wm["noise"]
    assert wm["signal"] > 1.0 > wm["noise"]
    assert abs(wm["shared"] - 1.0) < 1e-9  # perfectly balanced token
    scores = {
        r.doc_id: r.mean_weight
        for r in nb_classifier_scores(docs, w).collect()
    }
    assert min(scores[i] for i in range(20)) > max(
        scores[i] for i in range(20, 40)
    )


def test_nb_classifier_partitioning_invariant_and_unseen_neutral(spark):
    """The decimal-exact score is bit-identical under repartitioning,
    and scoring a FOREIGN document drops unseen tokens (inner join):
    n_tokens counts only vocabulary hits."""
    from etlutils_spark.operators.quality import (
        nb_classifier_scores,
        nb_token_weights,
    )

    rows = [(i, f"alpha beta gamma tok{i % 7}", int(i % 2)) for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, y int")
    w1 = nb_token_weights(docs.repartition(1), label=F.col("y") == 1)
    w7 = nb_token_weights(docs.repartition(7), label=F.col("y") == 1)
    assert sorted(map(tuple, w1.collect())) == sorted(map(tuple, w7.collect()))
    s1 = {(r.doc_id, r.n_tokens, r.nb_score)
          for r in nb_classifier_scores(docs.repartition(1), w1).collect()}
    s7 = {(r.doc_id, r.n_tokens, r.nb_score)
          for r in nb_classifier_scores(docs.repartition(7), w7).collect()}
    assert s1 == s7
    foreign = spark.createDataFrame(
        [(99, "alpha zzz-unseen qqq-unseen")], "doc_id bigint, text string"
    )
    out = nb_classifier_scores(foreign, w1).collect()
    assert len(out) == 1 and out[0].n_tokens == 1  # only 'alpha' hits


def test_nb_classifier_hashed_bounds_model_and_separates(spark):
    """Hashing-trick mode: the weight table is bounded at hash_dim
    rows no matter the vocabulary, scoring with a mismatched hash_dim
    is loud (join on incompatible key types scores nothing subtle —
    the feature spaces differ), and planted separation survives
    hashing when the dims are collision-sparse."""
    from etlutils_spark.operators.quality import (
        nb_classifier_scores,
        nb_token_weights,
    )

    rows = []
    for i in range(20):
        rows.append((i, "signal quality insight shared common", 1))
    for i in range(20, 40):
        rows.append((i, "noise junk garble shared common", 0))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, y int")
    w = nb_token_weights(docs, label=F.col("y") == 1, hash_dim=64)
    assert w.count() <= 64
    # feature keys are bucket ids, not tokens
    assert dict(w.dtypes)["token"] == "bigint"
    scores = {
        r.doc_id: r.mean_weight
        for r in nb_classifier_scores(docs, w, hash_dim=64).collect()
    }
    assert min(scores[i] for i in range(20)) > max(
        scores[i] for i in range(20, 40)
    )


def test_nb_classifier_hash_dim_mismatch_raises(spark):
    """Two different hash_dims produce TYPE-COMPATIBLE bucket ids that
    partially join into plausible wrong scores — the scorer must refuse
    a weight table stamped with a different hash_dim (including
    vocab-vs-hashed mismatches). The guard is two-layer: an eager
    schema-METADATA check (job-free — metadata needs no execution) and
    a LAZY in-plan assert riding the weight values as backstop for
    tables that lost the metadata; neither layer runs a job at
    plan-construction time."""
    from etlutils_spark.operators.quality import (
        nb_classifier_scores,
        nb_token_weights,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta", 1), (2, "gamma delta", 0)],
        "doc_id bigint, text string, y int",
    )
    w1024 = nb_token_weights(docs, label=F.col("y") == 1, hash_dim=1024)
    with pytest.raises(Exception, match="hash_dim"):
        nb_classifier_scores(docs, w1024, hash_dim=64).collect()
    with pytest.raises(Exception, match="hash_dim"):
        # vocab-mode scoring against a hashed table
        nb_classifier_scores(docs, w1024).collect()
    wv = nb_token_weights(docs, label=F.col("y") == 1)
    with pytest.raises(Exception, match="hash_dim"):
        # hashed scoring against a vocab table
        nb_classifier_scores(docs, wv, hash_dim=1024).collect()


def test_nb_hash_dim_mismatch_raises_on_empty_weights(spark, tmp_path):
    """A ZERO-ROW weight table (empty/over-filtered training input) has
    no weight values for the lazy in-plan assert to ride, so before the
    metadata layer a hash_dim mismatch passed silently and scored
    nothing — the exact silent-mismatch mode the guard exists to stop
    (review catch). The schema-metadata stamp catches it with zero
    jobs, and survives a parquet round-trip."""
    from etlutils_spark.operators.quality import (
        nb_classifier_scores,
        nb_token_weights,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta", 1)], "doc_id bigint, text string, y int"
    )
    empty = docs.filter(F.lit(False))
    w_empty = nb_token_weights(empty, label=F.col("y") == 1, hash_dim=1024)
    assert w_empty.count() == 0
    with pytest.raises(ValueError, match="hash_dim"):
        nb_classifier_scores(docs, w_empty, hash_dim=64)
    with pytest.raises(ValueError, match="hash_dim"):
        nb_classifier_scores(docs, w_empty)  # vocab vs hashed
    # matching dim on an empty table: fine, scores nothing, no error
    assert nb_classifier_scores(docs, w_empty, hash_dim=1024).count() == 0
    # the stamp is column metadata, which Spark persists through parquet
    p = str(tmp_path / "w_empty")
    w_empty.write.parquet(p)
    reloaded = spark.read.parquet(p)
    with pytest.raises(ValueError, match="hash_dim"):
        nb_classifier_scores(docs, reloaded, hash_dim=64)


def test_nb_null_labels_excluded_from_training(spark):
    """NULL labels must not train as negatives: F.sum skips the NULL
    but F.count counts the row, so unlabeled rows (label derived from
    a join with misses) previously inflated c_neg silently (review
    catch). Training on a frame with NULL-label rows must equal
    training on the frame with those rows removed."""
    from etlutils_spark.operators.quality import nb_token_weights

    labeled = [(1, "alpha beta", True), (2, "alpha gamma", False)]
    with_nulls = labeled + [(3, "alpha beta gamma delta", None),
                            (4, "alpha alpha alpha", None)]
    schema = "doc_id bigint, text string, y boolean"
    w_clean = nb_token_weights(
        spark.createDataFrame(labeled, schema), label=F.col("y")
    )
    w_nulls = nb_token_weights(
        spark.createDataFrame(with_nulls, schema), label=F.col("y")
    )
    assert sorted(map(tuple, w_clean.collect())) == sorted(
        map(tuple, w_nulls.collect())
    )
    wm = {r.token: (r.c_pos, r.c_neg) for r in w_nulls.collect()}
    assert wm["alpha"] == (1, 1)  # not (1, 3): null-label rows ignored


def test_curate_documents_classifier_stage(spark):
    """The DCLM-style classifier stage inside the curation chain:
    docs whose mean likelihood-ratio falls below the threshold are
    dropped after dedup, before decontamination; hash_dim plumbs
    through; defaults (nb_weights=None) leave behavior unchanged."""
    from etlutils_spark.operators.curation import curate_documents
    from etlutils_spark.operators.quality import nb_token_weights

    rows = []
    for i in range(20):
        rows.append((i, "the quick brown fox insight quality signal "
                        f"of the and to in doc{i}", "s0", 1))
    for i in range(20, 40):
        rows.append((i, "the quick brown fox junk garble noise "
                        f"of the and to in doc{i}", "s0", 0))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, y int"
    )
    bench = spark.createDataFrame(
        [(0, "benchmark only text nothing shared")],
        "doc_id long, text string",
    )
    w = nb_token_weights(docs, label=F.col("y") == 1)
    kept = curate_documents(
        docs.drop("y"), bench, min_tokens=5, min_stopword_ratio=0.0,
        nb_weights=w, nb_min_mean_weight=1.0,
    )
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert ids == set(range(20))  # positives survive, negatives cut
    # hashed weights plumb through hash_dim
    wh = nb_token_weights(docs, label=F.col("y") == 1, hash_dim=256)
    kept_h = curate_documents(
        docs.drop("y"), bench, min_tokens=5, min_stopword_ratio=0.0,
        nb_weights=wh, nb_min_mean_weight=1.0, nb_hash_dim=256,
    )
    assert {r.doc_id for r in kept_h.select("doc_id").collect()} == set(
        range(20)
    )


def test_leakage_safe_split_string_ids_split_properly(spark):
    """String doc ids must split ~per-fractions: the old long cast
    turned them into NULL split keys whose digest failed every when()
    and dumped ~100% of unclustered docs into 'test' (review catch)."""
    from etlutils_spark.operators.sampling import leakage_safe_split

    docs = spark.createDataFrame(
        [(f"doc-{i}",) for i in range(200)], "doc_id string"
    )
    comp = spark.createDataFrame([], "node long, cluster_id long")
    out = leakage_safe_split(docs, components=comp).collect()
    frac_test = sum(1 for r in out if r.split == "test") / len(out)
    assert frac_test < 0.5  # was ~1.0 under the long-cast bug
    assert sum(1 for r in out if r.split == "train") / len(out) > 0.5


def test_mixture_resample_missing_weight_stratum_is_loud(spark):
    """A weight stratum absent from the data makes the requested
    mixture infeasible (feasible total = 0) — the inner join silently
    returned a WRONG mixture instead (100% of the present stratum;
    review catch). Must raise, naming the stratum."""
    import pytest

    from etlutils_spark.operators.sampling import mixture_resample

    docs = spark.createDataFrame(
        [(i, "en") for i in range(200)], "doc_id long, lang string"
    )
    with pytest.raises(Exception, match="has no rows"):
        mixture_resample(
            docs, {"en": 0.5, "pt": 0.5}, strata_col="lang"
        ).collect()
    # all strata present: unchanged behavior
    assert mixture_resample(docs, {"en": 1.0}, strata_col="lang").count() > 0


def test_temperature_alpha_one_is_identity(spark):
    from etlutils_spark.operators.sampling import temperature_resample

    docs = spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(60)],
        "doc_id long, lang string",
    )
    assert temperature_resample(docs, alpha=1.0, strata_col="lang").count() == 60


def test_pack_sequences_zero_token_doc_never_spans(spark):
    """A zero-token doc whose offset lands exactly on a pack cut must
    not flag spans_boundary (it occupies no tokens — review catch)."""
    from etlutils_spark.operators.sampling import pack_sequences

    docs = spark.createDataFrame(
        [(1, "g", 8), (2, "g", 0), (3, "g", 4)],
        "doc_id long, g string, n long",
    )
    out = {r.doc_id: r for r in pack_sequences(
        docs, budget=8, group_col="g", order_col="doc_id", token_col="n"
    ).collect()}
    assert out[2].start_offset == 8 and out[2].n_tokens == 0
    assert out[2].spans_boundary is False
    assert out[1].spans_boundary is False  # exactly fills pack 0
    assert out[3].spans_boundary is False  # fits inside pack 1


def test_shuffle_export_drops_internal_key(spark):
    from etlutils_spark.operators.sampling import shuffle_export

    df = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    out = shuffle_export(df, 2)
    assert out.columns == ["doc_id"]
    assert out.count() == 10
