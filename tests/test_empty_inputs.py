"""Zero-row inputs: every operator returns an EMPTY FRAME WITH SCHEMA
(the documented divergence from the reference's zero-row type switch,
R/ffsql.R:207-215 / SURVEY §1.3, §7.4)."""

from pyspark.sql import functions as F

from etlutils_spark.operators.dedup import (
    dedup_exact,
    jaccard_pairs,
    minhash_dedup_pairs,
    shingle_rows,
)
from etlutils_spark.operators.locf import na_locf_plus_one
from etlutils_spark.operators.matchmerge import matchmerge
from etlutils_spark.operators.recode import recode_column
from etlutils_spark.operators.text import fingerprint, text_stats


def test_matchmerge_empty_left(spark):
    x = spark.createDataFrame([], "k int, v string")
    y = spark.createDataFrame([(1, "a")], "k int, w string")
    out = matchmerge(x, y, by_x="k", by_y="k", all_x=True)
    assert out.count() == 0
    assert out.columns == ["k", "v", "w"]


def test_locf_empty(spark):
    df = spark.createDataFrame([], "ord int, x double")
    out = na_locf_plus_one(df, "x", order_by="ord")
    assert out.count() == 0
    assert dict(out.dtypes)["x"] == "double"


def test_recode_empty(spark):
    df = spark.createDataFrame([], "v string")
    assert recode_column(df, "v", ["A"], ["B"]).count() == 0


def test_dedup_pipelines_empty(spark):
    docs = spark.createDataFrame([], "doc_id bigint, text string")
    assert dedup_exact(docs).count() == 0
    assert jaccard_pairs(shingle_rows(docs)).count() == 0
    out = minhash_dedup_pairs(docs)
    assert out.count() == 0
    assert set(out.columns) == {"doc_id_1", "doc_id_2", "jaccard"}


def test_text_ops_empty(spark):
    docs = spark.createDataFrame([], "doc_id bigint, text string")
    assert text_stats(docs).count() == 0
    assert fingerprint(docs).count() == 0


def test_minhash_collapse_exact(spark):
    rows = [(i, "identical text body with many words repeated here") for i in range(5)]
    rows += [(10, "a completely different document entirely")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    full = minhash_dedup_pairs(docs, threshold=0.5)
    collapsed = minhash_dedup_pairs(docs, threshold=0.5, collapse_exact=True)
    assert full.count() == 10  # all pairs within the 5-copy group
    assert collapsed.count() == 0  # group collapsed to one survivor


def test_round2_curation_ops_empty(spark):
    from etlutils_spark.operators.dedup import cluster_survivors, decontaminate
    from etlutils_spark.operators.sampling import mixture_resample, shuffle_export
    from etlutils_spark.operators.text import chunk_documents, corpus_rarity_stats

    docs = spark.createDataFrame([], "doc_id bigint, text string, lang string")
    some = spark.createDataFrame([(1, "a b c d", "en")], "doc_id bigint, text string, lang string")

    # empty corpus in, empty frame (with schema) out
    assert decontaminate(docs, some).count() == 0
    assert chunk_documents(docs).count() == 0
    assert corpus_rarity_stats(docs).count() == 0
    assert mixture_resample(docs, {"en": 1.0}, strata_col="lang").count() == 0
    assert shuffle_export(docs, 4).drop("__shuffle_key").columns == docs.columns

    # empty BENCHMARK: nothing is contaminated, stats still emitted
    out = decontaminate(some, docs).collect()
    assert len(out) == 1 and out[0]["n_contaminated"] == 0
    assert not out[0]["is_contaminated"]

    # empty cluster map: every doc is its own survivor
    clusters = spark.createDataFrame([], "node bigint, cluster_id bigint")
    surv = cluster_survivors(some.select("doc_id", "text"), clusters, quality_col="text")
    assert [r["doc_id"] for r in surv.collect()] == [1]


def test_outlier_flags_degenerate_groups(spark, tmp_path):
    """Differential check of outlier_flags_events on groups the driver
    data never exercises: n=1 (variance divides by zero) and n>1 with
    zero variance (float cancellation can go epsilon-negative, which
    DuckDB's sqrt rejects). Both sides must emit NULL std for n=1 and
    agree row-for-row."""
    import os
    import sys

    import duckdb

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as e

    rows = [
        (1, "solo", 5.0),
        (2, "flat", 2.5), (3, "flat", 2.5), (4, "flat", 2.5),
        (5, "norm", 1.0), (6, "norm", 2.0), (7, "norm", 300.0),
    ]
    df = spark.createDataFrame(
        [(i, t, v, 100 + i) for i, t, v in rows],
        "event_id long, event_type string, value double, user_id long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    fn = e.REGISTRY["outlier_flags_events"][0]
    sql = e.REGISTRY["outlier_flags_events"][1]
    got = {r["event_id"]: r.asDict() for r in fn(spark, str(tmp_path)).collect()}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    cols = [d[0] for d in con.execute(sql).description]
    want = {r[0]: dict(zip(cols, r)) for r in con.execute(sql).fetchall()}

    assert set(got) == set(want) == {i for i, _, _ in rows}
    for eid in got:
        g, w = got[eid], want[eid]
        assert (g["grp_std"] is None) == (w["grp_std"] is None), eid
        if g["grp_std"] is not None:
            assert abs(g["grp_std"] - w["grp_std"]) < 1e-9, eid
        assert g["is_outlier"] == w["is_outlier"], eid
    # the degenerate shapes themselves
    assert got[1]["grp_std"] is None and got[1]["is_outlier"] is None
    assert got[2]["grp_std"] == 0.0 and not got[2]["is_outlier"]


def test_scd2_empty_updates(spark):
    from etlutils_spark.sources.merge import scd2_apply

    target = spark.createDataFrame(
        [(1, "A", None, None, True)],
        "k int, attr string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    updates = spark.createDataFrame(
        [], "k int, attr string, effective_date timestamp"
    )
    out = scd2_apply(target, updates, keys="k", attr_cols=["attr"])
    assert out.count() == 1  # target passes through untouched
    assert out.columns == target.columns


def test_scd2_empty_target(spark):
    from etlutils_spark.sources.merge import scd2_apply

    target = spark.createDataFrame(
        [], "k int, attr string, valid_from timestamp, valid_to timestamp, is_current boolean"
    )
    updates = spark.createDataFrame(
        [(1, "A", "2020-01-01")], "k int, attr string, effective_date string"
    ).withColumn("effective_date", F.col("effective_date").cast("timestamp"))
    out = scd2_apply(target, updates, keys="k", attr_cols=["attr"])
    rows = out.collect()
    assert len(rows) == 1 and rows[0].is_current is True
    assert rows[0].valid_from is not None and rows[0].valid_to is None


def test_salted_join_empty_sides(spark):
    from etlutils_spark.operators.skew import salted_join

    big = spark.createDataFrame([], "k int, v double")
    small = spark.createDataFrame([(1, "x")], "k int, w string")
    assert salted_join(big, small, on="k").count() == 0
    big2 = spark.createDataFrame([(1, 2.0)], "k int, v double")
    small2 = spark.createDataFrame([], "k int, w string")
    out = salted_join(big2, small2, on="k", how="left")
    assert out.count() == 1  # left join keeps the big row, null-filled
    assert out.collect()[0].w is None


def test_span_dedup_and_winnow_empty(spark):
    from etlutils_spark.operators.dedup import (
        window_dedup_stats,
        window_dedup_rewrite,
        winnow_overlap_pairs,
    )
    from etlutils_spark.operators.text import winnow_fingerprints

    docs = spark.createDataFrame([], "doc_id bigint, text string")
    stats = window_dedup_stats(docs)
    assert stats.count() == 0
    assert set(stats.columns) == {
        "doc_id", "n_windows", "n_dup_windows", "n_tokens",
        "n_kept_tokens", "kept_ratio",
    }
    rw = window_dedup_rewrite(docs)
    assert rw.count() == 0 and set(rw.columns) == {
        "doc_id", "dedup_text", "n_kept_tokens"
    }
    assert winnow_fingerprints(docs).count() == 0
    assert winnow_overlap_pairs(docs, max_doc_freq=8).count() == 0


def test_embedding_cluster_ops_empty(spark):
    from etlutils_spark.operators.similarity import centroid_assign, semantic_dedup

    emb = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0])], "cluster_id bigint, embedding array<float>"
    )
    assigned = centroid_assign(emb, cents)
    assert assigned.count() == 0
    assert assigned.columns == ["vec_id", "cluster_id", "cosine"]
    assert semantic_dedup(emb, cents).count() == 0
    # empty CENTROIDS: every vector unassigned -> empty result, not error
    emb1 = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id bigint, embedding array<float>"
    )
    empty_cents = spark.createDataFrame(
        [], "cluster_id bigint, embedding array<float>"
    )
    assert centroid_assign(emb1, empty_cents).count() == 0


def test_search_tier_empty(spark):
    from etlutils_spark.operators.search import bigram_lm_scores, bm25_topk

    docs = spark.createDataFrame([], "doc_id bigint, text string")
    out = bm25_topk(docs, ["x"], k=5)
    assert out.count() == 0
    assert out.columns == ["doc_id", "bm25", "n_terms_matched", "rank"]
    out2 = bigram_lm_scores(docs)
    assert out2.count() == 0
    assert "avg_bigram_prob" in out2.columns


def test_temperature_and_rank_blend_empty(spark):
    from etlutils_spark.operators.quality import rank_blend
    from etlutils_spark.operators.sampling import temperature_resample

    docs = spark.createDataFrame([], "doc_id bigint, text string, lang string")
    assert temperature_resample(docs, 0.5, strata_col="lang").count() == 0
    sig = spark.createDataFrame([], "doc_id bigint, s double")
    out = rank_blend(sig, {"s": True})
    assert out.count() == 0
    assert out.columns == ["doc_id", "rank_s", "blend_rank"]
    # approx mode on an empty frame: the in-plan thresholds make this a
    # 0-row result; the old eager .first() collect crashed iterating a
    # NULL threshold array (and ran one driver job per signal at
    # plan-construction time — review catch)
    out_a = rank_blend(sig, {"s": True}, approx_buckets=4)
    assert out_a.count() == 0
    assert out_a.columns == ["doc_id", "rank_s", "blend_rank"]


def test_funnel_and_cadence_empty(spark):
    import __spark_entry__  # noqa: F401  (registers funnel_stages' module)
    from etlutils_spark.event_queries import funnel_stages

    e = spark.createDataFrame(
        [], "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = funnel_stages(e)
    assert out.count() == 0
    assert out.columns == ["user_id", "view_ts", "click_ts", "purchase_ts", "stage"]


def test_gini_and_drift_empty(spark):
    from etlutils_spark.operators.recode import profile_drift
    from etlutils_spark.operators.text import token_gini_stats

    docs = spark.createDataFrame([], "doc_id bigint, text string")
    assert token_gini_stats(docs).count() == 0
    a = spark.createDataFrame([], "doc_id bigint, n long")
    out = profile_drift(a, a).collect()
    # empty tables still profile: one row per column, zero counts
    assert {r.column for r in out} == {"doc_id", "n"}
    assert all(r.n_rows_a == 0 and r.n_rows_delta == 0 for r in out)


def test_pq_train_empty_raises(spark):
    import pytest

    from etlutils_spark.operators.similarity import pq_train

    emb = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        pq_train(emb)


def test_ann_empty_query_sets(spark):
    from etlutils_spark.operators.similarity import cosine_topk_arrow, pq_topk

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        "vec_id bigint, embedding array<float>",
    )
    noq = emb.filter(F.col("vec_id") < 0)
    out = pq_topk(emb, noq, k=3, m=4, ksub=2)
    assert out.count() == 0
    assert out.columns == ["query_id", "vec_id", "cosine", "rank"]
    out2 = cosine_topk_arrow(emb, noq, k=3)
    assert out2.count() == 0
    assert out2.columns == ["query_id", "vec_id", "cosine", "rank"]


def test_lsh_topk_empty_corpus_raises_without_dim(spark):
    import pytest

    from etlutils_spark.operators.similarity import lsh_topk

    emb = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    with pytest.raises(ValueError, match="dim"):
        lsh_topk(emb, emb, k=3)
    # with dim given, an empty corpus yields an empty result
    assert lsh_topk(emb, emb, k=3, dim=8).count() == 0


def test_boilerplate_and_cap_empty(spark):
    from etlutils_spark.operators.sampling import cap_per_group
    from etlutils_spark.operators.text import line_boilerplate_removal

    docs = spark.createDataFrame([], "doc_id bigint, text string, source string")
    out = line_boilerplate_removal(docs)
    assert out.count() == 0
    assert out.columns == ["doc_id", "n_lines", "n_boiler_lines", "text_clean"]
    assert cap_per_group(docs, cap=5).count() == 0
    assert cap_per_group(docs, cap=5, approx=True).count() == 0


def test_nb_classifier_empty_and_degenerate(spark):
    """Empty corpus -> empty weight table and empty scores (no
    divide-by-zero inside the weight tree: the cross-joined totals
    row simply doesn't exist); one-class corpus (all positive) still
    trains — Laplace smoothing keeps every denominator positive."""
    from pyspark.sql import functions as F

    from etlutils_spark.operators.quality import (
        nb_classifier_scores,
        nb_token_weights,
    )

    empty = spark.createDataFrame([], "doc_id bigint, text string, y int")
    w = nb_token_weights(empty, label=F.col("y") == 1)
    assert w.count() == 0
    assert nb_classifier_scores(empty, w).count() == 0
    onecls = spark.createDataFrame(
        [(1, "alpha beta", 1), (2, "alpha gamma", 1)],
        "doc_id bigint, text string, y int",
    )
    w1 = nb_token_weights(onecls, label=F.col("y") == 1)
    rows = {r.token: r for r in w1.collect()}
    assert all(r.c_neg == 0 and r.weight > 0 for r in rows.values())
    scored = nb_classifier_scores(onecls, w1).collect()
    assert len(scored) == 2 and all(s.nb_score > 0 for s in scored)
