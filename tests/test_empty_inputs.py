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
