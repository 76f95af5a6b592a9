#!/usr/bin/env python3
"""Round-14 probe: xxhash64 narrow-key rewrites of the shingle/
fingerprint/bigram operators (decontaminate, decontaminate_attribution,
decontaminate_rewrite, jaccard_pairs, winnow_overlap_pairs,
_bigram_lm_scored) vs the string-keyed HEAD forms, plus decontaminate's
explode_outer one-scan shape and _bigram_lm_scored's single model join.

Old forms inlined verbatim from the pre-change tree. Outputs checked
exact-tuple identical before timing; interleaved same-JVM min-of-N noop
reps (alternating old/new inside every round so box drift hits both).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etlutils_spark.caching import persist_tracked
from etlutils_spark.operators.dedup import (
    decontaminate,
    decontaminate_attribution,
    decontaminate_rewrite,
    jaccard_pairs,
    shingle_rows,
    span_rows,
    winnow_overlap_pairs,
)
from etlutils_spark.operators.search import (
    DEC,
    bigram_lm_scores,
    bigram_rows,
    ccnet_lm_buckets,
)
from etlutils_spark.operators.text import TOKENS_COL, winnow_fingerprints, with_tokens
from etlutils_spark.session import get_session
from etlutils_spark.sources.files import read_table

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("REPS", "3"))
BENCH_SOURCES = ("src0", "src1")


# ---- old forms (inlined from the pre-change tree) ---------------------------

def decontaminate_old(docs, benchmark, n=3, min_overlap=1,
                      text_col="text", id_col="doc_id"):
    bench_sh = F.broadcast(
        shingle_rows(benchmark, text_col, id_col, n)
        .select("shingle").distinct().withColumn("__hit", F.lit(1))
    )
    doc_sh = shingle_rows(docs, text_col, id_col, n)
    stats = (
        doc_sh.join(bench_sh, "shingle", "left")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shingles"),
             F.count("__hit").alias("n_contaminated"))
    )
    n_hit = F.coalesce(F.col("n_contaminated"), F.lit(0).cast("long"))
    n_sh = F.coalesce(F.col("n_shingles"), F.lit(0).cast("long"))
    return (
        docs.select(id_col).join(stats, id_col, "left")
        .select(
            id_col, n_sh.alias("n_shingles"), n_hit.alias("n_contaminated"),
            F.when(n_sh > 0, n_hit / n_sh).otherwise(F.lit(0.0)).alias(
                "contamination_ratio"),
            (n_hit >= min_overlap).alias("is_contaminated"),
        )
    )


def attribution_old(docs, benchmark, n=3, text_col="text", id_col="doc_id"):
    bench_sh = F.broadcast(
        shingle_rows(benchmark, text_col, id_col, n).select(
            F.col(id_col).alias("bench_id"), "shingle")
    )
    train_sh = shingle_rows(docs, text_col, id_col, n).select(
        F.col(id_col).alias("train_id"), "shingle")
    return (
        train_sh.join(bench_sh, "shingle").groupBy("bench_id")
        .agg(F.countDistinct("train_id").alias("n_quoting_docs"),
             F.countDistinct("shingle").alias("n_shared_shingles"),
             F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    )


def rewrite_old(docs, benchmark, window=32, n=3, min_overlap=1,
                text_col="text", id_col="doc_id"):
    base = persist_tracked(with_tokens(docs, text_col))
    spans = span_rows(base, window, text_col, id_col, keep_text=True,
                      with_key=False, pre_tokenized=True)
    bench_sh = F.broadcast(
        shingle_rows(benchmark, text_col, id_col, n).select("shingle").distinct()
    )
    toks = F.col(TOKENS_COL)
    gram_structs = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.struct(
                F.concat_ws(" ", *[F.element_at(toks, i + k) for k in range(n)]).alias("s"),
                i.alias("i"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<s:string,i:int>>"))
    grams = base.select(id_col, F.explode(gram_structs).alias("__g")).select(
        id_col,
        F.col("__g.s").alias("shingle"),
        F.floor((F.col("__g.i") - 1) / window).alias("__r0"),
        F.floor((F.col("__g.i") + (n - 2)) / window).alias("__r1"),
    )
    contaminated = (
        grams.join(bench_sh, "shingle")
        .select(id_col, "shingle", F.explode(F.sequence("__r0", "__r1")).alias("__idx"))
        .distinct()
        .groupBy(id_col, "__idx").agg(F.count(F.lit(1)).alias("__hits"))
        .filter(F.col("__hits") >= min_overlap)
        .select(id_col, "__idx")
    )
    clean = spans.join(contaminated, [id_col, "__idx"], "left_anti")
    arr = F.array_sort(F.collect_list(F.struct(F.col("__idx"), F.col("__text"))))
    return clean.groupBy(id_col).agg(
        F.concat_ws(" ", F.transform(arr, lambda s: s["__text"])).alias("clean_text"),
        F.sum("__n").cast("bigint").alias("n_kept_tokens"),
    )


def jaccard_pairs_old(shingles, id_col="doc_id", threshold=0.2,
                      containment_threshold=None, max_shingle_df=None):
    shingles = persist_tracked(shingles)
    if max_shingle_df is not None:
        freq = shingles.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
        ok = freq.filter(F.col("__df") <= max_shingle_df).select("shingle")
        shingles = persist_tracked(shingles.join(ok, on=["shingle"], how="left_semi"))
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    sh_h = F.xxhash64("shingle")
    a = shingles.select(F.col(id_col).alias(f"{id_col}_1"), sh_h.alias("sh_1"))
    b = shingles.select(F.col(id_col).alias(f"{id_col}_2"), sh_h.alias("sh_2"))
    cond = [F.col("sh_1") == F.col("sh_2"), F.col(f"{id_col}_1") < F.col(f"{id_col}_2")]
    inter = (a.join(b, on=cond).groupBy(f"{id_col}_1", f"{id_col}_2")
             .agg(F.count(F.lit(1)).alias("n_common")))
    s1 = sizes.select(F.col(id_col).alias(f"{id_col}_1"), F.col("n_sh").alias("n_1"))
    s2 = sizes.select(F.col(id_col).alias(f"{id_col}_2"), F.col("n_sh").alias("n_2"))
    jac = F.col("n_common").cast("double") / (
        F.col("n_1") + F.col("n_2") - F.col("n_common")).cast("double")
    scored = inter.join(s1, f"{id_col}_1").join(s2, f"{id_col}_2").withColumn("jaccard", jac)
    if containment_threshold is not None:
        cont = F.col("n_common").cast("double") / F.least(F.col("n_1"), F.col("n_2")).cast("double")
        return (scored.withColumn("containment", cont)
                .filter(F.col("containment") >= containment_threshold)
                .select(f"{id_col}_1", f"{id_col}_2", "n_common", "n_1", "n_2",
                        "jaccard", "containment"))
    return scored.filter(F.col("jaccard") >= threshold).select(
        f"{id_col}_1", f"{id_col}_2", "n_common", "n_1", "n_2", "jaccard")


def winnow_old(df, k, window, min_common, max_doc_freq, id_col="doc_id"):
    fps = winnow_fingerprints(df, k=k, window=window, id_col=id_col)
    if max_doc_freq is not None:
        freq = fps.groupBy("fingerprint").agg(F.count(F.lit(1)).alias("__df"))
        keep = freq.filter(F.col("__df") <= max_doc_freq).select("fingerprint")
        fps = fps.join(keep, "fingerprint", "left_semi")
    fps = persist_tracked(fps)
    a = fps.select(F.col(id_col).alias(f"{id_col}_1"), F.col("fingerprint"))
    b = fps.select(F.col(id_col).alias(f"{id_col}_2"), F.col("fingerprint"))
    return (a.join(b, "fingerprint")
            .filter(F.col(f"{id_col}_1") < F.col(f"{id_col}_2"))
            .groupBy(f"{id_col}_1", f"{id_col}_2")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
            .filter(F.col("n_common") >= min_common))


def bigram_scored_old(df, text_col="text", id_col="doc_id", group_cols=(),
                      with_min=True):
    group_cols = list(group_cols)
    bg = persist_tracked(bigram_rows(df, text_col, id_col, carry=group_cols or None))
    c2 = bg.groupBy(*group_cols, "__ctx", "__nxt").agg(F.count(F.lit(1)).alias("__n2"))
    c1 = bg.groupBy(*group_cols, "__ctx").agg(F.count(F.lit(1)).alias("__n1"))
    prob = F.col("__n2").cast("double") / F.col("__n1").cast("double")
    proj = [F.col(id_col), *[F.col(c) for c in group_cols], prob.cast(DEC).alias("__p")]
    aggs = [F.count(F.lit(1)).alias("n_bigrams"),
            (F.sum("__p").cast("double") / F.count(F.lit(1))).alias("avg_bigram_prob")]
    if with_min:
        proj.append(prob.alias("__pd"))
        aggs.append(F.min("__pd").alias("min_bigram_prob"))
    return (bg.join(c2, [*group_cols, "__ctx", "__nxt"])
            .join(c1, [*group_cols, "__ctx"])
            .select(*proj).groupBy(id_col, *group_cols).agg(*aggs))


def main():
    from etlutils_spark.extension_queries import (
        NGRAM_JACCARD_MAX_DOC_FREQ,
        WINNOW_K,
        WINNOW_WINDOW,
    )

    spark = get_session()
    docs = read_table(spark, "documents", SF_DIR)
    bench = docs.filter(F.col("source").isin(*BENCH_SOURCES))
    train = docs.filter(~F.col("source").isin(*BENCH_SOURCES))
    mdf = NGRAM_JACCARD_MAX_DOC_FREQ

    forms = {
        "decontaminate": (
            lambda: decontaminate_old(train, bench, n=3, min_overlap=25),
            lambda: decontaminate(train, bench, n=3, min_overlap=25),
        ),
        "attribution": (
            lambda: attribution_old(train, bench),
            lambda: decontaminate_attribution(train, bench),
        ),
        "rewrite": (
            lambda: rewrite_old(train, bench),
            lambda: decontaminate_rewrite(train, bench),
        ),
        "jaccard_guarded": (
            lambda: jaccard_pairs_old(shingle_rows(docs), threshold=0.2,
                                      max_shingle_df=mdf),
            lambda: jaccard_pairs(shingle_rows(docs), threshold=0.2,
                                  max_shingle_df=mdf),
        ),
        "containment": (
            lambda: jaccard_pairs_old(
                shingle_rows(docs, max_doc_freq=mdf), containment_threshold=0.5),
            lambda: jaccard_pairs(
                shingle_rows(docs, max_doc_freq=mdf), containment_threshold=0.5),
        ),
        "winnow": (
            lambda: winnow_old(docs, WINNOW_K, WINNOW_WINDOW, 2, mdf),
            lambda: winnow_overlap_pairs(docs, k=WINNOW_K, window=WINNOW_WINDOW,
                                         min_common=2, max_doc_freq=mdf),
        ),
        "bigram_lm": (
            lambda: bigram_scored_old(docs),
            lambda: bigram_lm_scores(docs),
        ),
        "ccnet_exact": (
            lambda: bigram_scored_old(docs, group_cols=["lang"], with_min=False),
            lambda: ccnet_lm_buckets(docs).drop("lm_bucket"),
            # ntile rides on top of the scored frame; compare the scored part
        ),
    }

    for name, (old, new) in forms.items():
        spark.catalog.clearCache()
        a = sorted(map(tuple, old().collect()))
        spark.catalog.clearCache()
        b = sorted(map(tuple, new().collect()))
        print(f"{name:16s} exact-tuple match: {a == b} ({len(a)} vs {len(b)} rows)",
              flush=True)

    for name, (old, new) in forms.items():
        spark.catalog.clearCache()
        old().write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        new().write.format("noop").mode("overwrite").save()

    res = {}
    for rep in range(N):
        for name, (old, new) in forms.items():
            for tag, fn in (("old", old), ("new", new)):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                spark.sparkContext.setJobDescription(f"probe_hash:{name}:{tag}")
                fn().write.format("noop").mode("overwrite").save()
                res.setdefault((name, tag), []).append(time.perf_counter() - t0)
    for (name, tag), ts in res.items():
        print(f"{name:16s} {tag:3s} min {min(ts):.3f}  all {[round(t, 3) for t in ts]}",
              flush=True)


if __name__ == "__main__":
    main()
