"""VERDICT item 5 probe: window_dedup_rewrite with ONE text shuffle —
flags (id, idx) through the span-key join, reassembly joins narrow
kept-idx sets to the span text by id (exchange reused by the groupBy).
Measures both shapes + output equality."""
import os, sys, time, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from etlutils_spark.session import get_session
from etlutils_spark.sources.files import read_table
from etlutils_spark.operators.dedup import span_rows, window_dedup_rewrite
from etlutils_spark.caching import persist_tracked

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
spark = get_session("rwprobe")
docs = read_table(spark, "documents", SF)

def rewrite_one_shuffle(df, window=32, text_col="text", id_col="doc_id",
                        portable=True):
    keyed = span_rows(df, window, text_col, id_col, portable, keep_text=True)
    keyed = persist_tracked(keyed)
    narrow = keyed.select(id_col, "__idx", "__key")
    firsts = narrow.groupBy("__key").agg(
        F.min(F.struct(F.col(id_col).alias("i"), F.col("__idx").alias("x"))).alias("__first")
    )
    kept_idx = (
        narrow.join(firsts, "__key")
        .filter(
            (F.col(id_col) == F.col("__first.i"))
            & (F.col("__idx") == F.col("__first.x"))
        )
        .groupBy(id_col)
        .agg(F.collect_set("__idx").alias("__kept_idxs"))
    )
    spans = F.array_sort(
        F.collect_list(F.struct(F.col("__idx"), F.col("__text")))
    )
    return (
        keyed.select(id_col, "__idx", "__n", "__text")
        .join(kept_idx, id_col)
        .filter(F.array_contains("__kept_idxs", F.col("__idx")))
        .groupBy(id_col)
        .agg(
            F.concat_ws(" ", F.transform(spans, lambda s: s["__text"])).alias("dedup_text"),
            F.sum("__n").cast("bigint").alias("n_kept_tokens"),
        )
    )

# equality check
a = sorted(tuple(r) for r in window_dedup_rewrite(docs).collect())
spark.catalog.clearCache()
b = sorted(tuple(r) for r in rewrite_one_shuffle(docs).collect())
spark.catalog.clearCache()
print("MATCH:", a == b, "rows:", len(a), len(b))

def t3(mk):
    best = None
    for _ in range(3):
        t0 = time.time()
        mk().write.format("noop").mode("overwrite").save()
        best = time.time()-t0 if best is None else min(best, time.time()-t0)
        spark.catalog.clearCache()
    return round(best, 3)

print(json.dumps({
    "rewrite_current": t3(lambda: window_dedup_rewrite(docs)),
    "rewrite_one_shuffle": t3(lambda: rewrite_one_shuffle(docs)),
}))
# plan shape: count exchanges carrying __text
for nm, mk in [("current", window_dedup_rewrite), ("one_shuffle", rewrite_one_shuffle)]:
    plan = mk(docs)._jdf.queryExecution().executedPlan().toString()
    n_ex = plan.count("Exchange")
    print(nm, "exchanges-in-plan:", n_ex)
