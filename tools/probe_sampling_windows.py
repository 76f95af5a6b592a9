#!/usr/bin/env python3
"""Round-14 probe: mixture_resample / temperature_resample rate
computation as unpartitioned windows vs the crossJoin(broadcast(agg))
form. The crossJoin form re-plans and re-runs the tiny counts
aggregation once per derived scalar (tot/feas) — several sequential
fixed-cost jobs; the windows keep one aggregation plus one
single-partition pass (guide §2.4).

Old forms are inlined verbatim from the pre-change sampling.py; outputs
are checked exact-tuple identical before timing. min-of-N noop with
clearCache between reps, same JVM.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etlutils_spark.operators.sampling import (
    _digest,
    _dyadic_pow,
    mixture_resample,
    temperature_resample,
)
from etlutils_spark.session import get_session
from etlutils_spark.sources.files import read_table

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("REPS", "3"))

# the registered queries' weights (pipeline_queries._MIX_WEIGHTS,
# copied — the module needs the full registry import chain)
_MIX_WEIGHTS = {"en": 0.25, "de": 0.25, "es": 0.2, "fr": 0.2, "zh": 0.1}


def mixture_old(df, weights, strata_col, key_col="doc_id", salt=""):
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(weights.items())],
        f"{strata_col} string, __wt double",
    )
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    joined = wdf.join(counts, strata_col, "left")
    tot = joined.agg(F.sum("__n").alias("__tot"))
    joined = joined.crossJoin(F.broadcast(tot))
    ok = F.assert_true(
        (F.col("__n").isNotNull() & (F.col("__n") > 0)) | F.col("__tot").isNull(),
        F.concat(F.lit("mixture_resample: weight stratum "), F.col(strata_col)),
    )
    joined = joined.select(
        strata_col, F.when(ok.isNull(), F.col("__n")).alias("__n"), "__wt"
    )
    feas = joined.agg(F.min(F.col("__n") / F.col("__wt")).alias("__total"))
    rates = joined.crossJoin(F.broadcast(feas)).select(
        strata_col,
        (F.col("__wt") * F.col("__total") / F.col("__n")).alias("__rate"),
    )
    prefix = F.conv(F.substring(_digest(key_col, salt), 1, 15), 16, 10).cast("long")
    threshold = F.floor(F.col("__rate") * F.lit(float(1 << 60))).cast("long")
    return df.join(F.broadcast(rates), strata_col).filter(prefix < threshold).drop("__rate")


def temperature_old(df, alpha, strata_col, key_col="doc_id", salt=""):
    q4 = (1.0 - alpha) * 4
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    pw = _dyadic_pow(F.col("__n").cast("double"), int(q4))
    pwc = counts.select(strata_col, pw.alias("__pw"))
    feas = pwc.agg(F.min("__pw").alias("__mn"))
    rates = pwc.crossJoin(F.broadcast(feas)).select(
        strata_col, (F.col("__mn") / F.col("__pw")).alias("__rate")
    )
    prefix = F.conv(F.substring(_digest(key_col, salt), 1, 15), 16, 10).cast("long")
    threshold = F.floor(F.col("__rate") * F.lit(float(1 << 60))).cast("long")
    return df.join(F.broadcast(rates), strata_col).filter(prefix < threshold).drop("__rate")


def timeit(spark, name, fn):
    ts = []
    for _ in range(N):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"probe_sampling:{name}")
        fn().write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    print(f"{name:20s} min {min(ts):.3f}  all {[round(t, 3) for t in ts]}", flush=True)


def main():
    spark = get_session()
    docs = read_table(spark, "documents", SF_DIR)
    proj = lambda d: d.select("doc_id", "lang", "source")

    forms = {
        "mixture_old": lambda: proj(mixture_old(docs, _MIX_WEIGHTS, "lang")),
        "mixture_new": lambda: proj(mixture_resample(docs, _MIX_WEIGHTS, strata_col="lang")),
        "temp_old": lambda: proj(temperature_old(docs, 0.5, "lang")),
        "temp_new": lambda: proj(temperature_resample(docs, alpha=0.5, strata_col="lang")),
    }

    for pair in (("mixture_old", "mixture_new"), ("temp_old", "temp_new")):
        a = sorted(map(tuple, forms[pair[0]]().collect()))
        b = sorted(map(tuple, forms[pair[1]]().collect()))
        print(f"{pair[1]} exact-tuple match vs old: {a == b} ({len(a)} rows)", flush=True)

    for name, fn in forms.items():
        fn().write.format("noop").mode("overwrite").save()  # warm
    spark.catalog.clearCache()
    for name, fn in forms.items():
        timeit(spark, name, fn)


if __name__ == "__main__":
    main()
