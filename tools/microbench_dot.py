#!/usr/bin/env python3
"""Micro-benchmark: decimal accumulator width in the exact dot fold.

Times the dot_exact expression shape at three accumulator types over
the same synthetic all-pairs workload (pairs of 64-dim float vectors),
and cross-checks values bit-for-bit between the variants on the REAL
embeddings table. Decision evidence for OPTIMIZATION_r13.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etlutils_spark.session import get_session

N = int(os.environ.get("N_VECS", "1500"))
SF = os.environ.get("SF_DIR", "/root/testdata/sf0.1")


def dot_with(dec: str, a, b):
    prods = F.zip_with(a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(dec))
    s = F.aggregate(
        prods,
        F.lit(0).cast(dec),
        lambda acc, v: (acc + F.coalesce(v, F.lit(0).cast(dec))).cast(dec),
    )
    any_pair = F.exists(
        F.zip_with(a, b, lambda x, y: x.isNotNull() & y.isNotNull()), lambda t: t
    )
    return F.when(any_pair, s).cast("double")


def main() -> None:
    spark = get_session("microbench_dot")
    print("ansi:", spark.conf.get("spark.sql.ansi.enabled"))
    # synthetic all-pairs: N x N/4 pairs of 64-dim unit-ish vectors
    base = spark.range(N).select(
        "id",
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (F.pmod(F.xxhash64(F.col("id") * 64 + i), F.lit(1000)).cast("double") / 500.0 - 1.0).cast("float"),
        ).alias("v"),
    )
    a = base.select(F.col("id").alias("ida"), F.col("v").alias("va"))
    b = base.filter(F.col("id") % 4 == 0).select(
        F.col("id").alias("idb"), F.col("v").alias("vb")
    )
    pairs = a.crossJoin(F.broadcast(b))
    pairs.persist().count()

    for label, dec in [("dec30", "decimal(30,12)"), ("dec18", "decimal(18,12)")]:
        for attempt in range(3):
            t0 = time.time()
            pairs.select(
                dot_with(dec, F.col("va"), F.col("vb")).alias("d")
            ).write.format("noop").mode("overwrite").save()
            print(f"{label} run{attempt}: {time.time()-t0:.2f}s", flush=True)

    # value cross-check on the real table: all-pairs dot, both widths
    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    e1 = emb.select(F.col("vec_id").alias("i"), F.col("embedding").alias("x"))
    e2 = emb.select(F.col("vec_id").alias("j"), F.col("embedding").alias("y"))
    both = (
        e1.join(F.broadcast(e2.limit(200)), F.col("i") < F.col("j"))
        .select(
            "i", "j",
            dot_with("decimal(30,12)", F.col("x"), F.col("y")).alias("d30"),
            dot_with("decimal(18,12)", F.col("x"), F.col("y")).alias("d18"),
        )
        .filter(
            (F.col("d30") != F.col("d18"))
            | (F.col("d30").isNull() != F.col("d18").isNull())
        )
    )
    n_diff = both.count()
    print(f"value mismatches on real embeddings (200-col band): {n_diff}")
    spark.stop()


if __name__ == "__main__":
    main()
