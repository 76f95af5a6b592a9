#!/usr/bin/env python3
"""Round-14 probe: where does q5_nation_revenue spend its time, and does
the q1 two-level scaled-long aggregation pay there too?

Variants (identical join tree, noop sink, min-of-N, clearCache between
reps — bench methodology):
  registered : dsum = sum(cast(x as decimal(38,6))).cast(double)
  double     : plain double sum (NOT a candidate — rounding differs;
               this bounds the aggregation tax)
  two_level  : q1's design — per-(group, spark_partition_id) partials of
               cast(x as decimal(38,6))*1e6 as long, decimal(32,0) merge,
               /1e6, cast double. Bit-identical to registered (same
               per-row rounding, integer adds associative).
  join_only  : joins + count only, no revenue sum (bounds the join cost)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etlutils_spark.session import get_session
from etlutils_spark.entry_queries import _t, dsum

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("REPS", "3"))


def base(spark):
    l = _t(spark, SF_DIR, "lineitem")
    o = _t(spark, SF_DIR, "orders")
    c = _t(spark, SF_DIR, "customer")
    n = _t(spark, SF_DIR, "nation")
    r = _t(spark, SF_DIR, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )


def v_registered(spark):
    return base(spark).groupBy("n_name", "r_name").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def v_double(spark):
    return base(spark).groupBy("n_name", "r_name").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def v_two_level(spark):
    m6 = F.lit(1000000).cast("decimal(7,0)")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    scaled = (rev.cast("decimal(38,6)") * m6).cast("long")
    part = (
        base(spark)
        .groupBy("n_name", "r_name", F.spark_partition_id().alias("__pid"))
        .agg(F.sum(scaled).alias("p_rev"), F.count(F.lit(1)).alias("n_rows"))
    )
    return part.groupBy("n_name", "r_name").agg(
        (F.sum(F.col("p_rev").cast("decimal(32,0)")) / m6)
        .cast("double")
        .alias("revenue"),
        F.sum("n_rows").alias("n_lines"),
    )


def v_join_only(spark):
    return base(spark).groupBy("n_name", "r_name").agg(
        F.count(F.lit(1)).alias("n_lines")
    )


def timeit(spark, name, fn):
    ts = []
    for _ in range(N):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"probe_q5:{name}")
        fn(spark).write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    print(f"{name:12s} min {min(ts):.3f}  all {[round(t,3) for t in ts]}", flush=True)
    return min(ts)


def main():
    spark = get_session()
    # warmup
    v_registered(spark).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    for name, fn in [
        ("registered", v_registered),
        ("two_level", v_two_level),
        ("double", v_double),
        ("join_only", v_join_only),
    ]:
        timeit(spark, name, fn)
    # exactness check: two_level vs registered tuples
    a = sorted(map(tuple, v_registered(spark).collect()))
    b = sorted(map(tuple, v_two_level(spark).collect()))
    print("two_level exact-tuple match:", a == b, flush=True)


if __name__ == "__main__":
    main()
