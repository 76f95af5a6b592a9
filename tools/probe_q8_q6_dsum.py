#!/usr/bin/env python3
"""Round-14 probe: does the q1/q5 two-level scaled-long aggregation pay
on q8_market_share (2 year groups, 2 conditional decimal sums) and
q6_revenue_forecast (1 group, 1 decimal sum over a pushed-filter scan)?

Same methodology as tools/probe_q5_dsum.py: identical join tree, noop
sink, min-of-N with clearCache between reps, plus an exact-tuple check
of each two-level variant against its registered form.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etlutils_spark.session import get_session
from etlutils_spark.entry_queries import dsum

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("REPS", "3"))

def m6():
    return F.lit(1000000).cast("decimal(7,0)")


def scaled(c):
    return (c.cast("decimal(38,6)") * m6()).cast("long")


def merged(p):
    return (F.sum(F.col(p).cast("decimal(32,0)")) / m6()).cast("double")


# ---- q8 -------------------------------------------------------------------

def q8_base(spark):
    from etlutils_spark.entry_queries import _t

    li = _t(spark, SF_DIR, "lineitem")
    p = _t(spark, SF_DIR, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    o = _t(spark, SF_DIR, "orders").filter(
        F.col("o_orderdate").between(
            F.to_timestamp(F.lit("1996-01-01")), F.to_timestamp(F.lit("1997-12-31"))
        )
    )
    r = _t(spark, SF_DIR, "region").filter(F.col("r_name") == "ASIA")
    n1 = _t(spark, SF_DIR, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cust_nationkey"))
    c = _t(spark, SF_DIR, "customer").join(
        F.broadcast(n1), F.col("c_nationkey") == F.col("cust_nationkey")
    ).select("c_custkey")
    n2 = _t(spark, SF_DIR, "nation").select(
        F.col("n_nationkey").alias("supp_nationkey"), F.col("n_name").alias("nation")
    )
    s = _t(spark, SF_DIR, "supplier").join(
        F.broadcast(n2), F.col("s_nationkey") == F.col("supp_nationkey")
    ).select("s_suppkey", "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(c), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(s), li.l_suppkey == F.col("s_suppkey"))
    )


def q8_registered(spark):
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dec = volume.cast("decimal(38,6)")
    return (
        q8_base(spark)
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("nation") == "NATION_3", dec).otherwise(
                        F.lit(0).cast("decimal(38,6)")
                    )
                ).cast("double")
                / F.sum(dec).cast("double")
            )
            .cast("double")
            .alias("mkt_share")
        )
    )


def q8_two_level(spark):
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    s_all = scaled(volume)
    s_promo = F.when(F.col("nation") == "NATION_3", s_all).otherwise(F.lit(0).cast("long"))
    part = (
        q8_base(spark)
        .groupBy(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            F.spark_partition_id().alias("__pid"),
        )
        .agg(F.sum(s_promo).alias("p_num"), F.sum(s_all).alias("p_den"))
    )
    return part.groupBy("o_year").agg(
        (merged("p_num") / merged("p_den")).cast("double").alias("mkt_share")
    )


# ---- q6 -------------------------------------------------------------------

def q6_base(spark):
    from etlutils_spark.entry_queries import _t

    li = _t(spark, SF_DIR, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )


def q6_registered(spark):
    return q6_base(spark).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q6_two_level(spark):
    part = q6_base(spark).groupBy(F.spark_partition_id().alias("__pid")).agg(
        F.sum(scaled(F.col("l_extendedprice") * F.col("l_discount"))).alias("p_rev"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return part.agg(
        merged("p_rev").alias("revenue"), F.sum("n_rows").alias("n_lines")
    )


def timeit(spark, name, fn):
    ts = []
    for _ in range(N):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"probe_q8_q6:{name}")
        fn(spark).write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    print(f"{name:16s} min {min(ts):.3f}  all {[round(t,3) for t in ts]}", flush=True)


def main():
    spark = get_session()
    for fn in (q8_registered, q6_registered):
        fn(spark).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    for name, fn in [
        ("q8_registered", q8_registered),
        ("q8_two_level", q8_two_level),
        ("q6_registered", q6_registered),
        ("q6_two_level", q6_two_level),
    ]:
        timeit(spark, name, fn)
    for qn, ref, new in [
        ("q8", q8_registered, q8_two_level),
        ("q6", q6_registered, q6_two_level),
    ]:
        a = sorted(map(tuple, ref(spark).collect()))
        b = sorted(map(tuple, new(spark).collect()))
        print(f"{qn} two_level exact-tuple match:", a == b, flush=True)


if __name__ == "__main__":
    main()
