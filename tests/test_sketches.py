from pyspark.sql import functions as F

from etlutils_spark.operators.sketches import approx_distinct, approx_quantiles


def test_approx_distinct_within_rsd(star):
    exact = {
        r.c_mktsegment: r.n
        for r in star["customer"].groupBy("c_mktsegment")
        .agg(F.countDistinct("c_custkey").alias("n")).collect()
    }
    approx = {
        r.c_mktsegment: r.approx_distinct
        for r in approx_distinct(star["customer"], ["c_mktsegment"], "c_custkey").collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 0.1 * n), (k, approx[k], n)


def test_approx_quantiles_bracket_exact(star):
    got = approx_quantiles(star["lineitem"], ["l_returnflag"], "l_quantity").collect()
    for r in got:
        q25, q50, q75 = r.quantiles
        assert 1 <= q25 <= q50 <= q75 <= 50
