"""matchmerge vs pandas.merge — differential semantics on random inputs
(the generalization of the reference's fixed examples), plus the
auto-broadcast strategy switch."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etlutils_spark.operators.matchmerge import matchmerge

SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

keys = st.integers(0, 6)


@SET
@given(
    st.lists(st.tuples(keys, st.integers(0, 99)), min_size=1, max_size=12),
    st.lists(keys, min_size=1, max_size=7, unique=True),
    st.booleans(),
)
def test_matchmerge_matches_pandas_merge(spark, left_rows, right_keys, all_x):
    left = pd.DataFrame(left_rows, columns=["k", "v"])
    right = pd.DataFrame({"k": right_keys, "w": [f"w{k}" for k in right_keys]})
    x = spark.createDataFrame(left)
    y = spark.createDataFrame(right)
    got = matchmerge(x, y, by_x="k", by_y="k", all_x=all_x).toPandas()
    want = left.merge(right, on="k", how="left" if all_x else "inner")
    got_s = sorted(map(tuple, got.fillna("~").itertuples(index=False)))
    want_s = sorted(map(tuple, want.fillna("~").itertuples(index=False)))
    assert got_s == want_s


def test_matchmerge_auto_broadcast(star):
    from etlutils_spark.plans.checks import uses_broadcast_join

    out = matchmerge(
        star["lineitem"], star["part"], by_x="l_partkey", by_y="p_partkey",
        add_columns=["p_brand"], broadcast_right="auto",
    )
    assert uses_broadcast_join(out)  # part is tiny -> auto broadcasts


def test_matchmerge_auto_respects_disabled_threshold(spark, star):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = matchmerge(
            star["lineitem"], star["part"], by_x="l_partkey", by_y="p_partkey",
            add_columns=["p_brand"], broadcast_right="auto",
        )
        from etlutils_spark.plans.checks import physical_plan

        # no broadcast hint was injected; with broadcasting disabled the
        # planner must fall back to a shuffle join
        assert "BroadcastHashJoin" not in physical_plan(out)
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )