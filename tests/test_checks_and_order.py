import pytest
from pyspark.sql import functions as F

from etlutils_spark.operators.matchmerge import matchmerge
from etlutils_spark.plans.checks import DomainError, assert_levels
from etlutils_spark.sources.sql import ingest_to_parquet


def test_assert_levels_pass_and_fail(star):
    assert_levels(
        star["orders"], "o_orderstatus", ["O", "F", "P"]
    )  # passes silently (the levels= domain role, R/ffsql.R:190-200)
    with pytest.raises(DomainError, match="o_orderstatus"):
        assert_levels(star["orders"], "o_orderstatus", ["O", "F"])


def test_matchmerge_preserve_order(spark):
    x = spark.createDataFrame(
        [(3, "c"), (1, "a"), (2, "b"), (1, "a2")], "k int, v string"
    ).coalesce(1)
    y = spark.createDataFrame([(1, "Y1"), (2, "Y2"), (3, "Y3")], "k int, w string")
    out = matchmerge(x, y, by_x="k", by_y="k", all_x=True, preserve_order=True)
    got = [(r.k, r.v, r.w) for r in out.collect()]
    # x's row order survives the join (R/matchmerge.R:180-181)
    assert got == [(3, "c", "Y3"), (1, "a", "Y1"), (2, "b", "Y2"), (1, "a2", "Y1")]


def test_ingest_verbose_prints_rate(star, tmp_path, capsys):
    ingest_to_parquet(star["region"], str(tmp_path / "r"), verbose=True)
    out = capsys.readouterr().out
    assert "TOTAL=" in out and "rows/sec" in out
