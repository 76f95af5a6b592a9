"""read_sql/write_sql contract tests.

No JDBC driver jars ship in this environment, so the network path can't
execute; these tests pin the option-assembly and validation logic (the
part this layer owns — the wire protocol is Spark's JDBC source).
"""

import pytest

from etlutils_spark.sources.sql import ingest_to_parquet, read_sql


def test_read_sql_requires_exactly_one_source(spark):
    with pytest.raises(ValueError, match="exactly one"):
        read_sql(spark, url="jdbc:x", query="select 1", table="t")
    with pytest.raises(ValueError, match="exactly one"):
        read_sql(spark, url="jdbc:x")
    with pytest.raises(ValueError, match="url"):
        read_sql(spark, query="select 1")


def test_read_sql_partition_column_requires_table(spark):
    with pytest.raises(ValueError, match="partition_column requires table"):
        read_sql(
            spark, url="jdbc:x", query="select 1",
            partition_column="id", lower_bound=0, upper_bound=10,
        )


def test_read_sql_builds_jdbc_plan(spark):
    # without a driver the load itself fails at connect-time; the
    # reader must still assemble a jdbc relation (i.e., our option
    # plumbing reaches Spark's JDBC source, not an earlier error).
    with pytest.raises(Exception) as exc:
        read_sql(
            spark,
            url="jdbc:postgresql://nowhere:5432/db",
            table="t",
            partition_column="id",
            lower_bound=0,
            upper_bound=100,
            num_partitions=4,
            custom_schema="id BIGINT",
            fetchsize=5000,
        ).count()
    assert "driver" in str(exc.value).lower() or "connect" in str(exc.value).lower()


def test_ingest_to_parquet_append_mirrors_ffdf_grow(spark, star, tmp_path):
    out = str(tmp_path / "ing")
    first = star["region"]
    ingest_to_parquet(first, out, mode="overwrite")
    ingest_to_parquet(first, out, mode="append")  # the x= append path
    assert spark.read.parquet(out).count() == 2 * first.count()
