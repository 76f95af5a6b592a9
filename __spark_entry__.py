"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship slice at sf0.001; ``queries()`` /
``oracle_sql()`` — the declared operator inventory (SURVEY.md §2) with
DuckDB oracles. Implementations live in ``etlutils_spark.entry_queries``
(and the extension modules it imports); this file is the thin, stable
driver-facing shim.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from etlutils_spark.entry_queries import REGISTRY  # noqa: E402
import etlutils_spark.relational_queries  # noqa: E402,F401  (registers into REGISTRY)
import etlutils_spark.extension_queries  # noqa: E402,F401  (registers into REGISTRY)
import etlutils_spark.event_queries  # noqa: E402,F401  (registers into REGISTRY)
import etlutils_spark.udf_queries  # noqa: E402,F401  (registers into REGISTRY)
import etlutils_spark.pipeline_queries  # noqa: E402,F401  (registers into REGISTRY)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: chunked ingest -> broadcast lookup join (matchmerge) ->
    decimal-exact revenue rollup per brand. Mirrors the reference's
    flagship read.dbi.ffdf + matchmerge flow (R/ffsql.R:53-65,
    R/matchmerge.R:81-94) on the sf0.001 star."""
    from pyspark.sql import functions as F

    from etlutils_spark.operators.matchmerge import matchmerge
    from etlutils_spark.sources.files import read_table

    sf_dir = "/root/testdata/sf0.001"
    li = read_table(spark, "lineitem", sf_dir)
    part = read_table(spark, "part", sf_dir)
    joined = matchmerge(li, part, by_x="l_partkey", by_y="p_partkey",
                        add_columns=["p_brand"])
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
    return (
        joined.groupBy("p_brand")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("p_brand")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _oracle) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: oracle
        for name, (_fn, oracle) in REGISTRY.items()
        if oracle is not None
    }
