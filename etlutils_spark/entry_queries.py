"""The engine's declared query inventory (driver contract).

Each entry: name -> (spark_fn, oracle_sql_or_None). ``spark_fn(spark,
sf_dir)`` returns a DataFrame; the oracle is equivalent ANSI SQL DuckDB
runs on the same parquet views. Column names are aliased identically on
both sides (the driver's compare sorts columns by name before hashing).

Float determinism: any order-dependent float aggregation (SUM/AVG over
doubles) is computed exactly via decimal — ``CAST(SUM(CAST(x AS
DECIMAL(38,6))) AS DOUBLE)`` on both engines — so values are bitwise
identical regardless of partitioning/row order. MIN/MAX/COUNT are
order-independent and stay native. This is not just an oracle trick: at
cluster scale it also makes results run-to-run deterministic, which
plain double summation is not.

Organization mirrors SURVEY.md §2:
- parity ops (the reference's own operators S/J/P/F groups);
- the delegated-SQL relational surface (§2.5-2.6: agg, window, sort,
  set ops, all join types) the reference pushes to a backend DB;
- scale extensions (dedup / similarity / text) in extension modules.
"""

from __future__ import annotations

from typing import Callable, Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etlutils_spark.operators.locf import na_locf_plus_one
from etlutils_spark.operators.matchmerge import matchmerge
from etlutils_spark.operators.recode import factor_levels, recode_column, rename_columns
from etlutils_spark.operators.transfun import trans_fun
from etlutils_spark.sources.files import read_table

QueryFn = Callable[[SparkSession, str], DataFrame]
REGISTRY: dict[str, tuple[QueryFn, Optional[str]]] = {}


def register(name: str, oracle: Optional[str]):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # driver-contract queries must run in ANY session (the grading
    # driver builds its own): ship the package to Python workers once
    from etlutils_spark.session import export_package_to_workers

    export_package_to_workers(spark)
    return read_table(spark, name, sf_dir)


# exact decimal-sum helpers (see module docstring)
def dsum(col: F.Column, alias: str, scale: int = 6) -> F.Column:
    return F.sum(col.cast(f"decimal(38,{scale})")).cast("double").alias(alias)


def davg(col: F.Column, alias: str, scale: int = 6) -> F.Column:
    return (
        F.sum(col.cast(f"decimal(38,{scale})")).cast("double")
        / F.count(col)
    ).alias(alias)


def DSUM(expr: str, alias: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,{scale}))) AS DOUBLE) AS {alias}"


def DAVG(expr: str, alias: str, scale: int = 6) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(38,{scale}))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


# ---------------------------------------------------------------------------
# Parity group — the reference's own operators (SURVEY §2.1-2.4)
# ---------------------------------------------------------------------------

@register(
    "ingest_limit",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 1000
    """,
)
def q_ingest_limit(spark, sf_dir):
    """S1-S3 + nrows row cap (R/ffsql.R:277-282 -> df.limit).

    The reference's flagship example streams `select * from testdata
    limit 10000` (R/ffsql.R:53-57); here the scan is parquet and the
    limit is made deterministic with a total ORDER BY on the unique key.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(1000)
    )


@register(
    "matchmerge_inner",
    """
    SELECT l.*, p.p_brand, p.p_retailprice
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def q_matchmerge_inner(spark, sf_dir):
    """J1 inner mode (R/matchmerge.R:136-145): fact ⋈ unique-key dim,
    right-side projection (add_columns), broadcast hash join."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return matchmerge(li, part, by_x="l_partkey", by_y="p_partkey",
                      add_columns=["p_brand", "p_retailprice"])


@register(
    "matchmerge_left",
    """
    SELECT o.*, c.c_name, c.c_mktsegment
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_matchmerge_left(spark, sf_dir):
    """J1 left-outer mode (all.x=TRUE, R/matchmerge.R:40-43): NA-fill
    for non-matches."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return matchmerge(orders, cust, by_x="o_custkey", by_y="c_custkey",
                      all_x=True, add_columns=["c_name", "c_mktsegment"])


@register(
    "matchmerge_expr_key",
    """
    SELECT c.*, n.n_name
    FROM customer c
    JOIN nation n ON concat('N', CAST(c.c_nationkey AS VARCHAR))
                   = concat('N', CAST(n.n_nationkey AS VARCHAR))
    """,
)
def q_matchmerge_expr_key(spark, sf_dir):
    """J1b expression keys (by.iskey=TRUE, R/matchmerge.R:127-161):
    join on arbitrary Column expressions, not stored columns."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return matchmerge(
        cust, nation,
        by_x_expr=F.concat(F.lit("N"), F.col("c_nationkey").cast("string")),
        by_y_expr=F.concat(F.lit("N"), F.col("n_nationkey").cast("string")),
        add_columns=["n_name"],
    )


@register(
    "matchmerge_composite_key",
    """
    SELECT e.*, p.value AS purchase_value
    FROM events e
    JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND e.ts = p.ts
    """,
)
def q_matchmerge_composite_key(spark, sf_dir):
    """J1a composite keys (R/matchmerge.R:113-126): multi-column join.
    The reference space-concatenates the key columns into one string; we
    join on the column tuple (documented divergence — avoids type
    coercion and keeps sargable per-column predicates)."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    return matchmerge(
        ev, purchases, by_x=["user_id", "ts"], by_y=["user_id", "ts"],
        add_columns=["value"],
    ).withColumnRenamed("value_y", "purchase_value")


@register(
    "matchmerge_paste_key",
    """
    WITH x AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_custkey % 7 = 0 THEN NULL
                  ELSE CAST(o_custkey % 3 AS INTEGER) END AS tier
      FROM orders),
    y AS (
      SELECT CAST(c_custkey AS DOUBLE) AS cust_d,
             CASE WHEN c_custkey % 7 = 0 THEN NULL
                  ELSE CAST(c_custkey % 3 AS INTEGER) END AS tier,
             c_name
      FROM customer),
    kx AS (
      SELECT o_orderkey, o_custkey, tier,
             concat_ws(' ',
               COALESCE(CAST(o_custkey AS VARCHAR), 'NA'),
               COALESCE(CAST(tier AS VARCHAR), 'NA')) AS pk
      FROM x),
    ky AS (
      SELECT c_name,
             concat_ws(' ',
               COALESCE(CASE WHEN cust_d = floor(cust_d)
                             THEN CAST(CAST(cust_d AS BIGINT) AS VARCHAR)
                             ELSE CAST(cust_d AS VARCHAR) END, 'NA'),
               COALESCE(CAST(tier AS VARCHAR), 'NA')) AS pk
      FROM y)
    SELECT kx.o_orderkey, kx.o_custkey, kx.tier, ky.c_name
    FROM kx JOIN ky USING (pk)
    """,
)
def q_matchmerge_paste_key(spark, sf_dir):
    """paste_keys=True parity mode (R/matchmerge.R:113-126): the
    composite (custkey, tier) key joins as R's space-pasted string —
    the DOUBLE-typed right custkey coerces to the same text as the
    left INT (integral doubles drop '.0', as.character-style), and the
    NULL tiers (custkey % 7 == 0) paste to literal 'NA' so they MATCH,
    where the default tuple join would drop every NULL-keyed row. The
    oracle rebuilds the same coerced key in DuckDB, so the join
    semantics are verified against an independent engine."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.when(F.col("o_custkey") % 7 == 0, F.lit(None))
        .otherwise((F.col("o_custkey") % 3).cast("int")).alias("tier"),
    )
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("double").alias("cust_d"),
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None))
        .otherwise((F.col("c_custkey") % 3).cast("int")).alias("tier"),
        "c_name",
    )
    return matchmerge(
        orders, cust, by_x=["o_custkey", "tier"], by_y=["cust_d", "tier"],
        add_columns=["c_name"], paste_keys=True,
    )


@register(
    "matchmerge_vector_y",
    """
    SELECT c.c_custkey, c.c_name, k.o_custkey AS ordered_key
    FROM customer c
    LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) k
      ON c.c_custkey = k.o_custkey
    """,
)
def q_matchmerge_vector_y(spark, sf_dir):
    """Vector-y mode (R/matchmerge.R:32-34,100-110,175-178): y is a bare
    key vector (single-column DataFrame); the carried value is the key
    itself relabeled to add_columns[0], NULL where unmatched — 'which of
    my customers ever ordered, by key'."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    keys = _t(spark, sf_dir, "orders").select("o_custkey").distinct()
    return matchmerge(
        cust, keys, by_x="c_custkey", by_y="o_custkey",
        all_x=True, add_columns=["ordered_key"],
    )


@register(
    "fuzzy_matchmerge_segments",
    """
    WITH dirty AS (
      SELECT c_custkey, concat('Z', substring(c_mktsegment, 2)) AS seg_dirty
      FROM customer),
    dict AS (SELECT DISTINCT c_mktsegment AS segment FROM customer),
    cand AS (
      SELECT d.c_custkey, d.seg_dirty, t.segment,
             CAST(levenshtein(d.seg_dirty, t.segment) AS INTEGER) AS distance
      FROM dirty d JOIN dict t
        ON abs(length(d.seg_dirty) - length(t.segment)) <= 1
       AND levenshtein(d.seg_dirty, t.segment) <= 1)
    SELECT c_custkey, seg_dirty, segment, distance FROM cand
    QUALIFY row_number() OVER (PARTITION BY c_custkey ORDER BY distance, segment) = 1
    """,
)
def q_fuzzy_matchmerge(spark, sf_dir):
    """Fuzzy lookup join: every customer's segment is deterministically
    corrupted (first char -> 'Z') and fuzzy-matched back against the
    clean segment dictionary at edit distance <= 1 — the data-cleaning
    recode exact `recoder` can't do. Broadcast nested-loop with a
    length-band prune; best match per customer."""
    from etlutils_spark.operators.matchmerge import fuzzy_matchmerge

    dirty = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.concat(F.lit("Z"), F.substring("c_mktsegment", 2, 100)).alias("seg_dirty"),
    )
    dict_df = (
        _t(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("segment"))
        .distinct()
    )
    return fuzzy_matchmerge(
        dirty, dict_df, by_x="seg_dirty", by_y="segment",
        max_distance=1, row_key="c_custkey",
    )


@register(
    "recode_mktsegment",
    """
    SELECT CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 'CARS'
                WHEN c_mktsegment = 'BUILDING' THEN 'CONSTRUCTION'
                ELSE c_mktsegment END AS segment,
           COUNT(*) AS n_customers
    FROM customer GROUP BY 1
    """,
)
def q_recode_mktsegment(spark, sf_dir):
    """F1 recoder (R/utils.R:24-32): listed values remap, unseen values
    pass through unchanged, NULL -> NULL."""
    cust = _t(spark, sf_dir, "customer")
    out = recode_column(cust, "c_mktsegment",
                        ["AUTOMOBILE", "BUILDING"], ["CARS", "CONSTRUCTION"])
    return (out.groupBy(F.col("c_mktsegment").alias("segment"))
            .agg(F.count(F.lit(1)).alias("n_customers")))


@register(
    "rename_project",
    """
    SELECT p_partkey AS part_id, p_name AS part_name, p_retailprice AS price
    FROM part
    """,
)
def q_rename_project(spark, sf_dir):
    """P1 renameColumns (R/utils.R:71-80)."""
    part = _t(spark, sf_dir, "part")
    out = rename_columns(part, ["p_partkey", "p_name", "p_retailprice"],
                         ["part_id", "part_name", "price"])
    return out.select("part_id", "part_name", "price")


@register(
    "factor_levels_brand",
    "SELECT DISTINCT p_brand FROM part WHERE p_brand IS NOT NULL",
)
def q_factor_levels_brand(spark, sf_dir):
    """F3/F4 factorise: the observable factor artifact — the sorted
    level dictionary of a string column (SURVEY §1.2)."""
    return factor_levels(_t(spark, sf_dir, "part"), "p_brand")


@register(
    "locf_events",
    """
    WITH base AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts2,
             CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
      FROM events
    ), m AS (
      SELECT event_id, user_id, ts2, v,
             CASE WHEN v IS NULL THEN 1 ELSE 0 END AS isna,
             last_value(v IGNORE NULLS) OVER win AS locf,
             SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) OVER win AS ix
      FROM base
      WINDOW win AS (PARTITION BY user_id ORDER BY ts2, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id,
           locf + ix - COALESCE(MAX(ix * (1 - isna)) OVER win2, 0) AS value_filled
    FROM m
    WINDOW win2 AS (PARTITION BY user_id ORDER BY ts2, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_locf_events(spark, sf_dir):
    """F2 naLOCFPlusone (R/utils.R:49-52) over the events series:
    every 5th event's value nulled, then LOCF + position-in-run filled,
    per user_id ordered by (ts, event_id). Golden semantics
    c(2,NA,NA,4,5,2,NA)->c(2,3,4,4,5,2,3) (R/utils.R:45-48)."""
    ev = _t(spark, sf_dir, "events")
    ev = ev.withColumn(
        "v", F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(F.col("value"))
    )
    out = na_locf_plus_one(ev, "v", order_by=["ts", "event_id"],
                           partition_by="user_id", output_col="value_filled")
    return out.select("event_id", "user_id", "value_filled")


@register(
    "transfun_derived_date",
    """
    SELECT o_orderkey, o_orderdate,
           o_orderdate - INTERVAL 7 DAY AS week_ago
    FROM orders
    """,
)
def q_transfun_derived_date(spark, sf_dir):
    """P3/§2.8 transFUN -> mapInPandas: per-batch pandas transform adding
    a derived date column, mirroring the reference example
    (R/ffsql.R:72-76: x$b - subtractdays)."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")

    def add_week_ago(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["week_ago"] = pdf["o_orderdate"] - pd.Timedelta(days=7)
        return pdf

    return trans_fun(
        orders, add_week_ago,
        schema="o_orderkey bigint, o_orderdate timestamp, week_ago timestamp",
    )


@register(
    "append_union",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_append_union(spark, sf_dir):
    """The x= append-to-existing path (R/ffsql.R:26-27,133-135,267-272):
    UNION ALL by construction -> unionByName."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    first = orders.filter(F.col("o_orderstatus") == "O")
    second = orders.filter(F.col("o_orderstatus") == "F")
    return first.unionByName(second)
