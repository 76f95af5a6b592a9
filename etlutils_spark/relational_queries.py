"""The delegated-SQL relational surface (SURVEY §2.5-2.6, §4.1).

The reference implements no aggregation/window/sort/set-op of its own —
it ships an opaque SQL string to the backend database (R/ffsql.R:20,
171-176). Capability parity therefore means exposing Spark's full
relational engine; each query here is a first-class, oracle-checked
pass-through. Float aggregations use the decimal-exact pattern from
``entry_queries`` so results are bitwise deterministic at any
partitioning (and any cluster size).

Scale notes are attached per query: these shapes are the ones whose
plans matter at 100 TB (partial aggregation, broadcast vs shuffle join
choice, single window pass, AQE skew handling).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etlutils_spark.caching import persist_tracked
from etlutils_spark.entry_queries import DAVG, DSUM, _t, davg, dsum, register

CUTOFF = "1999-01-01"


@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {DSUM('l_quantity', 'sum_qty')},
           {DSUM('l_extendedprice', 'sum_base_price')},
           {DSUM('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {DSUM('(l_extendedprice * (1 - l_discount)) * (1 + l_tax)', 'sum_charge')},
           {DAVG('l_quantity', 'avg_qty')},
           {DAVG('l_extendedprice', 'avg_price')},
           {DAVG('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{CUTOFF} 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan-filter-aggregate over the fact table.

    Scale: the parquet scan prunes to 7 columns and pushes the
    shipdate filter down; aggregation is the two-level scaled-long
    design (optimization guide §2.3 "narrower types"): the registered
    DSUM contract is ``CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)``,
    and a decimal(38,6) value IS an integer count of 10^-6 units — so
    level 1 accumulates ``CAST(x AS DECIMAL(38,6)) * 10^6`` as plain
    int64 (codegen long adds instead of per-row decimal-38 buffer
    updates) per (group, scan partition), and level 2 merges the
    per-partition partials in decimal(38,0) where int64 could overflow,
    rescaling once at the end (`/ 10^6` is exact: the dividend is an
    integer, the result type decimal(38,6)). Values are bit-identical
    to the single-level decimal aggregate at ANY data/partitioning
    because the per-row rounding is the same ``cast(x as
    decimal(38,6))`` expression and integer addition is associative;
    pinned vs the decimal reference at shuffle.partitions {1,7,32} x 2
    input partitionings (tests/test_relational.py).

    Overflow bound, level 1: a per-(group, partition) partial of
    scaled longs wraps only past 9.2e18 micro-units; at the TPC-H
    value ceiling (~1.1e5 -> 1.1e11 scaled per row for sum_charge)
    that is ~8e7 rows per scan partition — a ~6 GB split at ~100 B/row,
    6x above even an aggressive 1 GB maxPartitionBytes. Level 2 is
    decimal(38,0): no practical bound (1e38 micro-units). The extra
    exchange carries |groups| x |scan partitions| metadata-sized rows.

    Measured (sf0.1, local[32], idle, min-of-3 noop): 1.27-1.60 s
    (decimal single-level, same JVMs) -> 0.87 s.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    m6 = F.lit(1000000).cast("decimal(7,0)")

    def scaled(c: F.Column) -> F.Column:
        # same rounding as the DSUM contract's cast(x as decimal(38,6)):
        # the multiply by 10^6 is exact (result scale stays 6, value
        # integer), the long cast truncates an already-integral value
        return (c.cast("decimal(38,6)") * m6).cast("long")

    part = (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit(CUTOFF)))
        .groupBy(
            "l_returnflag",
            "l_linestatus",
            F.spark_partition_id().alias("__pid"),
        )
        .agg(
            F.sum(scaled(F.col("l_quantity"))).alias("p_qty"),
            F.sum(scaled(F.col("l_extendedprice"))).alias("p_price"),
            F.sum(scaled(disc_price)).alias("p_disc_price"),
            F.sum(scaled(charge)).alias("p_charge"),
            F.sum(scaled(F.col("l_discount"))).alias("p_disc"),
            F.count(F.col("l_quantity")).alias("n_qty"),
            F.count(F.col("l_extendedprice")).alias("n_price"),
            F.count(F.col("l_discount")).alias("n_disc"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )

    def merged(p: str) -> F.Column:
        # decimal merge stage: sum(decimal(32,0)) -> decimal(38,0);
        # / 10^6 yields decimal(38,6) exactly, then the same
        # decimal->double cast the DSUM contract performs
        return (F.sum(F.col(p).cast("decimal(32,0)")) / m6).cast("double")

    return part.groupBy("l_returnflag", "l_linestatus").agg(
        merged("p_qty").alias("sum_qty"),
        merged("p_price").alias("sum_base_price"),
        merged("p_disc_price").alias("sum_disc_price"),
        merged("p_charge").alias("sum_charge"),
        (merged("p_qty") / F.sum("n_qty")).alias("avg_qty"),
        (merged("p_price") / F.sum("n_price")).alias("avg_price"),
        (merged("p_disc") / F.sum("n_disc")).alias("avg_disc"),
        F.sum("n_rows").alias("count_order"),
    )


@register(
    "q3_top_revenue_orders",
    f"""
    SELECT l.l_orderkey,
           {DSUM('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '{CUTOFF} 00:00:00'
      AND l.l_shipdate > TIMESTAMP '{CUTOFF} 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q3_top_revenue_orders(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter -> fact joins -> top-k.

    Scale: customer (filtered) broadcasts into orders; orders->lineitem
    is the only big join (co-partitioned on orderkey at the shuffle).
    Top-k is a TakeOrderedAndProject — no global sort materialization.
    """
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.to_timestamp(F.lit(CUTOFF)))
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.to_timestamp(F.lit(CUTOFF)))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_nation_revenue",
    f"""
    SELECT n.n_name, r.r_name,
           {DSUM('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
)
def q5_nation_revenue(spark, sf_dir):
    """TPC-H Q5 shape: star join up the dimension hierarchy.

    Scale: nation/region/customer broadcast (dims); the only shuffled
    join is lineitem⋈orders on orderkey. Group key is low-cardinality —
    partial agg collapses the shuffle to ~|nations| rows per task.

    The revenue sum is the same two-level scaled-long design as q1
    (guide §2.3 "narrower types"): level 1 accumulates
    ``cast(x as decimal(38,6)) * 10^6`` as int64 per (group,
    spark_partition_id) — the per-row rounding IS the DSUM contract's
    own decimal cast — level 2 merges in decimal(32,0)->decimal(38,0)
    and rescales once, so values are bit-identical to the single-level
    decimal aggregate at any partitioning (integer addition is
    associative; pinned in tests/test_plans.py alongside q1's
    proof). Overflow bound identical to q1's (level-1 partials wrap
    only past ~8e7 rows per partition). Group cardinality is |nation|
    (~25), so the extra exchange carries |groups| x |partitions|
    metadata rows. Measured (sf0.1, local[32], same JVM, min-of-3
    noop): decimal 2.87 -> two-level 2.21 s (double ceiling 1.59,
    join-only floor 1.26).
    """
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    m6 = F.lit(1000000).cast("decimal(7,0)")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    scaled = (rev.cast("decimal(38,6)") * m6).cast("long")
    part = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name", F.spark_partition_id().alias("__pid"))
        .agg(F.sum(scaled).alias("p_rev"), F.count(F.lit(1)).alias("n_rows"))
    )
    return part.groupBy("n_name", "r_name").agg(
        (F.sum(F.col("p_rev").cast("decimal(32,0)")) / m6)
        .cast("double")
        .alias("revenue"),
        F.sum("n_rows").alias("n_lines"),
    )


@register(
    "window_topk_per_customer",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 2
    """,
)
def q_window_topk_per_customer(spark, sf_dir):
    """Top-K per group — the canonical window pattern (SURVEY §2.6).

    Scale: one shuffle on the partition key, one in-memory sort per
    partition; rn<=2 filter is pushed into the window via
    WindowGroupLimit in recent Spark (no full materialization).
    """
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice",
                 F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 2)
    )


@register(
    "window_running_spend",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER win AS DOUBLE)
             AS running_spend,
           lag(o_totalprice) OVER win AS prev_price
    FROM orders
    WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_window_running_spend(spark, sf_dir):
    """Running aggregate + lag in one window pass (the generalization of
    the reference's only windowed computation, F2's cumsum/cummax,
    R/utils.R:49-52). Decimal accumulator -> order-independent exact."""
    o = _t(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, 0))
    wl = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).over(w)
        .cast("double").alias("running_spend"),
        F.lag("o_totalprice").over(wl).alias("prev_price"),
    )


@register(
    "agg_rollup",
    f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
           {DSUM('l_quantity', 'sum_qty')}
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark, sf_dir):
    """ROLLUP hierarchy subtotals (delegated-SQL surface)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_items"), dsum(F.col("l_quantity"), "sum_qty"))
    )


@register(
    "agg_cube",
    f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           {DSUM('o_totalprice', 'total')}
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_agg_cube(spark, sf_dir):
    """CUBE over two dimensions."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dsum(F.col("o_totalprice"), "total")
    )


@register(
    "set_intersect",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_set_intersect(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


@register(
    "set_except",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_set_except(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.subtract(b)  # EXCEPT (distinct) semantics, matching SQL EXCEPT


@register(
    "semi_join_customers",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > 400000)
    """,
)
def q_semi_join_customers(spark, sf_dir):
    """LEFT SEMI — the standalone form of matchmerge's inner-join
    pre-filter (J1c, R/matchmerge.R:136-145)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


@register(
    "anti_join_customers",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderstatus = 'P')
    """,
)
def q_anti_join_customers(spark, sf_dir):
    """LEFT ANTI — not expressible in the reference (delegated to SQL)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


@register(
    "distinct_agg_segments",
    f"""
    SELECT c_mktsegment, COUNT(*) AS n_customers,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           {DAVG('c_acctbal', 'avg_bal')}
    FROM customer GROUP BY c_mktsegment
    """,
)
def q_distinct_agg_segments(spark, sf_dir):
    """COUNT DISTINCT alongside plain aggregates (expand-based plan).

    Scale: for approximate needs at 100 TB use approx_count_distinct
    (HLL, single pass, no expand) — kept exact here for the oracle.
    """
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        davg(F.col("c_acctbal"), "avg_bal"),
    )


@register(
    "scalar_funcs_projection",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_month,
           upper(o_orderpriority) AS prio_uc,
           substring(o_orderpriority, 1, 1) AS prio_code,
           length(o_orderpriority) AS prio_len,
           concat(o_orderstatus, '-', substring(o_orderpriority, 1, 1)) AS status_prio
    FROM orders
    """,
)
def q_scalar_funcs_projection(spark, sf_dir):
    """String/date scalar function library (absent from the reference —
    R base provides it, SURVEY §2.4; pyspark.sql.functions here)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.upper("o_orderpriority").alias("prio_uc"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.length("o_orderpriority").cast("bigint").alias("prio_len"),
        F.concat_ws("-", "o_orderstatus", F.substring("o_orderpriority", 1, 1))
        .alias("status_prio"),
    )


@register(
    "pivot_status_counts",
    """
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_pivot_status_counts(spark, sf_dir):
    """Pivot (wide conditional aggregation). Spark's .pivot() with an
    explicit value list — no extra pass to discover labels."""
    o = _t(spark, sf_dir, "orders")
    out = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).alias("n_open"),
        F.coalesce(F.col("F"), F.lit(0)).alias("n_filled"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_pending"),
    )


@register(
    "window_rank_functions",
    """
    SELECT o_orderkey, o_custkey,
           CAST(dense_rank() OVER w AS BIGINT) AS drank,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           cume_dist() OVER w AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_window_rank_functions(spark, sf_dir):
    """Ranking-function suite: dense_rank / ntile / cume_dist share one
    window (single sort pass)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return o.select(
        "o_orderkey", "o_custkey",
        F.dense_rank().over(w).cast("bigint").alias("drank"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.cume_dist().over(w).alias("cdist"),
    )


@register(
    "stats_moments",
    f"""
    WITH m AS (
      SELECT l_returnflag, COUNT(*) AS n,
             {DSUM('l_quantity', 's')},
             {DSUM('l_quantity * l_quantity', 'ss')}
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n, s / n AS mean,
           (ss - s * s / n) / (n - 1) AS variance
    FROM m
    """,
)
def q_stats_moments(spark, sf_dir):
    """Mean/variance built from decimal-exact sum and sum-of-squares —
    statistical aggregation with bitwise-deterministic results (native
    stddev/var accumulate doubles in partition order and are neither
    cross-engine nor run-to-run stable at scale)."""
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(q, "s"),
        dsum(q * q, "ss"),
    )
    return m.select(
        "l_returnflag", "n",
        (F.col("s") / F.col("n")).alias("mean"),
        ((F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1))
        .alias("variance"),
    )


@register(
    "collect_sorted_sizes",
    """
    SELECT p_brand,
           array_to_string(list_sort(list(DISTINCT p_size)), ',') AS sizes
    FROM part GROUP BY p_brand
    """,
)
def q_collect_sorted_sizes(spark, sf_dir):
    """Array aggregation made deterministic: collect -> distinct ->
    sort -> join to a string (collect_list order is partition-dependent;
    the sort makes it stable at any parallelism)."""
    p = _t(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.array_join(
            F.sort_array(F.array_distinct(F.collect_list("p_size"))), ","
        ).alias("sizes")
    )


@register(
    "json_extract_props",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
)
def q_json_extract_props(spark, sf_dir):
    """Semi-structured access: JSON path extraction from a string column
    (get_json_object — codegen'd, no Python)."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
    )


@register(
    "json_map_explode",
    """
    SELECT event_id, k AS prop_key,
           CAST(json_extract_string(props, '$.' || k) AS BIGINT) AS prop_value
    FROM events, UNNEST(json_keys(props)) AS t(k)
    """,
)
def q_json_map_explode(spark, sf_dir):
    """Semi-structured to relational: parse the JSON props column into a
    typed map and explode to (key, value) rows — from_json + explode,
    all JVM-side."""
    e = _t(spark, sf_dir, "events")
    parsed = e.select(
        "event_id",
        F.explode(F.from_json("props", "map<string,bigint>")).alias(
            "prop_key", "prop_value"
        ),
    )
    return parsed


@register(
    "explode_token_freq",
    """
    SELECT t AS token, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
    GROUP BY t
    ORDER BY n DESC, token
    LIMIT 20
    """,
)
def q_explode_token_freq(spark, sf_dir):
    """UDTF surface (SURVEY §2.8): explode/unnest — token frequency
    top-20. Scale: explode is pipelined (no materialized blow-up);
    the count groupBy does a partial-agg before its shuffle."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(20)
    )


_GROUPING_SETS_SQL = f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           {DSUM('o_totalprice', 'total')}
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


@register("grouping_sets_sql", _GROUPING_SETS_SQL)
def q_grouping_sets_sql(spark, sf_dir):
    """GROUPING SETS — identical query text on spark.sql and DuckDB
    (the delegated-SQL mode of the reference, §4.1)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_GROUPING_SETS_SQL)


@register(
    "percentile_quantity",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.5) AS p50,
           quantile_cont(l_quantity, 0.75) AS p75,
           MIN(l_quantity) AS min_q, MAX(l_quantity) AS max_q
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_percentile_quantity(spark, sf_dir):
    """Exact interpolated percentiles (l_quantity is integral-valued, so
    interpolation is exact in both engines). At 100 TB use
    percentile_approx (one-pass sketch) — kept exact for the oracle."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.25)).alias("p25"),
        F.percentile("l_quantity", F.lit(0.5)).alias("p50"),
        F.percentile("l_quantity", F.lit(0.75)).alias("p75"),
        F.min("l_quantity").alias("min_q"),
        F.max("l_quantity").alias("max_q"),
    )


@register(
    "having_filter",
    f"""
    SELECT o_custkey, COUNT(*) AS n_orders, {DSUM('o_totalprice', 'spend')}
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    """,
)
def q_having_filter(spark, sf_dir):
    """GROUP BY + HAVING (post-aggregation predicate)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum(F.col("o_totalprice"), "spend"))
        .filter(F.col("n_orders") >= 15)
    )


@register(
    "histogram_price_buckets",
    """
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
    FROM orders GROUP BY 1
    """,
)
def q_histogram_price_buckets(spark, sf_dir):
    """Numeric bucketing histogram (floor-division bucket keys)."""
    o = _t(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000).cast("bigint")
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


@register(
    "union_distinct_nations",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_union_distinct_nations(spark, sf_dir):
    """UNION (distinct) — completes the set-op family alongside
    UNION ALL / INTERSECT / EXCEPT."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


_CORRELATED_SQL = """
    SELECT p.p_partkey, p.p_brand, p.p_retailprice
    FROM part p
    WHERE p.p_retailprice > (
      SELECT 1.05 * (CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(38,6))) AS DOUBLE)
                    / COUNT(*))
      FROM part p2 WHERE p2.p_brand = p.p_brand)
"""


@register("correlated_subquery", _CORRELATED_SQL)
def q_correlated_subquery(spark, sf_dir):
    """Correlated scalar subquery (Catalyst decorrelates it into an
    aggregate + join — the rewrite the reference's backend DB would do,
    SURVEY §4.1). Identical SQL text on both engines; the inner mean is
    decimal-exact."""
    _t(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(_CORRELATED_SQL)


_DELEGATED_SQL = """
    SELECT c_mktsegment,
           COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_bal,
           MIN(c_acctbal) AS min_bal,
           MAX(c_acctbal) AS max_bal
    FROM customer
    WHERE c_acctbal > 0
    GROUP BY c_mktsegment
"""


@register("delegated_sql", _DELEGATED_SQL)
def q_delegated_sql(spark, sf_dir):
    """The reference's core mode of operation — an opaque SQL string
    executed verbatim (R/ffsql.R:20,171-176) — becomes spark.sql():
    the SAME query text runs on Spark and on the DuckDB oracle."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_DELEGATED_SQL)


_LATERAL_SQL = """
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n,
LATERAL (
  SELECT c_name, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 2
) t
"""


@register("lateral_topk_per_nation", _LATERAL_SQL)
def q_lateral_topk(spark, sf_dir):
    """LATERAL correlated table subquery (per-nation top-2 customers by
    balance) — the remaining delegated-SQL plan family (ROADMAP round-3
    candidate). The same query text runs verbatim on Spark and DuckDB.

    Scale: Catalyst decorrelates the lateral into a ranked window over
    the probe side — same physical shape as window_topk_per_customer —
    so the correlated LIMIT never executes per-outer-row."""
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_LATERAL_SQL)


# ---------------------------------------------------------------------------
# TPC-H breadth pack (round 2): the remaining canonical plan shapes the
# reduced star schema can express — conditional aggregation, EXISTS,
# disjunctive pushdown, HAVING-driven semi-join, uncorrelated scalar
# subquery + anti-join. Each is the representative of a plan family the
# engine must get right at 100 TB.
# ---------------------------------------------------------------------------


@register(
    "q6_revenue_forecast",
    f"""
    SELECT {DSUM('l_extendedprice * l_discount', 'revenue')},
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_forecast(spark, sf_dir):
    """TPC-H Q6 shape: the purest scan-filter-aggregate.

    Scale: every predicate is a pushable range filter (shipdate /
    discount / quantity all reach the parquet reader as PushedFilters,
    and row-group min/max stats skip most of a date-sorted layout); the
    global aggregate is a two-stage partial -> single-row final."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q4_priority_returns",
    """
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    """,
)
def q4_priority_returns(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS decorrelated to a left-semi join.

    Scale: the semi join carries only the join key from the fact side
    (no payload shuffle) and the date filter prunes the probe side
    before the exchange; count-by-priority is a 5-group partial agg."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1998-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1999-01-01")))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q10_returned_items",
    f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {DSUM('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
           c.c_acctbal
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: lost-revenue ranking of customers with returns.

    Scale: lineitem filters on returnflag before the orderkey join;
    customer and nation broadcast; top-20 is TakeOrderedAndProject.
    The orders->lineitem join is the only shuffle pair and shares the
    orderkey partitioning with q3/q18 (bucket both once, win thrice)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("1998-01-01"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("c_custkey", "c_name", "n_name", "revenue", "c_acctbal")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q14_promo_share",
    """
    SELECT CAST(100.0 * CAST(SUM(CAST(CASE WHEN p.p_type = 'ECONOMY'
                 THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END
               AS DECIMAL(38,6))) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
               AS DECIMAL(38,6))) AS DOUBLE) AS DOUBLE) AS economy_share,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-07-01 00:00:00'
    GROUP BY ALL
    """,
)
def q14_promo_share(spark, sf_dir):
    """TPC-H Q14 shape: conditional-aggregate revenue share.

    Scale: part broadcasts (dim), the date filter prunes the fact scan,
    and both sums come out of ONE pass — the CASE folds the two
    aggregations together, no second scan or self-join. Both sums are
    decimal-exact so the final division is bitwise deterministic."""
    p = _t(spark, sf_dir, "part")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1998-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-07-01")))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "ECONOMY", rev).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo.cast("decimal(38,6)")).cast("double")
                / F.sum(rev.cast("decimal(38,6)")).cast("double")
            ).alias("economy_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q18_large_volume_orders",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 180)
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 50
    """,
)
def q18_large_volume_orders(spark, sf_dir):
    """TPC-H Q18 shape: HAVING-derived per-order sum -> payload join.

    Scale: ONE partial-agg pass over lineitem (key + quantity only — no
    payload columns in the shuffle) produces both the HAVING filter AND
    the output sum: the grouped sum IS sum_qty, because the final group
    key contains o_orderkey and every other group column is
    functionally dependent on it through the joins. The r12 form
    re-scanned lineitem and re-aggregated the keeper rows after a
    semi-join — a second full pass over the fact table that computed a
    value the first pass already had (optimization guide §1.2/§2.4:
    don't compute things twice, remove shuffles outright). The >180
    keeper set is tiny, so it joins orders/customer broadcast-shaped,
    and the decimal sum is order-independent — identical values."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("q"))
        .filter(F.col("q") > 180)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice",
            F.col("q").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(50)
    )


@register(
    "q19_disjunctive_filter",
    f"""
    SELECT {DSUM('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 21)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 45
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_disjunctive_filter(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs across both join sides.

    Scale: Catalyst extracts the common single-side conjuncts — the
    part-side disjunction (brand+size) prunes the broadcast build, the
    quantity disjunction (1<=q<=40 hull) pushes to the fact scan — and
    evaluates the full residual predicate after the join. The OR never
    forces a cartesian or a triple scan."""
    p = _t(spark, sf_dir, "part")
    l = _t(spark, sf_dir, "lineitem")
    j = l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return j.filter(
        arm("Brand#12", 15, 1, 21)
        | arm("Brand#23", 30, 10, 30)
        | arm("Brand#34", 45, 20, 40)
    ).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q22_idle_rich_customers",
    """
    SELECT c.c_mktsegment, COUNT(*) AS n_custs,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(*)
        FROM customer c2 WHERE c2.c_acctbal > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c.c_mktsegment
    """,
)
def q22_idle_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape: uncorrelated scalar subquery + anti-join
    (above-average balance, no orders since the cutoff).

    Scale: the global average is a one-row broadcast (scalar subquery
    -> literal at execution); the NOT EXISTS is a left-anti join where
    only o_custkey shuffles from the orders side. Decimal-exact mean so
    the threshold is partition-count invariant."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01")))
        .select("o_custkey")
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("t")
        )
    )
    rich = c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("t")).drop("t")
    return (
        rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum(F.col("c_acctbal").cast("decimal(38,6)")).cast("double").alias("total_bal"),
        )
    )


@register(
    "q7_volume_shipping",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           {DSUM('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                           AND TIMESTAMP '1997-12-31 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: bidirectional nation-pair trade volume (two
    roles for the same dimension table).

    Scale: nation is joined TWICE under different aliases (supplier
    side and customer side) — both broadcast. The disjunctive pair
    filter can only be applied after both joins, but each single-nation
    membership (n_name IN (A,B)) is pushed into each broadcast build
    side, so the fact rows that survive the hash probes are already
    restricted before the residual pair predicate runs. The only
    shuffles are lineitem->orders (orderkey) and the final 3-key agg.
    """
    d1, d2 = "NATION_1", "NATION_2"
    pair = [d1, d2]
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.to_timestamp(F.lit("1996-01-01")), F.to_timestamp(F.lit("1997-12-31"))
        )
    )
    o = _t(spark, sf_dir, "orders")
    n1 = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(pair))
    n2 = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(pair))
        .select(
            F.col("n_nationkey").alias("n2_nationkey"), F.col("n_name").alias("cust_nation")
        )
    )
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    c = _t(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2_nationkey")
    ).select("c_custkey", "cust_nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(c), o.o_custkey == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == d1) & (F.col("cust_nation") == d2))
            | ((F.col("supp_nation") == d2) & (F.col("cust_nation") == d1))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year")
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@register(
    "q8_market_share",
    """
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                              ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
                / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)) AS volume,
               n2.n_name AS nation
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
          AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                AND TIMESTAMP '1997-12-31 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: national market share within a region (8-table
    join, conditional-aggregate share).

    Scale: every dimension (part filtered to one type, supplier,
    customer restricted to the region via nation+region, both nation
    roles) broadcasts; lineitem->orders on orderkey is the only big
    shuffle. The share is a single-pass conditional aggregate —
    decimal-exact numerator and denominator, divided at the end, so no
    second pass over the fact table.
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.to_timestamp(F.lit("1996-01-01")), F.to_timestamp(F.lit("1997-12-31"))
        )
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = _t(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cust_nationkey"))
    c = _t(spark, sf_dir, "customer").join(
        F.broadcast(n1), F.col("c_nationkey") == F.col("cust_nationkey")
    ).select("c_custkey")
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("supp_nationkey"), F.col("n_name").alias("nation")
    )
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n2), F.col("s_nationkey") == F.col("supp_nationkey")
    ).select("s_suppkey", "nation")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dec = volume.cast("decimal(38,6)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(c), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(s), li.l_suppkey == F.col("s_suppkey"))
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


@register(
    "q9_product_type_profit",
    f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           {DSUM('l.l_extendedprice * (1 - l.l_discount)', 'sum_profit')}
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    """,
)
def q9_product_type_profit(spark, sf_dir):
    """TPC-H Q9 shape (adapted): profit by supplier nation and year for
    parts matching a name pattern. The testdata has no partsupp table,
    so profit omits the ps_supplycost*l_quantity term — the plan family
    (LIKE-filtered part dim, fact joins, 2-key agg) is unchanged.

    Scale: the LIKE filter cannot prune at the parquet footer but cuts
    the broadcast build side to ~1/6 of part; supplier->nation folds
    into one broadcast. lineitem->orders stays the one big shuffle; the
    aggregate is partial-aggregated map-side before the 2-key exchange.
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select("p_partkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("supp_nationkey"), F.col("n_name").alias("nation")
    )
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("supp_nationkey")
    ).select("s_suppkey", "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("nation", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_profit"))
    )


@register(
    "q12_late_shipment_priority",
    """
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def q12_late_shipment_priority(spark, sf_dir):
    """TPC-H Q12 shape (adapted): priority mix among late shipments.
    The testdata has no l_shipmode/l_commitdate/l_receiptdate, so
    "late" is l_shipdate > o_orderdate + 90 days and the group key is
    l_returnflag — same conditional-count plan family.

    Scale: the shipdate range predicate is pushed to the parquet scan;
    the cross-table lateness predicate runs as the join residual. Both
    conditional counts come from ONE pass (no second join or union).
    The join shuffles on orderkey; at 100 TB co-partitioned/bucketed
    layout on orderkey would remove that exchange entirely.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q13_customer_order_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                          AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape: distribution of orders-per-customer including
    zero-order customers (left join with an ON-clause filter, double
    aggregation).

    Scale: the priority filter must live in the JOIN condition, not a
    WHERE (a WHERE would drop the zero-order customers the query
    exists to count). First agg shuffles on custkey; the second agg's
    key (c_count) has tiny cardinality, so its exchange is a few bytes
    after map-side partial aggregation. COUNT(o_orderkey) — not
    COUNT(*) — so unmatched customers count 0.
    """
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    return (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {DSUM('l_extendedprice * (1 - l_discount)', 'total_revenue')}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: quarterly revenue view + global-max scalar
    subquery (the supplier(s) with the maximum revenue).

    Scale: the revenue aggregate is computed ONCE and reused for both
    the max and the equality probe (cached so the two consumers don't
    rescan lineitem). The max is a one-row broadcast; supplier joins in
    as a broadcast too. Revenue is decimal-exact, so `= max` is safe —
    with float partial sums the equality would be partitioning-
    dependent, which is exactly the nondeterminism the decimal pattern
    exists to kill.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01")))
    )
    revenue = persist_tracked(
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (
          SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                        / COUNT(l2.l_quantity))
          FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated per-part average threshold
    (lineitems below 20% of their part's mean quantity).

    Scale: the correlated subquery is decorrelated by hand — per-part
    averages are computed ONCE by a groupBy over only the brand's
    partkeys (semi-join pushdown of the part filter into the inner
    aggregate), then joined back. The naive plan re-aggregates all of
    lineitem; this one touches lineitem twice but aggregates only the
    filtered partkeys' rows. Decimal-exact mean keeps the `<` threshold
    partition-invariant.
    """
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    )
    thresholds = (
        li.groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg(
            (
                0.2
                * (
                    F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double")
                    / F.count("l_quantity")
                )
            ).alias("threshold")
        )
    )
    return (
        li.join(F.broadcast(thresholds), F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double") / 7.0)
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "q21_waiting_supplier",
    """
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND n.n_name = 'NATION_5'
      AND l1.l_shipdate = (SELECT MAX(l3.l_shipdate) FROM lineitem l3
                           WHERE l3.l_orderkey = l1.l_orderkey)
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
)
def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape (adapted): suppliers holding up multi-supplier
    finished orders. No l_commitdate/l_receiptdate in the testdata, so
    "waiting on this supplier" = its line ships last in the order
    (shipdate == per-order max) and at least one other supplier is on
    the order — the same correlated-max + EXISTS plan family.

    Scale: both correlated subqueries collapse into ONE window pass
    over lineitem partitioned by orderkey (max shipdate +
    distinct-supplier count via collect_set size) — one shuffle of the
    fact table, total. The r12 form computed the same two values as a
    separate per-orderkey aggregate and joined it back, which shuffled
    lineitem TWICE (once into the aggregate, once into the probe join —
    optimization guide §2.4: an aggregation and a window keyed the same
    way should share one exchange). size(collect_set(...)) ==
    countDistinct(...) (both NULL-excluding), and max over the window
    equals max over the group, so values are identical. Supplier and
    nation broadcast at the end, after the fact rows have been cut.
    """
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    w = Window.partitionBy("l_orderkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .withColumn("max_shipdate", F.max("l_shipdate").over(w))
        .withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .filter((F.col("l_shipdate") == F.col("max_shipdate")) & (F.col("n_supp") > 1))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


@register(
    "q2_min_cost_supplier",
    """
    WITH ps AS (
      SELECT DISTINCT l.l_partkey AS partkey, l.l_suppkey AS suppkey
      FROM lineitem l),
    eligible AS (
      SELECT ps.partkey, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE')
    SELECT p.p_partkey, p.p_brand, e.s_suppkey, e.s_name, e.s_acctbal, e.n_name
    FROM part p
    JOIN eligible e ON e.partkey = p.p_partkey
    WHERE p.p_size = 15 AND p.p_type = 'PROMO'
      AND e.s_acctbal = (SELECT min(e2.s_acctbal) FROM eligible e2
                         WHERE e2.partkey = p.p_partkey)
    ORDER BY p.p_partkey, e.s_suppkey
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (adapted): cheapest eligible supplier per part
    within a region — correlated per-group MIN re-probed against the
    group. The testdata has no partsupp, so the part<->supplier
    relation is DISTINCT (l_partkey, l_suppkey) from lineitem and
    ps_supplycost's role is played by s_acctbal (min per part).

    Scale: the correlated min decorrelates into one per-part aggregate
    joined back on (partkey, acctbal); supplier/nation/region fold to a
    broadcast. The distinct part-supplier projection is the only wide
    shuffle and it carries two longs per row.
    """
    ps = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey"))
        .distinct()
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = _t(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    # reused by the probe AND the per-part min: persisted (tracked, so
    # repeated bench/test runs evict it) so the distinct pair projection
    # (the only wide shuffle) is computed once
    eligible = persist_tracked(
        ps.join(F.broadcast(s), ps.suppkey == F.col("s_suppkey"))
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "PROMO"))
        .select("p_partkey", "p_brand")
    )
    min_bal = eligible.groupBy(F.col("partkey").alias("mb_partkey")).agg(
        F.min("s_acctbal").alias("mb_min")
    )
    return (
        eligible.join(F.broadcast(p), eligible.partkey == F.col("p_partkey"))
        .join(
            F.broadcast(min_bal),
            (F.col("partkey") == F.col("mb_partkey"))
            & (F.col("s_acctbal") == F.col("mb_min")),
        )
        .select("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .orderBy("p_partkey", "s_suppkey")
    )


@register(
    "q11_important_stock",
    f"""
    WITH nation_value AS (
      SELECT n.n_name,
             {DSUM('l.l_extendedprice * l.l_quantity', 'value_')}
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      GROUP BY n.n_name)
    SELECT n_name, value_
    FROM nation_value
    WHERE value_ > (SELECT CAST(SUM(CAST(value_ AS DECIMAL(38,6))) AS DOUBLE)
                           * 0.02 FROM nation_value)
    ORDER BY value_ DESC, n_name
    """,
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape (adapted): group value vs a fraction-of-global
    scalar subquery (HAVING value > 2% of total). partsupp's
    ps_supplycost*ps_availqty value becomes extendedprice*quantity by
    supplier nation.

    Scale: the grouped aggregate is computed ONCE (cached); the global
    threshold is a one-row broadcast derived from the SAME aggregate —
    no second pass over the fact table. Decimal-exact sums make the
    2% threshold partition-invariant.
    """
    li = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("supp_nationkey"), "n_name"
    )
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("supp_nationkey")
    ).select("s_suppkey", "n_name")
    nation_value = persist_tracked(
        li.join(F.broadcast(s), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * F.col("l_quantity"), "value_"))
    )
    thr = nation_value.agg(
        (F.sum(F.col("value_").cast("decimal(38,6)")).cast("double") * 0.02).alias("t")
    )
    return (
        nation_value.join(F.broadcast(thr), F.col("value_") > F.col("t"))
        .select("n_name", "value_")
        .orderBy(F.desc("value_"), "n_name")
    )


@register(
    "q16_supplier_part_counts",
    """
    WITH ps AS (
      SELECT DISTINCT l.l_partkey AS partkey, l.l_suppkey AS suppkey
      FROM lineitem l)
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT ps.suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
    JOIN part p ON p.p_partkey = ps.partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT IN ('PROMO', 'ECONOMY')
      AND p.p_size IN (5, 10, 15, 20)
      AND ps.suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 shape (adapted): distinct-supplier counts per part
    group, excluding a NOT-IN supplier set (complaint suppliers →
    negative-balance suppliers here; lineitem plays partsupp).

    Scale: the NOT IN set is a tiny broadcast anti-join (no null-key
    trap: s_suppkey is non-null); COUNT(DISTINCT) expands to a
    two-level aggregate — Catalyst plans partial distinct on
    (group, suppkey) before the final count, so the wide shuffle
    carries deduped pairs only.
    """
    ps = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey"))
        .distinct()
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (~F.col("p_type").isin("PROMO", "ECONOMY"))
            & (F.col("p_size").isin(5, 10, 15, 20))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("bad_suppkey")
    )
    return (
        ps.join(F.broadcast(p), ps.partkey == F.col("p_partkey"))
        .join(F.broadcast(bad), ps.suppkey == F.col("bad_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_excess_stock_suppliers",
    f"""
    WITH red_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
    shipped AS (
      SELECT l.l_suppkey, {DSUM('l.l_quantity', 'qty')}
      FROM lineitem l
      WHERE l.l_partkey IN (SELECT p_partkey FROM red_parts)
        AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l.l_suppkey)
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM shipped WHERE qty > 400)
    ORDER BY s.s_name
    """,
)
def q20_excess_stock_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (adapted): nested IN-subqueries — suppliers who
    moved more than a threshold of name-filtered parts in a year.
    partsupp's availqty comparison becomes a shipped-quantity
    threshold; the nesting (parts -> lineitem agg -> supplier semi)
    is the Q20 plan family.

    Scale: red_parts broadcasts into the lineitem scan as a semi-join;
    the per-supplier aggregate's keeper set is again a broadcast
    semi-join into supplier. Nothing wide ever carries supplier
    payload columns.
    """
    red = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select(
        "p_partkey"
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    shipped = (
        li.join(F.broadcast(red), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(dsum(F.col("l_quantity"), "qty"))
        .filter(F.col("qty") > 400)
        .select("l_suppkey")
    )
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("supp_nationkey"), "n_name"
    )
    return (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(shipped), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("supp_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "unpivot_order_metrics",
    """
    SELECT o_orderkey, metric, CAST(val AS DOUBLE) AS val
    FROM (
      SELECT o_orderkey,
             CAST(o_totalprice AS DOUBLE) AS totalprice,
             CAST(o_custkey AS DOUBLE) AS custkey
      FROM orders WHERE o_orderkey % 100 = 0)
    UNPIVOT (val FOR metric IN (totalprice, custkey))
    """,
)
def q_unpivot_order_metrics(spark, sf_dir):
    """Unpivot/melt (the inverse of pivot_status_counts): wide metric
    columns to (key, metric, value) rows via Spark's native unpivot —
    a Generate node, zero shuffle, no UDF."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    wide = o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
    )
    return wide.unpivot(
        ids=["o_orderkey"],
        values=["totalprice", "custkey"],
        variableColumnName="metric",
        valueColumnName="val",
    )


@register(
    "full_outer_reconcile",
    """
    WITH o AS (SELECT o_custkey AS custkey,
                      CAST(count(*) AS BIGINT) AS n_orders
               FROM orders GROUP BY 1)
    SELECT COALESCE(o.custkey, c.c_custkey) AS custkey,
           COALESCE(o.n_orders, 0) AS n_orders,
           c.c_custkey IS NOT NULL AS in_customer,
           o.custkey IS NOT NULL AS has_orders
    FROM o FULL OUTER JOIN customer c ON o.custkey = c.c_custkey
    """,
)
def q_full_outer_reconcile(spark, sf_dir):
    """Two-table reconciliation via FULL OUTER join: customers with no
    orders AND order keys with no customer row both survive, with
    presence flags — the audit shape matchmerge's inner/left contract
    (reference semantics) deliberately excludes. Scale: the aggregate
    side is customer-cardinality; one shuffle on the join key (full
    outer cannot broadcast), AQE handles skew."""
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    return (
        o.join(c, o["custkey"] == c["c_custkey"], "full_outer")
        .select(
            F.coalesce(o["custkey"], c["c_custkey"]).alias("custkey"),
            F.coalesce(o["n_orders"], F.lit(0)).alias("n_orders"),
            c["c_custkey"].isNotNull().alias("in_customer"),
            o["custkey"].isNotNull().alias("has_orders"),
        )
    )
