"""Event-stream analytics queries: streaming windowed aggregation,
sessionization, as-of lookup, range join — the temporal surface a
Structured-Streaming-capable engine adds over the batch-only reference
(SURVEY §2.7: the reference's cursor loop is pagination, not a stream).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etlutils_spark.entry_queries import _t, register
from etlutils_spark.operators.sampling import rate_threshold_hex
from etlutils_spark.streaming.ingest import (
    run_available_now,
    stream_events_file,
    windowed_event_counts,
)

_stream_counter = itertools.count()


@register(
    "streaming_window_counts",
    """
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def q_streaming_window_counts(spark, sf_dir):
    """A real Structured Streaming query (readStream -> watermark ->
    tumbling window -> memory sink, availableNow trigger) driven to
    completion and returned as a batch result. Epoch-aligned 1h windows
    == date_trunc('hour') in the oracle. Complete output mode so
    windows newer than the final watermark are emitted too."""
    events = stream_events_file(spark, sf_dir)
    agg = windowed_event_counts(events, window="1 hour", watermark="2 hours")
    name = f"stream_out_{next(_stream_counter)}"
    return run_available_now(spark, agg, query_name=name, output_mode="complete")


@register(
    "streaming_interval_join",
    """
    WITH e AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      FROM events),
    v AS (SELECT event_id AS view_id, user_id, ts AS view_ts
          FROM e WHERE event_type = 'view'),
    p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
          FROM e WHERE event_type = 'purchase')
    SELECT v.view_id, p.purchase_id, v.user_id,
           CAST(date_diff('second', v.view_ts, p.purchase_ts) AS BIGINT)
             AS gap_seconds
    FROM v JOIN p
      ON v.user_id = p.user_id
     AND p.purchase_ts > v.view_ts
     AND p.purchase_ts <= v.view_ts + INTERVAL 1 HOUR
    """,
)
def q_streaming_interval_join(spark, sf_dir):
    """Stream-stream interval join (view -> purchase within 1h, per
    user), driven availableNow: TWO file-source streams, watermarks on
    both sides bounding the join state, inner join in append mode. On
    the finite input the result equals the batch range join, which the
    oracle computes."""
    from etlutils_spark.streaming.ingest import (
        run_available_now,
        stream_events_file,
        stream_stream_interval_join,
    )

    views = (
        stream_events_file(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"), "user_id",
            F.col("ts").alias("view_ts"),
        )
    )
    purchases = (
        stream_events_file(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    joined = stream_stream_interval_join(
        views,
        purchases,
        key=("user_id", "p_user_id"),
        left_ts="view_ts",
        right_ts="purchase_ts",
        horizon="1 hour",
        watermark="2 hours",
    )
    name = f"stream_out_{next(_stream_counter)}"
    # The stream's state-store partition count = shuffle partitions at
    # START — size it to the STATE (a few thousand rows inside the 2h
    # watermark horizon here), not the batch default: 32 near-empty
    # HDFS-backed stores cost ~2.3x wall-clock over 8 at sf0.1
    # (8.4 s -> 4.9 s measured). Scoped: restored after the availableNow
    # run completes; raise with state volume on a real cluster.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        out = run_available_now(spark, joined, query_name=name, output_mode="append")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return out.select(
        "view_id", "purchase_id", F.col("user_id"),
        (F.unix_timestamp("purchase_ts") - F.unix_timestamp("view_ts"))
        .cast("bigint").alias("gap_seconds"),
    )


_TIME_ROLLUP_SQL = """
    SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY GROUPING SETS (
      (date_trunc('day', CAST(ts AS TIMESTAMP)),
       date_trunc('hour', CAST(ts AS TIMESTAMP)), event_type),
      (date_trunc('day', CAST(ts AS TIMESTAMP)), event_type),
      (event_type),
      ()
    )
"""


@register("time_rollup_multigrain", _TIME_ROLLUP_SQL)
def q_time_rollup_multigrain(spark, sf_dir):
    """Hypertable-style multi-granularity rollup: hour/day/type/total
    aggregates in ONE grouping-sets pass over the events table
    (identical SQL text on both engines). Scale: a single scan feeds
    every grain — the continuous-aggregate pattern without maintaining
    four materialized views."""
    from etlutils_spark.sources.files import read_table

    read_table(spark, "events", sf_dir).createOrReplaceTempView("events")
    return spark.sql(_TIME_ROLLUP_SQL)


@register(
    "sessionize_events",
    """
    WITH e AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), gaps AS (
      SELECT event_id, user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 6 HOUR
                  THEN 1 ELSE 0 END AS new_session
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS session_id
      FROM gaps
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sess GROUP BY user_id, session_id
    """,
)
def q_sessionize_events(spark, sf_dir):
    """Sessionization: gap > 6h starts a new session (lag + running sum
    — one window pass, one shuffle on user_id)."""
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    prev = F.lag("ts").over(w)
    new_session = F.when(
        prev.isNull() | (F.col("ts") - prev > F.expr("INTERVAL 6 HOURS")), F.lit(1)
    ).otherwise(F.lit(0))
    sess = (
        e.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(run))
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "sessionize_native_window",
    """
    WITH e AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), gaps AS (
      SELECT event_id, user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 6 HOUR
                  THEN 1 ELSE 0 END AS new_session
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS session_id
      FROM gaps
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
)
def q_sessionize_native_window(spark, sf_dir):
    """Spark's native session_window aggregation (dynamic-gap session
    windows in ONE groupBy — no lag/cumsum plumbing). The oracle is the
    window-function emulation: session_window.start == MIN(ts) of the
    lag-derived session, proving the two formulations agree."""
    e = _t(spark, sf_dir, "events").select("user_id", "ts")
    return (
        e.groupBy(F.session_window("ts", "6 hours"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )


@register(
    "sessionize_stateful_evicted",
    """
    WITH e AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), gaps AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 6 HOUR
                  THEN 1 ELSE 0 END AS new_session
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps
    ), agg AS (
      SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM sess GROUP BY user_id, session_id
    ), agg2 AS (
      SELECT *, MAX(session_end) OVER (PARTITION BY user_id) AS last_end
      FROM agg
    ), wm AS (
      SELECT MAX(CAST(ts AS TIMESTAMP)) AS w_max FROM events
    )
    SELECT user_id, session_start, session_end, n_events
    FROM agg2, wm
    WHERE session_end < last_end
       OR CEIL(epoch_us(session_end) / 1000.0) + 21600000
          < FLOOR(epoch_us(w_max) / 1000.0) - 21600000
    """,
)
def q_sessionize_stateful(spark, sf_dir):
    """Custom stateful streaming sessionization (applyInPandasWithState
    + EventTimeTimeout): sessions are emitted by watermark-driven state
    eviction, so the output is exactly the closed sessions — rolled
    sessions plus tail sessions whose timeout (ceil-ms(session_end) +
    gap) fell strictly below the final watermark (floor-ms(max ts) -
    gap). The oracle replicates that millisecond arithmetic verbatim,
    making even the eviction boundary oracle-checked."""
    from etlutils_spark.streaming.stateful import sessionize_stateful

    events = stream_events_file(spark, sf_dir).select("user_id", "ts")
    out = sessionize_stateful(events, gap="6 hours")
    name = f"stream_out_{next(_stream_counter)}"
    return run_available_now(spark, out, query_name=name, output_mode="append")


@register(
    "asof_last_purchase",
    """
    WITH e AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events
    )
    SELECT event_id, user_id, ts,
           last_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_purchase_ts
    FROM e
    """,
)
def q_asof_last_purchase(spark, sf_dir):
    """As-of (backward) lookup as a composition of existing ops: latest
    strictly-prior purchase per user via last(ignorenulls) over a
    trailing frame — the same primitive as LOCF (F2), which is why the
    engine gets as-of joins 'for free' on co-partitioned streams."""
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    purchase_ts = F.when(F.col("event_type") == "purchase", F.col("ts"))
    return e.select(
        "event_id", "user_id", "ts",
        F.last(purchase_ts, ignorenulls=True).over(w).alias("last_purchase_ts"),
    )


@register(
    "range_join_purchase_window",
    """
    WITH e AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events
    ), p AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase')
    SELECT p.event_id AS purchase_id, p.user_id,
           COUNT(f.event_id) AS n_following
    FROM p LEFT JOIN e f
      ON f.user_id = p.user_id
     AND f.ts > p.ts
     AND f.ts <= p.ts + INTERVAL 24 HOUR
    GROUP BY p.event_id, p.user_id
    """,
)
def q_range_join_purchase_window(spark, sf_dir):
    """Range join: events within 24h after each purchase, per user.

    Scale: the equi-key (user_id) carries the shuffle; the range
    predicate filters within partitions. For range-only joins (no
    equi-key) bucketize the time axis first — see SNIPPETS/guide
    pattern; here the user_id key keeps it a plain partitioned join.
    """
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    f = e.select(
        F.col("event_id").alias("f_event_id"),
        F.col("user_id").alias("f_user"),
        F.col("ts").alias("f_ts"),
    )
    joined = p.join(
        f,
        on=[
            F.col("f_user") == F.col("p_user"),
            F.col("f_ts") > F.col("p_ts"),
            F.col("f_ts") <= F.col("p_ts") + F.expr("INTERVAL 24 HOURS"),
        ],
        how="left",
    )
    return joined.groupBy(
        F.col("purchase_id"), F.col("p_user").alias("user_id")
    ).agg(F.count("f_event_id").alias("n_following"))


_STREAM_CURATION_SQL = """
    WITH m AS (
      SELECT doc_id, lang, source, n_chars,
             len(w) AS n_tokens,
             len(list_filter(w, t -> list_contains(['the', 'a', 'of', 'and', 'to', 'in'], t))) AS n_stop,
             list_sum(list_transform(w, t -> len(t))) AS sum_len
      FROM (SELECT *, string_split(text, ' ') AS w FROM documents))
    SELECT doc_id, lang, source, n_chars
    FROM m
    WHERE n_tokens >= 20 AND n_tokens <= 100000
      AND CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1) >= 0.05
      AND CAST(sum_len AS DOUBLE) / greatest(n_tokens, 1) <= 12.0
      AND md5(CAST(doc_id AS VARCHAR)) < '{thr}'
"""


@register(
    "streaming_curation_pipeline",
    _STREAM_CURATION_SQL.format(thr=rate_threshold_hex(0.5)),
)
def q_streaming_curation(spark, sf_dir):
    """The curation tier under Structured Streaming: stream the
    documents table, apply the Gopher/C4 quality filter and the
    deterministic 50% hash sample INSIDE the stream (both are pure
    row predicates — no state, no watermark needed), availableNow to
    completion. Batch == stream for stateless operators by
    construction; this query proves it through the driver's oracle.

    Scale: this is the shape of a continuous ingestion pipeline —
    filters run per micro-batch at scan speed, and the same code serves
    backfill (availableNow over history) and tail-following (default
    trigger)."""
    from etlutils_spark.operators.quality import quality_filter
    from etlutils_spark.operators.sampling import hash_sample
    from etlutils_spark.streaming.ingest import (
        run_available_now,
        stream_documents_file,
    )

    docs = stream_documents_file(spark, sf_dir)
    kept = quality_filter(docs, keep_only=True)
    sampled = hash_sample(kept, 0.5).select("doc_id", "lang", "source", "n_chars")
    name = f"stream_cur_{next(_stream_counter)}"
    return run_available_now(spark, sampled, query_name=name, output_mode="append")


@register(
    "outlier_flags_events",
    """
    WITH m AS (
      SELECT event_type,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS s1,
             CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))
                      * CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
               AS s2,
             COUNT(value) AS n
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type, e.value,
           (s1 / n) AS grp_mean,
           CASE WHEN n > 1
                THEN sqrt(greatest((s2 - s1 * s1 / n) / (n - 1), 0.0)) END
             AS grp_std,
           abs(e.value - s1 / n) > 3 * (CASE WHEN n > 1
                THEN sqrt(greatest((s2 - s1 * s1 / n) / (n - 1), 0.0)) END)
             AS is_outlier
    FROM events e JOIN m USING (event_type)
    """,
)
def q_outlier_flags(spark, sf_dir):
    """Per-group z-score outlier flags over the events stream: group
    moments from ONE decimal-exact aggregate (sum, sum-of-squares,
    count — all order-independent, so mean/std are bit-identical on
    any engine/partitioning), broadcast back as a tiny join. The
    anomaly-screening pass a metrics pipeline runs before training on
    telemetry.

    Scale: one partial-aggregated shuffle on the group key (5 groups),
    then a broadcast probe at scan speed — the fact table is never
    shuffled. sqrt/abs are IEEE scalars: deterministic given the exact
    sums. Oracle gotcha: DuckDB's direct DECIMAL->DOUBLE cast is not
    correctly rounded (it divides the scaled integer); the oracle
    routes the cast through VARCHAR, whose parse IS correctly rounded
    and matches Spark's BigDecimal.doubleValue bit-for-bit."""
    ev = _t(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(38,6)")
    # (18,6)^2 -> (37,12): exact on every engine; (38,6)^2 would exceed
    # precision 38 and engines cap the lost scale differently
    dec2 = F.col("value").cast("decimal(18,6)")
    m = (
        ev.groupBy(F.col("event_type").alias("m_type"))
        .agg(
            F.sum(dec).cast("double").alias("s1"),
            F.sum(dec2 * dec2).cast("double").alias("s2"),
            F.count("value").alias("n"),
        )
    )
    mean = F.col("s1") / F.col("n")
    # degenerate-group guard (mirrored in the oracle): n=1 would divide
    # by zero (NULL in DuckDB, Inf/NaN in Spark doubles), and float
    # cancellation on a zero-variance group can go epsilon-negative,
    # which DuckDB's sqrt() rejects outright
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    std = F.when(F.col("n") > 1, F.sqrt(F.greatest(var, F.lit(0.0))))
    return (
        ev.join(F.broadcast(m), ev.event_type == F.col("m_type"))
        .select(
            "event_id",
            "event_type",
            "value",
            mean.alias("grp_mean"),
            std.alias("grp_std"),
            (F.abs(F.col("value") - mean) > 3 * std).alias("is_outlier"),
        )
    )


@register(
    "window_rolling_7d",
    """
    SELECT event_id, user_id, ts, value,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
               PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
               RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_7d_value,
           CAST(COUNT(*) OVER (
               PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
               RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS rolling_7d_events
    FROM events
    """,
)
def q_window_rolling_7d(spark, sf_dir):
    """Time-RANGE window frame (vs the ROWS frames elsewhere): per-user
    7-day rolling value sum + event count. The frame is defined by the
    ORDER-BY VALUE range (ts within 7 days), not row offsets — ties and
    gaps behave differently from a ROWS frame, which is why both
    families need coverage.

    Scale: one shuffle on user_id, one sort, ONE window pass computing
    both aggregates over the same frame; decimal-exact sum so the
    rolling values are partition-invariant. The order key is epoch
    MICROSECONDS on both engines (Spark's RANGE frame needs a numeric
    key; a seconds cast would truncate sub-second timestamps and move
    frame boundaries — caught by the sf0.1 oracle)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-7 * 24 * 3600 * 1_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.sum(F.col("value").cast("decimal(38,6)"))
        .over(w)
        .cast("double")
        .alias("rolling_7d_value"),
        F.count(F.lit(1)).over(w).alias("rolling_7d_events"),
    )


@register(
    "asof_next_purchase",
    """
    WITH e AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events
    )
    SELECT event_id, user_id, ts,
           first_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
             AS next_purchase_ts
    FROM e
    """,
)
def q_asof_next_purchase(spark, sf_dir):
    """Forward as-of: earliest strictly-later purchase per user — the
    direction='forward' twin of asof_last_purchase, same single window
    pass after one shuffle on user_id."""
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    purchase_ts = F.when(F.col("event_type") == "purchase", F.col("ts"))
    return e.select(
        "event_id", "user_id", "ts",
        F.first(purchase_ts, ignorenulls=True).over(w).alias("next_purchase_ts"),
    )


FUNNEL_ORACLE_SQL = """
    WITH e AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      FROM events),
    p1 AS (
      SELECT *,
             min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS running_view
      FROM e),
    p2 AS (
      SELECT *,
             min(CASE WHEN event_type = 'click' AND running_view IS NOT NULL
                       AND ts >= running_view THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS running_click
      FROM p1)
    SELECT user_id,
           min(CASE WHEN event_type = 'view' THEN ts END) AS view_ts,
           min(CASE WHEN event_type = 'click' AND running_view IS NOT NULL
                     AND ts >= running_view THEN ts END) AS click_ts,
           min(CASE WHEN event_type = 'purchase' AND running_click IS NOT NULL
                     AND ts >= running_click THEN ts END) AS purchase_ts,
           CAST(CASE WHEN min(CASE WHEN event_type = 'purchase'
                                    AND running_click IS NOT NULL
                                    AND ts >= running_click THEN ts END)
                          IS NOT NULL THEN 3
                     WHEN min(CASE WHEN event_type = 'click'
                                    AND running_view IS NOT NULL
                                    AND ts >= running_view THEN ts END)
                          IS NOT NULL THEN 2
                     WHEN min(CASE WHEN event_type = 'view' THEN ts END)
                          IS NOT NULL THEN 1
                     ELSE 0 END AS INT) AS stage
    FROM p2 GROUP BY user_id
    """


def funnel_stages(e):
    """Batch funnel core over an events frame with (event_id, user_id,
    ts, event_type) — shared by the registered query and the streaming
    incremental funnel (streaming/funnel.py). Semantics: see
    q_funnel_stages."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    view_ts = F.when(F.col("event_type") == "view", F.col("ts"))
    p1 = e.withColumn("running_view", F.min(view_ts).over(w))
    qual_click = F.when(
        (F.col("event_type") == "click")
        & F.col("running_view").isNotNull()
        & (F.col("ts") >= F.col("running_view")),
        F.col("ts"),
    )
    p2 = p1.withColumn("running_click", F.min(qual_click).over(w))
    qual_purchase = F.when(
        (F.col("event_type") == "purchase")
        & F.col("running_click").isNotNull()
        & (F.col("ts") >= F.col("running_click")),
        F.col("ts"),
    )
    agg = p2.groupBy("user_id").agg(
        F.min(view_ts).alias("view_ts"),
        F.min(qual_click).alias("click_ts"),
        F.min(qual_purchase).alias("purchase_ts"),
    )
    stage = (
        F.when(F.col("purchase_ts").isNotNull(), 3)
        .when(F.col("click_ts").isNotNull(), 2)
        .when(F.col("view_ts").isNotNull(), 1)
        .otherwise(0)
    )
    return agg.select(
        "user_id", "view_ts", "click_ts", "purchase_ts",
        stage.cast("int").alias("stage"),
    )


@register("funnel_stages_user", FUNNEL_ORACLE_SQL)
def q_funnel_stages(spark, sf_dir):
    """Ordered funnel (view -> click -> purchase) per user: each stage
    timestamp is the earliest event of that type occurring at-or-after
    the previous stage's earliest completion (running-min windows, the
    sequential-pattern shape ad-hoc SQL gets wrong by ignoring order).

    One shuffle: both running-min windows and the final per-user
    aggregate share the user_id partitioning — Spark reuses the single
    Sort+Exchange (the same-window-spec reuse pinned by the sessionize
    plans). Ties (click at the exact view timestamp) count as
    conversion; the (ts, event_id) ordering makes the running mins
    deterministic under any partitioning."""
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    return funnel_stages(e)


@register(
    "cohort_retention",
    """
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    firsts AS (
      SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
      FROM e GROUP BY user_id),
    active AS (
      SELECT DISTINCT f.cohort_day,
             date_diff('day', f.cohort_day, date_trunc('day', e.ts)) AS day_offset,
             e.user_id
      FROM e JOIN firsts f USING (user_id))
    SELECT cohort_day, CAST(day_offset AS BIGINT) AS day_offset,
           CAST(count(*) AS BIGINT) AS n_active_users
    FROM active GROUP BY cohort_day, day_offset
    """,
)
def q_cohort_retention(spark, sf_dir):
    """Cohort retention: users grouped by first-activity day, activity
    counted at each day offset. Two shuffles (per-user first-day agg;
    the cohort/offset re-aggregation after a broadcastable
    user->cohort join — user cardinality is the small side vs the
    event fact, the classic retention join shape at scale)."""
    e = _t(spark, sf_dir, "events").select("user_id", "ts")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    active = (
        e.join(firsts, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.date_trunc("day", F.col("ts")), F.col("cohort_day"))
            .cast("bigint")
            .alias("day_offset"),
            "user_id",
        )
        .distinct()
    )
    return active.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).alias("n_active_users")
    )


@register("streaming_funnel", FUNNEL_ORACLE_SQL)
def q_streaming_funnel(spark, sf_dir):
    """The incremental streaming funnel (streaming/funnel.py) driven to
    completion over the events corpus split into 4 event-time-ordered
    micro-batches (ascending file mtimes; ts order is load-bearing —
    later batches must not contain earlier qualifying events). The
    accumulated per-user state equals the batch funnel over the whole
    corpus, so the batch oracle checks the incremental path end to end.

    Per-batch cost is O(state users + batch); state is the funnel's
    sufficient statistic (3 timestamps/user) re-seeded as pseudo-events
    — min-aggregation state folding, idempotent under replay."""
    import os
    import shutil

    from pyspark.sql import Window as W

    from etlutils_spark.pipeline_queries import _rt_path
    from etlutils_spark.streaming.funnel import incremental_funnel

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    root = _rt_path(spark, "inc_funnel")
    shutil.rmtree(root, ignore_errors=True)
    src = os.path.join(root, "src")
    os.makedirs(src)
    staging = os.path.join(root, "staging")
    # ntile gives ts-ordered, equal-size slices; the min-over-(user,ts)
    # rewrite then pulls every equal-ts event of a user into the
    # earliest slice any of them landed in, so a micro-batch boundary
    # can never split a user's exact-timestamp tie group (the one case
    # where incremental replay order could diverge from the batch
    # oracle — streaming/funnel.py's documented seed-sorts-first
    # caveat). Monotonic per user: (ts, event_id) ordering makes group
    # mins nondecreasing in ts, so later slices never hold earlier
    # qualifying events.
    sliced = ev.withColumn(
        "__slice", F.ntile(4).over(W.orderBy("ts", "event_id"))
    ).withColumn(
        "__slice",
        F.min("__slice").over(W.partitionBy("user_id", "ts")) - 1,
    )
    (
        sliced.repartition(4, "__slice")
        .write.mode("overwrite")
        .partitionBy("__slice")
        .parquet(staging)
    )
    import time as _time

    t0 = _time.time() - 1000
    for i in range(4):
        slice_dir = os.path.join(staging, f"__slice={i}")
        part = next(
            f for f in sorted(os.listdir(slice_dir)) if f.endswith(".parquet")
        )
        dst = os.path.join(src, f"slice{i}.parquet")
        os.replace(os.path.join(slice_dir, part), dst)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))
    shutil.rmtree(staging)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    q = incremental_funnel(
        stream,
        state_dir=os.path.join(root, "state"),
        checkpoint=os.path.join(root, "ckpt"),
    )
    q.awaitTermination()
    return spark.read.parquet(os.path.join(root, "state"))


def _duck_horizon(us: int, alias: str) -> str:
    return f"""
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
               PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
               RANGE BETWEEN {us} PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS sum_{alias},
           CAST(COUNT(*) OVER (
               PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
               RANGE BETWEEN {us} PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_{alias}"""


_H_US = {"1d": 24 * 3600 * 1_000_000, "7d": 7 * 24 * 3600 * 1_000_000,
         "30d": 30 * 24 * 3600 * 1_000_000}


@register(
    "window_multi_horizon",
    f"""
    SELECT event_id, user_id, ts, value,
           {",".join(_duck_horizon(us, h) for h, us in _H_US.items())}
    FROM events
    """,
)
def q_window_multi_horizon(spark, sf_dir):
    """Multi-horizon rolling features (1d/7d/30d value sums + counts
    per user-event) — the feature-engineering staple where N horizons
    must NOT cost N shuffles: all six aggregates share one
    (user_id, epoch-micros) partitioning and ordering, so the plan is
    ONE Exchange + ONE Sort feeding three Window frame nodes (pinned
    by test). Decimal-exact sums keep every horizon
    partition-invariant."""
    ev = _t(spark, sf_dir, "events")
    cols = ["event_id", "user_id", "ts", "value"]
    out = []
    for h, us in _H_US.items():
        w = (
            Window.partitionBy("user_id")
            .orderBy(F.unix_micros("ts"))
            .rangeBetween(-us, 0)
        )
        out.append(
            F.sum(F.col("value").cast("decimal(38,6)"))
            .over(w).cast("double").alias(f"sum_{h}")
        )
        out.append(F.count(F.lit(1)).over(w).alias(f"n_{h}"))
    return ev.select(*cols, *out)


@register(
    "user_cadence_stats",
    """
    WITH e AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
      FROM events),
    gaps AS (
      SELECT user_id,
             us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
               AS gap_us
      FROM e)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(SUM(gap_us) AS DOUBLE) / count(*) AS mean_gap_us,
           CAST(min(gap_us) AS BIGINT) AS min_gap_us,
           CAST(max(gap_us) AS BIGINT) AS max_gap_us
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
)
def q_user_cadence_stats(spark, sf_dir):
    """Per-user activity cadence: inter-event gap mean/min/max in
    microseconds (the churn/engagement feature family). One shuffle on
    user_id: the lag window and the aggregate share the partitioning;
    gaps are exact integer micros, the mean is one integer-sum / count
    division — engine-portable without decimals. Users with a single
    event have no gaps and are absent on both sides."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    return (
        ev.withColumn("gap_us", gap)
        .filter(F.col("gap_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            (F.sum("gap_us").cast("double") / F.count(F.lit(1)))
            .alias("mean_gap_us"),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
        )
    )


def next_event_pairs(
    events: DataFrame,
    context_len: int = 4,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(context, label) pairs for next-event prediction: per user in
    (ts, id) order, each event's type labeled with up to the
    ``context_len`` preceding types as a space-joined context
    (variable-length head contexts included; first events have no
    context and are absent). ONE window pass — the collect_list frame
    and the ordering share a single Exchange+Sort on the user key,
    frame bounded at ``context_len`` rows; the naive formulation
    self-joins events per offset."""
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(-context_len, -1)
    )
    ctx = F.collect_list(type_col).over(w)
    return (
        events.select(
            user_col,
            id_col,
            ctx.alias("__ctx"),
            F.col(type_col).alias("label"),
        )
        .filter(F.size("__ctx") >= 1)
        .select(
            user_col,
            id_col,
            F.size("__ctx").alias("n_context"),
            F.concat_ws(" ", "__ctx").alias("context"),
            "label",
        )
    )


def temporal_split(
    events: DataFrame,
    cutoff,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Time-based train/eval split with USER integrity: train before
    ``cutoff``; post-cutoff events labeled test_warm (user already
    seen in train — the serving case) vs test_cold (the user's entire
    history is post-cutoff — evaluated separately, the model has no
    state for them). One map-side-combinable per-user min(ts)
    aggregate joined back + a stateless CASE — no window, no per-user
    sort. ``cutoff`` is a Column or a timestamp-castable literal."""
    cutoff_c = (
        cutoff if hasattr(cutoff, "_jc") else F.lit(cutoff).cast("timestamp")
    )
    first = events.groupBy(user_col).agg(F.min(ts_col).alias("__first_ts"))
    return events.join(first, user_col).select(
        id_col,
        user_col,
        F.when(F.col(ts_col) < cutoff_c, "train")
        .when(F.col("__first_ts") < cutoff_c, "test_warm")
        .otherwise("test_cold")
        .alias("split"),
    )


@register(
    "next_event_training_pairs",
    """
    WITH ordered AS (
      SELECT user_id, event_id, event_type,
             list(event_type) OVER (
               PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING) AS ctx
      FROM events)
    SELECT user_id, event_id,
           CAST(len(ctx) AS INT) AS n_context,
           array_to_string(ctx, ' ') AS context,
           event_type AS label
    FROM ordered WHERE len(ctx) >= 1
    """,
)
def q_next_event_training_pairs(spark, sf_dir):
    """Sequence-dataset construction — the (context, label) pairs a
    next-event-prediction model trains on: per user, order events by
    (ts, event_id) and emit each event's label with up to the 4
    preceding event types as its context (variable-length head
    contexts included; first events have no context and are absent).
    ONE window pass — the collect_list frame and the ordering share a
    single Exchange+Sort on user_id; the context is emitted as a
    space-joined string (canonicalizer-safe, and exactly what a text
    tokenizer ingests downstream). The 100 TB shape: per-user
    partitions, frame bounded at context_len rows, no self-join (the
    naive formulation joins events to events per offset)."""
    return next_event_pairs(_t(spark, sf_dir, "events"), context_len=4)


@register(
    "temporal_split_events",
    """
    WITH f AS (
      SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id)
    SELECT e.event_id, e.user_id,
           CASE WHEN e.ts < TIMESTAMP '2024-01-22 00:00:00' THEN 'train'
                WHEN f.first_ts < TIMESTAMP '2024-01-22 00:00:00'
                  THEN 'test_warm'
                ELSE 'test_cold' END AS split
    FROM events e JOIN f USING (user_id)
    """,
)
def q_temporal_split_events(spark, sf_dir):
    """Temporal train/eval split with USER integrity — the
    forecasting-grade split a random split silently leaks on: train is
    everything before the cutoff; post-cutoff events divide into
    test_warm (user already seen in train — the realistic serving
    case) and test_cold (user's entire history is post-cutoff — the
    cold-start case, which must be evaluated separately because the
    model has no user state for it). One per-user min(ts) aggregate
    (map-side combinable) joined back on user_id — AQE broadcasts the
    per-user table when it fits; the labeling is a stateless CASE.
    At 100 TB: no window, no sort — the naive row_number-over-user
    formulation pays a per-user sort this never does."""
    return temporal_split(
        _t(spark, sf_dir, "events"), "2024-01-22 00:00:00"
    )
