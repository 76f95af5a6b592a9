"""Structured Streaming mirror of the reference's chunked ingest loop.

The reference's cursor loop (fetch chunk -> transFUN -> append,
R/ffsql.R:276-333) is pull-based pagination; its Spark-native
generalization is a stream: ``readStream`` -> transformations ->
``writeStream``, where ``foreachBatch`` plays exactly the per-chunk
``transFUN`` role and the sink append mirrors the ffdf grow-in-place
append (R/ffsql.R:319-323). The reference has no watermarks/state
(SURVEY §2.7) — those are pure extension.

Scale: file-source streams partition per file; watermark bounds state
for the windowed aggregates; ``availableNow`` gives batch-boundedness
for backfills (process everything, then stop) — the pattern for
replaying a 100 TB history through the same streaming query that then
tails the live feed.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream exactly the events parquet (one-file source).

    Session requirements, checked loudly instead of mutated silently
    (review catch — a reader helper that flips the session timezone
    changes timestamp semantics for every OTHER query in the session):
    the session timezone must already be UTC (``get_session`` pins it;
    the NTZ normalization below is value-preserving only under UTC).
    The one conf this helper does set is the legacy
    ``nanosAsLong`` read shim, WHEN the events file needs it — without
    it Spark cannot even read a TIMESTAMP(NANOS) parquet schema (it
    throws), and the long it decodes to is normalized to a timestamp
    immediately below; the session-global effect is that other readers
    of nanos files see longs instead of an exception."""
    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz != "UTC":
        raise ValueError(
            f"stream_events_file requires a UTC session timezone (got "
            f"{tz!r}): the NTZ->LTZ normalization below silently shifts "
            "values under any other zone. Build the session with "
            "get_session (which pins UTC) or set "
            "spark.sql.session.timeZone=UTC explicitly"
        )
    try:
        raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    except Exception as e:
        # TIMESTAMP(NANOS) events (driver generations 1-2) are
        # unreadable without the legacy shim — set it and retry. ONLY
        # that failure: a missing file or permission error must
        # re-raise untouched, not mutate the session-global nanosAsLong
        # conf and then fail again with a misleading second error
        # (review catch). Spark's illegal-type message names the NANOS
        # unit ("Illegal Parquet type: INT64 (TIMESTAMP(NANOS,...))").
        if "NANOS" not in str(e).upper():
            raise
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # file-stream sources require a directory; glob-filter to the events file
    df = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # NTZ→LTZ normalization is for type stability and DuckDB-oracle
        # comparability (one TimestampType everywhere, value-preserving
        # under the UTC session tz pinned above); Spark 4.1 watermarks
        # do accept TimestampNTZ
        df = df.withColumn("ts", F.to_timestamp_ltz(F.col("ts")))
    return df


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts + exact-decimal value sums per event_type,
    tolerating ``watermark`` of event-time lateness."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_available_now(
    spark: SparkSession,
    agg: DataFrame,
    query_name: str = "stream_out",
    output_mode: str = "append",
) -> DataFrame:
    """Drive a streaming aggregate to completion over all currently
    available input (availableNow trigger, memory sink) and return the
    result as a batch DataFrame."""
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def streaming_dedup(
    events: DataFrame,
    id_cols: list[str],
    event_time_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same key within
    the watermark horizon (state auto-evicts beyond it). The streaming
    twin of ``dedup.drop_exact_duplicates`` — the operator every
    at-least-once ingest pipeline needs in front of its sink."""
    return events.withWatermark(event_time_col, watermark).dropDuplicates(
        [*id_cols, event_time_col]
    )


def foreach_batch_ingest(
    events: DataFrame,
    transform: Callable[[DataFrame, int], DataFrame],
    path: str,
    checkpoint: str,
):
    """The transFUN-per-chunk pattern verbatim: each micro-batch passes
    through ``transform(df, epoch_id)`` then appends to partitioned
    parquet — the streaming twin of read.dbi.ffdf's loop."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        out = transform(batch_df, epoch_id)
        out.write.mode("append").parquet(path)

    return (
        events.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_documents_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream exactly the documents parquet (one-file source)."""
    raw_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )


def foreach_batch_exactly_once(
    events: DataFrame,
    path: str,
    checkpoint: str,
    transform: Callable[[DataFrame, int], DataFrame] | None = None,
):
    """Exactly-once file sink on top of at-least-once foreachBatch:
    each micro-batch writes to its OWN epoch-keyed partition directory
    with mode=overwrite, so a replayed epoch (failure between write and
    checkpoint commit) overwrites its previous attempt instead of
    appending duplicates. Readers see ``path`` as a normal partitioned
    dataset; epoch re-delivery is invisible.

    This is the portable form of the pattern a transactional table
    format implements natively — the write is idempotent PER EPOCH
    because the (deterministic) epoch_id names the output, not because
    the storage has transactions. Requires a deterministic transform:
    re-executed batches must produce the same rows.

    Scale: one directory per epoch keeps the commit atomic at rename
    granularity; compact with ``compact_parquet`` downstream when epoch
    files get small (micro-batch cadence at scale).
    """

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        out = transform(batch_df, epoch_id) if transform else batch_df
        out.write.mode("overwrite").parquet(f"{path}/epoch={epoch_id}")

    return (
        events.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str | tuple[str, str],
    left_ts: str,
    right_ts: str,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join on ``key`` where the right event lands
    in ``(left_ts, left_ts + horizon]`` — the online twin of the batch
    range join (event_queries.range_join_purchase_window).

    Both sides carry a watermark so the join state is BOUNDED: Spark
    derives from the interval condition + watermarks how long each
    side's rows must be retained and evicts beyond it — without the
    time bound a stream-stream join buffers both streams forever. On a
    finite (availableNow) input the inner-join result equals the batch
    join, which is what the driver oracle checks.
    """
    lk, rk = (key, key) if isinstance(key, str) else key
    l_ = left.withWatermark(left_ts, watermark).alias("l")
    r_ = right.withWatermark(right_ts, watermark).alias("r")
    return l_.join(
        r_,
        F.expr(
            f"l.{lk} = r.{rk} AND r.{right_ts} > l.{left_ts} "
            f"AND r.{right_ts} <= l.{left_ts} + interval {horizon}"
        ),
    )
