"""Incremental sequence-level (span) deduplication under Structured
Streaming: an append-only span-key index maintained across micro-
batches, with each batch's spans checked against every span already
ingested — the streaming twin of ``operators.dedup.window_dedup_stats``.

The reference is batch-only (SURVEY §2.7); this is the ingest-time form
of span dedup a continuously-fed training corpus needs: a document's
retention stats are final the moment its batch commits, and later
batches can never "steal" a first occurrence from an earlier one.

Index design (the 100 TB story):
- One row per DISTINCT span key ever seen, WITH its first occurrence:
  ``(__key string, __first struct<i,x>)`` — ~48 bytes per unique span,
  append-only parquet. Duplicate mass never grows the index.
- Per batch, only the new documents are tokenized (incremental cost is
  O(batch)); the probe is two broadcast joins — index INNER-joined
  against the broadcast batch keys (the index scans in place, nothing
  shuffles, output is at most one row per batch key), then that tiny
  matched set left-joined back onto the batch. A one-step left-outer
  with the batch as preserved side would force a full-index shuffle
  per batch (BHJ LeftOuter requires build-right — review catch). At
  real scale the index is written bucketed by key prefix so the probe
  prunes instead of scanning.
- Batch-local first occurrence uses the same combinable
  ``min(struct(id, idx))`` aggregate as the batch operator; the
  overall first is the struct-min of (index entry, batch-local min).

Cross-batch contract: when documents arrive in ascending ``id`` order
(one doc never split across batches), the accumulated per-doc stats
equal the BATCH ``window_dedup_stats`` over the full corpus — which is
how the registered query oracle-checks this path end to end.

Failure/exactly-once: foreachBatch + checkpoint gives at-least-once
appends. Storing the first-occurrence POSITION in the index (not just
the key) is what makes replay safe: a batch that died after its index
append re-runs against an index that already contains its own keys,
but those entries carry the batch's own (id, idx) minima, so the
struct-min reproduces the exact same kept decisions and the re-appended
stats rows are IDENTICAL — a downstream ``distinct`` restores
exactly-once. (A key-existence-only index would mark the replayed
batch's spans as dups and emit diverging stats.) Replayed keys append
no new index rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from etlutils_spark.operators.dedup import span_rows


def incremental_span_dedup(
    docs: DataFrame,
    index_dir: str,
    stats_dir: str,
    checkpoint: str,
    window: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Start the streaming query: for each micro-batch of documents,
    emit per-doc retention stats (schema of ``window_dedup_stats``) to
    ``stats_dir`` and append the batch's NEW span keys to
    ``index_dir``. Returns the StreamingQuery."""

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        # re-read ~3x downstream (firsts agg, kept join, stats agg):
        # materialize once. Narrow span keys (xxhash64 int64, guide
        # §2.3): the key is only an equality join/group key that never
        # leaves the operator, so 8-byte keys shrink the stored index
        # ~4x and every probe join, with dup/kept decisions identical
        # up to ~2^-64 collisions (same trade as the LSH band digests)
        keyed = span_rows(
            batch_df, window, text_col, id_col, long_key=True
        ).localCheckpoint(eager=True)
        local = keyed.groupBy("__key").agg(
            F.min(
                F.struct(F.col(id_col).alias("i"), F.col("__idx").alias("x"))
            ).alias("__bf")
        )
        try:
            index = spark.read.parquet(index_dir).withColumnRenamed(
                "__first", "__if"
            )
            # probe shape matters (review catch): a direct left-outer
            # with the tiny batch as the PRESERVED side cannot
            # broadcast-hash-join (BHJ LeftOuter requires build-right,
            # and the right side is the full index), so Catalyst would
            # shuffle the ENTIRE index every micro-batch — O(corpus)
            # per batch, not O(batch). Instead: inner-join the index
            # against the broadcast batch keys (index scans in place,
            # nothing shuffles, output is at most one row per batch
            # key), THEN left-join that tiny matched set back — now the
            # build side is batch-sized on both joins.
            matched = index.join(
                F.broadcast(local.select("__key")), "__key"
            )
            joined = local.join(F.broadcast(matched), "__key", "left")
            # overall first = struct-min of the index entry (earlier
            # batch, or THIS batch under failure replay) and the
            # batch-local min — replay-idempotent by construction
            firsts = joined.select(
                "__key",
                F.when(
                    F.col("__if").isNotNull() & (F.col("__if") < F.col("__bf")),
                    F.col("__if"),
                ).otherwise(F.col("__bf")).alias("__first"),
                F.col("__if").isNull().alias("__is_new"),
            )
        except AnalysisException:
            firsts = local.select(
                "__key", F.col("__bf").alias("__first"),
                F.lit(True).alias("__is_new"),
            )
        firsts = firsts.localCheckpoint(eager=True)
        marked = keyed.join(firsts.select("__key", "__first"), "__key").withColumn(
            "__kept",
            (F.col(id_col) == F.col("__first.i"))
            & (F.col("__idx") == F.col("__first.x")),
        )
        n_tokens = F.sum("__n").cast("bigint")
        n_kept = F.sum(F.when(F.col("__kept"), F.col("__n")).otherwise(0)).cast(
            "bigint"
        )
        stats = marked.groupBy(id_col).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_windows"),
            F.sum(F.when(F.col("__kept"), 0).otherwise(1))
            .cast("bigint")
            .alias("n_dup_windows"),
            n_tokens.alias("n_tokens"),
            n_kept.alias("n_kept_tokens"),
            (n_kept.cast("double") / n_tokens.cast("double")).alias("kept_ratio"),
        )
        stats.write.mode("append").parquet(stats_dir)
        firsts.filter(F.col("__is_new")).select("__key", "__first").write.mode(
            "append"
        ).parquet(index_dir)

    return (
        docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
