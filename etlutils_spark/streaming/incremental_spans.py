"""Incremental sequence-level (span) deduplication under Structured
Streaming: an append-only span-key index maintained across micro-
batches, with each batch's spans checked against every span already
ingested — the streaming twin of ``operators.dedup.window_dedup_stats``.

The reference is batch-only (SURVEY §2.7); this is the ingest-time form
of span dedup a continuously-fed training corpus needs: a document's
retention stats are final the moment its batch commits, and later
batches can never "steal" a first occurrence from an earlier one.

Index design (the 100 TB story):
- One row per DISTINCT span key ever seen: ``(__key string)`` — 32
  bytes of md5 per unique span, append-only parquet. Duplicate mass
  never grows the index.
- Per batch, only the new documents are tokenized (incremental cost is
  O(batch)); the batch's distinct keys are checked against the index
  with a left-anti join — the batch side is tiny, so Catalyst
  broadcasts it against the index scan. At real scale the index is
  written bucketed by key prefix so the probe prunes instead of
  scanning.
- Batch-local first occurrence uses the same combinable
  ``min(struct(id, idx))`` aggregate as the batch operator.

Cross-batch contract: when documents arrive in ascending ``id`` order
(one doc never split across batches), the accumulated per-doc stats
equal the BATCH ``window_dedup_stats`` over the full corpus — which is
how the registered query oracle-checks this path end to end.

Failure/exactly-once: foreachBatch + checkpoint gives at-least-once
appends; stats rows are deterministic per doc, so a replayed batch
re-appends identical rows and a downstream ``distinct`` restores
exactly-once. Re-appended index keys are harmless (the anti-join
semantics only need key EXISTENCE).
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
        # materialize once
        keyed = span_rows(
            batch_df, window, text_col, id_col, portable=True
        ).localCheckpoint(eager=True)
        firsts = keyed.groupBy("__key").agg(
            F.min(
                F.struct(F.col(id_col).alias("i"), F.col("__idx").alias("x"))
            ).alias("__first")
        )
        try:
            index = spark.read.parquet(index_dir).select("__key")
            # keys already in the index were first in an EARLIER batch:
            # nothing in this batch keeps them
            firsts = firsts.join(index, "__key", "left_anti")
        except AnalysisException:
            pass
        marked = keyed.join(firsts, "__key", "left").withColumn(
            "__kept",
            F.col("__first").isNotNull()
            & (F.col(id_col) == F.col("__first.i"))
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
        firsts.select("__key").write.mode("append").parquet(index_dir)

    return (
        docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
