#!/usr/bin/env python3
"""Per-batch cost probe for incremental_span_dedup at growing stored
corpus (VERDICT r12 next #4): the r12 review reshaped the index probe
from a full-index left-outer (which shuffled the whole index every
micro-batch) to two broadcast joins — index inner-joined against the
broadcast batch keys, matched set left-joined back. The claimed
asymptotic is O(batch) per micro-batch, FLAT in stored-index size;
this tool records it with the NEW plan.

    python3 tools/stress_span_index.py [corpus sizes ...]  # default 20000 200000

For each stored size N: stream-build the span index over N synthetic
docs (one availableNow run), then time a second stream run folding in
a FIXED 200-doc batch of fresh docs. The pass rubric lives with the
recorded numbers in BASELINE.md: extend wall at 10x the stored corpus
must stay ~flat (the timed run tokenizes only the batch and probes the
index via broadcast joins; only the index SCAN grows, linearly and
shuffle-free).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

BATCH = 200
WINDOW = 16  # the synthetic docs are 30 tokens: 16-token spans give
# each doc multiple windows without starving the index


def synth_docs(spark, start: int, n: int):
    """n 30-token docs with md5-derived tokens: 90% carry doc-unique
    token streams (the index grows ~linearly in stored docs), every
    10th doc is one shared boilerplate doc — so the timed batch's probe
    finds real cross-batch duplicate spans, not only misses."""
    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(29)),
                lambda i: F.substring(
                    F.md5(
                        F.when(
                            F.col("id") % 10 == 0,
                            F.concat_ws("_", F.lit("shared"), i),
                        ).otherwise(F.concat_ws("_", F.col("id"), i))
                    ),
                    1,
                    8,
                ),
            ),
        ).alias("text"),
    )


def run(spark, n: int) -> dict:
    from etlutils_spark.streaming.incremental_spans import (
        incremental_span_dedup,
    )

    root = os.path.join(tempfile.gettempdir(), f"span_probe_{os.getpid()}_{n}")
    shutil.rmtree(root, ignore_errors=True)
    src = os.path.join(root, "src")
    os.makedirs(src)
    kw = dict(
        index_dir=os.path.join(root, "index"),
        stats_dir=os.path.join(root, "stats"),
        checkpoint=os.path.join(root, "ckpt"),
        window=WINDOW,
    )
    schema = "doc_id bigint, text string"

    # seed: N stored docs in one availableNow batch
    synth_docs(spark, 0, n).coalesce(8).write.parquet(f"{src}/slice0.parquet")
    stream = spark.readStream.schema(schema).parquet(src + "/*")
    t0 = time.time()
    incremental_span_dedup(stream, **kw).awaitTermination()
    build_sec = round(time.time() - t0, 2)
    index_rows = spark.read.parquet(kw["index_dir"]).count()

    # timed: a FIXED batch of fresh docs against the stored index
    synth_docs(spark, n, BATCH).coalesce(1).write.parquet(
        f"{src}/slice1.parquet"
    )
    stream2 = spark.readStream.schema(schema).parquet(src + "/*")
    t0 = time.time()
    incremental_span_dedup(stream2, **kw).awaitTermination()
    extend_sec = round(time.time() - t0, 2)

    stats_rows = spark.read.parquet(kw["stats_dir"]).count()
    shutil.rmtree(root, ignore_errors=True)
    return {
        "stored_docs": n,
        "index_rows": index_rows,
        "build_sec": build_sec,
        "extend_batch_docs": BATCH,
        "extend_sec": extend_sec,
        "stats_rows": stats_rows,
    }


def main() -> None:
    from etlutils_spark.session import get_session

    sizes = [int(a) for a in sys.argv[1:]] or [20_000, 200_000]
    spark = get_session(
        "stress_span_index",
        **{"spark.driver.memory": "8g", "spark.sql.shuffle.partitions": "32"},
    )
    print(json.dumps([run(spark, n) for n in sizes], indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
