#!/usr/bin/env python3
"""BPE trainer scaling probe: bpe_train_corpus must train production
vocab sizes (8k merges) on corpora LARGER than bpe_train's doc-sample
bound, because its collect is the distinct-word table (Heaps-law
bounded), not docs.

    python3 tools/stress_bpe.py [docs] [vocab] [merges]
    # default 500000 200000 8192

Corpus = `docs` synthetic documents of 30 words each, drawn JVM-side
from a bounded `vocab`-word universe (8-hex-char words via md5 of a
bucketed hash — the sf0.1 documents table tops out at 31 distinct
words, which saturates BPE at ~90 merges, so a vocab-rich corpus is
required to exercise production merge counts). The corpus is far past
bpe_train's 10k-doc sample bound; bpe_train_corpus's collect is the
vocab-sized word table instead. Reports the Spark word-count wall
(the only corpus-sized term) vs the driver merge-induction wall
(vocab- and merge-count-sized), plus a sampled-trainer row at the
same merge count for comparison. Pass rubric: BASELINE.md "BPE
trainer at corpus scale".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    from etlutils_spark.operators.text import bpe_train, bpe_train_corpus
    from etlutils_spark.session import get_session

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    vocab = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    merges = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
    spark = get_session(
        "stress_bpe",
        **{"spark.driver.memory": "8g", "spark.sql.shuffle.partitions": "32"},
    )
    corpus = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(29)),
                lambda i: F.substring(
                    F.md5(
                        F.pmod(
                            F.xxhash64(F.col("id") * 31 + i), F.lit(vocab)
                        ).cast("string")
                    ),
                    1,
                    8,
                ),
            ),
        ).alias("text"),
    )
    n = corpus.count()

    t0 = time.time()
    word_rows = (
        corpus.select(
            F.explode(
                F.filter(
                    F.split("text", "[ \t\n\r\f]+"),
                    lambda w: F.length(w) > 0,
                )
            ).alias("__w")
        )
        .groupBy("__w")
        .count()
        .count()
    )
    count_sec = round(time.time() - t0, 2)

    t0 = time.time()
    merged = bpe_train_corpus(corpus, num_merges=merges)
    corpus_total_sec = round(time.time() - t0, 2)

    t0 = time.time()
    sampled = bpe_train(corpus, num_merges=merges)
    sampled_sec = round(time.time() - t0, 2)

    print(
        json.dumps(
            {
                "corpus_docs": n,
                "distinct_words": word_rows,
                "merges_requested": merges,
                "merges_learned_corpus": len(merged),
                "word_count_job_sec": count_sec,
                "corpus_trainer_total_sec": corpus_total_sec,
                "sampled_trainer_sec": sampled_sec,
                "sample_bound_docs": 10_000,
            },
            indent=1,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
