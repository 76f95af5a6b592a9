#!/usr/bin/env python3
"""Scale probe for the NB classifier filter: corpus 1x vs 10x
(replicated with distinct ids and per-replica token salt so the
vocabulary actually grows), vocabulary mode vs hashing-trick mode.

What the numbers must show for the 100 TB argument:
- wall-clock grows ~linearly with corpus (the token-keyed agg and the
  per-doc agg are both combinable — no superlinear stage);
- the VOCAB-mode model grows with the corpus (Heaps) while the HASHED
  model stays exactly hash_dim rows — the broadcast-side bound that
  makes hashed mode safe at any corpus size;
- the SHUFFLE-JOIN escape hatch (broadcast_weights=False — the path a
  vocab too big to broadcast must take) completes at a vocabulary that
  exceeds the broadcast budget, measured with the budget actually
  exceeded: the fat-vocab tier plants 8 unique tokens per doc and the
  probe drops spark.sql.autoBroadcastJoinThreshold to 1 MB so Spark
  cannot silently rescue the measurement with a broadcast (r11 verdict
  stretch #6 — the escape hatch needs a recorded number like every
  other scale claim).

Usage: python3 tools/stress_nb.py   (records to stderr; paste into
BASELINE.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from etlutils_spark.operators.quality import (
        nb_classifier_scores,
        nb_token_weights,
    )
    from etlutils_spark.session import get_session
    from etlutils_spark.sources.files import read_table

    spark = get_session("stress_nb")
    docs = read_table(spark, "documents", SF_DIR)
    n = docs.count()
    # replica stride clears the MAX id so sparse/offset doc_ids cannot
    # collide across replicas (review catch)
    stride = (docs.agg(F.max("doc_id")).first()[0] or 0) + 1

    def replicate(k: int):
        # every doc carries a unique token (the realistic web-corpus
        # property — URLs/ids/typos make vocabulary grow with corpus;
        # the bench corpus's native vocab is a fixed ~31 words, which
        # would hide the model-growth contrast this probe exists for)
        base = docs if k == 1 else (
            docs.crossJoin(
                F.broadcast(spark.range(k).select(F.col("id").alias("__r")))
            )
            .select(
                (F.col("doc_id") + F.col("__r") * stride).alias("doc_id"),
                F.concat_ws(
                    " ", F.col("text"),
                    F.concat(F.lit("rep"), F.col("__r")),
                ).alias("text"),
                "n_chars",
            )
        )
        return base.withColumn(
            "text",
            F.concat_ws(
                " ", F.col("text"), F.concat(F.lit("u"), F.col("doc_id"))
            ),
        )

    for k in (1, 10):
        corpus = replicate(k).persist()
        corpus.count()
        label = F.col("n_chars") >= 300
        for mode, hd in (("vocab", None), ("hashed", 1024)):
            t0 = time.time()
            w = nb_token_weights(corpus, label=label, hash_dim=hd).persist()
            rows = w.count()
            t_train = time.time() - t0
            t0 = time.time()
            nb_classifier_scores(corpus, w, hash_dim=hd).write.format(
                "noop"
            ).mode("overwrite").save()
            t_score = time.time() - t0
            print(
                f"corpus {k}x ({n * k} docs) {mode}: train {t_train:.2f}s "
                f"score {t_score:.2f}s model_rows {rows}",
                file=sys.stderr,
            )
            w.unpersist()
        corpus.unpersist()

    # fat-vocab tier: 8 extra unique tokens per doc at 10x -> vocab in
    # the hundreds of thousands; broadcast threshold pinned to 1 MB so
    # the weight table positively exceeds it and the join must shuffle
    corpus = replicate(10)
    corpus = corpus.withColumn(
        "text",
        F.concat_ws(
            " ", F.col("text"),
            F.concat_ws(
                " ",
                *[F.concat(F.lit(f"v{j}_"), F.col("doc_id"))
                  for j in range(8)],
            ),
        ),
    ).persist()
    corpus.count()
    label = F.col("n_chars") >= 300
    w = nb_token_weights(corpus, label=label).persist()
    rows = w.count()
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(1024 * 1024))
    try:
        for bw, tag in ((False, "shuffle-join"), (True, "forced-broadcast")):
            t0 = time.time()
            nb_classifier_scores(
                corpus, w, broadcast_weights=bw
            ).write.format("noop").mode("overwrite").save()
            print(
                f"fat-vocab 10x {tag}: score {time.time() - t0:.2f}s "
                f"model_rows {rows}",
                file=sys.stderr,
            )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    w.unpersist()
    corpus.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
