#!/usr/bin/env python3
"""Scale probe for ccnet_lm_buckets: exact (per-language NTILE sort)
vs approx (percentile_approx thresholds broadcast onto a stateless
compare) at 1x and 10x corpus.

What the numbers must show for the 100 TB argument: the approx mode's
advantage GROWS with corpus size — exact pays a per-language global
sort over every scored doc (rank mass grows with the corpus and the
sort is all-to-one per language key), while approx pays one combinable
sketch aggregate plus a broadcast compare. At bench SFs both sit near
the fixed per-query floor; the 10x replica is where the gap opens.

Usage: python3 tools/stress_ccnet.py  (records to stderr; paste into
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

    from etlutils_spark.operators.search import ccnet_lm_buckets
    from etlutils_spark.session import get_session
    from etlutils_spark.sources.files import read_table

    spark = get_session("stress_ccnet")
    docs = read_table(spark, "documents", SF_DIR).select(
        "doc_id", "text", "lang"
    )
    n = docs.count()
    # replica id stride must clear the MAX id, not the count — sparse
    # or offset doc_ids would otherwise collide across replicas
    # (review catch; dense 0-based corpora make the two identical)
    stride = (docs.agg(F.max("doc_id")).first()[0] or 0) + 1

    def replicate(k: int):
        if k == 1:
            return docs
        return (
            docs.crossJoin(
                F.broadcast(spark.range(k).select(F.col("id").alias("__r")))
            )
            .select(
                (F.col("doc_id") + F.col("__r") * stride).alias("doc_id"),
                # per-replica token salt so the model and score mass
                # actually grow (pure replication would dedupe nothing
                # but also not change rank structure)
                F.concat_ws(
                    " ", F.col("text"),
                    F.concat(F.lit("rep"), F.col("__r")),
                ).alias("text"),
                "lang",
            )
        )

    for k in (1, 10):
        corpus = replicate(k).persist()
        corpus.count()
        for mode in ("exact", "approx"):
            best = None
            for _ in range(3):
                t0 = time.time()
                ccnet_lm_buckets(corpus, mode=mode).write.format(
                    "noop"
                ).mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                # approx persists its scored frame internally; clear so
                # the next attempt measures a full run, not a cache hit
                # (the replicated corpus itself is re-persisted below)
                spark.catalog.clearCache()
                corpus.persist()
                corpus.count()
            print(
                f"corpus {k}x ({n * k} docs) {mode}: min-of-3 {best:.2f}s",
                file=sys.stderr,
            )
        corpus.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
