#!/usr/bin/env python3
"""Probe: jaccard_pairs pair generation — self-join vs groupBy+HOF.

Round-13 negative-result experiment (BASELINE.md "Jaccard pair
generation: join vs groupBy+HOF"): replaces the shingle self-join with
ONE groupBy on the hashed shingle + collect_list + a higher-order
nested-transform pair expansion, and times both from the same persisted
shingle frame. Only meaningful for df-bounded shingle inputs (the HOF
variant builds O(g^2) structs per group row). Asserts both variants
produce identical (doc_id_1, doc_id_2, n_common) rows.

    python3 tools/probe_jaccard_pairgen.py  # sf0.1, min-of-3 each
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etlutils_spark.extension_queries import NGRAM_JACCARD_MAX_DOC_FREQ
from etlutils_spark.operators.dedup import (
    _persist_tracked,
    jaccard_pairs,
    shingle_rows,
)
from etlutils_spark.session import get_session
from etlutils_spark.sources.files import read_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _time_min(build, spark, n=3):
    best = None
    for _ in range(n):
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        elapsed = time.time() - t0
        best = elapsed if best is None else min(best, elapsed)
    return round(best, 3)


def inter_join(shingles):
    """Pair counting as shipped: hashed-key self-join + count agg."""
    sh_h = F.xxhash64("shingle")
    a = shingles.select(F.col("doc_id").alias("doc_id_1"), sh_h.alias("sh_1"))
    b = shingles.select(F.col("doc_id").alias("doc_id_2"), sh_h.alias("sh_2"))
    return (
        a.join(b, on=[F.col("sh_1") == F.col("sh_2"),
                      F.col("doc_id_1") < F.col("doc_id_2")])
        .groupBy("doc_id_1", "doc_id_2")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )


def inter_group(shingles):
    """Pair counting via ONE shuffle: group docs per shingle hash, then
    expand ordered pairs with nested transform/slice over the sorted id
    array. O(g^2) structs per group — df-bounded inputs only."""
    sh_h = F.xxhash64("shingle")
    grouped = (
        shingles.select(sh_h.alias("sh_h"), "doc_id")
        .groupBy("sh_h")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pairs = F.flatten(F.expr(
        "transform(ids, (x, i) -> transform(slice(ids, i + 2, size(ids)), "
        "y -> struct(x as id1, y as id2)))"
    ))
    return (
        grouped.select(F.explode(pairs).alias("p"))
        .filter(F.col("p.id1") < F.col("p.id2"))
        .select(F.col("p.id1").alias("doc_id_1"),
                F.col("p.id2").alias("doc_id_2"))
        .groupBy("doc_id_1", "doc_id_2")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )


def main() -> None:
    spark = get_session("probe_jaccard_pairgen")
    docs = read_table(spark, "documents", SF)

    # warmup at a smaller SF so codegen/JIT land outside timings
    warm = shingle_rows(
        read_table(spark, "documents", "/root/testdata/sf0.01"),
        max_doc_freq=NGRAM_JACCARD_MAX_DOC_FREQ,
    )
    jaccard_pairs(warm, threshold=0.2).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    sh = lambda: shingle_rows(docs, max_doc_freq=NGRAM_JACCARD_MAX_DOC_FREQ)  # noqa: E731
    print("shingles alone:", _time_min(sh, spark))
    spark.catalog.clearCache()
    print("full query (join-based):",
          _time_min(lambda: jaccard_pairs(sh(), threshold=0.2), spark))
    spark.catalog.clearCache()

    shp = _persist_tracked(sh())
    shp.write.format("noop").mode("overwrite").save()  # materialize once
    print("inter join-based:", _time_min(lambda: inter_join(shp), spark))
    print("inter group-based:", _time_min(lambda: inter_group(shp), spark))

    a = {tuple(r) for r in inter_join(shp).collect()}
    b = {tuple(r) for r in inter_group(shp).collect()}
    assert a == b, f"variant mismatch: {len(a)} vs {len(b)} pairs"
    print(f"rows equal: True ({len(a)} pairs)")


if __name__ == "__main__":
    main()
