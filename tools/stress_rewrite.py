#!/usr/bin/env python3
"""Scale probe for decontaminate_rewrite (span-level eval
decontamination): Zipf-duplicated corpora at increasing sizes vs a
~1k-doc benchmark slice, wall-clock per scale. The r10 positioned-gram
probe changed the operator's cost shape (grams are exploded with
positions and filtered by the broadcast benchmark BEFORE the
distinct/count shuffle), so the r9 "10x docs = 2.6x wall" claim is
re-measured on the new form here.

    python3 tools/stress_rewrite.py [50000 500000]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_corpus(spark, n: int, mod: int = 99_991):
    """Deterministic synthetic docs: ~60 tokens each. With the default
    prime modulus > corpus size, token sequences are unique per doc, so
    a 1k-doc benchmark slice contaminates exactly its own 1k docs and
    the remaining corpus exercises the clean-span REASSEMBLY path at
    full mass (a small modulus instead makes every doc quote the
    benchmark — the max-contamination worst case)."""
    from pyspark.sql import functions as F

    base = spark.range(n).withColumn(
        "text",
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"w{k}_"), ((F.col("id") + k) % mod).cast("string"))
                for k in range(60)
            ],
        ),
    )
    return base.select(F.col("id").alias("doc_id"), "text")


def main() -> None:
    from etlutils_spark.operators.dedup import decontaminate_rewrite
    from etlutils_spark.session import get_session

    scales = [int(a) for a in sys.argv[1:]] or [50_000, 500_000]
    spark = get_session(
        "stress-rewrite",
        **{"spark.driver.memory": "24g", "spark.sql.shuffle.partitions": "64"},
    )
    bench = make_corpus(spark, 1_000).localCheckpoint(eager=True)
    for n in scales:
        docs = make_corpus(spark, n)
        t0 = time.time()
        out = decontaminate_rewrite(docs, bench, window=32, n=3)
        cnt = out.count()
        wall = time.time() - t0
        print(f"n={n}: {wall:.1f} s, {cnt} surviving docs", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
