#!/usr/bin/env python3
"""Measure whether the spread() parallelism lever pays for an input.

Single-file (one-row-group) parquet scans run as ONE task regardless of
core count (see sources/files.py::spread); spread() buys parallelism
with one shuffle. Whether that trade wins depends on the per-row cost
of the downstream stage — this harness measures it instead of guessing:
for each table it times a cheap stage (count-style, scan-dominated) and
a CPU-heavy stage (md5 + shingle explode, compute-dominated), native vs
spread, and prints one JSON line per table with the measured speedups
and the break-even verdict.

Usage: python3 tools/scan_tuning.py [table ...]   (default: documents lineitem)
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _time(df) -> float:
    best = None
    for _ in range(2):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = time.time() - t0 if best is None else min(best, time.time() - t0)
    return round(best, 3)


def heavy_stage(df):
    """A compute-bound stage: per-row md5 over all columns + a 3-gram
    explode on the longest string column (mirrors the dedup pipelines)."""
    from pyspark.sql import functions as F

    text_cols = [f.name for f, t in zip(df.schema.fields, df.dtypes) if t[1] == "string"]
    out = df.withColumn(
        "h", F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in df.columns]))
    )
    if text_cols:
        c = text_cols[0]
        out = out.withColumn("tok", F.explode(F.split(F.col(c), " "))).withColumn(
            "tok_h", F.md5("tok")
        )
    return out


def main() -> None:
    from etlutils_spark.session import get_session
    from etlutils_spark.sources.files import read_table, spread

    tables = sys.argv[1:] or ["documents", "lineitem"]
    spark = get_session("scan_tuning", **{"spark.driver.memory": "8g"})
    par = spark.sparkContext.defaultParallelism
    for t in tables:
        df = read_table(spark, t, SF_DIR)
        n_parts = df.rdd.getNumPartitions()
        cheap_native = _time(df)
        cheap_spread = _time(spread(df))
        heavy_native = _time(heavy_stage(df))
        heavy_spread = _time(heavy_stage(spread(df)))
        print(
            json.dumps(
                {
                    "table": t,
                    "scan_partitions": n_parts,
                    "parallelism": par,
                    "cheap_native_sec": cheap_native,
                    "cheap_spread_sec": cheap_spread,
                    "heavy_native_sec": heavy_native,
                    "heavy_spread_sec": heavy_spread,
                    "heavy_speedup": round(heavy_native / max(heavy_spread, 1e-9), 2),
                    "verdict": (
                        "spread pays (CPU-bound stage)"
                        if heavy_spread < heavy_native * 0.8
                        else "native scan fine (scan-bound or already parallel)"
                    ),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
