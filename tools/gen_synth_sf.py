#!/usr/bin/env python3
"""Synthesize a larger deterministic dataset by replica-shifting sf0.1
(VERDICT r13 item 7: a committed scaling record at a larger SF so the
low/high-core ratios measure parallelism instead of per-job fixed
overhead).

    python3 tools/gen_synth_sf.py OUTDIR [REPLICAS]   # default 10

Each replica r shifts every entity key by r * 10^9 (far above any real
key) so joins stay within-replica and cardinalities scale linearly;
document text is prefixed with a replica token so the near-dup
workload scales linearly too (pure replication would square the
pair/cluster mass and measure a different algorithm). Dimension
tables (nation, region) are shared, like TPC-H. Deterministic: no
rand(), the transform is a pure function of the stored rows."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

SRC = os.environ.get("SRC_SF_DIR", "/root/testdata/sf0.1")
SHIFT = 1_000_000_000

KEY_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["user_id"],
}
SHARED = ["nation", "region"]


def replicate(df: DataFrame, keys: list[str], replicas: int,
              text_col: str | None = None) -> DataFrame:
    out = None
    for r in range(replicas):
        rep = df
        for k in keys:
            rep = rep.withColumn(k, (F.col(k) + F.lit(r * SHIFT)).cast("long"))
        if text_col is not None and r > 0:
            rep = rep.withColumn(
                text_col, F.concat(F.lit(f"r{r} "), F.col(text_col))
            )
        out = rep if out is None else out.unionByName(rep)
    return out


def main() -> None:
    outdir = sys.argv[1]
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(outdir, exist_ok=True)
    from etlutils_spark.session import get_session

    spark = get_session("gen_synth_sf")
    for tbl in SHARED:
        spark.read.parquet(f"{SRC}/{tbl}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{outdir}/{tbl}.parquet")
        print(f"{tbl}: shared copy")
    for tbl, keys in KEY_COLS.items():
        df = spark.read.parquet(f"{SRC}/{tbl}.parquet")
        text_col = "text" if tbl == "documents" else None
        rep = replicate(df, keys, replicas, text_col)
        # enough files that a 32-core scan has headroom (guide §6:
        # splits cap scan parallelism — the first cut of this dataset
        # wrote 4-8 files/table and the 32-core run could not beat the
        # 8-core run on scans)
        rep.repartition(
            64 if tbl in ("lineitem", "orders", "events", "documents") else 32
        ).write.mode("overwrite").parquet(f"{outdir}/{tbl}.parquet")
        n = spark.read.parquet(f"{outdir}/{tbl}.parquet").count()
        print(f"{tbl}: {n} rows x{replicas}")
    spark.stop()


if __name__ == "__main__":
    main()
