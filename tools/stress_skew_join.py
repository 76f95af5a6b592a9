#!/usr/bin/env python3
"""AQE skew-join probe at the fat-tail hot key (r6 verdict #5): the
Zipf stress corpora measured every dedup STAGE, but never drove a JOIN
through AQE's skew splitter. This joins the fat-tail label table (head
dup cluster = 1% of the corpus on ONE cluster_id) to its per-cluster
survivor dim — the "rewrite every doc to its cluster survivor" join a
dedup pipeline runs — three ways:

  a) AQE skew-split OFF  (one reducer owns the hot cluster's payload)
  b) AQE skew-split ON   (runtime split; the executed plan must show a
     skewed AQEShuffleRead — asserted via collect() so the inspected
     QueryExecution is the one that ran, not a fresh compile)
  c) explicit salted_join (operators.skew) with AQE skew OFF — the
     plan that does not depend on AQE's post-shuffle stats seeing the
     skew

Two key distributions, because they answer different questions:
- "zipf": the stress corpora's 1%-head dup group. Honest finding: at
  32 reducers this is NOT reducer-skew (max/median ~1.4) and AQE
  correctly declines to split — the Zipf head hurts within-cluster
  quadratic stages (guarded elsewhere), not the survivor join.
- "mega": a boilerplate megacluster owning 50% of the corpus (what
  empty/template docs collapse into at warehouse scale) — the shape
  AQE's splitter exists for; it must fire and beat skew-off, and the
  salt must flatten the key histogram without AQE.
- "dupmega" (r13): mega with the hot rows made LITERAL duplicates —
  the r12 positional-salt change's motivating case. The probe records
  both the live salt's balance and the pre-r12 content-only salt's
  (which must show the pathology: every duplicate row on one sub-key).

    python3 tools/stress_skew_join.py [n_docs]   # default 500_000

Local thresholds: AQE's defaults only call a partition skewed past
256 MB; the local table is ~100 MB total, so the probe scales
skewedPartitionThresholdInBytes/advisory down proportionally — the
thresholds play exactly the role the defaults play at warehouse
partition sizes. Imbalance is reported as per-partition row counts of
the shuffle key (max/median), the direct proxy for reducer task time
in this workload. Pass rubric (BASELINE.md "AQE skew join"): (b)
beats (a), the skewed-read marker fires, and (c) is Exchange-balanced
(max/median ~1) without AQE.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tools.stress_dedup import make_corpus, zipf_sizes  # noqa: E402


def fat_tail_labels(spark, n: int):
    """(doc_id, cluster_id, text) with the stress corpus's known group
    structure labeled directly (cluster_id = group-min doc id — what
    build_dedup_clusters computes; synthesized here so the probe
    measures the JOIN, not the pipeline). Head cluster = sizes[0] docs
    (~1% of n) on one key; text rides along as the realistic payload."""
    docs, sizes = make_corpus(spark, n)
    starts = []
    s = 0
    for sz in sizes:
        starts.append((s, s + sz))
        s += sz
    bounds = spark.createDataFrame(
        starts or [(0, 0)], "lo long, hi long"
    )
    labeled = docs.join(
        F.broadcast(bounds),
        (F.col("doc_id") >= F.col("lo")) & (F.col("doc_id") < F.col("hi")),
        "left",
    ).select(
        "doc_id",
        F.coalesce(F.col("lo"), F.col("doc_id")).alias("cluster_id"),
        "text",
    )
    return labeled, (sizes[0] if sizes else 0)


def partition_balance(df, key_cols, n_part=32):
    """max/median rows per hash partition of the would-be shuffle key —
    the reducer-imbalance proxy."""
    counts = [
        r.n
        for r in df.groupBy(
            F.pmod(F.hash(*key_cols), F.lit(n_part)).alias("p")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    counts.sort()
    med = counts[len(counts) // 2] if counts else 0
    return {"max": max(counts, default=0), "median": med,
            "ratio": round(max(counts, default=0) / max(med, 1), 2)}


def mega_labels(spark, n: int):
    """(doc_id, cluster_id, text): half the corpus collapsed onto one
    boilerplate cluster (what empty/template docs become at warehouse
    scale), the rest singletons — the distribution AQE's skew splitter
    exists for."""
    docs, _ = make_corpus(spark, n)
    labeled = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.lit(0))
        .otherwise(F.col("doc_id"))
        .alias("cluster_id"),
        "text",
    )
    return labeled, n // 2


def dupmega_labels(spark, n: int):
    """mega with the hot cluster's rows made LITERAL DUPLICATES (every
    column identical — no doc_id, same payload): the classic hot key
    after a projection to key + low-cardinality measures, and the
    motivating case for the r12 positional salt — a content-only salt
    hash maps all of these rows to ONE sub-key, silently providing
    zero splitting exactly when it is needed."""
    docs, _ = make_corpus(spark, n)
    labeled = docs.select(
        F.when(F.col("doc_id") % 2 == 0, F.lit(0))
        .otherwise(F.col("doc_id"))
        .alias("cluster_id"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("boilerplate template row"))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return labeled, n // 2


def run(spark, n: int, shape: str = "zipf") -> dict:
    from etlutils_spark.operators.skew import salted_join

    shapes = {
        "zipf": fat_tail_labels,
        "mega": mega_labels,
        "dupmega": dupmega_labels,
    }
    labeled, head = shapes[shape](spark, n)
    labeled = labeled.persist()
    labeled.count()
    # survivor dim: one row per cluster (its min doc id == cluster_id).
    # Materialized through parquet, NOT .persist(): a cached aggregate
    # arrives at the join already partitioned by the join key, so
    # Catalyst plans NO exchange on that side — and OptimizeSkewedJoin
    # only matches a join whose BOTH children are shuffle stages (it
    # must replicate the dim partition matching a split fact
    # partition). A warehouse dim table is a scan + shuffle, which is
    # what this reproduces. (Found the hard way; the cached variant
    # silently never fires the splitter.)
    import tempfile

    dim_path = os.path.join(
        tempfile.gettempdir(), f"skew_dim_{os.getpid()}_{shape}_{n}"
    )
    labeled.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    ).write.mode("overwrite").parquet(dim_path)
    dim = spark.read.parquet(dim_path)
    n_dim = dim.count()

    def survivor_rewrite(j):
        # force the full joined payload through an aggregation so the
        # hot partition's rows are actually processed, not pruned
        return j.groupBy("cluster_size").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("payload_chars"),
        )

    def timed(df):
        # collect, not a noop write: the grouped result is ~tens of
        # rows, and collect() executes the DataFrame's OWN
        # QueryExecution, so the AQE final plan (skew markers) is
        # inspectable on the same object afterwards
        t0 = time.time()
        df.collect()
        return round(time.time() - t0, 2)

    conf = spark.conf
    prev = {k: conf.get(k) for k in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.enabled",
    )}
    out: dict = {"shape": shape, "corpus": n, "head_cluster_docs": head,
                 "dim_rows": n_dim}
    out["imbalance_raw"] = partition_balance(labeled, ["cluster_id"])
    try:
        # dim must NOT broadcast, or there is no shuffle join to skew
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        # scale the skew thresholds to local bytes (defaults assume
        # 256MB warehouse partitions)
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "1MB",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256KB")

        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        plain = survivor_rewrite(labeled.join(dim, "cluster_id"))
        out["aqe_off_sec"] = timed(plain)

        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        skewed = survivor_rewrite(labeled.join(dim, "cluster_id"))
        out["aqe_on_sec"] = timed(skewed)
        final_plan = skewed._jdf.queryExecution().executedPlan().toString()
        out["aqe_skew_split_fired"] = "skewed" in final_plan

        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        salted = survivor_rewrite(
            salted_join(labeled, dim, on="cluster_id")
        )
        out["salted_sec"] = timed(salted)
        # measure the ACTUAL salt expression (operators.skew._row_salt:
        # position + content hash), not a re-derivation — the previous
        # content-only copy here went stale when r12 mixed in the row
        # position, so it measured a salt the join no longer uses
        from etlutils_spark.operators.skew import _row_salt

        salted_keys = labeled.select(
            "cluster_id", _row_salt(labeled, 32).alias("__salt")
        )
        out["imbalance_salted"] = partition_balance(
            salted_keys, ["cluster_id", "__salt"]
        )
        # the motivating contrast for dupmega: the pre-r12 content-only
        # salt sends every duplicate hot row to ONE sub-key
        content_only = labeled.select(
            "cluster_id",
            F.pmod(
                F.xxhash64(*[F.col(c) for c in labeled.columns]), F.lit(32)
            ).alias("__salt"),
        )
        out["imbalance_salted_content_only"] = partition_balance(
            content_only, ["cluster_id", "__salt"]
        )
    finally:
        for k, v in prev.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
    labeled.unpersist()
    import shutil

    shutil.rmtree(dim_path, ignore_errors=True)
    return out


def main() -> None:
    from etlutils_spark.session import get_session

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    spark = get_session(
        "stress_skew_join",
        **{"spark.driver.memory": "8g", "spark.sql.shuffle.partitions": "32"},
    )
    print(json.dumps(
        [run(spark, n, "zipf"), run(spark, n, "mega"),
         run(spark, n, "dupmega")],
        indent=1,
    ))
    spark.stop()


if __name__ == "__main__":
    main()
