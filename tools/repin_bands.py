#!/usr/bin/env python3
"""Re-pin the BASELINE.md drift-watch bands: min-of-5 per query with all
raw runs recorded, in ONE session on an (ideally) idle box.

The r9-era band recordings drifted 1.5-2x from box-window shift with
zero code changes (r10 verdict "What's wrong" #3), so they could no
longer detect a real regression. This tool re-measures the full
headline set plus the most expensive / previously-flagged extras and
prints a JSON blob whose min-of-5 values become the new pinned bands
(regression threshold = 2x the pinned min, the same shared-box variance
envelope BASELINE.md has documented since round 2).

Usage: python3 tools/repin_bands.py [extra query names...]
       python3 tools/repin_bands.py --only name1 name2 ...
Writes tools/repin_bands_out.json and prints a markdown table stub.
With --only, measures ONLY the named queries (for finishing a re-pin
session that was interrupted partway) and writes
tools/repin_bands_only_out.json so the main recording is not clobbered.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (HEADLINE list + SF_DIR convention)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# extras re-pinned alongside the headline: the r10-flagged drift movers
# plus the most expensive extras (the ones whose bands matter most)
PINNED_EXTRAS = [
    "quality_rank_blend",
    "ann_pq_recall_contract",
    "scd2_history",
    "dedup_clusters_incremental",
    "ann_index_streaming",
    "bpe_encode_docs_bigvocab",
    "dedup_clusters_streaming",
    "ann_index_topk",
    "curation_pipeline_batch",
    "bpe_roundtrip_docs",
    "decontaminate_rewrite_docs",
    "ccnet_lm_buckets",
    "ccnet_lm_approx_contract",
]

ATTEMPTS = 5


def main() -> None:
    import __spark_entry__ as entry_mod
    from etlutils_spark.session import get_session

    only_mode = len(sys.argv) > 1 and sys.argv[1] == "--only"
    if only_mode:
        names = sys.argv[2:]
        out_name = "repin_bands_only_out.json"
    else:
        names = bench.HEADLINE + PINNED_EXTRAS + sys.argv[1:]
        out_name = "repin_bands_out.json"
    qs = entry_mod.queries()
    spark = get_session("repin")
    # same two-tier warmup as bench.py: tables + worker pool + one
    # sf0.01 pass per query so codegen/JIT sit outside the timed region
    from etlutils_spark.sources.files import TABLES, read_table

    for t in TABLES:
        read_table(spark, t, SF_DIR).write.format("noop").mode("overwrite").save()

    def _idy(it):
        for pdf in it:
            yield pdf

    (
        spark.range(0, 1000, 1, spark.sparkContext.defaultParallelism)
        .mapInPandas(_idy, schema="id long")
        .write.format("noop").mode("overwrite").save()
    )
    warm_sf = "/root/testdata/sf0.01"
    for name in names:
        if name in qs and os.path.isdir(warm_sf):
            qs[name](spark, warm_sf).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    out: dict[str, dict] = {}
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not registered", file=sys.stderr)
            continue
        runs = []
        for _ in range(ATTEMPTS):
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {"min": min(runs), "runs": runs}
        print(f"{name}: min {min(runs)} of {runs}", file=sys.stderr)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "tools", out_name), "w") as fh:
        json.dump({"sf_dir": SF_DIR, "attempts": ATTEMPTS, "queries": out},
                  fh, indent=1)
    # markdown stub for BASELINE.md
    print("| query | min-of-5 | raw runs | regression threshold |")
    print("|---|---|---|---|")
    for name, rec in out.items():
        raw = ", ".join(f"{r}" for r in rec["runs"])
        print(f"| {name} | {rec['min']} | {raw} | >{rec['min'] * 2:.2f} s |")
    spark.stop()


if __name__ == "__main__":
    main()
