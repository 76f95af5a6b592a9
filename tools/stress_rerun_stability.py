#!/usr/bin/env python3
"""Repeated-run stability probe (round 13): re-running the SAME
pipeline in one long session must not get slower with run count.

Motivated by the round-13 persist_tracked finding — semantic_dedup's
3rd back-to-back run deterministically flipped from cached-broadcast
(~5 s) to recompute+sort-merge (~40 s) because evicting a same-plan
tracked frame uncached the live one. Any state keyed by plan, path, or
session (cache entries, scratch artifacts, stream checkpoints, JVM
broadcast cleanup) can produce the same signature: early runs fast,
late runs slow, deterministically.

For every query in the pinned band set, run 4 times back-to-back
(same protocol as repin_bands: noop write, clearCache between runs)
and flag any query whose LAST run exceeds ``RATIO`` x the min of its
first two runs. Box noise produces isolated spikes; a run-4 reading
persistently above the warm early runs is state accumulation.

    python3 tools/stress_rerun_stability.py [query ...]   # default: banded set
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = 4
RATIO = 2.0


def main() -> None:
    import __spark_entry__ as entry_mod
    from etlutils_spark.session import get_session
    from tools.repin_bands import PINNED_EXTRAS

    names = sys.argv[1:] or list(
        dict.fromkeys(bench.HEADLINE + PINNED_EXTRAS)
    )
    qs = entry_mod.queries()
    spark = get_session("rerun_stability")
    from etlutils_spark.sources.files import TABLES, read_table

    for t in TABLES:
        read_table(spark, t, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()

    flagged = {}
    out = {}
    for name in names:
        if name not in qs:
            print(f"SKIP {name}", file=sys.stderr)
            continue
        runs = []
        for _ in range(RUNS):
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        early = min(runs[:2])
        ratio = round(runs[-1] / max(early, 1e-9), 2)
        out[name] = {"runs": runs, "last_over_early": ratio}
        marker = "  <-- FLAG" if ratio > RATIO else ""
        print(f"{name}: {runs} last/early={ratio}{marker}", file=sys.stderr)
        if ratio > RATIO:
            flagged[name] = out[name]
    print(json.dumps({"sf_dir": SF_DIR, "runs_per_query": RUNS,
                      "ratio_threshold": RATIO, "flagged": flagged,
                      "queries": out}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
