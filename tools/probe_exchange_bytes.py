#!/usr/bin/env python3
"""Per-Exchange shuffle-byte evidence for plan-shape claims.

Runs named registered queries to completion (noop sink) and dumps every
Exchange node of the EXECUTED plan (post-AQE) with its SQL metrics —
dataSize / shuffle bytes written / records — so "the screen exchange no
longer carries embedding arrays" is checkable as bytes, not prose
(r13 verdict item 1: "record the exchange-size metric from the UI or a
dataSize probe"; the session runs with spark.ui.enabled=false, so this
walks queryExecution.executedPlan via py4j instead of the UI).

Usage:
    python3 tools/probe_exchange_bytes.py ann_cosine_topk [more names]
    SF_DIR=/root/testdata/sf0.1 python3 tools/probe_exchange_bytes.py ...
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")


def walk(node, out):
    """Collect (nodeName, metrics, output-width summary) for every
    exchange-ish node in an executed SparkPlan (recursing into AQE's
    final plan and reused/broadcast subtrees)."""
    name = node.nodeName()
    if "AdaptiveSparkPlan" in name:
        walk(node.executedPlan(), out)
        return
    if "QueryStage" in name:
        walk(node.plan(), out)
        return
    if "Exchange" in name or "ShuffleRead" in name:
        metrics = {}
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            metrics[kv._1()] = kv._2().value()
        cols = []
        oit = node.output().iterator()
        while oit.hasNext():
            att = oit.next()
            cols.append(f"{att.name()}:{att.dataType().simpleString()}")
        out.append({"node": name, "columns": cols, "metrics": metrics})
    cit = node.children().iterator()
    while cit.hasNext():
        walk(cit.next(), out)


def main() -> None:
    import __spark_entry__ as entry_mod
    from etlutils_spark.session import get_session

    names = sys.argv[1:]
    qs = entry_mod.queries()
    spark = get_session("probe_exchange_bytes")
    report = {}
    for name in names:
        if name not in qs:
            print(f"SKIP unknown query: {name}", file=sys.stderr)
            continue
        df = qs[name](spark, SF_DIR)
        # drive the DataFrame's OWN QueryExecution (a noop write plans a
        # separate one whose metrics this walk would never see); result
        # sets of registered queries are small, so collect() is safe
        df.collect()
        out: list[dict] = []
        walk(df._jdf.queryExecution().executedPlan(), out)
        report[name] = out
        spark.catalog.clearCache()
    print(json.dumps(report, indent=1, default=str))


if __name__ == "__main__":
    main()
