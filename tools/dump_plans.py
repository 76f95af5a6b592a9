#!/usr/bin/env python3
"""Dump `.explain("formatted")` for registered queries to one file per
query — the before/after plan evidence for optimization rounds.

    python3 tools/dump_plans.py OUTDIR SUFFIX [name ...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each query (all registered
queries when no names given). Plan-only (no job runs); uses sf0.001 so
scan-relations stay small. Run from the repo checkout whose plans you
want (a git worktree of an older commit gives the "before" set).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    wanted = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as entry_mod
    from etlutils_spark.session import get_session

    qs = entry_mod.queries()
    names = wanted if wanted else sorted(qs)
    spark = get_session("dump_plans")
    n_ok = n_err = 0
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not registered")
            continue
        try:
            df = qs[name](spark, SF)
            plan = df._jdf.queryExecution().explainString(
                df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(plan)
            n_ok += 1
        except Exception as e:  # noqa: BLE001 — record and continue
            print(f"ERR {name}: {type(e).__name__}: {e}")
            n_err += 1
    print(f"wrote {n_ok} plans to {outdir} ({n_err} errors)")


if __name__ == "__main__":
    main()
