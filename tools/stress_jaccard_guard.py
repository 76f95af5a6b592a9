#!/usr/bin/env python3
"""Hot-shingle stress for jaccard_pairs' ``max_shingle_df`` guard
(VERDICT.md r11 "What's wrong" #1 / "Next round" #2).

    python3 tools/stress_jaccard_guard.py [N ...]   # default: 2000 20000

Corpus (deterministic, JVM-side): N docs of 20 md5-derived unique
tokens each, every doc ending in the SAME 3-token boilerplate footer —
so one word-3-gram shingle has document frequency N. Plus 10 planted
near-dup pairs whose overlap does NOT depend on the footer. The exact
self-join therefore materializes ~N(N-1)/2 co-footer pairs unguarded;
with ``max_shingle_df`` the footer shingle is dropped before the join
and output collapses to the planted pairs.

Per scale the report records: unguarded pair count + wall (skipped
above 2k docs — at 20k it would be 2x10^8 join rows, the point of the
guard), guarded pair count + wall, and that all 10 planted pairs
survive the guard. Pass rubric: guarded output == 10 at every scale
and guarded wall grows ~linearly in N (it is a scan + two hash aggs +
a semi-join — no quadratic stage left).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


FOOTER = "footera footerb footerc"


def make_corpus(spark, n: int):
    tok = lambda seed: F.substring(F.md5(seed), 1, 8)  # noqa: E731
    body = lambda salt: F.concat_ws(  # noqa: E731
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(19)),
            lambda i: tok(F.concat_ws(":", F.lit(salt), F.col("id"), i)),
        ),
    )
    singles = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", body("solo"), F.lit(FOOTER)).alias("text"),
    )
    # 10 planted near-dup pairs: ids n..n+9 pair with n+10..n+19; the
    # pair shares its 20-token body except ONE token, so the overlap
    # lives entirely outside the footer
    base = spark.range(n, n + 10).select(
        F.col("id"), body("pair").alias("b")
    )
    left = base.select(F.col("id").alias("doc_id"),
                       F.concat_ws(" ", "b", F.lit(FOOTER)).alias("text"))
    right = base.select(
        (F.col("id") + 10).alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat_ws(" ", F.slice(F.split("b", " "), 1, 19)),
            tok(F.concat_ws(":", F.lit("mut"), F.col("id"))),
            F.lit(FOOTER),
        ).alias("text"),
    )
    return singles.unionByName(left).unionByName(right)


def run_scale(spark, n: int) -> dict:
    from etlutils_spark.operators.dedup import jaccard_pairs, shingle_rows

    docs = make_corpus(spark, n).persist()
    n_docs = docs.count()
    sh = shingle_rows(docs).persist()
    sh.count()
    out: dict = {"n_docs": n_docs}

    if n <= 2000:  # unguarded quadratic baseline only where feasible
        t0 = time.time()
        out["unguarded_pairs"] = jaccard_pairs(sh, threshold=0.01).count()
        out["unguarded_sec"] = round(time.time() - t0, 2)

    # cap scales with N so the footer (df = n_docs) is always dropped
    # and the planted pairs' shingles (df = 2) always survive — a
    # hardcoded 100 made the assert below fail for N <= 80
    cap = min(100, max(2, n // 2))
    t0 = time.time()
    guarded = jaccard_pairs(sh, threshold=0.01, max_shingle_df=cap)
    got = {(r.doc_id_1, r.doc_id_2) for r in guarded.collect()}
    out["guarded_pairs"] = len(got)
    out["guarded_sec"] = round(time.time() - t0, 2)
    planted = {(n + i, n + i + 10) for i in range(10)}
    assert got == planted, f"guarded output != planted pairs: {sorted(got)[:5]}"

    sh.unpersist()
    docs.unpersist()
    return out


def main() -> None:
    from etlutils_spark.session import get_session

    scales = [int(a) for a in sys.argv[1:]] or [2000, 20000]
    spark = get_session(
        "stress_jaccard_guard",
        **{"spark.driver.memory": "8g", "spark.sql.shuffle.partitions": "32"},
    )
    report = {}
    for n in scales:
        report[f"n={n}"] = run_scale(spark, n)
        print(json.dumps({f"n={n}": report[f"n={n}"]}), file=sys.stderr)
    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
