"""UDF-surface queries (SURVEY §2.8): the three Python extension points
— scalar pandas_udf, grouped applyInPandas, per-batch mapInPandas (the
last covered by transfun_derived_date / multimodal_features) — each with
an exact-match oracle where the computation is deterministic across
engines (integer ranks, ASCII string ops).

These exist to prove the Arrow-batched Python path produces results
identical to the JVM/SQL path — the contract a 100 TB pipeline needs
before mixing Python stages into relational plans.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from etlutils_spark.entry_queries import _t, register
from etlutils_spark.sources.files import spread


@register(
    "pandas_udf_normalize",
    """
    SELECT doc_id, md5(upper(text)) AS norm_hash,
           CAST(length(trim(text)) AS BIGINT) AS n_trimmed
    FROM documents
    """,
)
def q_pandas_udf_normalize(spark, sf_dir):
    """Scalar pandas_udf (Arrow-vectorized): string normalization in
    pandas, digest on the JVM side — byte-identical to SQL upper()."""

    @F.pandas_udf("string")
    def norm(s: pd.Series) -> pd.Series:
        return s.str.upper()

    @F.pandas_udf("long")
    def trimmed_len(s: pd.Series) -> pd.Series:
        return s.str.strip().str.len().astype("int64")

    docs = spread(_t(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.md5(norm("text")).alias("norm_hash"),
        trimmed_len("text").alias("n_trimmed"),
    )


@register(
    "grouped_apply_rank",
    """
    SELECT event_id, user_id,
           CAST(row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS BIGINT) AS seq,
           CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_user_events
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
    """,
)
def q_grouped_apply_rank(spark, sf_dir):
    """Grouped applyInPandas (the UDAF/grouped-map surface): per-user
    sequence numbers computed in pandas — integer outputs, exact parity
    with the window-function oracle."""

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        pdf["seq"] = range(1, len(pdf) + 1)
        pdf["n_user_events"] = len(pdf)
        return pdf[["event_id", "user_id", "seq", "n_user_events"]]

    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    return e.groupBy("user_id").applyInPandas(
        per_user,
        schema="event_id bigint, user_id bigint, seq bigint, n_user_events bigint",
    )


@register(
    "cogroup_asof_enrich",
    """
    WITH v AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type <> 'purchase'),
    p AS (
      SELECT user_id, ts, max(value) AS last_purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
    SELECT v.event_id, v.user_id, v.ts, v.value, p.last_purchase_value
    FROM v ASOF LEFT JOIN p
      ON v.user_id = p.user_id AND v.ts >= p.ts
    """,
)
def q_cogroup_asof(spark, sf_dir):
    """Co-grouped applyInPandas (the 4th Python extension point):
    per-user ``pd.merge_asof`` of non-purchase events against the
    purchase stream — enrich each event with the latest prior purchase
    value. Oracle: DuckDB's native ASOF LEFT JOIN, so the pandas
    cogroup path is proven bit-identical to a relational as-of.

    Purchases are pre-aggregated to unique (user_id, ts) so the
    equal-timestamp tie-break is engine-independent.

    Scale: cogroup shuffles BOTH sides once on the group key and feeds
    each user's pair of Arrow batches to one Python worker — the
    distributed form of a per-entity merge_asof. A hot user is the
    skew risk (one group = one task); the relational window form
    (asof_last_purchase) is the JVM alternative when that bites.
    """
    ev = _t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("last_purchase_value"))
    )

    cols = ["event_id", "user_id", "ts", "value", "last_purchase_value"]

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # Defensive on two Catalyst behaviors: (1) a group present on
        # only one side arrives as an empty frame; (2) under a plan
        # that consumes none of the payload outputs (e.g. count()),
        # column pruning can strip input columns BELOW the cogroup
        # node — the frames then lack 'ts' etc. In that case only the
        # output ROW COUNT is observable, so emit the right number of
        # rows with nulls for whatever is unavailable.
        n = len(left)
        if n == 0:
            return pd.DataFrame(columns=cols)
        have = set(left.columns)
        if "ts" not in have:  # pruned: count-only plan
            out = pd.DataFrame({c: left[c] if c in have else [None] * n for c in cols})
            return out
        left = left.sort_values("ts")
        if len(right) == 0 or "ts" not in right.columns:
            out = left.copy()
            out["last_purchase_value"] = pd.Series(
                [float("nan")] * n, index=out.index, dtype="float64"
            )
            return out[cols]
        right = right.sort_values("ts")
        out = pd.merge_asof(
            left,
            right[["ts", "last_purchase_value"]],
            on="ts",
            direction="backward",
            allow_exact_matches=True,
        )
        return out[cols]

    return (
        views.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(
            lambda l, r: merge(l, r),
            schema="event_id bigint, user_id bigint, ts timestamp, value double, "
            "last_purchase_value double",
        )
    )
