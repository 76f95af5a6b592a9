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
