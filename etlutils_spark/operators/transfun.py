"""trans_fun — the reference's per-chunk transform hook, Spark-first.

Reference (R/ffsql.R:39-40,116,183-187,292-296): ``transFUN`` receives
each fetched data.frame chunk before it is appended to the ffdf; it may
add/drop/retype columns and shapes the output schema. Extra args are
forwarded (R/ffsql.R:40,186).

Spark mapping (SURVEY §2.8): ``DataFrame.mapInPandas`` has the exact
same contract — an iterator of pandas DataFrames in, transformed frames
out, Arrow-batched. Contract carried over from the reference: the
transform must be row-local or batch-agnostic (chunk boundaries are not
deterministic in either system, SURVEY §7.4).

Prefer ``with_columns_exprs`` (native Column expressions, JVM-side)
whenever the transform is column-wise — ``trans_fun`` is the escape
hatch for genuinely imperative per-batch logic.
"""

from __future__ import annotations

from typing import Callable, Iterator, Mapping

import pandas as pd

from pyspark.sql import Column, DataFrame


def trans_fun(
    df: DataFrame,
    fn: Callable[..., pd.DataFrame],
    schema,
    *args,
    infer_sample_rows: int = 100,
    **kwargs,
) -> DataFrame:
    """Apply ``fn(chunk, *args, **kwargs)`` to every Arrow batch.

    ``schema`` is the output schema (DDL string or StructType) — lazy
    plans need a schema before execution. ``schema="infer"`` recovers
    the reference's schema-by-first-chunk ergonomics (R/ffsql.R:181-220):
    one bounded sample of ``infer_sample_rows`` rows is pulled to the
    driver, ``fn`` runs on it, and the output pandas frame's dtypes
    become the plan schema. Same footgun as the reference, stated up
    front: the sample must be REPRESENTATIVE — a dtype that only
    surfaces in later batches (e.g. the sample's column is all-NaN, or
    all-integral floats where later chunks carry strings) infers wrong
    and fails at execution; pass an explicit schema in that case.
    Inference runs ``fn`` once extra on the sample (cost: one
    ``limit``-pruned scan + a driver-side call).
    """
    if isinstance(schema, str) and schema == "infer":
        sample = df.limit(infer_sample_rows).toPandas()
        out = fn(sample, *args, **kwargs)
        if out is None or len(out) == 0:
            raise ValueError(
                "schema='infer' needs fn(sample) to return at least one "
                "row (empty output leaves object dtypes unresolvable); "
                "pass an explicit schema"
            )
        schema = df.sparkSession.createDataFrame(out.reset_index(drop=True)).schema

    def runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield fn(pdf, *args, **kwargs)

    return df.mapInPandas(runner, schema=schema)


def with_columns_exprs(df: DataFrame, exprs: Mapping[str, Column]) -> DataFrame:
    """The fast path for column-wise transFUNs: native expressions,
    no Python worker, stays inside whole-stage codegen."""
    return df.withColumns(dict(exprs))
