"""na_locf_plus_one — LOCF imputation plus position-within-NA-run.

Reference (R/utils.R:49-52):
    ix <- cumsum(is.na(x))
    zoo::na.locf(x) + ix - cummax(ix * !is.na(x))
Golden: c(2, NA, NA, 4, 5, 2, NA) -> c(2, 3, 4, 4, 5, 2, 3)
(R/utils.R:45-48): each NA is filled with the last observed value plus
its 1-based position within the current NA run.

Spark divergence (SURVEY §7.4): R rows are implicitly ordered; Spark
DataFrames are not, so ``order_by`` is mandatory, and ``partition_by``
scopes independent series (the reference operates on one vector).

Scale design: one window pass, all built-in expressions (last/sum/max
over a running frame) — whole-stage codegen, single shuffle on
``partition_by`` (or none if the data is already partitioned that way).
Without ``partition_by`` the window is global and single-task; that
matches the reference's single-vector semantics but is flagged for
scale — callers at 100 TB always partition.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def na_locf_plus_one(
    df: DataFrame,
    column: str,
    order_by: str | Sequence[str],
    partition_by: str | Sequence[str] | None = None,
    output_col: str | None = None,
) -> DataFrame:
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    out = output_col or column
    w = Window.orderBy(*order_cols)
    if partition_by is not None:
        parts = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        w = Window.partitionBy(*parts).orderBy(*order_cols)
    running = w.rowsBetween(Window.unboundedPreceding, 0)

    x = F.col(column)
    is_na = F.when(x.isNull(), F.lit(1)).otherwise(F.lit(0))
    locf = F.last(x, ignorenulls=True).over(running)
    ix = F.sum(is_na).over(running)
    anchor = F.max(ix * (1 - is_na)).over(running)  # cummax(ix * !is.na(x))
    return df.withColumn(out, locf + ix - F.coalesce(anchor, F.lit(0)))
