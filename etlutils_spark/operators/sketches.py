"""Approximate (sketch-based) aggregation — the one-pass alternatives a
100 TB pipeline uses where exact answers would expand-shuffle:

- ``approx_count_distinct`` (HyperLogLog++): no expand, mergeable,
  fixed memory per group; rsd parameter trades memory for error.
- ``percentile_approx`` (KLL-style quantile sketch): single pass vs the
  full sort exact percentiles need.
- ``freqItems`` (heavy hitters).

All deterministic for a fixed input+parameters (sketches are
hash-based, not sampled), so results are stable run to run — but not
portable across engines, hence unit-test tolerance checks rather than
DuckDB oracles.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame, keys: Sequence[str], col: str, rsd: float = 0.05,
    alias: str = "approx_distinct",
) -> DataFrame:
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(col, rsd=rsd).alias(alias)
    )


def approx_quantiles(
    df: DataFrame, keys: Sequence[str], col: str,
    probabilities: Sequence[float] = (0.25, 0.5, 0.75),
    accuracy: int = 10_000,
) -> DataFrame:
    return df.groupBy(*keys).agg(
        F.percentile_approx(
            col, F.array(*[F.lit(p) for p in probabilities]), F.lit(accuracy)
        ).alias("quantiles")
    )


def heavy_hitters(
    df: DataFrame, col: str, support: float = 0.01
) -> list:
    """Frequent-items sketch (Karp-Schenker-Papadimitriou via Spark's
    ``stat.freqItems``): returns the candidate item list for ``col``.
    Guarantee: every item with true frequency > ``support * n`` IS in
    the list (false positives possible, false negatives not) — the
    one-pass, fixed-memory alternative to a full groupBy at 100 TB.
    The list is at most ~1/support items, so returning it to the
    driver is bounded by the parameter, not the data."""
    row = df.stat.freqItems([col], support).first()
    return list(row[f"{col}_freqItems"])
