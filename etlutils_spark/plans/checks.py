"""Runtime validations + plan audit helpers.

The reference's only cardinality guarantee is the unique-right-key check
(R/matchmerge.R:148-160, exposed here via operators.matchmerge); its
``levels=`` argument (R/ffsql.R:190-200) pre-seeds factor dictionaries —
in Spark the factor machinery is storage-transparent, so ``levels``
becomes a *domain validation* (SURVEY §1.2): assert a column only takes
values from a known dictionary.

The plan-audit helpers make the scale checks (pushdown happened, join
went broadcast, codegen is on) scriptable — used by tests and bench.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DomainError(ValueError):
    """Column contains values outside the declared level dictionary."""


def assert_levels(df: DataFrame, column: str, levels: Sequence[str], sample: int = 5) -> None:
    """Validate that ``column`` ⊆ ``levels`` (NULL always allowed).

    One pruned-column aggregation; ``levels`` travels in the plan as a
    literal IN-list (fine for dictionary-sized domains, which is what
    factor levels are).
    """
    bad = (
        df.select(column)
        .where(F.col(column).isNotNull() & ~F.col(column).isin(list(levels)))
        .limit(sample)
        .collect()
    )
    if bad:
        vals = sorted({r[0] for r in bad})
        raise DomainError(f"column {column!r} has values outside levels: {vals}")


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (for audits/tests)."""
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def codegen_plan(df: DataFrame) -> str:
    """The codegen-mode explain (WholeStageCodegen subtrees). With AQE
    the formatted plan shows only AdaptiveSparkPlan pre-execution, so
    codegen checks need this mode."""
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("codegen")
    )


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    plan = physical_plan(df)
    for needle in needles:
        if needle not in plan:
            raise AssertionError(f"{needle!r} not found in physical plan:\n{plan}")


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def has_pushed_filters(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan
