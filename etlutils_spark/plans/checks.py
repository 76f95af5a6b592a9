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


def assert_levels_frozen(
    new_df: DataFrame, existing_df: DataFrame, column: str, sample: int = 5
) -> None:
    """Validate that ``column`` in ``new_df`` introduces no level absent
    from ``existing_df`` — the reference's per-column ``appendLevels=
    FALSE`` contract (R/ffsql.R:257-266: a frozen factor's dictionary
    must not grow on append; here growth is a loud ``DomainError``
    rather than R's silent NA coercion, documented divergence).

    Distributed: one left-anti join of the new side's distinct values
    against the existing side's distinct values (both dictionary-sized
    after the per-side partial-distinct), then a ``sample``-row bounded
    collect. NULL never counts as a new level."""
    new_vals = new_df.select(F.col(column).alias("__lvl")).where(
        F.col(column).isNotNull()
    ).distinct()
    old_vals = existing_df.select(F.col(column).alias("__lvl")).where(
        F.col(column).isNotNull()
    ).distinct()
    bad = new_vals.join(old_vals, "__lvl", "left_anti").limit(sample).collect()
    if bad:
        vals = sorted({r[0] for r in bad})
        raise DomainError(
            f"append would add new levels to frozen column {column!r}: "
            f"{vals} (appendLevels=False for this column; drop the "
            "freeze or recode the incoming values)"
        )


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


def check_constraints(
    df: DataFrame,
    rules: dict[str, F.Column],
    unique_keys: dict[str, str] | None = None,
) -> DataFrame:
    """Declarative data-quality audit: ``rules`` maps a rule name to a
    boolean Column (True = row passes — anything else, INCLUDING NULL,
    is a violation); ``unique_keys`` maps a rule name to a column that
    must be duplicate-free. Returns one row per rule —
    ``(rule, n_violations, passed)`` — computed in ONE aggregation
    pass over ``df`` (every rule is a conditional count in the same
    HashAggregate; uniqueness is count(*) - count(distinct)), then
    unpivoted driver-free via explode-of-structs.

    NULL handling is strict on purpose (review catch): ``~cond`` is
    NULL for a NULL predicate, and a when/otherwise keyed on it
    counted the row as a PASS — a 100%-NULL column sailed through
    every rule silently. The contract is "True passes"; a NULL
    three-valued result violates. Empty input audits as 0 violations
    per rule (coalesced sum), and rule names never reach parsed SQL,
    so any name is legal (the stack() form broke on quotes).

    The generalization of the reference's two validations (unique
    right key, R/matchmerge.R:148-160; level domain, R/ffsql.R:190-200)
    to arbitrary predicates — at 100 TB an expectations pass is one
    scan regardless of how many rules it carries.
    """
    unique_keys = unique_keys or {}
    overlap = set(rules) & set(unique_keys)
    if overlap:
        raise ValueError(f"rule names used twice: {sorted(overlap)}")
    names = [*rules, *unique_keys]
    if not names:
        raise ValueError("check_constraints: no rules given")
    aggs = [
        F.coalesce(
            F.sum(F.when(cond, 0).otherwise(1)), F.lit(0)
        ).cast("long").alias(f"__r_{i}")
        for i, (name, cond) in enumerate(rules.items())
    ] + [
        (F.count(F.lit(1)) - F.count_distinct(F.col(col)))
        .cast("long")
        .alias(f"__u_{i}")
        for i, (name, col) in enumerate(unique_keys.items())
    ]
    one = df.agg(*aggs)
    entries = [
        F.struct(F.lit(n).alias("rule"), F.col(f"__r_{i}").alias("n_violations"))
        for i, n in enumerate(rules)
    ] + [
        F.struct(F.lit(n).alias("rule"), F.col(f"__u_{i}").alias("n_violations"))
        for i, n in enumerate(unique_keys)
    ]
    return (
        one.select(F.explode(F.array(*entries)).alias("s"))
        .select("s.rule", "s.n_violations")
        .withColumn("passed", F.col("n_violations") == 0)
    )
