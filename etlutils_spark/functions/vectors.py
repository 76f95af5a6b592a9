"""Vector math over ``array<float>`` embedding columns.

Two tiers:
- ``*_exact``: decimal-accumulated (order-independent, bitwise
  reproducible across engines and partitionings) — used by the
  oracle-checked queries and anywhere determinism matters.
- ``*_fast``: plain double accumulation — the throughput path for
  100 TB scans where last-ulp reproducibility doesn't matter.

All are built-in higher-order functions (aggregate/zip_with): JVM-side,
no Python UDF in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(30,12)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_exact(a: Column | str, b: Column | str) -> Column:
    """Exact (decimal-accumulated) dot product of two float arrays.

    NULL products — a NULL element, or the padding ``zip_with`` adds
    when the arrays are ragged — contribute ZERO, exactly like the
    DuckDB twin whose SUM skips NULL products (review catch: an
    uncoalesced fold let one NULL poison the whole dot into NULL,
    silently diverging from the oracle fragment on malformed data).
    The mismatched tail is thus a partial dot on BOTH engines — the
    documented best-effort semantics for ragged embeddings."""
    a, b = _c(a), _c(b)
    prods = F.zip_with(a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(DEC))
    return F.aggregate(
        prods,
        F.lit(0).cast(DEC),
        lambda acc, v: (acc + F.coalesce(v, F.lit(0).cast(DEC))).cast(DEC),
    ).cast("double")


def norm_exact(a: Column | str) -> Column:
    a = _c(a)
    return F.sqrt(dot_exact(a, a))


def cosine_exact(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; dot and norms decimal-exact, final division a
    single deterministic IEEE op."""
    return dot_exact(a, b) / (norm_exact(a) * norm_exact(b))


def dot_fast(a: Column | str, b: Column | str) -> Column:
    a, b = _c(a), _c(b)
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    # NULL products contribute zero — same contract as dot_exact
    return F.aggregate(
        prods, F.lit(0.0), lambda acc, v: acc + F.coalesce(v, F.lit(0.0))
    )


def norm_fast(a: Column | str) -> Column:
    a = _c(a)
    return F.sqrt(dot_fast(a, a))


def cosine_fast(a: Column | str, b: Column | str) -> Column:
    return dot_fast(a, b) / (norm_fast(a) * norm_fast(b))


# DuckDB fragment builders — keep the oracle SQL in lockstep with the
# Spark expressions above (same cast order, same parenthesization).

def duck_dot_exact(a: str, b: str, idx: str = "i") -> str:
    return (
        f"CAST(SUM(CAST(CAST({a}[{idx}] AS DOUBLE) * CAST({b}[{idx}] AS DOUBLE)"
        f" AS DECIMAL(30,12))) AS DOUBLE)"
    )
