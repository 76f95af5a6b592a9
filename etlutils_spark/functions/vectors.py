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
    documented best-effort semantics for ragged embeddings.

    An EMPTY or all-NULL product array yields NULL, again like the
    DuckDB twin's SUM over zero qualifying rows (review catch: the
    coalesce-to-zero fold returned 0.0 there, diverging from the
    oracle on exactly the malformed-embedding edge it documents as
    matched). The "anything qualified" test rides a separate boolean
    ``zip_with`` + short-circuit ``exists`` over the INPUT elements (a
    product is non-NULL iff both inputs are) rather than a struct
    accumulator in the fold: the struct form taxed every element of
    the all-pairs hot path ~13-40% (micro-benched at 2M x 64-dim),
    while the boolean guard costs one early-exit scan — first element
    for every well-formed vector."""
    a, b = _c(a), _c(b)
    prods = F.zip_with(a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(DEC))
    s = F.aggregate(
        prods,
        F.lit(0).cast(DEC),
        lambda acc, v: (acc + F.coalesce(v, F.lit(0).cast(DEC))).cast(DEC),
    )
    any_pair = F.exists(
        F.zip_with(a, b, lambda x, y: x.isNotNull() & y.isNotNull()),
        lambda t: t,
    )
    return F.when(any_pair, s).cast("double")


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
    # NULL products contribute zero; empty/all-NULL arrays yield NULL —
    # same contract (and same boolean-guard shape) as dot_exact
    s = F.aggregate(
        prods,
        F.lit(0.0),
        lambda acc, v: acc + F.coalesce(v, F.lit(0.0)),
    )
    any_pair = F.exists(
        F.zip_with(a, b, lambda x, y: x.isNotNull() & y.isNotNull()),
        lambda t: t,
    )
    return F.when(any_pair, s)


def norm_fast(a: Column | str) -> Column:
    a = _c(a)
    return F.sqrt(dot_fast(a, a))


def cosine_fast(a: Column | str, b: Column | str) -> Column:
    return dot_fast(a, b) / (norm_fast(a) * norm_fast(b))


def cosine_threshold_prefilter(
    a: Column | str,
    b: Column | str,
    na: Column,
    nb: Column,
    threshold: float,
) -> Column:
    """Cheap screen for ``cosine_exact(a, b) >= threshold`` filters:
    TRUE for every pair the exact predicate could possibly accept,
    FALSE only when the double-fold dot is provably below the
    threshold. Filter on this FIRST, then on the exact predicate —
    results are identical, but the decimal fold (the all-pairs hot
    cost) runs only on survivors of the double fold.

    Soundness: ``dot_exact`` rounds each product to 12 decimal places
    (error <= d*5e-13 for d dims) and sums exactly; ``dot_fast``'s
    float error is <= 2d*u*sum|p_i| <= 2d*u*na*nb (Cauchy-Schwarz),
    u = 2^-52. The band used here, ``d * 1e-9 * (1 + na*nb)``, is
    >= 2000x that combined bound. Edge rows: a zero-norm side makes
    the right-hand side ``-eps`` (< 0) so the row passes as TRUE, and
    a NaN element makes ``dot_fast`` NaN, which Spark compares greater
    than everything — also TRUE; both are settled by the downstream
    exact predicate, which this screen must only over-approximate.
    Only rows whose product array is empty or all-NULL evaluate NULL
    here (dot_fast returns NULL) and are dropped — exactly what the
    exact predicate does to them (a NULL comparison is never TRUE)."""
    a, b = _c(a), _c(b)
    eps = F.size(a).cast("double") * F.lit(1e-9) * (F.lit(1.0) + na * nb)
    return dot_fast(a, b) >= F.lit(threshold) * na * nb - eps


# DuckDB fragment builders — keep the oracle SQL in lockstep with the
# Spark expressions above (same cast order, same parenthesization).

def duck_dot_exact(a: str, b: str, idx: str = "i") -> str:
    # SUM over zero qualifying rows is NULL in DuckDB — dot_exact's
    # finish lambda mirrors that for empty/all-NULL product arrays
    return (
        f"CAST(SUM(CAST(CAST({a}[{idx}] AS DOUBLE) * CAST({b}[{idx}] AS DOUBLE)"
        f" AS DECIMAL(30,12))) AS DOUBLE)"
    )
