"""Multi-dimensional data layout: Z-order (Morton) keys for compaction.

The reference has no storage layout control at all (its only format is
ff's append-ordered binary columns, SURVEY §2.1). At 100 TB, layout IS
the query plan: parquet keeps min/max statistics per file and row group,
and a scan filtered on a column only skips data if the writer clustered
that column. ``sortWithinPartitions(col)`` clusters ONE column
perfectly and every other column not at all; interleaving the bits of k
normalized columns into one Morton key gives every listed column
locality proportional to its bit share, so filters on ANY of them prune
(the same trick behind Delta Lake's OPTIMIZE ZORDER BY — implemented
here from the public definition of the curve, not from any engine).

Everything below is pure Column algebra (shifts/masks) — whole-stage
codegen, no UDFs, no collect beyond one min/max aggregate per layout
write (a layout job is already a full rewrite; one extra agg is noise).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ZKEY = "__zkey"


def _as_long(df: DataFrame, name: str) -> Column:
    """Lower a column to an orderable long (dates/timestamps included)."""
    dtype = df.schema[name].dataType
    col = F.col(name)
    if isinstance(dtype, T.DateType):
        return F.datediff(col, F.lit("1970-01-01")).cast("long")
    if isinstance(dtype, T.TimestampType):
        return F.unix_micros(col)
    if isinstance(dtype, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
        return col.cast("long")
    if isinstance(dtype, (T.DoubleType, T.FloatType, T.DecimalType)):
        # double keeps relative order; rank precision is bounded by
        # `bits` anyway so the lossy cast cannot reorder buckets.
        return col  # scaled below in floating point, floored at the end
    raise TypeError(
        f"zorder column {name!r} has unsupported type {dtype.simpleString()}; "
        "cast strings to a numeric surrogate first"
    )


def _ranks(df: DataFrame, cols: list[str], bits: int) -> list[Column]:
    """Min/max-normalize each column to a ``bits``-bit rank. Nulls,
    constant, and all-null columns rank 0. One aggregate job runs here
    to fetch the bounds."""
    lowered = {c: _as_long(df, c) for c in cols}
    bounds = df.agg(
        *[F.min(e).alias(f"mn{i}") for i, (c, e) in enumerate(lowered.items())],
        *[F.max(e).alias(f"mx{i}") for i, (c, e) in enumerate(lowered.items())],
    ).first()
    top = (1 << bits) - 1
    out = []
    for j, (c, e) in enumerate(lowered.items()):
        mn, mx = bounds[f"mn{j}"], bounds[f"mx{j}"]
        if mn is None or mx is None or mx == mn:
            out.append(F.lit(0).cast("long"))
            continue
        rank = F.floor((e - F.lit(mn)) / F.lit(mx - mn) * top).cast("long")
        out.append(
            F.coalesce(F.least(F.greatest(rank, F.lit(0)), F.lit(top)), F.lit(0))
        )
    return out


def morton_interleave(ranks: list[Column], bits: int) -> Column:
    """Bit-interleave ``bits``-bit rank columns into one Morton key
    (rank j owns output bits ``i*k + j``). Pure shift/mask Column
    algebra — the piece of :func:`zorder_key` that needs no data
    bounds, exposed so callers that already hold ranks (e.g. the
    pruning-stats driver query) interleave without a second bounds
    aggregate."""
    k = len(ranks)
    if not 1 <= k * bits <= 62:
        raise ValueError(f"k*bits must fit a signed long, got {k}x{bits}")
    key = F.lit(0).cast("long")
    for j, rank in enumerate(ranks):
        for i in range(bits):
            bit = F.shiftright(rank, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * k + j))
    return key


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> Column:
    """Morton key over ``cols``: each column min/max-normalized to a
    ``bits``-bit rank, ranks bit-interleaved (column j owns output bits
    ``i*k + j``)."""
    return morton_interleave(_ranks(df, cols, bits), bits)


def _hilbert_d_np(x, y, bits: int):
    """Vectorized xy→d along the order-``bits`` Hilbert curve (the
    classic rotate-and-reflect recurrence, computed on whole numpy
    arrays — one pass per bit level, no per-row Python)."""
    import numpy as np

    x = x.astype(np.int64).copy()
    y = y.astype(np.int64).copy()
    d = np.zeros_like(x)
    s = 1 << (bits - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        swap = ry == 0
        refl = swap & (rx == 1)
        xr = np.where(refl, s - 1 - x, x)
        yr = np.where(refl, s - 1 - y, y)
        x, y = np.where(swap, yr, xr), np.where(swap, xr, yr)
        s >>= 1
    return d


def hilbert_key(df: DataFrame, cols: list[str], bits: int = 16) -> Column:
    """Hilbert-curve key over exactly two columns. Unlike the Z-curve,
    consecutive key values are always grid NEIGHBORS (no long diagonal
    jumps), so per-file envelopes come out tighter — at the price of a
    Python stage: the rotate/reflect recurrence needs data-dependent
    branching per bit level, which Column algebra can only express with
    exponentially growing expression trees. An Arrow-batched pandas UDF
    over whole numpy arrays is the honest trade for a layout job (a
    once-per-dataset full rewrite — key cost is not on any query path)."""
    if len(cols) != 2:
        raise ValueError("hilbert_key supports exactly 2 columns")
    if not 1 <= 2 * bits <= 62:
        raise ValueError(f"2*bits must fit a signed long, got 2x{bits}")

    @F.pandas_udf("long")
    def hk(xs: pd.Series, ys: pd.Series) -> pd.Series:
        return pd.Series(_hilbert_d_np(xs.to_numpy(), ys.to_numpy(), bits))

    rx, ry = _ranks(df, cols, bits)
    return hk(rx, ry)


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    num_partitions: int,
    bits: int = 16,
    curve: str = "zorder",
) -> DataFrame:
    """Range-partition + sort ``df`` along the space-filling curve of
    ``cols`` so a downstream parquet write yields files whose per-file
    min/max bounds are tight on EVERY listed column. The key column is
    dropped — the layout survives in the row order, not the schema.
    ``curve="hilbert"`` (2 columns only) buys tighter envelopes for a
    Python key stage at write time."""
    keyfn = {"zorder": zorder_key, "hilbert": hilbert_key}[curve]
    key = keyfn(df, cols, bits=bits)
    return (
        df.withColumn(ZKEY, key)
        .repartitionByRange(num_partitions, ZKEY)
        .sortWithinPartitions(ZKEY)
        .drop(ZKEY)
    )
