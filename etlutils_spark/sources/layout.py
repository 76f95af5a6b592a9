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


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> Column:
    """Morton key over ``cols``: each column min/max-normalized to a
    ``bits``-bit rank, ranks bit-interleaved (column j owns output bits
    ``i*k + j``). Nulls rank lowest (bucket 0). One aggregate job runs
    here to fetch the min/max bounds."""
    k = len(cols)
    if not 1 <= k * bits <= 62:
        raise ValueError(f"k*bits must fit a signed long, got {k}x{bits}")
    lowered = {c: _as_long(df, c) for c in cols}
    bounds = df.agg(
        *[F.min(e).alias(f"mn{i}") for i, (c, e) in enumerate(lowered.items())],
        *[F.max(e).alias(f"mx{i}") for i, (c, e) in enumerate(lowered.items())],
    ).first()
    top = (1 << bits) - 1
    key = F.lit(0).cast("long")
    for j, (c, e) in enumerate(lowered.items()):
        mn, mx = bounds[f"mn{j}"], bounds[f"mx{j}"]
        if mn is None or mx is None or mx == mn:
            continue  # constant or all-null column contributes no bits
        rank = F.floor((e - F.lit(mn)) / F.lit(mx - mn) * top).cast("long")
        rank = F.coalesce(F.least(F.greatest(rank, F.lit(0)), F.lit(top)), F.lit(0))
        for i in range(bits):
            bit = F.shiftright(rank, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * k + j))
    return key


def zorder_layout(
    df: DataFrame, cols: list[str], num_partitions: int, bits: int = 16
) -> DataFrame:
    """Range-partition + sort ``df`` along the Z-curve of ``cols`` so a
    downstream parquet write yields files whose per-file min/max bounds
    are tight on EVERY listed column. The key column is dropped — the
    layout survives in the row order, not the schema."""
    key = zorder_key(df, cols, bits=bits)
    return (
        df.withColumn(ZKEY, key)
        .repartitionByRange(num_partitions, ZKEY)
        .sortWithinPartitions(ZKEY)
        .drop(ZKEY)
    )
