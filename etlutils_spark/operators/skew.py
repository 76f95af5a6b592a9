"""Skew-mitigation and co-location join strategies.

AQE's skew-join handling (on by default in our session) splits oversized
post-shuffle partitions automatically; ``salted_join`` is the explicit
fallback for the cases AQE can't fix (e.g., a single hot key inside one
task during aggregation, or non-AQE environments). ``bucketed_table``
writes the co-location layout that removes the shuffle from future
joins entirely — the 100 TB pattern for fact-to-fact joins repeated
across a pipeline.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_salt(df: DataFrame, salt: int) -> "F.Column":
    """Deterministic-per-partitioning row salt: content hash mixed with
    ``monotonically_increasing_id()`` so duplicate rows of a hot key
    still spread across all ``salt`` sub-keys. Not rand(): a retried
    task reproduces its assignment for a given input partitioning."""
    return F.pmod(
        F.xxhash64(
            F.monotonically_increasing_id(),
            *[F.col(c) for c in df.columns],
        ),
        F.lit(salt),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``salt``
    sub-keys and the small side replicated ``salt`` times.

    The salt is deterministic for a given input partitioning (content
    hash mixed with the row's position), never rand(): retried tasks
    reproduce their partitioning — a requirement for speculative
    execution / fault replay at scale. Mixing in the position matters
    (review catch): a content-only hash maps IDENTICAL rows — the
    classic hot key after a projection to key + low-cardinality
    measures — to ONE salt value, silently providing zero splitting
    exactly when it is needed. Join correctness holds for ANY salt
    assignment (the small side is replicated over every salt), so the
    position mix costs nothing.
    Output columns = plain ``big.join(small, on, how)``.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (small side is replicated)")
    big_s = big.withColumn("__salt", _row_salt(big, salt))
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_s.join(small_s, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def aggregate_with_salt(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys: partial aggregate on
    (key, salt), then final merge on key. ``aggs`` maps output name ->
    (column, fn) with fn in {sum, count, min, max} (the mergeable set).

    Catalyst already does map-side partial aggregation; explicit salting
    additionally splits a hot key ACROSS reducers, bounding any single
    task at ~1/salt of the hot key's rows. The salt mixes in the row
    position (see :func:`_row_salt`) so a hot key made of DUPLICATE
    rows still splits — a content-only hash sent them all to one salt
    (review catch); the two-stage merge is correct for any assignment.
    """
    fn_partial = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    fn_merge = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for name, (col, fn) in aggs.items():
        if fn not in fn_partial:
            raise ValueError(f"{fn} is not mergeable through a salt stage")
    salted = df.withColumn("__salt", _row_salt(df, salt))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[fn_partial[fn](col).alias(name) for name, (col, fn) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[fn_merge[fn](name).alias(name) for name, (col, fn) in aggs.items()]
    )


def bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) table: joins and
    aggregations on the bucket columns then read co-located data and
    skip the exchange (and the sort, if sorted).

    Rerun-safe for ``mode="overwrite"`` ONLY: a killed writer (or a
    fresh metastore over an old warehouse dir) leaves an orphaned
    table location that the overwrite refuses to reclaim
    [LOCATION_ALREADY_EXISTS], so in overwrite mode we drop the
    catalog entry and, for local file warehouses, the orphaned
    directory before writing. Other modes go straight to the writer
    with their standard semantics — the unconditional pre-drop
    silently destroyed existing data under ``mode="append"`` and made
    ``mode="errorifexists"`` unable to ever error (review catch).
    Qualified ``db.table`` names drop/reclaim the right identifier and
    directory (``<warehouse>/<db>.db/<table>``), which the single
    backtick-wrap got wrong (review catch)."""
    import os
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    if mode == "overwrite":
        parts = name.split(".")
        quoted = ".".join(f"`{p}`" for p in parts)
        spark.sql(f"DROP TABLE IF EXISTS {quoted}")
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
        if len(parts) == 1:
            loc = os.path.join(wh.path, parts[0].lower())
        else:
            db = ".".join(parts[:-1]).lower()
            loc = os.path.join(wh.path, f"{db}.db", parts[-1].lower())
        if wh.scheme in ("", "file") and os.path.exists(loc):
            shutil.rmtree(loc)
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(name)
