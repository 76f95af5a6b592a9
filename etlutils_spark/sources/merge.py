"""Keyed upsert (SCD type 1) into a parquet target.

The reference's write path only knows overwrite-then-append
(R/ffsql.R:996-1007); the natural next primitive a warehouse needs is
MERGE: rows in ``updates`` replace target rows with the same key, new
keys append. Transactional merge-on-read formats (Delta/Iceberg) are
separate jars this environment doesn't ship, so the implementation is
the classic read-merge-rewrite, with a partition-scoped fast path that
is the shape you run at 100 TB.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: str | Sequence[str],
    partition_col: str | None = None,
    max_partitions: int = 10_000,
) -> None:
    """Upsert ``updates`` into the parquet dataset at ``target_path``.

    Semantics: target rows whose key appears in ``updates`` are replaced
    by the update row; unmatched update keys are appended; all other
    target rows survive unchanged. ``updates`` must carry the target's
    full schema (SCD-1 replace, not column patch) and unique keys.

    Scale: without ``partition_col`` the whole target is rewritten
    (read -> anti-join on the update keys -> union -> staging write ->
    atomic swap) — O(|target|) I/O, correct at any size but wasteful
    when updates touch a sliver. With ``partition_col`` (the target must
    be partitioned by it) only the partitions the updates touch are
    read and rewritten via dynamic partition overwrite — O(affected
    partitions) I/O, the 100 TB pattern. The update-key anti-join
    broadcasts when the update set is small (Catalyst/AQE decides).
    ``max_partitions`` caps the driver-side affected-partition list —
    exceeding it raises rather than silently degrading to a huge
    ``isin`` filter plus an unbounded collect.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    missing = [c for c in keys if c not in updates.columns]
    if missing:
        raise ValueError(f"key columns not in updates: {missing}")

    # heal FIRST, as incremental_funnel._process does: both merge paths
    # read the target before any write-side heal runs, so a crash in a
    # PRIOR swap between the two renames (target absent, .compact_tmp
    # complete) would otherwise fail every subsequent merge_upsert on
    # the read until someone manually promoted the tmp (review catch)
    from etlutils_spark.sources.files import heal_interrupted_compaction

    heal_interrupted_compaction(spark, target_path)

    if partition_col is not None:
        if partition_col not in updates.columns:
            raise ValueError(f"partition_col {partition_col!r} not in updates")
        # affected-partition list is collect()-ed: it is bounded by the
        # update batch's distinct partition values, not by target size.
        # Bounded collect (cap+1, as in similarity.cosine_topk_arrow):
        # a near-unique partition_col — the misuse this guards against —
        # fails loudly instead of materializing an unbounded list.
        parts = [
            r[0]
            for r in updates.select(partition_col)
            .distinct()
            .limit(max_partitions + 1)
            .collect()
        ]
        if len(parts) > max_partitions:
            raise ValueError(
                f"updates touch more than max_partitions={max_partitions} "
                f"distinct {partition_col!r} values; a near-unique "
                "partition_col defeats partition-scoped merge (use the "
                "full-rewrite path, or raise max_partitions deliberately)"
            )
        _assert_layout(spark, target_path, partitioned=True)
        # a NULL partition is a partition like any other: isin() never
        # matches NULL (three-valued logic), so without the isNull arm
        # the null-partition SURVIVORS would be excluded while dynamic
        # overwrite still rewrites __HIVE_DEFAULT_PARTITION__ —
        # permanently and silently deleting every unmatched row in it
        # (review catch)
        non_null = [p for p in parts if p is not None]
        cond = (
            F.col(partition_col).isin(non_null) if non_null else F.lit(False)
        )
        if len(non_null) < len(parts):
            cond = cond | F.col(partition_col).isNull()
        target = spark.read.parquet(target_path).filter(cond)
        survivors = target.join(
            updates.select(*keys).distinct(), on=keys, how="left_anti"
        )
        merged = survivors.unionByName(updates.select(*survivors.columns))
        # per-writer option, NOT a session-conf toggle: flipping the
        # session conf around a long write job changes the semantics of
        # every CONCURRENT overwrite in the session, and the
        # finally-restore races a second merge (review catch)
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(target_path)
        )
        return

    _assert_layout(spark, target_path, partitioned=False)
    target = spark.read.parquet(target_path)
    survivors = target.join(
        updates.select(*keys).distinct(), on=keys, how="left_anti"
    )
    merged = survivors.unionByName(updates.select(*survivors.columns))
    # crash-safe Hadoop-FS swap (temp-write + two renames, shared heal):
    # the previous shutil.rmtree + os.replace was local-filesystem-only
    # (it threw on hdfs://-style targets this module advertises) and
    # left an unrecoverable absent-table window on a crash between the
    # two steps (review catch). merged reads the live target lazily;
    # the tmp write executes while the target is untouched.
    from etlutils_spark.sources.files import atomic_overwrite_parquet

    atomic_overwrite_parquet(merged, target_path)


def _assert_layout(
    spark: SparkSession, target_path: str, partitioned: bool
) -> None:
    """Fail loudly when the target's on-disk layout contradicts the
    chosen merge path (the compact_parquet_inplace convention — review
    catch): dynamic partition overwrite onto a FLAT target leaves the
    original root data files untouched alongside new partition
    subdirectories (duplicates + conflicting-layout reads), and a full
    rewrite of a PARTITIONED target silently flattens the directory
    layout consumers prune on."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(target_path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return
    has_part_dirs = any(
        st.isDirectory() and "=" in st.getPath().getName()
        for st in fs.listStatus(jpath)
    )
    if partitioned and not has_part_dirs:
        raise ValueError(
            f"merge_upsert: partition-scoped merge requested but "
            f"{target_path} has no partition subdirectories — dynamic "
            "overwrite onto a flat layout would leave the old root "
            "files alive as duplicates; rewrite the target partitioned "
            "by the partition column first, or omit partition_col"
        )
    if not partitioned and has_part_dirs:
        raise ValueError(
            f"merge_upsert: {target_path} is partition-laid-out but no "
            "partition_col was given — a full rewrite would silently "
            "flatten the layout; pass partition_col"
        )


def scd2_apply(
    target: DataFrame,
    updates: DataFrame,
    keys: str | Sequence[str],
    attr_cols: Sequence[str],
    effective_col: str = "effective_date",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """SCD type 2: apply ``updates`` to a versioned ``target``,
    returning the new full history (no write — compose with
    ``merge_upsert``/``ingest_to_parquet`` to persist).

    ``target`` carries ``keys + attr_cols + from_col + to_col +
    current_col``; ``updates`` carries ``keys + attr_cols +
    effective_col`` with unique keys. Semantics:

    - current row whose attrs differ (null-safely) from its update:
      CLOSED (``to_col = effective``, not current) and a new current
      row opens at ``effective``;
    - current row whose update carries identical attrs: untouched
      (no empty version rows — the differs filter is semantic, not
      key-presence);
    - update key absent from the target: a new current row;
    - history (non-current) rows: pass through untouched.

    Scale: one inner join current-vs-updates on the keys (updates are
    typically broadcast-sized; Catalyst/AQE decides), two anti-joins on
    the same keys, a union — no window, no global sort, every stage
    partitioned by the key columns.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    out_cols = [*keys, *attr_cols, from_col, to_col, current_col]

    cur = target.filter(F.col(current_col))
    hist = target.filter(~F.col(current_col))

    differs = None
    for c in attr_cols:
        d = ~F.col(f"t.{c}").eqNullSafe(F.col(f"u.{c}"))
        differs = d if differs is None else (differs | d)
    # changed feeds three consumers (closed, reopened, the untouched
    # anti-join's key set) — persist through the bounded tracker so the
    # keyed join runs once, not three times
    from etlutils_spark.caching import persist_tracked

    changed = persist_tracked(
        cur.alias("t")
        .join(updates.alias("u"), on=keys, how="inner")
        .filter(differs)
    )
    closed = changed.select(
        *keys,
        *[F.col(f"t.{c}").alias(c) for c in attr_cols],
        F.col(f"t.{from_col}").alias(from_col),
        F.col(f"u.{effective_col}").alias(to_col),
        F.lit(False).alias(current_col),
    )
    reopened = changed.select(
        *keys,
        *[F.col(f"u.{c}").alias(c) for c in attr_cols],
        F.col(f"u.{effective_col}").alias(from_col),
        F.lit(None).cast(target.schema[to_col].dataType).alias(to_col),
        F.lit(True).alias(current_col),
    )
    untouched_cur = cur.join(
        changed.select(*keys).distinct(), on=keys, how="left_anti"
    ).select(*out_cols)
    # anti-join against CURRENT keys, not all target keys: a key that
    # exists only as closed history rows (logical delete, external
    # closer) must REOPEN as a new current version — anti-joining
    # against the full target silently dropped the reappearing
    # entity's update (review catch)
    brand_new = (
        updates.join(cur.select(*keys).distinct(), on=keys, how="left_anti")
        .select(
            *keys,
            *attr_cols,
            F.col(effective_col).alias(from_col),
            F.lit(None).cast(target.schema[to_col].dataType).alias(to_col),
            F.lit(True).alias(current_col),
        )
    )
    return (
        hist.select(*out_cols)
        .unionByName(untouched_cur)
        .unionByName(closed)
        .unionByName(reopened)
        .unionByName(brand_new)
    )
