"""File sources: the driver's parquet star schema plus CSV/JSON convenience.

The reference has no file formats at all (its only on-disk format is the
ff binary column files, SURVEY §2.1); Parquet is the Spark-native
equivalent of the ffdf — columnar, dictionary-encoded, out-of-core by
construction. These helpers centralize how the engine loads the
deterministic test tables.
"""

from __future__ import annotations

import os
import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

_CONF_WARNED: set[str] = set()


def read_table(
    spark: SparkSession,
    name: str,
    sf_dir: str | None = None,
    pin_session_confs: bool = True,
) -> DataFrame:
    """Read one star-schema table from ``sf_dir`` (parquet).

    ``events.ts`` has been written two ways across driver generations:
    TIMESTAMP(NANOS) (read as long via the legacy conf, floor-converted
    to microseconds — the truncation DuckDB applies casting
    TIMESTAMP_NS → TIMESTAMP) and TIMESTAMP(MICROS, isAdjustedToUTC
    =false) (read as TIMESTAMP_NTZ). Both normalize to a session-UTC
    TimestampType here so downstream event-time code and oracle
    comparisons see ONE stable type with stable values (watermarks do
    accept NTZ in Spark 4.1; the normalization is for type/value
    stability, not a watermark requirement).

    NOTE: the two confs below are session-scoped and deliberately stay
    set after this call — both affect plan EXECUTION (the lazy scan and
    every downstream timestamp expression), so restoring them on return
    would silently change the returned DataFrame's results. If the
    caller's session had a *different* explicit value we warn rather
    than mutate silently. ``pin_session_confs=False`` opts out of the
    mutation entirely — the caller then owns setting UTC/nanosAsLong.
    Opting out on nanos-encoded data fails loudly on the nanos column;
    on NTZ-encoded data it fails SILENTLY: to_timestamp_ltz interprets
    NTZ wall time in whatever session tz is set, so a non-UTC session
    shifts every ``ts`` value relative to the UTC-naive DuckDB oracle.
    """
    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    path = os.path.join(sf_dir, f"{name}.parquet")
    # Pin the conversions this engine's semantics depend on even when the
    # caller's session was built elsewhere (e.g. the grading driver):
    # UTC session tz (timestamps must match the UTC-naive DuckDB oracle)
    # and nanos-as-long (events.ts is TIMESTAMP(NANOS)).
    for key, want in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ):
        if not pin_session_confs:
            break
        have = spark.conf.get(key, None)
        if have is not None and have != want and key not in _CONF_WARNED:
            _CONF_WARNED.add(key)
            warnings.warn(
                f"read_table pins {key}={want} for the rest of this session "
                f"(was {have}); timestamps are defined against the UTC-naive "
                "parquet test data (pass pin_session_confs=False to opt out)",
                stacklevel=2,
            )
        spark.conf.set(key, want)
    df = spark.read.parquet(path)
    for f in df.schema.fields:
        if f.name != "ts":
            continue
        if isinstance(f.dataType, T.LongType):
            # TIMESTAMP(NANOS) surfaced as long by the legacy conf
            df = df.withColumn("ts", F.timestamp_micros(F.expr("`ts` div 1000")))
        elif isinstance(f.dataType, T.TimestampNTZType):
            # micros NTZ → LTZ is value-preserving under the pinned UTC tz
            df = df.withColumn("ts", F.to_timestamp_ltz(F.col("ts")))
    return df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
    **options,
) -> DataFrame:
    """CSV source (absent from the reference — its only format is ff's
    binary columns, SURVEY §2.1). Always pass ``schema`` in production:
    inference costs an extra full scan of the input."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: str | None = None, **options) -> DataFrame:
    """JSON-lines source; schema strongly recommended (same scan-cost
    reasoning as CSV)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def read_text_corpus(
    spark: SparkSession,
    path: str,
    line_sep: str | None = None,
    **options,
) -> DataFrame:
    """Raw text-file corpus source — the most common LLM-corpus ingest
    format (one document per line, or per ``line_sep`` block): files in
    ``path`` (plain or transparently-decompressed .gz) become the
    engine's documents shape ``(doc_id, text, source, n_chars)``.

    ``doc_id`` is ``xxhash64(text)`` — a pure content hash, so ids are
    stable under any partitioning/file layout and exact duplicates
    share an id (which downstream ``dedup_exact`` treats as the
    collapse key; pipelines that need per-OCCURRENCE identity should
    carry ``source`` + a content hash together). ``source`` is the
    originating file name.

    Scale: ``spark.read.text`` splits uncompressed files by HDFS block
    (gz is single-split per file — shard compressed corpora into many
    files); everything added here is stateless column algebra on top of
    the scan."""
    reader = spark.read
    if line_sep is not None:
        reader = reader.option("lineSep", line_sep)
    for k, v in options.items():
        reader = reader.option(k, v)
    raw = reader.text(path)
    return raw.select(
        F.xxhash64(F.col("value")).alias("doc_id"),
        F.col("value").alias("text"),
        F.element_at(F.split(F.input_file_name(), "/"), -1).alias("source"),
        F.length("value").cast("bigint").alias("n_chars"),
    )


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
    **options,
) -> DataFrame:
    """Media-file corpus source — the production ingest path for the
    multimodal tier: raw image/audio/video FILES under ``path`` become
    the engine's binary-payload shape via Spark's built-in
    ``binaryFile`` format, ready for ``operators.multimodal``
    (``probe_media``, ``resize_batch``, ``chunk_audio``,
    ``sample_frames``, feature extraction) without any bespoke reader.

    Output: ``(media_id, payload, source, n_bytes, modified)`` —
    ``media_id`` is ``xxhash64(content)`` (content-addressed, stable
    under any file layout; exact duplicate files share an id, which
    exact-dedup treats as the collapse key), ``payload`` the raw bytes,
    ``source`` the file name, ``n_bytes``/``modified`` the typed
    metadata the reference-free multimodal contract carries.

    ``glob`` filters by pattern (``"*.png"``) via the format's native
    ``pathGlobFilter`` — applied at LISTING time, before any bytes are
    read. ``max_bytes`` guards against a stray huge file poisoning
    executor memory, and the guard is REAL, not cosmetic: the length
    predicate pushes down into the binaryFile source (length is one of
    its pushdown columns), so an oversize file's bytes are never
    loaded at all — the metadata row survives (payload AND media_id
    null: bytes that were never read cannot be content-addressed)
    rather than silently vanishing, so the pipeline can count and
    report drops. Without ``max_bytes``, a file past Spark's 2 GB
    binaryFile cap fails the scan outright (the format's limit) — set
    ``max_bytes`` to also absorb that case. Scale: binaryFile is
    non-splittable per file (each file one task input — correct for
    media, where a file is the unit); listing parallelizes across the
    driver's FS threads and the scan itself is executor-side."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    for k, v in options.items():
        reader = reader.option(k, v)
    raw = reader.load(path)
    src = F.element_at(F.split(F.col("path"), "/"), -1).alias("source")
    n_bytes = F.col("length").cast("bigint").alias("n_bytes")
    modified = F.col("modificationTime").alias("modified")
    kept = raw if max_bytes is None else raw.filter(
        F.col("length") <= F.lit(int(max_bytes))
    )
    out = kept.select(
        F.xxhash64(F.col("content")).alias("media_id"),
        F.col("content").alias("payload"),
        src,
        n_bytes,
        modified,
    )
    if max_bytes is None:
        return out
    # metadata-only arm: content is pruned from this scan entirely
    # (binaryFile honors column pruning), so the oversize bytes are
    # never materialized anywhere
    dropped = raw.filter(F.col("length") > F.lit(int(max_bytes))).select(
        F.lit(None).cast("bigint").alias("media_id"),
        F.lit(None).cast("binary").alias("payload"),
        src,
        n_bytes,
        modified,
    )
    return out.unionByName(dropped)


def read_orc(spark: SparkSession, path: str, **options) -> DataFrame:
    """ORC source (Spark-native columnar alternative to parquet; same
    pushdown/pruning machinery — PushedFilters + ReadSchema reach the
    reader)."""
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.orc(path)


def write_orc(
    df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None
) -> None:
    """ORC sink; ``partition_by`` produces hive-style directory
    partitioning (the partition-pruning lever for downstream scans)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_rows_per_file: int = 1_000_000,
    sort_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
) -> None:
    """Small-files compaction: rewrite a parquet dataset into
    right-sized files, optionally sorted within partitions so parquet
    min/max statistics prune future scans.

    ``sort_by`` clusters one leading column perfectly (single-column
    filters prune); ``zorder_by`` lays rows along a Morton curve so
    filters on ANY listed column prune (see sources.layout). They are
    mutually exclusive — a Z-order already fixes the row order.

    At 100 TB the small-files problem is the top operational failure of
    append-heavy ingest (every micro-batch appends a file per
    partition); periodic compaction keeps scan task counts sane.
    """
    if sort_by and zorder_by:
        raise ValueError("pass sort_by or zorder_by, not both")
    df = spark.read.parquet(path)
    # ceiling division: 1.9M rows at a 1M target -> 2 files, not one 1.9M file
    n = max(1, -(-df.count() // target_rows_per_file))
    if zorder_by:
        from etlutils_spark.sources.layout import zorder_layout

        out = zorder_layout(df, zorder_by, num_partitions=n)
    else:
        out = df.repartition(n)
        if sort_by:
            out = out.sortWithinPartitions(*sort_by)
    out.write.mode("overwrite").parquet(out_path)


def heal_interrupted_compaction(spark: SparkSession, path: str) -> bool:
    """Promote a fully-written ``{path}.compact_tmp`` when ``path``
    itself is MISSING — the one crash window of
    :func:`compact_parquet_inplace`'s two-rename swap. Safe to call
    any time (two exists() checks when healthy); readers that would
    otherwise fail on the absent table — e.g. an index extend
    restarting after a mid-swap crash — call this first, which is how
    the streaming wrappers make ``compact_every`` crash-transparent
    instead of wedging the stream until a manual compaction (round-9
    review finding). Returns True iff a promotion happened."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    tmp = jvm.org.apache.hadoop.fs.Path(f"{path}.compact_tmp")
    if not fs.exists(jpath) and fs.exists(tmp):
        if not fs.rename(tmp, jpath):
            raise IOError(f"could not promote {path}.compact_tmp")
        return True
    return False


def atomic_overwrite_parquet(df: DataFrame, path: str) -> None:
    """Crash-safe replacement for ``df.write.mode("overwrite")`` on a
    table that is the ONLY copy of accumulated state (e.g. the
    streaming funnel's per-user state): write to ``{path}.compact_tmp``
    first, then the two-rename swap — a direct overwrite deletes the
    old files before the new job commits, so a crash inside it
    silently truncates the state (the exact pattern
    :func:`compact_parquet_inplace`'s docstring forbids; review
    catch). Reuses the compaction tmp/old names so
    :func:`heal_interrupted_compaction` heals the one mid-swap crash
    window (path absent, tmp complete) for this writer too. ``df`` may
    read from ``path`` itself: the tmp write executes while ``path``
    is untouched, and the renames are pure metadata."""
    spark = df.sparkSession
    # heal FIRST: after a mid-swap crash the .compact_tmp may be the
    # ONLY surviving copy of the state, and the entry delete below
    # would destroy it while a caller that rebuilt df without reading
    # the (absent) path then commits partial state (review catch)
    heal_interrupted_compaction(spark, path)
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    tmp = jvm.org.apache.hadoop.fs.Path(f"{path}.compact_tmp")
    old = jvm.org.apache.hadoop.fs.Path(f"{path}.compact_old")
    fs.delete(old, True)  # debris from a crash after rename1
    fs.delete(tmp, True)
    df.write.mode("overwrite").parquet(f"{path}.compact_tmp")
    _swap_tmp_into_place(fs, jpath, tmp, old, path)


def _swap_tmp_into_place(fs, jpath, tmp, old, path: str) -> None:
    """The shared two-rename commit (rename path->old, tmp->path with a
    CHECKED rollback, drop old) of :func:`atomic_overwrite_parquet` and
    :func:`compact_parquet_inplace` — one copy so the crash-window
    reasoning and rollback guarantees cannot drift between writers
    (review catch: the two inlined copies had already diverged on heal
    behavior). Precondition: ``{path}.compact_tmp`` is fully written."""
    if fs.exists(jpath) and not fs.rename(jpath, old):
        raise IOError(f"could not stage {path} for the overwrite swap")
    if not fs.rename(tmp, jpath):
        # put the original back — nothing lost, but the rollback must
        # be CHECKED: rename-into-existing can report failure (or, on
        # some stores, move the old copy INSIDE a recreated path) and
        # silently swallowing that leaves the table unreadable with no
        # hint that both complete copies still exist (r9 advice)
        if fs.exists(old) and not fs.rename(old, jpath):
            raise IOError(
                f"overwrite swap of {path} failed AND the rollback "
                f"rename failed: the table is currently absent, with "
                f"the previous copy intact at {path}.compact_old and "
                f"the new copy at {path}.compact_tmp — restore one "
                "manually (both are complete; no rows were lost)"
            )
        raise IOError(f"could not commit the overwrite swap of {path}")
    fs.delete(old, True)


def compact_parquet_inplace(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int = 1_000_000,
    pre_swap_check=None,
) -> int:
    """In-place small-files compaction for APPEND-GROWN tables (the
    index artifacts' codes/profiles, which gain one file per extend
    forever): rewrite ``path`` to ceil(rows/target) files via a
    temp-write + two-rename swap, never a direct overwrite — a direct
    ``mode("overwrite")`` deletes the old files before the new commit,
    so a crash inside it TRUNCATES the table silently (for an index's
    codes/profiles that is unrecoverable data loss, unlike the edge
    table's epoch-union recovery). Crash windows here are all loud or
    harmless: a leftover ``.compact_tmp`` is overwritten by the next
    run; a crash between the two renames leaves ``path`` MISSING
    (readers fail loudly, never read wrong data) and the next call —
    or :func:`recover_compaction` semantics built in below — heals it
    by promoting the fully-written tmp. Callers that guard a shared
    artifact must hold its writer lease around this (the index-level
    wrappers do), and may pass ``pre_swap_check`` — a callable invoked
    immediately before the first swap rename, AFTER the long rewrite
    job — to re-assert lease ownership at the commit point (the
    index wrappers pass ``verify_writer_lease``; a compaction whose
    rewrite outlasted a heartbeat outage must not swap over a thief's
    fresh artifact). Returns the file count after compaction."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    tmp = jvm.org.apache.hadoop.fs.Path(f"{path}.compact_tmp")
    old = jvm.org.apache.hadoop.fs.Path(f"{path}.compact_old")
    heal_interrupted_compaction(spark, path)
    fs.delete(old, True)  # debris from a crash after rename1
    # a Hive-partitioned table (col=value subdirectories) must NOT be
    # flat-compacted: the rewrite would silently demote the partition
    # key to a data column and destroy the layout consumers prune on
    # (e.g. the dedup index's bucketed labels and their dynamic
    # partition overwrites). Be loud; partitioned tables compact
    # per-partition or through their own layout-aware writer.
    for st in fs.listStatus(jpath):
        if st.isDirectory() and "=" in st.getPath().getName():
            raise ValueError(
                f"compact_parquet_inplace: {path} is partition-laid-out "
                f"({st.getPath().getName()}/...) — flat compaction would "
                "silently flatten the directory layout; compact "
                "per-partition instead"
            )
    df = spark.read.parquet(path)
    n = max(1, -(-df.count() // target_rows_per_file))
    fs.delete(tmp, True)
    df.repartition(n).write.mode("overwrite").parquet(f"{path}.compact_tmp")
    # swap: path -> .compact_old, tmp -> path, drop old. Single writer
    # (lease-holder); the only mid-swap crash window leaves path absent
    # with BOTH copies intact.
    if pre_swap_check is not None:
        pre_swap_check()
    _swap_tmp_into_place(fs, jpath, tmp, old, path)
    return n


def compact_partitioned_parquet(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int = 1_000_000,
    pre_swap_check=None,
) -> dict[str, int]:
    """Per-partition in-place compaction for Hive-partition-laid-out
    tables (``col=value`` directories — event-date sinks,
    ``write_orc(partition_by=...)`` outputs): walks to each LEAF
    partition directory and runs :func:`compact_parquet_inplace` on it,
    so the directory layout consumers prune on is preserved exactly —
    the flat compactor refuses these tables for that reason. Handles
    nested (multi-column) partitioning; a ``.compact_tmp`` left by a
    mid-swap crash in any partition is healed before compaction (an
    ABSENT partition is silent data loss to a full-table scan, unlike
    the flat table's loud missing-path failure, so healing comes
    first, not lazily). Returns ``{partition_rel_path: n_files}``.

    Callers guarding a shared artifact hold its writer lease around
    this and pass ``pre_swap_check`` (e.g. ``verify_writer_lease``) —
    it runs before EVERY partition's swap, since the walk can be long.

    Scale: each partition compacts independently (its own count + one
    rewrite job), so memory is bounded by one partition, and an
    interrupted run leaves every completed partition compacted — rerun
    to resume. Partitions already at their target file count are still
    rewritten; pre-filter the dict if that matters."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())

    def part_dirs(p):
        subs = []
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if not st.isDirectory() or ".compact_" in name:
                continue
            if "=" in name and not name.startswith((".", "_")):
                subs.append(st.getPath())
        return subs

    def heal_level(p) -> None:
        # a fully-written D.compact_tmp whose D is absent is a
        # mid-swap crash at this level — promote it on the spot
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if st.isDirectory() and name.endswith(".compact_tmp"):
                heal_interrupted_compaction(
                    spark, str(st.getPath())[: -len(".compact_tmp")]
                )

    # heal the ROOT level BEFORE computing tops: on a single-column
    # layout the leaves ARE the top-level dirs, so a crashed leaf's
    # only trace is date=X.compact_tmp at the root — without this the
    # walk would never visit it and the function would return
    # "successfully" with that partition missing (review catch)
    heal_level(jpath)
    tops = part_dirs(jpath)
    if not tops:
        raise ValueError(
            f"compact_partitioned_parquet: {path} has no col=value "
            "partition directories — use compact_parquet_inplace for "
            "flat tables"
        )
    leaves: list = []

    def walk(p) -> None:
        heal_level(p)
        subs = part_dirs(p)
        if subs:
            for s in subs:
                walk(s)
        else:
            leaves.append(p)

    for t in tops:
        walk(t)
    base = str(jpath.toUri().getPath())
    out: dict[str, int] = {}
    for leaf in leaves:
        rel = str(leaf.toUri().getPath())[len(base):].lstrip("/")
        out[rel] = compact_parquet_inplace(
            spark, str(leaf), target_rows_per_file,
            pre_swap_check=pre_swap_check,
        )
    return out


def spread(df: DataFrame, n: int | None = None) -> DataFrame:
    """Repartition a narrow input up to the session's parallelism.

    Single-file parquet tables (one row group) scan as ONE task no
    matter how many cores exist — any CPU-heavy per-row stage downstream
    then runs serially. ``spread`` is the explicit lever: cheap shuffle
    of a small input, full parallelism after. On a real cluster with
    splittable multi-file inputs the scan is already parallel and
    callers skip it — which is why it is opt-in, not baked into
    ``read_table`` (an unconditional exchange would poison every plan).
    """
    if df.isStreaming:
        # no static partitioning to inspect (df.rdd is illegal on a
        # streaming source); micro-batches parallelize by input files
        return df
    n = n or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def load_star(spark: SparkSession, sf_dir: str | None = None, register_views: bool = True) -> dict[str, DataFrame]:
    """Load every table; optionally register each as a temp view so the
    full Spark SQL surface (the reference's delegated-SQL role, SURVEY
    §2.5-2.6) is directly usable via ``spark.sql``."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = read_table(spark, name, sf_dir)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
