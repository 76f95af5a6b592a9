"""Structured Streaming mirror of the chunked-ingest loop (SURVEY §2.7)."""

import tempfile

from pyspark.sql import functions as F

from etlutils_spark.streaming.ingest import (
    foreach_batch_ingest,
    run_available_now,
    stream_events_file,
    windowed_event_counts,
)


def test_streaming_matches_batch(spark, sf_dir, star):
    events = stream_events_file(spark, sf_dir)
    agg = windowed_event_counts(events, window="1 hour", watermark="2 hours")
    out = run_available_now(spark, agg, query_name="t_stream", output_mode="complete")
    batch = (
        star["events"]
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    got = {(r.window_start, r.event_type): r.n_events for r in out.collect()}
    want = {(r.window_start, r.event_type): r.n_events for r in batch.collect()}
    assert got == want


def test_foreach_batch_ingest_roundtrip(spark, sf_dir, star):
    events = stream_events_file(spark, sf_dir)
    tmp = tempfile.mkdtemp()

    def transform(df, epoch_id):
        # the per-chunk transFUN role: add a derived column per batch
        return df.withColumn("value_x2", F.col("value") * 2)

    q = foreach_batch_ingest(events, transform, f"{tmp}/out", f"{tmp}/ckpt")
    q.awaitTermination()
    back = spark.read.parquet(f"{tmp}/out")
    assert back.count() == star["events"].count()
    assert "value_x2" in back.columns


def test_streaming_curation_equals_batch(spark, sf_dir):
    from etlutils_spark.operators.quality import quality_filter
    from etlutils_spark.operators.sampling import hash_sample
    from etlutils_spark.streaming.ingest import (
        run_available_now,
        stream_documents_file,
    )

    def curate(df):
        return hash_sample(quality_filter(df, keep_only=True), 0.5).select(
            "doc_id", "lang", "source"
        )

    streamed = run_available_now(
        spark, curate(stream_documents_file(spark, sf_dir)),
        query_name="t_stream_curation",
    )
    batch = curate(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    got = sorted(r.doc_id for r in streamed.collect())
    want = sorted(r.doc_id for r in batch.collect())
    assert got == want and len(got) > 0


def test_foreach_batch_exactly_once_replay(spark, sf_dir, star):
    from etlutils_spark.streaming.ingest import (
        foreach_batch_exactly_once,
        stream_events_file,
    )

    base = tempfile.mkdtemp()
    out, ckpt = f"{base}/out", f"{base}/ckpt"
    n_expect = star["events"].count()

    q = foreach_batch_exactly_once(stream_events_file(spark, sf_dir), out, ckpt)
    q.awaitTermination()
    first = spark.read.parquet(out)
    assert first.count() == n_expect

    # same checkpoint: nothing new to process, no growth
    q2 = foreach_batch_exactly_once(stream_events_file(spark, sf_dir), out, ckpt)
    q2.awaitTermination()
    assert spark.read.parquet(out).count() == n_expect

    # simulate an at-least-once REPLAY: wipe the checkpoint so the same
    # input re-delivers as the same epoch ids — the overwrite-per-epoch
    # contract must leave the row count unchanged (no duplicates)
    import shutil

    shutil.rmtree(ckpt)
    q3 = foreach_batch_exactly_once(stream_events_file(spark, sf_dir), out, f"{base}/ckpt2")
    q3.awaitTermination()
    assert spark.read.parquet(out).count() == n_expect


def test_streaming_dedup_index_equals_batch(spark, tmp_path):
    """streaming_dedup_index must produce labels bit-identical to a
    from-scratch build_dedup_index on everything ingested — the one-
    code-path contract (the foreachBatch body IS extend_dedup_index;
    batch 0 bootstraps via build_dedup_index)."""
    import os

    from etlutils_spark.operators.dedup import build_dedup_index
    from etlutils_spark.streaming.incremental_lsh import (
        streaming_dedup_index,
    )

    base = "the quick brown fox jumps over the lazy dog near the river"
    rows = [
        (1, base + " one"), (2, base + " two"),
        (3, "completely different text about columnar storage engines"),
        (4, base + " three"), (5, "another note concerning partitions"),
        (6, base + " four"), (7, "hi"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    src = str(tmp_path / "src")
    os.makedirs(src)
    # 3 ordered single-file slices -> 3 micro-batches
    for i, lo in enumerate((1, 4, 6)):
        hi = {1: 3, 4: 5, 6: 7}[lo]
        docs.filter(f"doc_id between {lo} and {hi}").coalesce(1).write.parquet(
            str(tmp_path / f"stage{i}")
        )
        part = next(
            f for f in sorted(os.listdir(tmp_path / f"stage{i}"))
            if f.endswith(".parquet")
        )
        os.replace(tmp_path / f"stage{i}" / part, f"{src}/slice{i}.parquet")
        os.utime(f"{src}/slice{i}.parquet", (1_000_000 + i * 10,) * 2)
    stream = (
        spark.readStream.schema(docs.schema)
        .format("parquet").option("maxFilesPerTrigger", 1).load(src)
    )
    q = streaming_dedup_index(
        stream, path=str(tmp_path / "idx"), checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    pick = ["doc_id", "cluster_id"]
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "idx" / "labels"))
        .select(pick).collect()
    )
    want = sorted(
        tuple(r)
        for r in build_dedup_index(docs, str(tmp_path / "full"))
        .select(pick).collect()
    )
    assert got == want
    labels = dict(got)
    assert labels[1] == labels[2] == labels[4] == labels[6] == 1
    assert labels[3] == 3 and labels[5] == 5 and labels[7] == 7


def test_streaming_dedup_index_clean_batch_micro(spark, tmp_path):
    """A CLEAN micro-batch (zero verified pairs — the common production
    case) flowing through the stream must take extend's r9 fast path
    without corrupting the epoch protocol or the star a LATER dirty
    micro-batch merges against: slice1 is all-unique, slice2 pairs with
    a slice0 doc, and the final labels must equal a from-scratch
    build."""
    import os

    from etlutils_spark.operators.dedup import build_dedup_index
    from etlutils_spark.streaming.incremental_lsh import (
        streaming_dedup_index,
    )

    base = "the quick brown fox jumps over the lazy dog near the river"
    rows = [
        (1, base + " one"), (2, base + " two"),
        (3, "completely different text about columnar storage engines"),
        # slice1: CLEAN — unique word salads, no pairs anywhere
        (4, "adaptive execution notes on exchange reuse and reopt"),
        (5, "watermark semantics for append mode output tables"),
        # slice2: dirty — merges with the slice0 component
        (6, base + " three"), (7, "hi"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, (lo, hi) in enumerate(((1, 3), (4, 5), (6, 7))):
        docs.filter(f"doc_id between {lo} and {hi}").coalesce(1).write.parquet(
            str(tmp_path / f"stage{i}")
        )
        part = next(
            f for f in sorted(os.listdir(tmp_path / f"stage{i}"))
            if f.endswith(".parquet")
        )
        os.replace(tmp_path / f"stage{i}" / part, f"{src}/slice{i}.parquet")
        os.utime(f"{src}/slice{i}.parquet", (1_000_000 + i * 10,) * 2)
    stream = (
        spark.readStream.schema(docs.schema)
        .format("parquet").option("maxFilesPerTrigger", 1).load(src)
    )
    q = streaming_dedup_index(
        stream, path=str(tmp_path / "idx"), checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    pick = ["doc_id", "cluster_id"]
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "idx" / "labels"))
        .select(pick).collect()
    )
    want = sorted(
        tuple(r)
        for r in build_dedup_index(docs, str(tmp_path / "full"))
        .select(pick).collect()
    )
    assert got == want
    labels = dict(got)
    assert labels[1] == labels[2] == labels[6] == 1  # merged across clean gap
    assert labels[4] == 4 and labels[5] == 5          # clean batch self-labels


def test_streaming_dedup_index_resumes_from_checkpoint(spark, tmp_path):
    """Restarting the ingest stream with the same checkpoint must pick
    up only NEW slices and fold them through the same index — the
    resume path a production ingest actually exercises (availableNow
    drains what exists, the next start continues from the checkpoint).
    Labels after the second run must equal a from-scratch build on
    everything ingested."""
    import os

    from etlutils_spark.operators.dedup import build_dedup_index
    from etlutils_spark.streaming.incremental_lsh import (
        streaming_dedup_index,
    )

    base = "the quick brown fox jumps over the lazy dog near the river"
    rows = [
        (1, base + " one"), (2, base + " two"),
        (3, "completely different text about columnar storage engines"),
        (4, base + " three"),
        (5, "late-arriving unrelated note concerning shuffle partitions"),
        (6, base + " four"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    src = str(tmp_path / "src")
    os.makedirs(src)

    def land_slice(name, lo, hi, mtime):
        stage = tmp_path / f"stage_{name}"
        docs.filter(f"doc_id between {lo} and {hi}").coalesce(1)\
            .write.parquet(str(stage))
        part = next(f for f in sorted(os.listdir(stage))
                    if f.endswith(".parquet"))
        os.replace(stage / part, f"{src}/{name}.parquet")
        os.utime(f"{src}/{name}.parquet", (mtime, mtime))

    def run_stream():
        stream = (
            spark.readStream.schema(docs.schema)
            .format("parquet").option("maxFilesPerTrigger", 1).load(src)
        )
        q = streaming_dedup_index(
            stream, path=str(tmp_path / "idx"),
            checkpoint=str(tmp_path / "ckpt"),
        )
        q.awaitTermination()

    land_slice("s0", 1, 3, 1_000_000)
    land_slice("s1", 4, 4, 1_000_010)
    run_stream()  # drains s0 (bootstrap) + s1 (extend), then stops
    first = {
        r.doc_id: r.cluster_id
        for r in spark.read.parquet(str(tmp_path / "idx" / "labels")).collect()
    }
    assert first == {1: 1, 2: 1, 3: 3, 4: 1}

    land_slice("s2", 5, 6, 1_000_020)  # new data arrives after the stop
    run_stream()  # same checkpoint: must process ONLY s2
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "idx" / "labels")).collect()
    )
    want = sorted(
        tuple(r)
        for r in build_dedup_index(docs, str(tmp_path / "full")).collect()
    )
    assert got == want


def test_streaming_ann_index_equals_batch(spark, tmp_path):
    """streaming_ann_index must leave a codes table bit-identical to
    bootstrapping build_ann_index on the same first slice and batch-
    extending the rest in one call — the one-code-path contract for
    the ANN artifact (the foreachBatch body IS extend_ann_index, and
    extend is per-vector stateless against the frozen quantizers, so
    batching granularity cannot matter). The streamed artifact must
    also serve exact queries."""
    import os

    from etlutils_spark.operators.similarity import (
        ann_index_topk,
        build_ann_index,
        extend_ann_index,
    )
    from etlutils_spark.streaming.incremental_ann import streaming_ann_index
    from tests.test_dedup_similarity import _clustered_vectors

    vecs = _clustered_vectors(spark, n_per=8, dim=16)
    src = str(tmp_path / "src")
    os.makedirs(src)
    # slice 0 carries members of all 4 anchors (j < 4 of each cluster)
    # so the bootstrap trains representative centroids; slice 1 is the
    # extend batch
    slices = [vecs.filter("vec_id % 100 < 4"), vecs.filter("vec_id % 100 >= 4")]
    for i, sl in enumerate(slices):
        sl.coalesce(1).write.parquet(str(tmp_path / f"stage{i}"))
        part = next(
            f for f in sorted(os.listdir(tmp_path / f"stage{i}"))
            if f.endswith(".parquet")
        )
        os.replace(tmp_path / f"stage{i}" / part, f"{src}/slice{i}.parquet")
        os.utime(f"{src}/slice{i}.parquet", (1_000_000 + i * 10,) * 2)
    stream = (
        spark.readStream.schema(vecs.schema)
        .format("parquet").option("maxFilesPerTrigger", 1).load(src)
    )
    q = streaming_ann_index(
        stream, path=str(tmp_path / "idx"),
        checkpoint=str(tmp_path / "ckpt"),
        num_clusters=4, m=4, ksub=8,
    )
    q.awaitTermination()

    # the twin deliberately bootstraps from the IN-MEMORY frame (a
    # different lineage/partitioning than the stream's file read):
    # build_ann_index trains driver-side on the orderBy(id) sample, so
    # the artifact is pinned partition-INDEPENDENT — Spark ML KMeans
    # here failed exactly this comparison (per-partition init
    # sampling numbered the centroids differently per scan path)
    twin = str(tmp_path / "twin")
    build_ann_index(slices[0], twin, num_clusters=4, m=4, ksub=8)
    extend_ann_index(twin, slices[1])

    def canon(path):
        return sorted(
            (r.vec_id, r.cluster_id, tuple(r.codes))
            for r in spark.read.parquet(f"{path}/codes").collect()
        )

    got, want = canon(str(tmp_path / "idx")), canon(twin)
    assert got == want and len(got) == 32
    # the streamed artifact serves: self-matches are excluded (the
    # ann_cosine_topk oracle convention), so exhaustive-probe top-1 is
    # each query's nearest same-anchor neighbour
    queries = vecs.filter("vec_id in (0, 100)")
    top = ann_index_topk(
        vecs, str(tmp_path / "idx"), queries, k=3, nprobe=4,
        shortlist=2**31 - 1,
    )
    top1 = {r.query_id: r.vec_id for r in top.collect() if r.rank == 1}
    assert top1 == {0: 1, 100: 101}


def test_streaming_dedup_index_compact_every(spark, tmp_path):
    """compact_every folds small-files maintenance into the stream:
    after 3 micro-batches with compact_every=2 the profile table has
    been collapsed mid-stream, and the final labels still equal a
    from-scratch build (compaction is content-identical and runs
    under its own lease hold between batches)."""
    import os

    from etlutils_spark.operators.dedup import build_dedup_index
    from etlutils_spark.streaming.incremental_lsh import (
        streaming_dedup_index,
    )

    base = "the quick brown fox jumps over the lazy dog near the river"
    rows = [
        (1, base + " one"), (2, base + " two"),
        (3, "completely different text about columnar storage engines"),
        (4, base + " three"), (5, "another note concerning partitions"),
        (6, base + " four"), (7, "hi"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, (lo, hi) in enumerate(((1, 3), (4, 5), (6, 7))):
        docs.filter(f"doc_id between {lo} and {hi}").coalesce(1).write.parquet(
            str(tmp_path / f"stage{i}")
        )
        part = next(
            f for f in sorted(os.listdir(tmp_path / f"stage{i}"))
            if f.endswith(".parquet")
        )
        os.replace(tmp_path / f"stage{i}" / part, f"{src}/slice{i}.parquet")
        os.utime(f"{src}/slice{i}.parquet", (1_000_000 + i * 10,) * 2)
    stream = (
        spark.readStream.schema(docs.schema)
        .format("parquet").option("maxFilesPerTrigger", 1).load(src)
    )
    q = streaming_dedup_index(
        stream, path=str(tmp_path / "idx"), checkpoint=str(tmp_path / "ckpt"),
        compact_every=2,
    )
    q.awaitTermination()
    # batch 3 appended after the batch-2 compaction: 1 (compacted) + 1
    prof_files = [
        f for f in os.listdir(tmp_path / "idx" / "profiles")
        if f.endswith(".parquet")
    ]
    assert len(prof_files) == 2
    pick = ["doc_id", "cluster_id"]
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "idx" / "labels"))
        .select(pick).collect()
    )
    want = sorted(
        tuple(r)
        for r in build_dedup_index(docs, str(tmp_path / "full"))
        .select(pick).collect()
    )
    assert got == want


def test_streaming_dedup_index_heals_mid_swap_compaction_crash(spark, tmp_path):
    """A compaction that dies between its two renames leaves the
    profile table MISSING with a fully-written .compact_tmp beside it;
    a restarted stream with compact_every set must heal it before the
    first extend instead of failing every restart (round-9 review
    finding)."""
    import os
    import shutil

    from etlutils_spark.streaming.incremental_lsh import (
        streaming_dedup_index,
    )

    base = "the quick brown fox jumps over the lazy dog near the river"
    rows = [
        (1, base + " one"), (2, base + " two"),
        (3, "completely different text about columnar storage engines"),
        (4, base + " three"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    src = str(tmp_path / "src")
    os.makedirs(src)
    docs.filter("doc_id <= 3").coalesce(1).write.parquet(str(tmp_path / "s0"))
    part = next(f for f in sorted(os.listdir(tmp_path / "s0"))
                if f.endswith(".parquet"))
    os.replace(tmp_path / "s0" / part, f"{src}/slice0.parquet")
    idx, ckpt = str(tmp_path / "idx"), str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(docs.schema)
        .format("parquet").option("maxFilesPerTrigger", 1).load(src)
    )
    streaming_dedup_index(stream, path=idx, checkpoint=ckpt,
                          compact_every=5).awaitTermination()
    # simulate the mid-swap crash: table renamed away, tmp fully written
    shutil.move(f"{idx}/profiles", f"{idx}/profiles.compact_tmp")
    # second slice arrives; the restarted stream must heal, then extend
    docs.filter("doc_id = 4").coalesce(1).write.parquet(str(tmp_path / "s1"))
    part = next(f for f in sorted(os.listdir(tmp_path / "s1"))
                if f.endswith(".parquet"))
    os.replace(tmp_path / "s1" / part, f"{src}/slice1.parquet")
    stream2 = (
        spark.readStream.schema(docs.schema)
        .format("parquet").option("maxFilesPerTrigger", 1).load(src)
    )
    streaming_dedup_index(stream2, path=idx, checkpoint=ckpt,
                          compact_every=5).awaitTermination()
    labels = dict(
        sorted(tuple(r) for r in spark.read.parquet(f"{idx}/labels")
               .select("doc_id", "cluster_id").collect())
    )
    assert labels[1] == labels[2] == labels[4] == 1 and labels[3] == 3
    assert not os.path.exists(f"{idx}/profiles.compact_tmp")


def test_stream_events_file_reraises_non_nanos_read_errors(spark, tmp_path):
    """A missing events file must re-raise the ORIGINAL error, not be
    treated as the TIMESTAMP(NANOS) case — the old bare except set the
    session-global nanosAsLong shim and then failed again with a
    misleading second error (review catch)."""
    import pytest

    from etlutils_spark.streaming.ingest import stream_events_file

    key = "spark.sql.legacy.parquet.nanosAsLong"
    before = spark.conf.get(key, None)
    with pytest.raises(Exception) as ei:
        stream_events_file(spark, str(tmp_path / "no_such_dir"))
    # the original path error surfaces, not a nanos-shim follow-on
    assert "NANOS" not in str(ei.value).upper()
    assert spark.conf.get(key, None) == before
