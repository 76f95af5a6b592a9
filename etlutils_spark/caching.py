"""Lifecycle-managed persistence for pipeline intermediates.

Spark's CacheManager holds persisted plans until explicit unpersist —
repeated pipeline/query calls in one session would otherwise accumulate
cached intermediates until eviction churn dominates (measured on the 10x
corpus: 8.6 s -> 51.6 s on back-to-back dedup runs at 50k docs,
BASELINE.md). Every multi-consumer intermediate in this package (dedup
shingle tables, TPC-H reused aggregates) persists through this single
bounded tracker so one pipeline's working set stays cached for its own
fan-out and the next call evicts it.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []
_TRACKED_KEEP = 2  # LRU depth: lets back-to-back pipelines over the same
# corpus reuse the cached table (CacheManager dedupes by canonicalized
# plan) while still bounding total cached state.
# process-global shared state mutated from any thread running a pipeline
# (concurrent Spark jobs are a supported pattern): without the lock two
# racing callers could both pop the same entry / leave more than KEEP
# frames persisted (review catch)
_TRACKED_LOCK = threading.Lock()


def _same_plan(a: DataFrame, b: DataFrame) -> bool:
    """True when the two frames share one canonicalized logical plan —
    the key Spark's CacheManager dedupes cache entries by."""
    try:
        return bool(
            a._jdf.queryExecution().analyzed().sameResult(
                b._jdf.queryExecution().analyzed()
            )
        )
    except Exception:  # noqa: BLE001 - session may be gone
        return False


def persist_tracked(df: DataFrame) -> DataFrame:
    """Persist ``df`` (memory-and-disk) under the shared LRU tracker;
    the oldest tracked plan beyond the LRU depth is blocking-unpersisted.
    Thread-safe.

    An evicted frame whose canonicalized plan matches a STILL-TRACKED
    frame is dropped without unpersisting: CacheManager keys entries by
    canonical plan, so unpersisting the old twin would remove the live
    frame's cache entry too. Measured before this guard: the 3rd+
    back-to-back run of the same pipeline in one session silently lost
    its cache and flipped the semantic-dedup self-join from
    InMemoryTableScan+broadcast (~3.5 s) to full recompute + sort-merge
    (~42 s at sf0.1) — the exact churn this tracker exists to prevent.
    """
    with _TRACKED_LOCK:
        evicted = []
        while len(_TRACKED) >= _TRACKED_KEEP:
            evicted.append(_TRACKED.pop(0))
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        _TRACKED.append(df)
        # sameResult checks are cheap driver-side calls; doing them under
        # the lock keeps the decision consistent with the tracked set
        to_unpersist = [
            old
            for old in evicted
            if not any(_same_plan(old, live) for live in _TRACKED)
        ]
    # the (possibly slow) blocking unpersists run OUTSIDE the lock
    for old in to_unpersist:
        try:
            old.unpersist(blocking=True)
        except Exception:  # noqa: BLE001 - session may be gone
            pass
    return df
