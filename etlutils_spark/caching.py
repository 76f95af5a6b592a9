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

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []
_TRACKED_KEEP = 2  # LRU depth: lets back-to-back pipelines over the same
# corpus reuse the cached table (CacheManager dedupes by canonicalized
# plan) while still bounding total cached state.


def persist_tracked(df: DataFrame) -> DataFrame:
    """Persist ``df`` (memory-and-disk) under the shared LRU tracker;
    the oldest tracked plan beyond the LRU depth is blocking-unpersisted."""
    while len(_TRACKED) >= _TRACKED_KEEP:
        try:
            _TRACKED.pop(0).unpersist(blocking=True)
        except Exception:  # noqa: BLE001 - session may be gone
            pass
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _TRACKED.append(df)
    return df
