"""Bounded persist management for plan-builder functions.

Operators that fan one intermediate frame into several plan branches
(the TF-IDF weight frame, the shingle frame) persist it so the branches
don't each re-derive the chain from the scan.  But a builder function
has no lifecycle hook to unpersist — returning the frame hands the plan
to the caller, and the cached RDD would outlive every use (one leaked
cache entry per call for the life of the session).

``persist_rotating`` bounds that: each persisted frame is enrolled in a
small FIFO ring; enrolling past the capacity unpersists the oldest.
Long-lived sessions converge to at most ``_CAPACITY`` cached
intermediates instead of growing without limit, while the frames most
recently built (the ones whose plans are still live) stay cached.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_CAPACITY = 8
_RING: list[DataFrame] = []
_LOCK = threading.Lock()


def persist_rotating(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """Persist ``df`` and enroll it in the bounded ring; evicts (and
    unpersists) the oldest enrolled frame beyond capacity."""
    df.persist(level)
    with _LOCK:
        _RING.append(df)
        while len(_RING) > _CAPACITY:
            oldest = _RING.pop(0)
            try:
                oldest.unpersist(blocking=False)
            except Exception:
                pass  # session torn down — nothing to free
    return df
