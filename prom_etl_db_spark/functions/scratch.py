"""Job-boundary cleanup for operator-internal persist() caches.

Multi-pass operators (MinHash banding, sign-LSH, SemDeDup) persist an
intermediate so one action doesn't recompute the expensive branch per
DAG arm. The operator returns a LAZY plan, so it cannot unpersist —
the cache must outlive the function and die at the *job* boundary,
which only the caller knows. Spark's CacheManager holds strong
references to DataFrame caches (they are NOT garbage-collected with
the Python object), so an un-released cache leaks executor memory for
the session lifetime — a real problem for the serve daemon and any
benchmarking loop.

Contract: operators register every internal ``persist()`` via
:func:`scratch`; harness loops (bench, the oracle checker, the serve
tick) call :func:`release_scratch` when the job's actions are done.
Forgetting to release degrades to the old behavior (leak until
``spark.catalog.clearCache()``), never to a wrong answer.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_SCRATCH: list[DataFrame] = []


def scratch(df: DataFrame) -> DataFrame:
    """Register an operator-internal persisted frame for deferred
    cleanup and return it unchanged (wraps ``x.persist()`` call sites)."""
    with _LOCK:
        _SCRATCH.append(df)
    return df


def release_scratch() -> int:
    """Unpersist every registered scratch frame (non-blocking) and
    return how many were released. Safe to call at any time: plans that
    still reference a released frame recompute instead of failing."""
    with _LOCK:
        frames, _SCRATCH[:] = list(_SCRATCH), []
    n = 0
    for df in frames:
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    return n
