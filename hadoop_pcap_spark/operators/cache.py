"""Deterministic release of operator-internal caches.

Several operators persist an intermediate (shingle arrays, normalized
vectors) that feeds multiple consumers of the returned *lazy*
DataFrame.  The persist must outlive the operator call, so the
operator can't unpersist it itself — but benchmark loops and
multi-corpus jobs that never release it accumulate cached blocks
until a global ``spark.catalog.clearCache()``, which also evicts
unrelated caches (ADVICE r2).

Pattern: operators attach their persisted dependencies to the result
with :func:`register_persisted`; callers materialize the result, then
call :func:`release_persisted` (or use :func:`released` as a context
manager) to unpersist exactly those dependencies — nothing else."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

_ATTR = "_graft_persisted"


def register_persisted(result: DataFrame, *deps: DataFrame) -> DataFrame:
    """Record ``deps`` (persisted DataFrames) as cache dependencies of
    ``result`` so the caller can release them after materializing."""
    existing = list(getattr(result, _ATTR, ()))
    setattr(result, _ATTR, existing + list(deps))
    return result


def release_persisted(df: DataFrame, blocking: bool = False) -> None:
    """Unpersist every cache dependency an operator registered on
    ``df``.  Call AFTER materializing (collect/write/count) — the
    result stays correct either way, but an early release forfeits the
    reuse the cache existed for."""
    for dep in getattr(df, _ATTR, ()):
        dep.unpersist(blocking=blocking)
    setattr(df, _ATTR, [])


@contextmanager
def released(df: DataFrame, blocking: bool = False):
    """``with released(pairs): pairs.write...`` — releases the
    operator caches on exit, success or failure."""
    try:
        yield df
    finally:
        release_persisted(df, blocking=blocking)
