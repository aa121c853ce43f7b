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

import warnings
from contextlib import contextmanager

import pyspark
from pyspark.sql import DataFrame

_ATTR = "_graft_persisted"


def register_persisted(result: DataFrame, *deps: DataFrame) -> DataFrame:
    """Record ``deps`` (persisted DataFrames) as cache dependencies of
    ``result`` so the caller can release them after materializing."""
    existing = list(getattr(result, _ATTR, ()))
    setattr(result, _ATTR, existing + list(deps))
    return result


_CK_ATTR = "_graft_checkpointed"

# Eager checkpoint release rides on PRIVATE Spark internals
# (``df._jdf.queryExecution().analyzed()``, the ``LogicalRDD`` class-
# name match, ``plan.rdd()``) — verified against these pyspark
# minor versions only.  Outside the range we degrade to a no-op with
# a one-time warning (the ContextCleaner still frees the blocks
# eventually, so correctness is unaffected) instead of poking at
# internals that may have moved (VERDICT r3 watch-list item).
_CK_SUPPORTED_MIN = (3, 4)
_CK_SUPPORTED_MAX = (4, 1)
_warned_versions: set = set()


def _checkpoint_api_supported(version: str | None = None) -> bool:
    version = version if version is not None else pyspark.__version__
    try:
        mm = tuple(int(x) for x in version.split(".")[:2])
    except ValueError:
        return False
    return _CK_SUPPORTED_MIN <= mm <= _CK_SUPPORTED_MAX


def _checkpoint_jrdd(df: DataFrame):
    """The JVM RDD backing a ``localCheckpoint()``-ed DataFrame (its
    analyzed plan is a LogicalRDD wrapping the checkpointed RDD).
    Returns None — deferring the release to the ContextCleaner — on an
    unverified Spark version or if the private API surface moved."""
    version = pyspark.__version__
    if not _checkpoint_api_supported(version):
        if version not in _warned_versions:
            _warned_versions.add(version)
            warnings.warn(
                f"release_checkpoint: pyspark {version} is outside the "
                f"verified range "
                f"{'.'.join(map(str, _CK_SUPPORTED_MIN))}–"
                f"{'.'.join(map(str, _CK_SUPPORTED_MAX))} for the private "
                f"queryExecution/LogicalRDD API; eager block release is a "
                f"no-op (the ContextCleaner will free blocks eventually).",
                RuntimeWarning,
                stacklevel=3,
            )
        return None
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getName().endswith("LogicalRDD"):
            return plan.rdd()
    except Exception as exc:
        # supported version but the internals still misbehaved: say so
        # once rather than silently skipping the release forever
        key = f"{version}:api-error"
        if key not in _warned_versions:
            _warned_versions.add(key)
            warnings.warn(
                f"release_checkpoint: private-API probe failed on pyspark "
                f"{version} ({exc!r}); this eager block release was "
                f"skipped (warning once per process).",
                RuntimeWarning,
                stacklevel=3,
            )
    return None


def release_checkpoint(df: DataFrame) -> None:
    """Free the blocks of a ``localCheckpoint()``-ed DataFrame NOW
    instead of waiting for the ContextCleaner.  The checkpoint
    truncated the lineage, so the DataFrame is unusable afterwards —
    only call on state nothing references anymore (e.g. a superseded
    iteration of an iterative algorithm)."""
    jrdd = _checkpoint_jrdd(df)
    if jrdd is not None:
        jrdd.unpersist(False)


def register_checkpointed(result: DataFrame, *deps: DataFrame) -> DataFrame:
    """Record ``deps`` (localCheckpoint'ed DataFrames) for release via
    :func:`release_persisted`.  Unlike a persisted dep, a released
    checkpoint cannot be recomputed — release only after the result is
    fully materialized."""
    existing = list(getattr(result, _CK_ATTR, ()))
    setattr(result, _CK_ATTR, existing + list(deps))
    return result


def propagate_persisted(result: DataFrame, source: DataFrame) -> DataFrame:
    """Move the cache dependencies registered on an intermediate
    ``source`` onto a derived ``result`` (for operators that wrap
    another operator's output)."""
    register_persisted(result, *getattr(source, _ATTR, ()))
    setattr(source, _ATTR, [])
    register_checkpointed(result, *getattr(source, _CK_ATTR, ()))
    setattr(source, _CK_ATTR, [])
    return result


def release_persisted(df: DataFrame, blocking: bool = False) -> None:
    """Unpersist every cache dependency an operator registered on
    ``df``.  Call AFTER materializing (collect/write/count) — the
    result stays correct either way, but an early release forfeits the
    reuse the cache existed for."""
    for dep in getattr(df, _ATTR, ()):
        dep.unpersist(blocking=blocking)
    setattr(df, _ATTR, [])
    for dep in getattr(df, _CK_ATTR, ()):
        release_checkpoint(dep)
    setattr(df, _CK_ATTR, [])


@contextmanager
def released(df: DataFrame, blocking: bool = False):
    """``with released(pairs): pairs.write...`` — releases the
    operator caches on exit, success or failure."""
    try:
        yield df
    finally:
        release_persisted(df, blocking=blocking)
