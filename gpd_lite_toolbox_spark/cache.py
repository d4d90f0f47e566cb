"""Explicit lifecycle for operator-internal persists.

Pair/model operators ``persist()`` intermediates that feed both sides
of a join (signatures, band tables, per-class aggregates) and return a
LAZY frame that depends on them — they cannot unpersist before the
caller consumes the result, and before this module the only recourse
for a long-lived driver was the GLOBAL ``spark.catalog.clearCache()``.

``tracked_persist()`` is a drop-in replacement for ``df.persist()``
that records the handle; ``release_caches()`` unpersists everything
recorded, so a service calling pair operators per batch frees exactly
the package's caches and nothing else.  Operators that materialize
internally and release their own caches (dup_groups, pagerank, hits)
do not need the registry and stay self-managing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` + registration for ``release_caches()``.
    Semantics are identical to a bare persist; the recorded handle
    only enables the later release."""
    df.persist()
    _TRACKED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every intermediate recorded by ``tracked_persist()``
    and clear the registry; returns the number released.  Safe at any
    time: results already consumed recompute from lineage if re-used,
    an intermediate an operator released itself unpersists as a no-op,
    and the call never touches caches the APPLICATION created."""
    n = len(_TRACKED)
    for df in _TRACKED:
        df.unpersist()
    _TRACKED.clear()
    for hook in _RELEASE_HOOKS:
        hook()
    return n


class scoped_release:
    """Context manager releasing exactly the intermediates
    ``tracked_persist`` records INSIDE the with-block — for drivers of
    unbounded loops (a streaming ``foreachBatch`` probing per
    micro-batch) where the global ``release_caches()`` would also
    evict long-lived memoized frames, and NO release would accumulate
    one persisted frame per batch forever. The caller must have
    CONSUMED the scoped results (written/collected) before the block
    exits; they recompute from lineage if reused after."""

    def __enter__(self) -> "scoped_release":
        self._n0 = len(_TRACKED)
        return self

    def __exit__(self, *exc) -> None:
        for df in _TRACKED[self._n0 :]:
            df.unpersist()
        del _TRACKED[self._n0 :]


_RELEASE_HOOKS: list = []


def on_release(hook) -> None:
    """Register a zero-arg callback invoked by ``release_caches()``
    AFTER the unpersist sweep — for callers that memoize handles to
    tracked frames (a handle left in a dict after release would make
    later lookups silently serve an unpersisted frame). Idempotent
    per function object."""
    if hook not in _RELEASE_HOOKS:
        _RELEASE_HOOKS.append(hook)
