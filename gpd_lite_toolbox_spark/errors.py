"""Shared error-introspection helpers.

Swallowing a broad ``AnalysisException`` around a "missing input is
legal" read turns corrupt/half-written state into silent empty results
— for a dedup index that means admitting every document as
non-duplicate, for a tombstone table it means resurrecting deleted
vectors. Every such handler in this package must narrow on the error
CLASS, not the exception type (round-5 ADVICE; the per-site tests pin
the corrupt-state propagation).
"""

from __future__ import annotations


def analysis_condition(e: Exception) -> str | None:
    """The Spark error class of an AnalysisException (e.g.
    ``PATH_NOT_FOUND``), robust across the PySpark 4 rename
    (``getCondition``) and its deprecated predecessor
    (``getErrorClass``); None when neither yields one."""
    for probe in ("getCondition", "getErrorClass"):
        fn = getattr(e, probe, None)
        if fn is not None:
            try:
                cond = fn()
            except Exception:
                cond = None
            if cond:
                return cond
    return None


def is_path_not_found(e: Exception) -> bool:
    return analysis_condition(e) == "PATH_NOT_FOUND"
