"""Shared task-parallelism helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen(df: DataFrame) -> DataFrame:
    """Restore task parallelism ahead of heavy per-row work when the
    input scan has fewer partitions than cores: expression-pinned
    folds (md5 shingling, WKB geometry derivation) and Arrow kernels
    execute on the SCAN side of the first exchange, so an input that
    arrives as a handful of files runs them on a handful of tasks
    (measured 4-6x slower than the same work spread wide). A row-sized
    round-robin exchange is far cheaper than the work it unblocks;
    already-wide inputs (the 100 TB case — thousands of scan
    partitions) and streaming frames pass through untouched."""
    if df.isStreaming:
        return df
    width = df.sparkSession.sparkContext.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - exotic plans; keep as-is
        return df
    return df.repartition(width) if n < width else df
