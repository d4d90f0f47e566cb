"""Storage-layout maintenance: file-level statistics and compaction
planning.

Extension beyond gpd_lite_toolbox (LLM-pipeline family): a 100 TB
corpus that ingests incrementally accumulates the small-files problem
— thousands of KB-sized parquet files per partition whose
open/footer-read overhead dominates scan time. The standing fix is a
periodic compaction pass; these operators produce its inputs: a
per-file stats table (from Spark's hidden ``_metadata`` scan column —
no extra IO, the listing rides the scan plan) and a deterministic
greedy bin assignment that groups small files into target-sized
rewrite tasks.

The bin assignment is running-total arithmetic over the FILE LIST —
metadata-scale (one row per file), not data-scale — so the single
ordered window inside ``compaction_plan`` is bounded by file count,
the same driver-adjacent budget every table format's compactor
(Delta OPTIMIZE, Iceberg rewrite_data_files) spends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def file_stats(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Per-file ``(file_path, file_bytes, n_rows)`` for every data
    file under ``path``: Spark's ``_metadata`` column exposes the
    owning file per row, so one combinable aggregate keyed by file
    yields exact row counts alongside the listed size — no separate
    listing job, and column pruning keeps the scan footer-thin."""
    df = spark.read.format(fmt).load(path)
    return (
        df.select(
            F.col("_metadata.file_path").alias("file_path"),
            F.col("_metadata.file_size").alias("file_bytes"),
        )
        .groupBy("file_path", "file_bytes")
        .agg(F.count("*").alias("n_rows"))
    )


def compaction_plan(
    stats: DataFrame,
    target_rows: int,
    key_col: str = "file_path",
    rows_col: str = "n_rows",
) -> DataFrame:
    """Greedy compaction bins over a file-stats table: files are
    taken in ``key_col`` order and assigned
    ``bin = floor(running_rows_before / target_rows)`` — consecutive
    small files share a bin until the target fills, oversized files
    claim bins alone, and the assignment is a pure function of the
    stats table (deterministic, re-runnable, cross-engine checkable).

    Columns: ``(key, n_rows, bin, bin_rows)`` with ``bin_rows`` the
    bin's total (the rewrite task's output size, for skew review).

    The ordered running total is ONE unpartitioned window — correct
    here and only here because the input is the file LIST (one row
    per file); never point this at a data-scale frame."""
    if target_rows <= 0:
        raise ValueError("target_rows must be positive")
    w = Window.orderBy(F.col("key")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    binned = stats.select(
        F.col(key_col).alias("key"), F.col(rows_col).alias("n_rows")
    ).withColumn(
        "bin",
        F.floor(
            F.coalesce(F.sum("n_rows").over(w), F.lit(0))
            / F.lit(int(target_rows))
        ).cast("int"),
    )
    wb = Window.partitionBy("bin")
    return binned.withColumn(
        "bin_rows", F.sum("n_rows").over(wb)
    ).select("key", "n_rows", "bin", "bin_rows")
