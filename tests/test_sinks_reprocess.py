"""Partition-level reprocessing (overwrite_partitions): a backfill of
one partition must replace exactly that partition — siblings
untouched, no duplicates — where static overwrite mode would truncate
the whole table. The re-run contract of a scheduled 100 TB pipeline."""

from __future__ import annotations

import pyspark.sql.functions as F

from gpd_lite_toolbox_spark.sources.sinks import overwrite_partitions


def test_dynamic_partition_overwrite_replaces_only_touched_partition(
    spark, tmp_path
):
    path = str(tmp_path / "table")
    full = spark.createDataFrame(
        [(h, i, float(i)) for h in range(4) for i in range(10)],
        "hour int, id int, v double",
    )
    overwrite_partitions(full, path, ["hour"])
    assert spark.read.parquet(path).count() == 40

    # backfill hour 2 with corrected (and fewer) rows
    fix = spark.createDataFrame(
        [(2, i, float(i) + 100.0) for i in range(5)],
        "hour int, id int, v double",
    )
    overwrite_partitions(fix, path, ["hour"])
    back = spark.read.parquet(path)
    assert back.count() == 35  # 3 x 10 untouched + 5 corrected
    h2 = back.filter(F.col("hour") == 2)
    assert h2.count() == 5
    assert h2.agg(F.min("v")).first()[0] == 100.0  # corrected values
    # sibling partitions byte-identical in content
    assert back.filter(F.col("hour") == 1).agg(F.sum("v")).first()[0] == 45.0


def test_static_overwrite_would_have_truncated(spark, tmp_path):
    """Contrast pin: the plain overwrite (what callers reach for by
    default) drops the untouched partitions — the failure mode
    overwrite_partitions exists to prevent."""
    path = str(tmp_path / "table")
    full = spark.createDataFrame(
        [(h, i) for h in range(4) for i in range(10)], "hour int, id int"
    )
    full.write.mode("overwrite").partitionBy("hour").parquet(path)
    one = spark.createDataFrame([(2, 0)], "hour int, id int")
    one.write.mode("overwrite").partitionBy("hour").parquet(path)
    assert spark.read.parquet(path).count() == 1
