"""Stateful streaming + sink tests."""

import os

import pyspark.sql.functions as F

from gpd_lite_toolbox_spark import fixtures as FX


def test_stateful_session_count_matches_batch(spark, sf_dir):
    from gpd_lite_toolbox_spark.streaming.grid_stream import (
        run_stateful_session_count,
        sessionize,
    )

    FX.register_base_tables(spark, sf_dir)
    batch = (
        sessionize(spark.table("events"))
        .groupBy("user_id")
        .agg(
            F.countDistinct("session_id").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
        .toPandas()
        .sort_values("user_id", ignore_index=True)
    )
    stateful = (
        run_stateful_session_count(spark, f"{sf_dir}/events.parquet")
        .toPandas()
        .sort_values("user_id", ignore_index=True)
    )
    assert len(batch) == len(stateful)
    assert (batch.n_events.to_numpy() == stateful.n_events.to_numpy()).all()
    assert (batch.n_sessions.to_numpy() == stateful.n_sessions.to_numpy()).all()


def test_partitioned_geoparquet_roundtrip(spark, sf_dir, tmp_path):
    from gpd_lite_toolbox_spark.sources.sinks import write_geoparquet

    pts = FX.points(spark, sf_dir)
    out = str(tmp_path / "pts_part")
    write_geoparquet(pts, out, cell_size=25000.0)
    # spatial partition dirs exist
    assert any(d.startswith("pcell=") for d in os.listdir(out))
    back = spark.read.parquet(out)
    assert back.count() == pts.count()
    # a bbox filter prunes partitions: read one cell's worth
    one = back.filter(
        (F.col("x") >= 0) & (F.col("x") < 25000)
        & (F.col("y") >= 0) & (F.col("y") < 25000)
    )
    assert 0 < one.count() < pts.count()
