"""Bucketed co-located spatial join: the 100 TB shape for REPEATED
joins against a static layer. bbox_join shuffles both sides by cell on
every run; persisting the cell-exploded layer with bucketBy(cell) pays
that shuffle once at write time — subsequent equi-joins on the bucket
key run exchange-free on the bucketed side(s)."""

import pyspark.sql.functions as F

from gpd_lite_toolbox_spark import fixtures as FX


def _cells(df, cell):
    return df.withColumn(
        "cx", F.floor(F.col("x0") / cell).cast("long")
    ).withColumn("cy", F.floor(F.col("y0") / cell).cast("long"))


def test_bucketed_layers_join_without_exchange(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    wh = str(tmp_path / "wh")
    # warehouse.dir is static config: scope the demo db to tmp instead
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketed_demo LOCATION '{wh}'")
    try:
        a = _cells(FX.polys(spark, sf_dir, with_geometry=False), 3125.0)
        b = _cells(FX.polys_b(spark, sf_dir, with_geometry=False), 3125.0)
        for name, df in (("layer_a", a), ("layer_b", b)):
            (
                df.write.mode("overwrite")
                .bucketBy(8, "cx", "cy")
                .sortBy("cx", "cy")
                .saveAsTable(f"bucketed_demo.{name}")
            )
        ta = spark.table("bucketed_demo.layer_a")
        tb = spark.table("bucketed_demo.layer_b")
        joined = ta.alias("l").join(
            tb.alias("r"), ["cx", "cy"]
        ).select(F.col("l.id").alias("left_id"), F.col("r.id").alias("right_id"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located bucketed join: no shuffle on either side
        assert "Exchange hashpartitioning" not in plan, plan
        # and it computes the same pair set as the shuffled join
        shuffled = {
            (r.left_id, r.right_id)
            for r in a.alias("l")
            .join(b.alias("r"), ["cx", "cy"])
            .select(
                F.col("l.id").alias("left_id"),
                F.col("r.id").alias("right_id"),
            )
            .collect()
        }
        bucketed = {(r.left_id, r.right_id) for r in joined.collect()}
        assert bucketed == shuffled and len(bucketed) > 0
    finally:
        spark.sql("DROP DATABASE IF EXISTS bucketed_demo CASCADE")
