"""The cross-engine numeric recipes (gpd_lite_toolbox_spark/numerics.py)
— unit pins for the three lessons the LR/trend gates encode. The
cross-ENGINE claims are pinned by those operators' DuckDB oracles;
these tests pin the Spark-side contracts in isolation.
"""

from pyspark.sql import functions as F

from gpd_lite_toolbox_spark.numerics import R6_EPS, dsum, qdec, r6


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_r6_pushes_midpoints_up_deterministically(spark):
    # exact lattice midpoints round UP after the shift, never split
    assert _one(spark, r6(F.lit(0.0000005), 6)) == 0.000001
    assert _one(spark, r6(F.lit(1.2345675), 6)) == 1.234568
    # a negative midpoint shifts toward zero -> rounds toward zero
    assert _one(spark, r6(F.lit(-0.0000005), 6)) == 0.0
    # far-from-midpoint values are untouched by the shift
    assert _one(spark, r6(F.lit(3.141592), 6)) == 3.141592
    assert R6_EPS == 1e-9


def test_qdec_is_lossless_on_lattice_values(spark):
    df = spark.range(1).select(
        F.lit(123.456789).alias("a"), F.lit(-0.000001).alias("b")
    )
    row = df.select(
        qdec("a").cast("double").alias("a"),
        qdec("b").cast("double").alias("b"),
    ).collect()[0]
    assert row.a == 123.456789 and row.b == -0.000001


def test_dsum_is_partition_order_independent(spark):
    # values chosen so a DOUBLE sum's result depends on order (large
    # + tiny alternating); the decimal path must not
    vals = [(1e7 if i % 2 == 0 else 1e-6,) for i in range(2000)]
    ref = None
    for parts in (1, 13, 64):
        df = spark.createDataFrame(vals, "x double").repartition(parts)
        got = df.agg(dsum(qdec("x")).alias("s")).collect()[0].s
        if ref is None:
            ref = got
        assert got == ref, parts
    assert ref == 1e7 * 1000 + 1e-6 * 1000  # exact
