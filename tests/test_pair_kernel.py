"""Differential + unit tests for the convex pair-intersection kernel:
the UDF path must agree with the native bbox-column fast path on the
rectangle fixtures, and handle true convex (non-rectangular) shapes."""

import math

import numpy as np
import pyspark.sql.functions as F

from gpd_lite_toolbox_spark import fixtures as FX
from gpd_lite_toolbox_spark.geometry import kernels as K


def test_convex_offset_rect_is_bbox_expansion():
    rect = np.array([[0, 0], [4, 0], [4, 2], [0, 2]], float)
    off = K.convex_offset(rect, 1.0)
    assert abs(abs(K.ring_signed_area(off)) - 6.0 * 4.0) < 1e-9
    xs, ys = off[:, 0], off[:, 1]
    assert xs.min() == -1.0 and xs.max() == 5.0
    assert ys.min() == -1.0 and ys.max() == 3.0


def test_convex_pair_stats_triangles():
    # two overlapping right triangles -> intersection is a triangle
    t1 = np.array([[0, 0], [4, 0], [0, 4]], float)
    t2 = np.array([[1, 1], [5, 1], [1, 5]], float)
    isect, area, length = K.convex_pair_stats([t1], [t2], 0.0, 0.0)
    assert isect
    # t2 clipped by t1: triangle (1,1),(3,1),(1,3) -> area 2
    assert abs(area - 2.0) < 1e-9
    assert abs(length - (2 + 2 + math.hypot(2, 2))) < 1e-9


def test_convex_pair_stats_disjoint_and_touching():
    a = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
    b = np.array([[5, 5], [6, 5], [6, 6], [5, 6]], float)
    isect, area, _ = K.convex_pair_stats([a], [b], 0.0, 0.0)
    assert not isect and area == 0.0
    # shared-edge touch: zero area, edge-length contact
    c = np.array([[1, 0], [2, 0], [2, 1], [1, 1]], float)
    isect, area, length = K.convex_pair_stats([a], [c], 0.0, 0.0)
    assert isect and area == 0.0
    assert abs(length - 1.0) < 1e-9


def test_udf_path_equals_native_path_on_fixtures(spark, sf_dir):
    """The geometry-decoding kernel and the bbox-column expressions must
    produce identical pair sets and statistics on the rectangle layers."""
    from gpd_lite_toolbox_spark.operators.joins import get_borders

    polys = FX.polys(spark, sf_dir)
    native = get_borders(polys, cell_size=3125.0, tol=1.0).select(
        "left_id", "right_id", "length"
    )
    # drop the bbox columns so _pair_stats falls back to the WKB kernel
    geom_only = polys.select("id", "code", "geometry").join(
        polys.select("id", "x0", "y0", "x1", "y1"), "id"
    )
    # force the UDF path by renaming bbox cols after the join step:
    # bbox_join needs them, so instead strip them from the pair stats
    # input via a wrapper that re-derives bounds inside the kernel
    from pyspark.sql import functions as FF

    from gpd_lite_toolbox_spark.geometry.functions import st_pair_stats
    from gpd_lite_toolbox_spark.operators.spatial_join import bbox_join

    j = bbox_join(polys, polys, 3125.0, tol_left=1.0, tol_right=1.0)
    j = j.filter(FF.col("l_id") != FF.col("r_id"))
    udf_stats = j.withColumn(
        "_ps",
        st_pair_stats(
            FF.col("l_geometry"), FF.col("r_geometry"),
            FF.lit(1.0), FF.lit(1.0),
        ),
    ).filter(FF.col("_ps.isect")).select(
        FF.col("l_id").alias("left_id"),
        FF.col("r_id").alias("right_id"),
        FF.round(FF.col("_ps.length"), 6).alias("length"),
    )
    n = {(r.left_id, r.right_id): r.length for r in native.collect()}
    u = {(r.left_id, r.right_id): r.length for r in udf_stats.collect()}
    assert set(n) == set(u), (
        f"pair sets differ: {len(set(n) - set(u))} native-only, "
        f"{len(set(u) - set(n))} udf-only"
    )
    for k in n:
        assert abs(n[k] - u[k]) < 1e-6, f"{k}: {n[k]} vs {u[k]}"
