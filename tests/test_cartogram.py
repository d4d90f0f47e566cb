"""Property tests for the iterative operators (SURVEY.md §5.2): the
oracle can't express them; these pin the mathematical contracts."""

import math

import numpy as np
import pyspark.sql.functions as F

from gpd_lite_toolbox_spark import fixtures as FX
from gpd_lite_toolbox_spark.geometry.functions import st_area


def _size_error(areas, values):
    total_a, total_v = areas.sum(), values.sum()
    desired = values * (total_a / total_v)
    return float(np.maximum(areas, desired).sum() / np.minimum(areas, desired).sum())


def test_cartogram_reduces_area_value_error(spark, sf_dir):
    from gpd_lite_toolbox_spark.operators.cartogram import transform_cartogram

    polys = FX.polys(spark, sf_dir)
    before = polys.select(
        "id", "size_mb", st_area("geometry").alias("area")
    ).toPandas().sort_values("id")
    out = transform_cartogram(polys, "size_mb", iterations=2)
    after = out.select(
        "id", "size_mb", st_area("geometry").alias("area")
    ).toPandas().sort_values("id")
    e0 = _size_error(before.area.to_numpy(), before.size_mb.to_numpy())
    e1 = _size_error(after.area.to_numpy(), after.size_mb.to_numpy())
    assert e1 < e0, f"size error did not improve: {e0} -> {e1}"
    # vertex counts preserved (Dougenik displaces, never resamples)
    assert out.count() == polys.count()


def test_cartogram_rejects_nonpositive_values(spark, sf_dir):
    import pytest

    from gpd_lite_toolbox_spark.operators.cartogram import transform_cartogram

    polys = FX.polys(spark, sf_dir).withColumn(
        "size_mb", F.col("size_mb") - F.col("size_mb")
    )
    with pytest.raises(Exception, match="> 0|numeric"):
        transform_cartogram(polys, "size_mb", iterations=1).count()


def test_dorling_circles_no_residual_overlap(spark, sf_dir):
    import __spark_entry__ as E

    out = E.queries()["dorling_cartogram"](spark, sf_dir).toPandas()
    xs, ys, rs = out.cx.to_numpy(), out.cy.to_numpy(), out.radius.to_numpy()
    n = len(out)
    worst = 0.0
    for i in range(n):
        d = np.hypot(xs - xs[i], ys - ys[i])
        d[i] = np.inf
        worst = max(worst, float((rs + rs[i] - d).max()))
    # relaxation with 2 passes: overlaps must at least be small relative
    # to the mean radius (full convergence needs more iterations)
    assert worst <= rs.mean() * 1.5, f"residual overlap {worst}"


def test_grid_cut_hull_properties(spark, sf_dir):
    import __spark_entry__ as E

    out = E.queries()["grid_cut_hull"](spark, sf_dir).toPandas()
    assert len(out) > 0
    # the gated column is the covered fraction of each cell (r7)
    assert (out.clip_frac <= 1.0 + 1e-9).all()
    # clip_area > 0 filters rows; a sliver below the frac lattice may
    # legitimately round to clip_frac == 0.0
    assert (out.clip_frac >= 0).all()
    # the hull covers a decent share of the frame for uniform points
    assert out.clip_frac.mean() > 0.25


def test_streaming_grid_agg_matches_batch(spark, sf_dir):
    from gpd_lite_toolbox_spark.streaming.grid_stream import (
        run_streaming_grid_agg,
        windowed_grid_agg,
    )

    FX.register_base_tables(spark, sf_dir)
    batch = windowed_grid_agg(spark.table("events")).toPandas()
    stream = run_streaming_grid_agg(
        spark, f"{sf_dir}/events.parquet"
    ).toPandas()
    b = batch.sort_values(["window_start_us", "cell_id"], ignore_index=True)
    s = stream.sort_values(["window_start_us", "cell_id"], ignore_index=True)
    assert len(b) == len(s)
    assert (b.n_events.to_numpy() == s.n_events.to_numpy()).all()
    assert np.allclose(b.sum_value.to_numpy(), s.sum_value.to_numpy())


def test_hull_kernel_known_square():
    from gpd_lite_toolbox_spark.geometry.kernels import (
        clip_poly_convex,
        convex_hull,
        ring_signed_area,
    )

    pts = np.array(
        [[0, 0], [10, 0], [10, 10], [0, 10], [5, 5], [2, 3], [7, 1]], float
    )
    hull = convex_hull(pts)
    assert len(hull) == 4
    assert abs(ring_signed_area(hull)) == 100.0
    # clip a cell half-inside
    cell = np.array([[5, -5], [15, -5], [15, 5], [5, 5]], float)
    clipped = clip_poly_convex(cell, hull)
    assert abs(abs(ring_signed_area(clipped)) - 25.0) < 1e-9
