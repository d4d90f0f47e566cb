"""Unit tests for the pure-numpy WKB codec and geometry kernels."""

import numpy as np

from gpd_lite_toolbox_spark.geometry import kernels as K
from gpd_lite_toolbox_spark.geometry import wkb as W


def test_point_roundtrip():
    b = W.point_wkb(1.5, -2.25)
    t, p = W.decode(b)
    assert t == "Point" and p[0] == 1.5 and p[1] == -2.25


def test_points_wkb_batch_matches_scalar():
    xs = np.array([0.0, 1.0, 2.5])
    ys = np.array([9.0, -1.0, 3.25])
    batch = W.points_wkb(xs, ys)
    for i, b in enumerate(batch):
        assert b == W.point_wkb(xs[i], ys[i])


def test_rect_roundtrip_area_centroid_perimeter():
    b = W.rect_wkb(0.0, 0.0, 4.0, 2.0)
    g = W.decode(b)
    assert g[0] == "Polygon"
    assert K.geom_area(g) == 8.0
    assert K.geom_centroid(g) == (2.0, 1.0)
    assert K.geom_length(g) == 12.0
    assert K.geom_bounds(g) == (0.0, 0.0, 4.0, 2.0)


def test_polygon_with_hole():
    shell = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    hole = np.array([[2, 2], [4, 2], [4, 4], [2, 4], [2, 2]], float)
    b = W.polygon_wkb([shell, hole])
    g = W.decode(b)
    assert K.geom_area(g) == 100.0 - 4.0
    px = np.array([3.0, 1.0, 20.0])
    py = np.array([3.0, 1.0, 20.0])
    inside = K.points_in_geom(px, py, g)
    assert list(inside) == [False, True, False]  # 3,3 is in the hole


def test_multipolygon():
    r1 = [np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], float)]
    r2 = [np.array([[5, 5], [7, 5], [7, 6], [5, 6], [5, 5]], float)]
    b = W.multipolygon_wkb([r1, r2])
    t, parts = W.decode(b)
    assert t == "MultiPolygon" and len(parts) == 2
    assert K.geom_area((t, parts)) == 1.0 + 2.0
    # centroid is area-weighted
    cx, cy = K.geom_centroid((t, parts))
    assert abs(cx - (0.5 * 1 + 6.0 * 2) / 3) < 1e-12


def test_linestring_length_and_distances():
    a = np.array([[0, 0], [3, 4]], float)
    b_ = np.array([[0, 1], [3, 5]], float)
    assert K.line_length(a) == 5.0
    assert K.cheap_hausdorff(a, a) == 0.0
    assert K.cheap_hausdorff(a, b_) == 1.0
    assert K.max_pairwise_dist(a, a) == 5.0


def test_ring_orientation_irrelevant_for_area():
    ccw = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], float)
    cw = ccw[::-1]
    assert K.polygon_area([ccw]) == K.polygon_area([cw]) == 4.0


def test_rect_buffer_and_intersection():
    rings = [np.array([[0, 0], [4, 0], [4, 2], [0, 2], [0, 0]], float)]
    buf = K.rect_buffer(rings, 1.0)
    assert K.geom_bounds(("Polygon", buf)) == (-1.0, -1.0, 5.0, 3.0)
    assert K.rect_intersection((0, 0, 2, 2), (1, 1, 3, 3)) == (1, 1, 2, 2)
    assert K.rect_intersection((0, 0, 1, 1), (2, 2, 3, 3)) is None
    # touching rectangles intersect in a degenerate line
    assert K.rect_intersection((0, 0, 1, 1), (1, 0, 2, 1)) == (1, 0, 1, 1)
