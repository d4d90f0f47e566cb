"""Lattice dissolve + isochrone band polygon tests: ring stitching
unit cases, geometry-vs-cell-arithmetic agreement, and the nested
cumulative-isochrone property (checked with the exact pair kernel)."""

import numpy as np
import pyspark.sql.functions as F

from gpd_lite_toolbox_spark import fixtures as FX
from gpd_lite_toolbox_spark.geometry import kernels as K
from gpd_lite_toolbox_spark.geometry import wkb as W


def _lattice_area(ring):
    return K.ring_signed_area(np.array(ring[:-1], float))


def test_dissolve_single_and_strip():
    rings = K.dissolve_lattice_cells([(0, 0)])
    assert len(rings) == 1 and abs(_lattice_area(rings[0])) == 1.0
    rings = K.dissolve_lattice_cells([(0, 0), (1, 0)])
    assert len(rings) == 1
    assert abs(_lattice_area(rings[0])) == 2.0
    assert len(rings[0]) == 5  # collinear mid-vertices compressed

def test_dissolve_donut_has_hole():
    cells = [(c, r) for c in range(3) for r in range(3) if (c, r) != (1, 1)]
    rings = K.dissolve_lattice_cells(cells)
    areas = sorted(_lattice_area(r) for r in rings)
    # lattice orientation: shell CW (negative), hole opposite
    assert len(rings) == 2
    assert areas[0] == -9.0 and areas[1] == 1.0


def test_dissolve_checkerboard_pinch_splits():
    rings = K.dissolve_lattice_cells([(0, 0), (1, 1)])
    assert len(rings) == 2
    for r in rings:
        assert abs(_lattice_area(r)) == 1.0
        assert len(set(r[:-1])) == len(r) - 1  # simple ring, no revisit


def test_dissolve_disjoint_components():
    rings = K.dissolve_lattice_cells([(0, 0), (5, 5), (6, 5)])
    assert len(rings) == 2
    assert sorted(abs(_lattice_area(r)) for r in rings) == [1.0, 2.0]


def test_isochrone_polygon_area_matches_cells(spark, sf_dir):
    from gpd_lite_toolbox_spark.operators.isochrone import isochrone_polygons

    m = FX.fixture_df(spark, sf_dir, "osrm_matrix")
    rows = isochrone_polygons(m, height=8000.0, interval_h=0.25).collect()
    assert rows
    for r in rows:
        geom = W.decode(bytes(r.geometry))
        assert abs(K.geom_area(geom) - r.n_cells * 8000.0 * 8000.0) < 1e-3


def test_cumulative_isochrones_nest(spark, sf_dir):
    """P_b ⊆ P_{b+1} for cumulative bands: intersection area equals the
    smaller polygon's area (checked with the exact pair kernel)."""
    from gpd_lite_toolbox_spark.operators.isochrone import isochrone_polygons

    m = FX.fixture_df(spark, sf_dir, "osrm_matrix")
    rows = isochrone_polygons(
        m, height=8000.0, interval_h=0.25, cumulative=True
    ).collect()
    by_band = {r.band: r for r in sorted(rows, key=lambda r: r.band)}
    bands = sorted(by_band)
    assert len(bands) >= 2
    for lo, hi in zip(bands, bands[1:]):
        a = W.decode(bytes(by_band[lo].geometry))
        b = W.decode(bytes(by_band[hi].geometry))
        area_a = K.geom_area(a)
        assert K.geom_area(b) >= area_a - 1e-6
        _, inter, _ = K.pair_stats_exact(a, b)
        assert abs(inter - area_a) < 1e-3, (lo, hi, inter, area_a)
