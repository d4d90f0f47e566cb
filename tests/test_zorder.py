"""Z-order layout: key correctness and the measurable payoff — files
written in Morton order carry much tighter per-file x/y extents, which
is what parquet min/max pruning feeds on."""

import glob

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from gpd_lite_toolbox_spark import fixtures as FX
from gpd_lite_toolbox_spark.operators.zorder import (
    write_zordered,
    zorder_key_expr,
)

BOUNDS = dict(xmin=0.0, ymin=0.0, xmax=100000.0, ymax=100000.0)


def test_zorder_key_interleaves_bits(spark):
    # hand-checked 2-bit case on unit bounds: xq carries odd bits
    b = dict(xmin=0.0, ymin=0.0, xmax=4.0, ymax=4.0)
    df = spark.createDataFrame(
        [(0.5, 0.5), (3.5, 0.5), (0.5, 3.5), (3.5, 3.5)], "x double, y double"
    )
    keys = [
        r.k
        for r in df.select(
            zorder_key_expr(F.col("x"), F.col("y"), b, bits=2).alias("k")
        ).collect()
    ]
    # quantized coords 0/3 -> morton(0,0)=0, (3,0)=0b1010=10,
    # (0,3)=0b0101=5, (3,3)=0b1111=15
    assert keys == [0, 10, 5, 15]


def test_zorder_is_locality_preserving_quadrants(spark):
    # all keys of the SW quadrant sort before any key of the NE
    # quadrant (curve recursion property)
    df = spark.createDataFrame(
        [(float(x), float(y)) for x in range(0, 50000, 7919)
         for y in range(0, 50000, 7919)]
        + [(float(x), float(y)) for x in range(50000, 100000, 7919)
           for y in range(50000, 100000, 7919)],
        "x double, y double",
    )
    rows = df.select(
        "x", "y", zorder_key_expr(F.col("x"), F.col("y"), BOUNDS).alias("k")
    ).collect()
    sw = [r.k for r in rows if r.x < 50000 and r.y < 50000]
    ne = [r.k for r in rows if r.x >= 50000 and r.y >= 50000]
    assert max(sw) < min(ne)


def _mean_file_extent_area(path: str) -> float:
    areas = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.read_metadata(f)
        xmin = ymin = float("inf")
        xmax = ymax = float("-inf")
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            sx = md.row_group(rg).column(cols["x"]).statistics
            sy = md.row_group(rg).column(cols["y"]).statistics
            xmin, xmax = min(xmin, sx.min), max(xmax, sx.max)
            ymin, ymax = min(ymin, sy.min), max(ymax, sy.max)
        areas.append((xmax - xmin) * (ymax - ymin))
    assert areas
    return sum(areas) / len(areas)


def test_zordered_files_have_tight_extents(spark, sf_dir, tmp_path):
    """The payoff assertion: per-file bbox area under Z-order layout is
    a small fraction of the random (hash-partitioned) layout's — the
    direct proxy for how many files a bbox scan can skip via parquet
    stats."""
    pts = FX.points(spark, sf_dir, with_geometry=False).select("id", "x", "y")
    zpath = str(tmp_path / "zordered")
    rpath = str(tmp_path / "random")
    write_zordered(pts, zpath, BOUNDS, n_files=8)
    pts.repartition(8).write.mode("overwrite").parquet(rpath)
    z_area = _mean_file_extent_area(zpath)
    r_area = _mean_file_extent_area(rpath)
    # random layout: every file spans ~the whole extent; z-order: a
    # curve segment. 4x is a conservative floor (measured ~8-30x).
    assert z_area * 4 < r_area, (z_area, r_area)


def test_hilbert_files_at_least_as_tight_as_morton(spark, sf_dir, tmp_path):
    """curve='hilbert' must not lose to Morton on the pruning proxy:
    mean per-file bbox area <= Morton's (Hilbert has no diagonal
    jumps, so curve segments stay spatially compact)."""
    pts = FX.points(spark, sf_dir, with_geometry=False).select("id", "x", "y")
    hpath = str(tmp_path / "hilbert")
    zpath = str(tmp_path / "morton")
    write_zordered(pts, hpath, BOUNDS, n_files=8, curve="hilbert")
    write_zordered(pts, zpath, BOUNDS, n_files=8, curve="morton")
    h_area = _mean_file_extent_area(hpath)
    z_area = _mean_file_extent_area(zpath)
    assert h_area <= z_area * 1.05, (h_area, z_area)
    # same rows either way
    assert (
        spark.read.parquet(hpath).count()
        == spark.read.parquet(zpath).count()
    )


def test_write_zordered_rejects_unknown_curve(spark, sf_dir, tmp_path):
    import pytest

    pts = FX.points(spark, sf_dir, with_geometry=False).select("id", "x", "y")
    with pytest.raises(ValueError):
        write_zordered(pts, str(tmp_path / "x"), BOUNDS, curve="peano")
