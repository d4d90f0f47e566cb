"""End-to-end geospatial pipeline on the engine's public API —
the reference's README workflow (gridify / borders / snap) re-expressed
Spark-first, finishing with a Z-ordered layout write.

    python examples/geospatial_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import gpd_lite_toolbox_spark as G  # noqa: E402
from gpd_lite_toolbox_spark import fixtures as FX  # noqa: E402


def run(spark, sf_dir: str, out_dir: str):
    pts = FX.points(spark, sf_dir, with_geometry=False)
    polys = FX.polys(spark, sf_dir)

    # 1. spatial binning + multi-stat aggregation (reference gridify_data)
    grid = G.gridify_data(
        pts, 8000.0, "t_obs", methods=("mean", "sum", "std")
    )

    # 2. neighbor borders of the polygon mosaic (reference get_borders)
    borders = G.get_borders(
        polys, cell_size=3125.0, tol=1.0, col_name="code", rect_exact=True
    )

    # 3. snap points onto the road vertex layer (reference snap_to_nearest)
    snapped = G.snap_to_nearest(
        pts, FX.road_verts(spark, sf_dir), max_searchframe=500.0
    )

    # 4. persist the points Z-ordered so later bbox scans prune files
    bounds = dict(xmin=0.0, ymin=0.0, xmax=100000.0, ymax=100000.0)
    G.write_zordered(pts.select("id", "x", "y"), out_dir, bounds, n_files=4)

    return (
        grid.agg(F.count("*").alias("cells")),
        borders.agg(F.count("*").alias("border_pairs")),
        snapped.agg(
            F.count("*").alias("snapped"),
            F.round(F.avg("snap_dist"), 3).alias("avg_dist"),
        ),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="zordered_pts_")
    )
    spark = G.get_spark("geospatial-pipeline")
    for df in run(spark, sf_dir, out_dir):
        df.show(truncate=False)
    print(f"z-ordered layout written to {out_dir}")


if __name__ == "__main__":
    main()
