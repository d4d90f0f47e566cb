"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). Implemented operators live in ``gpd_lite_toolbox_spark/``;
oracle SQL lives in ``gpd_lite_toolbox_spark/oracles.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gpd_lite_toolbox_spark import fixtures as FX  # noqa: E402
from gpd_lite_toolbox_spark import oracles as OR  # noqa: E402


def _configure(spark: SparkSession) -> SparkSession:
    """Session knobs the engine needs regardless of who built the session."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static conf on some builds; events table is then unused
    return spark


# --------------------------------------------------------------- queries
def _q_make_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gpd_lite_toolbox_spark.operators.grid import compute_bounds, make_grid

    pts = FX.points(_configure(spark), sf_dir, with_geometry=False)
    bounds = compute_bounds(pts)
    return make_grid(spark, bounds, OR.GRID_H)


def _q_gridify_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gpd_lite_toolbox_spark.operators.grid import gridify_data

    pts = FX.points(_configure(spark), sf_dir, with_geometry=False)
    return gridify_data(
        pts, OR.GRID_H, "t_obs", methods=("min", "mean", "max", "sum", "std")
    )


def _q_mean_coords_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gpd_lite_toolbox_spark.operators.points import mean_coordinates

    pts = FX.points(_configure(spark), sf_dir, with_geometry=False)
    return mean_coordinates(pts, weight_field="weight")


def _q_mean_coords_by_cat(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gpd_lite_toolbox_spark.operators.points import mean_coordinates

    pts = FX.points(_configure(spark), sf_dir, with_geometry=False)
    return mean_coordinates(pts, id_field="cat", weight_field="weight")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7 phase 0): gridify_data — spatial
    binning + multi-stat aggregation over the derived points layer."""
    return _q_gridify_stats(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "make_grid": _q_make_grid,
        "gridify_stats": _q_gridify_stats,
        "mean_coords_global": _q_mean_coords_global,
        "mean_coords_by_cat": _q_mean_coords_by_cat,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "make_grid": OR.MAKE_GRID,
        "gridify_stats": OR.GRIDIFY_STATS,
        "mean_coords_global": OR.MEAN_COORDS_GLOBAL,
        "mean_coords_by_cat": OR.MEAN_COORDS_BY_CAT,
    }
