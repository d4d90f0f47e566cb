"""Isochrone pipeline (reference core.py:873-924 access_isocrone +
#18/#19 contouring), against the mocked OSRM travel-time matrix
(FIXTURES.md T5 — the live HTTP service is out of scope for tests;
the filter/convert/aggregate semantics are the reference's).

The reference pipeline: grid around origin -> OSRM times -> drop
sentinel rows (2147483647 unreachable / 0 self, core.py:916) ->
seconds -> hours -> scipy/matplotlib contouring. Without scipy in the
engine's dependency set, contouring is re-expressed relationally:
time values bin into ISO-bands (floor(t/interval)), bands aggregate
per grid cell — a banded cell mosaic IS the isochrone surface in
relational form (each band's cells dissolve into the iso-polygon).
Everything is native column math + one groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .grid import assign_cells, compute_bounds

OSRM_UNREACHABLE = 2147483647


def filter_osrm_times(matrix: DataFrame, time_col: str = "time_s") -> DataFrame:
    """Drop the OSRM sentinels (core.py:916) and convert to hours."""
    return matrix.filter(
        (F.col(time_col) != OSRM_UNREACHABLE) & (F.col(time_col) != 0)
    ).withColumn("time_h", F.col(time_col) / 3600.0)


def isochrone_bands(
    matrix: DataFrame,
    height: float,
    interval_h: float = 0.25,
    time_col: str = "time_s",
) -> DataFrame:
    """Banded isochrone surface: per (band, cell) the point count and
    min/mean time; per band one row with cell count and covered area.

    Output: (band, t_min_h, n_cells, n_pts, area) where band =
    floor(time_h / interval_h).
    """
    pts = filter_osrm_times(matrix, time_col)
    bounds = compute_bounds(pts)
    binned = assign_cells(pts, bounds, height)
    binned = binned.withColumn(
        "band", F.floor(F.col("time_h") / F.lit(float(interval_h)))
    )
    per_cell = binned.groupBy("band", "cell_id").agg(
        F.count("*").alias("n_pts"), F.min("time_h").alias("t_min_h")
    )
    return (
        per_cell.groupBy("band")
        .agg(
            F.round(F.min("t_min_h"), 6).alias("t_min_h"),
            F.count("*").alias("n_cells"),
            F.sum("n_pts").alias("n_pts"),
            F.round(
                (F.count("*") * F.lit(float(height) * float(height))), 6
            ).alias("area"),
        )
    )
