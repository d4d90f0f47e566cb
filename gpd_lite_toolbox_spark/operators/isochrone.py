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


def interpolate_idw(
    pts: DataFrame,
    n: int = 40,
    radius: float = 8000.0,
    value_col: str = "time_h",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Inverse-distance-weighted interpolation onto an n x n lattice —
    the relational re-expression of the reference's contour
    interpolation step (core.py:818-821 uses scipy griddata onto a
    200x200 lattice; scipy is out of the engine's dependency set, and
    IDW-over-a-radius is the join-shaped estimator that scales: lattice
    cells x in-radius points via the cell-bucket join, one groupBy).

    Output: (li, lx, ly, est) for lattice nodes with >= 1 in-radius
    point; est = sum(v/(d^2+1)) / sum(1/(d^2+1)).
    """
    spark = pts.sparkSession
    b = compute_bounds(pts, x_col, y_col)
    step_x = (b["xmax"] - b["xmin"]) / n
    step_y = (b["ymax"] - b["ymin"]) / n
    lattice = (
        spark.range(n * n)
        .withColumnRenamed("id", "li")
        .withColumn("lx", F.lit(b["xmin"]) + ((F.col("li") % n) + 0.5) * step_x)
        .withColumn(
            "ly",
            F.lit(b["ymin"])
            + (F.floor(F.col("li") / n) + 0.5) * step_y,
        )
    )
    # cell-bucket join bounded by the radius (same pruning shape as
    # snap_to_nearest): lattice nodes only meet points within their
    # 3x3 neighborhood of radius-sized cells
    lat = lattice.withColumn("cx", F.floor(F.col("lx") / radius)).withColumn(
        "cy", F.floor(F.col("ly") / radius)
    )
    p = (
        pts.select(
            F.col(x_col).alias("px"),
            F.col(y_col).alias("py"),
            F.col(value_col).alias("v"),
            F.floor(F.col(x_col) / radius).alias("pcx"),
            F.floor(F.col(y_col) / radius).alias("pcy"),
        )
        .withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("cx", F.col("pcx") + F.col("dx"))
        .withColumn("cy", F.col("pcy") + F.col("dy"))
        .drop("pcx", "pcy", "dx", "dy")
    )
    j = lat.join(p, ["cx", "cy"])
    d2 = (F.col("lx") - F.col("px")) * (F.col("lx") - F.col("px")) + (
        F.col("ly") - F.col("py")
    ) * (F.col("ly") - F.col("py"))
    j = j.filter(d2 <= radius * radius)
    w = 1.0 / (d2 + 1.0)
    return (
        j.groupBy("li", "lx", "ly")
        .agg(F.round(F.sum(w * F.col("v")) / F.sum(w), 4).alias("est"))
    )


def filter_osrm_times(matrix: DataFrame, time_col: str = "time_s") -> DataFrame:
    """Drop the OSRM sentinels (core.py:916) and convert to hours."""
    return matrix.filter(
        (F.col(time_col) != OSRM_UNREACHABLE) & (F.col(time_col) != 0)
    ).withColumn("time_h", F.col(time_col) / 3600.0)


def access_isocrone(
    matrix: DataFrame,
    height: float = 8000.0,
    interval_h: float = 0.25,
    time_col: str = "time_s",
) -> tuple[DataFrame, DataFrame]:
    """The composed reference pipeline (core.py:873-924): travel-time
    matrix -> sentinel filter -> hours -> per-cell min-time surface +
    banded isochrone polygons (relational contour, see module
    docstring). Returns (cell_surface, bands): the reference's
    (grid, isochrone gdf) pair in relational form.
    """
    pts = filter_osrm_times(matrix, time_col)
    bounds = compute_bounds(pts)
    binned = assign_cells(pts, bounds, height)
    surface = binned.groupBy("cell_id").agg(
        F.round(F.min("time_h"), 6).alias("t_min_h"),
        F.count("*").alias("n_pts"),
    )
    bands = isochrone_bands(matrix, height, interval_h, time_col)
    return surface, bands


def isochrone_polygons(
    matrix: DataFrame,
    height: float,
    interval_h: float = 0.25,
    time_col: str = "time_s",
    cumulative: bool = False,
) -> DataFrame:
    """Isochrone band POLYGONS (#18/#19 user-facing geometry output,
    reference ``core.py:839-870`` isopoly_to_gdf builds band polygons
    from matplotlib contour collections): each band's grid cells
    dissolve into MultiPolygon WKB — shells and holes reconstructed
    exactly by the lattice boundary-cancellation stitcher
    (``kernels.dissolve_lattice_cells``).

    Output: (band, t_min_h, n_cells, n_pts, geometry). With
    ``cumulative=True`` band b covers every cell reached within
    (b+1)*interval_h — the classic nested-isochrone reading (polygons
    nest by construction; property-tested).

    Scale shape: the per-band group is bounded by GRID size (extent /
    height)^2, never by point count — points aggregate to cells before
    any Python boundary, and the stitcher is O(cells) per band.
    """
    import numpy as np
    import pandas as pd

    from ..geometry import kernels as K
    from ..geometry import wkb as W
    from .grid import grid_dims

    pts = filter_osrm_times(matrix, time_col)
    bounds = compute_bounds(pts)
    nrows, _ncols = grid_dims(bounds, height)
    binned = assign_cells(pts, bounds, height).withColumn(
        "band", F.floor(F.col("time_h") / F.lit(float(interval_h)))
    )
    per_cell = binned.groupBy("band", "cell_id").agg(
        F.count("*").alias("n_pts"), F.min("time_h").alias("t_min_h")
    )
    if cumulative:
        # cell joins every band >= its own: bounded fan-out (max band
        # count), keeps the per-band dissolve shape identical
        top = per_cell.agg(F.max("band")).collect()[0][0]
        if top is None:
            top = 0
        expand = per_cell.withColumn(
            "band",
            F.explode(F.sequence(F.col("band"), F.lit(int(top)))),
        )
        per_cell = expand.groupBy("band", "cell_id").agg(
            F.sum("n_pts").alias("n_pts"), F.min("t_min_h").alias("t_min_h")
        )
    h = float(height)
    xmin = float(bounds["xmin"])
    ymax = float(bounds["ymax"])
    nr = int(nrows)

    def stitch(pdf: pd.DataFrame) -> pd.DataFrame:
        band = int(pdf["band"].iloc[0])
        cols = (pdf["cell_id"] // nr).to_numpy()
        rows = (pdf["cell_id"] % nr).to_numpy()
        rings = K.dissolve_lattice_cells(zip(cols.tolist(), rows.tolist()))

        # shell/hole grouping in LATTICE space (kernels.lattice_parts:
        # smallest-containing-shell rule handles nested band
        # topologies); the y-flip world mapping turns lattice-CW
        # shells into world-CCW without reversal
        def to_world(ring):
            return np.array(
                [[xmin + c * h, ymax - r * h] for c, r in ring], dtype="<f8"
            )

        parts = [
            [to_world(shell)] + [to_world(hole) for hole in holes]
            for shell, holes in K.lattice_parts(rings)
        ]
        wkb = (
            W.multipolygon_wkb(parts)
            if len(parts) != 1
            else W.polygon_wkb(parts[0])
        )
        return pd.DataFrame(
            {
                "band": [band],
                "t_min_h": [float(pdf["t_min_h"].min())],
                "n_cells": [len(pdf)],
                "n_pts": [int(pdf["n_pts"].sum())],
                "geometry": [wkb],
            }
        )

    return per_cell.groupBy("band").applyInPandas(
        stitch,
        schema="band long, t_min_h double, n_cells long, n_pts long, "
        "geometry binary",
    )


def isochrone_bands(
    matrix: DataFrame,
    height: float,
    interval_h: float | None = 0.25,
    time_col: str = "time_s",
) -> DataFrame:
    """Banded isochrone surface: per (band, cell) the point count and
    min/mean time; per band one row with cell count and covered area.

    Output: (band, t_min_h, n_cells, n_pts, area) where band =
    floor(time_h / interval_h). ``interval_h=None`` reproduces the
    reference's auto-levels rule (core.py:823-824): 15 classes spanning
    the value range, interval = (max - min) / 15.
    """
    pts = filter_osrm_times(matrix, time_col)
    band_origin = 0.0
    if interval_h is None:
        # reference auto-levels: 15 classes spanning [min, max]
        # (core.py:823-824) — bands are RELATIVE to the min, indices
        # 0..14 (the max value clamps into the last class)
        row = pts.agg(
            F.min("time_h").alias("lo"), F.max("time_h").alias("hi")
        ).collect()[0]
        band_origin = float(row.lo)
        interval_h = max((float(row.hi) - band_origin) / 15.0, 1e-9)
    bounds = compute_bounds(pts)
    binned = assign_cells(pts, bounds, height)
    band = F.floor(
        (F.col("time_h") - F.lit(band_origin)) / F.lit(float(interval_h))
    )
    if band_origin != 0.0:
        band = F.least(band, F.lit(14))  # auto mode: clamp max into class 14
    binned = binned.withColumn("band", band)
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
