"""Grid tessellation + spatial binning (the reference's flagship ops).

Re-expresses ``make_grid`` (reference ``core.py:565-634``) and
``gridify_data`` (``core.py:637-687``) Spark-first:

- cell generation is ``spark.range`` + pure column arithmetic (no UDF,
  no driver loop — the reference's nested Python loop at
  ``core.py:600-612`` becomes a lazily generated range);
- point->cell assignment is native ``floor()`` arithmetic (the
  reference's R-tree probe per cell, ``core.py:680-683``, becomes a
  shuffle-free projection);
- aggregation is one ``groupBy(cell).agg`` — partial aggregation,
  whole-stage codegen, AQE all apply. At 100 TB this is a single
  map-side-combinable shuffle keyed by cell id, which is as good as the
  problem allows.

Deliberate fixes vs the reference, kept stable for tests:
- cells are HALF-OPEN ([x0,x1) horizontally, (y0,y1] vertically, with
  the outermost edge clamped in): the reference's bbox-intersection probe
  double-counts points that sit exactly on a shared cell edge;
- empty cells still get the ``-1`` sentinel (``core.py:679``);
- cell ids are column-major from the top-left (``core.py:600-612``).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geometry.functions import st_rect


def compute_bounds(df: DataFrame, x_col: str = "x", y_col: str = "y") -> dict:
    """Global bbox reduce (the ``gdf.bounds`` min/max at core.py:590-591).

    One tiny all-to-one agg; the 4 scalars then ride into the plan as
    literals so everything downstream stays native.
    """
    row = df.agg(
        F.min(x_col).alias("xmin"),
        F.min(y_col).alias("ymin"),
        F.max(x_col).alias("xmax"),
        F.max(y_col).alias("ymax"),
    ).collect()[0]
    if row.xmin is None:
        # reachable e.g. via an all-sentinel OSRM matrix whose filter
        # leaves zero rows — fail with the cause, not float(None)
        raise ValueError(
            "compute_bounds: input has no rows — cannot derive a grid "
            "extent from an empty layer"
        )
    return dict(
        xmin=float(row.xmin),
        ymin=float(row.ymin),
        xmax=float(row.xmax),
        ymax=float(row.ymax),
    )


def grid_dims(bounds: dict, height: float) -> tuple[int, int]:
    rows = int(math.ceil((bounds["ymax"] - bounds["ymin"]) / height))
    cols = int(math.ceil((bounds["xmax"] - bounds["xmin"]) / height))
    return max(rows, 1), max(cols, 1)


def make_grid(
    spark: SparkSession,
    bounds: dict,
    height: float,
    with_geometry: bool = False,
) -> DataFrame:
    """Bounding-box grid (cut=False path of core.py:565-634): cell_id is
    column-major from the top-left; corners are closed-form column math.
    """
    rows, cols = grid_dims(bounds, height)
    h = float(height)
    grid = (
        spark.range(rows * cols)
        .withColumnRenamed("id", "cell_id")
        .withColumn("col", (F.col("cell_id") / rows).cast("bigint"))
        .withColumn("row", F.col("cell_id") % rows)
        .withColumn("x0", F.lit(bounds["xmin"]) + F.col("col") * h)
        .withColumn("y1", F.lit(bounds["ymax"]) - F.col("row") * h)
        .withColumn("x1", F.col("x0") + h)
        .withColumn("y0", F.col("y1") - h)
        # column order matches the oracle projection: a positional
        # value-hash must agree, not only a name-sorted one
        .select("cell_id", "row", "col", "x0", "y0", "x1", "y1")
    )
    if with_geometry:
        grid = grid.withColumn("geometry", st_rect("x0", "y0", "x1", "y1"))
    return grid


def assign_cells(
    df: DataFrame,
    bounds: dict,
    height: float,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Add column-major ``cell_id`` to a point table — pure projection,
    no shuffle, replaces the reference's per-cell R-tree probe."""
    rows, cols = grid_dims(bounds, height)
    h = float(height)
    # clamp BOTH edges: with caller-supplied bounds tighter than the
    # data, unclamped negative indices would silently drop points on
    # the left/bottom while the right/top clamp kept them — symmetric
    # edge-cell assignment instead
    c = F.greatest(
        F.least(
            F.floor((F.col(x_col) - F.lit(bounds["xmin"])) / h),
            F.lit(cols - 1),
        ),
        F.lit(0),
    )
    r = F.greatest(
        F.least(
            F.floor((F.lit(bounds["ymax"]) - F.col(y_col)) / h),
            F.lit(rows - 1),
        ),
        F.lit(0),
    )
    return df.withColumn("cell_id", (c * rows + r).cast("bigint"))


def make_grid_cut(
    grid: DataFrame,
    polys: DataFrame,
    cell_size: float,
    rect_exact: bool = False,
) -> DataFrame:
    """The cut=True path of make_grid over a polygon layer
    (core.py:613-624): clip every cell by the union of the input
    polygons and keep non-empty results. For an interior-disjoint mosaic
    the union decomposes, so the clip is a bbox-partitioned pair join +
    per-cell area sum — no geometry union materialized, which is the
    only shape that survives a 100 TB polygon layer.

    Output: cells that intersect the layer, with ``clip_area``.
    """
    from .joins import _pair_stats
    from .spatial_join import bbox_join

    g = grid.select("cell_id", "x0", "y0", "x1", "y1", "geometry")
    j = bbox_join(
        g, polys.select("id", "x0", "y0", "x1", "y1", "geometry"), cell_size
    )
    j = _pair_stats(j, 0.0, 0.0, rect_exact).filter(F.col("_ps.area") > 0)
    return j.groupBy(
        F.col("l_cell_id").alias("cell_id"),
        F.col("l_x0").alias("x0"),
        F.col("l_y0").alias("y0"),
        F.col("l_x1").alias("x1"),
        F.col("l_y1").alias("y1"),
    ).agg(F.round(F.sum("_ps.area"), 6).alias("clip_area"))


def _distributed_hull(points: DataFrame) -> np.ndarray:
    """Hull-of-hulls reduce shared by ``make_grid_cut_hull`` and
    ``convex_hull_stats``: each partition shrinks to its local hull
    vertices (mapInPandas), the driver hulls the tiny candidate
    union — exact, and the full point table is never collected.
    Returns the CCW open ring as an (N, 2) array; (0, 2) when the
    input is empty."""
    from ..geometry import kernels as K

    def local_hull(batches):
        for pdf in batches:
            h = K.convex_hull(pdf[["x", "y"]].to_numpy(dtype=float))
            yield pd.DataFrame({"x": h[:, 0], "y": h[:, 1]})

    cand = (
        points.select("x", "y")
        .mapInPandas(local_hull, schema="x double, y double")
        .collect()
    )
    if not cand:
        return np.empty((0, 2), dtype=float)
    return K.convex_hull(np.array([(r.x, r.y) for r in cand], dtype=float))


def _seq_ring_area(v: np.ndarray) -> float:
    """Shoelace signed area of an open ring by an EXPLICIT sequential
    left-to-right fold, relative to the first vertex (the same
    conditioning shift as ``ring_signed_area``).

    ``ring_signed_area`` delegates its sums to ``np.dot`` (BLAS), whose
    accumulation order is an implementation detail (SIMD multi-
    accumulator) no other engine can replay. The cut-by-hull path is
    hash-gated against a DuckDB replay of the identical Sutherland-
    Hodgman fold, so its area must come from an op sequence a
    ``list_reduce`` can mirror term for term: per-vertex cross terms
    (x_j*y_{j+1} - y_j*x_{j+1}) accumulated strictly left to right."""
    n = len(v)
    if n < 3:
        return 0.0
    ox, oy = v[0, 0], v[0, 1]
    s = 0.0
    for j in range(n):
        k = (j + 1) % n
        s += (v[j, 0] - ox) * (v[k, 1] - oy) - (v[j, 1] - oy) * (
            v[k, 0] - ox
        )
    return 0.5 * s


def make_grid_cut_hull(points: DataFrame, height: float) -> DataFrame:
    """cut=True over a non-polygon layer (core.py:620-624): clip cells by
    the CONVEX HULL of the points (``_distributed_hull``). The per-cell
    clip is then a pandas-UDF pass with the tiny hull in the closure.

    Output: grid cells overlapping the hull, with ``clip_area`` and
    ``clip_frac`` (= raw area / height², the covered fraction of the
    cell — the natural sampling weight, and the hash-gateable form:
    rounding a ~1e7-magnitude area to 6 decimals sits beyond DuckDB's
    double-round accuracy at that scale, while the ≤1 fraction rounds
    exactly in every engine); an empty points layer yields an empty
    grid. Every double op (hull ring order, clip intersections, the
    sequential shoelace) is replayed bit-for-bit by the driver oracle
    (oracles.GRID_CUT_HULL).
    """
    from ..geometry import kernels as K

    spark = points.sparkSession
    hull = _distributed_hull(points)
    if len(hull) == 0:
        return spark.createDataFrame(
            [],
            "cell_id bigint, row bigint, col bigint, x0 double, y0 double,"
            " x1 double, y1 double, clip_area double, clip_frac double",
        )
    # the hull vertices include every coordinate extreme, so the grid
    # bounds fall out of the (driver-sized) hull for free — no second
    # scan of the point table for a bounds aggregate
    bounds = dict(
        xmin=float(hull[:, 0].min()),
        ymin=float(hull[:, 1].min()),
        xmax=float(hull[:, 0].max()),
        ymax=float(hull[:, 1].max()),
    )
    # the grid is bounded by (extent/height)^2 — default parallelism
    # (32 here) spreads a few hundred rows over 32 Python tasks whose
    # per-task overhead dwarfs the clip work; a handful of partitions
    # is the right grain for the UDF stage
    grid = make_grid(spark, bounds, height).coalesce(4)

    @F.pandas_udf("double")
    def clip_area(
        x0: pd.Series, y0: pd.Series, x1: pd.Series, y1: pd.Series
    ) -> pd.Series:
        out = np.zeros(len(x0))
        for i in range(len(x0)):
            cell = np.array(
                [
                    [x0.iloc[i], y0.iloc[i]],
                    [x1.iloc[i], y0.iloc[i]],
                    [x1.iloc[i], y1.iloc[i]],
                    [x0.iloc[i], y1.iloc[i]],
                ]
            )
            clipped = K.clip_poly_convex(cell, hull)
            if len(clipped) >= 3:
                out[i] = abs(_seq_ring_area(clipped))
        return pd.Series(out)

    raw = grid.withColumn("_raw", clip_area("x0", "y0", "x1", "y1"))
    return (
        raw.withColumn("clip_area", F.round(F.col("_raw"), 6))
        .withColumn(
            "clip_frac",
            F.round(F.col("_raw") / F.lit(float(height) * float(height)), 6),
        )
        .drop("_raw")
        .filter(F.col("clip_area") > 0)
    )


def convex_hull_stats(points: DataFrame) -> DataFrame:
    """Evidence row for the distributed convex hull: (n_vertices,
    hull_area, hull_perimeter) of the ``_distributed_hull`` reduce
    that backs ``make_grid_cut_hull``. The DuckDB oracle recomputes
    the hull with an INDEPENDENT algorithm (gift-wrapping as a
    recursive CTE vs the monotone chain here); integer fixture
    coordinates keep every cross-product sign exact in both engines,
    so the strict-vertex count matches exactly. An empty input yields
    the (0, 0.0, 0.0) row.
    """
    from ..geometry import kernels as K

    spark = points.sparkSession
    hull = _distributed_hull(points)
    if len(hull) == 0:
        area, perim = 0.0, 0.0
    else:
        area = abs(K.ring_signed_area(hull))
        perim = K.line_length(np.vstack([hull, hull[:1]]))
    return spark.createDataFrame(
        [(len(hull), round(float(area), 6), round(float(perim), 6))],
        "n_vertices bigint, hull_area double, hull_perimeter double",
    )


# Aggregates written in exact-arithmetic form: for integer-typed value
# columns every SUM stays an exact integer regardless of partial-agg
# merge order, so results are reproducible bit-for-bit across engines
# and partitionings. "mean" = sum/count (not AVG: engine accumulators
# differ); "std" = population std via the sum-of-squares identity (same
# reason; fine for the value ranges this engine bins).
def _agg_exprs(c: str, m: str):
    col = F.col(c)
    if m == "min":
        return F.min(col).cast("double")
    if m == "max":
        return F.max(col).cast("double")
    if m == "sum":
        return F.sum(col).cast("double")
    if m == "mean":
        return F.sum(col).cast("double") / F.count(col)
    if m == "std":
        n = F.count(col).cast("double")
        ex2 = F.sum(col * col).cast("double") / n
        ex = F.sum(col).cast("double") / n
        return F.sqrt(ex2 - ex * ex)
    raise ValueError(m)


def gridify_data(
    points: DataFrame,
    height: float,
    value_col: str,
    methods: tuple[str, ...] = ("mean",),
    x_col: str = "x",
    y_col: str = "y",
    bounds: dict | None = None,
    with_geometry: bool = False,
) -> DataFrame:
    """Spatial binning + aggregation (core.py:637-687), fully native.

    Output: one row per grid cell (including empty cells, value ``-1`` as
    the reference's sentinel at core.py:679), columns
    ``cell_id,row,col,x0,y0,x1,y1`` + one ``{value_col}_{m}`` per method.
    """
    spark = points.sparkSession
    dtype = dict(points.dtypes).get(value_col)
    if dtype not in ("bigint", "double", "int", "float", "smallint", "tinyint"):
        raise ValueError("Target column has to be a numerical field")
    if bounds is None:
        bounds = compute_bounds(points, x_col, y_col)
    grid = make_grid(spark, bounds, height, with_geometry=with_geometry)
    binned = assign_cells(points, bounds, height, x_col, y_col)
    aggs = [
        _agg_exprs(value_col, m).alias(f"{value_col}_{m}") for m in methods
    ]
    cell_stats = binned.groupBy("cell_id").agg(*aggs)
    out = grid.join(cell_stats, "cell_id", "left")
    for m in methods:
        name = f"{value_col}_{m}"
        out = out.withColumn(name, F.coalesce(F.round(name, 6), F.lit(-1.0)))
    return out
