"""Point-table operators: weighted mean coordinates, random points, snap.

- ``mean_coordinates`` re-expresses reference ``core.py:466-514``: the
  x*w / y*w column products + groupBy sums become one native aggregate —
  map-side partial aggregation makes this a single small shuffle at any
  scale.
- ``random_pts_on_surface`` (``core.py:517-562``) is a table-generating
  op: explode a per-row count then compute deterministic in-rectangle
  positions. Determinism under Spark re-execution comes from hashing
  (feature id, point index) — never ``rand()`` (SURVEY.md §7 hard parts).
- ``snap_to_nearest`` (``core.py:320-386``) is a bounded-radius NN join:
  grid-bucket both sides on a cell of the search radius, equi-join on
  neighboring cells, window-argmin. The reference's growing-and-never-
  reset R-tree search frame (quirk at core.py:371) is replaced by a fixed
  ``max_searchframe`` radius applied per point independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..geometry.functions import euclid_expr, st_point


def mean_coordinates(
    df: DataFrame,
    id_field: str | None = None,
    weight_field: str | None = None,
    x_col: str = "x",
    y_col: str = "y",
    with_geometry: bool = False,
) -> DataFrame:
    """Weighted mean center per group (or global when id_field is None).

    Output columns: [id_field,] x, y, weight — weight is the group's
    summed weight (count when no weight_field, matching core.py:497-504).
    """
    w = F.col(weight_field) if weight_field else F.lit(1.0)
    aggs = [
        (F.sum(F.col(x_col) * w) / F.sum(w)).alias(x_col),
        (F.sum(F.col(y_col) * w) / F.sum(w)).alias(y_col),
        F.sum(w).cast("double").alias("weight"),
    ]
    if id_field:
        out = df.groupBy(id_field).agg(*aggs)
    else:
        out = df.agg(*aggs)
    # round: double-summation order differs across engines/partitionings
    out = (
        out.withColumn(x_col, F.round(x_col, 6))
        .withColumn(y_col, F.round(y_col, 6))
        .withColumn("weight", F.round("weight", 6))
    )
    if with_geometry:
        out = out.withColumn("geometry", st_point(x_col, y_col))
    return out


def random_pts_on_surface(
    rects: DataFrame,
    coef: int = 1,
    nb_field: str | None = None,
    id_col: str = "id",
) -> DataFrame:
    """N deterministic pseudo-uniform points inside each rectangle.

    The reference rejection-samples with numpy RNG inside each polygon's
    bbox (core.py:546-561). For distributed determinism we derive each
    point from integer hashes of (id, k): positions are reproducible
    across retries, partitionings and engines (the DuckDB oracle runs the
    same arithmetic). For rectangle surfaces rejection sampling accepts
    every draw, so hashed-uniform placement matches the reference's
    distribution semantics exactly; general polygons get the same frame
    semantics via an in-polygon filter (property-tested instead).

    Expects bbox columns x0, y0, x1, y1 (the engine's rectangle layer).
    """
    n = (
        F.round(F.col(nb_field) * F.lit(float(coef))).cast("bigint")
        if nb_field
        else F.lit(int(coef)).cast("bigint")
    )
    df = rects.withColumn("n_pts", n).filter(F.col("n_pts") > 0)
    df = df.withColumn("k", F.explode(F.sequence(F.lit(0), F.col("n_pts") - 1)))
    # 32-bit multiplicative hashes of (id, k) -> fraction in [0, 1).
    # id/k are pmod-reduced FIRST — value-identical for non-negative
    # inputs by (a*u) mod m == (a*(u mod m)) mod m, but the product
    # then stays under 2^52 so a large (or negative) id can neither
    # wrap int64 nor emit a negative fraction that would place points
    # OUTSIDE the feature's rectangle.
    uid = F.pmod(F.col(id_col), F.lit(1000003))
    kk = F.pmod(F.col("k"), F.lit(1000003))
    fx = ((uid * 2654435761 + kk * 97561) % 1000003) / 1000003.0
    fy = ((uid * 2246822519 + kk * 40503) % 1000003) / 1000003.0
    return (
        df.withColumn("px", F.round(F.col("x0") + fx * (F.col("x1") - F.col("x0")), 6))
        .withColumn("py", F.round(F.col("y0") + fy * (F.col("y1") - F.col("y0")), 6))
        .drop("n_pts")
    )


def random_pts_in_polygons(
    polys: DataFrame,
    coef: int = 1,
    nb_field: str | None = None,
    id_col: str = "id",
    geom_col: str = "geometry",
    mult: int = 8,
    pad: int = 32,
) -> DataFrame:
    """N deterministic pseudo-uniform points inside each ARBITRARY
    polygon — the general-geometry form of random_pts_on_surface
    (reference rejection-samples the bbox until n hits, core.py:546-561).

    Distributed rejection with bounded tries: ``mult*n + pad`` hashed
    candidate draws per feature land in the bbox, the in-polygon
    ray-cast (st_contains_xy over the WKB geometry) accepts, and the
    first n accepted (ordered by draw index — deterministic under
    re-execution and repartitioning) are kept. The try budget makes a
    shortfall astronomically unlikely for bbox fill fractions >= ~0.3
    (P(Bin(8n+32, frac) < n) — e.g. < 1e-12 at frac 0.5, n 1); a
    degenerate sliver polygon can emit fewer than n, mirroring a
    max-tries rejection loop.

    Expects bbox columns x0..y1 alongside the geometry (the engine's
    layer convention). Output: input columns + (k, px, py).
    """
    n = (
        F.round(F.col(nb_field) * F.lit(float(coef))).cast("bigint")
        if nb_field
        else F.lit(int(coef)).cast("bigint")
    )
    from ..geometry.functions import st_contains_xy

    df = polys.withColumn("n_pts", n).filter(F.col("n_pts") > 0)
    m = F.col("n_pts") * int(mult) + int(pad)
    df = df.withColumn("k", F.explode(F.sequence(F.lit(0), m - 1)))
    # same pmod-first overflow guard as random_pts_on_surface
    uid = F.pmod(F.col(id_col), F.lit(1000003))
    kk = F.pmod(F.col("k"), F.lit(1000003))
    fx = ((uid * 2654435761 + kk * 97561) % 1000003) / 1000003.0
    fy = ((uid * 2246822519 + kk * 40503) % 1000003) / 1000003.0
    df = (
        df.withColumn("px", F.round(F.col("x0") + fx * (F.col("x1") - F.col("x0")), 6))
        .withColumn("py", F.round(F.col("y0") + fy * (F.col("y1") - F.col("y0")), 6))
        .filter(st_contains_xy(F.col(geom_col), F.col("px"), F.col("py")))
    )
    w = Window.partitionBy(id_col).orderBy("k")
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("n_pts"))
        .drop("_rn", "n_pts")
    )


def snap_to_nearest(
    pts: DataFrame,
    target_verts: DataFrame,
    max_searchframe: float = 500.0,
    pt_id: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Snap each point to the nearest vertex of the target layer within
    ``max_searchframe`` (Euclidean), the intended semantics of reference
    ``core.py:320-386`` (nearest feature, then nearest vertex).

    Scale strategy: bucket both sides into cells of side
    ``max_searchframe``; a point's nearest in-range vertex lives in its
    3x3 cell neighborhood, so the join is an equi-join on cell id with a
    9x fan-out on the (smaller) vertex side — no cross join, AQE handles
    skewed cells. Ties broken by (dist, target id, vidx) for determinism.

    ``target_verts`` columns: id, vidx, vx, vy. Output: one row per input
    point that found a match: id, x, y, snapped_id, snapped_vidx,
    snap_x, snap_y, snap_dist.
    """
    cell = float(max_searchframe)
    p = pts.select(
        F.col(pt_id).alias("pid"),
        F.col(x_col).alias("px"),
        F.col(y_col).alias("py"),
        F.floor(F.col(x_col) / cell).alias("cx"),
        F.floor(F.col(y_col) / cell).alias("cy"),
    )
    # replicate each vertex into its 3x3 neighborhood: the vertex side is
    # the smaller/static layer; 9x duplication buys a pure equi-join
    v = (
        target_verts.select(
            F.col("id").alias("vid"), "vidx", "vx", "vy",
            F.floor(F.col("vx") / cell).alias("vcx"),
            F.floor(F.col("vy") / cell).alias("vcy"),
        )
        .withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("cx", F.col("vcx") + F.col("dx"))
        .withColumn("cy", F.col("vcy") + F.col("dy"))
        .drop("vcx", "vcy", "dx", "dy")
    )
    joined = p.join(v, ["cx", "cy"]).withColumn(
        "snap_dist", euclid_expr(F.col("px"), F.col("py"), F.col("vx"), F.col("vy"))
    )
    joined = joined.filter(F.col("snap_dist") <= cell)
    w = Window.partitionBy("pid").orderBy("snap_dist", "vid", "vidx")
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("pid").alias("id"),
            F.col("px").alias("x"),
            F.col("py").alias("y"),
            F.col("vid").alias("snapped_id"),
            F.col("vidx").alias("snapped_vidx"),
            F.col("vx").alias("snap_x"),
            F.col("vy").alias("snap_y"),
            F.round("snap_dist", 6).alias("snap_dist"),
        )
    )


def knn_to_vertices(
    pts: DataFrame,
    target_verts: DataFrame,
    k: int = 3,
    max_searchframe: float = 500.0,
    pt_id: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """k-nearest-neighbor join: the k nearest target vertices within
    ``max_searchframe`` of each point, ranked — the k>1 generalization
    of ``snap_to_nearest`` (reference core.py:320-386 is the k=1
    case). Same scale shape: 3x3-cell-neighborhood equi-join, partial
    top-k (WindowGroupLimit) before the rank filter; the 9x
    replication rides the vertex side. Ties break (dist, id, vidx).

    Output: id, x, y, nn_rank (1-based), snapped_id, snapped_vidx,
    snap_x, snap_y, snap_dist.
    """
    cell = float(max_searchframe)
    p = pts.select(
        F.col(pt_id).alias("pid"),
        F.col(x_col).alias("px"),
        F.col(y_col).alias("py"),
        F.floor(F.col(x_col) / cell).alias("cx"),
        F.floor(F.col(y_col) / cell).alias("cy"),
    )
    v = (
        target_verts.select(
            F.col("id").alias("vid"), "vidx", "vx", "vy",
            F.floor(F.col("vx") / cell).alias("vcx"),
            F.floor(F.col("vy") / cell).alias("vcy"),
        )
        .withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("cx", F.col("vcx") + F.col("dx"))
        .withColumn("cy", F.col("vcy") + F.col("dy"))
        .drop("vcx", "vcy", "dx", "dy")
    )
    joined = p.join(v, ["cx", "cy"]).withColumn(
        "snap_dist",
        euclid_expr(F.col("px"), F.col("py"), F.col("vx"), F.col("vy")),
    ).filter(F.col("snap_dist") <= cell)
    w = Window.partitionBy("pid").orderBy("snap_dist", "vid", "vidx")
    return (
        joined.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
        .select(
            F.col("pid").alias("id"),
            F.col("px").alias("x"),
            F.col("py").alias("y"),
            "nn_rank",
            F.col("vid").alias("snapped_id"),
            F.col("vidx").alias("snapped_vidx"),
            F.col("vx").alias("snap_x"),
            F.col("vy").alias("snap_y"),
            F.round("snap_dist", 6).alias("snap_dist"),
        )
    )
