"""dissolve — GROUP BY + geometric union (reference core.py:257-282).

Spark's canonical grouped-map: ``groupBy(colname).applyInPandas`` where
each group's geometries are merged. Attribute semantics match the
reference's ``drop_duplicates(colname)``: the FIRST row's attributes
(by the original order; we use ascending ``id`` explicitly — never
Spark's nondeterministic row order) survive per group.

Union semantics: parts are merged into a MultiPolygon collection. For
interior-disjoint inputs (tessellations — the reference's dissolve
demo, README.md:131, dissolves a mosaic by country) this IS the union:
same area, same boundary. Boundary-merging of overlapping polygons is a
later-phase kernel; callers get total area / part count statistics that
are exact for mosaics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..geometry import wkb as W
from ..geometry.kernels import geom_area


def dissolve(
    gdf: DataFrame, colname: str, geometry: str = "geometry", id_col: str = "id"
) -> DataFrame:
    """Returns one row per group: first-row attributes + merged geometry
    + ``n_parts``/``area`` statistics."""
    attr_cols = [c for c in gdf.columns if c not in (geometry,)]
    schema_parts = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in gdf.schema.fields
        if f.name != geometry
    )
    out_schema = f"{schema_parts}, n_parts int, area double, {geometry} binary"

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, ignore_index=True)
        polys: list[list[np.ndarray]] = []
        area = 0.0
        for g in pdf[geometry]:
            t, payload = W.decode(bytes(g))
            if t == "Polygon":
                polys.append(payload)
            elif t == "MultiPolygon":
                polys.extend(payload)
            else:
                raise ValueError(f"dissolve expects polygons, got {t}")
            area += geom_area((t, payload))
        first = pdf.iloc[[0]][attr_cols].reset_index(drop=True)
        first["n_parts"] = np.int32(len(polys))
        first["area"] = area
        first[geometry] = [W.multipolygon_wkb(polys)]
        return first

    return gdf.groupBy(colname).applyInPandas(merge, schema=out_schema)


def dissolve_union(gdf: DataFrame, colname: str) -> DataFrame:
    """TRUE geometric union per group — the reference's unary_union
    dissolve semantics (core.py:276) — exact for RECTANGLE layers
    (x0..y1 columns), overlapping/nested/duplicated inputs included:
    per group, the rects compress onto a slab lattice, covered slabs
    dissolve through the boundary stitcher, and the output is genuine
    MultiPolygon WKB (shells CCW, holes CW) whose area is measured on
    the stitched rings, not on the inputs — overlaps count once.

    Scale shape: one grouped-map pass; per-group cost is O(k^2) slabs
    for k member rects, bounded by the dissolve-key cardinality of the
    layer (country-sized groups), never by total table size. General
    overlapping CONCAVE unions stay out of scope — ``dissolve`` keeps
    the documented collection semantics for those.

    Output: (colname, n_parts, n_holes, area, geometry).
    """
    from ..geometry import kernels as K

    key_type = dict(gdf.dtypes)[colname]
    out_schema = (
        f"`{colname}` {key_type}, n_parts int, n_holes int, "
        "area double, geometry binary"
    )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        parts = K.union_rects(
            pdf[["x0", "y0", "x1", "y1"]].to_numpy(dtype=float)
        )
        area = float(sum(K.polygon_area(p) for p in parts))
        n_holes = sum(len(p) - 1 for p in parts)
        return pd.DataFrame(
            {
                colname: [pdf[colname].iloc[0]],
                "n_parts": [np.int32(len(parts))],
                "n_holes": [np.int32(n_holes)],
                "area": [area],
                "geometry": [W.multipolygon_wkb(parts)],
            }
        )

    return gdf.groupBy(colname).applyInPandas(merge, schema=out_schema)
