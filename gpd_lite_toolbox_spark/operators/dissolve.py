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
