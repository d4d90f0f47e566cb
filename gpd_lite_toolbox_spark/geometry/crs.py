"""CRS handling: column-metadata tags + coordinate reprojection.

SURVEY.md §1.4: GeoDataFrame.crs (the reference inherits it from
geopandas; README.md:43 demos ``.to_crs(epsg=3035)``) maps to Spark
COLUMN METADATA on the geometry column — metadata rides through
selects/joins of that column, costs nothing at runtime, and keeps the
DataFrame a plain DataFrame.

Reprojection ships with two closed-form CRSs (no pyproj in the
engine's dependency set, mirroring the no-shapely rule):

- ``EPSG:4326`` geographic lon/lat degrees
- ``EPSG:3857`` spherical Web Mercator meters

both directions as NATIVE Catalyst expressions for (x, y) columns —
whole-stage codegen, no Python — plus an Arrow UDF for WKB geometry
columns. The spherical-Mercator formulas are exact inverses of each
other (round-trip property-tested); other EPSG codes raise rather than
silently misproject. A planar layer (the fixtures' local CRS) tags as
``planar:<name>`` and only supports identity.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CRS_META_KEY = "crs"
_R = 6378137.0  # WGS84 semi-major axis (spherical Mercator earth radius)


def set_crs(df: DataFrame, crs: str, geometry: str = "geometry") -> DataFrame:
    """Tag the geometry column with a CRS (metadata only, no data
    change) — the engine's equivalent of ``gdf.set_crs``."""
    return df.withMetadata(geometry, {CRS_META_KEY: crs})


def get_crs(df: DataFrame, geometry: str = "geometry") -> str | None:
    """Read the geometry column's CRS tag (None when untagged)."""
    for f in df.schema.fields:
        if f.name == geometry:
            return f.metadata.get(CRS_META_KEY)
    return None


def _check_pair(from_crs: str, to_crs: str) -> None:
    supported = {"EPSG:4326", "EPSG:3857"}
    if from_crs == to_crs:
        return
    if from_crs not in supported or to_crs not in supported:
        raise ValueError(
            f"unsupported reprojection {from_crs} -> {to_crs}: closed-form "
            "transforms ship for EPSG:4326 <-> EPSG:3857 only"
        )


def transform_xy_expr(
    x: Column, y: Column, from_crs: str, to_crs: str
) -> tuple[Column, Column]:
    """(x', y') native expressions reprojecting coordinate columns."""
    _check_pair(from_crs, to_crs)
    if from_crs == to_crs:
        return x, y
    if from_crs == "EPSG:4326":  # lon/lat deg -> mercator meters
        mx = F.lit(_R) * F.radians(x)
        my = F.lit(_R) * F.log(
            F.tan(F.lit(math.pi / 4.0) + F.radians(y) / F.lit(2.0))
        )
        return mx, my
    # mercator meters -> lon/lat deg
    lon = F.degrees(x / F.lit(_R))
    lat = F.degrees(
        F.lit(2.0) * F.atan(F.exp(y / F.lit(_R))) - F.lit(math.pi / 2.0)
    )
    return lon, lat


def _xy_numpy(xs, ys, from_crs: str, to_crs: str):
    import numpy as np

    if from_crs == to_crs:
        return xs, ys
    if from_crs == "EPSG:4326":
        return (
            _R * np.radians(xs),
            _R * np.log(np.tan(math.pi / 4.0 + np.radians(ys) / 2.0)),
        )
    return (
        np.degrees(xs / _R),
        np.degrees(2.0 * np.arctan(np.exp(ys / _R)) - math.pi / 2.0),
    )


def st_transform(from_crs: str, to_crs: str):
    """Arrow UDF reprojecting every coordinate of a WKB geometry column
    (same math as transform_xy_expr, applied to decoded rings)."""
    _check_pair(from_crs, to_crs)

    from . import wkb as W

    def _tx(coords):
        x, y = _xy_numpy(coords[:, 0], coords[:, 1], from_crs, to_crs)
        import numpy as np

        return np.column_stack([x, y])

    @F.pandas_udf("binary")
    def _transform(geom: pd.Series) -> pd.Series:
        out = []
        for g in geom:
            t, payload = W.decode(bytes(g))
            if t == "Point":
                x, y = _xy_numpy(payload[0:1], payload[1:2], from_crs, to_crs)
                out.append(W.point_wkb(float(x[0]), float(y[0])))
            elif t == "LineString":
                out.append(W.linestring_wkb(_tx(payload)))
            elif t == "Polygon":
                out.append(W.polygon_wkb([_tx(r) for r in payload]))
            elif t == "MultiPolygon":
                out.append(
                    W.multipolygon_wkb(
                        [[_tx(r) for r in rings] for rings in payload]
                    )
                )
            else:
                raise ValueError(f"st_transform unsupported for {t}")
        return pd.Series(out)

    return _transform


def to_crs(
    df: DataFrame,
    to_crs_code: str,
    geometry: str = "geometry",
    x_col: str | None = None,
    y_col: str | None = None,
) -> DataFrame:
    """DataFrame-level reprojection (``gdf.to_crs`` shape): transforms
    the geometry column (when present) and optionally paired scalar
    coordinate columns, and re-tags the CRS metadata. The source CRS
    comes from the column tag — untagged input is an error (matching
    geopandas' refusal to reproject a CRS-less frame)."""
    from_crs = get_crs(df, geometry)
    if from_crs is None:
        raise ValueError(
            "to_crs: input has no CRS tag on the geometry column; "
            "call set_crs first"
        )
    _check_pair(from_crs, to_crs_code)
    out = df
    if x_col and y_col:
        nx, ny = transform_xy_expr(
            F.col(x_col), F.col(y_col), from_crs, to_crs_code
        )
        out = out.withColumn(x_col, nx).withColumn(y_col, ny)
    if geometry in df.columns and from_crs != to_crs_code:
        out = out.withColumn(
            geometry, st_transform(from_crs, to_crs_code)(F.col(geometry))
        )
    return set_crs(out, to_crs_code, geometry)
