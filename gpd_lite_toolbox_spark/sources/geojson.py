"""GeoJSON (RFC 7946) text codec for the WKB geometry convention.

The reference round-trips layers through geopandas file IO
(``gpd.read_file`` / ``GeoDataFrame.to_file`` used throughout
``gpd_lite_toolbox/core.py``, e.g. core.py:63-75 docstrings take
GeoDataFrames straight from files). This engine's equivalent is a text
codec: features serialize to one GeoJSON Feature string per row —
newline-delimited GeoJSON being the standard interchange shape for
distributed pipelines, since a text file of features splits cleanly
across executors — and parse back into WKB + property columns.

Spark-first split: the Python boundary is crossed ONLY for the
geometry member (one WKB decode/encode per Arrow batch); feature
assembly and property extraction are native (``to_json`` /
``from_json`` / string concat), so Catalyst sees the property schema.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geometry import wkb as W


def _geom_obj(buf: bytes):
    """Decoded WKB -> GeoJSON geometry dict (nested plain lists)."""
    gtype, payload = W.decode(bytes(buf))
    if gtype in ("Point",):
        coords = [float(payload[0]), float(payload[1])]
    elif gtype in ("LineString", "MultiPoint"):
        coords = payload.tolist()
    elif gtype == "Polygon":
        coords = [r.tolist() for r in payload]
    elif gtype == "MultiLineString":
        coords = [p.tolist() for p in payload]
    elif gtype == "MultiPolygon":
        coords = [[r.tolist() for r in rings] for rings in payload]
    else:  # pragma: no cover - decode() already rejects others
        raise ValueError(f"unsupported geometry type {gtype}")
    return {"type": gtype, "coordinates": coords}


def _geom_wkb(obj) -> bytes:
    """GeoJSON geometry dict -> WKB bytes."""
    import numpy as np

    t = obj["type"]
    c = obj["coordinates"]
    if t == "Point":
        return W.point_wkb(float(c[0]), float(c[1]))
    if t == "LineString":
        return W.linestring_wkb(np.asarray(c, dtype="<f8"))
    if t == "MultiPoint":
        arr = np.asarray(c, dtype="<f8")
        body = b"".join(W.point_wkb(x, y) for x, y in arr)
        import struct

        return (
            b"\x01"
            + struct.pack("<I", W.WKB_MULTIPOINT)
            + struct.pack("<I", len(arr))
            + body
        )
    if t == "Polygon":
        return W.polygon_wkb([np.asarray(r, dtype="<f8") for r in c])
    if t == "MultiLineString":
        import struct

        body = b"".join(
            W.linestring_wkb(np.asarray(l, dtype="<f8")) for l in c
        )
        return (
            b"\x01"
            + struct.pack("<I", W.WKB_MULTILINESTRING)
            + struct.pack("<I", len(c))
            + body
        )
    if t == "MultiPolygon":
        return W.multipolygon_wkb(
            [[np.asarray(r, dtype="<f8") for r in rings] for rings in c]
        )
    raise ValueError(f"unsupported GeoJSON geometry type {t}")


@F.pandas_udf(T.StringType())
def st_asgeojson(geom: pd.Series) -> pd.Series:
    """WKB -> GeoJSON geometry string (compact separators, so output
    is stable byte-for-byte across engines and runs)."""
    return geom.map(
        lambda b: json.dumps(_geom_obj(b), separators=(",", ":"))
    )


@F.pandas_udf(T.BinaryType())
def st_fromgeojson(js: pd.Series) -> pd.Series:
    """GeoJSON string -> WKB. Accepts a bare geometry object or a
    Feature (its ``geometry`` member is taken)."""

    def _parse(s: str) -> bytes:
        obj = json.loads(s)
        if obj.get("type") == "Feature":
            obj = obj["geometry"]
        return _geom_wkb(obj)

    return js.map(_parse)


def to_geojson_features(
    df: DataFrame, geom_col: str = "geometry", props: list[str] | None = None
) -> DataFrame:
    """One GeoJSON Feature string per row in column ``feature``.

    Only the geometry crosses the Python boundary; the Feature wrapper
    and the properties object are native (``to_json`` over a struct +
    string concat), keeping property serialization inside codegen.
    """
    props = props if props is not None else []
    props_json = (
        F.to_json(F.struct(*[F.col(p) for p in props]))
        if props
        else F.lit("{}")
    )
    return df.withColumn(
        "feature",
        F.concat(
            F.lit('{"type":"Feature","geometry":'),
            st_asgeojson(F.col(geom_col)),
            F.lit(',"properties":'),
            props_json,
            F.lit("}"),
        ),
    )


def from_geojson_features(
    df: DataFrame,
    feature_col: str = "feature",
    props_schema: T.StructType | str | None = None,
) -> DataFrame:
    """Parse Feature strings back to a ``geometry`` WKB column plus
    property columns (native ``from_json`` when ``props_schema`` is
    given — schema-checked by Catalyst, not Python)."""
    out = df.withColumn("geometry", st_fromgeojson(F.col(feature_col)))
    if props_schema is not None:
        out = out.withColumn(
            "_props",
            F.from_json(
                F.get_json_object(F.col(feature_col), "$.properties"),
                props_schema,
            ),
        ).select(
            *[c for c in out.columns if c != "_props"], "_props.*"
        )
    return out.drop(feature_col)
