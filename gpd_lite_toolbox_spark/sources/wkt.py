"""WKT (ISO 19125 / OGC Simple Features) text codec for the WKB
geometry convention — the third interchange codec beside GeoJSON
(sources/geojson.py) and the SpatiaLite GAIA blob (sources/spatialite.py).

The reference leans on shapely's implicit ``str(geom)``/``wkt.loads``
(shapely objects are WKT-native throughout gpd_lite_toolbox). Here the
codec is a pair of Arrow batch UDFs over the engine's from-scratch WKB
layer: one decode/encode per Arrow batch, coordinates formatted with
``repr`` (shortest round-trip float form) so a full encode->parse
cycle is bit-exact.

Supported: Point, MultiPoint, LineString, MultiLineString, Polygon,
MultiPolygon — the engine's whole geometry model (SURVEY §1.2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from ..geometry import wkb as W


def _fmt_pt(x: float, y: float) -> str:
    return f"{x!r} {y!r}"


def _fmt_seq(coords) -> str:
    return ", ".join(_fmt_pt(float(p[0]), float(p[1])) for p in coords)


def _to_wkt(buf: bytes) -> str:
    gtype, payload = W.decode(bytes(buf))
    if gtype == "Point":
        return f"POINT ({_fmt_pt(float(payload[0]), float(payload[1]))})"
    if gtype == "LineString":
        return f"LINESTRING ({_fmt_seq(payload)})"
    if gtype == "MultiPoint":
        inner = ", ".join(
            f"({_fmt_pt(float(p[0]), float(p[1]))})" for p in payload
        )
        return f"MULTIPOINT ({inner})"
    if gtype == "MultiLineString":
        inner = ", ".join(f"({_fmt_seq(part)})" for part in payload)
        return f"MULTILINESTRING ({inner})"
    if gtype == "Polygon":
        inner = ", ".join(f"({_fmt_seq(ring)})" for ring in payload)
        return f"POLYGON ({inner})"
    if gtype == "MultiPolygon":
        inner = ", ".join(
            "(" + ", ".join(f"({_fmt_seq(ring)})" for ring in rings) + ")"
            for rings in payload
        )
        return f"MULTIPOLYGON ({inner})"
    raise ValueError(f"unsupported geometry type {gtype}")


def _split_top(s: str) -> list[str]:
    """Split a comma-separated list at paren depth 0."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return [p.strip() for p in parts]


def _coords(s: str) -> np.ndarray:
    pts = [
        [float(c) for c in p.split()] for p in s.split(",") if p.strip()
    ]
    return np.asarray(pts, dtype="<f8")


def _strip(s: str) -> str:
    s = s.strip()
    if not (s.startswith("(") and s.endswith(")")):
        raise ValueError(f"malformed WKT body: {s[:40]!r}")
    return s[1:-1]


def _from_wkt(text: str) -> bytes:
    s = text.strip()
    head, _, body = s.partition("(")
    gtype = head.strip().upper()
    body = "(" + body
    inner = _strip(body)
    if gtype == "POINT":
        x, y = (float(c) for c in inner.split())
        return W.point_wkb(x, y)
    if gtype == "LINESTRING":
        return W.linestring_wkb(_coords(inner))
    if gtype == "MULTIPOINT":
        pts = [
            _coords(_strip(p) if p.startswith("(") else p)[0]
            for p in _split_top(inner)
        ]
        arr = np.asarray(pts, dtype="<f8")
        body_b = b"".join(W.point_wkb(p[0], p[1]) for p in arr)
        import struct

        return (
            b"\x01" + struct.pack("<I", 4) + struct.pack("<I", len(arr)) + body_b
        )
    if gtype == "MULTILINESTRING":
        import struct

        parts = [_coords(_strip(p)) for p in _split_top(inner)]
        body_b = b"".join(W.linestring_wkb(c) for c in parts)
        return (
            b"\x01" + struct.pack("<I", 5) + struct.pack("<I", len(parts)) + body_b
        )
    if gtype == "POLYGON":
        rings = [_coords(_strip(r)) for r in _split_top(inner)]
        return W.polygon_wkb(rings)
    if gtype == "MULTIPOLYGON":
        polys = [
            [_coords(_strip(r)) for r in _split_top(_strip(p))]
            for p in _split_top(inner)
        ]
        return W.multipolygon_wkb(polys)
    raise ValueError(f"unsupported WKT type {gtype!r}")


def _to_wkt_series(s: pd.Series) -> pd.Series:
    return s.map(_to_wkt)


def _from_wkt_series(s: pd.Series) -> pd.Series:
    return s.map(_from_wkt)


# UDFs are built per call (not module-level decorators): a chained
# projection like st_fromwkt(st_aswkt(c)) fuses both into one Python
# eval whose worker-side deserialization re-imports module-level UDF
# OBJECTS and re-resolves their return types — which needs an active
# session the worker doesn't have. Factory form pickles plain
# functions; the driver resolves types at construction.


def st_aswkt(col) -> Column:
    """WKB geometry column -> WKT string column."""
    return F.pandas_udf(_to_wkt_series, "string")(col)


def st_fromwkt(col) -> Column:
    """WKT string column -> WKB binary column."""
    return F.pandas_udf(_from_wkt_series, "binary")(col)
