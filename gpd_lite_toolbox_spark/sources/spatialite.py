"""SpatiaLite source/sink on stdlib ``sqlite3`` (reference #11
``read_spatialite`` core.py:423-463, ``db_connect``/``db_creation``
core.py:407-421 — the reference shells out to the SpatiaLite C
extension; this engine reads the file format directly).

A SpatiaLite database is an ordinary SQLite file whose geometry
columns hold GAIA blobs — a public, documented container around a
WKB-like body::

    byte 0       0x00                  start marker
    byte 1       endianness            0x01 little / 0x00 big
    bytes 2-5    SRID (int32)
    bytes 6-37   MBR (minx,miny,maxx,maxy as doubles)
    byte 38      0x7C                  MBR end marker
    bytes 39-42  geometry class (uint32: 1 Point .. 6 MultiPolygon)
    ...          WKB-shaped coordinate body; nested entities use a
                 0x69 marker + uint32 class instead of WKB's
                 endian byte + type header
    last byte    0xFE                  end marker

Because the format is public and byte-level simple, no SpatiaLite
extension, ``ST_AsBinary`` rewrite, or JDBC driver jar is needed:
``gaia_to_wkb``/``wkb_to_gaia`` translate blobs to the engine's WKB
convention in pure Python.

Scale design: the table read is partitioned by rowid ranges — the
same split strategy Spark's JDBC source uses for
``partitionColumn``/``numPartitions`` — so each executor task opens
the file read-only (``mode=ro``) and scans only its slice. On a real
cluster the ``.sqlite`` file must live on shared storage (as with any
single-file source); the bounded write path is an interchange/export
sink, mirroring the reference's single-connection ``db_creation``.
"""

from __future__ import annotations

import sqlite3
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geometry import wkb as W

_GAIA_START = 0x00
_GAIA_MBR_END = 0x7C
_GAIA_ENTITY = 0x69
_GAIA_END = 0xFE


# ---------------------------------------------------------------- codec


def _coords(buf: memoryview, off: int, n: int, bo: str) -> tuple[np.ndarray, int]:
    arr = np.frombuffer(buf, dtype=bo + "f8", count=2 * n, offset=off)
    return arr.astype("<f8", copy=False).reshape(n, 2), off + 16 * n


def _u32(buf: memoryview, off: int, bo: str) -> tuple[int, int]:
    return struct.unpack_from(bo + "I", buf, off)[0], off + 4


def _body_to_rings(buf, off, bo):
    nrings, off = _u32(buf, off, bo)
    rings = []
    for _ in range(nrings):
        n, off = _u32(buf, off, bo)
        ring, off = _coords(buf, off, n, bo)
        rings.append(ring)
    return rings, off


def gaia_to_wkb(blob: bytes) -> bytes:
    """GAIA geometry blob -> standard little-endian WKB."""
    buf = memoryview(bytes(blob))
    if buf[0] != _GAIA_START or buf[-1] != _GAIA_END or buf[38] != _GAIA_MBR_END:
        raise ValueError("not a SpatiaLite GAIA geometry blob")
    bo = "<" if buf[1] == 1 else ">"
    gclass, off = _u32(buf, 39, bo)
    if gclass == W.WKB_POINT:
        pt, _ = _coords(buf, off, 1, bo)
        return W.point_wkb(pt[0, 0], pt[0, 1])
    if gclass == W.WKB_LINESTRING:
        n, off = _u32(buf, off, bo)
        coords, _ = _coords(buf, off, n, bo)
        return W.linestring_wkb(coords)
    if gclass == W.WKB_POLYGON:
        rings, _ = _body_to_rings(buf, off, bo)
        return W.polygon_wkb(rings)
    if gclass in (W.WKB_MULTIPOINT, W.WKB_MULTILINESTRING, W.WKB_MULTIPOLYGON):
        nent, off = _u32(buf, off, bo)
        parts = []
        for _ in range(nent):
            if buf[off] != _GAIA_ENTITY:
                raise ValueError("corrupt GAIA blob: missing entity marker")
            eclass, off = _u32(buf, off + 1, bo)
            if eclass == W.WKB_POINT:
                pt, off = _coords(buf, off, 1, bo)
                parts.append(W.point_wkb(pt[0, 0], pt[0, 1]))
            elif eclass == W.WKB_LINESTRING:
                n, off = _u32(buf, off, bo)
                coords, off = _coords(buf, off, n, bo)
                parts.append(W.linestring_wkb(coords))
            elif eclass == W.WKB_POLYGON:
                rings, off = _body_to_rings(buf, off, bo)
                parts.append(W.polygon_wkb(rings))
            else:
                raise ValueError(f"unsupported GAIA entity class {eclass}")
        return (
            b"\x01"
            + struct.pack("<I", gclass)
            + struct.pack("<I", nent)
            + b"".join(parts)
        )
    raise ValueError(f"unsupported GAIA geometry class {gclass}")


def _wkb_body(wkb: bytes) -> bytes:
    """Strip the 5-byte WKB header; nested entity headers become GAIA
    0x69 + class markers."""
    gtype = struct.unpack_from("<I", wkb, 1)[0]
    if gtype in (W.WKB_POINT, W.WKB_LINESTRING, W.WKB_POLYGON):
        return bytes(wkb[5:])
    # multi: rewrite each child's 5-byte WKB header to 0x69 + class
    n = struct.unpack_from("<I", wkb, 5)[0]
    out = [struct.pack("<I", n)]
    off = 9
    for _ in range(n):
        child_type = struct.unpack_from("<I", wkb, off + 1)[0]
        child_len = _wkb_len(wkb, off)
        out.append(b"\x69" + struct.pack("<I", child_type))
        out.append(bytes(wkb[off + 5 : off + child_len]))
        off += child_len
    return b"".join(out)


def _wkb_len(wkb: bytes, off: int) -> int:
    """Byte length of the WKB geometry starting at ``off``."""
    gtype = struct.unpack_from("<I", wkb, off + 1)[0]
    if gtype == W.WKB_POINT:
        return 21
    if gtype in (W.WKB_LINESTRING, W.WKB_MULTIPOINT):
        n = struct.unpack_from("<I", wkb, off + 5)[0]
        if gtype == W.WKB_MULTIPOINT:
            return 9 + 21 * n
        return 9 + 16 * n
    if gtype == W.WKB_POLYGON:
        pos = off + 9
        for _ in range(struct.unpack_from("<I", wkb, off + 5)[0]):
            npts = struct.unpack_from("<I", wkb, pos)[0]
            pos += 4 + 16 * npts
        return pos - off
    # multi line/polygon: sum children
    n = struct.unpack_from("<I", wkb, off + 5)[0]
    pos = off + 9
    for _ in range(n):
        pos += _wkb_len(wkb, pos)
    return pos - off


def wkb_to_gaia(wkb: bytes, srid: int = 0) -> bytes:
    """Standard WKB -> GAIA blob (little-endian), MBR computed from
    the decoded coordinates."""
    gtype, payload = W.decode(bytes(wkb))
    if gtype == "Point":
        xs = np.array([payload[0]])
        ys = np.array([payload[1]])
    elif gtype in ("LineString", "MultiPoint"):
        xs, ys = payload[:, 0], payload[:, 1]
    elif gtype in ("Polygon", "MultiLineString"):
        allc = np.vstack(payload)
        xs, ys = allc[:, 0], allc[:, 1]
    else:  # MultiPolygon
        allc = np.vstack([r for rings in payload for r in rings])
        xs, ys = allc[:, 0], allc[:, 1]
    gclass = struct.unpack_from("<I", wkb, 1)[0]
    return (
        bytes([_GAIA_START, 0x01])
        + struct.pack("<i", srid)
        + struct.pack(
            "<4d",
            float(xs.min()),
            float(ys.min()),
            float(xs.max()),
            float(ys.max()),
        )
        + bytes([_GAIA_MBR_END])
        + struct.pack("<I", gclass)
        + _wkb_body(bytes(wkb))
        + bytes([_GAIA_END])
    )


# --------------------------------------------------------------- reader

_SQLITE_TO_SPARK = {
    "INTEGER": T.LongType(),
    "INT": T.LongType(),
    "BIGINT": T.LongType(),
    "REAL": T.DoubleType(),
    "DOUBLE": T.DoubleType(),
    "FLOAT": T.DoubleType(),
    "TEXT": T.StringType(),
    "VARCHAR": T.StringType(),
    "BLOB": T.BinaryType(),
}

_GEOM_DECLS = {
    "POINT",
    "LINESTRING",
    "POLYGON",
    "MULTIPOINT",
    "MULTILINESTRING",
    "MULTIPOLYGON",
    "GEOMETRY",
}


def _probe(path: str, table: str):
    """Driver-side metadata probe: column schema, geometry columns
    (via the ``geometry_columns`` registry when present, else declared
    types), rowid bounds."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        cols = con.execute(f'PRAGMA table_info("{table}")').fetchall()
        if not cols:
            raise ValueError(f"table {table!r} not found in {path}")
        geom_cols = set()
        try:
            geom_cols = {
                r[0]
                for r in con.execute(
                    "SELECT f_geometry_column FROM geometry_columns "
                    "WHERE lower(f_table_name) = lower(?)",
                    (table,),
                )
            }
        except sqlite3.OperationalError:
            pass  # no registry table: fall back to declared types
        fields = []
        for _, name, decl, *_ in cols:
            base = (decl or "").upper().split("(")[0].strip()
            if name in geom_cols or base in _GEOM_DECLS:
                geom_cols.add(name)
                fields.append(T.StructField(name, T.BinaryType()))
            else:
                fields.append(
                    T.StructField(name, _SQLITE_TO_SPARK.get(base, T.StringType()))
                )
        lo, hi = con.execute(
            f'SELECT MIN(rowid), MAX(rowid) FROM "{table}"'
        ).fetchone()
        return T.StructType(fields), geom_cols, lo, hi
    finally:
        con.close()


def read_spatialite(
    spark: SparkSession,
    path: str,
    table: str,
    num_partitions: int = 8,
    add_bbox: bool = False,
) -> DataFrame:
    """Parallel SpatiaLite table read: rowid ranges fan out across
    executors (the JDBC ``partitionColumn`` pattern), each task opens
    the file read-only and decodes GAIA blobs to WKB in its slice.
    Geometry columns arrive as engine-convention WKB binary."""
    schema, geom_cols, lo, hi = _probe(path, table)
    if lo is None:  # empty table
        return spark.createDataFrame([], schema)
    n = max(1, min(num_partitions, hi - lo + 1))
    step = (hi - lo + 1 + n - 1) // n
    ranges = spark.createDataFrame(
        [(lo + i * step, min(hi, lo + (i + 1) * step - 1)) for i in range(n)],
        "lo long, hi long",
    ).repartition(n, "lo")
    names = schema.fieldNames()
    collist = ", ".join(f'"{c}"' for c in names)

    def _scan(batches):
        for pdf in batches:
            for lo_, hi_ in pdf.itertuples(index=False):
                con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
                try:
                    cur = con.execute(
                        f'SELECT {collist} FROM "{table}" '
                        "WHERE rowid BETWEEN ? AND ?",
                        (int(lo_), int(hi_)),
                    )
                    rows = cur.fetchall()
                finally:
                    con.close()
                out = pd.DataFrame(rows, columns=names)
                for g in geom_cols:
                    out[g] = out[g].map(
                        lambda b: gaia_to_wkb(b) if b is not None else None
                    )
                yield out

    df = ranges.mapInPandas(_scan, schema)
    if add_bbox and geom_cols:
        from ..geometry.functions import st_bounds

        df = df.withColumn("bbox", st_bounds(next(iter(sorted(geom_cols)))))
    return df


def write_spatialite(
    df: DataFrame,
    path: str,
    table: str,
    geom_col: str = "geometry",
    srid: int = 0,
    mode: str = "overwrite",
    max_rows: int = 5_000_000,
) -> None:
    """Bounded export sink (the reference's single-connection
    ``db_creation`` shape, core.py:407-421): collect to the driver and
    write one SQLite file with GAIA geometry blobs plus the
    ``geometry_columns`` registry row. For layer-sized interchange
    outputs, not bulk data (use the partitioned parquet sink for
    that).

    The driver-side collect is inherent to a single-file sink;
    ``max_rows`` makes the bound explicit — the collect itself is
    capped at ``max_rows + 1`` rows (one bounded action, no separate
    count job re-running the lineage) and the sink refuses to write a
    truncated table. Raise it deliberately for a bigger export."""
    pdf = df.limit(int(max_rows) + 1).toPandas()
    if len(pdf) > max_rows:
        raise ValueError(
            f"write_spatialite collects to the driver: input exceeds "
            f"max_rows={max_rows}; use the partitioned parquet sink for "
            "bulk data or raise max_rows explicitly"
        )
    spark_types = dict(df.dtypes)
    decls = []
    for c in pdf.columns:
        if c == geom_col:
            decls.append(f'"{c}" GEOMETRY')
        elif spark_types[c] in ("bigint", "int", "smallint", "tinyint"):
            decls.append(f'"{c}" INTEGER')
        elif spark_types[c] in ("double", "float"):
            decls.append(f'"{c}" REAL')
        elif spark_types[c] == "binary":
            decls.append(f'"{c}" BLOB')
        else:
            decls.append(f'"{c}" TEXT')
    if mode not in ("overwrite", "append", "error"):
        raise ValueError(
            f"write_spatialite mode must be overwrite/append/error, "
            f"got {mode!r}"
        )
    con = sqlite3.connect(path)
    try:
        if mode == "overwrite":
            con.execute(f'DROP TABLE IF EXISTS "{table}"')
            con.execute(f'CREATE TABLE "{table}" ({", ".join(decls)})')
        elif mode == "append":
            con.execute(
                f'CREATE TABLE IF NOT EXISTS "{table}" ({", ".join(decls)})'
            )
        else:  # error: fail loudly when the table already exists
            con.execute(f'CREATE TABLE "{table}" ({", ".join(decls)})')
        con.execute(
            "CREATE TABLE IF NOT EXISTS geometry_columns ("
            "f_table_name TEXT, f_geometry_column TEXT, "
            "geometry_type INTEGER, coord_dimension INTEGER, "
            "srid INTEGER, spatial_index_enabled INTEGER)"
        )
        con.execute(
            "DELETE FROM geometry_columns WHERE f_table_name = ?", (table,)
        )
        if geom_col in pdf.columns:
            con.execute(
                "INSERT INTO geometry_columns VALUES (?, ?, 0, 2, ?, 0)",
                (table, geom_col, srid),
            )
        rows = []
        for tup in pdf.itertuples(index=False):
            row = []
            for c, v in zip(pdf.columns, tup):
                if c == geom_col and v is not None:
                    row.append(wkb_to_gaia(bytes(v), srid))
                elif isinstance(v, (bytes, bytearray)):
                    row.append(bytes(v))
                elif isinstance(v, np.generic):
                    row.append(v.item())
                else:
                    row.append(v)
            rows.append(tuple(row))
        con.executemany(
            f'INSERT INTO "{table}" VALUES ({", ".join("?" * len(pdf.columns))})',
            rows,
        )
        con.commit()
    finally:
        con.close()
