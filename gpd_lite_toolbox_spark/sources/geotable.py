"""Geospatial table sources (reference #11 read_spatialite,
core.py:423-463).

The reference rewrites ``SELECT <cols> FROM ...`` to inject
``HEX(ST_AsBinary(geom))`` and reads over a SpatiaLite connection —
i.e. its wire format for geometry is HEX-WKB in an ordinary column.
This engine standardizes on the same convention:

- ``read_geoparquet``: parquet where geometry is WKB binary (native) or
  hex-WKB string (decoded with native ``unhex`` — no UDF);
- ``read_geo_jdbc``: the JDBC path with the reference's SELECT rewrite
  (validated the same way: explicit column list, SELECT-shaped);
  gated behind the driver-jar availability, as SURVEY.md §7 plans.

Both attach the engine's ``bbox`` companion struct so downstream
spatial joins can prune without decoding.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geometry.functions import st_bounds


def rewrite_select_inject_geom(sql: str, geom_col: str = "geometry") -> str:
    """The reference's query rewrite (core.py:444-458) with its
    documented bug FIXED (SURVEY §5 fixed-bugs policy): the reference
    rejects any ``*`` anywhere (core.py:444-445), which also kills
    legitimate aggregate stars like ``COUNT(*)``. Here only bare star
    PROJECTION ITEMS (``SELECT *``, ``t.*``) are rejected — a star
    inside a function call OR arithmetic (``price * 2``) survives.
    SELECT-shaped statement still required; the hex-WKB geometry
    expression is injected as before."""
    if not (sql.lower().find("select") == 0 and sql.find(" ") == 6):
        raise ValueError("Unable to understand the query")
    # erase parenthesized argument lists (innermost-out), then check
    # each top-level projection item: only an item that IS a bare star
    # (or alias.*) is a star projection
    head = sql
    while re.search(r"\([^()]*\)", head):
        head = re.sub(r"\([^()]*\)", "", head)
    head = re.split(r"(?i)\sfrom\s", head)[0][7:]
    for item in (i.strip() for i in head.split(",")):
        if item == "*" or re.fullmatch(r"[A-Za-z_][\w$.]*\.\*", item):
            raise ValueError("Column names have to be specified")
    return (
        sql[:7] + f"HEX(ST_AsBinary({geom_col})) as {geom_col}, " + sql[7:]
    )


def with_geometry(
    df: DataFrame, geom_col: str = "geometry", add_bbox: bool = True
) -> DataFrame:
    """Normalize a loaded table to the engine's geometry convention:
    hex-WKB strings become WKB binary via native ``unhex``."""
    if dict(df.dtypes).get(geom_col) == "string":
        df = df.withColumn(geom_col, F.unhex(F.col(geom_col)))
    if add_bbox:
        df = df.withColumn("bbox", st_bounds(geom_col))
    return df


def read_geoparquet(
    spark: SparkSession, path: str, geom_col: str = "geometry"
) -> DataFrame:
    return with_geometry(spark.read.parquet(path), geom_col)


def read_geo_jdbc(
    spark: SparkSession,
    url: str,
    sql: str,
    geom_col: str = "geometry",
    driver: str | None = None,
    **options,
) -> DataFrame:
    """JDBC geo source with the reference's SELECT rewrite. Requires the
    matching JDBC driver jar on the classpath; raises a clear error
    otherwise (no driver jars ship in this image — SURVEY.md §7 Phase 5
    keeps this as the gated external)."""
    query = rewrite_select_inject_geom(sql, geom_col)
    reader = spark.read.format("jdbc").option("url", url).option(
        "query", query
    )
    if driver:
        reader = reader.option("driver", driver)
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return with_geometry(reader.load(), geom_col)
    except Exception as e:  # pragma: no cover - driver-jar dependent
        raise RuntimeError(
            "JDBC geo source unavailable (driver jar missing?): " + str(e)
        ) from e
