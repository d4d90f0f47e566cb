"""CRS metadata + reprojection tests: tag round-trip, metadata
survival through selects/joins, forward/backward Mercator exactness,
and the geometry-column UDF path."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from gpd_lite_toolbox_spark import fixtures as FX
from gpd_lite_toolbox_spark.geometry import crs as C
from gpd_lite_toolbox_spark.geometry import wkb as W


def test_crs_tag_roundtrip_and_survival(spark, sf_dir):
    polys = FX.polys(spark, sf_dir)
    assert C.get_crs(polys) is None
    tagged = C.set_crs(polys, "planar:fixture")
    assert C.get_crs(tagged) == "planar:fixture"
    # survives projection and join of the column
    derived = tagged.select("id", "geometry").join(
        tagged.select("id", "code"), "id"
    )
    assert C.get_crs(derived) == "planar:fixture"


def test_transform_xy_roundtrip(spark):
    df = spark.createDataFrame(
        [(i, -170.0 + i * 17.0, -80.0 + i * 8.5) for i in range(20)],
        "id int, lon double, lat double",
    )
    mx, my = C.transform_xy_expr(
        F.col("lon"), F.col("lat"), "EPSG:4326", "EPSG:3857"
    )
    m = df.select("id", "lon", "lat", mx.alias("mx"), my.alias("my"))
    lon2, lat2 = C.transform_xy_expr(
        F.col("mx"), F.col("my"), "EPSG:3857", "EPSG:4326"
    )
    out = m.select("id", "lon", "lat", lon2.alias("l2"), lat2.alias("t2"))
    for r in out.collect():
        assert abs(r.l2 - r.lon) < 1e-9
        assert abs(r.t2 - r.lat) < 1e-9


def test_st_transform_geometry_roundtrip(spark):
    ring = np.array(
        [[-10.0, -10.0], [10.0, -10.0], [10.0, 10.0], [-10.0, 10.0],
         [-10.0, -10.0]]
    )
    df = spark.createDataFrame(
        [(0, bytearray(W.polygon_wkb([ring])))], "id int, geometry binary"
    )
    fwd = C.st_transform("EPSG:4326", "EPSG:3857")
    back = C.st_transform("EPSG:3857", "EPSG:4326")
    out = df.select(back(fwd(F.col("geometry"))).alias("g")).collect()[0]
    t, payload = W.decode(bytes(out.g))
    assert t == "Polygon"
    assert np.allclose(payload[0], ring, atol=1e-9)


def test_to_crs_requires_tag_and_rejects_unknown(spark, sf_dir):
    polys = FX.polys(spark, sf_dir)
    with pytest.raises(ValueError, match="no CRS tag"):
        C.to_crs(polys, "EPSG:3857")
    tagged = C.set_crs(polys, "planar:fixture")
    with pytest.raises(ValueError, match="unsupported reprojection"):
        C.to_crs(tagged, "EPSG:3857")
    # identity reprojection of a planar tag is fine
    assert C.get_crs(C.to_crs(tagged, "planar:fixture")) == "planar:fixture"
