"""SpatiaLite source/sink: GAIA blob codec bit-exactness, partitioned
parallel read, write->read round-trip (reference #11 read_spatialite /
db_creation, core.py:407-463)."""

import sqlite3
import struct

import numpy as np

from gpd_lite_toolbox_spark import fixtures as FX
from gpd_lite_toolbox_spark.geometry import wkb as W
from gpd_lite_toolbox_spark.sources.spatialite import (
    gaia_to_wkb,
    read_spatialite,
    wkb_to_gaia,
    write_spatialite,
)


def _all_type_cases():
    ring = np.array(
        [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]]
    )
    hole = np.array(
        [[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0], [1.0, 1.0]]
    )
    line = np.array([[0.0, 0.0], [1.0, 2.0], [3.0, 5.0]])
    ml_body = W.linestring_wkb(line) + W.linestring_wkb(line + 10.0)
    multiline = (
        b"\x01"
        + struct.pack("<I", W.WKB_MULTILINESTRING)
        + struct.pack("<I", 2)
        + ml_body
    )
    return [
        W.point_wkb(1.5, -2.5),
        W.linestring_wkb(line),
        W.polygon_wkb([ring, hole]),
        multiline,
        W.multipolygon_wkb([[ring], [ring + 100.0, hole + 100.0]]),
    ]


def test_gaia_codec_bit_exact_roundtrip():
    for wkb in _all_type_cases():
        gaia = wkb_to_gaia(wkb, srid=4326)
        assert gaia[0] == 0x00 and gaia[-1] == 0xFE and gaia[38] == 0x7C
        assert struct.unpack_from("<i", gaia, 2)[0] == 4326
        assert gaia_to_wkb(gaia) == wkb


def test_gaia_mbr_matches_coords():
    ring = np.array(
        [[2.0, 3.0], [7.0, 3.0], [7.0, 9.0], [2.0, 9.0], [2.0, 3.0]]
    )
    gaia = wkb_to_gaia(W.polygon_wkb([ring]), srid=0)
    minx, miny, maxx, maxy = struct.unpack_from("<4d", gaia, 6)
    assert (minx, miny, maxx, maxy) == (2.0, 3.0, 7.0, 9.0)


def test_write_then_parallel_read_roundtrip(spark, sf_dir, tmp_path):
    db = str(tmp_path / "layer.sqlite")
    src = FX.cpolys(spark, sf_dir).select("id", "has_hole", "geometry")
    write_spatialite(src, db, "cpolys", geom_col="geometry", srid=3857)

    # registry row present (the SpatiaLite convention readers look for)
    con = sqlite3.connect(db)
    reg = con.execute(
        "SELECT f_geometry_column, srid FROM geometry_columns "
        "WHERE f_table_name='cpolys'"
    ).fetchone()
    con.close()
    assert reg == ("geometry", 3857)

    out = read_spatialite(spark, db, "cpolys", num_partitions=4)
    assert out.rdd.getNumPartitions() == 4
    got = {r.id: (r.has_hole, bytes(r.geometry)) for r in out.collect()}
    want = {r.id: (r.has_hole, bytes(r.geometry)) for r in src.collect()}
    assert got == want


def test_read_single_row_table(spark, tmp_path):
    db = str(tmp_path / "one.sqlite")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (name TEXT, x REAL, geom GEOMETRY)")
    con.execute(
        "INSERT INTO t VALUES (?, ?, ?)",
        ("a", 1.5, wkb_to_gaia(W.point_wkb(10.0, 20.0), srid=0)),
    )
    con.commit()
    con.close()
    rows = read_spatialite(spark, db, "t", num_partitions=8).collect()
    assert len(rows) == 1
    assert rows[0].name == "a" and rows[0].x == 1.5
    assert bytes(rows[0].geom) == W.point_wkb(10.0, 20.0)


def test_write_spatialite_row_guard(spark, tmp_path):
    """The single-file sink refuses to collect tables above max_rows
    (the bound is explicit, not an OOM)."""
    import pytest

    from gpd_lite_toolbox_spark.sources.spatialite import write_spatialite

    df = spark.range(0, 100).withColumnRenamed("id", "fid")
    with pytest.raises(ValueError, match="max_rows"):
        write_spatialite(
            df, str(tmp_path / "t.sqlite"), "t", geom_col="g", max_rows=10
        )
