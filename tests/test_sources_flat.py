"""CSV/ORC round-trips on adversarial content: the quoting dialect and
NULL/empty distinction must survive byte-exactly."""

from __future__ import annotations

import pytest

from gpd_lite_toolbox_spark.sources.flat import (
    read_csv,
    read_orc,
    read_xml,
    write_csv,
    write_orc,
    write_xml,
)

ADVERSARIAL = [
    (1, 'comma, in "quotes", and more'),
    (2, 'embedded\nnewline\r\nand CRLF'),
    (3, 'double "" quotes "everywhere"'),
    (4, "unicode: café 中文 \U0001f600 ß"),
    (5, "\\N literal backslash-N"),
    (6, ""),          # empty string, not NULL
    (7, None),        # NULL, not empty string
    (8, "   leading and trailing   "),
    (9, "tab\tseparated\tvalues"),
    (10, "angle <brackets> & ampersand &amp; entity"),
    (11, "]]> cdata terminator <row> fake markup </row>"),
]
SCHEMA = "id bigint, text string"


@pytest.mark.parametrize("codec", ["csv", "orc", "xml"])
def test_flat_roundtrip_adversarial(spark, tmp_path, codec):
    df = spark.createDataFrame(ADVERSARIAL, SCHEMA)
    path = str(tmp_path / codec)
    if codec == "csv":
        write_csv(df, path)
        back = read_csv(spark, path, SCHEMA)
    elif codec == "xml":
        write_xml(df, path)
        back = read_xml(spark, path, SCHEMA)
    else:
        write_orc(df, path)
        back = read_orc(spark, path)
    got = {r["id"]: r["text"] for r in back.collect()}
    want = dict(ADVERSARIAL)
    assert got == want  # includes None vs "" distinction


def test_xml_rejects_control_characters_loudly(spark, tmp_path):
    """XML 1.0 cannot represent control characters: the writer must
    FAIL the write (documented dialect limitation) rather than emit
    unparseable markup that a downstream reader chokes on."""
    df = spark.createDataFrame([(1, "a\x01b")], SCHEMA)
    with pytest.raises(Exception):
        write_xml(df, str(tmp_path / "ctrl"))


def test_csv_null_sentinel_is_configurable(spark, tmp_path):
    """A text value equal to the default \\N sentinel reads back as
    NULL (documented dialect limitation); a caller whose domain
    contains it picks another sentinel and round-trips exactly."""
    rows = [(1, "\\N"), (2, None), (3, "x")]
    df = spark.createDataFrame(rows, SCHEMA)

    p1 = str(tmp_path / "default")
    write_csv(df, p1)
    got = {r["id"]: r["text"] for r in read_csv(spark, p1, SCHEMA).collect()}
    assert got[1] is None  # the documented collision

    p2 = str(tmp_path / "custom")
    write_csv(df, p2, null_value="\x00NULL\x00")
    got = {
        r["id"]: r["text"]
        for r in read_csv(spark, p2, SCHEMA, null_value="\x00NULL\x00").collect()
    }
    assert got == dict(rows)
