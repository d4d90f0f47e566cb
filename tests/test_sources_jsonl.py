"""JSONL source/sink: byte-exact text round-trip through JSON string
escaping for adversarial content (quotes, backslashes, newlines,
tabs, control chars, CJK, emoji, lone-accent combining marks), plus
the pinned-schema contract (missing fields -> explicit NULLs)."""

from __future__ import annotations

from gpd_lite_toolbox_spark.sources.jsonl import read_jsonl, write_jsonl

NASTY = [
    'plain ascii',
    'double "quotes" inside',
    "back\\slash and \\\\double",
    'newline\nand\r\ncarriage',
    'tab\tseparated\tfields',
    'control \x01 \x1f chars',
    'null-ish literals null true false NaN',
    '中文文本 with CJK',
    'emoji 🎉🚀 and zwj 👩‍💻',
    'combining áccént',
    'json-looking {"k": [1, 2]}',
    '',
]


def test_jsonl_roundtrip_preserves_adversarial_text(spark, tmp_path):
    rows = [(i, s) for i, s in enumerate(NASTY)]
    df = spark.createDataFrame(rows, "id long, text string")
    path = str(tmp_path / "nasty")
    write_jsonl(df, path)
    back = read_jsonl(spark, path, "id long, text string")
    got = {r.id: r.text for r in back.collect()}
    assert got == dict(rows)


def test_jsonl_pinned_schema_fills_missing_fields_with_null(spark, tmp_path):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    path = str(tmp_path / "narrow")
    write_jsonl(df, path)
    back = read_jsonl(
        spark, path, "id long, text string, extra string, n bigint"
    ).collect()
    assert len(back) == 1
    assert back[0].extra is None and back[0].n is None
    assert back[0].text == "x"
