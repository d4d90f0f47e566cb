"""Unit tests for the crawl-ingestion additions: the WARC codec
(byte-exact round-trips through length-prefixed records) and the HTML
text extraction expression. Their declared queries are hash-gated end
to end by test_oracle_parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _roundtrip(spark, tmp_path, rows):
    from gpd_lite_toolbox_spark.sources.warc import read_warc, write_warc

    df = spark.createDataFrame(rows, "id bigint, text string")
    path = str(tmp_path / "seg")
    manifest = write_warc(df, path)
    back = read_warc(spark, path)
    return manifest, {
        int(r["record_id"].rsplit(":", 1)[1]): r["text"]
        for r in back.collect()
    }


def test_warc_roundtrip_adversarial_payloads(spark, tmp_path):
    """Length-prefixed parsing must survive payloads that LOOK like
    record boundaries: embedded CRLF pairs, a fake WARC header,
    multi-byte unicode (Content-Length counts BYTES), empty text, and
    NULL text (distinct from empty via the null flag header)."""
    rows = [
        (1, "plain doc"),
        (2, "embedded\r\n\r\nWARC/1.0\r\nContent-Length: 999\r\n\r\nfake"),
        (3, "unicode éè 中文 \U0001f600"),
        (4, ""),
        (5, None),
    ]
    manifest, got = _roundtrip(spark, tmp_path, rows)
    assert got == dict(rows)
    assert sum(r["n_records"] for r in manifest.collect()) == 5


def test_warc_segment_per_partition(spark, tmp_path):
    import glob

    from gpd_lite_toolbox_spark.sources.warc import write_warc

    df = spark.range(100).select(
        F.col("id"), F.lit("x").alias("text")
    ).repartition(4)
    path = str(tmp_path / "seg4")
    manifest = write_warc(df, path)
    files = sorted(glob.glob(f"{path}/*.warc"))
    assert len(files) == 4
    assert {r["file"] for r in manifest.collect()} == set(files)


def test_warc_empty_corpus(spark, tmp_path):
    import glob

    from gpd_lite_toolbox_spark.sources.warc import write_warc

    df = spark.createDataFrame([], "id bigint, text string")
    path = str(tmp_path / "empty")
    manifest = write_warc(df, path)
    assert manifest.count() == 0
    assert glob.glob(f"{path}/*.warc") == []  # no zero-record segments


def test_html_to_text_strips_and_decodes(spark):
    from gpd_lite_toolbox_spark.text.web import extract_html_text

    html = (
        "<html><head><style>p {x: 1}</style>"
        "<SCRIPT>if (a < b) { alert('&amp;'); }</SCRIPT></head>"
        "<body><h1>Title</h1>\n<p>one&nbsp;two &lt;tag&gt; "
        "&amp;amp; three</p></body></html>"
    )
    df = spark.createDataFrame([(1, html)], "id bigint, html string")
    row = extract_html_text(df).collect()[0]
    # style+script gone (case-insensitive), tags spaced, entities
    # decoded once (&amp;amp; -> &amp;, never double-decoded to &)
    assert row["text"] == "Title one two <tag> &amp; three"
    assert row["n_chars"] == len(row["text"])


def test_html_to_text_multiline_blocks(spark):
    from gpd_lite_toolbox_spark.text.web import extract_html_text

    html = "<p>keep</p><script>\nline1\nline2\n</script><p>also</p>"
    df = spark.createDataFrame([(1, html)], "id bigint, html string")
    assert extract_html_text(df).collect()[0]["text"] == "keep also"


# ------------------------------------------- review-pass regressions
def test_warc_rewrite_removes_stale_segments(spark, tmp_path):
    """A re-write with fewer partitions must not leave stale segments
    for read_warc to silently mix back in."""
    from gpd_lite_toolbox_spark.sources.warc import read_warc, write_warc

    path = str(tmp_path / "re")
    wide = spark.range(80).select("id", F.lit("old").alias("text"))
    write_warc(wide.repartition(8), path)
    narrow = spark.createDataFrame(
        [(1, "new"), (2, "new")], "id bigint, text string"
    )
    write_warc(narrow.repartition(1), path)
    got = read_warc(spark, path).collect()
    assert len(got) == 2 and all(r["text"] == "new" for r in got)


def test_warc_empty_write_then_read(spark, tmp_path):
    from gpd_lite_toolbox_spark.sources.warc import read_warc, write_warc

    path = str(tmp_path / "drained")
    write_warc(spark.createDataFrame([], "id bigint, text string"), path)
    back = read_warc(spark, path)
    assert back.count() == 0
    assert back.columns == ["record_id", "uri", "text"]


def test_warc_unicode_id_and_crlf_id(spark, tmp_path):
    """Non-ASCII string ids round-trip (UTF-8 headers); CR/LF in an id
    fails loudly instead of corrupting the framing."""
    from py4j.protocol import Py4JJavaError

    from gpd_lite_toolbox_spark.sources.warc import read_warc, write_warc

    path = str(tmp_path / "uni")
    df = spark.createDataFrame([("é1", "accented")], "id string, text string")
    write_warc(df, path)
    got = read_warc(spark, path).collect()[0]
    assert got["record_id"].endswith("é1") and got["text"] == "accented"
    bad = spark.createDataFrame(
        [("a\r\nX", "smuggle")], "id string, text string"
    )
    with pytest.raises((Py4JJavaError, Exception), match="CR/LF"):
        write_warc(bad, str(tmp_path / "bad"))


def test_warc_truncated_segment_fails_loudly(spark, tmp_path):
    import glob

    from py4j.protocol import Py4JJavaError

    from gpd_lite_toolbox_spark.sources.warc import read_warc, write_warc

    path = str(tmp_path / "trunc")
    df = spark.createDataFrame(
        [(i, "payload " * 10) for i in range(5)], "id bigint, text string"
    )
    write_warc(df.repartition(1), path)
    seg = glob.glob(f"{path}/*.warc")[0]
    blob = open(seg, "rb").read()
    open(seg, "wb").write(blob[: len(blob) - 30])  # cut mid-record
    with pytest.raises((Py4JJavaError, Exception), match="truncated"):
        read_warc(spark, path).collect()


def test_warc_gzip_roundtrip_and_mixed_dir(spark, tmp_path):
    """gzip'd segments round-trip; a dir mixing plain and .gz segments
    reads as one corpus (per-file magic-byte detection)."""
    import glob

    from gpd_lite_toolbox_spark.sources.warc import read_warc, write_warc

    path = str(tmp_path / "gz")
    rows = [(1, "alpha"), (2, "unicode é 中文"), (3, None)]
    df = spark.createDataFrame(rows, "id bigint, text string")
    write_warc(df.repartition(1), path, compression="gzip")
    gz = glob.glob(f"{path}/*.warc.gz")
    assert len(gz) == 1
    got = {
        int(r["record_id"].rsplit(":", 1)[1]): r["text"]
        for r in read_warc(spark, path).collect()
    }
    assert got == dict(rows)
    # mix in a PLAIN segment alongside the gzip one
    extra = spark.createDataFrame([(9, "plain")], "id bigint, text string")
    plain_dir = str(tmp_path / "plain")
    write_warc(extra.repartition(1), plain_dir)
    import shutil

    shutil.copy(glob.glob(f"{plain_dir}/*.warc")[0], f"{path}/extra.warc")
    mixed = {
        int(r["record_id"].rsplit(":", 1)[1]): r["text"]
        for r in read_warc(spark, path).collect()
    }
    assert mixed == {**dict(rows), 9: "plain"}


def test_warc_gzip_rewrite_clears_plain_and_bad_compression(spark, tmp_path):
    from gpd_lite_toolbox_spark.sources.warc import read_warc, write_warc

    path = str(tmp_path / "swap")
    df = spark.createDataFrame([(1, "v1")], "id bigint, text string")
    write_warc(df, path)  # plain
    write_warc(df, path, compression="gzip")  # must remove the plain seg
    assert read_warc(spark, path).count() == 1
    with pytest.raises(ValueError, match="compression"):
        write_warc(df, path, compression="zstd")


def test_warc_seeded_fuzz_roundtrip(spark, tmp_path):
    """One-job fuzz: 200 random unicode payloads (control chars, CRLF
    runs, surrogate-adjacent codepoints, empty, NULL) must round-trip
    byte-exactly through the codec."""
    import random

    rng = random.Random(42)
    pool = (
        "abc XYZ 0123 \t\r\n éß中文🙂 <>&\"' \x00\x01\x1f "
        "WARC/1.0 Content-Length: \r\n\r\n"
    )
    rows = []
    for i in range(200):
        if i % 37 == 0:
            rows.append((i, None))
        else:
            rows.append(
                (i, "".join(rng.choice(pool)
                            for _ in range(rng.randrange(0, 120))))
            )
    from gpd_lite_toolbox_spark.sources.warc import read_warc, write_warc

    path = str(tmp_path / "fuzz")
    write_warc(spark.createDataFrame(rows, "id bigint, text string"), path)
    got = {
        int(r["record_id"].rsplit(":", 1)[1]): r["text"]
        for r in read_warc(spark, path).collect()
    }
    assert got == dict(rows)


def test_html_to_text_matches_python_reference_fuzz(spark):
    """One-job fuzz: the Spark expression must agree with an
    independent Python `re` implementation of the same pipeline on
    random tag/entity soup (Java-regex vs python-re dialect check on
    the exact patterns the oracle also runs)."""
    import random
    import re

    from gpd_lite_toolbox_spark.text.web import (
        HTML_ENTITIES,
        HTML_SCRIPT_PATTERN,
        HTML_STYLE_PATTERN,
        HTML_TAG_PATTERN,
        extract_html_text,
    )

    def reference(html: str) -> str:
        t = re.sub(HTML_SCRIPT_PATTERN, " ", html)
        t = re.sub(HTML_STYLE_PATTERN, " ", t)
        t = re.sub(HTML_TAG_PATTERN, " ", t)
        for ent, repl in HTML_ENTITIES:
            t = t.replace(ent, repl)
        return re.sub(r"[ \t\r\n]+", " ", t).strip()

    rng = random.Random(7)
    frags = [
        "<p>", "</p>", "<ScRiPt>", "</script>", "<style a=b>", "</STYLE>",
        "word", "two words", "&amp;", "&lt;", "&nbsp;", "&amp;amp;",
        "\n", "\t", "<", ">", "<br/>", "<a href='x'>", "é🙂", "1 < 2",
    ]
    rows = [
        (i, "".join(rng.choice(frags) for _ in range(rng.randrange(1, 30))))
        for i in range(150)
    ]
    df = spark.createDataFrame(rows, "id bigint, html string")
    got = {r["id"]: r["text"] for r in extract_html_text(df).collect()}
    for i, html in rows:
        assert got[i] == reference(html), html
