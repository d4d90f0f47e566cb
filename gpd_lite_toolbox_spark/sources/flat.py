"""CSV and ORC corpus sources/sinks — the remaining flat interchange
formats a data platform receives at its edges (JSONL lives in
sources/jsonl.py; parquet is the engine's native layout).

Not in the reference (gpd_lite_toolbox reads shapefiles/SpatiaLite,
core.py:423-463). Same contract as the JSONL pair: the schema is
PINNED on read (Spark's CSV/JSON inference is a full extra pass over
the data at 100 TB), and content must survive the format's quoting and
escaping byte-exactly — the round-trip queries hash-gate text against
the parquet-sourced oracle, and the adversarial pytest pushes commas,
quotes, newlines, and unicode through the codec.

CSV specifics: Spark's writer quotes fields containing the delimiter/
quote and escapes quotes by doubling (``escape`` set to the quote
character — RFC-4180 style, what every external reader expects, rather
than Spark's legacy backslash default); the reader is configured with
``multiLine`` so embedded newlines survive. Known dialect limitation:
NULL serializes as the UNQUOTED sentinel (default ``\\N``), so a text
value that IS exactly that sentinel cannot round-trip (it reads back
as NULL) — pick a ``null_value`` outside your value domain if that
can occur. ORC is a self-describing columnar format — ``read_orc``
accepts a schema for contract symmetry but the footer is
authoritative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_CSV_SHARED = {
    "header": "true",
    "quote": '"',
    "escape": '"',
    # empty string and NULL are distinct values in a corpus; keep them
    # distinguishable: NULL serializes UNQUOTED as \N, empty string
    # serializes QUOTED as "" (writer emptyValue), and the reader maps
    # unquoted \N back to NULL while a quoted empty field parses to ""
    # by default (the reader must NOT set emptyValue — that option is
    # the replacement STRING for empty fields on read).
    "nullValue": "\\N",
    # Spark's CSV writer trims cell whitespace by default
    # (ignore*WhiteSpace=true on write); corpus text is payload, not
    # formatting — preserve it on both sides.
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
}
_CSV_WRITE = {**_CSV_SHARED, "emptyValue": '""'}
_CSV_READ = {**_CSV_SHARED, "multiLine": "true"}


def write_csv(
    df: DataFrame,
    path: str,
    compression: str | None = None,
    null_value: str = "\\N",
) -> None:
    """RFC-4180-style CSV sink (header, doubled-quote escaping), one
    file per partition. ``null_value`` is the unquoted NULL sentinel —
    choose one outside the value domain (see module docstring)."""
    w = df.write.mode("overwrite")
    for k, v in {**_CSV_WRITE, "nullValue": null_value}.items():
        w = w.option(k, v)
    if compression:
        w = w.option("compression", compression)
    w.csv(path)


def read_csv(
    spark: SparkSession, path: str, schema, null_value: str = "\\N"
) -> DataFrame:
    """Read CSV with an explicit schema (no inference pass) and the
    sink's quoting dialect; ``null_value`` must match the writer's."""
    r = spark.read.schema(schema)
    for k, v in {**_CSV_READ, "nullValue": null_value}.items():
        r = r.option(k, v)
    return r.csv(path)


def write_orc(df: DataFrame, path: str) -> None:
    """Native ORC sink (columnar, footer statistics — Spark pushes
    predicates into ORC scans the same way it does for parquet)."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Read ORC. The file footer is self-describing; pass ``schema``
    only to pin the projected columns/types explicitly (contract
    symmetry with the CSV/JSONL readers)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def write_xml(df: DataFrame, path: str, row_tag: str = "row") -> None:
    """Native XML sink (Spark 4 absorbed spark-xml into core): one
    ``<row_tag>`` element per record, fields as child elements, markup
    characters entity-escaped by the writer. NULL fields are OMITTED
    from the element while empty strings serialize as an empty child —
    so the NULL/empty distinction survives, mirroring the CSV dialect's
    sentinel contract. Dialect limitation (loud, not silent): XML 1.0
    cannot represent control characters (0x00-0x08, 0x0B/0x0C,
    0x0E-0x1F) — the writer REJECTS such rows at write time rather
    than emitting unparseable markup; strip or escape them upstream if
    your corpus can contain them."""
    df.write.mode("overwrite").format("xml").option("rowTag", row_tag).save(
        path
    )


def read_xml(
    spark: SparkSession, path: str, schema, row_tag: str = "row"
) -> DataFrame:
    """Read XML with an explicit schema (no inference pass — XML
    inference reads everything twice at 100 TB) and
    ``ignoreSurroundingSpaces`` disabled: corpus text is payload, and
    the default trimming would silently eat leading/trailing
    whitespace (the same reasoning as the CSV reader's
    ignore*WhiteSpace=false)."""
    return (
        spark.read.format("xml")
        .schema(schema)
        .option("rowTag", row_tag)
        .option("ignoreSurroundingSpaces", "false")
        .load(path)
    )
