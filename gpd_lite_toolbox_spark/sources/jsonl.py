"""JSONL corpus source/sink — the interchange format of text-pipeline
tooling (one JSON document per line, newline-delimited).

Not in the reference (gpd_lite_toolbox reads shapefiles/SpatiaLite,
core.py:423-463); this is the corpus-ingest sibling of the geo
sources: a 100 TB document pipeline receives and emits JSONL at its
edges, and the engine-side contract is (a) the schema is PINNED on
read — Spark's schema inference is a full extra pass over the data —
and (b) content survives JSON string escaping byte-exactly (the
round-trip query hash-gates text through md5 on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """Write one JSON object per row, newline-delimited (Spark's
    native json sink — one file per partition, safe to re-read in
    parallel)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    """Read newline-delimited JSON with an explicit schema. ``schema``
    is a DDL string or StructType; pinning it skips the inference scan
    (a second full read at scale) and makes missing fields explicit
    NULLs instead of silently widening the schema."""
    return spark.read.schema(schema).json(path)
