"""WARC source/sink — the archive format crawl-scale corpora arrive
in (Common Crawl ships WARC; an LLM-data engine's very first read is
usually a WARC segment, not a parquet table).

Minimal self-contained WARC/1.0 implementation (the container carries
no warcio): records are length-prefixed (``Content-Length`` counts
payload BYTES), so parsing is exact for arbitrary content — no
delimiter scanning inside payloads, any byte sequence round-trips.

Scale shape: one ``.warc`` file per input partition on write (the
standard crawl layout — thousands of ~1 GB segments), and on read
``binaryFile`` lists the segments as one row each, so parallelism is
per-file exactly like every WARC processor (the format is not
splittable mid-file; real deployments size segments accordingly).
Record parsing runs in Arrow-batched ``mapInPandas`` — bytes never
visit the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_READ_SCHEMA = "record_id string, uri string, text string"


def _record_bytes(record_id: str, uri: str, text: "str | None") -> bytes:
    payload = b"" if text is None else text.encode("utf-8")
    # headers are line-oriented: a CR/LF smuggled through the id or
    # uri would terminate the block early and corrupt the framing —
    # loud error, never a silently-corrupt segment
    for field, value in (("record id", record_id), ("uri", uri)):
        if "\r" in value or "\n" in value:
            raise ValueError(f"WARC {field} may not contain CR/LF: {value!r}")
    headers = [
        "WARC/1.0",
        "WARC-Type: conversion",
        f"WARC-Record-ID: <{record_id}>",
        f"WARC-Target-URI: {uri}",
        "Content-Type: text/plain; charset=utf-8",
        f"Content-Length: {len(payload)}",
    ]
    if text is None:  # NULL is not the empty document; flag it
        headers.insert(5, "X-Null-Text: 1")
    # UTF-8, not ascii: WARC/1.0 headers are UTF-8-legal and ids/uris
    # are user-supplied
    head = ("\r\n".join(headers) + "\r\n\r\n").encode("utf-8")
    return head + payload + b"\r\n\r\n"


def write_warc(
    df: DataFrame,
    path: str,
    id_col: str = "id",
    text_col: str = "text",
    uri_prefix: str = "https://example.invalid/doc/",
    compression: "str | None" = None,
) -> DataFrame:
    """Write ``(id, text)`` rows as WARC conversion records, one
    ``.warc`` segment per partition under ``path`` (which must be a
    filesystem all executors share — the contract of every file sink).
    ``compression='gzip'`` writes ``.warc.gz`` segments (whole-segment
    gzip — how crawl archives actually ship; still one file per
    partition, still unsplittable, which is the format's own story).
    Record IDs are ``urn:spark-graft:<id>``. Returns the per-segment
    manifest ``(file, n_records)`` as a driver-materialized DataFrame
    (one row per partition, bounded), so re-using the manifest can
    never re-trigger the write. Overwrite semantics: pre-existing
    ``.warc`` segments at ``path`` are removed first (a re-run with
    fewer partitions must not leave stale segments for ``read_warc``
    to silently mix back in). Task attempts write a temp file and
    ``os.replace`` it into place, so a speculative or retried attempt
    leaves one complete segment, never interleaved bytes."""
    import glob
    import gzip
    import os

    if compression not in (None, "gzip"):
        raise ValueError(f"unsupported compression: {compression!r}")
    # The sink lists/deletes/commits with driver-local os/glob calls
    # while executors os.replace segments into place — correct ONLY on
    # a POSIX filesystem every node shares. A URI path (s3://, hdfs://,
    # file:// ...) would scatter segments to executor-local disks and
    # silently no-op the stale-segment cleanup, so reject it outright;
    # object-store deployments should route through the Hadoop
    # FileSystem API (a different sink, not a silent fallback).
    if "://" in path:
        raise ValueError(
            f"write_warc requires a shared-POSIX filesystem path, got "
            f"URI {path!r}: listing/cleanup/commit use driver-local "
            f"os/glob and executor-local os.replace"
        )
    suffix = ".warc.gz" if compression == "gzip" else ".warc"
    os.makedirs(path, exist_ok=True)
    for stale in glob.glob(os.path.join(path, "*.warc")) + glob.glob(
        os.path.join(path, "*.warc.gz")
    ):
        os.remove(stale)

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        fname = os.path.join(path, f"part-{ctx.partitionId():05d}{suffix}")
        tmp = f"{fname}.{ctx.taskAttemptId()}.tmp"
        opener = gzip.open if compression == "gzip" else open
        n = 0
        with opener(tmp, "wb") as fh:
            for pdf in batches:
                for rid, text in zip(pdf["_id"], pdf["_text"]):
                    fh.write(
                        _record_bytes(
                            f"urn:spark-graft:{rid}",
                            f"{uri_prefix}{rid}",
                            None if text is None else str(text),
                        )
                    )
                    n += 1
        if n == 0:  # empty partition: no segment file
            os.remove(tmp)
            return
        os.replace(tmp, fname)  # atomic commit of a COMPLETE segment
        yield pd.DataFrame({"file": [fname], "n_records": [n]})

    from pyspark.sql import functions as F

    src = df.select(
        F.col(id_col).cast("string").alias("_id"),
        F.col(text_col).alias("_text"),
    )
    plan = src.mapInPandas(_write, "file string, n_records long")
    rows = plan.collect()  # the write happens NOW, exactly once
    return df.sparkSession.createDataFrame(
        rows, "file string, n_records long"
    )


def _parse_warc_blob(blob: bytes) -> "list[tuple[str, str, str | None]]":
    out = []
    pos = 0
    n = len(blob)
    while pos < n:
        head_end = blob.find(b"\r\n\r\n", pos)
        if head_end < 0:
            # leftover bytes with no complete header block: a segment
            # cut mid-record must fail LOUDLY, not drop records
            if blob[pos:].strip(b"\r\n"):
                raise ValueError(
                    f"truncated WARC segment: {n - pos} trailing bytes "
                    "with no complete record header"
                )
            break
        headers: dict[str, str] = {}
        for line in blob[pos:head_end].decode("utf-8").split("\r\n")[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers["content-length"])
        if head_end + 4 + length > n:
            raise ValueError(
                "truncated WARC segment: payload shorter than its "
                f"Content-Length ({length})"
            )
        payload = blob[head_end + 4 : head_end + 4 + length]
        rid = headers.get("warc-record-id", "").strip("<>")
        uri = headers.get("warc-target-uri", "")
        text = (
            None
            if headers.get("x-null-text") == "1"
            else payload.decode("utf-8")
        )
        out.append((rid, uri, text))
        pos = head_end + 4 + length + 4  # payload + closing \r\n\r\n
    return out


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC segments under ``path`` into
    ``(record_id, uri, text)`` — ``binaryFile`` listing (one row per
    segment, parallel across segments) + Arrow-batched record
    parsing. Only the minimal conversion-record profile written by
    ``write_warc`` is parsed; response records with HTTP blocks need
    the block split added here. A path with no segments (an upstream
    filter drained to zero rows) reads as an empty DataFrame, matching
    the write/read round-trip contract."""
    from pyspark.errors import AnalysisException

    try:
        # the {} glob covers plain and gzip'd segments in one listing
        files = spark.read.format("binaryFile").load(
            f"{path}/*.{{warc,warc.gz}}"
        )
    except AnalysisException as e:
        # PATH_NOT_FOUND only: zero segments is a legal empty corpus.
        # Any other analysis failure must propagate — an unreadable
        # segment directory silently serving an EMPTY corpus would
        # vanish the input of every downstream pass.
        from ..errors import is_path_not_found

        if not is_path_not_found(e):
            raise
        return spark.createDataFrame([], _READ_SCHEMA)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip

        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                raw = bytes(blob)
                if raw[:2] == b"\x1f\x8b":  # gzip magic: compressed segment
                    raw = gzip.decompress(raw)
                rows.extend(_parse_warc_blob(raw))
            yield pd.DataFrame(
                rows, columns=["record_id", "uri", "text"]
            )

    return files.select("content").mapInPandas(_parse, _READ_SCHEMA)
