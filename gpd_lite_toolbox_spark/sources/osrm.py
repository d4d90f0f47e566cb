"""Live OSRM table-service client (reference core.py:906-912).

The reference's ``access_isocrone`` issues ONE driver-side HTTP request
to an OSRM ``/table`` endpoint (one origin x N grid destinations) and
reads ``durations`` out of the JSON. That shape is reproduced here on
the stdlib only (urllib — no HTTP deps ship in this image), plus the
shape the reference cannot do: ``osrm_times_distributed`` fans the
destination table out per PARTITION, each worker batching its own
``/table`` call, so a million-destination matrix never serializes
through the driver — request count scales with partitions, payload per
request stays bounded, and the result is a DataFrame ready for the
isochrone operators (pt_id, x, y, time_s — the osrm_matrix fixture
schema).

Tests run against a local ``http.server`` mock (SURVEY §5.5: no
network in CI); the URL scheme is the public OSRM HTTP API v1.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: sentinel the isochrone filter drops (core.py:916)
OSRM_UNREACHABLE = 2147483647


def osrm_table_url(
    base_url: str,
    origin: tuple[float, float],
    dests: Sequence[tuple[float, float]],
    profile: str = "driving",
) -> str:
    """OSRM v1 /table URL: origin first, sources=0, durations only."""
    coords = ";".join(
        f"{lon:.6f},{lat:.6f}" for lon, lat in [origin, *dests]
    )
    q = urllib.parse.urlencode(
        {"sources": "0", "annotations": "duration"}
    )
    return f"{base_url.rstrip('/')}/table/v1/{profile}/{coords}?{q}"


def osrm_table_times(
    base_url: str,
    origin: tuple[float, float],
    dests: Sequence[tuple[float, float]],
    profile: str = "driving",
    timeout: float = 30.0,
) -> list[float]:
    """One blocking /table request: durations (seconds) from ``origin``
    to each of ``dests`` (origin's self-duration dropped). ``None``
    durations (unroutable) become OSRM_UNREACHABLE so the isochrone
    sentinel filter handles them uniformly."""
    url = osrm_table_url(base_url, origin, dests, profile)
    with urllib.request.urlopen(url, timeout=timeout) as resp:
        payload = json.load(resp)
    if payload.get("code") != "Ok":
        raise RuntimeError(f"OSRM error: {payload.get('code')!r}")
    row = payload["durations"][0]
    return [
        float(d) if d is not None else float(OSRM_UNREACHABLE)
        for d in row[1:]
    ]


def osrm_times_distributed(
    points: DataFrame,
    base_url: str,
    origin: tuple[float, float],
    profile: str = "driving",
    timeout: float = 30.0,
    id_col: str = "pt_id",
    x_col: str = "x",
    y_col: str = "y",
    batch_size: int = 500,
) -> DataFrame:
    """Travel times for a DISTRIBUTED destination table: each partition
    issues its own batched /table requests (<= ``batch_size``
    destinations per request — public OSRM instances cap coordinate
    counts), emitting (pt_id, x, y, time_s).

    Scale: requests = ceil(rows / batch_size), spread across
    executors; nothing but the origin rides the closure. Repartition
    the input to tune concurrency against the OSRM cluster's QPS
    budget. The output feeds access_isocrone / countour_poly exactly
    like the mocked osrm_matrix fixture."""
    import pandas as pd

    ox, oy = float(origin[0]), float(origin[1])

    def fetch(batches):
        for pdf in batches:
            for s in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[s : s + batch_size]
                dests = list(zip(chunk[x_col], chunk[y_col]))
                times = osrm_table_times(
                    base_url, (ox, oy), dests, profile, timeout
                )
                yield pd.DataFrame(
                    {
                        "pt_id": chunk[id_col].to_numpy(),
                        "x": chunk[x_col].to_numpy(dtype=float),
                        "y": chunk[y_col].to_numpy(dtype=float),
                        "time_s": times,
                    }
                )

    src = points.select(
        F.col(id_col).alias(id_col),
        F.col(x_col).cast("double").alias(x_col),
        F.col(y_col).cast("double").alias(y_col),
    )
    return src.mapInPandas(
        fetch, schema="pt_id bigint, x double, y double, time_s double"
    )
