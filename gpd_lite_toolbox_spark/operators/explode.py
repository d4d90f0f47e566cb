"""Multi-part explode operators (reference core.py:285-317, 389-420).

``multi_to_single`` is Spark's canonical explode: a pandas-UDF splits a
multi-part WKB into an array of single-part WKBs, then a native
``posexplode`` emits one row per part with attributes duplicated —
exactly the reference's semantics (including single-part passthrough)
with no driver loop. ``dumb_multi_to_single`` keeps only the first part
(reference's row-count-preserving variant), a pure projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geometry.functions import st_parts


def multi_to_single(gdf: DataFrame, geometry: str = "geometry") -> DataFrame:
    """One output row per part; ``part_idx`` added for deterministic
    downstream ordering (the reference reindexes 0..n, core.py:315)."""
    others = [c for c in gdf.columns if c != geometry]
    parts = gdf.select(*others, st_parts(geometry).alias("_parts"))
    return parts.select(
        *others,
        F.posexplode("_parts").alias("part_idx", geometry),
    )


def dumb_multi_to_single(gdf: DataFrame, geometry: str = "geometry") -> DataFrame:
    """Replace each geometry by its first part (core.py:389-420)."""
    others = [c for c in gdf.columns if c != geometry]
    return gdf.select(
        *others, F.element_at(st_parts(geometry), 1).alias(geometry)
    )
