"""Choropleth classification schemes as DATA operators.

The reference defers classification to geopandas/mapclassify inside
its plotting shims (``utils_carto.py:113-117`` calls
``_mapclassify_choro(values, scheme, k)``); the plots themselves are
out of engine scope (SURVEY.md §2.2), but the classification step is a
data transform users of the reference rely on, so the two standard
deterministic schemes ship here:

- ``classify_quantiles``: k quantile classes via ``ntile`` over a
  deterministic total order (value, then id — ties never flap between
  partitionings or engines).
- ``classify_equal_interval``: k equal-width classes over the global
  [min, max] span, degenerate all-equal span guarded (one class).

Scale note: quantile classification is a GLOBAL ordering — the ntile
window is a single-partition sort, correct for the reference's use
(cartography: k <= 9 classes over map-sized feature tables, bounded
like the cartogram family). For billion-row classification switch to
approx_percentile boundaries + a broadcast range join; the exact
operator here is the oracle-checkable reference semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def classify_quantiles(
    df: DataFrame, value_col: str, k: int, id_col: str = "id"
) -> DataFrame:
    """(id, value, cls) with cls in 1..k by ntile over (value, id)."""
    w = Window.orderBy(F.col(value_col).asc(), F.col(id_col).asc())
    return df.select(
        F.col(id_col).alias("id"),
        F.col(value_col).cast("double").alias("value"),
        F.ntile(int(k)).over(w).alias("cls"),
    )


def classify_equal_interval(
    df: DataFrame, value_col: str, k: int, id_col: str = "id"
) -> DataFrame:
    """(id, value, cls) with cls in 0..k-1 by equal-width bins over
    the global span; the top edge folds into the last class and an
    all-equal column yields a single class 0 (no division by zero
    under ANSI mode)."""
    v = F.col(value_col).cast("double")
    bounds = df.agg(
        F.min(v).alias("_lo"), F.max(v).alias("_hi")
    )
    width = (F.col("_hi") - F.col("_lo")) / float(k)
    cls = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((v - F.col("_lo")) / width).cast("int"),
            F.lit(int(k) - 1),
        )
    )
    return df.crossJoin(F.broadcast(bounds)).select(
        F.col(id_col).alias("id"),
        v.alias("value"),
        cls.cast("int").alias("cls"),
    )
