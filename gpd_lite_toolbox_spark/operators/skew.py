"""Explicit skew mitigation: deterministic salted equi-join.

AQE's runtime skew-join splitting handles most hot keys on batch
plans, but three places still need the MANUAL form: stream-stream
joins (no AQE in stateful streaming), joins feeding an operator that
requires a stable pre-partitioning, and any engine/config where
adaptive execution is off. This module is that form, as an operator
with the same output contract as the plain join (declared query
hash-gates it against the unsalted SQL join).

Mechanics: each left row draws a deterministic salt in [0, n_salt)
from a hash of its columns, the (small) right side replicates
``n_salt`` times, and the join key becomes (key, salt) — a hot key's
rows now spread over ``n_salt`` reducers instead of one. Cost: the
right side is materialized n_salt times (choose n_salt ~ the worst
observed key share x parallelism, not thousands).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def row_salt(columns: "list[str]", n_salt: int) -> "F.Column":
    """The deterministic per-row salt ``salted_join`` assigns: hash of
    ALL the row's columns mod ``n_salt``. Exposed so tests (and any
    caller pre-partitioning by the same scheme) exercise the exact
    expression the join uses — identical full rows share a salt (they
    would land together under any row-deterministic scheme; a
    duplicate-heavy hot key needs dedup first, not salt)."""
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in columns]), F.lit(int(n_salt))
    ).cast("int")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: "list[str] | str",
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side salted and the right side
    replicated; result rows are exactly the plain join's (each left
    row joins the one right replica carrying its salt). ``how``
    supports the join types where replication preserves semantics:
    inner and left (a right/full join would multiply unmatched right
    rows per salt)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if isinstance(on, str):
        on = [on]
    if "_salt" in left.columns or "_salt" in right.columns:
        # withColumn would silently overwrite and drop the user's data
        raise ValueError("salted_join reserves the column name '_salt'")
    salted_left = left.withColumn("_salt", row_salt(left.columns, n_salt))
    replicated_right = right.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(int(n_salt))])),
    )
    return salted_left.join(
        replicated_right, on + ["_salt"], how
    ).drop("_salt")


def skew_stats(
    df: DataFrame, key_col: str, top_k: int = 10
) -> DataFrame:
    """Join-key skew diagnostic — the report that decides BETWEEN the
    mitigation strategies this module and AQE offer: per-key row
    counts summarized as the share of total rows held by each of the
    ``top_k`` hottest keys, plus that key's multiple of the mean key
    size. A key holding >~5% of rows (or >>10x the mean) is the salt
    /broadcast candidate; a flat report says plain hash join is fine.

    Columns: ``(rnk, key, n_rows, frac_of_total, x_mean)`` —
    ``key`` stringified so the report is schema-stable across key
    types; ``rnk`` the 1-based hotness rank (count desc, key asc).

    Scale shape: per-key counts partial-combine map-side (a hot key
    arrives at the exchange as one row per partition — counting is
    never itself skewed); the top-k is a global TakeOrdered over
    |keys| rows, and the totals are a one-row broadcast. Nothing
    driver-side."""
    counts = (
        df.select(F.col(key_col).cast("string").alias("key"))
        .groupBy("key")
        .agg(F.count("*").alias("n_rows"))
    )
    tot = counts.agg(
        F.sum("n_rows").alias("_tot"),
        F.count("*").alias("_nkeys"),
    )
    # NULL keys sort LAST on the tiebreak (asc_nulls_last) — Spark's
    # ascending default is NULLS FIRST, DuckDB's is NULLS LAST; a NULL
    # join key is exactly the hot-key case this report exists for, so
    # the ordering must be pinned, not dialect-default.
    top = (
        counts.orderBy(F.col("n_rows").desc(), F.col("key").asc_nulls_last())
        .limit(int(top_k))
    )
    w = Window.orderBy(F.col("n_rows").desc(), F.col("key").asc_nulls_last())
    return (
        top.crossJoin(F.broadcast(tot))
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .select(
            "rnk",
            "key",
            "n_rows",
            F.round(F.col("n_rows") / F.col("_tot").cast("double"), 6).alias(
                "frac_of_total"
            ),
            F.round(
                F.col("n_rows")
                / (F.col("_tot") / F.col("_nkeys").cast("double")),
                6,
            ).alias("x_mean"),
        )
    )
