"""Z-order (Morton-curve) spatial data layout.

The 100 TB lever the reference cannot have: at scale, WHERE the rows
sit in files decides how much a bbox query reads. Sorting a layer by
the interleaved-bit Morton key clusters spatially-near rows into the
same files/row-groups, so parquet min/max statistics on plain x/y
columns prune most of the table for any bbox predicate — no spatial
index required, which is exactly how lakehouse engines (Delta OPTIMIZE
ZORDER, Iceberg sort orders) solve this.

The key is a PURE Catalyst expression (unrolled shift/mask interleave
— whole-stage codegen, no UDF), so it can be computed in the write
path of any table at any scale; ``write_zordered`` materializes the
layout with a range-partitioned sort (one exchange, the same shuffle
a plain sorted write costs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # 16 bits/axis -> 32-bit key: cell ~ extent/65536 per axis


def quantize_expr(
    col: Column, lo: float, hi: float, bits: int = ZBITS
) -> Column:
    """Map [lo, hi] to integer [0, 2^bits): equal-width quantization,
    top edge clamped into the last cell."""
    n = 1 << bits
    step = (hi - lo) / n
    return F.least(
        F.greatest(
            F.floor((col - F.lit(lo)) / F.lit(step)).cast("long"), F.lit(0)
        ),
        F.lit(n - 1),
    )


def zorder_key_expr(
    x: Column,
    y: Column,
    bounds: dict,
    bits: int = ZBITS,
) -> Column:
    """Morton key: bit i of the quantized x lands at output bit 2i+1,
    of y at 2i — an unrolled sum of shift/mask terms (pure codegen
    arithmetic, mirrored verbatim by the DuckDB oracle)."""
    xq = quantize_expr(x, bounds["xmin"], bounds["xmax"], bits)
    yq = quantize_expr(y, bounds["ymin"], bounds["ymax"], bits)
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key + (
            F.shiftleft(F.shiftright(xq, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ) + (
            F.shiftleft(F.shiftright(yq, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return key


def zorder_key_sql(
    x: str, y: str, bounds: dict, bits: int = ZBITS
) -> str:
    """The SAME key as ANSI SQL (DuckDB oracle mirror), term-for-term."""
    n = 1 << bits

    def q(col: str, lo: float, hi: float) -> str:
        step = (hi - lo) / n
        return (
            f"LEAST(GREATEST(CAST(FLOOR(({col} - {lo!r}) / {step!r}) "
            f"AS BIGINT), 0), {n - 1})"
        )

    xq = q(x, bounds["xmin"], bounds["xmax"])
    yq = q(y, bounds["ymin"], bounds["ymax"])
    terms = []
    for i in range(bits):
        terms.append(f"((({xq} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({yq} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


def write_zordered(
    df: DataFrame,
    path: str,
    bounds: dict,
    x_col: str = "x",
    y_col: str = "y",
    n_files: int = 8,
    bits: int = ZBITS,
    curve: str = "morton",
) -> None:
    """Materialize the layer space-filling-curve ordered:
    range-partition by the curve key into ``n_files`` output files,
    sorted within each — ONE exchange, after which every file covers
    a compact curve segment and its parquet x/y min/max stats prune
    bbox scans. ``curve='hilbert'`` swaps the Morton key for the
    Hilbert key (tighter per-file bboxes, same write cost)."""
    if curve not in ("morton", "hilbert"):
        raise ValueError("curve must be 'morton' or 'hilbert'")
    key = zorder_key_expr if curve == "morton" else hilbert_key_expr
    keyed = df.withColumn(
        "_z", key(F.col(x_col), F.col(y_col), bounds, bits)
    )
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def hilbert_key_expr(
    x: Column,
    y: Column,
    bounds: dict,
    bits: int = ZBITS,
) -> Column:
    """Hilbert-curve layout key over the same quantized cells as
    ``zorder_key_expr`` — the stronger locality alternative: unlike
    Morton order, CONSECUTIVE Hilbert keys are always grid-adjacent
    (no diagonal jumps across the map), so range-partitioned sorting
    by this key packs tighter bboxes per file and parquet min/max
    pruning discards more row groups for the same bbox query (the
    reason Databricks moved OPTIMIZE from Z-order to Hilbert).

    The classic xy2d bit-level rotation walk expressed as ONE
    higher-order fold over the per-level step sizes — a pure Catalyst
    expression carrying a 3-field struct (hx, hy, d) through
    ``bits`` steps; no UDF, no join, no shuffle. The DuckDB oracle
    re-derives the same walk with a recursive CTE — two independent
    formulations of the rotation must agree bit-for-bit.
    """
    xq = quantize_expr(x, bounds["xmin"], bounds["xmax"], bits)
    yq = quantize_expr(y, bounds["ymin"], bounds["ymax"], bits)
    steps = F.array(
        *[F.lit(1 << b).cast("long") for b in range(bits - 1, -1, -1)]
    )
    init = F.struct(
        xq.cast("long").alias("hx"),
        yq.cast("long").alias("hy"),
        F.lit(0).cast("long").alias("d"),
    )

    def step(acc, s):
        rx = F.when(acc["hx"].bitwiseAND(s) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        ry = F.when(acc["hy"].bitwiseAND(s) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        new_d = acc["d"] + s * s * (rx * 3).bitwiseXOR(ry)
        inv = s - F.lit(1).cast("long")
        # ry == 0: flip when rx == 1, then swap axes; ry == 1: no-op
        new_x = F.when(
            ry == 0, F.when(rx == 1, inv - acc["hy"]).otherwise(acc["hy"])
        ).otherwise(acc["hx"])
        new_y = F.when(
            ry == 0, F.when(rx == 1, inv - acc["hx"]).otherwise(acc["hx"])
        ).otherwise(acc["hy"])
        return F.struct(
            new_x.alias("hx"), new_y.alias("hy"), new_d.alias("d")
        )

    return F.aggregate(steps, init, step)["d"]
