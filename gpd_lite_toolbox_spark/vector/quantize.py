"""Embedding quantization: per-vector symmetric int8.

Extension beyond gpd_lite_toolbox (LLM-pipeline family): an embedding
store at 100 TB ships vectors to trainers and ANN indexes as int8 —
4x smaller than float32 with ~0.4% max error — quantized per vector so
outlier rows don't crush everyone else's resolution.

Semantics (mirrored exactly by oracles.QUANTIZE_INT8): each float
element is cast to double, ``scale = max(|v|) / 127``, and
``q_i = floor(v_i / max(scale, 1e-30) + 0.5)`` — round-half-up in
closed form, so Spark and DuckDB agree bit-for-bit and |q_i| <= 127 by
construction (the epsilon guard only matters for all-zero vectors,
which quantize to zeros with scale 0). Everything is native array
expressions in one zero-shuffle projection.

Note on plan shape: Catalyst's project collapse inlines the ``scale``
subexpression into every element of the transform, making the
projection O(d^2) per row in expression evaluations. At d=64 that is
~4k flops per row — noise next to scan IO at any scale — so the clean
declarative form is kept rather than forcing a materialization barrier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EPS = 1e-30


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, dims, scale, qvec): per-vector symmetric int8 quantization.

    ``qvec`` is ``array<int>`` with every element in [-127, 127];
    reconstruct with ``q_i * scale``.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    raw_scale = F.array_max(F.transform(v, F.abs)) / F.lit(127.0)
    scale = raw_scale.alias("scale")
    safe = F.greatest(raw_scale, F.lit(_EPS))
    q = F.transform(v, lambda x: F.floor(x / safe + F.lit(0.5)).cast("int"))
    return df.select(
        F.col(id_col).alias("id"),
        F.size(F.col(vec_col)).alias("dims"),
        scale,
        q.alias("qvec"),
    )


def dequantize_expr(qvec: Column, scale: Column) -> Column:
    """``array<double>`` reconstruction of a quantized vector."""
    return F.transform(qvec, lambda x: x.cast("double") * scale)
