"""Random projection (Johnson-Lindenstrauss) for embedding columns.

Extension beyond gpd_lite_toolbox (LLM-pipeline family): dimensionality
reduction is the standard pre-pass before clustering / ANN indexing at
corpus scale — a signed (Achlioptas) JL projection preserves pairwise
distances within (1 +/- eps) while cutting vector bytes k/d-fold, and
unlike PCA it needs NO fit pass over the data (the matrix is a pure
function of (dim, out_dim)), so it runs as a stateless projection on
any corpus slice, batch or streaming.

Semantics (mirrored exactly by oracles.JL_PROJECT): the projection
matrix entry s(d, j) is +1 or -1 from the parity of an md5-derived
integer — deterministic, derivable on both engines, shipped as plan
literals (hashing per row would recompute values that never change,
the same driver-side-literal discipline as ann.lsh_bands). Output
element j is ``(sum_d x_d * s(d, j)) * (1 / sqrt(out_dims))`` with the
sum unrolled left-to-right, so Spark's codegen and DuckDB evaluate the
IDENTICAL float operation sequence: with +/-1 factors every term is
exact and the result is bit-identical cross-engine before any
rounding.

Scale shape: one zero-shuffle native projection — k x d literal
multiply-adds per row inside whole-stage codegen, no Python, no
exchange; column pruning reaches the scan (only id + vector read).
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def jl_sign(dim: int, out_dim: int) -> float:
    """Deterministic +/-1.0 projection-matrix entry: parity of an
    md5-derived integer over the (dim, out_dim) cell label."""
    h = int(hashlib.md5(f"jl{out_dim}_{dim}".encode()).hexdigest()[:8], 16)
    return 1.0 if h % 2 == 0 else -1.0


def random_projection(
    vectors: DataFrame,
    out_dims: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
) -> DataFrame:
    """(id, proj): signed JL projection of ``vec_col`` down to
    ``out_dims`` dimensions (``array<double>``).

    ``dims`` is probed from one non-null row when not given — an
    unrolled sum shorter than the vectors would silently project a
    prefix. NULL vectors project to NULL.
    """
    if out_dims <= 0:
        raise ValueError("out_dims must be positive")
    if dims is None:
        first = (
            vectors.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
        )
        dims = 1 if first is None else len(first[0])
    scale = 1.0 / math.sqrt(out_dims)
    # The k x d sign matrix ships as ONE literal array-of-arrays and
    # the per-element sum is a higher-order fold — a fully unrolled
    # k*d expression tree compiles past the JVM's 64 KB method limit
    # (codegen then falls back to interpreted eval with an ERROR in
    # the log), while this form stays compact at any (k, d). The fold
    # seeds at 0.0 and adds terms left-to-right; the oracle mirrors
    # the seed so the operation sequence is identical.
    sign_mat = F.array(
        *[
            F.array(*[F.lit(jl_sign(d, j)) for d in range(dims)])
            for j in range(out_dims)
        ]
    )
    vec_d = F.slice(
        F.transform(F.col(vec_col), lambda x: x.cast("double")), 1, dims
    )
    proj = F.transform(
        sign_mat,
        lambda signs: F.aggregate(
            F.zip_with(vec_d, signs, lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        * F.lit(scale),
    )
    proj = F.when(F.col(vec_col).isNull(), F.lit(None)).otherwise(proj)
    return vectors.select(
        F.col(id_col).alias("id"), proj.alias("proj")
    )
