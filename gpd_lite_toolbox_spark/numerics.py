"""Cross-engine-exact numeric recipes shared by the relational-ML
family (lr_train_gd, group_trend, kmeans-adjacent gates).

Two engine-difference lessons, captured once (discovered building the
LR gate, round 6 — see PLANS.md):

1. DOUBLE aggregate sums are partition-order-dependent in the last
   ulp; when a rounded average lands on a 6-decimal midpoint the two
   engines split. ``qdec`` quantizes the summand to the 6-decimal
   lattice and casts losslessly to DECIMAL, where SUM is exact and
   order-independent in both Spark and DuckDB.
2. Even on bit-identical doubles, Spark ROUND (HALF_UP over the
   double's exact decimal expansion) and DuckDB round (scaled
   multiply) disagree within an ulp of a half-way point. ``r6`` shifts
   by 1e-9 before rounding — both sides of a gate use the same shift,
   so identical inputs land where every implementation agrees (the
   PPJoin exact-ceil recipe applied to rounding).
"""

from __future__ import annotations

from pyspark.sql import functions as F

R6_EPS = 1e-9


def r6(col, d: int = 6):
    """Engine-stable rounding: round(col + 1e-9, d)."""
    return F.round(col + F.lit(R6_EPS), d)


def qdec(col, d: int = 6):
    """Exact lattice summand: shift-round in double, lossless cast to
    DECIMAL(14,6) (contract: |value| < 1e8). decimal x decimal
    products stay exact at (29,12)."""
    if isinstance(col, str):
        col = F.col(col)
    return r6(col, d).cast("decimal(14,6)")


def dsum(col):
    """Exact decimal SUM handed to double through ONE deterministic
    rounding: rescale the (exact) sum to scale 6 first — a
    decimal-to-decimal rounding both engines perform identically on
    identical exact inputs — THEN cast to double, where a scale-6
    value of magnitude < ~9e9 converts correctly-rounded in both
    engines. Casting a scale-12 product sum to double directly is NOT
    engine-stable: DuckDB converts the int128 payload and divides (two
    roundings) while Java's BigDecimal.doubleValue rounds once —
    observed 1-ulp splits that moved a rounded intercept by 1e-6.
    Magnitude contract: |sum| < 9e9 (the scaled payload must stay
    under 2^53)."""
    return F.sum(col).cast("decimal(26,6)").cast("double")
