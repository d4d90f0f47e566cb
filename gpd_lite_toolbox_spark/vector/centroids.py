"""Grouped embedding centroids: the per-class mean vector.

The supervised sibling of the IVF coarse quantizer (vector/ann.py fits
its centroids by iterative KMeans; here the groups are given — domain,
label, language — and the mean is a single closed-form aggregate, so
unlike IVF this IS oracle-expressible and hash-gated).

Uses: per-domain embedding drift monitoring, nearest-class-mean
classification, seeding KMeans, building per-source probes for
contamination scans.

Scale shape: ``posexplode`` fans each vector into (group, dim) rows,
but the groupBy(group, dim) aggregate partial-combines map-side, so
the ONE exchange carries at most |groups| x dims rows per input
partition — never the raw vector volume. The optional array
reassembly is a second tiny exchange keyed by group (|groups| rows).
No Python anywhere; the whole plan is codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_centroids(
    vectors: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Long-form centroids: ``(group, pos, mean, n_vecs)`` — one row
    per group per dimension, ``mean`` the per-dimension average (as
    DOUBLE, rounded for cross-engine hash stability), ``n_vecs`` the
    group's vector count. Rows with a NULL vector are ignored; all
    vectors in a group must share the dimensionality of the corpus
    (ragged inputs make ``n_vecs`` per-dimension counts diverge —
    callers normalize first)."""
    ex = vectors.filter(F.col(vec_col).isNotNull()).select(
        F.col(group_col).alias("group"),
        F.posexplode(vec_col).alias("pos", "val"),
    )
    return ex.groupBy("group", "pos").agg(
        F.round(F.avg(F.col("val").cast("double")), round_digits).alias("mean"),
        F.count("*").alias("n_vecs"),
    )


def assemble_vectors(
    long_form: DataFrame,
    group_col: str = "group",
    pos_col: str = "pos",
    val_col: str = "mean",
) -> DataFrame:
    """Fold long-form (group, pos, val) rows back into
    ``(group, vec array<double>)`` — collect + sort by position inside
    the row (array_sort over structs), one exchange keyed by group."""
    parts = F.array_sort(
        F.collect_list(F.struct(F.col(pos_col).alias("p"),
                                F.col(val_col).alias("v")))
    )
    return long_form.groupBy(F.col(group_col).alias("group")).agg(
        F.transform(parts, lambda s: s["v"]).alias("vec")
    )
