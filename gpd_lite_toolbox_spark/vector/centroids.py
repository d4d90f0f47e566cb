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


def embedding_outliers(
    vectors: DataFrame,
    z_threshold: float = 2.0,
    group_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dims: int | None = None,
) -> DataFrame:
    """Embedding-space outlier pruning: flag vectors whose squared
    distance to their own group's centroid z-scores above
    ``z_threshold`` within the group — the semantic quality filter a
    curation pipeline runs after clustering/labeling (mislabeled or
    garbage embeddings sit far from their class mean).

    Columns: ``(vec_id, group, dist2, z)`` for flagged vectors only;
    ``dist2`` is the squared L2 distance to the (6dp-rounded) group
    centroid, ``z`` its within-group z-score, both rounded to 6dp —
    the flag tests the ROUNDED z so the gate has no knife edge.

    Scale shape: centroids are one partial-combined (group, dim)
    aggregate reassembled to |groups| rows and BROADCAST back; the
    distance is the proven three-dot decomposition
    ``|x|^2 - 2<x,c> + |c|^2`` through the Arrow dot kernel (see
    vector/ann.py _dot_arrow — bit-identical to the oracle's
    left-to-right fold), so the corpus pays one map pass plus one
    |groups|-row stats aggregate. Nothing shuffles the vectors twice.
    """
    from .ann import _dot_arrow, _dot, _as_double

    cents = assemble_vectors(
        group_centroids(vectors, group_col, vec_col)
    ).withColumnRenamed("vec", "_cvec")
    base = vectors.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("vec_id"),
        F.col(group_col).alias("group"),
        F.col(vec_col).alias("_v"),
    )
    if dims is None:
        dot = lambda a, b: _dot(_as_double(a), _as_double(b))  # noqa: E731
    else:
        dot = _dot_arrow(dims)
    dist2 = F.round(
        dot(F.col("_v"), F.col("_v"))
        - 2.0 * dot(F.col("_v"), F.col("_cvec"))
        + dot(F.col("_cvec"), F.col("_cvec")),
        6,
    )
    scored = (
        base.join(F.broadcast(cents), "group")
        .withColumn("dist2", dist2)
        .drop("_v", "_cvec")
    )
    stats = scored.groupBy("group").agg(
        F.avg("dist2").alias("_mu"),
        F.stddev_pop("dist2").alias("_sd"),
    )
    z = F.round(
        (F.col("dist2") - F.col("_mu"))
        / F.when(F.col("_sd") > 0, F.col("_sd")),
        6,
    )
    return (
        scored.join(F.broadcast(stats), "group")
        .withColumn("z", z)
        .filter(F.col("z") > float(z_threshold))
        .select("vec_id", "group", "dist2", "z")
    )
