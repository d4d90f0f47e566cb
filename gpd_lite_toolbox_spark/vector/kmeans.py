"""Relational k-means over embedding columns — Lloyd's algorithm with
a FIXED iteration count unrolled into one declarative plan.

``pyspark.ml``'s KMeans is iterative driver-side (fit() runs jobs until
convergence) and its k-means|| init is partition-sensitive, so its
output can never be hash-gated.  For the data-curation uses this
package needs — cluster-balanced sampling, SemDeDup-style semantic
grouping, per-cluster quota curation — a SMALL fixed number of Lloyd
rounds from deterministic seed centroids is the right contract, and it
is fully expressible as a DataFrame plan:

- assignment is MAP-ONLY: the current centers ride along as a one-row
  array (broadcast), and each vector computes its argmin-L2² cell in
  an Arrow-batched kernel — no shuffle, no window;
- the mean update is ONE partial-combined aggregate per round
  (``dims`` avg columns grouped by cell — at most |cells| x dims
  values per input partition reach the exchange);
- rounds chain lazily (aggregate -> one-row array -> next projection),
  so ``n_iter`` rounds = ``n_iter`` aggregates in ONE job, no driver
  collect anywhere, and the bench times the real work.

Cross-engine exactness: seed centroids are md5-derived literals
(``vector.pq.default_coarse_centroids``), updated means are ROUNDED
(round 6, the ``group_centroids`` recipe the label_centroids gate
already proves stable), and the d2 accumulation is left-to-right from
0.0 per (vector, center) — the DuckDB oracle replays every round
relationally and the final assignment hash-matches
(oracles.EMBEDDING_CLUSTERS).

Round-10 optimization (guide §4.2): the argmin used to be a Catalyst
``transform(aggregate(zip_with(...)))`` fold — |rows| x k x dims
INTERPRETED lambda steps per assignment pass (higher-order functions
never enter whole-stage codegen), measured 7.4 s on
``match_line_cluster`` (k=1000, dims=4) and 2.6 s on
``embedding_clusters`` (k=8, dims=64) at sf0.1.  The same arithmetic
as ``dims`` SIMD column ops per Arrow batch (the ``_dot_arrow``
recipe, vector/ann.py) is bit-identical — squared terms accumulate in
the identical dimension order, ``np.argmin`` takes the first minimum
exactly like ``array_position(_d2l, array_min(_d2l))`` — so every
downstream hash gate is unaffected, and the kernel cost scales with
rows x k x dims of actual math instead of interpreter dispatch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import tracked_persist


def _argmin_cell_arrow(dims: int):
    """Arrow-vectorized argmin-L2² cell assignment (guide §4.2, the
    ``_dot_arrow`` recipe): squared differences accumulate over the
    ``dims`` axis SEQUENTIALLY from 0.0 — the exact operation order of
    the former ``aggregate(zip_with(...), 0.0, acc + x)`` fold and of
    the DuckDB oracle's replay — while vectorizing over rows x
    centers, and ``np.argmin`` resolves ties to the FIRST minimal
    cell, exactly like ``array_position(_d2l, array_min(_d2l))``.
    Results are bit-identical to the fold; only the interpreter
    dispatch is gone.

    A NULL vector (or one whose length differs from the centers'
    ``dims``) assigns a NULL cell — the fold produced the same: any
    NULL/missing zip term nulled that center's distance, nulling
    array_min across the board.

    KNOWN DIVERGENCE (r10 ADVICE, documented on purpose): a vector
    containing a true ``NaN`` *value* also gets a NULL cell here (the
    NaN mask below cannot tell a float NaN from an Arrow-converted
    NULL element), whereas the retired fold assigned it cell 0 (Spark
    SQL orders NaN = NaN, so ``array_position`` found the all-NaN
    minimum at position 1).  NULL is the saner answer — a NaN
    distance is not a distance — and no declared query feeds NaN
    vectors (the oracle sweep is hash-green), so the kernel keeps it;
    the bit-identity claim above is for NULL/wrong-length/finite
    inputs."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def cell(vv: pd.Series, ctr: pd.Series) -> pd.Series:
        if len(vv) == 0:
            return pd.Series(np.zeros(0, dtype=np.int32))
        # every row carries the same broadcast-joined flat array; one
        # reshape per batch recovers the (k, dims) center matrix
        C = np.asarray(ctr.iloc[0], dtype=np.float64).reshape(-1, dims)
        vals = vv.to_numpy()
        ok = np.array(
            [v is not None and len(v) == dims for v in vals], dtype=bool
        )
        out = np.full(len(vals), None, dtype=object)
        if ok.any():
            X = np.vstack(vals[ok]).astype(np.float64)
            # NULL vector ELEMENTS arrive as NaN through Arrow; the
            # fold nulled every center's distance for such rows, so
            # they keep a NULL cell here too
            ok[ok] = ~np.isnan(X).any(axis=1)
            X = X[~np.isnan(X).any(axis=1)]
        if ok.any():
            acc = np.zeros((X.shape[0], C.shape[0]), dtype=np.float64)
            for d in range(dims):
                t = X[:, d, None] - C[None, :, d]
                acc += t * t
            out[ok] = np.argmin(acc, axis=1).astype(np.int32)
        return pd.Series(out)

    # deterministic in value; the flag stops Catalyst duplicating the
    # kernel below pushed filters (the _dot_arrow recipe)
    return cell.asNondeterministic()


def _assign(
    vectors_d: DataFrame, ctr_one_row: DataFrame, dims: int
) -> DataFrame:
    """Row-local argmin assignment: the centers ride as a broadcast
    one-row flat array (cell-ordered, k x dims doubles: the i-th
    ``dims``-slice IS cell i) and each row's cell comes from the Arrow
    kernel.  Adds ``cell`` to the input columns; no shuffle.

    History: a Catalyst ``transform/zip_with/aggregate`` fold held
    this slot through round 9 (and a per-dimension UNROLLED indexing
    form was tried in round 8 and measured ~2x slower than the fold —
    interpreted GetArrayItem per center per row).  Both lose to the
    Arrow kernel by the interpreter-dispatch factor: the fold runs
    |rows| x k x dims interpreted lambda steps, the kernel runs
    dims x k SIMD column ops per batch (measured 8.5 -> 1.8 s on
    match_line_cluster, 2.6 -> 0.9 s on embedding_clusters, sf0.1).
    The per-row cost of carrying the flat center array across the
    Arrow boundary is k x dims x 8 bytes of memcpy — orders of
    magnitude cheaper than the fold it replaces at every k/dims this
    package uses."""
    return (
        vectors_d.crossJoin(F.broadcast(ctr_one_row))
        .withColumn("cell", _argmin_cell_arrow(dims)("_vv", "_ctr"))
        .drop("_ctr")
    )


def kmeans_assign(
    vectors: DataFrame,
    centroids: list,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Deterministic k-means assignment: run ``n_iter`` Lloyd rounds
    (assign to current centers, recompute each cell's mean rounded to
    ``round_digits``) from the given seed ``centroids`` (a list of
    vectors, e.g. ``vector.pq.default_coarse_centroids()``), then
    return the assignment to the FINAL centers.

    Output: ``(<id_col>, cell)`` — one row per input vector.

    A cell that loses all members keeps its previous center (standard
    Lloyd handling, and what keeps cell ids stable for the oracle).

    Scale shape: per round, ONE |cells|-keyed aggregate exchange
    (partial-combined avgs), one single-row pack aggregate, and a
    broadcast of the 1-row center array; assignments never shuffle.
    ``n_iter`` is a plan-size knob, not a convergence loop — curation
    pipelines want few-round determinism, not convergence
    (``pyspark.ml.KMeans`` remains the quality path when a trained,
    non-gateable clustering is acceptable).

    Round-10 plan-shape change (guide §2.4): the per-round
    empty-cell-carry used to be a k-row ``centers LEFT JOIN means``
    — planned as a SortMergeJoin with two exchanges and two sorts PER
    ROUND on k-row data.  The centers now live as a one-row flat
    array end to end, and the carry is row-local array algebra
    (element-wise ``coalesce(mean, previous)`` per cell slice) over
    the round's means packed into a one-row map — identical values
    (the coalesce is still per DIMENSION, matching the old
    ``coalesce(_m{d}, cv[{d}])``), two fewer exchanges and one fewer
    join per round, and the seed centers no longer need a k-row
    createDataFrame + collect_list aggregate per assignment pass.
    """
    if n_iter < 0:
        raise ValueError(f"n_iter must be >= 0, got {n_iter}")
    dims = len(centroids[0])
    k = len(centroids)
    spark = vectors.sparkSession
    ctr = spark.createDataFrame(
        [([float(x) for c in centroids for x in c],)],
        "_ctr array<double>",
    )
    # the assignment input is consumed n_iter+1 times (once per Lloyd
    # pass: each round's mean aggregate re-reads it, and the final
    # assignment reads it again) — persist the PROJECTED (id, vector)
    # table so the passes re-scan a cached projection instead of
    # re-running the upstream lineage per pass (guide §5; MLlib's own
    # KMeans caches its input for exactly this reason).  For
    # match_line_cluster the upstream is the 4-join/2-window
    # descriptor build: persisting it here measured 8.5 -> 1.8 s at
    # sf0.1.  n_iter=0 keeps the single-pass plan unpersisted.
    vd = vectors.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(
            "_vv"
        ),
    )
    if n_iter > 0:
        vd = tracked_persist(vd)
    nulls = F.array(*[F.lit(None).cast("double")] * dims)
    for _ in range(n_iter):
        assigned = _assign(vd, ctr, dims)
        means = assigned.groupBy("cell").agg(
            *[
                F.expr(
                    f"round(avg(_vv[{d}]), {int(round_digits)})"
                ).alias(f"_m{d}")
                for d in range(dims)
            ]
        )
        # pack the round's means into a one-row cell -> vector map ...
        # NULL-cell rows (NULL / wrong-length / NaN-bearing vectors —
        # the kernel assigns them no cell) must be dropped BEFORE the
        # pack: map_from_entries rejects a NULL key outright
        # (NULL_MAP_KEY), where the retired centers-LEFT-JOIN-means
        # carry simply never matched that group (r10 ADVICE, medium).
        # Filtering here restores exactly the left-join semantics.
        mm = means.filter(F.col("cell").isNotNull()).agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        F.col("cell"),
                        F.array(*[F.col(f"_m{d}") for d in range(dims)]),
                    )
                )
            ).alias("_mm")
        )
        # ... and carry empty cells (and NULL mean dimensions) from the
        # previous flat array, element-wise — the old per-dimension
        # coalesce(_m{d}, cv[{d}]) rule, now row-local on one row.
        # The PREVIOUS centers are the broadcast side on purpose: this
        # round's assignment pass already broadcasts the identical
        # subtree, so ReuseExchange dedupes the two and the previous
        # round's cascade is evaluated ONCE (with ctr as the stream
        # side it was re-evaluated per consumer — one extra full
        # assignment pass per round, visible as a fourth
        # ArrowEvalPython in the n_iter=2 plan).
        ctr = mm.crossJoin(F.broadcast(ctr)).select(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(0), F.lit(k - 1)),
                    lambda i: F.zip_with(
                        F.coalesce(F.col("_mm")[i], nulls),
                        F.slice("_ctr", i * dims + 1, dims),
                        lambda m, p: F.coalesce(m, p),
                    ),
                )
            ).alias("_ctr")
        )
    return _assign(vd, ctr, dims).select(
        F.col("id").alias(id_col), "cell"
    )
