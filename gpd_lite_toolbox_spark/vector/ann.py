"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k — the correctness baseline.
  Dot products are a native ``aggregate(zip_with(...))`` fold (JVM-side,
  no UDF); ranking is a per-query window. Cost is |Q| x |N| — fine when
  |Q| is a bounded query set; the scale path is the LSH variant.
- ``ann_lsh_topk``: random-hyperplane LSH — vectors are bucketed by the
  sign pattern of ``n_planes`` deterministic hyperplanes (md5-derived
  pseudo-random components, reproducible across engines/retries), and
  only same-bucket (or adjacent-probe) pairs are scored. At 100 TB the
  bucket join replaces the all-pairs scan; recall is tunable by
  n_planes and multi-probe.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..cache import tracked_persist


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    """Dot product fold over two array<double> expressions — the
    SEMANTIC definition (left-to-right accumulation from 0.0), which
    the DuckDB oracles mirror. Interpreted higher-order path: fine for
    per-vector work, too slow for per-candidate-pair scoring (use
    _cosine_col with ``dims`` there).

    Full unrolling into chained arithmetic was tried and rejected: a
    64-term expression blows Janino's 64 KB method limit, killing
    whole-stage codegen for the entire stage (measured 4x SLOWER than
    the fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    """L2 norm fold over an array<double> expression (same
    accumulation order note as _dot)."""
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def _dot_arrow(dims: int):
    """Arrow-vectorized dot product for the HOT per-candidate scoring
    path: a scalar pandas UDF that accumulates SEQUENTIALLY over the
    ``dims`` axis while vectorizing over rows, i.e. per row it computes
    ((0 + x1*y1) + x2*y2) + ... in float64 — the exact operation
    order of the _dot fold and of the DuckDB oracle's list fold, so
    results are bit-identical and the hash gate is unaffected.

    Why Python here at all: Catalyst evaluates higher-order folds on
    the interpreted expression path (~30M lambda steps for 466k
    candidates x 64 dims), and unrolled arithmetic breaks codegen (see
    _dot). numpy does the same arithmetic as 64 SIMD column ops per
    Arrow batch. At 100 TB the scoring input is the pruned candidate
    set, so the Python-boundary cost scales with candidates, not
    |A|x|B|."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def dot(va: pd.Series, vb: pd.Series) -> pd.Series:
        if len(va) == 0:
            return pd.Series(np.zeros(0, dtype=np.float64))
        A = np.vstack(va.to_numpy()).astype(np.float64)
        B = np.vstack(vb.to_numpy()).astype(np.float64)
        acc = np.zeros(len(va), dtype=np.float64)
        for d in range(dims):
            acc += A[:, d] * B[:, d]
        return pd.Series(acc)

    # the value IS deterministic — the flag stops Catalyst pushing a
    # downstream filter below the projection and re-evaluating the UDF
    # once per consumer (same recipe as geometry.functions.st_pair_stats)
    return dot.asNondeterministic()


def _cosine_col(va, vb, na, nb, dims: int | None):
    """Rounded cosine column from raw vector columns + precomputed
    norms: Arrow kernel when ``dims`` is known, fold otherwise. The
    two forms are bit-identical (see _dot_arrow)."""
    if dims is None:
        d = _dot(_as_double(va), _as_double(vb))
    else:
        d = _dot_arrow(dims)(va, vb)
    return F.round(d / (na * nb), 6)


def _norm_col(v, dims: int | None):
    """L2-norm column from a raw vector column: sqrt of the self-dot —
    Arrow kernel when ``dims`` is known (identical accumulation order,
    so bit-identical to the fold)."""
    if dims is None:
        return _norm(_as_double(v))
    return F.sqrt(_dot_arrow(dims)(v, v))


def _query_side(queries, id_col, vec_col, dims):
    """(query_id, qv, qn) projection shared by every search entry."""
    return queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("qn", _norm_col(F.col("qv"), dims))


def _corpus_side(vectors, id_col, vec_col, dims, spread: bool = False):
    """(neighbor_id, nv, nn) projection of the searched corpus.

    ``spread=True`` widens a narrow scan first (parallelism.widen) —
    used by the BRUTE-FORCE path, whose Arrow dot kernel otherwise
    scores every candidate pair on the scan's task count (a one-file
    corpus = one task; measured 0.90 -> 0.57 s at sf0.1). The
    bucketed/inverted paths keep the scan partitioning: their
    downstream bucket exchanges redistribute anyway, and an extra
    exchange before cell assignment measured net-SLOWER."""
    if spread:
        from ..parallelism import widen

        vectors = widen(vectors)
    return vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")
    ).withColumn("nn", _norm_col(F.col("nv"), dims))


def _score_pairs(pairs, dims):
    """(query_id, neighbor_id, cosine) over candidate pairs carrying
    qv/qn/nv/nn."""
    return pairs.select(
        "query_id",
        "neighbor_id",
        _cosine_col(
            F.col("qv"), F.col("nv"), F.col("qn"), F.col("nn"), dims
        ).alias("cosine"),
    )


def _rank_topk(scored, k):
    """The shared output tail: rank within query by (cosine desc,
    neighbor asc) and keep k — runs as WindowGroupLimit partial
    k-heaps. One definition so the tie-break contract cannot drift
    between the exact/LSH/IVF/indexed paths."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _fit_ivf(vectors, n_centroids, id_col, vec_col, seed, max_iter, dims):
    """(inverted, centers): the KMeans coarse quantizer over the
    corpus — the single definition ann_ivf_topk and write_ivf_index
    share, so the quantizer setup cannot diverge between the in-memory
    and persisted index paths."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")
    )
    feat = v.withColumn("features", array_to_vector("nv"))
    model = KMeans(
        k=n_centroids, seed=seed, maxIter=max_iter, featuresCol="features"
    ).fit(feat)
    inverted = (
        model.transform(feat)
        .select("neighbor_id", "nv", F.col("prediction").alias("cell"))
        .withColumn("nn", _norm_col(F.col("nv"), dims))
    )
    centers = vectors.sparkSession.createDataFrame(
        [
            (i, [float(x) for x in c])
            for i, c in enumerate(model.clusterCenters())
        ],
        "cell int, cv array<double>",
    )
    return inverted, centers


def _route_probes(q, centers, n_probe):
    """Each query's n_probe nearest centroids (centers broadcast;
    |Q| x n_centroids fold, per-element cast so raw float query
    vectors match the double centers)."""
    d2 = F.aggregate(
        F.zip_with(
            F.col("qv"),
            F.col("cv"),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("_d2"), F.col("cell"))
    return (
        q.crossJoin(F.broadcast(centers))
        .withColumn("_d2", d2)
        .withColumn("_pr", F.row_number().over(wq))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "qv", "qn", "cell")
    )


def cosine_topk(
    queries: DataFrame,
    vectors: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_queries: bool = True,
    dims: int | None = None,
    max_pairs: int = 100_000_000,
    force: bool = False,
) -> DataFrame:
    """Exact top-k neighbors by cosine similarity for each query vector.

    Output: (query_id, neighbor_id, cosine, rank); self-matches included
    (rank 1 when the query is drawn from the corpus). Ordering ties are
    broken by neighbor id; cosine is rounded so ordering is reproducible
    across engines and partitionings. Pass ``dims`` to unroll the dot
    products into codegen (bit-identical; see _dot).

    The QUERY side is broadcast by default (the bounded side in a
    brute-force scan); the corpus streams partition-parallel with no
    shuffle.

    This is the EXACT baseline, deliberately O(|queries| x |corpus|):
    calls whose pair count exceeds ``max_pairs`` raise unless
    ``force=True``, steering large-scale callers to ``ann_lsh_topk``
    (same output contract, banded candidates) or ``ann_ivf_topk``
    (probe-limited). The guard runs two count jobs, which re-execute
    the inputs' upstream lineage — noise for base-table scans, but
    callers feeding expensive uncached pipelines should cache the
    inputs first or pass ``force=True`` to stay fully lazy.
    """
    if not force:
        n_q, n_v = queries.count(), vectors.count()
        if n_q * n_v > max_pairs:
            raise ValueError(
                f"cosine_topk is the exact brute-force baseline: "
                f"{n_q} queries x {n_v} corpus rows = {n_q * n_v} pairs "
                f"exceeds max_pairs={max_pairs}. Use ann_lsh_topk / "
                f"ann_ivf_topk at this scale, or pass force=True."
            )
    q = _query_side(queries, id_col, vec_col, dims)
    if broadcast_queries:
        q = F.broadcast(q)
    v = _corpus_side(vectors, id_col, vec_col, dims, spread=True)
    return _rank_topk(_score_pairs(v.crossJoin(q), dims), k)


def _coarse_cells_arrow(coarse):
    """Arrow kernel for explicit-quantizer cell assignment: argmin over
    full-dim L2² to the given centroid list, SEQUENTIAL per-dim
    accumulation and first-min ties (np.argmin) — the exact op order of
    the _route_probes fold and of the DuckDB replay
    (oracles.ANN_IVF_TOPK), so all three forms are bit-identical."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(coarse, dtype=np.float64)
    nc, cdims = C.shape

    @pandas_udf("int")
    def cells(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series(np.zeros(0, dtype=np.int32))
        X = np.vstack(v.to_numpy()).astype(np.float64)
        n = X.shape[0]
        cd = np.zeros((n, nc), dtype=np.float64)
        for i in range(nc):
            acc = np.zeros(n, dtype=np.float64)
            for d in range(cdims):
                t = X[:, d] - C[i, d]
                acc = acc + t * t
            cd[:, i] = acc
        return pd.Series(np.argmin(cd, axis=1).astype(np.int32))

    # deterministic value; flag only stops Catalyst re-evaluating the
    # projection per consumer (same recipe as _dot_arrow)
    return cells.asNondeterministic()


def ann_ivf_topk(
    queries: DataFrame,
    vectors: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 5,
    dims: int | None = None,
    centroids: list | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a KMeans coarse quantizer
    partitions the corpus into ``n_centroids`` cells; each query scores
    only the vectors in its ``n_probe`` nearest cells. Output schema
    matches cosine_topk (rank within scored candidates).

    ``max_iter`` defaults low: a COARSE quantizer needs rough cluster
    structure, not convergence — measured recall@5 was flat from 5 to
    10 iterations on the clustered fixture while fit time halved.

    Pass ``centroids`` (a list of centroid vectors, e.g.
    ``vector.pq.default_coarse_centroids()``) to skip the KMeans fit
    and use an EXPLICIT quantizer: cell assignment becomes a map-only
    Arrow argmin, the whole route+score path is deterministic, and the
    result is hash-gateable in DuckDB (oracles.ANN_IVF_TOPK) — the
    same recipe that gates ann_ivfpq_topk. ``n_centroids`` is ignored
    in that case.

    The 100 TB shape: the centroid table is tiny (broadcast to both
    sides), the corpus is shuffled ONCE by cell id — in a warehouse this
    is the persisted/bucketed inverted file, amortized across query
    batches — and per-query scoring cost is ~|corpus| * n_probe /
    n_centroids instead of |corpus|. Recall is tunable by n_probe
    (n_probe = n_centroids degenerates to exact brute force).
    """
    if centroids is not None:
        inverted = _corpus_side(vectors, id_col, vec_col, dims).withColumn(
            "cell", _coarse_cells_arrow(centroids)(F.col("nv"))
        )
        centers = vectors.sparkSession.createDataFrame(
            [
                (i, [float(x) for x in c])
                for i, c in enumerate(centroids)
            ],
            "cell int, cv array<double>",
        )
    else:
        inverted, centers = _fit_ivf(
            vectors, n_centroids, id_col, vec_col, seed, max_iter, dims
        )
    q = _query_side(queries, id_col, vec_col, dims)
    probes = _route_probes(q, centers, n_probe)
    return _rank_topk(_score_pairs(probes.join(inverted, "cell"), dims), k)


def write_ivf_index(
    vectors: DataFrame,
    path: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 5,
    dims: int | None = None,
    centroids: list | None = None,
) -> None:
    """Persist the IVF inverted file: the cell-assigned corpus written
    as parquet PARTITIONED BY cell (plus the centroid table alongside),
    so the quantizer fit and the corpus shuffle are paid ONCE and every
    later query batch reads only its probed cells via partition pruning
    — the disk-layout analogue of the in-memory inverted list, and the
    amortization a real 100 TB serving path needs (the per-batch
    KMeans refit in ``ann_ivf_topk`` is the exploratory form).

    ``centroids`` (explicit quantizer, same contract as
    ``ann_ivf_topk``) skips the KMeans fit and makes every later read
    of the index deterministic end-to-end — the hash-gateable form.

    Layout: ``<path>/cells/cell=<i>/...`` with (neighbor_id, nv, nn)
    and ``<path>/centroids`` with (cell, cv).
    """
    if centroids is not None:
        inverted = _corpus_side(vectors, id_col, vec_col, dims).withColumn(
            "cell", _coarse_cells_arrow(centroids)(F.col("nv"))
        )
        centers = vectors.sparkSession.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
            "cell int, cv array<double>",
        )
    else:
        inverted, centers = _fit_ivf(
            vectors, n_centroids, id_col, vec_col, seed, max_iter, dims
        )
    inverted.write.mode("overwrite").partitionBy("cell").parquet(
        f"{path}/cells"
    )
    centers.repartition(1).write.mode("overwrite").parquet(
        f"{path}/centroids"
    )


def delete_from_ivf_index(spark, path: str, ids) -> None:
    """Logical delete from a persisted IVF index: append the ids to a
    TOMBSTONE table (``<path>/tombstones``) instead of rewriting cell
    files — the delete costs O(|batch|) regardless of index size, and
    ``ann_ivf_topk_indexed`` filters tombstoned vectors out of every
    probe. The physical rewrite is deferred to ``compact_ivf_index``
    (run when the tombstone fraction justifies it) — the standard
    merge-on-read contract of every LSM/lakehouse delete.

    ``ids``: a list of vector ids or a single-column DataFrame."""
    if isinstance(ids, DataFrame):
        tdf = ids.select(
            F.col(ids.columns[0]).cast("long").alias("neighbor_id")
        )
    else:
        tdf = spark.createDataFrame(
            [(int(i),) for i in ids], "neighbor_id long"
        )
    tdf.write.mode("append").parquet(f"{path}/tombstones")


def _ivf_tombstones(spark, path: str) -> DataFrame | None:
    from pyspark.errors import AnalysisException

    from ..errors import is_path_not_found

    try:
        return spark.read.parquet(f"{path}/tombstones")
    except AnalysisException as e:
        # PATH_NOT_FOUND only = no deletes yet. Any other failure
        # (corrupt footer, permissions, half-written directory) must
        # propagate: treating it as "no deletes" would serve logically
        # deleted vectors back out of every probe.
        if is_path_not_found(e):
            return None
        raise


def compact_ivf_index(spark, path: str) -> int:
    """Physically apply an IVF index's tombstones: rewrite ONLY the
    cell partitions that contain a tombstoned vector (dynamic
    partition overwrite — untouched cells keep their files), then drop
    the tombstone table. Returns the number of cells rewritten.

    Scale shape: the affected-cell list is a bounded collect (at most
    n_centroids values); the rewrite reads and writes just those
    partitions — the compaction cost tracks the DELETED data's
    locality, not the index size."""
    import shutil

    ts = _ivf_tombstones(spark, path)
    if ts is None:
        return 0
    dead = F.broadcast(ts.select("neighbor_id").distinct())
    cells_df = spark.read.parquet(f"{path}/cells")
    affected = [
        r.cell
        for r in cells_df.join(dead, "neighbor_id")
        .select("cell")
        .distinct()
        .collect()
    ]
    if affected:
        kept = (
            cells_df.filter(F.col("cell").isin(affected))
            .join(dead, "neighbor_id", "left_anti")
        )
        survivors = {
            r.cell for r in kept.select("cell").distinct().collect()
        }
        # per-write option, NOT session conf: mutating
        # spark.sql.sources.partitionOverwriteMode on the session would
        # silently change overwrite semantics for every later caller
        # write (sources/sinks.py uses the same per-write form)
        (
            kept.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("cell")
            .parquet(f"{path}/cells")
        )
        # dynamic overwrite only rewrites partitions PRESENT in the
        # write: a cell whose members all died writes nothing and its
        # stale files would survive — remove those directories
        # explicitly (local/shared-POSIX path contract, as write_warc).
        # Failures MUST propagate before the tombstones drop below:
        # a surviving stale cell dir with its tombstones gone would
        # silently resurface logically deleted vectors.
        import os

        for cell in set(affected) - survivors:
            cell_dir = f"{path}/cells/cell={cell}"
            if os.path.isdir(cell_dir):
                shutil.rmtree(cell_dir)
    shutil.rmtree(f"{path}/tombstones")
    return len(affected)


def ann_ivf_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
) -> DataFrame:
    """Top-k search against a persisted IVF index (``write_ivf_index``):
    routes each query to its ``n_probe`` nearest stored centroids, then
    restricts the cells scan to the probed cell set with a STATIC
    partition filter — the probed set is collected (bounded by
    n_centroids, never by query count) so the parquet scan shows
    ``PartitionFilters`` and reads ~n_probe/n_centroids of the data;
    a join-driven dynamic filter would depend on DPP kicking in.
    Output schema matches cosine_topk; results are identical to
    ``ann_ivf_topk`` run with the same quantizer."""
    centers = spark.read.parquet(f"{path}/centroids")
    q = _query_side(queries, id_col, vec_col, dims)
    probes = _route_probes(q, centers, n_probe)
    # no persist: the centroid routing is |Q| x n_centroids and cheap
    # to recompute for the cells collect — a persist here would leak
    # cached partitions for the session lifetime in a serving loop
    # that calls this per query batch
    cells = [r.cell for r in probes.select("cell").distinct().collect()]
    inverted = spark.read.parquet(f"{path}/cells").filter(
        F.col("cell").isin(cells)
    )
    # merge-on-read deletes: tombstoned vectors (delete_from_ivf_index)
    # drop out of every probe via a broadcast anti-join until
    # compact_ivf_index rewrites their cells
    ts = _ivf_tombstones(spark, path)
    if ts is not None:
        inverted = inverted.join(
            F.broadcast(ts.select("neighbor_id").distinct()),
            "neighbor_id",
            "left_anti",
        )
    return _rank_topk(_score_pairs(probes.join(inverted, "cell"), dims), k)


N_PLANES = 16
N_BANDS_V = 4  # 4 bands x 4 planes: candidate if ANY band's bits match
_PLANE_PRIME = 10007


def _plane_component_value(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    md5-derived integer -> affine map. Computed DRIVER-SIDE once and
    shipped as literals — hashing per element row at runtime would cost
    |rows| x dims x planes md5 calls for values that never change."""
    import hashlib

    h = int(hashlib.md5(f"plane{plane}_{dim}".encode()).hexdigest()[:8], 16)
    half = (_PLANE_PRIME - 1) / 2.0
    return ((h % _PLANE_PRIME) - half) / half


def lsh_bands(
    vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    dims: int | None = None, cache: bool = True,
) -> DataFrame:
    """(id, band, bucket): sign pattern of each band's hyperplanes,
    packed per band. Banded like minhash-LSH — a pair is a candidate if
    ANY band's bits agree, which keeps recall high without all-pairs.
    Projections are unrolled products against literal plane components
    — whole-stage codegen, no shuffle.

    ``dims`` is probed from one row when not given: a plane literal
    shorter than the vectors would null out every projection and
    silently collapse all buckets (degenerating LSH to all-pairs).

    The returned table is ``persist()``-ed (bands are always consumed
    by both sides of a join; without the cache the Arrow projection
    runs once per side). Cache lifecycle belongs to the CALLER: a
    long-lived service issuing many calls should ``.unpersist()`` each
    returned frame once consumed, or pass ``cache=False`` and manage
    reuse itself — Spark's ContextCleaner only reclaims the cached
    partitions when the DataFrame is garbage collected.
    """
    if dims is None:
        # probe a NON-NULL row (an arbitrary first row may carry a
        # NULL vector; len(None) raises)
        first = (
            vectors.select(vec_col)
            .filter(F.col(vec_col).isNotNull())
            .first()
        )
        if first is None:
            dims = 1  # empty input: any plane length yields no rows
        else:
            dims = len(first[0])
    from pyspark.sql.functions import pandas_udf

    # all-planes projection in ONE Arrow kernel: numpy accumulates
    # sequentially over the dims axis (bit-identical to the per-plane
    # SQL fold the oracle mirrors) while vectorizing over rows AND
    # planes. The earlier form — 16 interpreted folds per row — cost
    # ~1 us per element and was re-evaluated once per union branch and
    # join side; this evaluates once, in SIMD.
    plane_mat = np.array(
        [
            [_plane_component_value(p, d) for p in range(N_PLANES)]
            for d in range(dims)
        ]
    )

    @pandas_udf("array<double>")
    def proj(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        A = np.vstack(v.to_numpy()).astype(np.float64)
        acc = np.zeros((len(v), N_PLANES), dtype=np.float64)
        for d in range(dims):
            acc += A[:, d : d + 1] * plane_mat[d]
        return pd.Series(list(acc))

    sums = vectors.select(
        F.col(id_col).alias("id"),
        proj.asNondeterministic()(F.col(vec_col)).alias("ps"),
    )
    # bucket packing stays native: ps is a materialized attribute after
    # ArrowEvalPython, so element_at is cheap; then a single explode
    # emits the B (band, bucket) rows — a B-way union here would
    # re-evaluate the projection once per branch and per join side.
    per_band = N_PLANES // N_BANDS_V
    structs = []
    for b in range(N_BANDS_V):
        bucket = None
        for i in range(per_band):
            p = b * per_band + i
            term = F.when(
                F.element_at(F.col("ps"), p + 1) > 0, F.lit(1 << i)
            ).otherwise(F.lit(0))
            bucket = term if bucket is None else bucket + term
        structs.append(
            F.struct(
                F.lit(b).alias("band"), bucket.cast("bigint").alias("bucket")
            )
        )
    # bands are always consumed by a (self-)join's two sides: persist
    # the |ids| x B-row table so the projection runs once, not per side
    # (lifecycle note in the docstring — callers in a serving loop
    # unpersist or opt out)
    out = sums.select(
        "id", F.explode(F.array(*structs)).alias("_bb")
    ).select("id", "_bb.band", "_bb.bucket")
    return tracked_persist(out) if cache else out


def ann_lsh_topk(
    queries: DataFrame,
    vectors: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
) -> DataFrame:
    """Approximate top-k: score only pairs sharing at least one band
    bucket. Output schema matches cosine_topk (rank within retrieved
    candidates). Pass ``dims`` to skip the one-row schema probe."""
    qb = lsh_bands(queries, id_col, vec_col, dims=dims).withColumnRenamed("id", "query_id")
    vb = lsh_bands(vectors, id_col, vec_col, dims=dims).withColumnRenamed("id", "neighbor_id")
    cand = (
        qb.join(vb, ["band", "bucket"])
        .select("query_id", "neighbor_id")
        .distinct()
    )
    # NOT spread here (unlike text's _pair_overlap): the bucket join
    # already exchanges on (band, bucket), so the kernel inherits real
    # parallelism, and an extra pair rebalance measured net-slower at
    # bench SF (A/B'd round 6)
    q = _query_side(queries, id_col, vec_col, dims)
    v = _corpus_side(vectors, id_col, vec_col, dims)
    pairs = cand.join(q, "query_id").join(v, "neighbor_id")
    return _rank_topk(_score_pairs(pairs, dims), k)
