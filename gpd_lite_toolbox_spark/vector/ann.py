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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_topk(
    queries: DataFrame,
    vectors: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact top-k neighbors by cosine similarity for each query vector.

    Output: (query_id, neighbor_id, cosine, rank); self-matches included
    (rank 1 when the query is drawn from the corpus). Ordering ties are
    broken by neighbor id; cosine is rounded so ordering is reproducible
    across engines and partitionings.

    The QUERY side is broadcast by default (the bounded side in a
    brute-force scan); the corpus streams partition-parallel with no
    shuffle.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", _norm(F.col("qv")))
    if broadcast_queries:
        q = F.broadcast(q)
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("nv"),
    ).withColumn("nn", _norm(F.col("nv")))
    pairs = v.crossJoin(q)
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


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
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a KMeans coarse quantizer
    partitions the corpus into ``n_centroids`` cells; each query scores
    only the vectors in its ``n_probe`` nearest cells. Output schema
    matches cosine_topk (rank within scored candidates).

    ``max_iter`` defaults low: a COARSE quantizer needs rough cluster
    structure, not convergence — measured recall@5 was flat from 5 to
    10 iterations on the clustered fixture while fit time halved.

    The 100 TB shape: the centroid table is tiny (broadcast to both
    sides), the corpus is shuffled ONCE by cell id — in a warehouse this
    is the persisted/bucketed inverted file, amortized across query
    batches — and per-query scoring cost is ~|corpus| * n_probe /
    n_centroids instead of |corpus|. Recall is tunable by n_probe
    (n_probe = n_centroids degenerates to exact brute force).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("nv"),
    )
    feat = v.withColumn("features", array_to_vector("nv"))
    model = KMeans(
        k=n_centroids, seed=seed, maxIter=max_iter, featuresCol="features"
    ).fit(feat)
    inverted = (
        model.transform(feat)
        .select("neighbor_id", "nv", F.col("prediction").alias("cell"))
        .withColumn("nn", _norm(F.col("nv")))
    )
    spark = vectors.sparkSession
    centers = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in
         enumerate(model.clusterCenters())],
        "cell int, cv array<double>",
    )
    # route each query to its n_probe nearest centroids (centers tiny)
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", _norm(F.col("qv")))
    d2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("_d2"), F.col("cell"))
    probes = (
        q.crossJoin(F.broadcast(centers))
        .withColumn("_d2", d2)
        .withColumn("_pr", F.row_number().over(wq))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "qv", "qn", "cell")
    )
    scored = probes.join(inverted, "cell").select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


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


def _plane_literal(plane: int, dims: int):
    return F.array(
        *[F.lit(_plane_component_value(plane, d)) for d in range(dims)]
    )


def lsh_bands(
    vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    dims: int | None = None,
) -> DataFrame:
    """(id, band, bucket): sign pattern of each band's hyperplanes,
    packed per band. Banded like minhash-LSH — a pair is a candidate if
    ANY band's bits agree, which keeps recall high without all-pairs.
    Projections are aggregate/zip_with folds against literal plane
    vectors — no explode, no shuffle, whole-stage codegen.

    ``dims`` is probed from one row when not given: a plane literal
    shorter than the vectors would null out every projection and
    silently collapse all buckets (degenerating LSH to all-pairs).
    """
    if dims is None:
        first = vectors.select(vec_col).first()
        if first is None:
            dims = 1  # empty input: any plane length yields no rows
        else:
            dims = len(first[0])
    emb = _as_double(F.col(vec_col))
    sums = vectors.select(
        F.col(id_col).alias("id"),
        *[
            _dot(emb, _plane_literal(p, dims)).alias(f"p{p}")
            for p in range(N_PLANES)
        ],
    )
    per_band = N_PLANES // N_BANDS_V
    bands = []
    for b in range(N_BANDS_V):
        bucket = None
        for i in range(per_band):
            p = b * per_band + i
            term = F.when(F.col(f"p{p}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
            bucket = term if bucket is None else bucket + term
        bands.append(
            sums.select(
                "id", F.lit(b).alias("band"), bucket.cast("bigint").alias("bucket")
            )
        )
    out = bands[0]
    for o in bands[1:]:
        out = out.unionByName(o)
    return out


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
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", _norm(F.col("qv")))
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("nv"),
    ).withColumn("nn", _norm(F.col("nv")))
    scored = (
        cand.join(q, "query_id")
        .join(v, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
