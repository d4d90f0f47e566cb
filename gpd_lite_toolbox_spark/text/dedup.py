"""Deduplication operators for large text corpora.

Beyond the reference's surface (BASELINE.json north star): the operators
a 100 TB training-data pipeline needs. Everything here is NATIVE Spark
SQL expressions — md5/substring/sequence/explode/groupBy — no Python
UDFs, so the whole pipeline stays in whole-stage codegen and scales as
ordinary shuffles keyed by hash/band. Cross-engine determinism comes
from md5 (identical in Spark and DuckDB) feeding integer arithmetic.

- exact_dedup: hash-groupBy. One shuffle on a 128-bit key; at any scale
  this is the optimal plan.
- minhash_signatures/minhash_lsh_pairs: shingle -> 32-bit hash -> H
  permutation-min aggregates -> B band keys -> bucket self-join ->
  exact Jaccard verify on candidate pairs only. The band join bounds
  the candidate set (no all-pairs); the verify join is keyed by
  candidate pair. Parameters (k, stride, H, B) are compile-time
  constants so signatures are reproducible.
- simhash: token hash sign-sum per bit, 32 aggregate columns (no bit
  fan-out), fingerprint = packed sign bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# minhash parameters (documented constants — change = new signature space)
SHINGLE_K = 8
SHINGLE_STRIDE = 4
N_HASHES = 8
N_BANDS = 4  # rows per band = N_HASHES // N_BANDS = 2
MH_PRIME = 4294967311  # smallest prime > 2^32
# deterministic affine permutation constants (i-th hash: a*x + b mod P).
# All a < 2^30 so a*x stays under 2^62: no int64 overflow under ANSI
# arithmetic in either engine.
MH_A = [1000000007, 998244353, 985661441, 976224257,
        962592769, 950009857, 943718401, 935329793]
MH_B = [1181783497, 2466808117, 3037000499, 1103515245,
        12345, 1588635695, 3267000013, 2038074743]


def _hash32(col):
    """Shared cross-engine 32-bit hash: first 8 hex chars of md5."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def exact_dedup(corpus: DataFrame, id_col: str = "id", text_col: str = "text") -> DataFrame:
    """Duplicate groups by content hash: (content_hash, n_copies,
    keep_id) for groups with >1 member; keep_id is the smallest id (the
    canonical survivor)."""
    return (
        corpus.select(F.md5(text_col).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n_copies"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("n_copies") > 1)
    )


def shingles(corpus: DataFrame, id_col: str = "id", text_col: str = "text") -> DataFrame:
    """Distinct character shingles per doc: (id, shingle). Native
    sequence+explode+substring; docs shorter than K yield the whole
    text as a single shingle."""
    pos = F.explode(
        F.sequence(
            F.lit(1),
            F.greatest(F.length(text_col) - (SHINGLE_K - 1), F.lit(1)),
            F.lit(SHINGLE_STRIDE),
        )
    ).alias("pos")
    return (
        corpus.select(F.col(id_col).alias("id"), F.col(text_col), pos)
        .select(
            "id",
            F.expr(f"substring({text_col}, pos, {SHINGLE_K})").alias("shingle"),
        )
        .distinct()
    )


def minhash_signatures(corpus: DataFrame) -> DataFrame:
    """Per-doc minhash signature: one row per doc, h0..h{N-1} columns."""
    sh = shingles(corpus).withColumn("hv", _hash32(F.col("shingle")))
    aggs = [
        F.min((F.lit(MH_A[i]) * F.col("hv") + F.lit(MH_B[i])) % F.lit(MH_PRIME))
        .alias(f"h{i}")
        for i in range(N_HASHES)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_band_keys(sig: DataFrame) -> DataFrame:
    """(id, band, band_key): band_key is the md5 of the band's hash
    concat — a fixed-width join key that cannot overflow."""
    rows = N_HASHES // N_BANDS
    out = []
    for b in range(N_BANDS):
        cols = [F.col(f"h{b * rows + r}").cast("string") for r in range(rows)]
        out.append(
            sig.select(
                "id",
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("_", *cols)).alias("band_key"),
            )
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


def minhash_lsh_pairs(
    corpus: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Near-duplicate pairs: band-bucket candidates, a SIGNATURE
    prefilter, then exact Jaccard over distinct shingle sets on the
    survivors. Output (id_a, id_b, jaccard) with id_a < id_b and
    jaccard >= threshold.

    The prefilter keeps a candidate only when its signature-estimated
    Jaccard — the fraction of its N_HASHES minhashes that agree — is
    at least the threshold (est >= ceil(threshold * N_HASHES)). At the
    band parameters H=8/B=4 the bucket join admits ~10x false
    candidates near threshold 0.5; the estimate disqualifies ~90% of
    them before the (expensive) shingle-expansion verify join. Like
    the band join itself this step is probabilistic on RECALL (a true
    pair whose signature under-samples its similarity can be pruned;
    for J >= 0.5 the miss rate is P(Bin(6, J) < 2) =~ 1.6%, vanishing
    as J grows), while emitted pairs remain exactly verified."""
    import math

    # the shingle table feeds four consumers (signatures, both sides of
    # the intersection join, sizes): persist it instead of recomputing
    # the scan+explode per consumer. At warehouse scale this would be a
    # materialized intermediate table.
    sh = shingles(corpus).persist()
    sig = minhash_signatures(corpus)
    bands = minhash_band_keys(sig)
    a = bands.select(F.col("id").alias("id_a"), "band", "band_key")
    b = bands.select(F.col("id").alias("id_b"), "band", "band_key")
    cand = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    min_eq = math.ceil(threshold * N_HASHES)
    siga = sig.select(
        F.col("id").alias("id_a"),
        *[F.col(f"h{i}").alias(f"_a{i}") for i in range(N_HASHES)],
    )
    sigb = sig.select(
        F.col("id").alias("id_b"),
        *[F.col(f"h{i}").alias(f"_b{i}") for i in range(N_HASHES)],
    )
    est = None
    for i in range(N_HASHES):
        t = F.when(F.col(f"_a{i}") == F.col(f"_b{i}"), 1).otherwise(0)
        est = t if est is None else est + t
    cand = (
        cand.join(siga, "id_a")
        .join(sigb, "id_b")
        .filter(est >= F.lit(min_eq))
        .select("id_a", "id_b")
    )
    sa = sh.select(F.col("id").alias("id_a"), "shingle")
    sb = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        cand.join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    out = (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb")), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("na") + F.col("nb") - F.col("n_inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def embedding_near_dups(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
    dims: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine) with
    id_a < id_b and cosine >= threshold.

    Default path prunes candidates with the banded hyperplane LSH
    (vector/ann.py) before scoring — the 100 TB shape. ``exact=True``
    scores all pairs (|N|^2; the cross-check baseline for bounded
    corpora only — never the shape to deploy). ``dims`` skips the
    one-row schema probe when the embedding width is known.

    Recall is threshold-dependent: sign-LSH collision probability per
    plane is 1 - theta/pi, so at production near-dup thresholds
    (cosine >= 0.9) a 4x4-band scheme recalls ~99.8% of true pairs,
    while at weak thresholds (0.45, used by the fixture oracle so the
    output is non-empty) recall is ~60% — tested against the exact
    path in tests/test_pipeline_ops.py. The driver oracle mirrors
    the LSH candidate generation exactly (deterministic md5-derived
    planes), so the gate checks cross-engine equivalence of THIS
    algorithm, and the exact-path cross-check pins its recall.
    """
    from ..vector.ann import _as_double, _dot, _norm, lsh_bands
    from pyspark.sql import functions as FF

    v = vectors.select(
        FF.col(id_col).alias("id"), _as_double(FF.col(vec_col)).alias("v")
    ).withColumn("n", _norm(FF.col("v")))
    a = v.select(
        FF.col("id").alias("id_a"), FF.col("v").alias("va"), FF.col("n").alias("na")
    )
    b = v.select(
        FF.col("id").alias("id_b"), FF.col("v").alias("vb"), FF.col("n").alias("nb")
    )
    if exact:
        cand = a.crossJoin(b).filter(FF.col("id_a") < FF.col("id_b"))
    else:
        bands = lsh_bands(vectors, id_col, vec_col, dims=dims)
        ba = bands.withColumnRenamed("id", "id_a")
        bb = bands.withColumnRenamed("id", "id_b")
        pairs = (
            ba.join(bb, ["band", "bucket"])
            .filter(FF.col("id_a") < FF.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        cand = pairs.join(a, "id_a").join(b, "id_b")
    return (
        cand.select(
            "id_a",
            "id_b",
            FF.round(
                _dot(FF.col("va"), FF.col("vb")) / (FF.col("na") * FF.col("nb")),
                6,
            ).alias("cosine"),
        )
        .filter(FF.col("cosine") >= threshold)
    )


SIMHASH_BITS = 32


def simhash(corpus: DataFrame, id_col: str = "id", text_col: str = "text") -> DataFrame:
    """32-bit SimHash over whitespace tokens (multiset): per bit, sum
    +1/-1 by token-hash bit value; fingerprint packs the sign bits.
    All 32 bit-sums are aggregate columns — no row fan-out."""
    toks = corpus.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).withColumn("th", _hash32(F.col("tok")))
    aggs = [
        F.sum(
            (F.floor(F.col("th") / F.lit(1 << b)) % 2) * 2 - 1
        ).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    sums = toks.groupBy("id").agg(*aggs)
    fp = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return sums.select("id", fp.cast("bigint").alias("simhash"))
