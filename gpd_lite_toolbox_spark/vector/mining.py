"""Training-pair mining over embedding columns.

The reference (mthh/gpd_lite_toolbox) has no vector surface; this
module comes from the builder's LLM-training-data brief: contrastive
embedding training needs, for every anchor, the most similar vectors
that are NOT of the anchor's class — "hard negatives", the pairs that
actually move the loss. The search substrate is vector/ann.py's proven
kernel set (Arrow dot products, WindowGroupLimit top-k) with a label
inequality spliced into the pair generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ann import _norm_col, _rank_topk, _score_pairs


def hard_negatives(
    queries: DataFrame,
    vectors: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    dims: int | None = None,
) -> DataFrame:
    """Top-``k`` hard negatives per query: the corpus vectors MOST
    similar (cosine) to each anchor among those with a DIFFERENT
    label — the standard negative-mining step for contrastive /
    metric-learning batches (easy negatives are already far; these are
    the informative ones).

    Output ``(query_id, neighbor_id, cosine, rank)`` with the ANN
    family's tie contract (cosine desc, neighbor asc; cosine rounded
    to 6dp).

    Scale shape: the anchor side (a training batch, bounded) is
    BROADCAST; the corpus streams through one map pass — the label
    inequality rides the broadcast nested-loop join exactly like
    ``cosine_topk``'s exact baseline, and the top-k runs as
    WindowGroupLimit partial heaps before the one query-keyed
    exchange. For unbounded anchor sets swap the candidate step to
    ``ann_lsh_topk``'s banding and keep this verify/rank tail.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col(label_col).alias("_ql"),
    ).withColumn("qn", _norm_col(F.col("qv"), dims))
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        F.col(label_col).alias("_nl"),
    ).withColumn("nn", _norm_col(F.col("nv"), dims))
    pairs = v.join(F.broadcast(q), F.col("_ql") != F.col("_nl"))
    return _rank_topk(_score_pairs(pairs, dims), k)
