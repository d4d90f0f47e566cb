"""Ranked text retrieval: BM25 top-k over the document corpus.

Extension beyond gpd_lite_toolbox (BASELINE.json north star: the
LLM-pipeline text family) — the query-side complement of the dedup
operators: given a bag of query terms, return the k best documents
under Okapi BM25 (Robertson & Walker, with the Lucene ``ln(1 + ...)``
idf that keeps weights positive).

Scale design (the 100 TB shape):

- Per-term tf is computed with higher-order array functions
  (``size(filter(tokens, t -> t = term))``) — no explode, no posting
  shuffle: a corpus of any size is one map-side scan. The classic
  inverted-index explode costs |tokens| shuffle rows; for a FIXED
  small query this is strictly worse than scanning, because only the
  handful of query terms matter.
- Corpus statistics (N, total length, per-term document frequency)
  reduce to ONE single-row aggregate (partial-aggregated map-side),
  broadcast back as a literal-free cross join — no second pass, no
  driver round-trip in the plan.
- Scoring is a pure codegen expression; the global top-k is
  ``ORDER BY ... LIMIT k``, which Spark executes as per-partition
  partial top-k (TakeOrdered) — never a full sort.
- Documents containing no query term are filtered before the sort, so
  the top-k heap sees only matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_topk(
    corpus: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.5,
    b: float = 0.75,
    id_col: str = "id",
    text_col: str = "text",
) -> DataFrame:
    """(rank, id, score): top-``k`` documents for ``query_terms``.

    Tokenization is the engine's corpus convention (single-spaced
    text, whitespace split — see text/analysis.py). Score is rounded
    to 6 decimals and ties (including at the k boundary) break by
    ascending id, so the result set is deterministic across engines.

    ``k1`` defaults to 1.5 — inside the standard 1.2–2.0 band — so
    every derived constant (k1+1 = 2.5, 1-b = 0.25) is exactly
    representable in binary and the scoring expression is reproducible
    op-for-op across engines.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = F.split(F.col(text_col), " ")

    def _tf(term: str):
        # single-parameter lambda: a second parameter would make
        # pyspark pass the ELEMENT INDEX as that argument
        return F.size(F.filter(toks, lambda t: t == F.lit(term)))

    tf_cols = [
        _tf(term).alias(f"tf_{i}") for i, term in enumerate(query_terms)
    ]
    docs = corpus.select(
        F.col(id_col).alias("id"), F.size(toks).alias("dl"), *tf_cols
    )
    stats = docs.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("bigint")).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = docs.join(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    score = None
    for i in range(len(query_terms)):
        tf = F.col(f"tf_{i}").cast("double")
        df = F.col(f"df_{i}").cast("double")
        idf = F.ln(
            (F.col("n_docs") - df + 0.5) / (df + 0.5) + 1.0
        )
        term_score = idf * (
            tf * (k1 + 1.0)
        ) / (tf + k1 * (1.0 - b + b * (F.col("dl") / avgdl)))
        score = term_score if score is None else score + term_score
    any_match = None
    for i in range(len(query_terms)):
        c = F.col(f"tf_{i}") > 0
        any_match = c if any_match is None else (any_match | c)
    topk = (
        scored.filter(any_match)
        .select("id", F.round(score, 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
    )
    # rank over k rows only (the global sort already happened as a
    # partial top-k); the single-partition window is k-sized, not
    # corpus-sized
    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "rank", "id", "score"
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    k_rrf: int = 60,
    id_col: str = "id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked lists (Cormack et al.):
    ``score(d) = sum_i 1 / (k_rrf + rank_i(d))``, a document absent
    from a list contributing 0 for that list.

    Output: (rank, id, rrf, rank_0..rank_{N-1}) — the per-list ranks
    kept (NULL where the list missed the document) so callers can see
    WHICH signal surfaced each hit.

    Scale design: each input is already a top-depth list (depth rows,
    not corpus rows), so the N-way full-outer join is bounded by
    N x depth regardless of corpus size; the final top-k is a sort
    over <= N x depth rows. The expensive work — producing the input
    rankings — stays in the upstream operators (bm25_topk's map-side
    scan, cosine_topk / ann_lsh_topk's banded candidates), which are
    each individually 100 TB-shaped. RRF itself adds no corpus-sized
    shuffle.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    fused = None
    for i, r in enumerate(rankings):
        side = r.select(
            F.col(id_col).alias("id"),
            F.col(rank_col).cast("int").alias(f"rank_{i}"),
        )
        fused = (
            side
            if fused is None
            else fused.join(side, on="id", how="full_outer")
        )
    rrf = None
    for i in range(len(rankings)):
        term = F.coalesce(
            1.0 / (F.lit(float(k_rrf)) + F.col(f"rank_{i}").cast("double")),
            F.lit(0.0),
        )
        rrf = term if rrf is None else rrf + term
    ranked = (
        fused.select(
            "id",
            F.round(rrf, 6).alias("rrf"),
            *[f"rank_{i}" for i in range(len(rankings))],
        )
        .orderBy(F.col("rrf").desc(), F.col("id").asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("rrf").desc(), F.col("id").asc())
    return ranked.withColumn("rank", F.row_number().over(w)).select(
        "rank",
        "id",
        "rrf",
        *[f"rank_{i}" for i in range(len(rankings))],
    )


def hybrid_topk(
    corpus: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    k: int = 10,
    depth: int = 50,
    k_rrf: int = 60,
    id_col: str = "id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid lexical+dense retrieval: BM25 over the text corpus and
    exact cosine over the embedding table, fused with reciprocal-rank
    fusion. ``embeddings.vec_id`` is the embedding of document
    ``corpus.id`` (the RAG-corpus convention); the dense query is the
    embedding row ``query_vec_id``.

    Output: (rank, id, rrf, rank_0, rank_1) with rank_0 = BM25 rank,
    rank_1 = dense rank (NULL where that signal missed the doc).

    Scale: BM25 is one map-side scan + single-row stats broadcast;
    the dense side broadcasts ONE query vector over the corpus with a
    partial top-k (WindowGroupLimit) — swap in ann_lsh_topk /
    ann_ivf_topk for the candidate-limited form at larger corpora and
    the fusion is unchanged (rrf_fuse only sees depth-sized lists).
    """
    from ..vector.ann import cosine_topk

    lex = bm25_topk(
        corpus,
        query_terms,
        k=depth,
        id_col=id_col,
        text_col=text_col,
    )
    dense = cosine_topk(
        embeddings.filter(F.col(vec_id_col) == query_vec_id),
        embeddings,
        k=depth,
        id_col=vec_id_col,
        vec_col=vec_col,
    ).select(F.col("neighbor_id").alias("id"), "rank")
    return rrf_fuse([lex, dense], k=k, k_rrf=k_rrf)
