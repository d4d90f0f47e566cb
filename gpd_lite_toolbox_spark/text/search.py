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
