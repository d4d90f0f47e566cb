"""Maximal Marginal Relevance (MMR) diversified top-k over embedding
columns — the diversity-aware re-rank step a retrieval/curation
pipeline runs after candidate generation (Carbonell & Goldstein 1998,
public), missing from plain top-k: of two near-duplicate neighbors,
plain cosine top-k returns both; MMR returns one and spends the slot
on the next-most-relevant NON-redundant result.

Contract: candidates = the query's top ``n_candidates`` non-self
neighbors by rounded cosine (the exact ``cosine_topk`` tie rule), then
``k`` greedy MMR picks: at each step the remaining candidate
maximizing ``round(lam * cos(q, c) - (1 - lam) * max_sel_sim, 6)``
(``max_sel_sim`` = max rounded cosine between the candidate and every
already-selected result, 0.0 when none are selected yet), ties by
neighbor id ascending.  Every similarity is the shared rounded-cosine
definition (ann._cosine_col order), so the greedy walk is replayed
bit-exactly by the DuckDB oracle's unrolled selection stages
(oracles.MMR_TOPK).

Execution shape: candidate generation is the ANN family (the exact
baseline here; swap in ``ann_lsh_topk``/``ann_ivf_topk`` candidates at
scale — the MMR stage only sees (query, candidate) rows).  The
selection itself collects each query's ≤ n_candidates candidates into
ONE row (a single partial-combined aggregate keyed by query_id) and
runs the whole greedy loop as a row-local expression fold — no
per-step shuffle, no driver loop, no UDF.  Work per query is
``k * n_candidates`` pair similarities; the output is |Q| x k.  At
100 TB the stage is bounded by the query set, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..numerics import r6
from .ann import _as_double, _corpus_side, _cosine_col, _dot, _query_side


def _pair_sim(a_nv, a_nn, b_nv, b_nn):
    """Rounded cosine between two candidate structs' vectors — the
    fold form of the shared definition (left-to-right accumulation,
    round 6), evaluated inside the selection loop.  Vectors arrive as
    the raw float arrays (kept narrow through the top-k shuffle) and
    cast per evaluation, which is the same arithmetic as pre-cast
    doubles."""
    return F.round(
        _dot(_as_double(a_nv), _as_double(b_nv)) / (a_nn * b_nn), 6
    )


def mmr_topk(
    queries: DataFrame,
    vectors: DataFrame,
    k: int = 5,
    n_candidates: int = 20,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
    max_pairs: int = 100_000_000,
    force: bool = False,
) -> DataFrame:
    """Diversified top-k: for each query, ``k`` MMR-selected results
    out of its ``n_candidates`` nearest non-self neighbors.

    Output: ``(query_id, neighbor_id, cosine, mmr, mmr_rank)`` —
    ``cosine`` the relevance that admitted the candidate, ``mmr`` the
    score at its selection step, ``mmr_rank`` the selection order
    (1-based).  Queries with fewer candidates than ``k`` return fewer
    rows.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_candidates < k:
        raise ValueError(
            f"n_candidates ({n_candidates}) must be >= k ({k})"
        )
    if not force:
        n_q, n_v = queries.count(), vectors.count()
        if n_q * n_v > max_pairs:
            raise ValueError(
                f"mmr_topk's candidate stage is the exact brute-force "
                f"scan: {n_q} queries x {n_v} corpus rows = "
                f"{n_q * n_v} pairs exceeds max_pairs={max_pairs}. "
                f"Feed it bucketed candidates (ann_lsh_topk / "
                f"ann_ivf_topk recall sets) at this scale, or pass "
                f"force=True."
            )
    # top n_candidates NON-SELF neighbors, scored inline (the
    # cosine_topk plan with self filtered BEFORE the rank window) and
    # CARRYING each candidate's raw vector + norm through the window —
    # the partial top-k (WindowGroupLimit) prunes to ~|Q| x
    # n_candidates rows per partition before the shuffle, and no
    # corpus re-join is needed for the pairwise-similarity terms.
    qs = F.broadcast(_query_side(queries, id_col, vec_col, dims))
    vs = _corpus_side(vectors, id_col, vec_col, dims, spread=True)
    scored = (
        vs.crossJoin(qs)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            _cosine_col(
                F.col("qv"), F.col("nv"), F.col("qn"), F.col("nn"),
                dims,
            ).alias("cosine"),
            "nv",
            "nn",
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    cand = (
        scored.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= n_candidates)
        .select("query_id", "neighbor_id", "cosine", "crank", "nv", "nn")
    )
    # ONE row per query: candidates in deterministic crank order.
    per_q = cand.groupBy("query_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct("crank", "neighbor_id", "cosine", "nv", "nn")
            )
        ).alias("rem")
    )
    # greedy selection as ONE row-local fold over the k steps: the
    # whole loop state (selected structs for the pair-sim terms,
    # remaining candidates, report rows) flows through the fold's
    # accumulator, so the expression tree stays the size of ONE step
    # body — a per-step column chain was tried and rejected (each
    # step's argmax substitutes into three downstream columns, a 3^k
    # optimizer-time blow-up).
    cand_t = (
        "struct<crank:int,neighbor_id:bigint,cosine:double,"
        "nv:array<float>,nn:double>"
    )
    out_t = (
        "array<struct<neighbor_id:bigint,cosine:double,"
        "mmr:double,mmr_rank:int>>"
    )
    scored_t = f"struct<m:double,c:{cand_t}>"
    state_t = f"struct<sel:array<{cand_t}>,rem:array<{cand_t}>,out:{out_t}>"
    lam = float(lam)

    def step(acc, t):
        # r6 (numerics.py): lam * a 6-decimal cosine is a 7-decimal
        # value, i.e. a rounding-boundary case ~10% of the time, where
        # Spark HALF_UP and DuckDB's scaled round split within an ulp;
        # the shared 1e-9 shift puts both engines on the same side.
        mmr_of = lambda c: r6(  # noqa: E731
            F.lit(lam) * c["cosine"]
            - F.lit(1.0 - lam)
            * F.coalesce(
                F.array_max(
                    F.transform(
                        acc["sel"],
                        lambda s: _pair_sim(
                            c["nv"], c["nn"], s["nv"], s["nn"]
                        ),
                    )
                ),
                F.lit(0.0),
            ),
            6,
        )
        best = F.aggregate(
            F.transform(
                acc["rem"],
                lambda c: F.struct(
                    mmr_of(c).alias("m"), c.alias("c")
                ),
            ),
            F.lit(None).cast(scored_t),
            lambda b, x: F.when(
                b.isNull()
                | (x["m"] > b["m"])
                | (
                    (x["m"] == b["m"])
                    & (x["c"]["neighbor_id"] < b["c"]["neighbor_id"])
                ),
                x,
            ).otherwise(b),
        )
        return F.when(
            best.isNotNull(),
            F.struct(
                F.concat(acc["sel"], F.array(best["c"])).alias("sel"),
                F.filter(
                    acc["rem"],
                    lambda c: c["neighbor_id"]
                    != best["c"]["neighbor_id"],
                ).alias("rem"),
                F.concat(
                    acc["out"],
                    F.array(
                        F.struct(
                            best["c"]["neighbor_id"].alias(
                                "neighbor_id"
                            ),
                            best["c"]["cosine"].alias("cosine"),
                            best["m"].alias("mmr"),
                            t.cast("int").alias("mmr_rank"),
                        )
                    ),
                ).alias("out"),
            ),
        ).otherwise(acc)

    init = F.struct(
        F.lit([]).cast(f"array<{cand_t}>").alias("sel"),
        F.col("rem").alias("rem"),
        F.lit([]).cast(out_t).alias("out"),
    ).cast(state_t)
    final = F.aggregate(
        F.sequence(F.lit(1), F.lit(int(k))), init, step
    )
    return per_q.select(
        "query_id", F.explode(final["out"]).alias("_o")
    ).select(
        "query_id",
        F.col("_o")["neighbor_id"].alias("neighbor_id"),
        F.col("_o")["cosine"].alias("cosine"),
        F.col("_o")["mmr"].alias("mmr"),
        F.col("_o")["mmr_rank"].alias("mmr_rank"),
    )
