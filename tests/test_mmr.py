"""MMR diversified top-k (vector/mmr.py): selection semantics pinned
against a hand-built geometry where plain top-k and MMR must differ;
engine parity runs in test_oracle_parity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from gpd_lite_toolbox_spark.vector.ann import cosine_topk
from gpd_lite_toolbox_spark.vector.mmr import mmr_topk


def _vecs(spark):
    # query 0 at e1; two near-identical relevant vectors (1, 2) hugging
    # e1; one less-relevant but orthogonal-ish vector (3); a filler (4).
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.14, 0.0, 0.0]),
        (2, [0.99, 0.141, 0.0, 0.0]),
        (3, [0.5, 0.0, 0.87, 0.0]),
        (4, [0.3, 0.1, 0.2, 0.93]),
    ]
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id bigint, embedding array<float>",
    )


def test_mmr_skips_redundant_neighbor(spark):
    emb = _vecs(spark)
    q = emb.filter(F.col("vec_id") == 0)
    # plain top-2 returns the twin pair 1, 2
    plain = cosine_topk(q, emb, k=3).filter(
        F.col("neighbor_id") != 0
    )
    top2 = [
        r["neighbor_id"]
        for r in plain.orderBy("rank").collect()[:2]
    ]
    assert set(top2) == {1, 2}
    # MMR at k=2 keeps one twin and spends slot 2 on the diverse 3
    # (lam=0.5: the twin's ~0.9999 similarity to pick 1 outweighs its
    # relevance edge over the orthogonal-ish candidate)
    got = mmr_topk(q, emb, k=2, n_candidates=4, lam=0.5).orderBy(
        "mmr_rank"
    ).collect()
    assert [r["neighbor_id"] for r in got] == [1, 3]
    assert [r["mmr_rank"] for r in got] == [1, 2]


def test_mmr_matches_python_reference(spark):
    emb = _vecs(spark)
    q = emb.filter(F.col("vec_id") == 0)
    got = {
        (r["neighbor_id"], r["mmr_rank"]): (r["cosine"], r["mmr"])
        for r in mmr_topk(q, emb, k=3, n_candidates=4, lam=0.7).collect()
    }
    V = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.collect()
    }

    def cos(a, b):
        d = 0.0
        for x, y in zip(V[a], V[b]):
            d += x * y
        na = nb = 0.0
        for x in V[a]:
            na += x * x
        for x in V[b]:
            nb += x * x
        return round(d / (math.sqrt(na) * math.sqrt(nb)), 6)

    lam = 0.7
    scored = sorted(
        ((cos(0, n), n) for n in V if n != 0),
        key=lambda t: (-t[0], t[1]),
    )[:4]
    sel: list = []
    for t in range(1, 4):
        best = None
        for c_cos, c_id in scored:
            if any(s[1] == c_id for s in sel):
                continue
            ms = max((cos(c_id, s[1]) for s in sel), default=0.0)
            m = round(lam * c_cos - (1 - lam) * ms + 1e-9, 6)
            if best is None or m > best[0] or (
                m == best[0] and c_id < best[1]
            ):
                best = (m, c_id, c_cos)
        sel.append(best)
        assert got[(best[1], t)] == (best[2], best[0]), t


def test_mmr_short_candidate_list_returns_fewer_rows(spark):
    emb = _vecs(spark)
    q = emb.filter(F.col("vec_id") == 0)
    # only 4 non-self candidates exist; k=4 over n_candidates=4 is fine
    got = mmr_topk(q, emb, k=4, n_candidates=4).collect()
    assert len(got) == 4
    assert sorted(r["mmr_rank"] for r in got) == [1, 2, 3, 4]


def test_mmr_plan_shape(spark):
    # ONE rank window (self filtered before ranking, no re-rank pass),
    # query side broadcast into the scoring join, no corpus re-join
    # for the pair-sim terms (vectors ride through the window).
    emb = _vecs(spark)
    q = emb.filter(F.col("vec_id") == 0)
    import re

    plan = (
        mmr_topk(q, emb, k=2, n_candidates=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # anchored node-header matches (ADVICE r7: raw substring counts
    # were brittle against plan-rendering changes — "Window" matched
    # WindowGroupLimit, "Join" matched unrelated text): a node header
    # is the operator name right after the tree-prefix "+- "/":- "
    # (or start of line), followed by a space or "(".
    def nodes(name: str) -> int:
        return len(
            re.findall(
                rf"(?m)(?:^|[+:]- )(?:\*\(\d+\) )?{name}[ (]", plan
            )
        )

    assert nodes("Window") <= 2
    assert nodes("BroadcastNestedLoopJoin") >= 1
    # exactly one join in the whole plan: the broadcast cross of the
    # query side; a second would be the rejected corpus re-join
    assert nodes(r"\w*Join\w*") <= 1


def test_mmr_guards():
    with pytest.raises(ValueError):
        mmr_topk(None, None, k=0)
    with pytest.raises(ValueError):
        mmr_topk(None, None, k=5, n_candidates=3)
