"""Hypothesis property tests for the session-7 ops: BPE training
against the pure-Python reference on arbitrary corpora, merge-fold
semantics on arbitrary symbol runs, and PageRank invariants on random
graphs."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.test_session7_ops import _ref_bpe

# round 11 (r10 VERDICT item 1): hypothesis property sweep —
# excluded from the default lane so the driver's gate completes;
# the full lane (pytest -m "") runs it.
pytestmark = pytest.mark.slow


word = st.text(
    alphabet=st.sampled_from("abcde"), min_size=1, max_size=6
)
texts = st.lists(word, min_size=1, max_size=12).map(" ".join)


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@settings(max_examples=8, deadline=None)
@given(st.lists(texts, min_size=1, max_size=5))
def test_bpe_train_matches_reference_on_arbitrary_corpora(_spark, docs):
    """Two independent BPE implementations (distributed fold vs plain
    Python loop) agree exactly — order, pairs, counts — on arbitrary
    small-alphabet corpora, where repeated adjacent symbols stress the
    greedy non-overlapping merge rule hardest."""
    from gpd_lite_toolbox_spark.text.bpe import bpe_train

    df = _spark.createDataFrame(
        pd.DataFrame({"id": range(len(docs)), "text": docs}),
        schema="id bigint, text string",
    )
    got = [
        (r.step, r.left, r.right, r.cnt)
        for r in bpe_train(df, n_merges=3).orderBy("step").collect()
    ]
    assert got == _ref_bpe(docs, 3)


@settings(max_examples=12, deadline=None)
@given(st.lists(st.sampled_from("ab"), min_size=1, max_size=10))
def test_apply_merge_fold_matches_greedy_python(_spark, syms):
    """The row-local fold implements greedy left-to-right
    non-overlapping merging — checked against the obvious Python loop
    on arbitrary a/b runs (overlap torture: 'aaaa', 'abab', ...)."""
    from pyspark.sql import functions as F

    from gpd_lite_toolbox_spark.text.bpe import _apply_merge

    df = _spark.createDataFrame([(syms,)], "syms array<string>")
    got = df.select(_apply_merge(F.col("syms"), "a", "b").alias("m")).collect()[
        0
    ]["m"]
    want: list[str] = []
    for t in syms:
        if want and want[-1] == "a" and t == "b":
            want[-1] = "ab"
        else:
            want.append(t)
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from("abcdef"), st.sampled_from("abcdef")),
        min_size=1,
        max_size=12,
    )
)
def test_pagerank_invariants_on_random_graphs(_spark, edge_list):
    """On any graph: rank mass sums to 1 and every node holds at
    least the teleport floor (1-d)/N."""
    from gpd_lite_toolbox_spark.text.web import pagerank

    df = _spark.createDataFrame(
        pd.DataFrame(edge_list, columns=["src", "dst"]),
        schema="src string, dst string",
    )
    out = pagerank(df, iters=3, damping=0.85).collect()
    n = len(out)
    assert abs(sum(r["rank"] for r in out) - 1.0) < 1e-9
    floor = (1.0 - 0.85) / n
    assert all(r["rank"] >= floor - 1e-12 for r in out)
