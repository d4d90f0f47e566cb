"""Cross-implementation property tests: the engine's replace-based text
counting must agree with direct Python string operations on arbitrary
single-spaced text (the corpus contract)."""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

word = st.text(
    alphabet=st.sampled_from("abcdefgh theankspark"), min_size=1, max_size=8
).filter(lambda w: " " not in w)
texts = st.lists(word, min_size=1, max_size=30).map(" ".join)


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@settings(max_examples=15, deadline=None)
@given(st.lists(texts, min_size=1, max_size=8))
def test_token_stats_matches_python(_spark, docs):
    from gpd_lite_toolbox_spark.text.analysis import token_stats

    df = _spark.createDataFrame(
        pd.DataFrame({"id": range(len(docs)), "text": docs}),
        schema="id bigint, text string",
    )
    out = {r.id: r for r in token_stats(df).collect()}
    for i, t in enumerate(docs):
        toks = t.split(" ")
        r = out[i]
        assert r.n_chars == len(t)
        assert r.n_tokens == len(toks)
        padded = f" {t} "
        expected_stops = padded.count(" the ") + padded.count(" a ")
        # replace-based counting is non-overlapping left-to-right; for
        # repeated adjacent stopwords Python's str.count matches the
        # same scan rule, so equality holds
        assert r.n_stopwords == expected_stops, t


@settings(max_examples=15, deadline=None)
@given(texts)
def test_fingerprint_matches_hashlib(_spark, doc):
    import hashlib

    from gpd_lite_toolbox_spark.text.analysis import fingerprint

    df = _spark.createDataFrame(
        pd.DataFrame({"id": [0], "text": [doc]}), schema="id bigint, text string"
    )
    got = fingerprint(df).collect()[0].fingerprint
    assert got == hashlib.md5(doc.lower().strip().encode()).hexdigest()
