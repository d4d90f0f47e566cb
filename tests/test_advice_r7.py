"""Regression pins for the round-7 ADVICE items."""

import pytest
from pyspark.sql import functions as F

from gpd_lite_toolbox_spark.text.unigram import (
    UNK_CHAR_COST,
    segment_pieces_py,
    segment_word_py,
    unigram_encode,
    unigram_fertility,
)


QUOTED_PIECES = [
    ("don't", 10),
    ("n't", 20),
    ("a\\b", 15),
    ("'", 30),
    ("\\", 31),
    ("do", 40),
]


def test_quoted_and_backslash_pieces_parse_on_spark(spark):
    """ADVICE r7 (medium): piece strings with apostrophes/backslashes
    are interpolated into the Spark map literal — they must escape,
    not raise AnalysisException, and segment identically to the
    pure-Python DP."""
    docs = spark.createDataFrame(
        [(1, "don't a\\b ' \\ dodo")], "id bigint, text string"
    )
    rows = (
        unigram_encode(docs, pieces=QUOTED_PIECES, max_len=5)
        .orderBy("pos")
        .collect()
    )
    got = [r.token for r in rows]
    want = []
    for w in "don't a\\b ' \\ dodo".split(" "):
        want.extend(segment_pieces_py(w, pieces=QUOTED_PIECES, max_len=5))
    assert got == want
    assert "don't" in got and "a\\b" in got


def test_quoted_pieces_fertility_matches_python(spark):
    docs = spark.createDataFrame(
        [("s1", "don't don't")], "source string, text string"
    )
    row = unigram_fertility(docs, pieces=QUOTED_PIECES).collect()[0]
    cost, np = segment_word_py("don't", pieces=QUOTED_PIECES)
    assert row.n_words == 2
    assert row.n_pieces == 2 * np
    assert row.total_cost == 2 * cost


def test_duplicate_pieces_raise_everywhere(spark):
    """ADVICE r7 (low): duplicate piece strings made the three
    implementations diverge (dict keeps last, Spark map throws, DuckDB
    MAX picks max) — entry validation raises one loud error instead."""
    dup = [("ab", 10), ("ab", 20), ("c", 5)]
    with pytest.raises(ValueError, match="duplicate piece"):
        segment_word_py("abc", pieces=dup)
    with pytest.raises(ValueError, match="duplicate piece"):
        segment_pieces_py("abc", pieces=dup)
    docs = spark.createDataFrame([(1, "abc")], "id bigint, text string")
    with pytest.raises(ValueError, match="duplicate piece"):
        unigram_fertility(
            docs.withColumn("source", F.lit("s")), pieces=dup
        )
    with pytest.raises(ValueError, match="duplicate piece"):
        unigram_encode(docs, pieces=dup)


def test_unk_fallback_still_on_single_chars(spark):
    """The escaping path must not disturb the UNK fallback: a word of
    uninventoried chars costs len * UNK_CHAR_COST."""
    cost, np = segment_word_py("don't", pieces=[("x", 1)])
    assert cost == 5 * UNK_CHAR_COST and np == 5
