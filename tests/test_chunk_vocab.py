"""Chunking and vocabulary semantics."""

from __future__ import annotations

from gpd_lite_toolbox_spark.text.corpus import build_vocab, chunk_documents


def _chunks(spark, text, max_tokens, overlap):
    df = spark.createDataFrame([(1, text)], ["id", "text"])
    rows = chunk_documents(df, max_tokens, overlap).collect()
    return sorted(rows, key=lambda r: r["chunk_id"])


def test_short_doc_is_one_chunk(spark):
    out = _chunks(spark, "a b c", 8, 2)
    assert len(out) == 1
    assert out[0]["chunk_text"] == "a b c"
    assert out[0]["chunk_tokens"] == 3 and out[0]["n_chunks"] == 1


def test_sliding_windows_cover_everything_with_overlap(spark):
    words = [f"w{i}" for i in range(10)]
    out = _chunks(spark, " ".join(words), max_tokens=4, overlap=2)
    # stride 2: windows [0:4),[2:6),[4:8),[6:10) -> 4 chunks
    assert [r["chunk_text"].split(" ") for r in out] == [
        words[0:4], words[2:6], words[4:8], words[6:10]
    ]
    assert all(r["n_chunks"] == 4 for r in out)


def test_no_degenerate_tail_chunk(spark):
    # 5 tokens, max 4, stride 2: [0:4),[2:5) — window 1 reaches the
    # final token, so no third all-overlap chunk appears
    words = ["a", "b", "c", "d", "e"]
    out = _chunks(spark, " ".join(words), max_tokens=4, overlap=2)
    assert [r["chunk_text"].split(" ") for r in out] == [
        words[0:4], words[2:5]
    ]
    assert out[-1]["chunk_tokens"] == 3


def test_chunk_param_validation(spark):
    df = spark.createDataFrame([(1, "x")], ["id", "text"])
    import pytest

    with pytest.raises(ValueError):
        chunk_documents(df, 4, overlap=4)


def test_build_vocab_ranks_and_coverage(spark):
    df = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a b  d")], ["id", "text"]
    )
    out = {r["rank"]: r.asDict() for r in build_vocab(df, top_n=3).collect()}
    # counts: b=4 a=3 c=1 d=1; total=9; c beats d on term asc tiebreak
    assert [out[i]["term"] for i in (1, 2, 3)] == ["b", "a", "c"]
    assert out[1]["n_docs"] == 2 and out[3]["n_docs"] == 1
    assert abs(out[1]["cum_share"] - round(4 / 9, 6)) < 1e-12
    assert abs(out[3]["cum_share"] - round(8 / 9, 6)) < 1e-12
    shares = [out[i]["cum_share"] for i in (1, 2, 3)]
    assert shares == sorted(shares) and shares[-1] <= 1.0


def test_normalize_text_semantics(spark):
    from gpd_lite_toolbox_spark.text.pipeline import normalize_corpus

    rows = [
        (1, "  Hello,   WORLD!! (test) e-mail: a@b.io  "),
        (2, "already clean text"),
        (3, "!!!"),
    ]
    out = {
        r["id"]: r.asDict()
        for r in normalize_corpus(
            spark.createDataFrame(rows, ["id", "text"])
        ).collect()
    }
    assert out[1]["text"] == "hello world test e mail a b io"
    assert out[2]["text"] == "already clean text"
    assert out[3]["text"] == "" and out[3]["n_chars_norm"] == 0
    assert out[1]["n_chars_raw"] == len(rows[0][1])
