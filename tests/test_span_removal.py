"""remove_spans: the APPLY half of exact-substring dedup.

Contract (Lee et al. 2021 span excision, keep-first policy): every
maximal shared span detected by exact_substring_spans is removed from
the LARGER doc id; overlapping or touching intervals merge before
excision; the rebuilt text is the ordered concatenation of kept
segments. Checked against a pure-Python interval-merge reference on
planted corpora, plus structural invariants (smaller id never edited,
char accounting, full-duplicate erasure). Oracle hash-parity rides
tests/test_oracle_parity.py via the declared `span_removal` query.
"""

from __future__ import annotations

from gpd_lite_toolbox_spark.text.dedup import exact_substring_spans, remove_spans


def _run(spark, docs: dict[int, str], min_len: int = 40):
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "id long, text string"
    )
    spans = exact_substring_spans(df, min_len=min_len)
    return {
        r.id: (r.text, r.n_spans, r.n_chars_removed)
        for r in remove_spans(df, spans).collect()
    }


def _excise(text: str, intervals: list[tuple[int, int]]) -> str:
    """Reference: merge 1-based closed [s,e] intervals (touching
    merge) and drop them from text."""
    merged: list[list[int]] = []
    for s, e in sorted(intervals):
        if merged and s <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    keep, cur = [], 1
    for s, e in merged:
        keep.append(text[cur - 1 : s - 1])
        cur = e + 1
    keep.append(text[cur - 1 :])
    return "".join(keep)


BASE = "the quick brown fox jumps over the lazy dog and runs away fast"


def test_span_removed_from_larger_id_only(spark):
    docs = {1: BASE, 2: "XX " + BASE + " YY", 3: "nothing in common here"}
    out = _run(spark, docs)
    assert set(out) == {2}  # only the larger id of the pair is edited
    text, n_spans, n_removed = out[2]
    assert text == _excise(docs[2], [(4, 3 + len(BASE))])
    assert n_spans == 1
    assert n_removed == len(BASE)


def test_full_duplicate_erased_to_empty(spark):
    docs = {1: BASE, 2: BASE}
    out = _run(spark, docs)
    (text, n_spans, n_removed) = out[2]
    assert text == ""
    assert n_spans == 1
    assert n_removed == len(docs[2])


def test_overlapping_spans_from_two_sources_merge(spark):
    # doc 3 shares a prefix-heavy span with doc 1 and a suffix-heavy
    # span with doc 2; the two intervals overlap inside doc 3 and must
    # merge into ONE removal interval.
    left = "A" * 30 + "B" * 30
    right = "B" * 30 + "C" * 30
    docs = {1: "x" + left, 2: right + "y", 3: left + "C" * 30}
    out = _run(spark, docs, min_len=40)
    assert 3 in out
    text, n_spans, n_removed = out[3]
    # every span lands in doc 3 (largest id); homopolymer runs match on
    # many diagonals, but ALL intervals union to the full text.
    assert text == ""
    assert n_removed == len(docs[3])
    assert n_spans == 1


def test_char_accounting_and_untouched_complement(spark):
    shared = "0123456789" * 5  # 50 chars, well over min_len
    docs = {
        1: "keepme-left " + shared + " keepme-right",
        2: shared + "~trailing unique tail content here",
    }
    out = _run(spark, docs)
    assert set(out) == {2}
    text, n_spans, n_removed = out[2]
    assert text == "~trailing unique tail content here"
    assert n_removed == len(shared)
    assert len(docs[2]) - n_removed == len(text)


def test_multiple_disjoint_spans_counted_separately(spark):
    s1 = "alpha beta gamma delta epsilon zeta eta theta!"  # 46 chars
    s2 = "one two three four five six seven eight nine ten"  # 48 chars
    docs = {
        1: s1 + " ~~~ " + s2,
        2: s2 + " ### middle filler text ### " + s1,
    }
    out = _run(spark, docs)
    text, n_spans, n_removed = out[2]
    assert n_spans == 2
    assert n_removed == len(s1) + len(s2)
    assert text == _excise(
        docs[2],
        [(1, len(s2)), (len(docs[2]) - len(s1) + 1, len(docs[2]))],
    )


def test_no_spans_means_no_rows(spark):
    docs = {1: "completely unrelated first document body", 2: "zzz" * 20}
    assert _run(spark, docs) == {}
