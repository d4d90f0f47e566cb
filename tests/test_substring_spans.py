"""exact_substring_spans: maximal shared substrings across doc pairs.

The operator's contract (matching the suffix-array dedup family's
output, Lee et al. 2021, re-derived relationally): one row per MAXIMAL
shared substring of length >= min_len between a document pair, with
1-based start offsets in both documents. Checked against an O(n*m)
brute-force reference, on planted corpora and randomized small-alphabet
strings (the small alphabet forces periodic/overlapping matches), plus
the plan-shape and gram_cap semantics.
"""

from __future__ import annotations

import random
import pytest

from pyspark.sql import functions as F

from gpd_lite_toolbox_spark.text.dedup import exact_substring_spans


def brute_spans(a: str, b: str, min_len: int) -> set[tuple[int, int, int]]:
    """All maximal shared substrings >= min_len: (start_a, start_b,
    length), 1-based. Left-maximal via the mismatch-before check,
    right-maximal by full extension."""
    out = set()
    for i in range(len(a)):
        for j in range(len(b)):
            if a[i] == b[j] and (i == 0 or j == 0 or a[i - 1] != b[j - 1]):
                k = 0
                while i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]:
                    k += 1
                if k >= min_len:
                    out.add((i + 1, j + 1, k))
    return out


def all_pairs_brute(docs: dict[int, str], min_len: int):
    exp = set()
    ids = sorted(docs)
    for x in ids:
        for y in ids:
            if x < y:
                for sa, sb, ln in brute_spans(docs[x], docs[y], min_len):
                    exp.add((x, y, sa, sb, ln))
    return exp


def run_op(spark, docs: dict[int, str | None], min_len: int, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "id long, text string"
    )
    rows = exact_substring_spans(df, min_len=min_len, **kw).collect()
    return {(r.id_a, r.id_b, r.start_a, r.start_b, r.length) for r in rows}


def test_planted_overlaps_match_brute_force(spark):
    docs = {
        1: "the quick brown fox jumps over the lazy dog and runs away fast",
        2: "XX the quick brown fox jumps over the lazy dog and runs away fast YY",
        3: "completely different content with no overlap at all here ok then",
        4: "prefix then the lazy dog and runs away fast suffix padder tail",
        6: "short",
    }
    got = run_op(spark, {**docs, 5: None}, 20)
    exp = all_pairs_brute(docs, 20)
    assert got == exp
    # the full-containment pair reports the whole doc-1 text as one span
    assert (1, 2, 1, 4, len(docs[1])) in got


def test_periodic_text_reports_one_span_per_diagonal(spark):
    # period-2 text: matches exist on every even diagonal; each must
    # still merge to ONE maximal span per diagonal, all genuine.
    docs = {1: "ab" * 30, 2: "zz" + "ab" * 25 + "qq"}
    got = run_op(spark, docs, 12)
    exp = all_pairs_brute(docs, 12)
    assert got == exp
    assert len(got) > 1  # several diagonals survive
    for _, _, sa, sb, ln in got:
        assert docs[1][sa - 1 : sa - 1 + ln] == docs[2][sb - 1 : sb - 1 + ln]


def test_randomized_small_alphabet_vs_brute(spark):
    rng = random.Random(42)
    docs = {}
    base = "".join(rng.choice("abc ") for _ in range(120))
    for i in range(8):
        if i % 3 == 0:
            # plant a shared block inside otherwise-random text
            pre = "".join(rng.choice("abc ") for _ in range(rng.randint(0, 30)))
            suf = "".join(rng.choice("abc ") for _ in range(rng.randint(0, 30)))
            docs[i] = pre + base[20:80] + suf
        else:
            docs[i] = "".join(rng.choice("abc ") for _ in range(100))
    got = run_op(spark, docs, 15)
    exp = all_pairs_brute(docs, 15)
    assert got == exp


def test_gram_cap_drops_hot_grams_conservatively(spark):
    boiler = "subscribe to our newsletter for updates every single day ok"
    # unique single letters (not digits: "doc 0"/"doc 10" would share
    # a rare "0 says:…" gram outside the hot region and legitimately
    # survive the cap)
    docs = {
        i: f"doc {chr(97 + i)} says: {boiler} :: tail {chr(97 + i)}"
        for i in range(20)
    }
    docs[100] = "unique text " + "x" * 20 + " pair partner one two three four"
    docs[101] = "other start " + "x" * 20 + " pair partner one two three four"
    exact = run_op(spark, docs, 20)
    capped = run_op(spark, docs, 20, gram_cap=5)
    # the capped output is a subset: dropping grams never invents spans
    for x, y, sa, sb, ln in capped:
        ta, tb = docs[x], docs[y]
        assert ta[sa - 1 : sa - 1 + ln] == tb[sb - 1 : sb - 1 + ln]
    # the hot boilerplate pairs (190 of them) are suppressed...
    hot = {s for s in capped if s[0] < 100 and s[1] < 100}
    assert not hot
    # ...while the rare pair's span survives the cap untouched
    rare_exact = {s for s in exact if s[0] == 100}
    rare_capped = {s for s in capped if s[0] == 100}
    assert rare_capped == rare_exact and rare_capped


def test_plan_shape_three_exchanges_no_python(spark, sf_dir):
    import __spark_entry__ as E

    df = E.queries()["substring_spans"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = sum(
        1
        for ln in plan.splitlines()
        if "Exchange" in ln
        and "Reused" not in ln
        and "Broadcast" not in ln
    )
    # round-robin width restore + groupBy(gram) + island window; the
    # run aggregate must NOT add a fourth (superset grouping keys).
    # The span-verify text joins are broadcasts (span-table keyed) —
    # not corpus-scale shuffles — so they are excluded from the count.
    assert n <= 3, plan
    assert "Python" not in plan


def test_short_and_null_docs_yield_nothing(spark):
    docs = {1: None, 2: "tiny", 3: "also small"}
    assert run_op(spark, docs, 20) == set()


def test_triple_copy_reports_all_three_pairs(spark):
    t = "a shared passage long enough to clear the threshold easily here"
    docs = {1: t, 2: "pad " + t, 3: t + " tail"}
    got = run_op(spark, docs, len(t) - 2)
    exp = all_pairs_brute(docs, len(t) - 2)
    assert got == exp
    assert {(p[0], p[1]) for p in got} == {(1, 2), (1, 3), (2, 3)}


# round 11 (r10 VERDICT item 1): hypothesis sweep — full lane only.
@pytest.mark.slow
def test_hypothesis_fuzz_including_unicode(spark):
    """Randomized cross-check against the brute-force reference over a
    tiny alphabet that includes multibyte unicode — pins that both the
    operator's character arithmetic (substring/length are CHARACTER
    based) and the md5-of-UTF-8 gram hashing behave identically to a
    pure-Python character-level scan."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    alphabet = "ab é中"  # ascii + accented + CJK

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.text(alphabet=alphabet, min_size=0, max_size=60),
            min_size=2,
            max_size=5,
        )
    )
    def check(texts):
        docs = {i: t for i, t in enumerate(texts)}
        got = run_op(spark, docs, 8)
        exp = all_pairs_brute(docs, 8)
        assert got == exp

    check()
