"""Naive Bayes classifier: closed-form checks and pipeline behavior."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gpd_lite_toolbox_spark.text.classify import (
    nb_confusion,
    score_nb,
    train_nb,
)


def test_train_nb_closed_form(spark):
    """Hand-computed Laplace-smoothed model on a 2-doc corpus:
    vocabulary {a, b, c} (V=3); class x has tokens [a, a, b] (3),
    class y has [c] (1)."""
    df = spark.createDataFrame(
        [(1, "a a b", "x"), (2, "c", "y")], "id long, text string, label string"
    )
    model, classes = train_nb(df)
    m = {(r.label, r.tok): r.log_cond for r in model.collect()}
    assert math.isclose(m[("x", "a")], math.log((2 + 1) / (3 + 3)))
    assert math.isclose(m[("x", "b")], math.log((1 + 1) / (3 + 3)))
    assert math.isclose(m[("y", "c")], math.log((1 + 1) / (1 + 3)))
    c = {r.label: (r.log_prior, r.log_default) for r in classes.collect()}
    assert math.isclose(c["x"][0], math.log(0.5))
    assert math.isclose(c["x"][1], math.log(1 / 6))
    assert math.isclose(c["y"][1], math.log(1 / 4))


def test_separable_classes_classify_perfectly(spark):
    """Disjoint vocabularies must yield a purely diagonal confusion
    matrix."""
    rows = []
    for i in range(30):
        rows.append((i, "alpha beta gamma alpha", "g"))
        rows.append((100 + i, "delta epsilon zeta zeta", "h"))
    df = spark.createDataFrame(rows, "id long, text string, label string")
    conf = {
        (r.actual, r.predicted): r.n_docs for r in nb_confusion(df).collect()
    }
    assert conf == {("g", "g"): 30, ("h", "h"): 30}


def test_score_nb_tie_breaks_on_class_name(spark):
    """A perfectly symmetric corpus ties every score; the argmax must
    deterministically pick the lexicographically first class."""
    df = spark.createDataFrame(
        [(1, "t", "b"), (2, "t", "a")], "id long, text string, label string"
    )
    model, classes = train_nb(df)
    probe = spark.createDataFrame([(9, "t")], "id long, text string")
    got = score_nb(probe, model, classes).collect()
    assert len(got) == 1 and got[0].label == "a"


def test_score_unseen_tokens_use_default(spark):
    """A doc of only unseen tokens scores with the per-class fallback:
    the class with the larger (total + V) denominator loses."""
    df = spark.createDataFrame(
        [(1, "a a a a a", "big"), (2, "z", "small")],
        "id long, text string, label string",
    )
    model, classes = train_nb(df)
    probe = spark.createDataFrame([(9, "q q q")], "id long, text string")
    got = score_nb(probe, model, classes).collect()
    # 'small' class: total=1, V=2 -> default ln(1/3) beats 'big'
    # (total=5 -> ln(1/7)); priors are equal (1 doc each)
    assert got[0].label == "small"


def test_nb_plan_stays_native(spark, sf_dir):
    import __spark_entry__ as E

    plan = (
        E.queries()["nb_classify"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan


def test_nb_scoring_new_docs_deterministic(spark):
    """Scoring is pure: the same model applied twice produces the
    identical assignment table."""
    rows = [(i, f"w{i % 7} w{(i + 1) % 7} common", "c" + str(i % 3))
            for i in range(60)]
    df = spark.createDataFrame(rows, "id long, text string, label string")
    model, classes = train_nb(df)
    probe = df.select("id", "text")
    a = sorted((r.id, r.label, r.score) for r in score_nb(probe, model, classes).collect())
    b = sorted((r.id, r.label, r.score) for r in score_nb(probe, model, classes).collect())
    assert a == b and len(a) == 60


def test_fuzzy_pairs_complete_vs_bruteforce(spark):
    """FastSS candidates + levenshtein verify must equal the all-pairs
    distance-1 set, including substitution / insertion / deletion /
    1-char-token / duplicate-deletion-form edges."""
    from gpd_lite_toolbox_spark.text.fuzzy import fuzzy_token_pairs

    words = [
        "cat", "bat", "cats", "at", "a", "b", "aa",
        "window", "windw", "wxndow", "totally",
    ]
    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], "id long, text string")
    got = {(r.tok_a, r.tok_b, r.dist) for r in fuzzy_token_pairs(df).collect()}

    def lev(s, t):
        import functools

        @functools.lru_cache(maxsize=None)
        def d(i, j):
            if i == 0:
                return j
            if j == 0:
                return i
            return min(
                d(i - 1, j) + 1,
                d(i, j - 1) + 1,
                d(i - 1, j - 1) + (s[i - 1] != t[j - 1]),
            )
        return d(len(s), len(t))

    exp = set()
    for x in words:
        for y in words:
            if x < y and lev(x, y) <= 1:
                exp.add((x, y, lev(x, y)))
    assert got == exp
    assert ("a", "b", 1) in got  # 1-char substitution via the '' key
    assert ("cat", "cats", 1) in got  # insertion
    assert ("bat", "cat", 1) in got  # substitution
