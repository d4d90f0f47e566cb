"""Boilerplate line removal: planted repeated lines, order
preservation, fully-boilerplate docs."""

from __future__ import annotations

from gpd_lite_toolbox_spark.text.pipeline import remove_boilerplate_lines

COOKIE = "accept cookies to continue"
NAV = "home | products | about"


def test_boilerplate_lines_removed_in_order(spark):
    rows = [
        (1, f"{COOKIE}\nunique alpha\n{NAV}\nunique beta"),
        (2, f"{COOKIE}\nother gamma\n{NAV}"),
        (3, f"{COOKIE}\n{NAV}"),  # nothing survives
        (4, "standalone delta\nstandalone epsilon"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {
        r["id"]: r.asDict()
        for r in remove_boilerplate_lines(df, min_docs=2).collect()
    }

    assert len(out) == 4
    assert out[1]["text"] == "unique alpha\nunique beta"
    assert out[1]["n_lines"] == 4 and out[1]["n_removed"] == 2
    assert out[2]["text"] == "other gamma"
    assert out[3]["text"] == "" and out[3]["n_removed"] == 2
    assert out[4]["text"] == rows[3][1] and out[4]["n_removed"] == 0


def test_repeat_within_one_doc_is_not_boilerplate(spark):
    # the line repeats twice but only inside doc 1: countDistinct(id)=1
    df = spark.createDataFrame(
        [(1, "same line\nsame line"), (2, "another")], ["id", "text"]
    )
    out = {
        r["id"]: r.asDict()
        for r in remove_boilerplate_lines(df, min_docs=2).collect()
    }
    assert out[1]["text"] == "same line\nsame line"
    assert out[1]["n_removed"] == 0


def test_corpus_diff_statuses(spark):
    from gpd_lite_toolbox_spark.text.pipeline import corpus_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["id", "text"]
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B2"), (4, "d")], ["id", "text"]
    )
    out = {r["id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert out == {2: "changed", 3: "removed", 4: "added"}  # 1 silent


def test_corpus_diff_null_text_is_presence_not_absence(spark):
    """md5(NULL) is NULL — presence must come from the id, not the
    hash: an unchanged NULL-text doc emits nothing; non-NULL -> NULL
    is 'changed'; a removed NULL-text doc is 'removed'."""
    from gpd_lite_toolbox_spark.text.pipeline import corpus_diff

    old = spark.createDataFrame(
        [(1, None), (2, "x"), (3, None)], "id long, text string"
    )
    new = spark.createDataFrame(
        [(1, None), (2, None)], "id long, text string"
    )
    out = {r["id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert out == {2: "changed", 3: "removed"}
