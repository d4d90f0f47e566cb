"""Regression suite for the round-4 hardening review: NULL-text
semantics across the dedup/cleaning family, hash overflow guards,
id-column passthrough, convergence warnings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_stratified_sample_negative_ids_respect_zero_rate(spark):
    from gpd_lite_toolbox_spark.text.corpus import stratified_sample

    df = spark.createDataFrame(
        [(-1, "a"), (-2, "a"), (-3, "a"), (5, "b")], "id long, lang string"
    )
    # rate 0 must keep NOTHING from stratum 'a' even for negative ids
    # (a signed hash would be < 0 and pass every threshold)
    out = stratified_sample(df, "lang", rates={"a": 0.0, "b": 1.0})
    assert {r["id"] for r in out.collect()} == {5}


def test_exact_dedup_null_text_is_not_a_duplicate_group(spark):
    from gpd_lite_toolbox_spark.text.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "x"), (4, "x")], "id long, text string"
    )
    groups = exact_dedup(df).collect()
    assert len(groups) == 1  # only the real 'x' pair
    assert groups[0]["keep_id"] == 3


def test_clean_corpus_does_not_collapse_null_docs(spark):
    from gpd_lite_toolbox_spark.text.pipeline import clean_corpus_summary

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "the quick brown fox the a")],
        "id long, text string",
    )
    # NULL docs drop explicitly; doc 3 survives and is counted once
    total = (
        clean_corpus_summary(df)
        .agg(F.sum("n_docs").alias("n"))
        .first()["n"]
    )
    assert total == 1


def test_minhash_null_text_emits_no_bands(spark):
    from gpd_lite_toolbox_spark.text.dedup import (
        minhash_band_keys,
        minhash_signatures,
    )

    df = spark.createDataFrame(
        [(1, None), (2, "real text here")], "id long, text string"
    )
    bands = minhash_band_keys(minhash_signatures(df))
    assert {r["id"] for r in bands.collect()} == {2}


def test_dup_groups_id_col_passthrough(spark):
    from gpd_lite_toolbox_spark.text.dedup import dup_groups

    df = spark.createDataFrame(
        [(10, "aaaa bbbb cccc dddd eeee"), (11, "aaaa bbbb cccc dddd eeee"),
         (12, "totally different words entirely")],
        "doc_id long, text string",
    )
    out = {r["id"]: r["group_id"]
           for r in dup_groups(df, id_col="doc_id").collect()}
    assert out[10] == out[11] == 10
    assert out[12] == 12


def test_dup_groups_warns_when_not_converged(spark):
    import warnings

    from gpd_lite_toolbox_spark.text.dedup import dup_groups

    # chain 1-2-3-4: diameter 3 > max_iter 1
    corpus = spark.createDataFrame(
        [(i, "t") for i in range(1, 5)], "id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0)],
        "id_a long, id_b long, jaccard double",
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        dup_groups(corpus, pairs=pairs, max_iter=1).collect()
    assert any("did not converge" in str(x.message) for x in w)


def test_embedding_near_dups_string_ids(spark):
    from gpd_lite_toolbox_spark.text.dedup import embedding_near_dups

    rows = [
        ("a", [1.0, 0.0, 0.0, 0.0]),
        ("b", [1.0, 0.0, 0.0, 0.0]),
        ("c", [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    out = {(r["id_a"], r["id_b"]) for r in
           embedding_near_dups(df, threshold=0.9).collect()}
    assert ("a", "b") in out and len(out) == 1


def test_cartogram_null_value_raises_not_noop(spark):
    from gpd_lite_toolbox_spark import fixtures as FX
    from gpd_lite_toolbox_spark.operators.cartogram import (
        transform_cartogram,
    )

    polys = FX.polys(spark, "/root/testdata/sf0.001").limit(5)
    bad = polys.withColumn(
        "pop", F.when(F.col("id") % 2 == 0, None).otherwise(F.lit(10.0))
    )
    with pytest.raises(ValueError, match="> 0"):
        transform_cartogram(bad, "pop", iterations=1).collect()


def test_boilerplate_null_text_doc_keeps_contract_row(spark):
    from gpd_lite_toolbox_spark.text.pipeline import remove_boilerplate_lines

    df = spark.createDataFrame(
        [(1, None), (2, "keep me")], "id long, text string"
    )
    out = {r["id"]: r["text"]
           for r in remove_boilerplate_lines(df, min_docs=2).collect()}
    assert set(out) == {1, 2}
    assert out[1] == "" and out[2] == "keep me"


def test_drop_reasons_null_text_not_exact_dup(spark):
    """Two NULL-text docs share md5(NULL)=NULL but must NOT be dropped
    as copies of each other — they fall through to the quality rules;
    planted exact copies still resolve to one kept representative."""
    from gpd_lite_toolbox_spark.text.pipeline import drop_reasons

    good = " ".join(["the", "be", "of"] + ["word"] * 60)
    rows = [
        (1, good),
        (2, good),          # exact copy of 1
        (3, None),
        (4, None),
        (5, "tiny doc the"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r.id: r.reason for r in drop_reasons(df).collect()}
    assert out[1] == "kept" and out[2] == "exact_dup"
    assert out[3] == "gopher_fail" and out[4] == "gopher_fail"
    assert out[5] == "gopher_fail"
