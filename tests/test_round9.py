"""Round-9 pins (r8 VERDICT items).

Item 3: match_line_cluster seeds k=|A| centers on the driver because
the reference forces n_clusters=len(gdf1) (core.py:74); the max_k
guard makes the corpus-scale collect impossible to hit by accident
(the cosine_topk max_pairs discipline, vector/ann.py:216).
"""

import pytest
from pyspark.sql import functions as F

from gpd_lite_toolbox_spark import fixtures as FX
from gpd_lite_toolbox_spark.operators.lines import match_line_cluster


def _verts(spark, sf_dir):
    va = (
        FX.road_verts(spark, sf_dir)
        .filter(F.col("id") % 20 == 7)
        .drop("road_class")
    )
    vb = FX.road_b_verts(spark, sf_dir).filter(F.col("id") % 20 == 7)
    return va, vb


def test_match_line_cluster_max_k_guard(spark, sf_dir):
    """|A| above max_k must raise with blocking guidance BEFORE any
    driver collect; force=True (and a deliberate max_k) still runs."""
    FX.register_base_tables(spark, sf_dir)
    va, vb = _verts(spark, sf_dir)
    with pytest.raises(ValueError, match="max_k"):
        match_line_cluster(va, vb, max_k=3)
    # force bypasses the guard; a deliberately-raised max_k admits
    forced = match_line_cluster(va, vb, max_k=3, force=True)
    admitted = match_line_cluster(va, vb)
    assert sorted(map(tuple, forced.collect())) == sorted(
        map(tuple, admitted.collect())
    )


def test_match_line_cluster_guard_default_admits_entry_scale(
    spark, sf_dir
):
    """The default max_k must admit the entry queries' documented
    |A|<=1000 subset unchanged — the guard exists for the unwary
    corpus-scale caller, not the reference-faithful one."""
    FX.register_base_tables(spark, sf_dir)
    va, vb = _verts(spark, sf_dir)
    assert va.select("id").distinct().count() <= 4096
    out = match_line_cluster(va, vb)
    assert out.count() > 0


# --- r8 VERDICT item 6: large-star/small-star connected components ---

from gpd_lite_toolbox_spark.text.dedup import (  # noqa: E402
    cc_star,
    dup_groups,
    dup_groups_star,
)


def _corpus(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").alias("id"), "text"
    )


def test_dup_groups_star_matches_label_propagation(spark, sf_dir):
    """Same components, same labels, same sizes as dup_groups on the
    real fixture pair graph (hash-equal, the VERDICT done criterion)."""
    a = sorted(map(tuple, dup_groups(_corpus(spark, sf_dir)).collect()))
    b = sorted(
        map(tuple, dup_groups_star(_corpus(spark, sf_dir)).collect())
    )
    assert a == b


def test_cc_star_long_chain(spark):
    """A 2000-link path has diameter 2000: min-label propagation needs
    2000 rounds (dup_groups strict raises at max_iter=12), while the
    star alternation contracts it within its default 25 rounds."""
    import pytest as _pt

    n = 2000
    chain = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    comp = cc_star(chain)  # strict: raises if not converged
    rows = comp.collect()
    assert len(rows) == n
    assert all(r.group_id == 0 for r in rows)

    docs = spark.range(n).select("id", F.lit("x").alias("text"))
    pairs = chain.select(
        F.col("src").alias("id_a"), F.col("dst").alias("id_b")
    )
    with _pt.raises(RuntimeError, match="did not converge"):
        dup_groups(docs, pairs=pairs, max_iter=12, strict=True)
    star = dup_groups_star(docs, pairs=pairs)
    assert star.filter(F.col("group_id") != 0).count() == 0


def test_cc_star_mixed_components_and_singletons(spark):
    """Two components + an isolated node: labels are component minima,
    singletons label themselves through the corpus wrapper."""
    edges = spark.createDataFrame(
        [(5, 3), (3, 9), (20, 21)], "src long, dst long"
    )
    got = {
        (r.id, r.group_id) for r in cc_star(edges).collect()
    }
    assert got == {(3, 3), (5, 3), (9, 3), (20, 20), (21, 20)}
    docs = spark.range(25).select("id", F.lit("x").alias("text"))
    pairs = edges.select(
        F.col("src").alias("id_a"), F.col("dst").alias("id_b")
    )
    out = dup_groups_star(docs, pairs=pairs)
    assert out.count() == 25
    assert out.filter("id = 7").first().group_id == 7
    assert out.filter("id = 21").first().group_size == 2


# --- r8 VERDICT item 7: interpolated trigram LM scoring ---

from gpd_lite_toolbox_spark.text.corpus import (  # noqa: E402
    perplexity_buckets,
    trigram_logprob,
    unigram_logprob,
)


def test_trigram_known_values(spark):
    """Hand-computed check on a two-doc corpus: every count and the
    interpolated probability verified against the closed formula."""
    import math

    docs = spark.createDataFrame(
        [(1, "a b a b a"), (2, "a b c")], "id long, text string"
    )
    out = {r.id: r for r in trigram_logprob(docs).collect()}
    # doc 1 trigrams: aba x2, bab x1; doc 2: abc x1
    assert out[1].n_trigrams == 3
    assert out[2].n_trigrams == 1
    # corpus counts: c3(aba)=2 c3(bab)=1 c3(abc)=1; ctx(ab)=3 ctx(ba)=1
    # bigrams: ab x3, ba x2, bc x1 -> c1(a)=3 c1(b)=3
    # unigrams: a x4, b x3, c x1, N=8
    def p(n3, nctx, n2, n1, nu, N=8):
        return 0.7 * (n3 / nctx) + 0.2 * (n2 / n1) + 0.1 * (nu / N)

    def lat(x):
        return round(-math.log(x) + 1e-9, 6)

    nll_aba = lat(p(2, 3, 2, 3, 4))  # next=a: bigram(b,a)=2/c1(b)=3
    nll_bab = lat(p(1, 1, 3, 3, 3))  # next=b: bigram(a,b)=3/c1(a)=3
    nll_abc = lat(p(1, 3, 1, 3, 1))  # next=c: bigram(b,c)=1/c1(b)=3
    exp1 = round((2 * nll_aba + nll_bab) / 3 + 1e-9, 6)
    exp2 = round(nll_abc + 1e-9, 6)
    assert abs(out[1].avg_neg_logprob - exp1) < 2e-6
    assert abs(out[2].avg_neg_logprob - exp2) < 2e-6


def test_trigram_context_beats_word_salad(spark):
    """The reason to go up an order: a token-reversed copy of a fluent
    doc has the SAME per-doc unigram score but must score worse under
    the trigram model when fluent word order dominates the corpus.
    (A 50/50 fluent/reversed mix would NOT show this — such a corpus
    is closed under reversal and its trigram stats are symmetric; the
    salad has to be the minority, as in any real crawl.)"""
    fluent = "the cat sat on the mat and the dog sat on the rug"
    majority = spark.range(100).select(
        "id", F.lit(fluent).alias("text")
    )
    salad = spark.range(3).select(
        (F.col("id") + 1_000).alias("id"),
        F.concat_ws(
            " ", F.reverse(F.split(F.lit(fluent), " "))
        ).alias("text"),
    )
    both = majority.unionByName(salad)
    tri = {r.id: r.avg_neg_logprob for r in trigram_logprob(both).collect()}
    uni = {r.id: r.avg_neg_logprob for r in unigram_logprob(both).collect()}
    # unigram is blind to the reversal...
    assert abs(uni[1_000] - uni[0]) < 1e-9
    # ...the trigram model is not
    assert tri[1_000] > tri[0]


def test_trigram_short_docs_unscored(spark):
    docs = spark.createDataFrame(
        [(1, "a"), (2, "a b"), (3, "a b c")], "id long, text string"
    )
    ids = {r.id for r in trigram_logprob(docs).select("id").collect()}
    assert ids == {3}


def test_perplexity_buckets_scorer_hook(spark, sf_dir):
    """Default output is byte-identical to the pre-hook contract;
    the trigram scorer swaps in and keeps its own count column."""
    docs = _corpus(spark, sf_dir).filter(F.col("id") < 200)
    default = perplexity_buckets(docs)
    assert default.columns == ["id", "n_tokens", "avg_neg_logprob", "bucket"]
    tri = perplexity_buckets(docs, scorer=trigram_logprob)
    assert tri.columns == ["id", "n_trigrams", "avg_neg_logprob", "bucket"]
    counts = {
        r.bucket: r.c
        for r in tri.groupBy("bucket").agg(F.count("*").alias("c")).collect()
    }
    assert set(counts) == {"head", "middle", "tail"}
