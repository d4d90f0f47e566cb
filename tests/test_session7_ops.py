"""Unit semantics for the session-7 ops: fixed-iteration PageRank
(mass conservation, dangling redistribution, hub dominance), the
signed JL projection (shape, NULL handling, distance preservation),
and temperature-scaled mixture weights (alpha=1 natural recovery,
alpha<1 small-source upweighting)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def test_pagerank_conserves_mass_and_handles_dangling(spark):
    from gpd_lite_toolbox_spark.text.web import pagerank

    # b is dangling (no out-edges): its mass must be redistributed,
    # not lost — total rank stays 1 every iteration.
    out = pagerank(
        _edges(spark, [("a", "b"), ("c", "b"), ("c", "a")]), iters=5
    ).collect()
    total = sum(r["rank"] for r in out)
    assert abs(total - 1.0) < 1e-9
    assert {r["node"] for r in out} == {"a", "b", "c"}


def test_pagerank_uniform_cycle_is_uniform(spark):
    from gpd_lite_toolbox_spark.text.web import pagerank

    out = pagerank(
        _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")]), iters=7
    ).collect()
    ranks = [r["rank"] for r in out]
    assert max(ranks) - min(ranks) < 1e-12


def test_pagerank_hub_outranks_leaves(spark):
    from gpd_lite_toolbox_spark.text.web import pagerank

    # every leaf points at the hub; the hub links back to one leaf
    rows = [(f"l{i}", "hub") for i in range(5)] + [("hub", "l0")]
    out = {r["node"]: r["rank"] for r in pagerank(_edges(spark, rows)).collect()}
    assert out["hub"] == max(out.values())
    assert out["l0"] > out["l1"]  # hub's backlink boosts l0


def test_pagerank_respects_edge_weights(spark):
    from gpd_lite_toolbox_spark.text.web import pagerank

    w = spark.createDataFrame(
        [("a", "b", 9.0), ("a", "c", 1.0)], "src string, dst string, w double"
    )
    out = {
        r["node"]: r["rank"]
        for r in pagerank(w, iters=3, weight_col="w").collect()
    }
    assert out["b"] > out["c"]


def test_pagerank_empty_and_zero_iters(spark):
    from gpd_lite_toolbox_spark.text.web import pagerank

    empty = _edges(spark, []).filter(F.lit(False))
    assert pagerank(empty, iters=2).count() == 0
    out = pagerank(_edges(spark, [("a", "b")]), iters=0).collect()
    assert all(abs(r["rank"] - 0.5) < 1e-12 for r in out)


def test_random_projection_shape_and_nulls(spark):
    from gpd_lite_toolbox_spark.vector.project import random_projection

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0]), (2, None)],
        "vec_id long, embedding array<double>",
    )
    out = {r["id"]: r["proj"] for r in random_projection(df, out_dims=8).collect()}
    assert len(out[1]) == 8
    assert out[2] is None


def test_random_projection_preserves_pairwise_distances(spark):
    """JL guarantee, loose form: with k=16 over d=64, relative squared
    distance distortion across planted random vectors stays within a
    generous bound (the +/-1 ensemble has the JL moment bounds)."""
    import random

    from gpd_lite_toolbox_spark.vector.project import random_projection

    rng = random.Random(7)
    vecs = [
        (i, [rng.gauss(0.0, 1.0) for _ in range(64)]) for i in range(12)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    proj = {
        r["id"]: r["proj"]
        for r in random_projection(df, out_dims=16).collect()
    }
    raw = dict(vecs)

    def d2(u, v):
        return sum((a - b) ** 2 for a, b in zip(u, v))

    ratios = []
    for i in range(12):
        for j in range(i + 1, 12):
            ratios.append(d2(proj[i], proj[j]) / d2(raw[i], raw[j]))
    # eps ~ sqrt(8 ln n / k) is >1 at k=16; just pin a sane envelope
    assert 0.2 < min(ratios) and max(ratios) < 3.0
    assert 0.6 < sum(ratios) / len(ratios) < 1.6


def test_random_projection_is_linear(spark):
    from gpd_lite_toolbox_spark.vector.project import random_projection

    u = [float(i % 5) for i in range(16)]
    v = [float((i * 3) % 7) for i in range(16)]
    s = [a + b for a, b in zip(u, v)]
    df = spark.createDataFrame(
        [(0, u), (1, v), (2, s)], "vec_id long, embedding array<double>"
    )
    out = {
        r["id"]: r["proj"]
        for r in random_projection(df, out_dims=4).collect()
    }
    for a, b, c in zip(out[0], out[1], out[2]):
        assert abs((a + b) - c) < 1e-9


def test_temperature_alpha_one_recovers_natural_shares(spark):
    from gpd_lite_toolbox_spark.text.corpus import temperature_mixture

    rows = [(i, "w " * (10 if i % 3 else 40), f"s{i % 2}") for i in range(30)]
    df = spark.createDataFrame(rows, "id long, text string, source string")
    out = temperature_mixture(df, token_budget=1000, alpha=1.0).collect()
    for r in out:
        assert abs(r["weight"] - r["natural_frac"]) < 2e-6


def test_temperature_upweights_small_sources(spark):
    from gpd_lite_toolbox_spark.text.corpus import temperature_mixture

    rows = [(0, "w " * 1000, "big"), (1, "w " * 10, "small")]
    df = spark.createDataFrame(rows, "id long, text string, source string")
    out = {
        r["source"]: r
        for r in temperature_mixture(df, token_budget=10_000).collect()
    }
    assert out["small"].weight > out["small"].natural_frac
    assert out["big"].weight < out["big"].natural_frac
    # sqrt-temperature: weight ratio is sqrt of token ratio
    got = out["big"].weight / out["small"].weight
    want = math.sqrt(out["big"].n_tokens / out["small"].n_tokens)
    assert abs(got - want) < 1e-3
    assert out["small"].oversampled  # 10k budget vs ~11 tokens


def test_temperature_mixture_rejects_bad_budget(spark):
    from gpd_lite_toolbox_spark.text.corpus import temperature_mixture

    df = spark.createDataFrame([(0, "a b", "s")], "id long, text string, source string")
    with pytest.raises(ValueError):
        temperature_mixture(df, token_budget=0)


def test_random_projection_plans_zero_shuffle(spark):
    """The JL projection's contract: ONE native projection, no
    exchange, no Python node of any kind."""
    from gpd_lite_toolbox_spark.vector.project import random_projection

    df = spark.createDataFrame(
        [(1, [1.0] * 8)], "vec_id long, embedding array<double>"
    )
    plan = (
        random_projection(df, out_dims=4, dims=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for node in ("Exchange", "BatchEvalPython", "ArrowEvalPython"):
        assert node not in plan


def test_skew_stats_flags_planted_hot_key(spark):
    from gpd_lite_toolbox_spark.operators.skew import skew_stats

    rows = [(i, "hot" if i % 2 == 0 else f"k{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, k string")
    out = skew_stats(df, "k", top_k=3).collect()
    assert out[0].rnk == 1 and out[0].key == "hot"
    assert out[0].n_rows == 50 and abs(out[0].frac_of_total - 0.5) < 1e-9
    # 51 distinct keys, mean ~1.96 rows -> hot is ~25.5x mean
    assert out[0].x_mean > 20
    assert len(out) == 3 and [r.rnk for r in out] == [1, 2, 3]


def test_hash_features_bucket_range_and_counts(spark):
    from gpd_lite_toolbox_spark.text.classify import hash_features

    df = spark.createDataFrame(
        [(1, "a a b"), (2, None)], "id long, text string"
    )
    out = hash_features(df, n_features=8).collect()
    assert all(0 <= r.bucket < 8 for r in out)
    by_id = {}
    for r in out:
        by_id.setdefault(r.id, 0)
        by_id[r.id] += r.n
    assert by_id[1] == 3      # token occurrences conserved
    assert by_id[2] == 1      # NULL text -> one '' token (pipeline convention)


def test_compaction_plan_greedy_bins(spark):
    from gpd_lite_toolbox_spark.sources.maintenance import compaction_plan

    stats = spark.createDataFrame(
        [("a", 40), ("b", 40), ("c", 40), ("d", 500), ("e", 10)],
        "file_path string, n_rows long",
    )
    out = {r.key: r for r in compaction_plan(stats, 100).collect()}
    # a+b+c fill bin 0 (120 rows; c starts at cum 80 < 100);
    # d starts at cum 120 -> bin 1; e starts at 620 -> bin 6
    assert out["a"].bin == 0 and out["b"].bin == 0 and out["c"].bin == 0
    assert out["a"].bin_rows == 120
    assert out["d"].bin == 1 and out["d"].bin_rows == 500
    assert out["e"].bin == 6
    import pytest as _pytest

    with _pytest.raises(ValueError):
        compaction_plan(stats, 0)


def test_file_stats_counts_match_table(spark, sf_dir, tmp_path):
    from gpd_lite_toolbox_spark.sources.maintenance import file_stats

    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = str(tmp_path / "frag")
    src.repartition(4).write.parquet(p)
    stats = file_stats(spark, p).collect()
    assert sum(r.n_rows for r in stats) == src.count()
    assert all(r.file_bytes > 0 for r in stats)
    assert len(stats) >= 2


def test_skew_stats_null_key_sorts_last_on_ties(spark):
    """A NULL join key is the classic hot key; on a count tie the
    NULL row must take the LATER rank on both engines (asc_nulls_last
    pins Spark to DuckDB's default)."""
    from gpd_lite_toolbox_spark.operators.skew import skew_stats

    rows = [(i, None) for i in range(5)] + [(10 + i, "z") for i in range(5)]
    df = spark.createDataFrame(rows, "id long, k string")
    out = skew_stats(df, "k", top_k=2).collect()
    assert out[0].key == "z" and out[0].rnk == 1
    assert out[1].key is None and out[1].rnk == 2


def _ref_bpe(texts, n_merges, min_count=2):
    """Pure-Python reference BPE trainer (Sennrich formulation) — the
    independent algorithm bpe_train is pinned against."""
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in (t or "").split(" "):
            if w:
                vocab[w] += 1
    seqs = [(list(w), n) for w, n in vocab.items()]
    merges = []
    for step in range(n_merges):
        pc = Counter()
        for syms, n in seqs:
            for x, y in zip(syms, syms[1:]):
                pc[(x, y)] += n
        if not pc:
            break
        (a, b), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merges.append((step, a, b, cnt))
        merged = a + b
        nxt = []
        for syms, n in seqs:
            out = []
            for t in syms:
                if out and out[-1] == a and t == b:
                    out[-1] = merged
                else:
                    out.append(t)
            nxt.append((out, n))
        seqs = nxt
    return merges


def test_bpe_train_matches_python_reference_small(spark):
    from gpd_lite_toolbox_spark.text.bpe import bpe_train

    texts = ["low lower lowest", "low low newer newest", "wider new"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got = [
        (r.step, r.left, r.right, r.cnt)
        for r in bpe_train(df, n_merges=6).orderBy("step").collect()
    ]
    assert got == _ref_bpe(texts, 6)
    assert len(got) >= 3  # 'lo' and 'ow' family merges exist


def test_bpe_train_matches_python_reference_fixture(spark, sf_dir):
    """Two independent implementations agree EXACTLY on the real
    corpus fixture (order, pairs, and counts)."""
    import gpd_lite_toolbox_spark.fixtures as FX
    from gpd_lite_toolbox_spark.text.bpe import bpe_train

    FX.register_base_tables(spark, sf_dir)
    corpus = FX.fixture_df(spark, sf_dir, "corpus")
    texts = [r.text for r in corpus.select("text").collect()]
    got = [
        (r.step, r.left, r.right, r.cnt)
        for r in bpe_train(corpus, n_merges=8).orderBy("step").collect()
    ]
    assert got == _ref_bpe(texts, 8)


def test_bpe_segment_expr_applies_learned_merges(spark):
    from pyspark.sql import functions as F

    from gpd_lite_toolbox_spark.text.bpe import bpe_segment_expr

    df = spark.createDataFrame([(0, "aaab aa")], "id long, text string")
    out = df.select(
        bpe_segment_expr("text", [("a", "a"), ("aa", "a")]).alias("s")
    ).collect()[0]["s"]
    # 'aaab': aa+a -> 'aaa', b stays; 'aa' -> 'aa'
    assert out == ["aaa", "b", "aa"]


def test_bpe_train_zero_merges_and_empty(spark):
    from pyspark.sql import functions as F

    from gpd_lite_toolbox_spark.text.bpe import bpe_train

    df = spark.createDataFrame([(0, "a b")], "id long, text string")
    assert bpe_train(df, n_merges=0).count() == 0
    empty = df.filter(F.lit(False))
    assert bpe_train(empty, n_merges=3).count() == 0
