"""Session-9 operators: SimHash Hamming pairs, Bloom decontamination,
Count-Min heavy hitters, embedding centroid-distance outliers.

Each is pinned structurally here (planted duplicates, sketch laws,
planted outliers); oracle hash-parity rides tests/test_oracle_parity.py
via the declared queries."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from gpd_lite_toolbox_spark.text.corpus import cms_heavy_hitters
from gpd_lite_toolbox_spark.text.dedup import (
    bloom_decontaminate,
    decontaminate,
    simhash,
    simhash_hamming_pairs,
)
from gpd_lite_toolbox_spark.vector.centroids import embedding_outliers


def _corpus(spark, docs: dict[int, str]):
    return spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "id long, text string"
    )


BASE = "the quick brown fox jumps over the lazy dog and runs far away"


class TestSimhashHammingPairs:
    def test_exact_duplicate_is_hamming_zero(self, spark):
        df = _corpus(spark, {1: BASE, 2: BASE, 3: "zz yy xx ww vv uu tt"})
        out = {(r.id_a, r.id_b): r.hamming
               for r in simhash_hamming_pairs(df).collect()}
        assert out == {(1, 2): 0}

    def test_matches_allpairs_bruteforce(self, spark):
        # 40 docs: 4 families of shared text with per-doc noise tokens,
        # so fingerprints cluster at small Hamming distances. The band
        # join must return EXACTLY the brute-force pair set.
        docs = {
            i: f"{BASE.split(' ')[i % 4]} common body text {i % 4} "
               f"shared across family plus noise{i} tail{i % 7}"
            for i in range(40)
        }
        df = _corpus(spark, docs)
        sigs = {r.id: r.simhash for r in simhash(df).collect()}
        want = {}
        for a, b in itertools.combinations(sorted(sigs), 2):
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= 3:
                want[(a, b)] = h
        got = {(r.id_a, r.id_b): r.hamming
               for r in simhash_hamming_pairs(df, max_hamming=3).collect()}
        assert got == want

    def test_threshold_zero_is_fingerprint_equality(self, spark):
        df = _corpus(spark, {1: BASE, 2: BASE, 3: BASE + " extra"})
        got = {(r.id_a, r.id_b)
               for r in simhash_hamming_pairs(df, max_hamming=0).collect()}
        assert (1, 2) in got
        assert all(h == 0 for h in
                   [r.hamming for r in
                    simhash_hamming_pairs(df, max_hamming=0).collect()])


class TestBloomDecontaminate:
    def test_superset_of_exact_decontaminate(self, spark):
        docs = {i: f"doc {i} body with shared phrase number {i % 5} "
                   f"and unique token u{i}" for i in range(60)}
        df = _corpus(spark, docs)
        train = df.filter(F.col("id") % 13 != 0)
        bench = df.filter(F.col("id") % 13 == 0)
        exact = {r.id: r.n_hits for r in decontaminate(train, bench).collect()}
        bloom = {r.id: r.n_hits
                 for r in bloom_decontaminate(train, bench).collect()}
        # Bloom one-sidedness: every exactly-contaminated doc is
        # flagged, with at least as many gram hits (false positives
        # only ever ADD hits).
        assert set(exact) <= set(bloom)
        for i, n in exact.items():
            assert bloom[i] >= n

    def test_disjoint_corpora_mostly_clean(self, spark):
        # With 2^18 bits and a handful of benchmark grams, false
        # positives on disjoint text are ~zero.
        train = _corpus(spark, {1: "alpha beta gamma delta epsilon zeta"})
        bench = _corpus(spark, {2: "one two three four five six seven"})
        assert bloom_decontaminate(train, bench).count() == 0

    def test_verbatim_copy_flagged_with_all_grams(self, spark):
        text = "a long benchmark passage repeated verbatim in training"
        train = _corpus(spark, {1: text})
        bench = _corpus(spark, {26: text})
        rows = bloom_decontaminate(train, bench).collect()
        assert [r.id for r in rows] == [1]
        exact = decontaminate(train, bench).collect()[0].n_hits
        assert rows[0].n_hits >= exact


class TestCmsHeavyHitters:
    def test_estimate_dominates_exact(self, spark):
        docs = {i: ("hot " * 20 + f"cold{i} warm{i % 3}").strip()
                for i in range(30)}
        out = cms_heavy_hitters(_corpus(spark, docs), depth=4, width=8,
                                k=100).collect()
        assert all(r.est >= r.exact for r in out)
        top = out[0]
        assert top.rank == 1 and top.token == "hot" and top.exact == 600

    def test_wide_sketch_is_exact(self, spark):
        docs = {1: "a a a b b c", 2: "a d d"}
        out = cms_heavy_hitters(_corpus(spark, docs), depth=4,
                                width=1 << 16, k=10).collect()
        assert {r.token: r.est for r in out} == {
            "a": 4, "b": 2, "c": 1, "d": 2}
        assert all(r.est == r.exact for r in out)

    def test_narrow_sketch_plants_overestimate(self, spark):
        # width 2 forces collisions: some token MUST be overestimated
        # (total mass 12 over 2 buckets x 4 rows).
        docs = {1: "a a a a b b c d e f g h"}
        out = cms_heavy_hitters(_corpus(spark, docs), depth=2, width=2,
                                k=100).collect()
        assert any(r.est > r.exact for r in out)


class TestEmbeddingOutliers:
    def test_planted_outlier_flagged(self, spark):
        # 20 inliers hugging (1,0,0,0) + one far point per label
        rows = []
        for lab in (0, 1):
            for i in range(20):
                rows.append((lab * 100 + i, lab,
                             [1.0, i * 0.01, 0.0, 0.0]))
            rows.append((lab * 100 + 99, lab, [50.0, 50.0, 50.0, 50.0]))
        df = spark.createDataFrame(
            rows, "vec_id long, label int, embedding array<double>")
        out = embedding_outliers(df, z_threshold=2.0, dims=4).collect()
        assert {r.vec_id for r in out} == {99, 199}
        assert all(r.z > 2.0 and r.dist2 > 0 for r in out)

    def test_uniform_cluster_unflagged(self, spark):
        df = spark.createDataFrame(
            [(i, 0, [1.0, 1.0]) for i in range(10)],
            "vec_id long, label int, embedding array<double>")
        # zero variance -> sd == 0 -> no z, no flags (guarded, no crash)
        assert embedding_outliers(df, dims=2).count() == 0
