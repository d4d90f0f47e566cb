"""Session-9 batch 4: bigram LM scoring, composite quality blend,
per-source chunk-dedup accounting."""

from __future__ import annotations

import math

from gpd_lite_toolbox_spark.text.corpus import bigram_logprob, quality_blend
from gpd_lite_toolbox_spark.text.dedup import chunk_dedup_stats


def _corpus(spark, docs: dict[int, str]):
    return spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "id long, text string"
    )


class TestBigramLogprob:
    def test_hand_computed_tiny_model(self, spark):
        # corpus: "a b" and "a c". bigrams: (a,b), (a,c).
        # V = 3 (a, b, c); c1(a) = 2.
        # P(b|a) = (1+1)/(2+3) = 0.4, same for c.
        out = {r.id: r for r in bigram_logprob(
            _corpus(spark, {1: "a b", 2: "a c"})).collect()}
        assert out[1].n_bigrams == 1
        assert abs(out[1].avg_neg_logprob - round(-math.log(0.4), 6)) < 1e-9
        assert out[1].avg_neg_logprob == out[2].avg_neg_logprob

    def test_single_token_docs_unscored(self, spark):
        out = bigram_logprob(
            _corpus(spark, {1: "lonely", 2: "two words"})).collect()
        assert [r.id for r in out] == [2]

    def test_word_salad_scores_worse_than_typical(self, spark):
        # the corpus is dominated by one phrase; a doc with the SAME
        # unigram multiset but shuffled order has rare bigrams and
        # must score worse — the property that separates a bigram LM
        # from unigram_logprob. (Both docs in a 2-doc corpus would
        # train each other's bigrams equally — the salad must be the
        # MINORITY pattern for the signal to exist.)
        fluent = ("the cat sat on the mat " * 5).strip()
        docs = {i: fluent for i in range(10)}
        docs[99] = ("mat the on sat cat the " * 5).strip()
        out = {r.id: r.avg_neg_logprob
               for r in bigram_logprob(_corpus(spark, docs)).collect()}
        assert out[0] < out[99]


class TestQualityBlend:
    def test_blend_is_average_of_z_components(self, spark):
        docs = {i: f"the data body {i} " * (i % 6 + 1) for i in range(30)}
        out = quality_blend(_corpus(spark, docs)).collect()
        for r in out:
            zq = r.z_quality or 0.0
            zn = r.z_lm or 0.0
            # blend is computed from the UNROUNDED z-scores (halving
            # rounded ones lands on 7th-decimal midpoints where engine
            # rounding splits), so checking against the rounded
            # columns carries their half-ulp each plus the final round
            assert abs(r.blend - (zq - zn) / 2.0) <= 1.01e-6
            assert r.keep == (r.blend > 0.0)

    def test_rare_token_garbage_scores_low(self, spark):
        common = ("the data rows hold the plain facts and the " * 3).strip()
        docs = {i: common for i in range(10)}
        docs[99] = "zzqx vvkw qqpl mmrt uunb ggfd hhsa jjkl"
        out = {r.id: r for r in quality_blend(_corpus(spark, docs)).collect()}
        assert out[99].blend < 0.0 and out[99].keep is False
        assert out[0].blend > out[99].blend


class TestChunkDedupStats:
    def _scorpus(self, spark, rows):
        return spark.createDataFrame(
            rows, "id long, text string, source string"
        )

    def test_disjoint_source_has_ratio_one(self, spark):
        import hashlib

        def uniq(i):
            return " ".join(
                hashlib.md5(f"{i}:{j}".encode()).hexdigest() for j in range(6)
            )

        df = self._scorpus(
            spark, [(i, uniq(i), "solo") for i in range(5)]
        )
        row = chunk_dedup_stats(df).collect()[0]
        assert row.source == "solo"
        assert row.dedup_ratio == 1.0
        assert row.n_chunks == row.n_distinct_chunks

    def test_mirror_source_dedups(self, spark):
        from gpd_lite_toolbox_spark.text.dedup import rabin_chunks

        body = ("the quick brown fox jumps over the lazy dog and runs "
                "far away tonight while the moon rises over the harbor")
        one = rabin_chunks(
            spark.createDataFrame([(0, body)], "id long, text string")
        ).collect()
        # 8 identical docs: totals are 8x ONE doc's; distinct chunks
        # equal the single doc's distinct set (a chunk repeated WITHIN
        # the doc counts once — hence distinct, not per-doc, counts)
        rows = [(i, body, "mirror") for i in range(8)]
        m = chunk_dedup_stats(self._scorpus(spark, rows)).collect()[0]
        assert m.n_chunks == 8 * len(one)
        assert m.n_chars == 8 * len(body)
        assert m.n_distinct_chunks == len({r.chunk_hash for r in one})
        assert abs(m.dedup_ratio - m.distinct_chars / m.n_chars) < 5e-7
        assert m.dedup_ratio <= 0.125 + 1e-9

    def test_char_accounting_consistent(self, spark):
        rows = [(1, "alpha beta gamma delta epsilon zeta", "a"),
                (2, "alpha beta gamma delta epsilon zeta", "b")]
        out = {r.source: r for r in chunk_dedup_stats(
            self._scorpus(spark, rows)).collect()}
        # per-source views identical; n_chars equals the text length
        for r in out.values():
            assert r.n_chars == len(rows[0][1])
            assert r.dedup_ratio == 1.0  # no repeats WITHIN a source
