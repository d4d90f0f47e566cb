"""Session-9 batch 2: hard-negative mining, curriculum ordering,
weak-supervision labels + labeling-function diagnostics."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpd_lite_toolbox_spark.text.corpus import curriculum_order
from gpd_lite_toolbox_spark.text.labeling import lf_diagnostics, weak_labels
from gpd_lite_toolbox_spark.vector.mining import hard_negatives


class TestHardNegatives:
    def _emb(self, spark):
        # label 0 hugs +x, label 1 hugs +y, one label-1 vector leaning
        # toward +x (the planted HARD negative for label-0 anchors)
        rows = [
            (0, 0, [1.0, 0.0]),
            (1, 0, [0.9, 0.1]),
            (10, 1, [0.0, 1.0]),
            (11, 1, [0.1, 1.0]),
            (12, 1, [0.8, 0.6]),  # hard negative for label 0
        ]
        return spark.createDataFrame(
            rows, "vec_id long, label int, embedding array<double>"
        )

    def test_hardest_negative_ranks_first(self, spark):
        emb = self._emb(spark)
        out = hard_negatives(
            emb.filter(F.col("vec_id") == 0), emb, k=3, dims=2
        ).collect()
        assert [r.neighbor_id for r in out] == [12, 11, 10]
        assert [r.rank for r in out] == [1, 2, 3]

    def test_never_returns_same_label(self, spark):
        emb = self._emb(spark)
        out = hard_negatives(emb, emb, k=10, dims=2).collect()
        lab = {0: 0, 1: 0, 10: 1, 11: 1, 12: 1}
        assert out
        for r in out:
            assert lab[r.query_id] != lab[r.neighbor_id]

    def test_cosine_descending_within_query(self, spark):
        emb = self._emb(spark)
        out = hard_negatives(emb, emb, k=10, dims=2).collect()
        by_q: dict[int, list] = {}
        for r in sorted(out, key=lambda r: (r.query_id, r.rank)):
            by_q.setdefault(r.query_id, []).append(r.cosine)
        for cos in by_q.values():
            assert cos == sorted(cos, reverse=True)


class TestCurriculumOrder:
    def _corpus(self, spark, docs):
        return spark.createDataFrame(
            [(i, t) for i, t in docs.items()], "id long, text string"
        )

    def test_positions_are_a_permutation(self, spark):
        docs = {i: f"doc body {i} " * (i % 7 + 1) for i in range(50)}
        out = curriculum_order(self._corpus(spark, docs)).collect()
        assert sorted(r.position for r in out) == list(range(50))

    def test_stages_are_contiguous_and_easy_first(self, spark):
        good = ("the data " * 30).strip()  # full points
        bad = "x"  # fails every band
        docs = {1: good, 2: good, 3: bad, 4: bad}
        out = {r.id: (r.stage, r.position)
               for r in curriculum_order(self._corpus(spark, docs)).collect()}
        assert out[1][0] < out[3][0]
        # every good doc sorts before every bad doc
        assert max(out[1][1], out[2][1]) < min(out[3][1], out[4][1])

    def test_matches_direct_global_sort(self, spark):
        # the two-level prefix sum must equal a plain orderBy rank
        docs = {i: f"word salad {i} " * (i % 5 + 1) for i in range(80)}
        df = self._corpus(spark, docs)
        out = curriculum_order(df, n_buckets=4)
        direct = (
            out.select("id", "stage",
                       F.col("position").alias("got"))
            .join(
                out.selectExpr(
                    "id",
                    "row_number() over (order by stage, "
                    "cast(conv(substring(md5(cast(id as string)), 1, 15),"
                    " 16, 10) as bigint), id) - 1 as want",
                ),
                "id",
            )
        )
        assert direct.filter("got <> want").count() == 0


class TestWeakLabels:
    def _corpus(self, spark, docs):
        return spark.createDataFrame(
            [(i, t) for i, t in docs.items()], "id long, text string"
        )

    def test_votes_in_range_and_label_is_sign(self, spark):
        docs = {i: f"the data spark body {i} " * (i % 9 + 1)
                for i in range(40)}
        out = weak_labels(self._corpus(spark, docs)).collect()
        for r in out:
            votes = (r.v_quality, r.v_gopher, r.v_lang)
            assert all(v in (-1, 0, 1) for v in votes)
            s = sum(votes)
            want = "keep" if s > 0 else ("drop" if s < 0 else "abstain")
            assert r.label == want

    def test_clean_doc_keeps_garbage_drops(self, spark):
        clean = ("the quick data rows hold many small the facts and "
                 "plots that the readers like to see in " * 4).strip()
        garbage = "###### ...... ###### ......"
        out = {r.id: r for r in weak_labels(
            self._corpus(spark, {1: clean, 2: garbage})).collect()}
        assert out[1].label == "keep"
        assert out[2].label == "drop"
        assert out[2].v_lang in (-1, 0) and out[2].v_quality <= 0

    def test_diagnostics_laws(self, spark):
        docs = {i: f"the data spark body {i} " * (i % 9 + 1)
                for i in range(40)}
        d = {r.rule: r for r in lf_diagnostics(
            self._corpus(spark, docs)).collect()}
        assert set(d) == {"quality", "gopher", "lang"}
        for r in d.values():
            assert 0.0 <= r.conflict <= r.overlap <= r.coverage <= 1.0
        # gopher never abstains
        assert d["gopher"].coverage == 1.0
