"""Session-9 batch 6: repeated-ngram audit, generic table profile,
TPC-H Q3 shape (query-level, via the declared entry)."""

from __future__ import annotations

from gpd_lite_toolbox_spark.operators.audit import table_profile
from gpd_lite_toolbox_spark.text.dedup import repeated_ngrams


def _corpus(spark, docs: dict[int, str]):
    return spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "id long, text string"
    )


class TestRepeatedNgrams:
    def test_planted_repeat_tops_the_list(self, spark):
        import hashlib

        boiler = "SUBSCRIBE TO OUR NEWSLETTER FOR MORE DAILY"  # 42 chars
        docs = {
            i: " ".join(
                hashlib.md5(f"{i}:{j}".encode()).hexdigest() for j in range(4)
            )
            for i in range(10)
        }
        for i in range(5):  # plant the boilerplate in half the docs
            docs[i] = docs[i] + " " + boiler
        out = repeated_ngrams(_corpus(spark, docs), length=40, top_k=5)
        rows = sorted(out.collect(), key=lambda r: r.rank)
        # the shared suffix is " " + boiler (43 chars, the joining
        # space is common too) -> exactly 4 stride-1 40-grams, each in
        # all 5 planted docs; grams spanning the doc-specific prefix
        # differ per doc and never repeat
        assert len(rows) == 4
        for r in rows:
            assert r.gram in " " + boiler
            assert r.n_docs == 5 and r.n_occurrences == 5

    def test_unique_corpus_reports_nothing(self, spark):
        import hashlib

        docs = {
            i: " ".join(
                hashlib.md5(f"{i}:{j}".encode()).hexdigest() for j in range(4)
            )
            for i in range(6)
        }
        assert repeated_ngrams(_corpus(spark, docs)).count() == 0


class TestTableProfile:
    def test_counts_and_extrema(self, spark):
        df = spark.createDataFrame(
            [(1, 2.5, "a"), (2, None, "b"), (3, 7.5, None), (3, 0.5, "a")],
            "k long, v double, s string",
        )
        out = {r.column: r for r in table_profile(df).collect()}
        assert set(out) == {"k", "v", "s"}
        assert all(r.n_rows == 4 for r in out.values())
        assert out["k"].n_nulls == 0 and out["k"].n_distinct == 3
        assert out["k"].min_num == 1.0 and out["k"].max_num == 3.0
        assert out["v"].n_nulls == 1 and out["v"].n_distinct == 3
        assert out["v"].min_num == 0.5 and out["v"].max_num == 7.5
        # string column: no numeric extrema in the contract
        assert out["s"].n_nulls == 1 and out["s"].n_distinct == 2
        assert out["s"].min_num is None and out["s"].max_num is None

    def test_two_pass_plan_shape(self, spark):
        df = spark.createDataFrame([(1, "x")], "k long, s string")
        plan = (
            table_profile(df)._jdf.queryExecution().executedPlan().toString()
        )
        # two aggregate passes (plain stats + Expand distincts) joined
        # as one-row broadcast — NOT one mixed agg, whose Expand drags
        # every plain-agg column through all k replicated groups
        # (measured 2x slower; see the operator docstring), and no
        # per-column scan union
        assert "Union" not in plan
        assert plan.count("BroadcastNestedLoopJoin") == 1


class TestRetrievalMetrics:
    def _frame(self, spark, rows):
        return spark.createDataFrame(
            rows, "query_id long, neighbor_id long, rank int"
        )

    def test_perfect_results(self, spark):
        truth = self._frame(
            spark, [(1, 10, 1), (1, 11, 2), (2, 20, 1), (2, 21, 2)]
        )
        from gpd_lite_toolbox_spark.vector.mining import retrieval_metrics

        out = {r.metric: r.value
               for r in retrieval_metrics(truth, truth, ks=(1, 2)).collect()}
        assert out == {"recall@1": 1.0, "recall@2": 1.0, "mrr": 1.0}

    def test_hand_computed_partial(self, spark):
        from gpd_lite_toolbox_spark.vector.mining import retrieval_metrics

        truth = self._frame(
            spark, [(1, 10, 1), (1, 11, 2), (2, 20, 1), (2, 21, 2)]
        )
        # query 1: finds the true #2 at rank 1 and the true #1 at rank
        # 2 (swapped); query 2: misses everything
        res = self._frame(spark, [(1, 11, 1), (1, 10, 2), (2, 99, 1)])
        out = {r.metric: r.value
               for r in retrieval_metrics(res, truth, ks=(1, 2)).collect()}
        # recall@1: q1 overlap {10}&{11}=0, q2 0 -> 0
        assert out["recall@1"] == 0.0
        # recall@2: q1 2/2, q2 0/2 -> 0.5
        assert out["recall@2"] == 0.5
        # mrr: true #1 of q1 found at rank 2 -> 1/2; q2 missed -> 0
        assert out["mrr"] == 0.25

    def test_missing_query_counts_as_zero(self, spark):
        from gpd_lite_toolbox_spark.vector.mining import retrieval_metrics

        truth = self._frame(spark, [(1, 10, 1), (2, 20, 1)])
        res = self._frame(spark, [(1, 10, 1)])  # query 2 absent
        out = {r.metric: r.value
               for r in retrieval_metrics(res, truth, ks=(1,)).collect()}
        assert out["recall@1"] == 0.5 and out["mrr"] == 0.5


class TestProfileDrift:
    def test_pure_scaling_is_not_drift(self, spark):
        from gpd_lite_toolbox_spark.operators.audit import profile_drift

        # new = old duplicated 2x: rows, nulls, distincts all scale
        # exactly (distinct unchanged -> flagged; null RATE unchanged
        # -> not flagged on nulls). Build a column where everything
        # scales: unique keys duplicated double distincts? No — use
        # the null-rate law: 1 null in 4 rows vs 2 nulls in 8 rows.
        old = spark.createDataFrame(
            [(1, "a"), (2, None), (3, "b"), (4, "c")], "k long, s string"
        )
        new = old.unionAll(old)
        out = {r.column: r for r in profile_drift(old, new).collect()}
        # nulls scaled exactly; distincts did NOT scale (same values)
        assert out["s"].n_nulls_old == 1 and out["s"].n_nulls_new == 2
        assert out["s"].drifted  # distinct count failed to scale
        # a strictly identical snapshot shows zero drift anywhere
        same = profile_drift(old, old).collect()
        assert all(not r.drifted for r in same)

    def test_null_rate_change_flags(self, spark):
        from gpd_lite_toolbox_spark.operators.audit import profile_drift

        old = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
        new = spark.createDataFrame([(1, "a"), (2, None)], "k long, s string")
        out = {r.column: r for r in profile_drift(old, new).collect()}
        assert out["s"].drifted
        assert not out["k"].drifted


class TestSceneChanges:
    def _vids(self, spark, ids):
        from gpd_lite_toolbox_spark.media.multimodal import (
            attach_fake_media,
            decode_image_meta,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        return decode_image_meta(
            attach_fake_media(df).filter(F.col("media_kind") == "video")
        )

    def test_scene_count_matches_block_arithmetic(self, spark):
        from gpd_lite_toolbox_spark.media.multimodal import scene_changes

        ids = [2, 5, 8, 11, 14]  # %3==2 are video
        out = {r.doc_id: r for r in scene_changes(
            self._vids(spark, ids), every_n=5, scene_len=30).collect()}
        for i in out:
            nf = 1 + (i * 31) % 240
            sampled = list(range(0, nf, 5))
            want_scenes = len({f // 30 for f in sampled})
            assert out[i].n_sampled == len(sampled)
            assert out[i].n_scenes == want_scenes

    def test_single_scene_video(self, spark):
        from gpd_lite_toolbox_spark.media.multimodal import scene_changes

        # seed 29: n_frames = 1 + 899 % 240 = 180 -> scene_len 200
        # covers everything -> exactly one scene
        out = scene_changes(
            self._vids(spark, [29]), every_n=5, scene_len=200
        ).collect()
        assert len(out) == 1 and out[0].n_scenes == 1
