"""Session-9 batch 8: epoch materialization and session path mining."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gpd_lite_toolbox_spark.operators.temporal import session_paths
from gpd_lite_toolbox_spark.text.corpus import epoch_expand, temperature_mixture

T0 = dt.datetime(2024, 1, 1)


class TestEpochExpand:
    def _docs(self, spark, rows):
        return spark.createDataFrame(
            rows, "id long, text string, source string"
        )

    def test_copies_track_planned_epochs(self, spark):
        # big source: 10 docs x 100 tokens; small source: 2 docs x 10
        rows = [(i, "w " * 99 + "w", "big") for i in range(10)]
        rows += [(100 + i, "w " * 9 + "w", "small") for i in range(2)]
        docs = self._docs(spark, rows)
        budget = 500
        out = epoch_expand(docs, token_budget=budget).collect()
        w = {r.source: r for r in
             temperature_mixture(docs, budget).collect()}
        from collections import Counter

        per_source = Counter(r.source for r in out)
        for src in ("big", "small"):
            n_docs = 10 if src == "big" else 2
            eps = w[src].epochs
            lo, hi = n_docs * int(eps), n_docs * (int(eps) + 1)
            assert lo <= per_source.get(src, 0) <= hi
        # per doc, epochs are 1..n with no gaps
        by_id: dict[int, list] = {}
        for r in out:
            by_id.setdefault(r.id, []).append(r.epoch)
        for eps in by_id.values():
            assert sorted(eps) == list(range(1, len(eps) + 1))

    def test_deterministic(self, spark):
        rows = [(i, "a b c d e", "s") for i in range(6)]
        docs = self._docs(spark, rows)
        a = sorted((r.id, r.epoch) for r in
                   epoch_expand(docs, 100).collect())
        b = sorted((r.id, r.epoch) for r in
                   epoch_expand(docs, 100).collect())
        assert a == b

    def test_zero_weight_source_emits_nothing_extra(self, spark):
        # a source whose planned epochs < 1 may drop docs entirely —
        # every emitted row still has epoch >= 1
        rows = [(i, "w " * 199 + "w", "big") for i in range(20)]
        rows += [(100, "tiny", "small")]
        out = epoch_expand(self._docs(spark, rows), token_budget=100)
        assert out.filter(F.col("epoch") < 1).count() == 0


class TestSessionPaths:
    def _events(self, spark, rows):
        data = [
            (i, u, T0 + dt.timedelta(minutes=m), t)
            for i, (u, m, t) in enumerate(rows)
        ]
        return spark.createDataFrame(
            data,
            "event_id long, user_id long, ts timestamp, event_type string",
        )

    def test_paths_respect_session_breaks(self, spark):
        rows = [
            (1, 0, "a"), (1, 1, "b"), (1, 2, "c"),   # session 1: a>b>c
            (1, 600, "x"), (1, 601, "y"), (1, 602, "z"),  # new session
        ]
        ev = self._events(spark, rows)
        out = {r.path for r in
               session_paths(ev, n=3, top_k=10, gap_s=1800).collect()}
        assert out == {"a>b>c", "x>y>z"}  # never a path spanning the gap

    def test_counts_and_rank_order(self, spark):
        rows = []
        for u in range(3):  # 3 users each doing a>b>c
            rows += [(u, 0, "a"), (u, 1, "b"), (u, 2, "c")]
        rows += [(9, 0, "b"), (9, 1, "c"), (9, 2, "a")]  # one b>c>a
        out = session_paths(self._events(spark, rows), n=3, top_k=10,
                            gap_s=1800).collect()
        out.sort(key=lambda r: r.rank)
        assert out[0].path == "a>b>c" and out[0].n_occurrences == 3
        assert out[0].n_sessions == 3
        assert {r.path for r in out} == {"a>b>c", "b>c>a"}

    def test_short_sessions_yield_no_paths(self, spark):
        rows = [(1, 0, "a"), (1, 1, "b")]
        assert session_paths(self._events(spark, rows), n=3).count() == 0

    def test_overlapping_occurrences_counted(self, spark):
        rows = [(1, i, "a") for i in range(5)]  # a a a a a -> 3 trigrams
        out = session_paths(self._events(spark, rows), n=3, gap_s=1800)
        r = out.collect()[0]
        assert r.path == "a>a>a" and r.n_occurrences == 3
        assert r.n_sessions == 1


class TestPairPr:
    def _pairs(self, spark, rows):
        return spark.createDataFrame(rows, "id_a long, id_b long")

    def test_hand_computed(self, spark):
        from gpd_lite_toolbox_spark.text.dedup import pair_pr

        cand = self._pairs(spark, [(1, 2), (3, 4), (5, 6), (7, 8)])
        truth = self._pairs(spark, [(2, 1), (3, 4), (9, 10)])
        out = {r.metric: r.value for r in pair_pr(cand, truth).collect()}
        assert out["precision"] == 0.5  # 2 of 4
        assert abs(out["recall"] - round(2 / 3, 6)) < 1e-9
        # f1 = 2*2/(4+3)
        assert abs(out["f1"] - round(4 / 7, 6)) < 1e-9

    def test_orientation_and_dups_normalize(self, spark):
        from gpd_lite_toolbox_spark.text.dedup import pair_pr

        cand = self._pairs(spark, [(1, 2), (2, 1), (1, 2)])
        truth = self._pairs(spark, [(2, 1)])
        out = {r.metric: r.value for r in pair_pr(cand, truth).collect()}
        assert out == {"precision": 1.0, "recall": 1.0, "f1": 1.0}

    def test_empty_sides_give_null_not_crash(self, spark):
        from gpd_lite_toolbox_spark.text.dedup import pair_pr

        empty = self._pairs(spark, [])
        truth = self._pairs(spark, [(1, 2)])
        out = {r.metric: r.value for r in pair_pr(empty, truth).collect()}
        assert out["precision"] is None and out["recall"] == 0.0
        assert out["f1"] is None


class TestDauWau:
    def _events(self, spark, rows):
        data = [
            (i, u, T0 + dt.timedelta(days=d), "view")
            for i, (u, d) in enumerate(rows)
        ]
        return spark.createDataFrame(
            data,
            "event_id long, user_id long, ts timestamp, event_type string",
        )

    def test_hand_computed_window(self, spark):
        from gpd_lite_toolbox_spark.operators.temporal import dau_wau

        # user 1 active day 0 and 3; user 2 active day 3 only
        ev = self._events(spark, [(1, 0.1), (1, 3.1), (2, 3.2)])
        out = {r.day - min(x.day for x in rows): r
               for rows in [dau_wau(ev).collect()]
               for r in rows}
        assert out[0].dau == 1 and out[0].wau == 1
        # day 3: both users active; WAU window [d-6, d] includes day 0
        assert out[3].dau == 2 and out[3].wau == 2
        assert out[3].stickiness == 1.0

    def test_wau_covers_trailing_seven_days(self, spark):
        from gpd_lite_toolbox_spark.operators.temporal import dau_wau

        # user 1 on day 0; user 2 on day 6 and day 7
        ev = self._events(spark, [(1, 0.1), (2, 6.1), (2, 7.1)])
        rows = dau_wau(ev).collect()
        base = min(r.day for r in rows)
        out = {r.day - base: r for r in rows}
        assert out[6].wau == 2        # day 0 still inside [0, 6]
        assert out[7].wau == 1        # day 0 aged out of [1, 7]
        assert out[6].dau == 1 and out[6].stickiness == 0.5

    def test_multiple_events_per_day_count_once(self, spark):
        from gpd_lite_toolbox_spark.operators.temporal import dau_wau

        ev = self._events(spark, [(1, 0.1), (1, 0.2), (1, 0.3)])
        out = dau_wau(ev).collect()
        assert len(out) == 1 and out[0].dau == 1 and out[0].wau == 1
