"""Session-9 batch 5: conversion funnel and retention cohorts."""

from __future__ import annotations

import datetime as dt

from gpd_lite_toolbox_spark.operators.temporal import (
    conversion_funnel,
    retention_cohorts,
)

T0 = dt.datetime(2024, 1, 1)


def _events(spark, rows):
    """rows: (user, day_offset_float, type)"""
    data = [
        (i, u, T0 + dt.timedelta(days=d), t)
        for i, (u, d, t) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, event_type string"
    )


class TestConversionFunnel:
    def test_order_matters(self, spark):
        rows = [
            # user 1 converts fully in order
            (1, 0.0, "view"), (1, 1.0, "click"), (1, 2.0, "purchase"),
            # user 2 purchases BEFORE clicking: stops at click
            (2, 0.0, "view"), (2, 1.0, "purchase"), (2, 2.0, "click"),
            # user 3 only views
            (3, 0.0, "view"),
            # user 4 never views: not in the funnel at all
            (4, 0.0, "click"), (4, 1.0, "purchase"),
        ]
        out = {r.step: r for r in conversion_funnel(
            _events(spark, rows), ("view", "click", "purchase")).collect()}
        assert (out[1].n_users, out[2].n_users, out[3].n_users) == (3, 2, 1)
        assert out[1].conv_rate == 1.0
        assert abs(out[2].conv_rate - round(2 / 3, 6)) < 1e-9
        assert out[3].conv_rate == 0.5

    def test_same_timestamp_is_not_after(self, spark):
        rows = [(1, 0.0, "view"), (1, 0.0, "click")]
        out = {r.step: r.n_users for r in conversion_funnel(
            _events(spark, rows), ("view", "click")).collect()}
        assert out == {1: 1, 2: 0}

    def test_repeat_events_use_first_qualifying(self, spark):
        # the SECOND view is followed by a click; the funnel anchors on
        # the FIRST view, and the click is still after it — converts
        rows = [(1, 0.0, "view"), (1, 5.0, "view"), (1, 6.0, "click")]
        out = {r.step: r.n_users for r in conversion_funnel(
            _events(spark, rows), ("view", "click")).collect()}
        assert out == {1: 1, 2: 1}


class TestRetentionCohorts:
    def test_two_cohorts_with_churn(self, spark):
        rows = []
        # cohort A: users 1-3 start week 0; user 3 churns after week 0;
        # users 1-2 return week 1; only user 1 returns week 2
        for u, weeks in ((1, (0, 1, 2)), (2, (0, 1)), (3, (0,))):
            rows += [(u, 7.0 * w + 0.5, "view") for w in weeks]
        # cohort B: user 9 starts week 1, returns week 2
        rows += [(9, 7.5, "view"), (9, 14.5, "view")]
        out = {(r.cohort_week, r.week_offset): r for r in
               retention_cohorts(_events(spark, rows)).collect()}
        base = min(k[0] for k in out)
        a0, a1, a2 = (out[(base, k)] for k in (0, 1, 2))
        assert (a0.n_active, a1.n_active, a2.n_active) == (3, 2, 1)
        assert a1.retention == round(2 / 3, 6)
        b0, b1 = out[(base + 1, 0)], out[(base + 1, 1)]
        assert (b0.n_active, b1.n_active) == (1, 1)
        assert b1.retention == 1.0

    def test_multiple_events_one_week_count_once(self, spark):
        rows = [(1, 0.1, "view"), (1, 0.2, "click"), (1, 0.3, "view")]
        out = retention_cohorts(_events(spark, rows)).collect()
        assert len(out) == 1
        assert out[0].n_active == 1 and out[0].retention == 1.0
