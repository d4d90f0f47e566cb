"""Relational logistic regression (text/classify.py lr_train_gd /
lr_score / standardize_features).

The hash gate (oracles.LR_QUALITY) pins exact cross-engine training
replay; these tests pin the SEMANTICS the gate can't express: the
rounds actually LEARN (separation between the classes grows, loss
falls), standardization is correct and constant-feature-safe, scoring
is plan-clean, and the determinism contract holds across partitionings
and AQE.
"""

import math

import pytest

from pyspark.sql import functions as F

from gpd_lite_toolbox_spark.text.classify import (
    lr_score,
    lr_train_gd,
    standardize_features,
)


def _toy(spark, n=200, parts=1):
    """Linearly separable-ish toy: x1 drives the label, x2 is noise,
    x3 is constant (sigma-0 guard)."""
    rows = [
        (
            i,
            float(i % 20),
            float((i * 7) % 13),
            5.0,
            1 if (i % 20) >= 10 else 0,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "id bigint, x1 double, x2 double, x3 double, label int"
    ).repartition(parts)


_COLS = ["x1", "x2", "x3"]


def test_lr_learns_separation_and_loss_falls(spark):
    df = _toy(spark)
    losses = []
    for it in (0, 1, 3, 6):
        w = lr_train_gd(df, _COLS, "label", n_iter=it)
        scored = lr_score(df, w, _COLS).join(
            df.select("id", "label"), "id"
        )
        rows = scored.collect()
        eps = 1e-12
        loss = -sum(
            r.label * math.log(max(r.p, eps))
            + (1 - r.label) * math.log(max(1 - r.p, eps))
            for r in rows
        ) / len(rows)
        losses.append(loss)
        if it == 6:
            p1 = [r.p for r in rows if r.label == 1]
            p0 = [r.p for r in rows if r.label == 0]
            assert min(p1) > max(p0), "classes must separate on x1"
    assert losses == sorted(losses, reverse=True), losses
    # from ln(2) =~ 0.693 at w=0 to well under it after 6 GD rounds
    assert losses[0] > 0.69 and losses[-1] < 0.45


def test_lr_deterministic_across_partitioning_and_aqe(spark):
    ref = None
    key = "spark.sql.adaptive.enabled"
    prev = spark.conf.get(key)
    try:
        for parts in (1, 7):
            for aqe in ("true", "false"):
                spark.conf.set(key, aqe)
                w = lr_train_gd(_toy(spark, parts=parts), _COLS, "label")
                got = w.collect()[0].asDict()
                if ref is None:
                    ref = got
                assert got == ref, (parts, aqe)
    finally:
        spark.conf.set(key, prev)


def test_standardize_moments_and_constant_feature(spark):
    df = _toy(spark)
    out = standardize_features(df, _COLS)
    stats = out.agg(
        F.round(F.avg("x1"), 3).alias("m1"),
        F.round(F.stddev_pop("x1"), 2).alias("s1"),
        F.sum(F.abs(F.col("x3"))).alias("c3"),
    ).collect()[0]
    assert abs(stats.m1) < 0.001  # centered
    assert abs(stats.s1 - 1.0) < 0.01  # unit variance
    assert stats.c3 == 0.0  # constant feature -> all zeros, no NaN


def test_lr_zero_iters_is_half_everywhere_and_bad_n_iter(spark):
    df = _toy(spark, n=50)
    w = lr_train_gd(df, _COLS, "label", n_iter=0)
    ps = {r.p for r in lr_score(df, w, _COLS).collect()}
    assert ps == {0.5}
    with pytest.raises(ValueError, match="n_iter"):
        lr_train_gd(df, _COLS, "label", n_iter=-1)


def test_lr_plan_stays_jvm_side(spark):
    df = _toy(spark, n=50)
    w = lr_train_gd(df, _COLS, "label", n_iter=2)
    plan = (
        lr_score(df, w, _COLS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


# ---------------------------------------------------------------------------
# group_trend (operators/temporal.py) — shares the numerics recipe
# ---------------------------------------------------------------------------


def test_group_trend_recovers_planted_lines(spark):
    from gpd_lite_toolbox_spark.operators.temporal import group_trend

    rows = []
    for x in range(20):
        rows.append(("up", float(x), 3.0 * x + 7.0))      # exact line
        rows.append(("down", float(x), -2.0 * x + 100.0))  # exact line
        rows.append(("flat", float(x), 42.0))              # zero y-var
        rows.append(("point", 5.0, float(x)))              # zero x-var
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r.g: r for r in group_trend(df, ["g"], "x", "y").collect()}
    assert out["up"].slope == 3.0 and out["up"].intercept == 7.0
    assert out["up"].r2 == 1.0
    assert out["down"].slope == -2.0 and out["down"].intercept == 100.0
    assert out["flat"].slope == 0.0 and out["flat"].r2 is None
    assert out["point"].slope is None and out["point"].r2 is None
    assert all(r.n == 20 for r in out.values())


def test_group_trend_deterministic_across_partitioning(spark):
    from gpd_lite_toolbox_spark.operators.temporal import group_trend

    rows = [
        ("a", float(i % 37), float((i * 13) % 101) + 0.123456)
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    ref = None
    for parts in (1, 11):
        got = group_trend(df.repartition(parts), ["g"], "x", "y").collect()
        row = got[0].asDict()
        if ref is None:
            ref = row
        assert row == ref, parts


def test_group_trend_matches_numpy_reference(spark):
    """Randomized cross-check against numpy lstsq (independent
    algorithm): slope/intercept/r2 within the rounding tolerance."""
    import numpy as np

    rng = np.random.RandomState(7)
    rows = []
    expect = {}
    for g in range(6):
        n = int(rng.randint(5, 40))
        x = np.round(rng.uniform(-50, 50, n), 6)
        y = np.round(3.0 * rng.randn() * x + rng.randn(n) * 5.0 + 10, 6)
        rows += [(f"g{g}", float(a), float(b)) for a, b in zip(x, y)]
        A = np.vstack([x, np.ones(n)]).T
        (sl, ic), res, _, _ = np.linalg.lstsq(A, y, rcond=None)
        ss_tot = float(((y - y.mean()) ** 2).sum())
        ss_res = float(((y - (sl * x + ic)) ** 2).sum())
        r2 = 1 - ss_res / ss_tot if ss_tot > 0 else None
        expect[f"g{g}"] = (float(sl), float(ic), r2)
    from gpd_lite_toolbox_spark.operators.temporal import group_trend

    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r.g: r for r in group_trend(df, ["g"], "x", "y").collect()}
    for g, (sl, ic, r2) in expect.items():
        assert abs(out[g].slope - sl) < 1e-4, g
        assert abs(out[g].intercept - ic) < 1e-4, g
        if r2 is not None:
            assert abs(out[g].r2 - r2) < 1e-4, g
