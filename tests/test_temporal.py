"""as-of join + binned range join: tie/boundary semantics on closed-form
inputs, plus plan shape (no cartesian/theta join anywhere)."""

import pyspark.sql.functions as F

from gpd_lite_toolbox_spark.operators.temporal import asof_join, range_join_binned


def _asof(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "lid long, k long, us long")
    right = spark.createDataFrame(right_rows, "k long, r_us long, rid long, v double")
    return asof_join(
        left, right, key="k", left_ts="us", right_ts="r_us",
        payload=["rid", "r_us", "v"],
    )


def test_asof_picks_latest_at_or_before(spark):
    out = _asof(
        spark,
        [(1, 7, 100), (2, 7, 250), (3, 7, 50)],
        [(7, 60, 10, 1.0), (7, 100, 11, 2.0), (7, 200, 12, 3.0)],
    ).toPandas().set_index("lid")
    # lid=1 at t=100: rid 11 (equal timestamp is visible — at-or-before)
    assert out.loc[1, "prev_rid"] == 11
    # lid=2 at t=250: rid 12
    assert out.loc[2, "prev_rid"] == 12
    # lid=3 at t=50: no right row at-or-before -> dropped
    assert 3 not in out.index


def test_asof_equal_right_timestamps_pick_max_first_payload(spark):
    out = _asof(
        spark,
        [(1, 7, 100)],
        [(7, 90, 10, 1.0), (7, 90, 13, 2.0), (7, 90, 11, 3.0)],
    ).toPandas()
    assert out.loc[0, "prev_rid"] == 13  # max rid wins the tie


def test_asof_null_payload_column_not_backfilled(spark):
    """A NULL in one payload column of the matched right row must stay
    NULL — never be filled from an OLDER right row (the whole payload
    comes from exactly one right row)."""
    left = spark.createDataFrame([(1, 7, 100)], "lid long, k long, us long")
    right = spark.createDataFrame(
        [(7, 50, 10, 1.0), (7, 90, 11, None)],
        "k long, r_us long, rid long, v double",
    )
    out = asof_join(
        left, right, key="k", left_ts="us", right_ts="r_us",
        payload=["rid", "r_us", "v"],
    ).toPandas()
    assert len(out) == 1
    assert out.loc[0, "prev_rid"] == 11
    assert out.loc[0, "prev_r_us"] == 90
    import pandas as pd
    assert pd.isna(out.loc[0, "prev_v"])  # NOT 1.0 from the older row


def test_asof_null_first_payload_keeps_match(spark):
    """A NULL in payload[0] of the matched right row must neither drop
    the match nor skip to an older row (existence is tracked by a
    dedicated marker, not payload[0])."""
    left = spark.createDataFrame([(1, 7, 100)], "lid long, k long, us long")
    right = spark.createDataFrame(
        [(7, 50, 10, 1.0), (7, 90, None, 5.0)],
        "k long, r_us long, rid long, v double",
    )
    out = asof_join(
        left, right, key="k", left_ts="us", right_ts="r_us",
        payload=["rid", "r_us", "v"],
    ).toPandas()
    assert len(out) == 1
    import pandas as pd
    assert pd.isna(out.loc[0, "prev_rid"])
    assert out.loc[0, "prev_r_us"] == 90
    assert out.loc[0, "prev_v"] == 5.0


def test_asof_keys_do_not_leak(spark):
    out = _asof(
        spark,
        [(1, 7, 100)],
        [(8, 50, 10, 1.0)],  # other key only
    )
    assert out.count() == 0


def test_asof_plan_has_no_inequality_join(spark):
    df = _asof(spark, [(1, 7, 100)], [(7, 50, 10, 1.0)])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_inclusive_bounds_and_bins(spark):
    # candidates at exactly +-w must be included; beyond excluded.
    probe = spark.createDataFrame([(1, 7, 1000)], "pid long, k long, us long")
    cand = spark.createDataFrame(
        [(7, 900, 0.5), (7, 1010, 1.5), (7, 1011, 9.0), (7, 990, 2.0),
         (8, 1000, 99.0)],
        "k long, c_us long, v double",
    )
    out = range_join_binned(
        probe, cand, key="k", probe_us="us", cand_us="c_us",
        half_width_us=10,
        aggs=[F.count("*").alias("n"), F.sum("v").alias("sv")],
        probe_id="pid",
    ).toPandas()
    assert len(out) == 1
    assert out.loc[0, "n"] == 2  # 1010 (=+w) and 990 (=-w); 900/1011 out
    assert abs(out.loc[0, "sv"] - 3.5) < 1e-12


def test_range_join_probe_without_candidates_absent(spark):
    probe = spark.createDataFrame([(1, 7, 1000)], "pid long, k long, us long")
    cand = spark.createDataFrame([(7, 5000, 1.0)], "k long, c_us long, v double")
    out = range_join_binned(
        probe, cand, key="k", probe_us="us", cand_us="c_us",
        half_width_us=10, aggs=[F.count("*").alias("n")], probe_id="pid",
    )
    assert out.count() == 0


def test_asof_matches_pandas_merge_asof_randomized(spark):
    """Independent-reference check: the union+window as-of must agree
    with pandas.merge_asof (direction='backward', inclusive) on a
    seeded random workload with duplicate timestamps across keys."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(42)
    n_l, n_r = 400, 600
    left = pd.DataFrame({
        "lid": np.arange(n_l),
        "k": rng.integers(0, 8, n_l),
        "us": rng.integers(0, 500, n_l),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 8, n_r),
        "r_us": rng.integers(0, 500, n_r),
        "rid": np.arange(n_r),
        "v": rng.random(n_r).round(3),
    })
    out = asof_join(
        spark.createDataFrame(left.astype("int64")),
        spark.createDataFrame(
            right.astype({"k": "int64", "r_us": "int64", "rid": "int64"})
        ),
        key="k", left_ts="us", right_ts="r_us", payload=["rid", "v"],
    ).toPandas().sort_values("lid", ignore_index=True)

    # pandas reference: stable-sort right by (r_us, rid) so the LAST
    # match at equal timestamps is the max-rid row — the operator's
    # documented tie-break
    ref = pd.merge_asof(
        left.sort_values(["us", "lid"], kind="stable"),
        right.sort_values(["r_us", "rid"], kind="stable"),
        left_on="us", right_on="r_us", by="k",
        direction="backward", allow_exact_matches=True,
    ).dropna(subset=["rid"]).sort_values("lid", ignore_index=True)

    assert len(out) == len(ref)
    merged = out.merge(ref, on="lid", suffixes=("_s", "_p"))
    assert (merged["prev_rid"] == merged["rid"]).all()
    assert (merged["prev_v"] == merged["v"]).all()


def test_windowed_zscore_flags_planted_burst(spark):
    """A user alternating 1/2 events per hour with one 20-event burst
    hour: the burst bucket z-scores far above its trailing spread;
    ordinary buckets stay modest. A PERFECTLY constant user has zero
    trailing spread, so z is undefined and the var > 0 gate drops
    every bucket — documented semantics, asserted too."""
    from gpd_lite_toolbox_spark.operators.temporal import windowed_zscore

    hour = 3_600_000_000
    rows = []
    for h in range(48):
        n = 20 if h == 40 else (1 if h % 2 == 0 else 2)
        for i in range(n):
            rows.append((7, h * hour + i * 1000))
    for h in range(48):  # constant-rate user: zero spread, no rows
        rows.append((9, h * hour))
    df = spark.createDataFrame(rows, "user_id long, us long")
    out = {
        (r.user_id, r.bucket_us): r.z
        for r in windowed_zscore(df, key="user_id", ts_us="us").collect()
    }
    burst = out[(7, 40 * hour)]
    assert burst > 10.0, f"burst z {burst}"
    ordinary = [
        z for (u, b), z in out.items() if u == 7 and b < 40 * hour
    ]
    assert ordinary and all(abs(z) < 2.0 for z in ordinary)
    assert not any(u == 9 for (u, _) in out)


def test_resample_ffill_gaps_and_latest_value(spark):
    """Gaps inherit the previous value; within-bucket latest (by ts,
    tiebreak) wins; counts are per bucket; the grid spans exactly the
    key's observed buckets."""
    from gpd_lite_toolbox_spark.operators.temporal import resample_ffill

    rows = [
        # user 1: buckets 0 (two events, later one wins), 3 (gap 1-2)
        (1, 100, 5, 1.0),
        (1, 101, 8, 2.0),     # same bucket 0, later ts -> wins
        (1, 102, 35, 9.0),    # bucket 3
        # user 2: single bucket
        (2, 200, 12, 7.0),
        # user 3: tie on ts within bucket -> higher tiebreak wins
        (3, 301, 20, 4.0),
        (3, 302, 20, 6.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, us long, value double")
    out = {
        (r.user_id, r.bucket_us): (r.n_events, r.value)
        for r in resample_ffill(
            df, "user_id", "us", "value", step_us=10, tiebreak="event_id"
        ).collect()
    }
    assert out[(1, 0)] == (2, 2.0)
    assert out[(1, 10)] == (0, 2.0)   # gap, forward-filled
    assert out[(1, 20)] == (0, 2.0)
    assert out[(1, 30)] == (1, 9.0)
    assert (1, 40) not in out          # grid ends at last observed bucket
    assert out[(2, 10)] == (1, 7.0) and len(
        [k for k in out if k[0] == 2]
    ) == 1
    assert out[(3, 20)] == (2, 6.0)   # ts tie -> tiebreak decides
