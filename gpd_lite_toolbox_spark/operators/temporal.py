"""Temporal join operators: as-of join and binned range join.

Neither exists in the reference (gpd_lite_toolbox is batch-spatial
only) nor as a Spark built-in; both are core shapes of a large-scale
event/training-data pipeline (point-in-time feature lookup, local
time-neighborhood aggregation) and both are implemented here WITHOUT
an inequality join — the naive `a.ts <= b.ts` theta-join is a
cross-product per key and dies at scale.

- ``asof_join``: union the two streams, one shuffle by key, and a
  running ``last(..., ignorenulls=True)`` window carries the most
  recent right-side payload onto each left row. This is the classic
  merge-sort as-of shape: cost is one exchange + one sort, identical
  to what a purpose-built engine (e.g. a time-series DB) does.
- ``range_join_binned``: time is bucketed at the window width; probe
  rows join candidates in their own and the two neighbouring buckets
  (an equi-join on (key, bucket)), and the exact |dt| <= w predicate
  filters after. Fan-out is exactly 3x the probe side, independent of
  data volume — the standard binned range-join rewrite.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..cache import tracked_persist


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    prefix: str = "prev_",
) -> DataFrame:
    """For each left row, attach the payload of the most recent right
    row with ``right.ts <= left.ts`` for the same key (at-or-before,
    inclusive). Left rows with no earlier right row are dropped
    (inner as-of semantics).

    Ties: right rows sort BEFORE left rows at equal timestamps (so an
    exactly-simultaneous right row is visible), and among right rows
    with identical timestamps the one latest in ``payload[0]`` order
    wins — a deterministic total order.

    The whole payload is carried as ONE struct (a single
    ``last(struct, ignorenulls=True)``), so every output column comes
    from the same matched right row even when individual payload
    values are NULL — per-column carries would silently backfill a
    NULL column from an older right row. Match existence is the
    struct's own nullity, not any payload value.

    Scale: one hash exchange by ``key`` + one within-partition sort.
    No inequality join, no per-key cross product; skewed keys are
    AQE-splittable like any other exchange.
    """
    lcols = [c for c in left.columns]
    # side flag: right=0 sorts before left=1 at equal ts
    r = right.select(
        F.col(key).alias(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c).alias(c) for c in payload]).alias("_p"),
        *[F.lit(None).alias(f"_l_{c}") for c in lcols],
    )
    l = left.select(
        F.col(key).alias(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).alias("_p"),  # union promotes NullType -> struct
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    # right-row tiebreak: payload[0] ascending, so last() picks the max
    w = (
        Window.partitionBy(key)
        .orderBy(
            F.col("_ts").asc(),
            F.col("_side").asc(),
            F.col("_p")[payload[0]].asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        r.unionByName(l)
        .select(
            key, "_side",
            F.last("_p", ignorenulls=True).over(w).alias("_p"),
            *[F.col(f"_l_{c}").alias(c) for c in lcols if c != key],
        )
        .filter(F.col("_side") == 1)
        .filter(F.col("_p").isNotNull())
        .select(
            key,
            *[F.col("_p")[c].alias(f"{prefix}{c}") for c in payload],
            *[c for c in lcols if c != key],
        )
    )


def event_transitions(
    events: DataFrame,
    key: str,
    ts: str,
    state: str,
    order_tiebreak: str,
) -> DataFrame:
    """First-order transition counts of a per-key event sequence:
    ``(prev_state, state, n)`` over consecutive pairs ordered by
    ``(ts, tiebreak)`` within each key (the Markov-matrix shape of
    user-journey / telemetry analysis). One exchange for the lag
    window, one partial-aggregated exchange for the count."""
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(order_tiebreak).asc())
    return (
        events.withColumn("_prev", F.lag(state).over(w))
        .filter(F.col("_prev").isNotNull())
        .groupBy(F.col("_prev").alias(f"prev_{state}"), F.col(state))
        .agg(F.count("*").alias("n"))
    )


def windowed_zscore(
    events: DataFrame,
    key: str,
    ts_us: "F.Column | str",
    bucket_us: int = 3_600_000_000,
    trailing: int = 24,
    min_obs: int = 6,
) -> DataFrame:
    """Per-key event-rate anomaly scores: bucket events at
    ``bucket_us``, then z-score each bucket's count against the
    TRAILING ``trailing`` buckets of the same key (the standard
    telemetry anomaly shape: "is this hour unusual for this user?").

    Output: (key, bucket_us, n, z) for buckets with at least
    ``min_obs`` trailing observations and non-zero trailing spread;
    z rounded to 6. The trailing mean/std use the explicit
    sum/sum-of-squares forms (population std), so both engines
    compute identical arithmetic regardless of their accumulator
    internals — the repo-wide exactness convention.

    Scale: one partial-aggregated exchange for the bucket counts, one
    window exchange by key. The window frame is ROWS-based over the
    OBSERVED buckets of the key (silent hours are absent rows, the
    sparse convention) — state is per-key-bounded, skewed keys split
    under AQE like any exchange.
    """
    us = F.col(ts_us) if isinstance(ts_us, str) else ts_us
    # pmod, not %: the sign-of-dividend remainder would fuse the two
    # half-buckets around a NEGATIVE timestamp's zero into one
    # double-width bucket; pmod floors toward -inf like the module's
    # other bucketers (range_join_binned, resample_ffill)
    counts = (
        events.select(
            F.col(key).alias("k"),
            (us - F.pmod(us, F.lit(int(bucket_us)))).alias("bucket_us"),
        )
        .groupBy("k", "bucket_us")
        .agg(F.count("*").alias("n"))
    )
    w = (
        Window.partitionBy("k")
        .orderBy("bucket_us")
        .rowsBetween(-int(trailing), -1)
    )
    cnt = F.count("n").over(w)
    s1 = F.sum(F.col("n").cast("double")).over(w)
    s2 = F.sum((F.col("n") * F.col("n")).cast("double")).over(w)
    mean = s1 / cnt
    var = (s2 - s1 * s1 / cnt) / cnt
    return (
        counts.withColumn("_c", cnt)
        .withColumn("_m", mean)
        .withColumn("_v", var)
        .filter((F.col("_c") >= int(min_obs)) & (F.col("_v") > 0))
        .select(
            F.col("k").alias(key),
            "bucket_us",
            "n",
            F.round(
                (F.col("n") - F.col("_m")) / F.sqrt(F.col("_v")), 6
            ).alias("z"),
        )
    )


def range_join_binned(
    probe: DataFrame,
    candidates: DataFrame,
    key: str,
    probe_us: str,
    cand_us: str,
    half_width_us: int,
    aggs: Sequence,
    probe_id: str,
) -> DataFrame:
    """Aggregate ``candidates`` rows within ``[t - w, t + w]``
    (inclusive) of each probe row's timestamp, per key.

    Both timestamp columns are int64 microseconds. ``aggs`` are
    aggregate Columns over the joined candidate columns; output is one
    row per probe row that has >= 1 candidate in range.

    Scale: candidates are bucketed at the window width; each probe row
    expands to its 3 adjacent buckets (constant fan-out) and joins on
    ``(key, bucket)`` — a plain equi-join Catalyst can broadcast,
    shuffle, or skew-split. The exact range predicate runs post-join
    on the (already bucket-pruned) pairs.
    """
    w = int(half_width_us)
    cand = candidates.select(
        F.col(key).alias("_k"),
        F.expr(f"CAST({cand_us} AS BIGINT) div {w}").alias("_b"),
        *[F.col(c) for c in candidates.columns if c != key],
    )
    b0 = F.expr(f"CAST({probe_us} AS BIGINT) div {w}")
    pr = probe.select(
        F.col(key).alias("_k"),
        F.col(probe_us).cast("long").alias("_pus"),
        F.col(probe_id).alias("_pid"),
        F.explode(F.array(b0 - 1, b0, b0 + 1)).alias("_b"),
    )
    joined = pr.join(cand, ["_k", "_b"]).filter(
        F.abs(F.col(cand_us).cast("long") - F.col("_pus")) <= w
    )
    return (
        joined.groupBy(
            F.col("_pid").alias(probe_id),
            F.col("_k").alias(key),
            F.col("_pus").alias(probe_us),
        )
        .agg(*aggs)
    )


def resample_ffill(
    events: DataFrame,
    key: str,
    ts_us: str,
    value: str,
    step_us: int,
    tiebreak: str,
) -> DataFrame:
    """Regularize an event series onto a fixed time grid with forward
    fill: one row per (key, bucket) for every ``step_us`` bucket in
    the key's observed span, carrying the LATEST value at-or-before
    the bucket (gaps inherit the previous value) plus the bucket's
    event count — the resampling step before joining irregular event
    streams to model features or dashboards.

    NULL observations follow standard ffill semantics (pandas
    ``resample().ffill()``): a bucket whose latest event has a NULL
    value does NOT reset the carry — the previous non-null value
    flows through, and the bucket is distinguishable from a gap only
    by its ``n_events`` count.

    Deterministic: within a bucket the carried value belongs to the
    max (ts, tiebreak) event, expressed as a struct-max aggregate
    (one partial-aggregated exchange, no window over raw events).

    Scale shape: the bucket aggregation shuffles once on (key,
    bucket); the grid explode's fan-out is span/step per key — the
    caller controls it via ``step_us``; the forward-fill window is
    partitioned by key over the BUCKET table (grid-sized, not
    event-sized). Nothing is keyed globally.

    Columns: ``(key, bucket_us, n_events, value)``.
    """
    b = F.floor(F.col(ts_us) / F.lit(int(step_us))).cast("bigint")
    per_bucket = (
        events.select(
            F.col(key).alias("_k"),
            b.alias("_b"),
            F.struct(
                F.col(ts_us).alias("us"),
                F.col(tiebreak).alias("tb"),
                F.col(value).alias("v"),
            ).alias("_s"),
        )
        .groupBy("_k", "_b")
        .agg(
            F.count("*").alias("n_events"),
            F.max("_s")["v"].alias("_v"),
        )
    )
    spans = per_bucket.groupBy("_k").agg(
        F.min("_b").alias("_b0"), F.max("_b").alias("_b1")
    )
    grid = spans.select(
        "_k", F.explode(F.sequence("_b0", "_b1")).alias("_b")
    )
    joined = grid.join(per_bucket, ["_k", "_b"], "left")
    w = (
        Window.partitionBy("_k")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col("_k").alias(key),
        (F.col("_b") * F.lit(int(step_us))).alias("bucket_us"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last("_v", ignorenulls=True).over(w).alias(value),
    )


def conversion_funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: for each step k, how many users
    performed step k STRICTLY AFTER their first qualifying occurrence
    of step k-1 (the product-analytics funnel — ordering matters, so
    a purchase before the first view does not convert).

    Columns: ``(step, event_type, n_users, conv_rate)`` — step
    1-based, ``conv_rate`` = n_users / previous step's n_users
    rounded 6 (1.0 for the first step).

    Scale shape: one user-keyed aggregate per step over the
    pre-filtered event slice (partial-combined min), joined to the
    previous step's user-count-sized timestamp table (AQE broadcasts
    it under the threshold). Work is steps x one pass over that
    step's events — never a self-join of the raw stream.
    """
    if not steps:
        raise ValueError("need at least one funnel step")
    user = F.col(user_col)
    reached: DataFrame | None = None
    stage_counts: list[DataFrame] = []
    for k, step in enumerate(steps):
        sliced = events.filter(F.col(type_col) == step).select(
            user.alias("user_id"), F.col(ts_col).alias("_ts")
        )
        if reached is None:
            stage = sliced.groupBy("user_id").agg(
                F.min("_ts").alias("_t")
            )
        else:
            stage = (
                sliced.join(
                    reached.select("user_id", F.col("_t").alias("_prev")),
                    "user_id",
                )
                .filter(F.col("_ts") > F.col("_prev"))
                .groupBy("user_id")
                .agg(F.min("_ts").alias("_t"))
            )
        # each stage feeds BOTH the next stage's join and its own
        # count — persist so the shared prefix evaluates once; the
        # whole funnel stays lazy (no driver-side counts)
        reached = tracked_persist(stage)
        stage_counts.append(
            reached.agg(
                F.count("*").cast("bigint").alias("n_users")
            ).select(
                F.lit(k + 1).cast("int").alias("step"),
                F.lit(step).alias("event_type"),
                "n_users",
            )
        )
    out = stage_counts[0]
    for df in stage_counts[1:]:
        out = out.unionByName(df)
    w = Window.orderBy("step")
    prev = F.coalesce(F.lag("n_users").over(w), F.col("n_users"))
    return out.withColumn(
        "conv_rate",
        # NULL, not 0/0, when the previous stage is empty (ANSI errors
        # on the zero division; NaN would be engine-dependent anyway)
        F.when(
            prev > 0,
            F.round(F.col("n_users") / prev.cast("double"), 6),
        ),
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    week_us: int = 7 * 86_400 * 1_000_000,
) -> DataFrame:
    """Weekly retention cohorts: users grouped by their first-activity
    week, tracked by what fraction are active in each later week — the
    standing engagement report of any event pipeline.

    Weeks are FIXED 7-day epochs from the Unix epoch (integer division
    of microseconds), not ISO calendar weeks: pure integer arithmetic
    is engine-independent, while calendar week truncation invites
    locale/week-start drift between engines.

    Columns: ``(cohort_week, week_offset, n_active, retention)`` —
    ``retention`` = n_active / cohort size (offset 0 row) rounded 6.

    Scale shape: the raw stream collapses to distinct (user, week)
    [one partial-combined exchange]; the cohort table is a user-keyed
    min over that; the join back and both rollups are (user x weeks)-
    sized — never the raw event volume. The cohort-size lookup joins
    a |cohorts|-row table (broadcast).
    """
    uw = (
        events.select(
            F.col(user_col).alias("user_id"),
            # integer div, not floor(x / y): double division can flip
            # the floor at exact week boundaries
            F.expr(f"unix_micros({ts_col}) div {int(week_us)}")
            .cast("bigint")
            .alias("week"),
        )
        .distinct()
    )
    cohort = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    act = (
        uw.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_active"))
        # both the size lookup and the output read this (cohorts x
        # weeks)-sized table: persist so the corpus-sized distinct
        # exchange upstream runs once, not twice
    )
    act = tracked_persist(act)
    size = act.filter(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_active").alias("_size")
    )
    return (
        act.join(F.broadcast(size), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            F.round(
                F.col("n_active") / F.col("_size").cast("double"), 6
            ).alias("retention"),
        )
    )


def session_paths(
    events: DataFrame,
    n: int = 3,
    top_k: int = 15,
    gap_s: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Top event-type n-gram paths within user sessions — the "what do
    people actually do" report of product analytics (the n-step
    generalization of ``event_transitions``, scoped to sessions so a
    path never spans a return visit).

    Columns: ``(path, n_sessions, n_occurrences, rank)`` — path as
    ``a>b>c``, top ``top_k`` by occurrences (ties: more sessions, then
    lexicographic).

    Scale shape: session numbering is the ``sessionize`` lag +
    cumulative-break window (one user-keyed exchange); the per-session
    type sequence is a bounded collect (sessions are gap-bounded by
    construction); n-gram assembly is row-local; the count partial-
    combines and the top-k runs as a WindowGroupLimit heap.
    """
    from gpd_lite_toolbox_spark.streaming.grid_stream import (
        SESSION_GAP_S,
    )

    gap = SESSION_GAP_S if gap_s is None else int(gap_s)
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    us = F.unix_micros(F.col(ts_col))
    gap_break = F.when(
        (us - F.lag(us).over(w)) >= gap * 1_000_000, 1
    ).otherwise(0)
    sess = events.withColumn(
        "_sid",
        F.sum(gap_break).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    seq = sess.groupBy(F.col(user_col).alias("_u"), "_sid").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    us.alias("_us"),
                    F.col(order_tiebreak).alias("_tb"),
                    F.col(type_col).alias("_t"),
                )
            )
        ).alias("_evs")
    )
    k = int(n)
    paths = seq.select(
        "_u",
        "_sid",
        F.explode(
            F.expr(
                f"CASE WHEN size(_evs) < {k} THEN array()"
                f" ELSE transform(sequence(1, size(_evs) - {k - 1}),"
                f"  i -> concat_ws('>', transform(sequence(0, {k - 1}),"
                f"       j -> _evs[i + j - 1]._t))) END"
            )
        ).alias("path"),
    )
    agg = paths.groupBy("path").agg(
        F.countDistinct("_u", "_sid").cast("bigint").alias("n_sessions"),
        F.count("*").cast("bigint").alias("n_occurrences"),
    )
    rw = Window.orderBy(
        F.col("n_occurrences").desc(), F.col("n_sessions").desc(), "path"
    )
    return (
        agg.withColumn("rank", F.row_number().over(rw).cast("int"))
        .filter(F.col("rank") <= int(top_k))
        .select("path", "n_sessions", "n_occurrences", "rank")
    )


def dau_wau(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    day_us: int = 86_400_000_000,
) -> DataFrame:
    """Daily / weekly active users and stickiness (DAU/WAU) per
    observed day — the standing engagement rollup. Days are fixed
    Unix-epoch buckets (integer division, same rationale as
    ``retention_cohorts``); WAU of day d counts distinct users active
    in [d-6, d].

    Columns: ``(day, dau, wau, stickiness)`` for days with any
    activity; stickiness rounded 6.

    Scale shape: the raw stream collapses to distinct (user, day)
    ONCE (one partial-combined exchange); the windowed distinct is
    NOT a window function (count-distinct frames don't partial-
    combine) but the bounded fan-out rewrite — each user-day
    contributes to exactly 7 target days, so the WAU aggregate is a
    7x explode of the already-tiny per-day distinct table.
    """
    du = (
        events.select(
            F.col(user_col).alias("u"),
            F.expr(f"unix_micros({ts_col}) div {int(day_us)}").alias("day"),
        )
        .distinct()
        # dau and the WAU fan-out both read the per-day distinct
        # table: persist so the corpus-sized exchange runs once
    )
    du = tracked_persist(du)
    dau = du.groupBy("day").agg(F.countDistinct("u").cast("bigint").alias("dau"))
    contrib = du.select(
        "u", F.explode(F.expr("sequence(day, day + 6)")).alias("day")
    )
    wau = contrib.groupBy("day").agg(
        F.countDistinct("u").cast("bigint").alias("wau")
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau") / F.col("wau").cast("double"), 6).alias(
                "stickiness"
            ),
        )
    )


def group_trend(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group ordinary-least-squares trend line — the drift audit a
    standing pipeline report runs per source/type/cohort ("is this
    stream's daily volume trending down?"). Output one row per group:
    ``(<group_cols...>, n, slope, intercept, r2)``, all rounded;
    groups whose x has zero variance emit NULL slope/intercept/r2
    (a vertical line has no OLS fit), zero y-variance emits r2 NULL
    with slope 0.

    Closed form, ONE partial-combined aggregate per group:
    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2), intercept =
    (Sy - slope*Sx)/n, r2 = (n*Sxy - Sx*Sy)^2 / ((n*Sxx - Sx^2) *
    (n*Syy - Sy^2)). The five sums run in DECIMAL over
    lattice-quantized values (numerics.qdec) so they are exact and
    order-independent in both engines, and every emitted value rounds
    through the engine-stable shift (numerics.r6) — the whole fit is
    hash-gateable cross-engine, like lr_train_gd. Magnitude contract:
    |x|, |y| < 1e8.

    Scale shape: the aggregate partial-combines (5 decimal sums + a
    count per group per partition reach the exchange); the closed form
    is a projection. No window, no second pass, no driver math.
    """
    d = int(round_digits)
    from ..numerics import dsum, qdec, r6

    xd, yd = qdec(x_col, d), qdec(y_col, d)
    agg = df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        dsum(xd).alias("_sx"),
        dsum(yd).alias("_sy"),
        dsum(xd * yd).alias("_sxy"),
        dsum(xd * xd).alias("_sxx"),
        dsum(yd * yd).alias("_syy"),
    )
    n = F.col("n").cast("double")
    cov_n = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    varx_n = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vary_n = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    slope = F.when(varx_n > 0, r6(cov_n / varx_n, d))
    intercept = F.when(
        varx_n > 0,
        r6((F.col("_sy") - (cov_n / varx_n) * F.col("_sx")) / n, d),
    )
    r2 = F.when(
        (varx_n > 0) & (vary_n > 0),
        r6(cov_n * cov_n / (varx_n * vary_n), d),
    )
    return agg.select(
        *group_cols,
        "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )
