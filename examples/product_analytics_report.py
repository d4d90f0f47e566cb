"""Product-analytics report on the engine's public API — the events-
side family composed into the standing dashboard a telemetry pipeline
ships: ordered conversion funnel, weekly retention cohorts, DAU/WAU
stickiness, top within-session paths, and per-user-journey transition
counts. Run locally:

    python examples/product_analytics_report.py [sf_dir]

Every stage is a DataFrame transformation; only the final small report
tables collect. The fixture events are dense (every user does
everything), so the funnel/engagement slices thin them the same way
the declared gate queries do — see the fixture-density lesson in
PLANS.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import gpd_lite_toolbox_spark as G  # noqa: E402
from gpd_lite_toolbox_spark import fixtures as FX  # noqa: E402


def run(spark, sf_dir):
    FX.register_base_tables(spark, sf_dir)
    events = spark.table("events")
    thin = events.filter(F.col("event_id") % 11 < 2)

    # 1. how users move through the product, in order
    funnel = G.conversion_funnel(thin, ("view", "click", "purchase"))

    # 2. who comes back, by starting week
    cohorts = G.retention_cohorts(
        events.filter(F.col("event_id") % 13 < 3)
    )

    # 3. the daily engagement pulse
    engagement = G.dau_wau(events.filter(F.col("event_id") % 17 < 2))

    # 4. what people actually do inside a visit
    paths = G.session_paths(events, n=3, top_k=10, gap_s=21_600)

    # 5. the one-step journey matrix (Markov view)
    transitions = G.event_transitions(
        events, key="user_id", ts="ts", state="event_type",
        order_tiebreak="event_id",
    )
    return funnel, cohorts, engagement, paths, transitions


if __name__ == "__main__":
    from gpd_lite_toolbox_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("product_analytics_report")
    funnel, cohorts, engagement, paths, transitions = run(spark, sf)
    funnel.show()
    cohorts.orderBy("cohort_week", "week_offset").show(8)
    engagement.orderBy("day").show(8)
    paths.orderBy("rank").show(10, truncate=40)
    transitions.orderBy(F.col("n").desc()).show(8)
