"""Driver-contract guards: keys consistent, entry stable."""

import __spark_entry__ as E


def test_oracle_keys_subset_of_queries():
    q, o = set(E.queries()), set(E.oracle_sql())
    assert o <= q, f"oracles without queries: {o - q}"


def test_entry_schema_stable_across_calls(spark):
    a = E.entry(spark)
    b = E.entry(spark)
    assert a.schema == b.schema
    assert a.count() == b.count() > 0


def test_every_query_callable_returns_dataframe(spark, sf_dir):
    from pyspark.sql import DataFrame

    for name, q in E.queries().items():
        df = q(spark, sf_dir)
        assert isinstance(df, DataFrame), name
        assert len(df.columns) > 0, name


def test_window_covers_every_query_without_driver_evidence():
    """Freeze-last pin (round-6 VERDICT item 5): every declared query
    must either hold a historical driver CORRECTNESS row (recorded in
    EVIDENCE.json, regenerated per round from CORRECTNESS_r*.json) or
    sit inside the CURRENT 50-slot driver window. A query landed after
    the window froze would fail here, so the r5/r6 evidence gap cannot
    recur silently."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "EVIDENCE.json")
    recorded = set(json.load(open(path))["queries"])
    window = set(E.DRIVER_WINDOW)
    assert len(E.DRIVER_WINDOW) <= 50, "driver truncates at 50 queries"
    assert len(window) == len(E.DRIVER_WINDOW), "duplicate window entries"
    uncovered = set(E.queries()) - recorded - window
    assert not uncovered, (
        f"queries with no driver row ever and not in DRIVER_WINDOW: "
        f"{sorted(uncovered)} — add them to the window (or regenerate "
        f"EVIDENCE.json if a new round's CORRECTNESS file landed)"
    )
