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
    must either hold a historical driver CORRECTNESS row or sit inside
    the CURRENT 50-slot driver window. A query landed after the window
    froze fails here, so the r5/r6 evidence gap cannot recur silently.

    Evidence is recomputed DIRECTLY from CORRECTNESS_r*.json (the same
    derivation scripts/regen_evidence.py writes into EVIDENCE.json),
    so the gate cannot be satisfied by a stale artifact; a second
    assert keeps the checked-in EVIDENCE.json in sync."""
    import json
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "scripts"))
    from regen_evidence import evidence_map

    recorded = set(evidence_map())
    window = set(E.DRIVER_WINDOW)
    assert len(E.DRIVER_WINDOW) <= 50, "driver truncates at 50 queries"
    assert len(window) == len(E.DRIVER_WINDOW), "duplicate window entries"
    uncovered = set(E.queries()) - recorded - window
    assert not uncovered, (
        f"queries with no driver row ever and not in DRIVER_WINDOW: "
        f"{sorted(uncovered)} — add them to the window"
    )
    artifact = json.load(open(os.path.join(repo, "EVIDENCE.json")))
    assert set(artifact["queries"]) == recorded, (
        "EVIDENCE.json is stale — run python scripts/regen_evidence.py"
    )
