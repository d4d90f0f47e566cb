"""Driver-contract guards: keys consistent, entry stable."""

import __spark_entry__ as E
import pytest


def test_oracle_keys_subset_of_queries():
    q, o = set(E.queries()), set(E.oracle_sql())
    assert o <= q, f"oracles without queries: {o - q}"


def test_entry_schema_stable_across_calls(spark):
    a = E.entry(spark)
    b = E.entry(spark)
    assert a.schema == b.schema
    assert a.count() == b.count() > 0


# round 11 (r10 VERDICT item 1): constructs all 220 query DataFrames (~3 min); the driver exercises the same surface itself — full lane only.
@pytest.mark.slow
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
    # Sync check tolerant of the driver's post-commit artifact drop
    # (round-7 VERDICT item 1): the ledger only has to match the
    # derivation restricted to the rounds it recorded, so a
    # CORRECTNESS file one round newer than EVIDENCE.json warns
    # instead of failing. regen_evidence.py at round start re-syncs.
    artifact = json.load(open(os.path.join(repo, "EVIDENCE.json")))
    ledger_round = artifact.get("max_round")
    if ledger_round is None:  # pre-r8 ledger format
        ledger_round = max(
            (r for e in artifact["queries"].values()
             for r in e["rounds_checked"]),
            default=0,
        )
    assert set(artifact["queries"]) == set(evidence_map(ledger_round)), (
        "EVIDENCE.json is stale for its own recorded rounds — run "
        "python scripts/regen_evidence.py"
    )
    from regen_evidence import max_round_present

    if max_round_present() > ledger_round:
        import warnings

        warnings.warn(
            f"EVIDENCE.json records through r{ledger_round} but "
            f"CORRECTNESS_r{max_round_present():02d}.json is present — "
            "run python scripts/regen_evidence.py at round start",
            stacklevel=1,
        )
