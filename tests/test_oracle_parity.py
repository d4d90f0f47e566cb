"""Driver-style correctness gate, run locally: every queries() entry that
has an oracle_sql() entry must match DuckDB on the same parquet."""

from __future__ import annotations

import pytest

import __spark_entry__ as E
from tests.util import assert_parity

# round 11 (r10 VERDICT item 1): the driver re-verifies every oracle independently (its own sf0.01 sweep); this sweep is the builder's full-lane insurance —
# excluded from the default lane so the driver's gate completes;
# the full lane (pytest -m "") runs it.
pytestmark = pytest.mark.slow


_QUERIES = sorted(E.queries().keys())


@pytest.mark.parametrize("name", _QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    q = E.queries()[name]
    sql = E.oracle_sql().get(name)
    df = q(spark, sf_dir)
    if sql is None:
        # weaker rows-only check, mirroring the driver
        assert df.count() >= 0
        return
    assert_parity(df, sql, sf_dir)


def test_exact_embedding_dups_matches_allpairs_oracle(spark, sf_dir):
    """The exact=True baseline path (not declared/benched — the LSH
    path is) stays pinned against the all-pairs DuckDB SQL."""
    from gpd_lite_toolbox_spark import fixtures as FX
    from gpd_lite_toolbox_spark import oracles as OR
    from gpd_lite_toolbox_spark.text.dedup import embedding_near_dups

    FX.register_base_tables(spark, sf_dir)
    df = embedding_near_dups(
        spark.table("embeddings"), threshold=0.45, exact=True
    )
    assert_parity(df, OR.EMBEDDING_DUPS_EXACT, sf_dir)


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
