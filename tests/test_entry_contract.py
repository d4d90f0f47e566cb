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
