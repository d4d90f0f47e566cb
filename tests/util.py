"""Shared test helpers: the driver-style Spark-vs-DuckDB comparison."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from gpd_lite_toolbox_spark.fixtures import TPCH_TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonicalization: columns sorted by name, rows sorted
    by all columns, index dropped."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def assert_parity(spark_df, sql: str, sf_dir: str, rel_tol: float = 1e-9):
    """Compare a Spark DataFrame against DuckDB oracle output."""
    left = canon(spark_df.toPandas())
    con = duck_con(sf_dir)
    right = canon(con.execute(sql).fetchdf())
    con.close()
    assert list(left.columns) == list(right.columns), (
        f"column mismatch: {list(left.columns)} vs {list(right.columns)}"
    )
    for c in left.columns:
        lk, rk = left[c].dtype.kind, right[c].dtype.kind
        # catch DecimalType leakage (arrives as object) and int/float
        # divergence — the driver compares schemas, we must too
        assert lk == rk or {lk, rk} <= {"i", "u"}, (
            f"dtype mismatch on {c}: {left[c].dtype} vs {right[c].dtype}"
        )
    assert len(left) == len(right), f"row count {len(left)} vs {len(right)}"
    for c in left.columns:
        lv, rv = left[c].to_numpy(), right[c].to_numpy()
        if left[c].dtype.kind in "fc":
            for i, (a, b) in enumerate(zip(lv, rv)):
                if not (
                    (pd.isna(a) and pd.isna(b))
                    or math.isclose(a, b, rel_tol=rel_tol, abs_tol=1e-9)
                ):
                    raise AssertionError(f"{c}[{i}]: {a!r} != {b!r}")
        else:
            mism = [
                (i, a, b) for i, (a, b) in enumerate(zip(lv, rv)) if a != b
            ]
            assert not mism, f"{c}: first mismatches {mism[:5]}"
