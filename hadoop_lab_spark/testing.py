"""Differential-test harness: Spark result vs DuckDB oracle.

Mirrors the driver's correctness gate (row count + column names +
order-insensitive values) so regressions surface in `pytest` before a
round's verify runs. Comparison: sort columns by name, sort rows by all
columns, exact match on non-floats, tight tolerance on floats (queries
are designed so values are bit-identical; the tolerance only localizes a
diagnosis when they are not).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from hadoop_lab_spark.sources.tables import TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with every star-schema table as a view —
    the same pre-registered views the driver gives oracle SQL."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _canonical(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for col in out.columns:
        if str(out[col].dtype).startswith(("datetime", "object")):
            out[col] = out[col].astype(str)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


def assert_matches_oracle(
    spark_df: DataFrame,
    con: duckdb.DuckDBPyConnection,
    oracle: str,
    name: str = "query",
    float_rtol: float = 1e-9,
) -> None:
    actual = _canonical(spark_df.toPandas())
    expected = _canonical(con.execute(oracle).fetchdf())

    assert list(actual.columns) == list(expected.columns), (
        f"{name}: column mismatch spark={list(actual.columns)} oracle={list(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"{name}: row count spark={len(actual)} oracle={len(expected)}"
    )
    for col in actual.columns:
        a, e = actual[col], expected[col]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(e):
            bad = [
                (i, x, y)
                for i, (x, y) in enumerate(zip(a.astype(float), e.astype(float)))
                if not _close(x, y, float_rtol)
            ]
            assert not bad, f"{name}.{col}: {len(bad)} float mismatches, first: {bad[:3]}"
        else:
            diff = a.astype(str) != e.astype(str)
            assert not diff.any(), (
                f"{name}.{col}: {int(diff.sum())} mismatches, first rows: "
                f"{list(zip(a[diff][:3], e[diff][:3]))}"
            )


def _close(x: float, y: float, rtol: float) -> bool:
    if pd.isna(x) and pd.isna(y):
        return True
    if pd.isna(x) or pd.isna(y):
        return False
    return math.isclose(x, y, rel_tol=rtol, abs_tol=1e-12)
