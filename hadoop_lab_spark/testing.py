"""Differential-test harness: Spark result vs DuckDB oracle.

Mirrors the driver's correctness gate (row count + column names +
order-insensitive values) so regressions surface in `pytest` before a
round's verify runs. Comparison happens on RAW row objects (Spark
``collect()`` vs DuckDB ``fetchall()``) — pandas conversion would paper
over type divergences (e.g. DATE vs TIMESTAMP) that a value-hash driver
would catch.
"""

from __future__ import annotations

import math

import duckdb

from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, MapType, StructType

from hadoop_lab_spark.sources.tables import TABLES, table_path


def assert_flat_schema(df: DataFrame, name: str = "query") -> None:
    """Reject array/struct/map-typed OUTPUT columns.

    The correctness driver canonicalizes results via pandas sort_values,
    which dies on unhashable ndarray cells (round 2's one red row) —
    so every registered query must render complex values as strings
    (e.g. array_join of floor-scaled integers) before returning.
    """
    for f in df.schema.fields:
        assert not isinstance(f.dataType, (ArrayType, MapType, StructType)), (
            f"{name}: output column {f.name!r} has complex type {f.dataType.simpleString()}"
            " — render it as a canonical string (driver canonicalizer cannot hash it)"
        )


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with every star-schema table as a view —
    the same pre-registered views the driver gives oracle SQL."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _sorted_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    reordered = [tuple(row[i] for i in order) for row in rows]
    return sorted(reordered, key=repr)


def _value_kind(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, float):
        return "float"
    if isinstance(v, int):
        return "int"
    return type(v).__name__  # str, date, datetime, Decimal, list, ...


def _col_kinds(cols: list[str], rows: list[tuple]) -> dict[str, str]:
    kinds: dict[str, str] = {}
    for j, name in enumerate(cols):  # rows are in original column order
        kind = "null"
        for row in rows:
            k = _value_kind(row[j])
            if k != "null":
                kind = k
                break
        kinds[name] = kind
    return kinds


def _close(x, y, rtol: float) -> bool:
    if x is None and y is None:
        return True
    if x is None or y is None:
        return False
    if isinstance(x, float) and isinstance(y, float):
        if math.isnan(x) and math.isnan(y):
            return True
        return math.isclose(x, y, rel_tol=rtol, abs_tol=1e-12)
    return repr(x) == repr(y)


def assert_matches_oracle(
    spark_df: DataFrame,
    con: duckdb.DuckDBPyConnection,
    oracle: str,
    name: str = "query",
    float_rtol: float = 0.0,
) -> None:
    """Strict by default (float_rtol=0 → repr equality, what a value-hash
    driver effectively checks); pass a small rtol only to diagnose."""
    assert_flat_schema(spark_df, name=name)
    a_cols = spark_df.columns
    a_rows = [tuple(r) for r in spark_df.collect()]
    cur = con.execute(oracle)
    e_cols = [d[0] for d in cur.description]
    e_rows = [tuple(r) for r in cur.fetchall()]

    assert sorted(a_cols) == sorted(e_cols), (
        f"{name}: column mismatch spark={sorted(a_cols)} oracle={sorted(e_cols)}"
    )
    assert len(a_rows) == len(e_rows), (
        f"{name}: row count spark={len(a_rows)} oracle={len(e_rows)}"
    )
    a_kinds, e_kinds = _col_kinds(a_cols, a_rows), _col_kinds(e_cols, e_rows)
    assert a_kinds == e_kinds, f"{name}: type mismatch spark={a_kinds} oracle={e_kinds}"

    a_sorted, e_sorted = _sorted_rows(a_cols, a_rows), _sorted_rows(e_cols, e_rows)
    if float_rtol == 0.0:
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(a_sorted, e_sorted)) if repr(x) != repr(y)
        ]
    else:
        bad = [
            (i, x, y)
            for i, (x, y) in enumerate(zip(a_sorted, e_sorted))
            if not all(_close(xv, yv, float_rtol) for xv, yv in zip(x, y))
        ]
    assert not bad, f"{name}: {len(bad)} row mismatches, first: {bad[:3]}"
