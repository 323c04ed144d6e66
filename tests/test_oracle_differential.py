"""Differential tests: every registered query vs its DuckDB oracle.

This is a local mirror of the driver's correctness gate (run at sf0.001
for speed; the driver runs sf0.01). A query passing here should pass the
driver's hash compare unless the driver's canonicalization differs.
"""

from __future__ import annotations

import pytest

from hadoop_lab_spark.plans.registry import REGISTRY, load_all_query_modules
from hadoop_lab_spark.testing import assert_flat_schema, assert_matches_oracle

from tests.conftest import SF_DIR_ORACLE

load_all_query_modules()

WITH_ORACLE = sorted(name for name, spec in REGISTRY.items() if spec.oracle)
ROWS_ONLY = sorted(name for name, spec in REGISTRY.items() if not spec.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, oracle_con, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR_ORACLE)
    assert_matches_oracle(df, oracle_con, spec.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR_ORACLE)
    assert df.count() >= 0
    assert_flat_schema(df, name=name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_contract_shapes():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(sql, str) and sql.strip() for sql in oracles.values())
