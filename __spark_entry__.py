"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real content lives in :mod:`hadoop_lab_spark.plans` — this module is
a thin adapter over the query registry so the Spark implementation and
its oracle can never drift apart.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hadoop_lab_spark.plans.registry import REGISTRY, load_all_query_modules

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: case-sensitive word count over
    documents.text (the lab2 pipeline — scan → flatMap → agg)."""
    load_all_query_modules()
    return REGISTRY["wordcount"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    load_all_query_modules()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query; omitted entries are
    genuinely non-SQL-expressible ops (driver records rows-only checks)."""
    load_all_query_modules()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}
