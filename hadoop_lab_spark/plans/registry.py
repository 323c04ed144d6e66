"""Query registry — the correctness contract.

Every implemented capability is registered here exactly once as a
:class:`QuerySpec`: a PySpark implementation plus (when SQL-expressible)
the ANSI-SQL oracle DuckDB runs on the same parquet tables. The driver
contract (``__spark_entry__.queries()`` / ``oracle_sql()``) and the local
differential tests both read from this registry, so a query cannot drift
from its oracle.

Rules enforced by convention (SURVEY.md §7.0):
- every computed/aggregate column is aliased identically in the Spark
  plan and the oracle SQL (the driver sorts columns by name and hashes
  values — a name mismatch fails even when the values are right);
- float aggregates whose accumulation order differs between engines are
  rounded on BOTH sides (sums → 2dp, averages/ratios → 4dp); pure
  scalar math and MIN/MAX need no rounding (IEEE doubles are engine-
  independent for identical inputs);
- integer aggregates are cast to BIGINT on both sides (DuckDB SUMs
  integers into HUGEINT, Spark into BIGINT).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    """One registered query: Spark implementation + optional SQL oracle."""

    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None = rows-only check
    doc: str = ""
    tags: tuple[str, ...] = ()
    bench: bool = True  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = True,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a (spark, sf_dir) -> DataFrame query to the registry."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags, bench=bench
        )
        return fn

    return wrap


def load_all_query_modules() -> None:
    """Import every module that registers queries (idempotent).

    Imports are inside the function to avoid circular imports at package
    import time; each module's top-level @register calls populate
    REGISTRY. Import errors propagate: a broken plan module must FAIL the
    driver contract loudly, not silently shrink ``queries()`` (a swallowed
    ImportError here is indistinguishable from "fewer features").
    """
    from hadoop_lab_spark.plans import (  # noqa: F401
        advanced,
        mlprep,
        parity,
        pipeline,
        relational,
        scale_ops,
        stream_queries,
        tpch_deep,
    )
