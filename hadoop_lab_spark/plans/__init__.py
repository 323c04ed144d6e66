"""Query plans: the registry pairing every query with its DuckDB oracle."""

from hadoop_lab_spark.plans.registry import REGISTRY, QuerySpec, register

__all__ = ["REGISTRY", "QuerySpec", "register"]
