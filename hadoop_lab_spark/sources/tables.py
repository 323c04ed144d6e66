"""Parquet star-schema table loader.

The reference's notion of a table is "an HDFS directory of text files"
staged per job (`lab2/WordCount.sh:137-143`). Here a table is a parquet
path read declaratively, so Catalyst gets column pruning, predicate
pushdown, and row-group skipping for free — the scan reads only the
columns and row groups a query references, which is the difference
between touching 100 TB and touching 2 TB of it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale
# (region=5 rows, nation=25 rows regardless of SF; supplier grows slowly).
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _normalize(df: DataFrame) -> DataFrame:
    """Convert raw int64-nanosecond timestamp columns to TIMESTAMP.

    The events table stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark's reader only surfaces as a raw long (nanosAsLong conf, set in
    session.py). Integer division — never float — preserves precision:
    ns since epoch exceed the 53-bit double mantissa. DuckDB truncates
    ns→µs the same way, so the oracle sees identical instants.
    """
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table as a DataFrame."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    return _normalize(spark.read.parquet(table_path(sf_dir, name)))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Read several tables at once; all of them when no names given."""
    picked = names or TABLES
    return {name: load_table(spark, sf_dir, name) for name in picked}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every table as a temp view so ``spark.sql`` queries work."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
