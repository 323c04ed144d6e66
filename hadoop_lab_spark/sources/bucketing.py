"""Bucketed-table support: co-located joins with no shuffle at read time.

At 100 TB the dominant cost of a fact-fact join is shuffling both sides
on the key. Writing the tables bucketed on that key (same bucket count)
lets Spark plan a SortMergeJoin with NO Exchange on either side — each
task reads matching buckets directly. This module wraps the write/read
ceremony (bucketing only works through the session catalog, not bare
``parquet(path)``).

Trade-offs, stated: bucket counts are fixed at write time (re-bucketing
is a rewrite); AQE cannot coalesce bucketed scans; small-file pressure
if bucket count ≫ data. The right bucket count is data-size/128 MB-ish
per bucket at target scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Save as a bucketed (and optionally sorted) table.

    Sorting within buckets upgrades the join to a merge without a
    per-task sort step. ``path`` makes the table EXTERNAL at that
    location (otherwise it lands in the session warehouse dir) — bucket
    metadata lives in the catalog either way, which is why bucketing
    can't go through bare ``parquet(path)``.
    """
    writer = df.write.mode("overwrite").bucketBy(buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a catalog table (bucket metadata comes from the catalog)."""
    return spark.table(table)
