"""Partitioned parquet layout: writes must enable partition PRUNING.

At 100 TB, `partitionBy` on a low-cardinality predicate column is the
difference between scanning one directory and scanning the lake. The
test asserts the physical plan's scan shows PartitionFilters and reads
only the matching partition directories.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def part_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part") / "orders_by_status")
    orders = spark.range(0, 5000).select(
        F.col("id").alias("o_orderkey"),
        F.element_at(
            F.array(F.lit("F"), F.lit("O"), F.lit("P")), (F.col("id") % 3 + 1).cast("int")
        ).alias("o_orderstatus"),
        (F.col("id") % 100).cast("double").alias("o_total"),
    )
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    return path


def test_partition_directories_exist(part_path):
    dirs = {d for d in os.listdir(part_path) if d.startswith("o_orderstatus=")}
    assert dirs == {"o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"}


def test_partition_pruning_in_plan(spark, part_path):
    df = spark.read.parquet(part_path).filter(F.col("o_orderstatus") == "F")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "o_orderstatus" in plan.split("PartitionFilters")[1][:200]
    # correctness: only the F partition's rows
    assert df.count() == 5000 // 3 + (1 if 5000 % 3 else 0)


def test_pruned_scan_reads_single_partition(spark, part_path):
    df = spark.read.parquet(part_path).filter(F.col("o_orderstatus") == "F")
    scan = df._jdf.queryExecution().executedPlan().toString()
    # the data filter list must NOT contain the partition predicate —
    # it's resolved at planning, not per row
    data_filters = scan.split("PushedFilters")[0]
    assert "isnotnull(o_total)" not in data_filters
