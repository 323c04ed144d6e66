"""Registry-wide empty-input invariant.

A 100 TB pipeline routinely feeds an operator ZERO rows — an empty
incremental delta, a fully-pruned partition, a filter that matched
nothing upstream. Every batch lane must therefore (a) execute on a
0-row, schema-correct dataset without raising, and (b) produce the same
result schema it produces on real data (a lane whose schema depends on
the data it saw cannot be composed into a static pipeline).

This is the failure class ADVICE keeps finding by hand (NULL sort keys,
sparse blocking buckets, driver-side scalars): the sweep mechanizes it.
It caught a real one on first run — ``partitioned_scan_prune``'s
read-back relied on parquet schema inference, and a dynamic-partition
write of 0 rows produces no part files to infer from
(UNABLE_TO_INFER_SCHEMA); the lane now reads with an explicit schema
(`plans/advanced.py`), which is also the correct pattern at scale.

Streaming lanes are exercised separately (tests/test_streaming_*);
rate/availableNow sources don't read the star schema the same way.
"""

from __future__ import annotations

import glob
import os

import pytest

from hadoop_lab_spark.plans.registry import REGISTRY, load_all_query_modules

from .conftest import SF_DIR

load_all_query_modules()

BATCH_LANES = sorted(n for n, s in REGISTRY.items() if "streaming" not in s.tags)


@pytest.fixture(scope="session")
def empty_sf_dir(spark, tmp_path_factory):
    """Star schema with every table present but 0 rows (schemas intact)."""
    out = tmp_path_factory.mktemp("sf_empty")
    for path in sorted(glob.glob(os.path.join(SF_DIR, "*.parquet"))):
        name = os.path.basename(path)
        # coalesce(1) guarantees at least one (footer-bearing) part file,
        # so the empty table is readable without an explicit schema.
        spark.read.parquet(path).limit(0).coalesce(1).write.mode("overwrite").parquet(
            str(out / name)
        )
    return str(out)


@pytest.mark.parametrize("name", BATCH_LANES)
def test_lane_survives_empty_input(spark, empty_sf_dir, name):
    spec = REGISTRY[name]
    empty_df = spec.fn(spark, empty_sf_dir)
    empty_df.count()  # must execute, not just plan
    # Schema must be data-independent: identical to the real-data plan.
    real_schema = spec.fn(spark, SF_DIR).schema
    assert [(f.name, f.dataType) for f in empty_df.schema.fields] == [
        (f.name, f.dataType) for f in real_schema.fields
    ], f"{name}: result schema depends on input data"
