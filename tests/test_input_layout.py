"""Input-file-layout differential: a registered query must return
IDENTICAL results whether each table is ONE parquet file or MANY
permuted part-files.

This is the other half of the partitioning-determinism gate
(tests/test_determinism.py). That gate varies POST-shuffle freedom
(spark.sql.shuffle.partitions); this one varies the PRE-shuffle
freedom a real cluster exercises on every scan: file count, file
listing order, scan-split boundaries, and the row order each task
sees before any Exchange. At 100 TB a table is never one file —
it is thousands of parts whose listing order is storage-dependent —
so any lane leaning on "first row of the scan" (first() without a
shuffle, head-biased sampling, mapInPandas batch boundaries) produces
run-dependent answers in production while looking stable on the
single-file test fixture. The mirror below stripes a deterministic
permutation of each table across 7 part-files so both freedoms move
at once, and every batch lane must not care.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hadoop_lab_spark.plans.registry import REGISTRY, load_all_query_modules
from hadoop_lab_spark.sources.tables import TABLES

from tests.conftest import SF_DIR

load_all_query_modules()

CANDIDATES = sorted(n for n, s in REGISTRY.items() if "streaming" not in s.tags)

_N_PARTS = 7
# Knuth multiplicative hash: a deterministic pseudo-shuffle of row
# indices so part files interleave rows from everywhere in the table,
# not contiguous slices (contiguous slices would preserve most local
# order and weaken the gate).
_MIX = 2654435761


@pytest.fixture(scope="module")
def split_dir(tmp_path_factory):
    """Mirror of SF_DIR with every table as 7 permuted part-files."""
    dst = tmp_path_factory.mktemp("layout")
    for name in TABLES:
        table = pq.read_table(os.path.join(SF_DIR, f"{name}.parquet"))
        n = table.num_rows
        order = sorted(range(n), key=lambda i: ((i * _MIX) & 0xFFFFFFFF, i))
        part_dir = dst / f"{name}.parquet"
        part_dir.mkdir()
        for j in range(_N_PARTS):
            # Tables smaller than _N_PARTS (region: 5 rows) yield empty
            # slices; an empty Python list infers Arrow type `null`,
            # which `take` rejects — type the indices explicitly.
            idx = pa.array(order[j::_N_PARTS], type=pa.int64())
            if len(idx) == 0:
                continue
            pq.write_table(table.take(idx), part_dir / f"part-{j:03d}.parquet")
    return str(dst)


def _rows(df):
    return sorted(repr(tuple(r)) for r in df.collect())


def test_mirror_preserves_multiset(spark, split_dir):
    """Fixture self-check: the mirror holds exactly the original rows
    and Spark actually sees it as a multi-file scan."""
    for name in ("events", "documents"):
        a = _rows(spark.read.parquet(os.path.join(SF_DIR, f"{name}.parquet")))
        b = _rows(spark.read.parquet(os.path.join(split_dir, f"{name}.parquet")))
        assert a == b, f"{name}: split mirror changed the row multiset"
        files = os.listdir(os.path.join(split_dir, f"{name}.parquet"))
        assert len([f for f in files if f.endswith(".parquet")]) == _N_PARTS


@pytest.mark.parametrize("name", CANDIDATES)
def test_identical_across_file_layouts(spark, name, split_dir):
    spec = REGISTRY[name]
    a = _rows(spec.fn(spark, SF_DIR))
    b = _rows(spec.fn(spark, split_dir))
    assert a == b, f"{name}: results differ between 1-file and 7-part layouts"
