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


# ---------------------------------------------------------------------------
# Row-group layout contract (VERDICT r8 #4)
#
# The r8 two-decade sweep's headline finding: pyarrow's default row-group
# size (1Mi rows) wrote the sf10 documents/embeddings tables as a SINGLE
# row group each — and a row group is Spark's minimum scan-split unit, so
# one row group = one scan task = a single-threaded scan masquerading as a
# superlinear lane (lang_id 54 s -> 4.0 s once the file carried ~32
# groups). tools/gen_scale_data.py bakes the fix in, but nothing pinned
# it: these tests make the mirage structurally unable to return silently.
#
# Scope: OUR generators only. The driver's own /root/testdata files are
# single-row-group (read-only, out of our control, and constant across
# rounds so every gate comparison stays apples-to-apples); the bench's
# scan parallelism at sf0.1 comes from having 32 partitions after the
# first exchange, and the scale SWEEPS — where scan parallelism decides
# the ratios — run on generated data, which this contract covers.
# ---------------------------------------------------------------------------


def _row_group_floor(num_rows: int) -> int:
    """Minimum acceptable row groups for a file of num_rows: 1 group per
    50k rows, capped at 32 (the generator's own target) — enough that a
    32-core scan is never starved by file layout."""
    return min(32, max(1, num_rows // 50_000))


def assert_proportional_row_groups(path: str) -> None:
    """Lint a parquet table (single file or part-file directory): every
    file must carry at least _row_group_floor(its rows) row groups."""
    files = (
        [os.path.join(path, f) for f in sorted(os.listdir(path)) if f.endswith(".parquet")]
        if os.path.isdir(path)
        else [path]
    )
    for f in files:
        meta = pq.ParquetFile(f).metadata
        floor = _row_group_floor(meta.num_rows)
        assert meta.num_row_groups >= floor, (
            f"{f}: {meta.num_rows} rows in {meta.num_row_groups} row "
            f"group(s), need >= {floor} — a single-row-group file scans "
            "as ONE Spark task (the r8 sf10 'superlinear' mirage)"
        )


def test_generator_row_group_policy_meets_floor():
    """The scale generator's policy (row_group_size = max(16Ki, rows/32))
    must satisfy the floor at every magnitude the sweeps use — pure
    arithmetic, no data generated."""
    import sys as _sys

    _sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
    )
    from gen_scale_data import row_group_size

    for rows in (5, 1_000, 16_384, 50_000, 500_000, 6_000_000, 60_000_000, 1_500_000_000):
        n_groups = -(-rows // row_group_size(rows))  # ceil
        assert n_groups >= _row_group_floor(rows), (
            f"policy yields {n_groups} groups for {rows} rows, "
            f"floor is {_row_group_floor(rows)}"
        )


def test_generator_written_file_passes_lint(tmp_path):
    """End-to-end through pyarrow: a table written with the generator's
    policy carries proportional groups on disk."""
    import sys as _sys

    _sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
    )
    from gen_scale_data import row_group_size

    n = 120_000
    t = pa.table({"x": pa.array(range(n), pa.int64())})
    p = str(tmp_path / "ok.parquet")
    pq.write_table(t, p, row_group_size=row_group_size(n))
    assert_proportional_row_groups(p)
    assert pq.ParquetFile(p).metadata.num_row_groups >= 7  # 120k/16Ki


def test_lint_rejects_single_row_group_file(tmp_path):
    """Non-vacuousness probe: a deliberately single-row-group 200k-row
    file (pyarrow's default would do this) must FAIL the lint."""
    n = 200_000
    t = pa.table({"x": pa.array(range(n), pa.int64())})
    p = str(tmp_path / "bad.parquet")
    pq.write_table(t, p, row_group_size=n)  # one giant group
    assert pq.ParquetFile(p).metadata.num_row_groups == 1
    with pytest.raises(AssertionError, match="single-row-group|need >="):
        assert_proportional_row_groups(p)
