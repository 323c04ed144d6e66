"""Batching-invariance proof: bounded replay through MULTIPLE real
micro-batches must equal the single-batch answer.

Every oracle check replays one parquet file in one availableNow batch,
so micro-batch boundaries never actually occur there. This suite splits
the event stream across two files and forces maxFilesPerTrigger=1 —
two genuine micro-batches with a watermark advance between them — and
asserts the sink still reconciles to the batch oracle. This is the
claim the stream_queries docstrings make ("results are
batching-invariant"); here it stops being rhetorical.

File 1 holds the early events, file 2 strictly later ones (the
far-future row rides in file 2), so no row is late w.r.t. the
watermark after batch 1 and nothing is legitimately dropped — any
mismatch is a real batching bug, not late-data policy.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import duckdb

from hadoop_lab_spark.plans.registry import REGISTRY, load_all_query_modules
from hadoop_lab_spark.testing import assert_matches_oracle
from tests.test_adversarial_corpus import _EVENTS, _STREAM_EVENTS

load_all_query_modules()

#: Events-only streaming queries (the enrich/wordcount/chunk jobs need
#: other tables; the four below exercise every stateful mechanism:
#: windowed agg, applyInPandasWithState, dropDuplicatesWithinWatermark,
#: session windows, plus the stream-stream join).
MULTIBATCH_QUERIES = (
    "stream_windowed_event_counts",
    "stream_user_counts_stateful",
    "stream_dedup_user_type",
    "stream_session_window_counts",
    "stream_stream_purchase_signup_join",
    # deterministic hash sampling: membership must be IDENTICAL under
    # re-batching (the property RNG-based df.sample() lacks)
    "stream_stratified_sample",
)


def _write_events(path: str, rows: list[tuple]) -> None:
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, path)


@pytest.fixture(scope="module")
def split_events_dir(tmp_path_factory):
    """events.parquet (early rows) + events2.parquet (strictly later)."""
    d = str(tmp_path_factory.mktemp("splitstream"))
    # NULL-ts rows (ADVICE-r3 fixture lane) ride in the early file: they
    # have no event-time position, so "early vs late" is arbitrary for
    # them — what matters is that every query's contract handles them
    cut = _EVENTS[8][1]  # ts(1800)
    early = [r for r in _STREAM_EVENTS if r[1] is None or r[1] <= cut]
    late = [r for r in _STREAM_EVENTS if r[1] is not None and r[1] > cut]
    assert early and late, (len(early), len(late))
    _write_events(os.path.join(d, "events.parquet"), early)
    _write_events(os.path.join(d, "events2.parquet"), late)
    return d


@pytest.mark.parametrize("name", MULTIBATCH_QUERIES)
def test_multibatch_replay_equals_oracle(spark, split_events_dir, name):
    from hadoop_lab_spark.streaming import jobs

    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM read_parquet("
            f"['{split_events_dir}/events.parquet',"
            f" '{split_events_dir}/events2.parquet'])"
        )
        jobs.STREAM_READER_OPTIONS.update(
            {"maxFilesPerTrigger": "1", "pathGlobFilter": "events*.parquet"}
        )
        try:
            spec = REGISTRY[name]
            df = spec.fn(spark, split_events_dir)
            assert_matches_oracle(
                df, con, spec.oracle, name=f"multibatch:{name}"
            )
        finally:
            jobs.STREAM_READER_OPTIONS.clear()
    finally:
        con.close()


def test_split_fixture_really_replays_in_two_batches(spark, split_events_dir):
    """Guard against the suite going vacuous: if maxFilesPerTrigger were
    ignored (option renamed, glob override broken), every test above
    would still pass on a single batch. Assert the replay genuinely
    processed >= 2 non-empty micro-batches."""
    from hadoop_lab_spark.streaming import jobs

    jobs.STREAM_READER_OPTIONS.update(
        {"maxFilesPerTrigger": "1", "pathGlobFilter": "events*.parquet"}
    )
    try:
        stream = jobs.stream_windowed_event_counts(spark, split_events_dir)
        q = (
            stream.writeStream.format("memory")
            .queryName("mb_guard")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        data_batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
        assert len(data_batches) >= 2, [
            (p["batchId"], p["numInputRows"]) for p in q.recentProgress
        ]
    finally:
        jobs.STREAM_READER_OPTIONS.clear()
