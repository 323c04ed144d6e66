"""Checkpoint restart / exactly-once proof (r3 verdict #8).

The batching-invariance suite proves multi-batch replay equals batch —
within ONE query lifetime. This suite kills the query between files and
restarts a NEW query instance from the same checkpoint:

  run 1: only events.parquet exists   → process, stop (clean kill)
  (events2.parquet lands)
  run 2: fresh query, SAME checkpoint → must process ONLY the new file
         (source offsets restored) on top of RESTORED state-store state

Exactly-once means (a) run 2's input row count is exactly the new
file's rows — nothing reprocessed, nothing skipped — and (b) the
combined output equals the batch oracle over ALL events, which can only
happen if the state (per-user counters, open session windows) survived
the restart intact.

Covers the two stateful mechanisms the verdict named: the
applyInPandasWithState custom operator (update-mode deltas) and session
windows (complete-mode snapshot).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from pyspark.sql import functions as F

from hadoop_lab_spark.plans.registry import REGISTRY, load_all_query_modules
from hadoop_lab_spark.testing import assert_matches_oracle
from tests.test_adversarial_corpus import _EVENTS, _STREAM_EVENTS
from tests.test_streaming_batching import _write_events

load_all_query_modules()

_GLOB_OPTS = {"pathGlobFilter": "events*.parquet"}


def _run_checkpointed(stream, name: str, mode: str, ckpt: str):
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def _input_rows(q) -> int:
    return sum(p["numInputRows"] for p in q.recentProgress)


@pytest.fixture()
def staged_dirs(tmp_path):
    """Stream dir seeded with the early file; the late file is returned
    separately for the test to land between runs. Early/late split at
    ts(1800) like the batching suite — nothing is late for watermarks."""
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    ckpt = tmp_path / "ckpt"
    cut = _EVENTS[8][1]
    early = [r for r in _STREAM_EVENTS if r[1] is None or r[1] <= cut]
    late = [r for r in _STREAM_EVENTS if r[1] is not None and r[1] > cut]
    assert early and late
    _write_events(str(stream_dir / "events.parquet"), early)
    return str(stream_dir), str(ckpt), early, late


def _oracle_con(stream_dir: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{stream_dir}/events*.parquet')"
    )
    return con


def test_stateful_restart_is_exactly_once(spark, staged_dirs, tmp_path):
    """update-mode emissions go through a foreachBatch parquet sink
    (dynamic overwrite per batch_id — the idempotent exactly-once sink
    recipe): the memory sink refuses checkpoint recovery in update
    mode, and a recoverable sink is the point of this test."""
    from hadoop_lab_spark.streaming import jobs

    stream_dir, ckpt, early, late = staged_dirs
    out_dir = str(tmp_path / "state_out")
    jobs.STREAM_READER_OPTIONS.update(_GLOB_OPTS)

    def run_once():
        def write_batch(bdf, batch_id):
            (
                bdf.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(out_dir)
            )

        q = (
            jobs.stream_user_event_counts_stateful(spark, stream_dir)
            .writeStream.foreachBatch(write_batch)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q

    try:
        q1 = run_once()
        assert _input_rows(q1) == len(early)

        _write_events(os.path.join(stream_dir, "events2.parquet"), late)

        q2 = run_once()
        # exactly-once input accounting: the checkpoint's source offsets
        # must exclude the already-committed first file
        assert _input_rows(q2) == len(late), (
            f"restart reprocessed data: {_input_rows(q2)} rows vs "
            f"{len(late)} new"
        )

        # deltas from BOTH query lifetimes reconcile to the batch answer
        # only if the per-user state store was restored on restart (run 2
        # emits running maxes that include run 1's rows)
        combined = spark.read.parquet(out_dir)
        result = combined.groupBy("user_id").agg(
            F.sum("cnt").alias("cnt"), F.max("max_value").alias("max_value")
        )
        con = _oracle_con(stream_dir)
        try:
            assert_matches_oracle(
                result,
                con,
                REGISTRY["stream_user_counts_stateful"].oracle,
                name="restart:stateful",
            )
        finally:
            con.close()
    finally:
        jobs.STREAM_READER_OPTIONS.clear()


def test_session_window_restart_is_exactly_once(spark, staged_dirs):
    """Complete mode: run 2's final snapshot alone must be the full
    answer — including sessions whose every event arrived before the
    kill, which only works if their window state survived the restart."""
    from hadoop_lab_spark.streaming import jobs

    stream_dir, ckpt, early, late = staged_dirs
    jobs.STREAM_READER_OPTIONS.update(_GLOB_OPTS)
    try:
        q1 = _run_checkpointed(
            jobs.stream_session_window_counts(spark, stream_dir),
            "restart_sess_run1",
            "complete",
            ckpt,
        )
        assert _input_rows(q1) == len(early)

        _write_events(os.path.join(stream_dir, "events2.parquet"), late)

        q2 = _run_checkpointed(
            jobs.stream_session_window_counts(spark, stream_dir),
            "restart_sess_run2",
            "complete",
            ckpt,
        )
        assert _input_rows(q2) == len(late)

        snap = spark.table("restart_sess_run2").select("user_id", "s_start", "cnt")
        con = _oracle_con(stream_dir)
        try:
            assert_matches_oracle(
                snap,
                con,
                REGISTRY["stream_session_window_counts"].oracle,
                name="restart:session",
            )
        finally:
            con.close()
    finally:
        jobs.STREAM_READER_OPTIONS.clear()
