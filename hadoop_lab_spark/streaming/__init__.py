"""Structured Streaming surface (extension — the reference is batch-only).

All 10 reference jobs are bounded batch (``Job.waitForCompletion``,
`lab2/WordCount.sh:120`); SURVEY.md §2.11 lists streaming as a category
with no reference implementation. This package is the engine's
Spark-native streaming extension: the same logical queries expressed
over ``readStream``, validated against static SQL on the same data
(SURVEY §7.3 risk 6).
"""

from hadoop_lab_spark.streaming.jobs import (
    run_to_memory,
    stream_events,
    stream_user_event_counts_stateful,
    stream_windowed_event_counts,
    stream_wordcount,
)

__all__ = [
    "run_to_memory",
    "stream_events",
    "stream_user_event_counts_stateful",
    "stream_windowed_event_counts",
    "stream_wordcount",
]
