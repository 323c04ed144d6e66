#!/usr/bin/env python
"""Benchmark harness: run the headline query set and print ONE JSON line.

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": <scale factor>}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (local[N], default all cores).

Each query is executed to completion with a noop-sink write: unlike
count() — under which Catalyst prunes every column the count doesn't
need, making projection-heavy queries measure as nearly free — the noop
sink materializes ALL output columns through the full plan while adding
no write cost (and no driver-side materialization like collect()). A
warmup pass on the smallest table absorbs JVM/codegen startup so
per-query numbers reflect the plans, not the JIT.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    match = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(match.group(1).rstrip(".")) if match else -1.0

    from hadoop_lab_spark.plans.registry import REGISTRY, load_all_query_modules
    from hadoop_lab_spark.session import get_spark

    load_all_query_modules()
    spark = get_spark(app_name="hadoop-lab-spark-bench")
    spark.sparkContext.setLogLevel("WARN")

    # Warmup: touch the runtime (codegen, shuffle machinery) once.
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    timings: dict[str, float] = {}
    for name, spec in sorted(REGISTRY.items()):
        if not spec.bench:
            continue
        start = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 3)

    # Streaming lane: startup-dominated (state store + availableNow
    # machinery), so the wall times live in their own section instead of
    # polluting the headline set — but they ARE recorded, so a state-store
    # regression shows up round-over-round.
    streaming: dict[str, float] = {}
    for name, spec in sorted(REGISTRY.items()):
        if spec.bench or "streaming" not in spec.tags:
            continue
        start = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        streaming[name] = round(time.perf_counter() - start, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_set_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "streaming": streaming,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
