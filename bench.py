#!/usr/bin/env python
"""Benchmark harness: run the headline query set, print a compact JSON line.

Output contract (driver captures the stdout TAIL, so the summary must be
the LAST line and must be small — round 2's single giant line with all
per-query timings inline was head-truncated and recorded as parsed:null):

  line 1..k : per-query detail JSON (one object per line, prefixed
              "DETAIL ") — greppable, never part of the summary parse
  last line : {"metric": "...", "value": <total sec>, "unit": "sec",
               "sf": ..., "repeats": N, "n_queries": N} — COMPACT; the
               per-query map stays OUT of this line by design (inlining
               it is what overflowed the tail capture in round 2)

The full detail (median + min/max spread per query) is also written to
bench_detail.json next to this script.

Each query executes REPEATS times (median reported; env
SPARK_GRAFT_BENCH_REPEATS, default 3) with a noop-sink write: unlike
count() — under which Catalyst prunes every column the count doesn't
need, making projection-heavy queries measure as nearly free — the noop
sink materializes ALL output columns through the full plan while adding
no write cost (and no driver-side materialization like collect()). A
warmup pass on the smallest table absorbs JVM/codegen startup so
per-query numbers reflect the plans, not the JIT.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (local[N], default all cores),
     SPARK_GRAFT_BENCH_REPEATS (default 3; streaming lane always 1).
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time


#: Canary normalization (VERDICT r4 #5). The recorded 73–93 s
#: host-drift band exceeds the signal a single-lane regression adds, so
#: cross-round comparison needs a host-independent scale. These three
#: lanes span the workload classes (pruned scan+agg, LSH band join,
#: banded self-join+verify), their PLANS are pinned by
#: tests/test_plan_shapes.py, and their reference medians below are the
#: r4 round-of-record figures at sf0.1 (bench_detail.json @ 7ef5247).
#: Each run reports canary_ratio = median(current/reference); divide
#: any lane's wall time by it to compare rounds on a common scale.
#: Only meaningful at sf0.1 (the reference SF) — at other SFs the
#: ratio is emitted as null.
CANARY_REFERENCE_SF01 = {
    "wordcount": 0.236,
    "dedup_minhash_lsh": 2.438,
    "dedup_simhash_pairs": 2.636,
}


def _time_query(fn, spark, sf_dir: str, repeats: int) -> list[float]:
    times = []
    for _ in range(repeats):
        start = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - start)
    return times


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    match = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(match.group(1).rstrip(".")) if match else -1.0

    from hadoop_lab_spark.plans.registry import REGISTRY, load_all_query_modules
    from hadoop_lab_spark.session import get_spark

    load_all_query_modules()
    spark = get_spark(app_name="hadoop-lab-spark-bench")
    spark.sparkContext.setLogLevel("WARN")

    # Warmup: touch the runtime (codegen, shuffle machinery) once.
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    detail: dict[str, dict[str, float]] = {}
    timings: dict[str, float] = {}
    for name, spec in sorted(REGISTRY.items()):
        if not spec.bench:
            continue
        times = _time_query(spec.fn, spark, sf_dir, repeats)
        timings[name] = round(statistics.median(times), 3)
        detail[name] = {
            "median": timings[name],
            "min": round(min(times), 3),
            "max": round(max(times), 3),
            "runs": [round(t, 3) for t in times],
        }
        print(f"DETAIL {json.dumps({name: detail[name]})}", flush=True)

    # Streaming lane: startup-dominated (state store + availableNow
    # machinery) and stateful-store-heavy, so one run each, recorded in
    # the detail file but excluded from the headline figure.
    streaming: dict[str, float] = {}
    for name, spec in sorted(REGISTRY.items()):
        if spec.bench or "streaming" not in spec.tags:
            continue
        times = _time_query(spec.fn, spark, sf_dir, 1)
        streaming[name] = round(times[0], 3)
        print(f"DETAIL {json.dumps({name: {'median': streaming[name], 'streaming': True}})}", flush=True)

    total = round(sum(timings.values()), 3)

    # Host-drift normalization: median of the canary lanes' ratio to
    # their r4 reference medians (sf0.1 only — see CANARY_REFERENCE_SF01).
    canary_ratio = None
    if sf == 0.1 and all(n in timings for n in CANARY_REFERENCE_SF01):
        ratios = sorted(
            timings[n] / ref for n, ref in CANARY_REFERENCE_SF01.items()
        )
        canary_ratio = round(ratios[len(ratios) // 2], 3)
    normalized_total = (
        round(total / canary_ratio, 3) if canary_ratio else None
    )

    out_dir = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(out_dir, "bench_detail.json"), "w") as f:
        json.dump(
            {
                "sf": sf,
                "repeats": repeats,
                "total_median_sec": total,
                "canary_ratio": canary_ratio,
                "canary_reference": CANARY_REFERENCE_SF01,
                "normalized_total_sec": normalized_total,
                "queries": detail,
                "streaming": streaming,
            },
            f,
            indent=1,
            sort_keys=True,
        )

    # The compact summary MUST be the last stdout line (driver tail-parse).
    sys.stdout.flush()
    print(
        json.dumps(
            {
                "metric": "headline_query_set_wall_time",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "repeats": repeats,
                "n_queries": len(timings),
                "canary_ratio": canary_ratio,
                "normalized_total": normalized_total,
                "detail_file": "bench_detail.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
