#!/usr/bin/env python
"""Adjudication bench: time a NAMED SUBSET of registry lanes at sf0.1.

Usage:
  python tools/bench_lanes.py lane1 lane2 ... [--repeats=N]

Runs the 8 pinned canaries FIRST (to certify the host window against
bench_reference.json — same trimmed-mean computation as bench.py), then
the requested lanes, with bench.py's exact timing method (noop-sink
write, median of N, warmup pass). Prints per-lane median vs the pin and
the canary ratio, then ONE JSON summary line.

Exists for BASELINE.md's adjudication clause: when a driver record
breaches a gate on lanes whose code didn't change, the clause requires
the family re-run AT HOST PARITY with plans diffed — this is the re-run
half. A full bench.py run answers the same question 10x slower; the
subset keeps the measurement inside one host window (the r8 driver
record's own problem was a window swing between lane families).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    lanes = [a for a in sys.argv[1:] if not a.startswith("--")]
    repeats = 3
    for a in sys.argv[1:]:
        if a.startswith("--repeats="):
            repeats = int(a.split("=", 1)[1])
    if not lanes:
        sys.exit("usage: bench_lanes.py lane1 lane2 ... [--repeats=N]")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ref = json.load(open(os.path.join(REPO, "bench_reference.json")))
    ref_q = ref["queries"]

    from hadoop_lab_spark.plans.registry import REGISTRY, load_all_query_modules
    from hadoop_lab_spark.session import get_spark

    load_all_query_modules()
    unknown = [n for n in lanes if n not in REGISTRY]
    if unknown:
        sys.exit(f"unknown lanes: {unknown}")
    spark = get_spark(app_name="hadoop-lab-spark-bench-lanes")
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    def run(name: str) -> float:
        times = []
        for _ in range(repeats):
            start = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(time.perf_counter() - start)
        return round(statistics.median(times), 3)

    # Canaries first: certify the host window before the lanes of interest.
    canary_med = {c: run(c) for c in ref["canaries"] if c in ref_q}
    ratios = sorted(canary_med[c] / ref_q[c] for c in canary_med)
    canary_ratio = round(sum(ratios[1:-1]) / len(ratios[1:-1]), 3)

    out = {}
    for name in lanes:
        med = run(name)
        pin = ref_q.get(name)
        out[name] = {
            "median": med,
            "pin": pin,
            "ratio": round(med / pin, 3) if pin else None,
        }
        print(f"LANE {name}: {med} s  (pin {pin}, ratio {out[name]['ratio']})")

    spark.stop()
    print(
        json.dumps(
            {
                "canary_ratio": canary_ratio,
                "canaries": canary_med,
                "reference_label": ref.get("label"),
                "repeats": repeats,
                "lanes": out,
            }
        )
    )


if __name__ == "__main__":
    main()
