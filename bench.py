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

Cross-round comparison (VERDICT r5 #1 — the 3-canary median misfired):
the PRIMARY cross-round metric is the common-lane ratio — sum of this
run's medians over the lanes shared with the pinned round-of-record
reference (bench_reference.json, committed once per round) divided by
the reference's sum over the same lanes. Canaries only bridge HOSTS:
9 lanes spanning the plan families (scan-agg, scan-local text, salted
window agg, multi-join, LSH band join, banded self-join + verify,
iterative graph, percentile window, and — since the r9 pin —
checkpoint-iterative CC, whose family swung 1.5x against a 0.98
canary read in the r8 driver record), normalized by the TRIMMED MEAN of
their current/reference ratios (drop the single lowest and highest —
r5 showed one canary can move 37% for host-local reasons; the median
of 3 gave that outlier a 1-in-3 chance of steering the headline).
Both ratios are emitted; when they disagree beyond the documented host
band, trust the common-lane ratio. Two normalized totals are emitted
(ADVICE r6): normalized_total = total/canary_ratio (host-bridged,
code regressions remain visible — the budget figure), and
normalized_total_common = total/common_lane_ratio (host- AND
code-drift-free headline; by construction it cannot show a shared-lane
regression, so the regression gate is the common_lane_ratio itself).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (local[N], default all cores),
     SPARK_GRAFT_BENCH_REPEATS (default 3; streaming lane always 1),
     SPARK_GRAFT_BENCH_GC (default 0: no clearCache/System.gc()
     barrier between lanes. The barrier was the r5 hypothesis for the
     dedup_minhash_lsh 2.44→3.34 s cross-host delta; a full A/B at
     sf0.1 [PERFORMANCE.md "GC-barrier A/B"] showed it makes the
     bench SLOWER — median on/off lane ratio 1.19, e.g. dedup_simhash
     1.69→2.55 s — while trimming the lsh lane only 3.31→3.10 s, and
     that the lsh delta was the r5 builder HOST being fast, not
     session-order heap pressure. Set 1 to reproduce the experiment).
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
_REFERENCE_PATH = os.path.join(_REPO_DIR, "bench_reference.json")


def _load_reference() -> dict | None:
    """Pinned round-of-record medians (bench_reference.json): the canary
    list + per-lane medians this run is compared against. Re-pinned once
    per round from the driver's recorded detail."""
    try:
        with open(_REFERENCE_PATH) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def _trimmed_mean_ratio(
    timings: dict[str, float], reference: dict
) -> float | None:
    """Host-bridge factor: trimmed mean (drop min and max) of the canary
    lanes' current/reference ratios. Needs >= 3 usable canaries so the
    trim leaves at least one value."""
    ratios = sorted(_canary_ratios(timings, reference).values())
    if len(ratios) < 3:
        return None
    trimmed = ratios[1:-1]
    return round(sum(trimmed) / len(trimmed), 3)


def _canary_ratios(
    timings: dict[str, float], reference: dict
) -> dict[str, float]:
    ref_q = reference.get("queries", {})
    return {
        n: timings[n] / ref_q[n]
        for n in reference.get("canaries", [])
        if n in timings and ref_q.get(n)
    }


def _warn_if_canaries_skewed(
    timings: dict[str, float], reference: dict, trimmed: float | None
) -> list[str]:
    """VERDICT r8 #2: the r8 driver record's budget breach was a
    FAMILY-skewed host window — the checkpoint-iterative family ran
    1.3-1.5x while the (then all CPU-bound) canaries read 0.98, so the
    scalar bridge silently under-corrected and the breach surfaced as
    an unexplained gate failure a round later. The trim drops the
    extreme ratios by design (one host-local outlier must not steer the
    bridge), which means a lone diverging family canary can never move
    the scalar — its job is THIS check: name any canary whose ratio
    sits >20% from the trimmed mean, loudly, in the run's own output,
    so the record carries the "this window is family-skewed; per-lane
    numbers need tools/bench_lanes.py adjudication" flag."""
    if trimmed is None:
        return []
    skewed = [
        n
        for n, r in sorted(_canary_ratios(timings, reference).items())
        if abs(r / trimmed - 1.0) > 0.20
    ]
    for n in skewed:
        ratio = _canary_ratios(timings, reference)[n]
        print(
            f"WARNING: canary {n} at {ratio:.2f}x its pin vs trimmed mean "
            f"{trimmed:.2f} — family-skewed host window; the scalar "
            "canary_ratio does not bridge this run's "
            f"{n}-like lanes (adjudicate with tools/bench_lanes.py)",
            file=sys.stderr,
        )
    return skewed


def _common_lane_ratio(
    timings: dict[str, float], reference: dict
) -> tuple[float | None, int]:
    """PRIMARY cross-round metric: Σ current / Σ reference over the lanes
    present in both runs. Immune to lane-set churn (new lanes don't
    inflate it, removed lanes don't deflate it)."""
    ref_q = reference.get("queries", {})
    common = [n for n in timings if ref_q.get(n)]
    if not common:
        return None, 0
    cur = sum(timings[n] for n in common)
    ref = sum(ref_q[n] for n in common)
    return round(cur / ref, 3), len(common)


def _gc_barrier(spark) -> None:
    """Drain cross-lane state so lane N's heap/cache pressure cannot
    leak into lane N+1's timing (the r5 host-drift hypothesis): drop
    cached relations, then ask the JVM for a full GC."""
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()


def _time_query(fn, spark, sf_dir: str, repeats: int, gc: bool) -> list[float]:
    times = []
    for _ in range(repeats):
        if gc:
            _gc_barrier(spark)
        start = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - start)
    return times


def _warn_if_contended() -> None:
    """A concurrent Spark JVM inflates isolated small lanes 1.5-2x
    (measured r7: a CLI smoke running mid-bench pushed
    top_parts_per_brand 0.18->0.38 s while barely moving the totals),
    which poisons per-lane adjudication. Our own JVM hasn't started
    yet, so ANY Spark JVM visible now is foreign. Warning only — the
    run may be deliberate (e.g. a shared CI box)."""
    try:
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmd = f.read()
            except OSError:
                continue
            if b"org.apache.spark" in cmd:
                print(
                    f"WARNING: another Spark JVM is running (pid {pid}) — "
                    "bench medians will be contended; per-lane numbers "
                    "are not adjudication-grade",
                    file=sys.stderr,
                )
                return
    except OSError:
        pass  # non-procfs platform: skip the check


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _warn_if_contended()
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    gc = os.environ.get("SPARK_GRAFT_BENCH_GC", "0") == "1"
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
        times = _time_query(spec.fn, spark, sf_dir, repeats, gc)
        timings[name] = round(statistics.median(times), 3)
        detail[name] = {
            "median": timings[name],
            "min": round(min(times), 3),
            "max": round(max(times), 3),
            "runs": [round(t, 3) for t in times],
        }
        print(f"DETAIL {json.dumps({name: detail[name]})}", flush=True)

    # Demo lanes (bench=False, tagged "demo"): priced knob demos kept out
    # of the headline set (VERDICT r5 #5) but still timed once here so
    # the PERFORMANCE.md pricing tables track live numbers.
    demos: dict[str, float] = {}
    for name, spec in sorted(REGISTRY.items()):
        if spec.bench or "demo" not in spec.tags:
            continue
        times = _time_query(spec.fn, spark, sf_dir, 1, gc)
        demos[name] = round(times[0], 3)
        print(f"DETAIL {json.dumps({name: {'median': demos[name], 'demo': True}})}", flush=True)

    # Streaming lane: startup-dominated (state store + availableNow
    # machinery) and stateful-store-heavy, so one run each, recorded in
    # the detail file but excluded from the headline figure.
    streaming: dict[str, float] = {}
    for name, spec in sorted(REGISTRY.items()):
        if spec.bench or "streaming" not in spec.tags:
            continue
        times = _time_query(spec.fn, spark, sf_dir, 1, gc)
        streaming[name] = round(times[0], 3)
        print(f"DETAIL {json.dumps({name: {'median': streaming[name], 'streaming': True}})}", flush=True)

    total = round(sum(timings.values()), 3)

    # Normalization vs the pinned round-of-record (sf0.1 only — that is
    # the reference SF; at other SFs both ratios are emitted as null).
    reference = _load_reference() if sf == 0.1 else None
    canary_ratio = None
    common_lane_ratio, n_common = None, 0
    skewed_canaries: list[str] = []
    if reference:
        canary_ratio = _trimmed_mean_ratio(timings, reference)
        common_lane_ratio, n_common = _common_lane_ratio(timings, reference)
        skewed_canaries = _warn_if_canaries_skewed(
            timings, reference, canary_ratio
        )
    normalized_total = (
        round(total / canary_ratio, 3) if canary_ratio else None
    )
    # ADVICE r6: also emit the PRIMARY metric as a normalized total, so
    # a canary-only host anomaly that survives the trim cannot steer the
    # only headline figure. The two totals answer different questions —
    # total/canary_ratio divides out ONLY host speed (canaries are
    # never-touched lanes, so code regressions stay visible in it),
    # while total/common_lane_ratio divides out host AND code drift on
    # the shared lanes (it converges to the reference total scaled by
    # lane-mix, so it is a host-free headline but NOT a regression
    # signal — the common_lane_ratio itself is the regression gate).
    # When the two normalized totals disagree beyond the documented
    # host band, trust the common-lane figure (module docstring).
    normalized_total_common = (
        round(total / common_lane_ratio, 3) if common_lane_ratio else None
    )

    with open(os.path.join(_REPO_DIR, "bench_detail.json"), "w") as f:
        json.dump(
            {
                "sf": sf,
                "repeats": repeats,
                "gc_barrier": gc,
                "total_median_sec": total,
                "canary_ratio": canary_ratio,
                "canaries": (reference or {}).get("canaries"),
                "reference_label": (reference or {}).get("label"),
                "common_lane_ratio": common_lane_ratio,
                "n_common_lanes": n_common,
                "skewed_canaries": skewed_canaries,
                "normalized_total_sec": normalized_total,
                "normalized_total_common_sec": normalized_total_common,
                "queries": detail,
                "demos": demos,
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
                "common_lane_ratio": common_lane_ratio,
                "n_common_lanes": n_common,
                # names of canaries >20% off the trimmed mean: non-empty
                # means the window is family-skewed and per-lane numbers
                # need bench_lanes.py adjudication (VERDICT r8 #2)
                "skewed_canaries": skewed_canaries,
                "normalized_total": normalized_total,
                "normalized_total_common": normalized_total_common,
                # machine-recorded budget provenance (VERDICT r7 #3):
                # the pin tool chains budget x canary-bridge per re-pin,
                # so the unit the normalized figures are read in is data
                "budget_normalized_spq": (reference or {}).get(
                    "budget_normalized_spq"
                ),
                "reference_label": (reference or {}).get("label"),
                "detail_file": "bench_detail.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
