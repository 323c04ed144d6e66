#!/usr/bin/env python
"""Pin every batch lane's normalized physical-plan skeleton (r9 gate).

Usage:
  python tools/pin_plan_digests.py [sf_dir] [out_path]
  (defaults: /root/testdata/sf0.01, <repo>/plan_digests.json)

Writes plan_digests.json: lane -> {digest, ops} where `ops` is the
operator-tree header (the numbered skeleton of the formatted explain)
and `digest` hashes the FULL normalized formatted plan — operator
names, join strategies, partitioning schemes, PushedFilters, ReadSchema
— with every digit, path, and expr-id masked.

Why: the plan-shape tests pin SPECIFIC optimizations and the plan lint
pins the ABSENCE of scale-killers, but nothing froze the plans as a
whole — a silent strategy flip (SortMergeJoin where a broadcast used
to be, a new Exchange, a filter no longer reaching the scan) that
trips neither gate would land unnoticed until it costs wall time at
scale. tests/test_plan_digests.py recomputes these digests every run;
an INTENTIONAL plan change re-runs this tool and reviews the ops diff
in the commit.

Normalization contract (shared with the test via import):
- digits -> N  (masks expr ids #123, plan/RDD/operator ids, partition
  counts, literals — the gate targets STRUCTURE, not constants; value
  changes are the oracle gates' job)
- file:/..., /tmp/..., /root/testdata/... -> PATH (roundtrip lanes
  write session-local temp dirs into their scan nodes)

Digests are stable across sessions and shuffle-partition settings
(verified on fresh-JVM back-to-back runs, including the iterative-CC,
temp-writing-roundtrip, data-adaptive and Arrow-UDF lane classes).
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def normalize_plan(plan: str) -> str:
    out = []
    for line in plan.splitlines():
        line = re.sub(r"file:/\S+", "PATH", line)
        line = re.sub(r"/tmp/\S+", "PATH", line)
        line = re.sub(r"/root/testdata/\S+", "PATH", line)
        # per-(session, sf_dir) scratch catalog names (advanced.py
        # _scratch_tag embeds the applicationId — ADVICE r2 race fix)
        line = re.sub(r"hls_\w+", "hls_SCRATCH", line)
        # Checkpoint-scan nodes embed the JVM call-site of the Python
        # localCheckpoint call ("MapPartitionsRDD[7] at localCheckpoint
        # at NativeMethodAccessorImpl.java:0"). After ~15 reflective
        # invocations HotSpot swaps the reflection frame for a
        # generated accessor and the captured site becomes
        # "<unknown>:0" / "GeneratedMethodAccessorNN" — pure
        # session-AGE noise that made iterative-lane digests depend on
        # how many checkpoints ran earlier in the process (found by
        # running the gate after test_scale_ops' hypothesis loops).
        line = re.sub(r" at [^\s,)\]]+:\d+", " at CALLSITE", line)
        line = re.sub(r"\d+", "N", line)
        out.append(line.rstrip())
    return "\n".join(out)


#: Lanes whose FULL-TEXT digest is inherently build-unstable: grouping
#: sets resolve their Expand/aggregate key order from an expr-id-keyed
#: hash set, and expr ids are a per-build counter — two builds of the
#: SAME DataFrame in one session can emit [md5(text), lang, source] vs
#: [lang, md5(text), source] (observed r9 on corpus_dataset_card). The
#: operator SKELETON is stable, so these lanes gate on skeleton_digest;
#: a structural regression (new Exchange, lost broadcast) still trips.
SKELETON_ONLY = {"corpus_dataset_card"}


def plan_record(df) -> dict:
    """Normalized digest + operator-header skeleton for a DataFrame."""
    jvm_mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    plan = df._jdf.queryExecution().explainString(jvm_mode.fromString("formatted"))
    norm = normalize_plan(plan)
    ops = [
        ln.strip()
        for ln in norm.splitlines()
        if re.match(r"^[\s:+*-]*\((N|\d+)\)\s", ln)
    ]
    return {
        "digest": hashlib.md5(norm.encode()).hexdigest(),
        "skeleton_digest": hashlib.md5("\n".join(ops).encode()).hexdigest(),
        "ops": ops,
    }


def batch_lanes() -> list[str]:
    from hadoop_lab_spark.plans.registry import REGISTRY, load_all_query_modules

    load_all_query_modules()
    return sorted(n for n, s in REGISTRY.items() if "streaming" not in s.tags)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    out_path = args[1] if len(args) > 1 else os.path.join(REPO, "plan_digests.json")

    from hadoop_lab_spark.plans.registry import REGISTRY
    from hadoop_lab_spark.session import get_spark

    lanes = batch_lanes()
    spark = get_spark(app_name="pin-plan-digests", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    digests = {}
    for name in lanes:
        # Digest from a clean cache state: building the cached-Q15 lane
        # persists its supplier-revenue subtree, and Spark then
        # auto-substitutes that InMemoryRelation into ANY later plan
        # containing the identical subtree (the uncached twin) — plans
        # would depend on lane build ORDER. The test clears likewise.
        spark.catalog.clearCache()
        digests[name] = plan_record(REGISTRY[name].fn(spark, sf_dir))
        print(f"{name}: {digests[name]['digest'][:12]} ({len(digests[name]['ops'])} ops)")
    spark.stop()
    json.dump(
        {"sf_dir": sf_dir, "lanes": digests},
        open(out_path, "w"),
        indent=1,
        sort_keys=True,
    )
    print(f"pinned {len(digests)} plan digests -> {out_path}")


if __name__ == "__main__":
    main()
