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


#: Detail-block node types whose bracketed argument lists are sorted
#: before hashing: grouping sets resolve their Expand projection /
#: output attribute order from an expr-id-keyed hash set, and expr ids
#: are a per-build counter — two builds of the SAME DataFrame can print
#: [md5(text), lang, source] vs [lang, md5(text), source] (observed r9
#: on corpus_dataset_card). After digit masking the item MULTISET is
#: build-invariant, so sorting each innermost [...] list restores a
#:  stable full-text digest without loosening it: a genuinely new/lost
#: expression still changes the sorted list. Downstream HashAggregates
#: inherit key order from the Expand output, so they are sorted too.
#: (Sort is deliberately absent: sort-KEY order is semantics, and an
#: accidental key reorder must keep tripping the digest. Exchange list
#: order is cosmetic, and Project INPUT lists inherit the Expand flip —
#: but Project OUTPUT order is result-schema semantics when the Project
#: is the plan's top, so Output lines inside Project blocks stay
#: order-sensitive [ADVICE r10: sorting them made the digest invariant
#: under a genuine output-column reorder, leaving the driver's schema
#: compare as the sole gate for that regression class].)
_SORT_ARG_NODES = ("Expand", "HashAggregate", "Exchange", "Project")

#: Bumped whenever normalize_plan's output changes for an unchanged
#: plan (so every full-text digest re-hashes). Recorded in
#: plan_digests.json; the rotation's digest-change detector compares
#: FULL-TEXT digests only between pins of the same version and falls
#: back to the skeleton digest across versions (ADVICE r10: skeleton-
#: only comparison was blind to detail-level changes — lost
#: PushedFilters, changed join keys — exactly the gap the full digest
#: exists to close).
#: v2: Project Output lines order-sensitive (r11); v1 (implicit,
#: absent from the JSON): the r10 canonical-list-order normalizer.
NORMALIZER_VERSION = 2

_DETAIL_HEADER = re.compile(r"^\((\d+|N)\) (\S+)")


def _split_top_level(s: str) -> list[str]:
    """Split on commas not nested inside any bracket/paren pair."""
    parts: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in s:
        if ch in "[(":
            depth += 1
        elif ch in "])":
            depth = max(0, depth - 1)
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def _sort_bracket_lists(s: str) -> str:
    """Recursively sort the comma-separated items of every [...] group
    (items compared after their own sub-lists are canonicalized, so
    list-of-list projections sort stably too). Expression-internal
    brackets (a regex char class, an array literal) get 'sorted' as
    well — a deterministic mangling that is harmless for hashing: the
    item MULTISET at every level is invariant under the expr-id-driven
    reorderings this exists to mask, while a genuinely added/changed
    expression still changes the canonical text."""
    out: list[str] = []
    i = 0
    while i < len(s):
        if s[i] == "[":
            depth = 0
            for j in range(i, len(s)):
                if s[j] == "[":
                    depth += 1
                elif s[j] == "]":
                    depth -= 1
                    if depth == 0:
                        break
            else:
                out.append(s[i:])
                break
            inner = s[i + 1 : j]
            items = [_sort_bracket_lists(p.strip()) for p in _split_top_level(inner)]
            out.append("[" + ", ".join(sorted(items)) + "]")
            i = j + 1
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def _sort_hashpartitioning(line: str) -> str:
    """Canonicalize ``hashpartitioning(k1, k2, ..., N)`` key order: a
    hash partitioning over the same key SET is the same partitioning
    regardless of printed order, and grouping-sets lanes reorder it
    per build. The masked partition count sorts among the keys —
    deterministic, so harmless to the hash."""
    out: list[str] = []
    i = 0
    marker = "hashpartitioning("
    while True:
        k = line.find(marker, i)
        if k < 0:
            out.append(line[i:])
            break
        j = k + len(marker)
        depth = 1
        while j < len(line) and depth:
            if line[j] == "(":
                depth += 1
            elif line[j] == ")":
                depth -= 1
            j += 1
        inner = line[k + len(marker) : j - 1]
        items = sorted(
            _sort_bracket_lists(p.strip()) for p in _split_top_level(inner)
        )
        out.append(line[i:k] + marker + ", ".join(items) + ")")
        i = j
    return "".join(out)


def normalize_plan(plan: str) -> str:
    out = []
    sort_block = False
    project_block = False
    for line in plan.splitlines():
        header = _DETAIL_HEADER.match(line.strip())
        if header:
            sort_block = header.group(2) in _SORT_ARG_NODES
            project_block = header.group(2) == "Project"
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
        # Project Output order is result-schema semantics (ADVICE r10);
        # Project Input inherits the upstream Expand/aggregate flip and
        # stays canonicalized like the other _SORT_ARG_NODES lines.
        if sort_block and not (
            project_block and line.lstrip().startswith("Output")
        ):
            line = _sort_bracket_lists(_sort_hashpartitioning(line))
        out.append(line.rstrip())
    return "\n".join(out)


#: Lanes whose FULL-TEXT digest is inherently build-unstable and
#: therefore gate on skeleton_digest only. EMPTY since r10: the one
#: member, corpus_dataset_card (grouping sets resolve their Expand/
#: aggregate key order from an expr-id-keyed hash set, and expr ids
#: are a per-build counter), returned to the strict digest once
#: normalize_plan canonicalized list order in Expand/HashAggregate/
#: Exchange/Project blocks + hashpartitioning keys (ADVICE r9;
#: verified stable over 20 same-session builds where the raw text
#: showed 6 variants). The mechanism stays for future data-adaptive
#: lanes.
SKELETON_ONLY: set[str] = set()


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
        {
            "sf_dir": sf_dir,
            "normalizer_version": NORMALIZER_VERSION,
            "lanes": digests,
        },
        open(out_path, "w"),
        indent=1,
        sort_keys=True,
    )
    print(f"pinned {len(digests)} plan digests -> {out_path}")


if __name__ == "__main__":
    main()
