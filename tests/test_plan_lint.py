"""Whole-registry plan lint: no scale-killer may enter ANY query plan.

The per-query plan-shape tests (test_plan_shapes.py) pin specific
optimizations; this sweep pins the *absence* of the failure classes that
sink a 100 TB run, across every registered batch query at once:

- ``CartesianProduct`` — an unconstrained n×m join (a broadcast
  nested-loop join over a bounded broadcast side is the acceptable
  cousin, allowlisted per query below);
- ``Exchange rangepartitioning`` — a global sort: at 100 TB a full-data
  range exchange is only legitimate in an explicitly-ordered sink;
- ``BatchEvalPython`` — row-at-a-time Python UDFs (the ~100× slow path;
  Arrow-batched pandas ops are the sanctioned escape hatch).

A new query that trips a marker must either fix its plan or register
itself here WITH a justification string — silent allowlisting is the
failure mode this test exists to prevent.
"""

from __future__ import annotations

import pytest

from hadoop_lab_spark.plans.registry import REGISTRY, load_all_query_modules

from tests.conftest import SF_DIR

load_all_query_modules()

#: query -> {marker: justification}. Every entry documents WHY the
#: marker is acceptable there; anything not listed fails the sweep.
ALLOWED = {
    "dedup_ngram_jaccard": {
        "BroadcastNestedLoopJoin": "1-row collected hot-shingle list "
        "broadcast onto the corpus (bounded by construction)",
    },
    "sim_topk_bruteforce": {
        "BroadcastNestedLoopJoin": "query set (n_queries rows) broadcast "
        "against the corpus — the corpus side never shuffles",
    },
    "sim_topk_ivf": {
        "BroadcastNestedLoopJoin": "centroid table (n_lists rows) "
        "broadcast for probe-list assignment",
    },
    "tfidf_top_terms": {
        "BroadcastNestedLoopJoin": "1-row corpus-size (N) broadcast "
        "joined onto the tf table",
    },
    "multimodal_image_features": {
        "MapInPandas": "intended Arrow-batched decode path (the sanctioned "
        "escape hatch, not a row UDF)",
    },
    "multimodal_frame_sample": {
        "MapInPandas": "intended Arrow-batched frame sampler",
    },
    "multimodal_audio_energy": {
        "MapInPandas": "intended Arrow-batched audio-window metering "
        "(bounded 1→N fan-out, integer metrics)",
    },
    "multimodal_image_resize": {
        "MapInPandas": "intended Arrow-batched resize planner (1→1, "
        "integer box-fit arithmetic)",
    },
    "q11_important_stock": {
        "BroadcastNestedLoopJoin": "1-row global 0.2%-of-total threshold "
        "broadcast onto the per-part aggregate (bounded by construction "
        "— the decorrelated scalar subquery, same shape as q22)",
    },
    "q22_idle_rich_customers": {
        "BroadcastNestedLoopJoin": "1-row global average-balance "
        "threshold broadcast onto the customer scan (bounded by "
        "construction — the decorrelated scalar subquery)",
    },
    "hll_mergeable_distinct": {
        "BroadcastNestedLoopJoin": "two 1-row aggregate results crossed "
        "(merged-sketch estimate x direct estimate) — both sides bounded "
        "by construction",
    },
    "user_longest_increasing_run": {
        "FlatMapGroupsInPandas": "intended grouped-map applyInPandas "
        "escape hatch (per-key sequential scan; state bounded by the "
        "largest key, keys uniform)",
    },
}

MARKERS = (
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "Exchange rangepartitioning",
    "BatchEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
)

BATCH_QUERIES = sorted(
    name for name, spec in REGISTRY.items() if "streaming" not in spec.tags
)


@pytest.mark.parametrize("name", BATCH_QUERIES)
def test_no_scale_killers_in_plan(spark, name):
    df = REGISTRY[name].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    allowed = ALLOWED.get(name, {})
    for marker in MARKERS:
        if marker in plan:
            assert marker in allowed, (
                f"{name}: plan contains {marker} with no registered "
                f"justification — fix the plan or allowlist it with a reason"
            )


def test_allowlist_is_not_stale(spark):
    """Every allowlisted (query, marker) must still occur — a stale entry
    means the plan improved and the allowlist should shrink."""
    for name, markers in ALLOWED.items():
        df = REGISTRY[name].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        for marker in markers:
            assert marker in plan, f"stale allowlist entry: {name} / {marker}"
