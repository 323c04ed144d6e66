"""Partitioning-determinism differential: a registered query must return
IDENTICAL results under different shuffle-partition counts.

This is the cheapest local proxy for "would two cluster runs agree":
partition count changes task boundaries, accumulation order, and which
row a partition sees first — exactly the degrees of freedom that break
queries leaning on F.first()/collect_list order, unstable sorts before
LIMIT, or accumulation-order-sensitive float outputs that escaped the
rounding policy. The driver's oracle gate would eventually catch these
at one partition count; this catches results that are only PER-RUN
stable.
"""

from __future__ import annotations

import pytest

from hadoop_lab_spark.plans.registry import REGISTRY, load_all_query_modules

from tests.conftest import SF_DIR

load_all_query_modules()

# Order-sensitivity hot spots: ties broken by policy, first()-recovered
# functional dependencies, LIMIT/OFFSET pagination, collected strings,
# float folds, iterative convergence, and the window family.
CANDIDATES = [
    "argmax_type_per_day",
    "collect_types_per_user",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "orders_page2_by_price",
    "top_customers_by_revenue",
    "top_parts_per_brand",
    "pack_documents_greedy",
    "tfidf_top_terms",
    "heavy_hitters_cms",
    "sim_topk_bruteforce",
    "salted_collect_types_per_user",
    "user_longest_increasing_run",
    "customer_name_fuzzy_blocks",
    "user_retention_cohorts",
    "orders_scd2_history",
    "priority_multiset_ops",
    # r5 scale-pattern family: float folds across 5 iterations
    # (pagerank), candidate-set pruning that must be partition-invariant
    # (ssjoin), bucketed stitch windows (sorted-neighborhood), and the
    # two-phase skyline sweep.
    "pagerank_event_handoff",
    "pagerank_weighted_handoff",
    "ssjoin_prefix_jaccard",
    "sorted_neighborhood_pairs",
    "skyline_parts_pareto",
    "triangle_count_handoff_graph",
    "quota_sample_per_type",
    "curation_pipeline_e2e",
    "cms_mergeable_grid",
]


def _rows(df):
    return sorted(repr(tuple(r)) for r in df.collect())


@pytest.mark.parametrize("name", CANDIDATES)
def test_identical_across_partition_counts(spark, name):
    spec = REGISTRY[name]
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        a = _rows(spec.fn(spark, SF_DIR))
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        b = _rows(spec.fn(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert a == b, f"{name}: results differ across shuffle partition counts"
