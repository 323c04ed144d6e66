"""Unit tests for the distributed connected-components operator on
hand-built graphs where the expected clustering is obvious: the oracle
differential only exercises the near-dup graph the corpus happens to
produce, which is mostly tiny components."""

from __future__ import annotations

import pytest

from hadoop_lab_spark.operators.graph import connected_components


def _cc(spark, node_ids, edge_pairs):
    nodes = spark.createDataFrame([(n,) for n in node_ids], "id bigint")
    edges = spark.createDataFrame(
        [(a, b) for a, b in edge_pairs], "id_a bigint, id_b bigint"
    )
    out = connected_components(nodes, edges, "id")
    return dict(out.collect())


def test_path_graph_converges_to_min(spark):
    # 0-1-2-3-4-5: worst case for pure propagation, pointer jumping
    # collapses it logarithmically
    got = _cc(spark, range(6), [(i, i + 1) for i in range(5)])
    assert got == {i: 0 for i in range(6)}


def test_cycle_and_singletons(spark):
    got = _cc(spark, range(8), [(3, 4), (4, 5), (5, 3)])
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 3, 5: 3, 6: 6, 7: 7}


def test_two_components_direction_ignored(spark):
    got = _cc(spark, range(6), [(5, 4), (1, 0), (2, 1)])
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}


def test_empty_edges_all_singletons(spark):
    got = _cc(spark, range(4), [])
    assert got == {i: i for i in range(4)}


def test_cc_frees_superseded_checkpoint_blocks(spark):
    """Iterative loops must not leak one block set per round for the
    life of the session (VERDICT r9 #1/#2: accumulated localCheckpoint
    blocks were a suspect in the mid-bench session-state blowup). A
    16-node path forces multiple pointer-jumping rounds; afterwards at
    most the FINAL labels checkpoint may remain pinned."""
    from hadoop_lab_spark.checkpoint import persistent_rdd_ids

    sc = spark.sparkContext
    before = persistent_rdd_ids(sc)
    got = _cc(spark, range(16), [(i, i + 1) for i in range(15)])
    assert got == {i: 0 for i in range(16)}
    leaked = persistent_rdd_ids(sc) - before
    assert len(leaked) <= 1, (
        f"CC left {len(leaked)} checkpoint block sets pinned; only the "
        "final labels checkpoint may survive the call"
    )


def test_pagerank_frees_superseded_checkpoint_blocks(spark):
    from hadoop_lab_spark.checkpoint import persistent_rdd_ids
    from hadoop_lab_spark.operators.graph import pagerank

    sc = spark.sparkContext
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3)], "src bigint, dst bigint"
    )
    before = persistent_rdd_ids(sc)
    ranks = pagerank(edges, iterations=4)
    assert ranks.count() == 4
    leaked = persistent_rdd_ids(sc) - before
    assert len(leaked) <= 1, (
        f"pagerank left {len(leaked)} checkpoint block sets pinned; "
        "only the final ranks checkpoint may survive the call"
    )


def test_cc_nonconvergence_frees_all_checkpoint_blocks(spark, monkeypatch):
    """ADVICE r10: the non-convergence raise must not strand the sym
    table or the last round's labels in the BlockManager — a failed run
    leaves zero net new pinned blocks."""
    import hadoop_lab_spark.operators.graph as graph_mod
    from hadoop_lab_spark.checkpoint import persistent_rdd_ids

    monkeypatch.setattr(graph_mod, "MAX_CC_ITERATIONS", 1)
    sc = spark.sparkContext
    before = persistent_rdd_ids(sc)
    with pytest.raises(RuntimeError, match="did not converge"):
        # 16-node path needs >1 pointer-jumping round
        _cc(spark, range(16), [(i, i + 1) for i in range(15)])
    leaked = persistent_rdd_ids(sc) - before
    assert leaked == set(), (
        f"non-convergent CC left blocks pinned: {leaked}"
    )


def test_persistent_rdd_ids_returns_none_on_probe_failure():
    """ADVICE r10: a failed BlockManager probe must read as UNKNOWN
    (None), never as 'nothing pinned' — a set() here, diffed against a
    later successful snapshot, would mark live RDDs as freshly pinned
    and let cleanup destroy them."""
    from hadoop_lab_spark.checkpoint import persistent_rdd_ids

    class _BrokenSc:
        class _jsc:  # noqa: N801 — mimics SparkContext._jsc
            @staticmethod
            def getPersistentRDDs():
                raise RuntimeError("py4j gone")

    assert persistent_rdd_ids(_BrokenSc()) is None


def test_tracked_checkpoint_reports_untracked_on_snapshot_failure(
    spark, monkeypatch
):
    """When either snapshot around the localCheckpoint fails, the call
    must still checkpoint (results first) but report ZERO pinned ids —
    mis-attributing live blocks to the checkpoint is the failure mode
    that lets unpersist_rdds break other lanes mid-query."""
    import hadoop_lab_spark.checkpoint as cp

    monkeypatch.setattr(cp, "persistent_rdd_ids", lambda sc: None)
    df = spark.createDataFrame([(1,)], "id bigint")
    out, ids = cp.tracked_checkpoint(df)
    assert ids == set()
    assert out.collect()[0][0] == 1


def test_pagerank_midloop_failure_frees_all_checkpoint_blocks(
    spark, monkeypatch
):
    """ADVICE r10 (pagerank twin of the CC test): a mid-round failure
    must free the static edge/node tables and the last round's rank
    checkpoint — zero net new pinned blocks on the error path."""
    import hadoop_lab_spark.operators.graph as graph_mod
    from hadoop_lab_spark.checkpoint import persistent_rdd_ids
    from hadoop_lab_spark.operators.graph import pagerank

    real_round = graph_mod._pagerank_round
    calls = {"n": 0}

    def flaky_round(esd, nodes, ranks, damping):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("executor lost")
        return real_round(esd, nodes, ranks, damping)

    monkeypatch.setattr(graph_mod, "_pagerank_round", flaky_round)
    sc = spark.sparkContext
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src bigint, dst bigint"
    )
    before = persistent_rdd_ids(sc)
    with pytest.raises(RuntimeError, match="executor lost"):
        pagerank(edges, iterations=4)
    leaked = persistent_rdd_ids(sc) - before
    assert leaked == set(), f"failed pagerank left blocks pinned: {leaked}"


def test_static_checkpoint_preserves_partitioning_for_smj_rounds(spark):
    """Contract of checkpoint.partitioning_preserved (r11): a static
    table repartitioned on the per-round join key and checkpointed
    inside the scope CARRIES that hash partitioning into its
    LogicalRDD — under an AQE-compiled checkpoint it reads
    UnknownPartitioning and a sort-merge round re-shuffles the
    |E|-sized table every iteration (4 exchanges vs 1, measured). The
    graph operators deliberately do NOT use the scope yet (it costs
    2-4x at bench SF where AQE's runtime broadcast already keeps the
    edge table in place — PERFORMANCE.md "r11: checkpoint
    partitioning"); this test pins the primitive the size-aware r12
    switch will build on, by forcing SMJ and counting exchanges."""
    from pyspark.sql import functions as F

    from hadoop_lab_spark.checkpoint import (
        partitioning_preserved,
        tracked_checkpoint,
    )
    from hadoop_lab_spark.operators.graph import _pagerank_round

    edges = spark.createDataFrame(
        [(i % 7, (i + 1) % 11) for i in range(200)], "src bigint, dst bigint"
    ).select("src", "dst", F.lit(1.0).alias("_w"))
    deg = edges.groupBy("src").agg(F.sum("_w").alias("deg"))
    with partitioning_preserved(spark):
        esd, ids = tracked_checkpoint(
            edges.join(deg, "src")
            .select("src", "dst", "_w", "deg")
            .repartition(F.col("src"))
        )
    part = str(esd._jdf.queryExecution().optimizedPlan().outputPartitioning())
    assert "hashpartitioning" in part and "src" in part, part

    nodes = esd.select(F.col("src").alias("id")).distinct()
    ranks = nodes.select("id", F.lit(1.0).alias("rank"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = (
            _pagerank_round(esd, nodes, ranks, 0.85)
            ._jdf.queryExecution()
            .explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    n_shuffles = sum(
        1
        for ln in plan.splitlines()
        if ln.strip().startswith("(") and ") Exchange" in ln
    )
    # Exactly ONE shuffle survives: the contribution groupBy(dst) — the
    # irreducible per-round re-key. The esd/node/rank sides all read
    # the checkpoint's preserved clustering (an AQE-compiled checkpoint
    # plans 4 here — the edge table re-shuffled every round).
    assert n_shuffles == 1, f"round plan re-shuffles a static side:\n{plan}"
    assert "hashpartitioning(dst" in plan, plan
    # AQE restored by the context manager
    assert spark.conf.get("spark.sql.adaptive.enabled") in ("true", "True")
    from hadoop_lab_spark.checkpoint import unpersist_rdds

    unpersist_rdds(spark.sparkContext, ids)


def test_size_switch_below_threshold_is_plain_checkpoint(spark):
    """r12 size-aware switch, small side: below PARTITION_PRESERVE_MIN_BYTES
    the helper must behave bit-identically to tracked_checkpoint — the
    AQE-shaped (coalesced, UnknownPartitioning) checkpoint that is
    optimal at bench SF, so no bench lane digest can change."""
    from pyspark.sql import functions as F

    from hadoop_lab_spark.checkpoint import (
        persistent_rdd_ids,
        tracked_checkpoint_partitioned,
        unpersist_rdds,
    )

    df = spark.range(100).select(
        F.col("id").alias("src"), (F.col("id") % 7).alias("dst")
    ).repartition(F.col("dst"))
    before = persistent_rdd_ids(spark.sparkContext)
    out, ids = tracked_checkpoint_partitioned(df, "dst")
    part = str(out._jdf.queryExecution().optimizedPlan().outputPartitioning())
    assert "hashpartitioning" not in part, part  # AQE checkpoint shape kept
    assert out.count() == 100
    assert persistent_rdd_ids(spark.sparkContext) - before == ids
    unpersist_rdds(spark.sparkContext, ids)


def test_size_switch_above_threshold_preserves_partitioning(spark):
    """r12 size-aware switch, large side (threshold lowered to 1 byte):
    the helper re-checkpoints the materialized blocks inside
    partitioning_preserved — the LogicalRDD carries hashpartitioning on
    the loop key, the superseded first checkpoint's blocks are FREED,
    and the values are unchanged."""
    from pyspark.sql import functions as F

    from hadoop_lab_spark.checkpoint import (
        persistent_rdd_ids,
        tracked_checkpoint_partitioned,
        unpersist_rdds,
    )

    df = spark.range(500).select(
        F.col("id").alias("src"), (F.col("id") % 13).alias("dst")
    ).repartition(F.col("dst"))
    before = persistent_rdd_ids(spark.sparkContext)
    out, ids = tracked_checkpoint_partitioned(df, "dst", min_bytes=1)
    part = str(out._jdf.queryExecution().optimizedPlan().outputPartitioning())
    assert "hashpartitioning" in part and "dst" in part, part
    # only the FINAL checkpoint's blocks remain pinned (first one freed)
    assert persistent_rdd_ids(spark.sparkContext) - before == ids
    assert out.count() == 500
    assert (
        out.agg(F.sum("src").alias("s")).collect()[0]["s"]
        == sum(range(500))
    )
    # AQE restored after the scoped re-checkpoint
    assert spark.conf.get("spark.sql.adaptive.enabled") in ("true", "True")
    unpersist_rdds(spark.sparkContext, ids)


def test_size_switch_unknown_size_keeps_default_shape(spark, monkeypatch):
    """A failed size probe means UNKNOWN — the helper must keep the
    default (AQE) shape rather than guess large (the never-guess rule
    of this module)."""
    import hadoop_lab_spark.checkpoint as cp

    monkeypatch.setattr(cp, "checkpointed_bytes", lambda sc, ids: None)
    df = spark.range(50).selectExpr("id as src", "id % 3 as dst")
    out, ids = cp.tracked_checkpoint_partitioned(df, "dst", min_bytes=1)
    part = str(out._jdf.queryExecution().optimizedPlan().outputPartitioning())
    assert "hashpartitioning" not in part, part
    assert out.count() == 50
    cp.unpersist_rdds(spark.sparkContext, ids)


def test_pagerank_switch_e2e_forced_smj_matches_default_path(
    spark, monkeypatch
):
    """End-to-end contract of the r12 switch: with the threshold forced
    low and broadcast disabled (the forced-SMJ regime the switch
    exists for), pagerank runs through the preserved-partitioning
    checkpoint, leaks no blocks, and its ranks match the default-path
    ranks (same fixed-round arithmetic; only partial-sum order can
    differ, so equality is pinned to 1e-9)."""
    import hadoop_lab_spark.checkpoint as cp
    from hadoop_lab_spark.checkpoint import persistent_rdd_ids
    from hadoop_lab_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i % 17, (i * 3 + 1) % 23) for i in range(300)],
        "src bigint, dst bigint",
    ).distinct()
    baseline = {
        r["id"]: r["rank"] for r in pagerank(edges, iterations=3).collect()
    }
    monkeypatch.setattr(cp, "PARTITION_PRESERVE_MIN_BYTES", 1)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    before = persistent_rdd_ids(spark.sparkContext)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        switched_df = pagerank(edges, iterations=3)
        part = str(
            switched_df._jdf.queryExecution()
            .optimizedPlan()
            .outputPartitioning()
        )
        switched = {r["id"]: r["rank"] for r in switched_df.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert switched.keys() == baseline.keys()
    for k, v in baseline.items():
        assert abs(switched[k] - v) <= 1e-9 * max(1.0, abs(v)), (
            k, v, switched[k],
        )
    # the switched run's final ranks checkpoint stays pinned (the
    # returned frame references it); nothing else may remain
    leaked = persistent_rdd_ids(spark.sparkContext) - before
    from hadoop_lab_spark.checkpoint import unpersist_rdds

    unpersist_rdds(spark.sparkContext, leaked)
    assert len(leaked) <= 2, f"static/intermediate blocks leaked: {leaked}"


def test_pagerank_checkpoint_interval_is_result_invariant(spark, monkeypatch):
    """r12 optimization: the mid-loop checkpoint cadence is a pure
    lineage/scheduling knob — per-round (interval=1, the pre-r12 shape)
    and no-mid-loop (interval > K, the new default for the fixed-K=5
    bench lanes) must produce BIT-identical ranks: a checkpoint is a
    materialization barrier, never arithmetic. Also pins the checkpoint
    COUNT: with K < interval only the two static tables and the final
    ranks materialize (3 calls), so the 23%-measured win (fewer job
    barriers) cannot silently regress back to per-round."""
    import hadoop_lab_spark.operators.graph as graph_mod

    # The exact == below compares doubles across two DIFFERENT physical
    # plans (per-round LogicalRDD inputs vs one 5-round unrolled plan),
    # and float sum order inside groupBy(dst) is partition-layout
    # dependent — pin the layout so the equality is structural, not a
    # fixture-size accident (ADVICE r12): fixed shuffle width, AQE
    # runtime coalescing off for the duration of both runs.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_coalesce = spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.enabled", "true"
    )
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

    edges = spark.createDataFrame(
        [(i % 13, (i * 7 + 3) % 19) for i in range(200)],
        "src bigint, dst bigint",
    ).distinct()
    per_round = {
        r["id"]: r["rank"]
        for r in graph_mod.pagerank(
            edges, iterations=5, checkpoint_interval=1
        ).collect()
    }

    calls = {"n": 0}
    real_ck = graph_mod.tracked_checkpoint

    def counting_ck(df):
        calls["n"] += 1
        return real_ck(df)

    monkeypatch.setattr(graph_mod, "tracked_checkpoint", counting_ck)
    try:
        lazy_df = graph_mod.pagerank(edges, iterations=5)  # default interval 10
        lazy = {r["id"]: r["rank"] for r in lazy_df.collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", prev_coalesce
        )
    assert lazy == per_round  # bit-identical, not approx
    # nodes + final ranks go through tracked_checkpoint; esd goes
    # through tracked_checkpoint_partitioned (not patched here).
    assert calls["n"] == 2, f"expected 2 mid-loop-free checkpoints, got {calls['n']}"


def test_pagerank_checkpoint_interval_guard(spark):
    """ADVICE r12: checkpoint_interval=0 is a plausible spelling of
    'no mid-loop checkpoints' but would hit ZeroDivisionError in the
    cadence test; it (and negatives) must fail loudly instead. The
    supported spelling is any value > iterations."""
    import hadoop_lab_spark.operators.graph as graph_mod

    edges = spark.createDataFrame([(0, 1)], "src bigint, dst bigint")
    for bad in (0, -1):
        with pytest.raises(ValueError, match="checkpoint_interval"):
            graph_mod.pagerank(edges, iterations=2, checkpoint_interval=bad)


def test_cc_observe_convergence_metric_lands_and_matches_fallback(
    spark, monkeypatch
):
    """r13 (VERDICT r12 #3): the per-round convergence flag rides the
    checkpoint materialization as an observe() metric instead of a
    separate limit(1).count() job. Two contracts:

    1. the metric actually LANDS on this Spark version (every round
       resolves via the observation, never the fallback) — if eager
       localCheckpoint ever stops reporting to QueryExecutionListener,
       this fails loudly instead of silently paying the fallback job;
    2. labels are identical either way (fallback forced via
       monkeypatch), because the fallback is the pre-r13 explicit count
       over the same materialized checkpoint.
    """
    import hadoop_lab_spark.operators.graph as graph_mod

    node_ids = range(16)
    edge_pairs = [(i, i + 1) for i in range(15)]

    seen: list[int | None] = []
    real = graph_mod._observed_changed

    def recording(obs, timeout_s=graph_mod._OBSERVE_TIMEOUT_S):
        v = real(obs, timeout_s)
        seen.append(v)
        return v

    monkeypatch.setattr(graph_mod, "_observed_changed", recording)
    got_observed = _cc(spark, node_ids, edge_pairs)
    assert got_observed == {i: 0 for i in range(16)}
    assert seen and all(v is not None for v in seen), (
        f"observe() metric failed to land on some round: {seen} — the "
        "loop silently fell back to per-round count jobs"
    )

    monkeypatch.setattr(graph_mod, "_observed_changed", lambda *a, **k: None)
    got_fallback = _cc(spark, node_ids, edge_pairs)
    assert got_fallback == got_observed
