"""Hostile-skew stress suite (r3 verdict #1).

local[32]/sf0.1 cannot show what a pathological key does at cluster
scale, so these fixtures manufacture the pathology directly:

- events where ONE user owns ~30% of all rows (the hot reducer key),
- customers where ONE name-stem block owns ~30% of rows (the quadratic
  block in blocked entity resolution),
- documents where one LONG token rides boilerplate into ~30% of the
  corpus (the hot posting list that token length alone does not bound).

Each stressed query must (a) still match its DuckDB oracle on the
skewed data and (b) obey a PROVABLE per-task/per-group input bound —
asserted by computing the actual sub-group sizes the plan's salting or
capping produces, not by trusting the docstring.
"""

from __future__ import annotations

import math
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from hadoop_lab_spark.operators.sampling import hash_bucket
from hadoop_lab_spark.plans.pipeline import MAX_POSTINGS
from hadoop_lab_spark.plans.registry import REGISTRY, load_all_query_modules
from hadoop_lab_spark.testing import assert_matches_oracle

load_all_query_modules()

_TS0 = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in µs

HOT_USER = 1
N_HOT = 12_000
N_COLD_USERS = 200
N_COLD_PER_USER = 140  # 28_000 cold rows → hot share ≈ 30%
TYPES = ["view", "click", "purchase", "signup", "error"]


@pytest.fixture(scope="module")
def skewed_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("skewev")
    ids, ts, users, types, values = [], [], [], [], []
    eid = 0

    def add(user, i):
        nonlocal eid
        ids.append(eid)
        ts.append(_TS0 + (eid * 7_000_000))  # strictly increasing µs
        users.append(user)
        types.append(TYPES[(user * 31 + i) % len(TYPES)])
        # deterministic pseudo-random walk → nontrivial increasing runs
        values.append(float(((user * 7919 + i * 104729) % 10_000) / 10.0))
        eid += 1

    for i in range(N_HOT):
        add(HOT_USER, i)
    for u in range(2, 2 + N_COLD_USERS):
        for i in range(N_COLD_PER_USER):
            add(u, i)

    table = pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(values, pa.float64()),
            "props": pa.array(["{}"] * len(ids), pa.string()),
        }
    )
    pq.write_table(table, os.path.join(str(d), "events.parquet"))
    return str(d)


def _events_con(sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{os.path.join(sf_dir, 'events.parquet')}')"
    )
    return con


EVENT_STRESS_QUERIES = [
    "collect_types_per_user",
    "salted_collect_types_per_user",
    "user_longest_increasing_run",
    "user_longest_increasing_run_window",
    "sessions_per_user",
    # graph lanes: the hot user is a hub node (~30% of all hand-off
    # edges touch it) — the exact degree profile the degree-ordered
    # triangle orientation and the per-round PageRank groupBy must
    # survive without a hot reducer changing any value
    "pagerank_event_handoff",
    "triangle_count_handoff_graph",
]


@pytest.mark.parametrize("name", EVENT_STRESS_QUERIES)
def test_hot_user_correctness(spark, skewed_events_dir, name):
    """30%-of-table hot key: every grouped/collect/window lane must
    still match its oracle exactly (AQE may split, salting may fan out —
    none of it may change a single output value)."""
    con = _events_con(skewed_events_dir)
    try:
        spec = REGISTRY[name]
        assert_matches_oracle(
            spec.fn(spark, skewed_events_dir), con, spec.oracle, name=f"skew:{name}"
        )
    finally:
        con.close()


def test_salted_collect_level1_bound_holds(spark, skewed_events_dir):
    """The salted collect's level-1 state bound must be REAL: with
    salt_on=event_id (row-unique) and 16 buckets, no (user, salt)
    sub-group may exceed ~|hot|/16. This is the assertion that caught
    value-hash salting: event_type has 5 distinct values, so the old
    salt gave ≥ |hot|/5 sub-groups (2400 rows) — 3.2× the honest bound."""
    from hadoop_lab_spark.sources import load_table

    events = load_table(spark, skewed_events_dir, "events")
    buckets = 16
    sizes = (
        events.groupBy("user_id", hash_bucket(F.col("event_id"), buckets).alias("s"))
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    fair = math.ceil(N_HOT / buckets)
    assert sizes <= fair * 1.5, (
        f"level-1 sub-group of {sizes} rows exceeds 1.5× the fair share "
        f"{fair} — salting is not spreading the hot key"
    )
    # and the degenerate value-hash salt really is degenerate (documents
    # why salt_on exists): 5 event types → at most 5 non-empty buckets
    degen = (
        events.filter(F.col("user_id") == HOT_USER)
        .groupBy(hash_bucket(F.col("event_type"), buckets).alias("s"))
        .count()
    )
    assert degen.count() <= len(TYPES)


# --- hot name-stem block: quadratic verify stage ---------------------------

HOT_BLOCK = 600
N_COLD_CUST = 1400


@pytest.fixture(scope="module")
def skewed_customer_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("skewcust")
    names, keys = [], []
    # one stem owns 30%: same prefix, only the last 2 chars vary (the
    # blocking key is name minus its last 2 chars)
    for i in range(HOT_BLOCK):
        names.append(f"Acme Global Corporation {chr(65 + i // 26)}{chr(65 + i % 26)}")
        keys.append(i)
    for i in range(N_COLD_CUST):
        names.append(f"Distinct Trader {i:06d} {chr(65 + i % 26)}{chr(65 + (i * 7) % 26)}")
        keys.append(HOT_BLOCK + i)
    table = pa.table(
        {
            "c_custkey": pa.array(keys, pa.int64()),
            "c_name": pa.array(names, pa.string()),
        }
    )
    pq.write_table(table, os.path.join(str(d), "customer.parquet"))
    return str(d)


def test_hot_block_fuzzy_resolution_correct_and_block_bounded(
    spark, skewed_customer_dir
):
    """Blocked entity resolution with one block owning 30% of rows: the
    verify stage is |block|² pairs BY CONTRACT (output stays per-block
    aggregates, AQE skew-split distributes the join compute), so the
    assertion is correctness + the pair count being exactly the block's
    n·(n-1)/2 — any other number means the blocking key leaked rows."""
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW customer AS SELECT * FROM read_parquet("
            f"'{os.path.join(skewed_customer_dir, 'customer.parquet')}')"
        )
        spec = REGISTRY["customer_name_fuzzy_blocks"]
        df = spec.fn(spark, skewed_customer_dir)
        assert_matches_oracle(
            df, con, spec.oracle, name="skew:customer_name_fuzzy_blocks"
        )
        hot = [r for r in df.collect() if r.n_candidates == HOT_BLOCK * (HOT_BLOCK - 1) // 2]
        assert len(hot) == 1, "expected exactly one hot block"
        # suffixes differ in ≤2 chars → every pair is a fuzzy match
        assert hot[0].n_matches == hot[0].n_candidates
    finally:
        con.close()


# --- hot long token: posting list the length filter does not bound ---------

HOT_TOKEN = "pervasiveboilerplate"
RARE_TOKENS = ["qraresigil01", "qraresigil02", "qraresigil03"]
N_DOCS = 2000


@pytest.fixture(scope="module")
def skewed_docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("skewdoc")
    texts = []
    for i in range(N_DOCS):
        words = [f"w{(i * 13 + j) % 97}" for j in range(8)]
        if i % 10 < 3:  # 30% of docs carry the hot long token
            words.append(HOT_TOKEN)
        if i < len(RARE_TOKENS):  # a few genuinely rare long tokens
            words.append(RARE_TOKENS[i])
        texts.append(" ".join(words))
    table = pa.table(
        {
            "doc_id": pa.array(range(N_DOCS), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(table, os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_inverted_index_df_cap_bounds_hot_token(spark, skewed_docs_dir):
    """A 20-char token in 30% of the corpus defeats the length-only
    rarity proxy — the df cap must (a) keep it out of the index on both
    engines and (b) bound every surviving posting list by contract."""
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{os.path.join(skewed_docs_dir, 'documents.parquet')}')"
        )
        spec = REGISTRY["inverted_index_rare_tokens"]
        df = spec.fn(spark, skewed_docs_dir)
        assert_matches_oracle(
            df, con, spec.oracle, name="skew:inverted_index_rare_tokens"
        )
        rows = {r.tok: r for r in df.collect()}
        assert HOT_TOKEN not in rows, "df cap failed: hot token was indexed"
        for t in RARE_TOKENS:
            assert rows[t].df_ == 1
        assert rows, "rare tokens must survive the cap"
        assert all(r.df_ <= MAX_POSTINGS for r in rows.values())
    finally:
        con.close()


def test_fine_blocking_collapses_hot_block_candidate_mass(
    spark, skewed_customer_dir
):
    """The composite twin under the SAME 30%-hot-stem fixture: candidate
    mass for the hot stem must drop from B(B-1)/2 to the
    single-tail-substitution pair count (pigeonhole bound ~B²/|alphabet|),
    with every single-substitution pair still found — the measured
    block-size bound VERDICT r4 #2 asks for."""
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW customer AS SELECT * FROM read_parquet("
            f"'{os.path.join(skewed_customer_dir, 'customer.parquet')}')"
        )
        spec = REGISTRY["customer_name_fuzzy_blocks_fine"]
        df = spec.fn(spark, skewed_customer_dir)
        assert_matches_oracle(
            df, con, spec.oracle, name="skew:customer_name_fuzzy_blocks_fine"
        )
        # ground truth: hot tails are (chr(i//26), chr(i%26)) for i<600 —
        # candidates are exactly the pairs differing in ONE tail position
        tails = [(i // 26, i % 26) for i in range(HOT_BLOCK)]
        expected = sum(
            1
            for i in range(HOT_BLOCK)
            for j in range(i + 1, HOT_BLOCK)
            if (tails[i][0] == tails[j][0]) != (tails[i][1] == tails[j][1])
        )
        rows = {r.blk: r for r in df.collect()}
        hot = rows["Acme Global Corporation "]
        assert hot.n_candidates == expected
        assert hot.n_matches == expected  # 1-char diff => lev 1 <= 2
        coarse_mass = HOT_BLOCK * (HOT_BLOCK - 1) // 2
        assert hot.n_candidates < coarse_mass / 12  # ~|alphabet|/2 collapse
    finally:
        con.close()


# --- hub ingest batch: 30% of the delta near-dups ONE base doc --------------

N_INGEST_DOCS = 300


@pytest.fixture(scope="module")
def hub_ingest_dir(tmp_path_factory):
    """Delta batch (doc_id % 5 == 0) where ~30% of delta docs are
    near-copies of ONE base document — the star cluster an ingest of
    syndicated/boilerplate content produces. The rest of the corpus is
    pairwise-disjoint vocabulary (no accidental shingle collisions)."""
    d = tmp_path_factory.mktemp("hubingest")
    hub_words = [f"hubword{k}" for k in range(15)]
    ids, texts = [], []
    for i in range(N_INGEST_DOCS):
        ids.append(i)
        if i == 1:  # the base hub doc
            texts.append(" ".join(hub_words))
        elif i % 5 == 0 and (i // 5) % 3 == 0:  # 1/3 of the delta: hub dups
            texts.append(" ".join(hub_words[:-1] + [f"tail{i}"]))
        else:
            texts.append(" ".join(f"doc{i}w{j}" for j in range(12)))
    table = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(table, os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_ingest_merge_hub_cluster_resolves_to_one_keeper(spark, hub_ingest_dir):
    from hadoop_lab_spark.plans.registry import REGISTRY
    from hadoop_lab_spark.testing import assert_matches_oracle

    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{os.path.join(hub_ingest_dir, 'documents.parquet')}')"
        )
        spec = REGISTRY["dedup_ingest_merge"]
        df = spec.fn(spark, hub_ingest_dir)
        assert_matches_oracle(df, con, spec.oracle, name="skew:dedup_ingest_merge")
        rows = {r.doc_id: r for r in df.collect()}
        hub_deltas = [
            i
            for i in range(N_INGEST_DOCS)
            if i % 5 == 0 and (i // 5) % 3 == 0 and i != 1
        ]
        # doc 0 is a hub dup and the smallest id in the cluster: it is
        # the keeper; every other hub delta merges into 0 (transitively
        # through the base hub doc 1)
        assert rows[0].action == "insert" and rows[0].keeper == 0
        for i in hub_deltas:
            if i == 0:
                continue
            assert rows[i].action == "merge" and rows[i].keeper == 0, i
        # non-hub delta docs are singletons: insert, keeper = self
        for i in range(N_INGEST_DOCS):
            if i % 5 == 0 and i not in hub_deltas:
                assert rows[i].action == "insert" and rows[i].keeper == i, i
    finally:
        con.close()


# ---------------------------------------------------------------------------
# Prefix-filter set-similarity join: a universal boilerplate SHINGLE must
# never enter any prefix, so candidate mass stays linear, not n²
# ---------------------------------------------------------------------------
N_SS_DOCS = 1200


@pytest.fixture(scope="module")
def boilerplate_docs_dir(tmp_path_factory):
    """Every doc ENDS with the same 4-word footer, so the shingles
    "end of shared" / "of shared footer" have df = n (the hot-join-key
    nightmare for a naive shingle join); the 11 leading words are
    doc-unique. Every 300th doc is a planted near-dup of its
    predecessor: first 10 unique words copied, one replaced —
    10 shared shingles / union 16 → jaccard 0.625 ≥ 0.6."""
    d = tmp_path_factory.mktemp("ssjoinskew")

    def alpha(n: int) -> str:
        s = ""
        n += 1
        while n:
            n, r = divmod(n - 1, 26)
            s = chr(97 + r) + s
        return s

    footer = ["end", "of", "shared", "footer"]
    texts = []
    for i in range(N_SS_DOCS):
        words = [f"u{alpha(i)}t{alpha(j)}" for j in range(11)] + footer
        if i % 300 == 1:  # planted near-dup of the previous doc
            prev = i - 1
            words = (
                [f"u{alpha(prev)}t{alpha(j)}" for j in range(10)]
                + [f"u{alpha(i)}own"]
                + footer
            )
        texts.append(" ".join(words))
    table = pa.table(
        {
            "doc_id": pa.array(range(N_SS_DOCS), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(table, os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_ssjoin_prefix_excludes_universal_shingle_and_stays_linear(
    spark, boilerplate_docs_dir
):
    """(a) the lane still matches its exhaustive oracle on the hostile
    corpus and returns exactly the planted near-dup pairs; (b)
    recomputing the prefix rule in pure Python, the universal footer
    shingles are in NO document's prefix and the candidate-pair mass is
    linear in n — the structural property that lets the exact join
    survive a corpus where a naive shingle join would build one n²/2
    bucket."""
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{os.path.join(boilerplate_docs_dir, 'documents.parquet')}')"
        )
        spec = REGISTRY["ssjoin_prefix_jaccard"]
        df = spec.fn(spark, boilerplate_docs_dir)
        assert_matches_oracle(df, con, spec.oracle, name="skew:ssjoin")
        got = {(r.doc_a, r.doc_b) for r in df.collect()}
        planted = {(i - 1, i) for i in range(N_SS_DOCS) if i % 300 == 1}
        assert got == planted
        rows = con.execute("SELECT doc_id, text FROM documents").fetchall()
    finally:
        con.close()

    # Independent Python model of the prefix rule (df ASC, shingle ASC):
    t = 0.6
    sets = {}
    for did, text in rows:
        w = text.split(" ")
        sets[did] = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
    dfreq = {}
    for s in sets.values():
        for g in s:
            dfreq[g] = dfreq.get(g, 0) + 1
    assert dfreq["end of shared"] == N_SS_DOCS  # the universal shingle
    prefixes = {}
    for did, s in sets.items():
        ordered = sorted(s, key=lambda g: (dfreq[g], g))
        plen = len(s) - math.ceil(t * len(s)) + 1
        prefixes[did] = set(ordered[:plen])
    universal = {g for g, c in dfreq.items() if c == N_SS_DOCS}
    assert all(not (p & universal) for p in prefixes.values())
    by_g = {}
    for did, p in prefixes.items():
        for g in p:
            by_g.setdefault(g, []).append(did)
    n_candidates = sum(
        len(ds) * (len(ds) - 1) // 2 for ds in by_g.values() if len(ds) > 1
    )
    assert n_candidates <= 3 * N_SS_DOCS, n_candidates


# ---------------------------------------------------------------------------
# Hub node in the HAND-OFF GRAPH itself (VERDICT r5 #6): the hot-user
# events fixture above yields a near-chain graph, so the graph lanes need
# their own pathology — a node touching ~50% of all edges (> the 30% bar)
# ---------------------------------------------------------------------------
HUB_LEAVES = 60  # hub degree H; graph = star(0; 1..H) + path 1-2-...-H


@pytest.fixture(scope="module")
def hub_graph_events_dir(tmp_path_factory):
    """Events whose hand-off graph is a hub star: the user sequence
    0,1,2, 0,2,3, 0,3,4, ... inside ONE (event_type, day) window
    produces undirected edges {0,k} for k=1..H plus the leaf path
    {k,k+1} — deg(hub)=H while every leaf deg<=3, the hub touches
    H/(2H-1) ~= 50% of all edges, and the graph holds exactly H-1
    triangles (0,k,k+1)."""
    d = tmp_path_factory.mktemp("hubgraph")
    seq: list[int] = []
    for k in range(1, HUB_LEAVES):
        seq += [0, k, k + 1]
    ids = list(range(len(seq)))
    table = pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array([_TS0 + i * 7_000_000 for i in ids], pa.timestamp("us")),
            "user_id": pa.array(seq, pa.int64()),
            "event_type": pa.array(["view"] * len(seq), pa.string()),
            "value": pa.array([float(i % 100) for i in ids], pa.float64()),
            "props": pa.array(["{}"] * len(seq), pa.string()),
        }
    )
    pq.write_table(table, os.path.join(str(d), "events.parquet"))
    return str(d)


HUB_GRAPH_QUERIES = [
    "pagerank_event_handoff",
    "pagerank_weighted_handoff",
    "triangle_count_handoff_graph",
]


@pytest.mark.parametrize("name", HUB_GRAPH_QUERIES)
def test_hub_graph_correctness(spark, hub_graph_events_dir, name):
    """Both PageRank lanes and the triangle count must match their
    oracles exactly on a graph where one node owns half the edges —
    skew may move compute, never values."""
    con = _events_con(hub_graph_events_dir)
    try:
        spec = REGISTRY[name]
        assert_matches_oracle(
            spec.fn(spark, hub_graph_events_dir), con, spec.oracle, name=f"hub:{name}"
        )
    finally:
        con.close()


def test_triangle_orientation_zeroes_hub_wedge_mass(spark, hub_graph_events_dir):
    """The degree-ordered orientation's bound, PROVEN on the hub graph
    rather than argued: the hub has the strictly maximal (degree, id)
    key, so every incident edge points AT it and it generates ZERO
    wedges — total oriented wedge mass stays linear in m while a naive
    wedge join would build deg(hub)² /2 pairs at the hub alone. The
    count itself must still be exact (= H-1 planted triangles)."""
    from collections import Counter

    spec = REGISTRY["triangle_count_handoff_graph"]
    [[n_triangles]] = spec.fn(spark, hub_graph_events_dir).collect()
    # hand-offs yield {0,k} for k=1..H-1 (no {0,H}: the walk never
    # returns to the hub after the last leaf) plus the leaf path, so
    # triangles (0,k,k+1) exist for k=1..H-2
    assert n_triangles == HUB_LEAVES - 2

    # Independent Python model of the orientation rule the plan uses
    # (lower (deg, id) endpoint -> higher; wedges at the low endpoint):
    und = {(0, k) for k in range(1, HUB_LEAVES)} | {
        (k, k + 1) for k in range(1, HUB_LEAVES)
    }
    deg: Counter = Counter()
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    assert deg[0] == HUB_LEAVES - 1 and deg[0] >= 0.3 * len(und)  # a real hub
    out: Counter = Counter()
    for a, b in und:
        lo = a if (deg[a], a) < (deg[b], b) else b
        out[lo] += 1
    assert out[0] == 0, "hub must generate no wedges"
    wedge_mass = sum(d * (d - 1) // 2 for d in out.values())
    naive_hub_mass = deg[0] * (deg[0] - 1) // 2
    m = len(und)
    assert wedge_mass <= 2 * m, wedge_mass  # linear here; O(m^1.5) in general
    assert naive_hub_mass >= 25 * wedge_mass, (
        "orientation should collapse the hub's quadratic wedge mass"
    )


def test_pagerank_round_aggregate_combines_map_side(spark):
    """PageRank's per-round groupBy(dst) is the skew point on power-law
    graphs (a hub's in-degree ~ |E|). The skew answer is partial
    aggregation: each map task emits ONE partial sum per dst, so the
    hub's reduce task receives at most #tasks rows. Pin the partial_sum
    BELOW the dst exchange so a refactor can't silently reintroduce the
    O(in-degree) reducer."""
    from pyspark.sql import functions as SF

    from hadoop_lab_spark.operators.graph import _pagerank_round

    edges = spark.createDataFrame(
        [(i, 0, 1.0) for i in range(1, 9)], "src bigint, dst bigint, _w double"
    )
    deg = edges.groupBy("src").agg(SF.sum("_w").alias("deg"))
    esd = edges.join(deg, "src").select("src", "dst", "_w", "deg")
    nodes = (
        edges.select(SF.col("src").alias("id"))
        .union(edges.select(SF.col("dst").alias("id")))
        .distinct()
    )
    ranks = nodes.select("id", SF.lit(1.0).alias("rank"))
    df = _pagerank_round(esd, nodes, ranks, 0.85)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    import re as _re

    assert "partial_sum" in plan, plan[:1200]
    # formatted explain lists exchange keys in the node-details section
    # ("Arguments: hashpartitioning(dst#N, ...)"), not inline in the tree
    assert _re.search(r"hashpartitioning\(dst", plan), plan[-2000:]


# --- degenerate ingest batches: empty base / empty delta --------------------


def _write_docs(tmp_path, ids, texts):
    table = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(table, os.path.join(str(tmp_path), "documents.parquet"))
    return str(tmp_path)


def test_ingest_merge_first_ingest_into_empty_corpus(spark, tmp_path):
    """First-ever ingest: every doc is delta (doc_id % 5 == 0), the base
    corpus is EMPTY. The probe's union target degenerates to delta-only
    bands and CC must still classify every delta doc — the bootstrap
    path of a brand-new corpus, easy to break with an eager checkpoint
    on an empty frame."""
    from hadoop_lab_spark.plans.registry import REGISTRY
    from hadoop_lab_spark.testing import assert_matches_oracle

    words = [f"w{k}" for k in range(12)]
    ids = [0, 5, 10, 15]
    texts = [
        " ".join(words),
        " ".join(words[:-1] + ["tail"]),  # near-dup of doc 0
        " ".join(f"b{j}" for j in range(12)),
        " ".join(f"c{j}" for j in range(12)),
    ]
    d = _write_docs(tmp_path, ids, texts)
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{os.path.join(d, 'documents.parquet')}')"
        )
        spec = REGISTRY["dedup_ingest_merge"]
        df = spec.fn(spark, d)
        assert_matches_oracle(df, con, spec.oracle, name="empty-base:ingest")
        rows = {r.doc_id: r.action for r in df.collect()}
        assert rows[0] == "insert" and rows[5] == "merge"
        assert rows[10] == "insert" and rows[15] == "insert"
    finally:
        con.close()


def test_ingest_merge_empty_delta_batch(spark, tmp_path):
    """An ingest tick with NO new documents (no doc_id % 5 == 0): the
    lane must return an empty frame, not crash in the band join or CC
    on zero-row checkpoints."""
    from hadoop_lab_spark.plans.registry import REGISTRY
    from hadoop_lab_spark.testing import assert_matches_oracle

    ids = [1, 2, 3, 4, 6]
    texts = [" ".join(f"d{i}w{j}" for j in range(12)) for i in ids]
    d = _write_docs(tmp_path, ids, texts)
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{os.path.join(d, 'documents.parquet')}')"
        )
        spec = REGISTRY["dedup_ingest_merge"]
        df = spec.fn(spark, d)
        assert df.count() == 0
        assert_matches_oracle(df, con, spec.oracle, name="empty-delta:ingest")
    finally:
        con.close()
