"""Adversarial-corpus differential: every documents-only query vs its
oracle on pathological inputs the generated testdata never contains.

The sf* corpora are well-behaved (non-null ASCII prose). This suite
rebuilds `documents.parquet` with the hostile cases — NULL text, empty
and whitespace-only strings, exact duplicates, CJK/emoji/combining
marks, a 2000-char single token, tab/form-feed separators, a BOM — and
re-runs the full Spark-vs-DuckDB differential on it. Any engine-pair
divergence on edge semantics (null propagation through split/size,
unicode length units, regex classes) surfaces here instead of in
production on the one weird shard of a 100 TB corpus.
"""

from __future__ import annotations

import os
import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import duckdb

from hadoop_lab_spark.plans.registry import REGISTRY, load_all_query_modules
from hadoop_lab_spark.sources.tables import TABLES
from hadoop_lab_spark.testing import assert_matches_oracle

load_all_query_modules()

_DOCS = [
    (0, None, None, "null-text", None),
    (1, "", "en", "empty", 0),
    (2, "   \t  ", "en", "ws-only", 6),
    (3, "a", "en", "single-char", 1),
    (4, "the the the the the the", "en", "repeated", 23),
    (5, "火车站 在 哪里", "zh", "cjk", 8),
    (6, "café olé \U0001f600 ok", "en", "unicode-combining", 11),
    (7, "x" * 2000, "en", "long-token", 2000),
    (8, "identical twin document body", "en", "dup-a", 28),
    (9, "identical twin document body", "en", "dup-b", 28),
    (10, "alpha\tbeta\x0cgamma\rdelta", "en", "exotic-ws", 22),
    (11, "Contact john.doe@example.com or call 555-123-4567 now", "en", "pii", 54),
    (12, "﻿bom prefixed text", "en", "bom", 19),
    (13, "data query table row join spark", "en", "keywords", 31),
]


@pytest.fixture(scope="module")
def adversarial_sf_dir(tmp_path_factory):
    """A fake sf dir holding ONLY the adversarial documents table (the
    selected queries reference no other table)."""
    d = tmp_path_factory.mktemp("advcorpus")
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in _DOCS], pa.int64()),
            "text": pa.array([r[1] for r in _DOCS], pa.string()),
            "lang": pa.array([r[2] for r in _DOCS], pa.string()),
            "source": pa.array([r[3] for r in _DOCS], pa.string()),
            "n_chars": pa.array([r[4] for r in _DOCS], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(str(d), "documents.parquet"))
    return str(d)


def _documents_only_queries() -> list[str]:
    """Registry queries whose oracle reads documents and nothing else."""
    others = [t for t in TABLES if t != "documents"]
    picked = []
    for name, spec in REGISTRY.items():
        if not spec.oracle or "streaming" in spec.tags:
            continue
        sql = spec.oracle.lower()
        if not re.search(r"\bdocuments\b", sql):
            continue
        if any(re.search(rf"\b{t}\b", sql) for t in others):
            continue
        picked.append(name)
    # regexp_sampler reads only documents, but its oracle mentions
    # "customer|supplier" INSIDE a regex literal, which the other-table
    # textual exclusion above misreads as a table reference — without
    # this pin it would be the one query no adversarial sweep ever runs.
    if "regexp_sampler" not in picked:
        picked.append("regexp_sampler")
    return sorted(picked)


QUERIES = _documents_only_queries()


def test_selection_is_substantial():
    """The sweep must keep covering the text/dedup family — if a refactor
    renames tables and this list collapses, fail loudly."""
    assert len(QUERIES) >= 12, QUERIES
    assert "dedup_exact" in QUERIES and "text_stats" in QUERIES


# --- hostile events: NULL keys, equal-ts ties, session-gap boundaries ---

_TS0 = 1_704_067_200_000_000_000  # 2024-01-01T00:00:00Z in ns


def _ts(seconds: int) -> int:
    return _TS0 + seconds * 1_000_000_000


_EVENTS: list[tuple] = [
    # (event_id, ts_ns, user_id, event_type, value, props)
    (0, _ts(0), 1, "signup", 1.0, '{"k": 1}'),
    (1, _ts(0), 1, "purchase", 2.0, '{"k": 2}'),  # purchase ts == signup ts (as-of tie)
    (2, _ts(10), 1, "purchase", 3.0, '{"k": 3}'),
    (3, _ts(10), 1, "purchase", 4.0, '{"k": 4}'),  # duplicate (user, ts) purchases
    (4, _ts(20), None, "click", 5.0, '{"k": 5}'),  # NULL user_id
    (5, _ts(30), 2, None, 6.0, '{"k": 6}'),  # NULL event_type
    (6, _ts(40), 2, "view", None, '{"k": 7}'),  # NULL value
    (7, _ts(50), 2, "view", 8.0, None),  # NULL props
    (8, _ts(1800), 2, "click", 9.0, '{"k": 9}'),  # exactly at a 30-min session gap
    (9, _ts(86400 * 400), 3, "purchase", 10.0, '{"k": 10}'),  # far-future day
    (10, _ts(60), 3, "signup", 11.0, '{"k": 11}'),
    (11, _ts(60), 3, "signup", 12.0, '{"k": 12}'),  # duplicate signup ts (as-of argmax)
    (12, _ts(70), 3, "purchase", 13.0, '{"k": 13}'),
    (13, _ts(80), 4, "error", 0.0, '{"k": 0}'),
    (14, _ts(90), 4, "error", 0.0, '{"k": 0}'),  # count tie error-vs-view per day
    (15, _ts(100), 4, "view", 0.5, '{"k": 1}'),
    (16, _ts(110), 4, "view", 0.5, '{"k": 1}'),
    # ADVICE r3 lanes: NULL ts (must not mint NULL days/cohorts or NULL
    # window sort keys) and NaN value (run/agg contracts exclude NaN)
    (17, None, 5, "view", 1.0, '{"k": 1}'),  # NULL ts
    (18, _ts(120), 5, "view", float("nan"), '{"k": 1}'),  # NaN value
    (19, _ts(130), 5, "view", 2.0, '{"k": 2}'),
]


@pytest.fixture(scope="module")
def adversarial_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("advevents")
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in _EVENTS], pa.int64()),
            "ts": pa.array([r[1] for r in _EVENTS], pa.timestamp("ns")),
            "user_id": pa.array([r[2] for r in _EVENTS], pa.int64()),
            "event_type": pa.array([r[3] for r in _EVENTS], pa.string()),
            "value": pa.array([r[4] for r in _EVENTS], pa.float64()),
            "props": pa.array([r[5] for r in _EVENTS], pa.string()),
        }
    )
    pq.write_table(table, os.path.join(str(d), "events.parquet"))
    return str(d)


def _events_only_queries() -> list[str]:
    others = [t for t in TABLES if t != "events"]
    picked = []
    for name, spec in REGISTRY.items():
        if not spec.oracle or "streaming" in spec.tags:
            continue
        sql = spec.oracle.lower()
        if not re.search(r"\bevents\b", sql):
            continue
        if any(re.search(rf"\b{t}\b", sql) for t in others):
            continue
        picked.append(name)
    return sorted(picked)


EVENT_QUERIES = _events_only_queries()


def test_event_selection_is_substantial():
    assert len(EVENT_QUERIES) >= 6, EVENT_QUERIES
    assert "asof_purchase_last_signup" in EVENT_QUERIES


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_adversarial_events_match_oracle(spark, adversarial_events_dir, name):
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM read_parquet("
            f"'{os.path.join(adversarial_events_dir, 'events.parquet')}')"
        )
        spec = REGISTRY[name]
        df = spec.fn(spark, adversarial_events_dir)
        assert_matches_oracle(df, con, spec.oracle, name=f"adversarial-ev:{name}")
    finally:
        con.close()


# --- hostile orders: NULL group keys (rollup ambiguity), NULL measures ---

_ORD_TS0 = 1_704_067_200_000  # 2024-01-01 in ms

_ORDERS: list[tuple] = [
    # (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate_ms, o_orderpriority)
    (1, 10, "F", 100.10, _ORD_TS0, "1-URGENT"),
    (2, 10, "O", 200.25, _ORD_TS0 + 86_400_000, "1-URGENT"),
    (3, 11, "F", 300.50, _ORD_TS0, None),  # NULL priority: collides with
    (4, 11, None, 400.75, _ORD_TS0, "2-HIGH"),  # rollup-generated NULLs
    (5, 12, "P", None, _ORD_TS0, "2-HIGH"),  # NULL measure in sums
    (6, 12, "P", -50.00, _ORD_TS0, "3-MEDIUM"),  # negative money
    (7, None, "O", 0.0, _ORD_TS0, "3-MEDIUM"),  # NULL custkey, zero price
    (8, 13, "F", 100.10, None, "1-URGENT"),  # NULL date (year buckets)
    (9, 13, "F", 0.01, _ORD_TS0 + 2 * 86_400_000, "5-LOW"),
    (10, 14, "O", 99999999.99, _ORD_TS0, "5-LOW"),  # large money, cent-exact
]


@pytest.fixture(scope="module")
def adversarial_orders_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("advorders")
    table = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in _ORDERS], pa.int64()),
            "o_custkey": pa.array([r[1] for r in _ORDERS], pa.int64()),
            "o_orderstatus": pa.array([r[2] for r in _ORDERS], pa.string()),
            "o_totalprice": pa.array([r[3] for r in _ORDERS], pa.float64()),
            "o_orderdate": pa.array([r[4] for r in _ORDERS], pa.timestamp("ms")),
            "o_orderpriority": pa.array([r[5] for r in _ORDERS], pa.string()),
        }
    )
    pq.write_table(table, os.path.join(str(d), "orders.parquet"))
    return str(d)


def _orders_only_queries() -> list[str]:
    others = [t for t in TABLES if t != "orders"]
    picked = []
    for name, spec in REGISTRY.items():
        if not spec.oracle or "streaming" in spec.tags:
            continue
        # storage demos write scratch dirs per run — covered elsewhere,
        # and their value here is nil (pure roundtrips)
        if "storage" in spec.tags or "format" in spec.tags:
            continue
        sql = spec.oracle.lower()
        if not re.search(r"\borders\b", sql):
            continue
        if any(re.search(rf"\b{t}\b", sql) for t in others):
            continue
        picked.append(name)
    return sorted(picked)


ORDER_QUERIES = _orders_only_queries()


def test_order_selection_is_substantial():
    assert len(ORDER_QUERIES) >= 8, ORDER_QUERIES
    assert "orders_rollup" in ORDER_QUERIES or "orders_grouping_sets" in ORDER_QUERIES


@pytest.mark.parametrize("name", ORDER_QUERIES)
def test_adversarial_orders_match_oracle(spark, adversarial_orders_dir, name):
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW orders AS SELECT * FROM read_parquet("
            f"'{os.path.join(adversarial_orders_dir, 'orders.parquet')}')"
        )
        spec = REGISTRY[name]
        df = spec.fn(spark, adversarial_orders_dir)
        assert_matches_oracle(df, con, spec.oracle, name=f"adversarial-ord:{name}")
    finally:
        con.close()


# --- hostile lineitem: NULL dates/measures, zero/negative quantities ---

_LI_TS0 = 1_704_067_200_000  # 2024-01-01 in ms

_LINEITEMS: list[tuple] = [
    # (okey, pkey, skey, lineno, qty, price, disc, tax, rflag, lstatus, ship_ms)
    (1, 1, 1, 1, 10.0, 1000.00, 0.05, 0.02, "N", "O", _LI_TS0),
    (1, 2, 1, 2, 0.0, 500.00, 0.0, 0.0, "N", "O", _LI_TS0),  # zero qty
    (2, 1, 2, 1, None, 750.25, 0.10, 0.01, "R", "F", _LI_TS0),  # NULL qty
    (2, 2, 2, 2, 5.0, None, 0.10, 0.01, "R", "F", _LI_TS0),  # NULL price
    (3, 3, 1, 1, 3.0, 300.00, None, 0.02, "A", "F", _LI_TS0),  # NULL discount
    (3, 3, 1, 2, -2.0, 100.00, 0.0, 0.0, "A", "F", _LI_TS0),  # negative qty (return)
    (4, 1, 3, 1, 7.0, 99.99, 1.0, 0.0, "N", "O", None),  # NULL shipdate, 100% disc
    (4, 2, 3, 2, 7.0, 99.99, 0.5, 0.08, None, None, _LI_TS0 + 86_400_000),  # NULL flags
    (5, 4, 4, 1, 1.0, 0.01, 0.0, 0.0, "R", "F", _LI_TS0 + 365 * 86_400_000),
]


@pytest.fixture(scope="module")
def adversarial_lineitem_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("advlineitem")
    table = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in _LINEITEMS], pa.int64()),
            "l_partkey": pa.array([r[1] for r in _LINEITEMS], pa.int64()),
            "l_suppkey": pa.array([r[2] for r in _LINEITEMS], pa.int64()),
            "l_linenumber": pa.array([r[3] for r in _LINEITEMS], pa.int32()),
            "l_quantity": pa.array([r[4] for r in _LINEITEMS], pa.float64()),
            "l_extendedprice": pa.array([r[5] for r in _LINEITEMS], pa.float64()),
            "l_discount": pa.array([r[6] for r in _LINEITEMS], pa.float64()),
            "l_tax": pa.array([r[7] for r in _LINEITEMS], pa.float64()),
            "l_returnflag": pa.array([r[8] for r in _LINEITEMS], pa.string()),
            "l_linestatus": pa.array([r[9] for r in _LINEITEMS], pa.string()),
            "l_shipdate": pa.array([r[10] for r in _LINEITEMS], pa.timestamp("ms")),
        }
    )
    pq.write_table(table, os.path.join(str(d), "lineitem.parquet"))
    return str(d)


def _lineitem_only_queries() -> list[str]:
    others = [t for t in TABLES if t != "lineitem"]
    picked = []
    for name, spec in REGISTRY.items():
        if not spec.oracle or "streaming" in spec.tags:
            continue
        sql = spec.oracle.lower()
        if not re.search(r"\blineitem\b", sql):
            continue
        if any(re.search(rf"\b{t}\b", sql) for t in others):
            continue
        picked.append(name)
    return sorted(picked)


LINEITEM_QUERIES = _lineitem_only_queries()


def test_lineitem_selection_is_substantial():
    assert len(LINEITEM_QUERIES) >= 3, LINEITEM_QUERIES


@pytest.mark.parametrize("name", LINEITEM_QUERIES)
def test_adversarial_lineitem_match_oracle(spark, adversarial_lineitem_dir, name):
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW lineitem AS SELECT * FROM read_parquet("
            f"'{os.path.join(adversarial_lineitem_dir, 'lineitem.parquet')}')"
        )
        spec = REGISTRY[name]
        df = spec.fn(spark, adversarial_lineitem_dir)
        assert_matches_oracle(df, con, spec.oracle, name=f"adversarial-li:{name}")
    finally:
        con.close()


# --- hostile embeddings: zero vector, NULL, huge/tiny magnitudes, dups ---

_DIM = 64


def _vec(seed: int) -> list[float]:
    return [(((seed * 31 + i * 7) % 13) - 6) / 10.0 for i in range(_DIM)]


_EMBS: list[tuple[int, list[float] | None, int]] = [
    (0, [0.0] * _DIM, 0),  # zero vector AS A QUERY (cosine = 0/0 = NaN)
    (1, _vec(1), 1),
    (2, [1e30] * _DIM, 2),  # dot overflows to +inf
    (3, [1e-30] * _DIM, 3),  # norm underflows toward 0
    (4, None, 0),  # NULL embedding
    (5, _vec(5), 1),
    (6, _vec(5), 2),  # exact duplicate of 5 (cosine 1.0 pair)
    (7, [-x for x in _vec(1)], 3),  # antipode of 1 (cosine -1.0)
    # NULL elements INSIDE a vector (ADVICE r3): partial-NULL vector
    # must contribute its partial norm identically on both engines,
    # all-NULL vector must be excluded entirely (not NULL-poison aggs)
    (16, [None if i % 4 == 0 else x for i, x in enumerate(_vec(16))], 0),
    (17, [None] * _DIM, 1),  # every element NULL
] + [(i, _vec(i), i % 4) for i in range(8, 16)]


@pytest.fixture(scope="module")
def adversarial_emb_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("advembs")
    table = pa.table(
        {
            "vec_id": pa.array([r[0] for r in _EMBS], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in _EMBS], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in _EMBS], pa.int32()),
        }
    )
    pq.write_table(table, os.path.join(str(d), "embeddings.parquet"))
    return str(d)


def _embeddings_only_queries() -> list[str]:
    others = [t for t in TABLES if t != "embeddings"]
    picked = []
    for name, spec in REGISTRY.items():
        if not spec.oracle or "streaming" in spec.tags:
            continue
        sql = spec.oracle.lower()
        if not re.search(r"\bembeddings\b", sql):
            continue
        if any(re.search(rf"\b{t}\b", sql) for t in others):
            continue
        picked.append(name)
    return sorted(picked)


EMB_QUERIES = _embeddings_only_queries()


def test_embedding_selection_is_substantial():
    assert len(EMB_QUERIES) >= 5, EMB_QUERIES
    assert "sim_topk_bruteforce" in EMB_QUERIES


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_adversarial_embeddings_match_oracle(spark, adversarial_emb_dir, name):
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
            f"'{os.path.join(adversarial_emb_dir, 'embeddings.parquet')}')"
        )
        spec = REGISTRY[name]
        df = spec.fn(spark, adversarial_emb_dir)
        assert_matches_oracle(df, con, spec.oracle, name=f"adversarial-emb:{name}")
    finally:
        con.close()


@pytest.mark.parametrize("name", QUERIES)
def test_adversarial_matches_oracle(spark, adversarial_sf_dir, name):
    # Only the documents view exists — the helper duckdb_connection
    # registers all ten tables and would fail on the missing files.
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{os.path.join(adversarial_sf_dir, 'documents.parquet')}')"
        )
        spec = REGISTRY[name]
        df = spec.fn(spark, adversarial_sf_dir)
        assert_matches_oracle(df, con, spec.oracle, name=f"adversarial:{name}")
    finally:
        con.close()


# --- hostile star schema: the join/relational family on pathological keys ---
#
# NULL and dangling foreign keys, duplicate primary keys, negative and
# NULL money, empty-string and NULL categorical values, epoch and
# far-future dates — the cases a 100 TB warehouse WILL contain and the
# generated sf* data never does. Every query whose oracle touches only
# the seven relational tables re-runs against this schema.

_D = __import__("datetime").datetime

_REGION = [(0, "AMERICA"), (1, "ASIA"), (2, "EMPTY-REGION")]

_NATION = [
    (0, "USA", 0),
    (1, "CHINA", 1),
    (2, "ORPHAN", 99),  # dangling regionkey
    (3, "LONELY", 0),  # nation with no customers
]

_CUSTOMER = [
    # (custkey, name, nationkey, acctbal, mktsegment)
    (1, "alice", 0, 100.00, "BUILDING"),
    (2, "bob", None, 0.00, "AUTOMOBILE"),  # NULL nationkey
    (3, "carol", 99, -50.25, "BUILDING"),  # dangling nationkey, negative bal
    (4, "dave", 1, 100.00, ""),  # empty segment
    (5, "eve", 1, None, "MACHINERY"),  # NULL acctbal
    (6, "alice", 1, 75.00, "BUILDING"),  # duplicate name
    (7, "Ætheld", 0, 10.00, "HOUSEHOLD"),  # non-ASCII name (string fns)
    (8, "no-orders", 0, 5.00, "BUILDING"),  # customer with zero orders
]

_SUPPLIER = [
    (1, "s1", 0, 10.00),
    (2, "s2", 99, None),  # dangling nationkey, NULL acctbal
    (3, "s3", 1, -1.00),
]

_PART = [
    # (partkey, name, brand, type, size, retailprice)
    (1, "widget", "Brand#A", "PROMO", 5, 10.00),
    (2, "gadget", "Brand#A", "STANDARD", 0, 0.00),  # zero size & price
    (3, "gizmo", "Brand#B", None, -1, 99.99),  # NULL type, negative size
    (4, "widget", "Brand#B", "PROMO", 5, 10.00),  # duplicate name, price tie
]

_ORDERS = [
    # (orderkey, custkey, status, totalprice, orderdate, priority)
    (100, 1, "F", 100.00, _D(1970, 1, 1), "1-URGENT"),  # epoch date
    (101, 1, "O", 0.00, _D(2099, 12, 31), "5-LOW"),  # far future, zero price
    (102, 2, "F", None, None, "1-URGENT"),  # NULL price AND date
    (103, 999, "P", 50.50, _D(2024, 2, 29), "3-MEDIUM"),  # dangling custkey, leap day
    (104, 3, "F", -10.00, _D(2024, 1, 15), ""),  # negative price, empty priority
    (105, 5, "O", 25.25, _D(2024, 1, 15), None),  # NULL priority
    (106, 4, "O", 10.00, _D(2024, 1, 16), "5-LOW"),
    (106, 4, "O", 10.00, _D(2024, 1, 16), "5-LOW"),  # duplicate primary key
]

_LINEITEM = [
    # (orderkey, partkey, suppkey, linenumber, qty, extprice, disc, tax,
    #  returnflag, linestatus, shipdate)
    (100, 1, 1, 1, 5.0, 100.00, 0.05, 0.02, "R", "F", _D(1970, 1, 1)),
    (100, 2, 1, 2, 0.0, 0.00, 0.0, 0.0, "N", "O", None),  # NULL shipdate, zero qty
    (101, 3, 2, 1, 1.0, 50.00, 1.0, 0.0, "A", "F", _D(2024, 1, 1)),  # disc=1 → 0 rev
    (103, 1, 3, 1, 2.5, 10.50, 0.25, 0.1, "R", "F", _D(2099, 12, 31)),
    (104, 4, 1, 1, -3.0, 20.00, 0.1, 0.0, "R", "F", _D(2024, 1, 20)),  # negative qty
    (106, 2, 3, 1, 1.0, 30.00, 0.0, 0.0, "N", "O", _D(2024, 1, 17)),
    (106, 2, 3, 1, 1.0, 30.00, 0.0, 0.0, "N", "O", _D(2024, 1, 17)),  # dup line
    (999, 1, 1, 1, 1.0, 10.00, 0.0, 0.0, "N", "O", _D(2024, 6, 1)),  # dangling order
]

_REL_TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")


@pytest.fixture(scope="module")
def adversarial_rel_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("advrel")
    specs = {
        "region": pa.table(
            {
                "r_regionkey": pa.array([r[0] for r in _REGION], pa.int64()),
                "r_name": pa.array([r[1] for r in _REGION], pa.string()),
            }
        ),
        "nation": pa.table(
            {
                "n_nationkey": pa.array([r[0] for r in _NATION], pa.int64()),
                "n_name": pa.array([r[1] for r in _NATION], pa.string()),
                "n_regionkey": pa.array([r[2] for r in _NATION], pa.int64()),
            }
        ),
        "customer": pa.table(
            {
                "c_custkey": pa.array([r[0] for r in _CUSTOMER], pa.int64()),
                "c_name": pa.array([r[1] for r in _CUSTOMER], pa.string()),
                "c_nationkey": pa.array([r[2] for r in _CUSTOMER], pa.int32()),
                "c_acctbal": pa.array([r[3] for r in _CUSTOMER], pa.float64()),
                "c_mktsegment": pa.array([r[4] for r in _CUSTOMER], pa.string()),
            }
        ),
        "supplier": pa.table(
            {
                "s_suppkey": pa.array([r[0] for r in _SUPPLIER], pa.int64()),
                "s_name": pa.array([r[1] for r in _SUPPLIER], pa.string()),
                "s_nationkey": pa.array([r[2] for r in _SUPPLIER], pa.int32()),
                "s_acctbal": pa.array([r[3] for r in _SUPPLIER], pa.float64()),
            }
        ),
        "part": pa.table(
            {
                "p_partkey": pa.array([r[0] for r in _PART], pa.int64()),
                "p_name": pa.array([r[1] for r in _PART], pa.string()),
                "p_brand": pa.array([r[2] for r in _PART], pa.string()),
                "p_type": pa.array([r[3] for r in _PART], pa.string()),
                "p_size": pa.array([r[4] for r in _PART], pa.int32()),
                "p_retailprice": pa.array([r[5] for r in _PART], pa.float64()),
            }
        ),
        "orders": pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in _ORDERS], pa.int64()),
                "o_custkey": pa.array([r[1] for r in _ORDERS], pa.int64()),
                "o_orderstatus": pa.array([r[2] for r in _ORDERS], pa.string()),
                "o_totalprice": pa.array([r[3] for r in _ORDERS], pa.float64()),
                "o_orderdate": pa.array([r[4] for r in _ORDERS], pa.timestamp("us")),
                "o_orderpriority": pa.array([r[5] for r in _ORDERS], pa.string()),
            }
        ),
        "lineitem": pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in _LINEITEM], pa.int64()),
                "l_partkey": pa.array([r[1] for r in _LINEITEM], pa.int64()),
                "l_suppkey": pa.array([r[2] for r in _LINEITEM], pa.int64()),
                "l_linenumber": pa.array([r[3] for r in _LINEITEM], pa.int32()),
                "l_quantity": pa.array([r[4] for r in _LINEITEM], pa.float64()),
                "l_extendedprice": pa.array([r[5] for r in _LINEITEM], pa.float64()),
                "l_discount": pa.array([r[6] for r in _LINEITEM], pa.float64()),
                "l_tax": pa.array([r[7] for r in _LINEITEM], pa.float64()),
                "l_returnflag": pa.array([r[8] for r in _LINEITEM], pa.string()),
                "l_linestatus": pa.array([r[9] for r in _LINEITEM], pa.string()),
                "l_shipdate": pa.array([r[10] for r in _LINEITEM], pa.timestamp("us")),
            }
        ),
    }
    for name, table in specs.items():
        pq.write_table(table, os.path.join(str(d), f"{name}.parquet"))
    return str(d)


def _relational_queries() -> list[str]:
    """Queries whose oracle reads only the seven star-schema tables."""
    others = [t for t in TABLES if t not in _REL_TABLES]
    picked = []
    for name, spec in REGISTRY.items():
        if not spec.oracle or "streaming" in spec.tags:
            continue
        sql = spec.oracle.lower()
        if not any(re.search(rf"\b{t}\b", sql) for t in _REL_TABLES):
            continue
        if any(re.search(rf"\b{t}\b", sql) for t in others):
            continue
        picked.append(name)
    return sorted(picked)


REL_QUERIES = _relational_queries()


def test_relational_selection_is_substantial():
    assert len(REL_QUERIES) >= 30, REL_QUERIES
    assert "revenue_per_nation" in REL_QUERIES
    assert "nation_customer_counts_outer" in REL_QUERIES


@pytest.mark.parametrize("name", REL_QUERIES)
def test_adversarial_relational_match_oracle(spark, adversarial_rel_dir, name):
    con = duckdb.connect()
    try:
        for t in _REL_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
                f"'{os.path.join(adversarial_rel_dir, t + '.parquet')}')"
            )
        spec = REGISTRY[name]
        df = spec.fn(spark, adversarial_rel_dir)
        assert_matches_oracle(df, con, spec.oracle, name=f"adversarial-rel:{name}")
    finally:
        con.close()


# --- hostile streaming: bounded replay vs batch oracle on boundary data ---
#
# The streaming jobs are excluded from the sweeps above (their tag skips
# them), so they never faced hostile inputs. This section replays every
# streaming query over a combined hostile dir: the adversarial events
# (NULL keys/types/values, duplicate timestamps, far-future day) PLUS
# deliberate event-time BOUNDARY rows — an exactly-1-hour session gap
# and an exactly-7-day purchase/signup distance — where end-exclusive
# window semantics and inclusive join ranges are most likely to diverge
# from a batch twin.

_STREAM_EVENTS = _EVENTS + [
    # session-gap boundary: user 50's events exactly 1h apart
    (100, _ts(3600), 50, "view", 1.0, None),
    (101, _ts(7200), 50, "view", 1.0, None),
    # join-range boundary: purchase exactly 7 days after the signup
    (102, _ts(10800), 60, "signup", 1.0, None),
    (103, _ts(10800 + 7 * 86400), 60, "purchase", 2.0, None),
    # same-instant signup and purchase for a fresh user (range edge 0)
    (104, _ts(20000), 61, "signup", 1.0, None),
    (105, _ts(20000), 61, "purchase", 1.5, None),
]


@pytest.fixture(scope="module")
def adversarial_stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("advstream")
    events = pa.table(
        {
            "event_id": pa.array([r[0] for r in _STREAM_EVENTS], pa.int64()),
            "ts": pa.array([r[1] for r in _STREAM_EVENTS], pa.timestamp("ns")),
            "user_id": pa.array([r[2] for r in _STREAM_EVENTS], pa.int64()),
            "event_type": pa.array([r[3] for r in _STREAM_EVENTS], pa.string()),
            "value": pa.array([r[4] for r in _STREAM_EVENTS], pa.float64()),
            "props": pa.array([r[5] for r in _STREAM_EVENTS], pa.string()),
        }
    )
    pq.write_table(events, os.path.join(str(d), "events.parquet"))
    customer = pa.table(
        {
            "c_custkey": pa.array([r[0] for r in _CUSTOMER], pa.int64()),
            "c_name": pa.array([r[1] for r in _CUSTOMER], pa.string()),
            "c_nationkey": pa.array([r[2] for r in _CUSTOMER], pa.int32()),
            "c_acctbal": pa.array([r[3] for r in _CUSTOMER], pa.float64()),
            "c_mktsegment": pa.array([r[4] for r in _CUSTOMER], pa.string()),
        }
    )
    pq.write_table(customer, os.path.join(str(d), "customer.parquet"))
    docs = pa.table(
        {
            "doc_id": pa.array([r[0] for r in _DOCS], pa.int64()),
            "text": pa.array([r[1] for r in _DOCS], pa.string()),
            "lang": pa.array([r[2] for r in _DOCS], pa.string()),
            "source": pa.array([r[3] for r in _DOCS], pa.string()),
            "n_chars": pa.array([r[4] for r in _DOCS], pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(str(d), "documents.parquet"))
    return str(d)


STREAM_QUERIES = sorted(
    name
    for name, spec in REGISTRY.items()
    if "streaming" in spec.tags and spec.oracle
)


def test_stream_selection_is_substantial():
    assert len(STREAM_QUERIES) == 10, STREAM_QUERIES


@pytest.mark.parametrize("name", STREAM_QUERIES)
def test_adversarial_streaming_match_oracle(spark, adversarial_stream_dir, name):
    con = duckdb.connect()
    try:
        for t in ("events", "customer", "documents"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
                f"'{os.path.join(adversarial_stream_dir, t + '.parquet')}')"
            )
        spec = REGISTRY[name]
        df = spec.fn(spark, adversarial_stream_dir)
        assert_matches_oracle(df, con, spec.oracle, name=f"adversarial-stream:{name}")
    finally:
        con.close()
