"""Hostile-events differential: the events-table twin of the text fuzz.

test_fuzz_differential.py fuzzes the documents/embeddings families; this
module does the same for the EVENTS family — the lanes where the
r5-ADVICE NULL-sort-key class lives. A hand-built hostile table (every
column NULL somewhere, exact-duplicate timestamps, ties on
(user_id, ts), unseen/empty/NULL event types, malformed + float +
quoted-int JSON props, negative/huge/boundary values, a full-duplicate
row, an all-NULL payload row) runs against EVERY events-only lane's
oracle; hypothesis then generates random tables from the same hostile
domain for the highest-surface slice.

First run of this gate found four real defects (all fixed in
plans/advanced.py, same commit):
- skew_salted_join DROPPED NULL-keyed fact rows (md5(NULL) → NULL salt
  fails the inner join; the unsalted oracle keeps the row) — a wrong
  answer, not a crash;
- range_join_value_bands crashed with CAST_OVERFLOW on values ≥ ~1e11
  (floor(value/width) past INT under ANSI);
- json_extract_sum crashed with CAST_INVALID_INPUT on a float-valued k
  (strict cast of '1.5');
- scalar_function_sampler2's ORACLE crashed (DuckDB's json parser errors
  on malformed props where Spark's from_json returns NULL).

Float policy: values are binary-exact (multiples of 0.25) — this gate
fuzzes structure and NULLs, not float ulps; a near-degenerate variance
makes corr() diverge between one-pass and two-pass engine paths on
values that are mathematically identical (observed: DuckDB corr of a
2-point group = 1.000004).
"""

from __future__ import annotations

import datetime as dt
import inspect
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import duckdb

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadoop_lab_spark.plans.registry import REGISTRY, load_all_query_modules
from hadoop_lab_spark.testing import assert_matches_oracle

load_all_query_modules()

_ALL_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _events_only_lanes() -> list[str]:
    """Every batch lane whose source references exactly the events table —
    discovered, not listed, so a future events lane joins this gate
    automatically."""
    out = []
    for n, s in sorted(REGISTRY.items()):
        if "streaming" in s.tags:
            continue
        src = inspect.getsource(s.fn)
        tables = [t for t in _ALL_TABLES if f'"{t}"' in src or f"'{t}'" in src]
        if tables == ["events"]:
            out.append(n)
    return out


EVENTS_LANES = _events_only_lanes()

_T0 = dt.datetime(2024, 1, 1)


def _ts(hours):
    return None if hours is None else _T0 + dt.timedelta(hours=hours)


#: (event_id, ts_hours, user_id, event_type, value, props)
HOSTILE_ROWS = [
    (0, 0.0, 1, "signup", 10.0, '{"k": 1}'),
    (1, 0.0, 1, "purchase", 10.0, '{"k": 2}'),          # tie on (user, ts)
    (2, 0.0, 2, "signup", -5.5, "not json"),            # malformed props
    (3, 1.0, 2, "purchase", 1e12, '{"k": 999999}'),     # huge value
    (4, 1.0, 2, "purchase", 1e12, '{"k": 999999}'),     # duplicate payload
    (5, 2.0, 3, "weird", 0.0, "{}"),                    # unseen type
    (6, None, 3, "error", 3.25, None),                  # NULL ts + props
    (7, 3.0, None, "error", None, '{"k": -7}'),         # NULL user + value
    (8, 30.0, 1, "", 2.0, '{"k": 0}'),                  # empty-string type
    (9, 31.0, 1, "signup", None, '{"j": 5}'),           # wrong json key
    (None, 32.0, 4, "purchase", 7.0, '{"k": 3}'),       # NULL event_id
    (10, 55.0, 4, "purchase", 7.0, '{"k": 3}'),
    (11, 55.0, 4, "purchase", 6.0, '{"k": 4}'),         # ts tie, same user
    (12, 56.0, 5, "signup", 1.5, '{"k": 1.5}'),         # float json value
    (13, 57.0, 5, None, 50.0, '{"k": "12"}'),           # NULL type, band boundary
    (14, None, None, None, None, None),                 # all-NULL payload
    (15, 58.0, 2, None, 49.5, '{"k": 1e3}'),            # exponent json value
    # ADVICE r6 quoted-int grammar rows: purchase-typed so the filtered
    # JSON lanes (from_json_typed, json_roundtrip) see them; value NULL
    # so the moment statistics of the purchase group (1e12-scale values
    # where round(,6) is sub-ulp and cannot snap engine accumulation
    # differences) are untouched.
    (16, 58.5, 6, "purchase", None, '{"k": "+5"}'),     # signed quoted int
    (17, 59.0, 6, "purchase", None, '{"k": " 5"}'),     # padded quoted int
]


def _write_events(rows, directory: str) -> None:
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([_ts(r[1]) for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, os.path.join(directory, "events.parquet"))


def _con_for(directory: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{os.path.join(directory, 'events.parquet')}')"
    )
    return con


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hostile_events"))
    _write_events(HOSTILE_ROWS, d)
    return d


def test_gate_discovers_the_events_family():
    # Pins the discovery heuristic: if this drops, lanes silently left
    # the gate (e.g. a refactor moved the table name behind a variable).
    assert len(EVENTS_LANES) >= 29, EVENTS_LANES


@pytest.mark.parametrize("name", EVENTS_LANES)
def test_lane_survives_hostile_events(spark, hostile_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, hostile_dir)
    if spec.oracle is None:
        df.count()
        return
    con = _con_for(hostile_dir)
    try:
        assert_matches_oracle(df, con, spec.oracle, name=f"hostile:{name}")
    finally:
        con.close()


#: Hypothesis slice: window/tie-break, sorted collect, sessionization,
#: lag deltas, JSON extraction, hash sampling, salted join, percentiles —
#: the widest NULL/tie/JSON surfaces in the family.
FUZZ_EVENT_QUERIES = (
    "argmax_type_per_day",
    "collect_types_per_user",
    "sessions_per_user",
    "event_value_deltas",
    "json_extract_sum",
    "quota_sample_per_type",
    "skew_salted_join",
    "value_quartiles_per_type",
)

_row = st.tuples(
    st.one_of(st.none(), st.integers(min_value=0, max_value=6)),      # event_id (dups + NULL)
    st.one_of(st.none(), st.sampled_from([0.0, 0.0, 1.0, 2.0, 30.0, 55.0])),  # ts ties
    st.one_of(st.none(), st.integers(min_value=0, max_value=3)),      # user_id
    st.one_of(st.none(), st.sampled_from(["", "signup", "purchase", "error", "weird"])),
    st.one_of(st.none(), st.sampled_from([0.0, 10.0, -5.5, 49.5, 50.0, 7.25, 1e12])),
    st.one_of(
        st.none(),
        st.sampled_from(
            ["not json", "{}", '{"k": 1}', '{"k": -7}', '{"k": 1.5}',
             '{"k": "12"}', '{"k": "+5"}', '{"k": " 5"}', '{"j": 5}']
        ),
    ),
)


#: NaN-purchase posture (ADVICE r6): a NaN on a PURCHASE row exercises
#: the nan_excluded contract of every purchase-value money sum. Kept out
#: of HOSTILE_ROWS because NaN ORDERING semantics legitimately diverge
#: between the engines (Spark sorts NaN above all values; DuckDB 1.0's
#: vectorized path disagrees with its own constant folding — see
#: functions/numeric.py), so the ordering/percentile lanes scope NaN out
#: of their contracts; the money-sum lanes must NOT (an unguarded lane
#: silently drops the addend on Spark but errors the DuckDB oracle —
#: exactly the loud failure this test locks in).
NAN_GUARDED_LANES = ("daily_revenue_gapfill", "json_roundtrip_events_daily")


@pytest.fixture(scope="module")
def nan_purchase_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("nan_events"))
    rows = HOSTILE_ROWS + [
        (18, 60.0, 6, "purchase", float("nan"), '{"k": 6}'),
        (19, 60.5, 6, "purchase", 8.25, '{"k": 7}'),  # NaN day has real revenue too
    ]
    _write_events(rows, d)
    return d


@pytest.mark.parametrize("name", NAN_GUARDED_LANES)
def test_money_sum_lane_survives_nan_purchase(spark, nan_purchase_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, nan_purchase_dir)
    con = _con_for(nan_purchase_dir)
    try:
        assert_matches_oracle(df, con, spec.oracle, name=f"nan-purchase:{name}")
    finally:
        con.close()


@given(st.lists(_row, min_size=1, max_size=10))
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_fuzzed_events_match_oracle(spark, tmp_path_factory, rows):
    d = str(tmp_path_factory.mktemp("fuzzevents"))
    _write_events(rows, d)
    con = _con_for(d)
    try:
        for name in FUZZ_EVENT_QUERIES:
            spec = REGISTRY[name]
            df = spec.fn(spark, d)
            assert_matches_oracle(df, con, spec.oracle, name=f"fuzz-events:{name}")
    finally:
        con.close()
