"""Combined hostile universe (VERDICT r7 #7): every hostile fixture
family in ONE sf dir, run against the cross-family composites.

The star gate (fact+dims), hostile events, adversarial documents and
adversarial embeddings each existed as SEPARATE universes, so a lane
that reads across families only ever saw pathology on one side per
run. This module writes all ten tables hostile at once — the star from
tests/test_hostile_star.py, events from tests/test_hostile_events.py
(plus its NaN-purchase rows, the pair that caught the r8 finisher
divergence), documents/embeddings from tests/test_adversarial_corpus.py
— and runs:

- the e2e composites (``dedup_ingest_merge``, ``curation_pipeline_e2e``,
  ``decontamination_8gram``) whose stages chain several operator
  families over the same corpus;
- every registry lane whose ORACLE references tables from MORE THAN
  ONE family (discovered, not listed — new cross-family lanes join
  automatically).

Same float policy as the per-family gates: these fixtures fuzz
structure, NULLs, keys, unicode, and the decimal branches; value-level
rounding is property-tested in tests/test_numeric_exact.py.
"""

from __future__ import annotations

import os
import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import duckdb

from hadoop_lab_spark.plans.registry import REGISTRY, load_all_query_modules
from hadoop_lab_spark.testing import assert_matches_oracle

from tests.test_adversarial_corpus import _DIM, _DOCS, _EMBS
from tests.test_hostile_events import HOSTILE_ROWS, _write_events
from tests.test_hostile_star import _ALL_TABLES, _write_star

load_all_query_modules()

#: The composites VERDICT r7 #7 names: multi-stage pipelines whose
#: stages (LSH probe, CC, sampling, n-gram join, SCD classify) each
#: have their own hostile history — here they run with EVERY input
#: family hostile in the same session.
COMPOSITES = (
    "dedup_ingest_merge",
    "curation_pipeline_e2e",
    "decontamination_8gram",
)

_FAMILIES = {
    "star": {"lineitem", "orders", "part", "customer", "supplier",
             "nation", "region"},
    "events": {"events"},
    "documents": {"documents"},
    "embeddings": {"embeddings"},
}


def _cross_family_lanes() -> list[str]:
    out = []
    for name, spec in sorted(REGISTRY.items()):
        if not spec.oracle or "streaming" in spec.tags:
            continue
        sql = spec.oracle.lower()
        tables = {t for t in _ALL_TABLES if re.search(rf"\b{t}\b", sql)}
        fams = {f for f, members in _FAMILIES.items() if tables & members}
        if len(fams) >= 2:
            out.append(name)
    return out


CROSS_FAMILY = _cross_family_lanes()
UNIVERSE_LANES = sorted(set(COMPOSITES) | set(CROSS_FAMILY))


@pytest.fixture(scope="module")
def hostile_universe_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hostile_universe"))
    # star family (lineitem/orders/part/customer/supplier/nation/region)
    _write_star(d)
    # events, with the NaN-purchase rows riding along so any lane that
    # joins events sees NaN revenue next to the 1e12 jumbos
    rows = HOSTILE_ROWS + [
        (18, 60.0, 6, "purchase", float("nan"), '{"k": 6}'),
        (19, 60.5, 6, "purchase", 8.25, '{"k": 7}'),
    ]
    _write_events(rows, d)
    # documents (adversarial corpus: NULL/empty/ws/CJK/BOM/dup/PII rows)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in _DOCS], pa.int64()),
                "text": pa.array([r[1] for r in _DOCS], pa.string()),
                "lang": pa.array([r[2] for r in _DOCS], pa.string()),
                "source": pa.array([r[3] for r in _DOCS], pa.string()),
                "n_chars": pa.array([r[4] for r in _DOCS], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    # embeddings (zero vector, NULL, overflow/underflow magnitudes, dups)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in _EMBS], pa.int64()),
                "embedding": pa.array(
                    [r[1] for r in _EMBS], pa.list_(pa.float32())
                ),
                "label": pa.array([r[2] for r in _EMBS], pa.int32()),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )
    return d


def _con_for(directory: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in sorted(_ALL_TABLES):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
            f"'{os.path.join(directory, t + '.parquet')}')"
        )
    return con


def test_universe_is_complete_and_hostile(hostile_universe_dir):
    """Non-vacuousness: all ten tables exist and each family's signature
    pathology is present (dup doc pair, NaN purchase, 1e12 money, NULL
    embedding) — a fixture refactor that drops one would silently turn
    the composites back into single-family runs."""
    con = _con_for(hostile_universe_dir)
    try:
        for t in _ALL_TABLES:
            assert con.execute(f"SELECT count(*) FROM {t}").fetchone()[0] > 0, t
        assert con.execute(
            "SELECT count(*) FROM events WHERE isnan(value)"
        ).fetchone()[0] >= 1
        assert con.execute(
            "SELECT count(*) FROM events WHERE value >= 1e12"
        ).fetchone()[0] >= 2
        assert con.execute(
            "SELECT count(*) FROM documents GROUP BY text"
            " HAVING count(*) > 1 LIMIT 1"
        ).fetchone()[0] >= 2
        assert con.execute(
            "SELECT count(*) FROM embeddings WHERE embedding IS NULL"
        ).fetchone()[0] >= 1
        assert con.execute(
            "SELECT count(*) FROM lineitem WHERE l_extendedprice >= 1e12"
        ).fetchone()[0] >= 1
    finally:
        con.close()


def test_discovery_finds_the_cross_family_lanes():
    # Pins the discovery heuristic: argmax_type_per_day joins events to
    # orders, regexp_sampler unions documents with customer/supplier —
    # if these drop out, the oracle text stopped naming its tables.
    assert "argmax_type_per_day" in CROSS_FAMILY, CROSS_FAMILY
    assert "regexp_sampler" in CROSS_FAMILY, CROSS_FAMILY


@pytest.mark.parametrize("name", UNIVERSE_LANES)
def test_lane_survives_hostile_universe(spark, hostile_universe_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, hostile_universe_dir)
    if spec.oracle is None:
        df.count()
        return
    con = _con_for(hostile_universe_dir)
    try:
        assert_matches_oracle(
            df, con, spec.oracle, name=f"hostile-universe:{name}"
        )
    finally:
        con.close()


# ---------------------------------------------------------------------------
# Streaming section (VERDICT r8 #6): the 10 streaming jobs replayed over
# the combined universe. Until r9 the streaming family's hostile coverage
# was its own per-family batching gate — test_hostile_events.py line 64
# explicitly SKIPS streaming lanes, so no streaming job had ever seen the
# universe's NaN-purchase rows (the pair that caught r8 finisher defect
# #1) riding next to the 1e12 jumbo values, NULL event times, and the
# adversarial documents that stream_wordcount / stream_chunk_documents
# consume. Streaming state is integer micros whose snapshot finisher
# (round_micros_to_double) shares the exact code path the NaN rows broke
# in batch — replay every job here, oracle-compared where the lane
# carries one, rows-only (the driver's weaker check) where it doesn't.
# ---------------------------------------------------------------------------

STREAMING_LANES = sorted(
    n for n, s in REGISTRY.items() if "streaming" in s.tags
)


def test_streaming_family_is_fully_enumerated():
    """Non-vacuousness: the replay below must cover all 10 jobs — a tag
    rename or a new streaming lane must widen this gate, not escape it."""
    assert len(STREAMING_LANES) >= 10, STREAMING_LANES
    assert "stream_windowed_event_counts" in STREAMING_LANES
    assert "stream_foreachbatch_totals" in STREAMING_LANES


@pytest.mark.parametrize("name", STREAMING_LANES)
def test_streaming_lane_survives_hostile_universe(
    spark, hostile_universe_dir, name
):
    spec = REGISTRY[name]
    df = spec.fn(spark, hostile_universe_dir)
    if spec.oracle is None:
        # the driver's weaker rows-only contract: runs and yields a
        # stable, non-crashing answer over the hostile replay
        df.count()
        return
    con = _con_for(hostile_universe_dir)
    try:
        assert_matches_oracle(
            df, con, spec.oracle, name=f"hostile-universe-streaming:{name}"
        )
    finally:
        con.close()
