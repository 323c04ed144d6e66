"""Hypothesis-driven whole-query fuzz differential.

The adversarial fixtures (test_adversarial_corpus.py) are hand-built;
this suite lets hypothesis GENERATE hostile documents tables — random
unicode, exotic whitespace, empty/NULL text, duplicate bodies — writes
them as parquet, and runs a representative slice of the text-query
family against the DuckDB oracle on each example. Shrinking then hands
back a minimal diverging corpus if any engine-pair edge case survives
the hand-built fixtures.

Runtime discipline: one hypothesis example = one generated table = one
parquet write + len(FUZZ_QUERIES) Spark actions, so max_examples stays
small; the value is the generator's reach, not the example count.
"""

from __future__ import annotations

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

#: Queries fuzzed per example: scan-local text analysis, tokenization,
#: hashing/dedup, and the grouped corpus stats — the family with the
#: widest string-edge-case surface.
FUZZ_QUERIES = (
    "text_stats",
    "lang_id",
    "doc_fingerprints",
    "dedup_exact",
    "corpus_source_stats",
    "corpus_dataset_card",
    # r5: the ingest composition — exercises shingle/band signatures, the
    # delta-vs-base band probe, connected components, AND the recursive
    # oracle CTE against NULL text, sub-shingle docs, BOM/emoji tokens
    "dedup_minhash_incremental",
    "dedup_ingest_merge",
)

# Broad alphabet: ASCII, exotic whitespace (vertical tab excluded — it is
# the ONE documented cross-engine divergence, pinned by WS_RE's explicit
# class), CJK, accents, an emoji, a BOM.
_ALPHABET = st.sampled_from(
    list("abc XY12.,!-_@#")
    + ["\t", "\n", "\r", "\x0c", "火", "é", "\U0001f600", "﻿"]
)
_text = st.one_of(
    st.none(),
    st.text(alphabet=_ALPHABET, min_size=0, max_size=60),
)
_docs = st.lists(_text, min_size=1, max_size=8)


@given(_docs)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_fuzzed_corpus_matches_oracle(spark, tmp_path_factory, texts):
    d = str(tmp_path_factory.mktemp("fuzzcorpus"))
    table = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(
                [None if t is None else "en" for t in texts], pa.string()
            ),
            "source": pa.array(
                [f"src{i % 3}" for i in range(len(texts))], pa.string()
            ),
            "n_chars": pa.array(
                [None if t is None else len(t) for t in texts], pa.int64()
            ),
        }
    )
    pq.write_table(table, os.path.join(d, "documents.parquet"))
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{os.path.join(d, 'documents.parquet')}')"
        )
        for name in FUZZ_QUERIES:
            spec = REGISTRY[name]
            df = spec.fn(spark, d)
            assert_matches_oracle(df, con, spec.oracle, name=f"fuzz:{name}")
    finally:
        con.close()


#: Embedding-family queries fuzzed per generated vector table.
FUZZ_EMB_QUERIES = (
    "embedding_quantize_int8",
    "embedding_norm_stats",
    "embedding_centroids",
)

_vec = st.one_of(
    st.none(),
    st.lists(
        st.floats(min_value=-1e4, max_value=1e4, allow_nan=False, width=32),
        min_size=0,
        max_size=6,
    ),
)


@given(st.lists(_vec, min_size=1, max_size=8))
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_fuzzed_embeddings_match_oracle(spark, tmp_path_factory, vecs):
    """Random vectors (incl. NULL and empty) through the vector-QA
    family vs DuckDB. Vector LENGTHS vary per row — centroids must
    aggregate ragged dims identically on both engines.

    Caveat baked into the generator: bounded magnitudes and no NaN —
    the hand-built hostile fixture owns the 1e30/NaN lanes; here the
    value is the combinatorial coverage of lengths and NULL placement.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("fuzzemb"))
    table = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([i % 3 for i in range(len(vecs))], pa.int32()),
        }
    )
    pq.write_table(table, os.path.join(d, "embeddings.parquet"))
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
            f"'{os.path.join(d, 'embeddings.parquet')}')"
        )
        for name in FUZZ_EMB_QUERIES:
            spec = REGISTRY[name]
            df = spec.fn(spark, d)
            assert_matches_oracle(df, con, spec.oracle, name=f"fuzz-emb:{name}")
    finally:
        con.close()
