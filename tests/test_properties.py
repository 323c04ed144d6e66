"""Property-based tests (hypothesis): random inputs, independent
pure-Python twins, and invariants — the §5.3 layer of the test strategy.

One Spark action per example is slow, so each property collects a BATCH
of hypothesis-generated rows into one DataFrame and checks all rows in
one action (hypothesis still drives generation + shrinking).
"""

from __future__ import annotations

import re

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from hadoop_lab_spark.functions import text as X
from hadoop_lab_spark.operators import bucketize, hash_bucket

# ASCII-ish text lines (printable, no exotic whitespace beyond space/tab)
_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=0, max_size=80
)

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(st.lists(_text, min_size=1, max_size=30))
@_SETTINGS
def test_token_count_matches_python(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    got = {
        r["i"]: r["n"]
        for r in df.select("i", X.token_count("t").alias("n")).collect()
    }
    for i, t in enumerate(texts):
        expected = len(re.split(r"\s+", t.strip()))
        assert got[i] == expected, (t,)


@given(st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=50))
@_SETTINGS
def test_bucketize_matches_python_ladder(spark, marks):
    df = spark.createDataFrame([(i, m) for i, m in enumerate(marks)], ["i", "m"])
    got = {r["i"]: r["g"] for r in df.select("i", bucketize("m").alias("g")).collect()}

    def ladder(m: int) -> str:
        return "A" if m >= 90 else "B" if m >= 80 else "C" if m >= 70 else "D" if m >= 60 else "F"

    for i, m in enumerate(marks):
        assert got[i] == ladder(m)


@given(st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=50))
@_SETTINGS
def test_hash_bucket_range_and_python_twin(spark, keys):
    import hashlib

    df = spark.createDataFrame([(k,) for k in set(keys)], ["k"])
    got = {
        r["k"]: r["b"]
        for r in df.select("k", hash_bucket("k", 256).alias("b")).collect()
    }
    for k in set(keys):
        expected = int(hashlib.md5(str(k).encode()).hexdigest()[:2], 16) % 256
        assert got[k] == expected
        assert 0 <= got[k] < 256


@given(st.lists(_text.filter(lambda t: t.strip()), min_size=2, max_size=12))
@_SETTINGS
def test_quality_score_bounded_everywhere(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    vals = [
        r["q"] for r in df.select(X.quality_score("t").alias("q")).collect()
    ]
    assert all(v is None or 0.0 <= v <= 1.0 for v in vals)


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100), st.text(st.sampled_from("ab"), min_size=1, max_size=3)),
        min_size=1,
        max_size=40,
    )
)
@_SETTINGS
def test_asof_matches_python_scan(spark, rows):
    """asof_join_backward against a brute-force Python scan on random
    (key, ts, payload) rows used as both sides."""
    from hadoop_lab_spark.operators import asof_join_backward

    left = [(k, ts, f"L{i}") for i, (k, ts, _) in enumerate(rows)]
    right = [(k, ts + 1 if p.startswith("a") else ts, f"R{i}") for i, (k, ts, p) in enumerate(rows)]
    ldf = spark.createDataFrame(left, ["k", "ts", "lv"])
    rdf = spark.createDataFrame(right, ["k", "ts", "rv"])
    out = {
        r["lv"]: r["r_rv"]
        for r in asof_join_backward(ldf, rdf, "k", "ts", "ts").collect()
    }
    for k, ts, lv in left:
        cands = [(rts, rv) for (rk, rts, rv) in right if rk == k and rts <= ts]
        if not cands:
            assert out[lv] is None
        else:
            # union-sort picks the row latest in (ts, arrival) order;
            # ties on ts are arbitrary-but-deterministic — accept any
            # max-ts witness
            best_ts = max(rts for rts, _ in cands)
            assert out[lv] in {rv for rts, rv in cands if rts == best_ts}


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 24), st.integers(0, 24)),
        min_size=0,
        max_size=40,
    )
)
def test_connected_components_equals_union_find(spark, edges):
    """connected_components must match an independent pure-Python
    union-find on arbitrary random graphs over nodes 0..24."""
    from hadoop_lab_spark.operators.graph import connected_components

    n = 25
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    # expected keeper: min node id per root
    keeper: dict[int, int] = {}
    for v in range(n):
        r = find(v)
        keeper[r] = min(keeper.get(r, v), v)
    expected = {v: keeper[find(v)] for v in range(n)}

    nodes = spark.createDataFrame([(i,) for i in range(n)], "id bigint")
    edf = spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a bigint, id_b bigint"
    ) if edges else spark.createDataFrame([], "id_a bigint, id_b bigint")
    got = dict(connected_components(nodes, edf, "id").collect())
    assert got == expected


@given(
    st.lists(
        st.lists(
            st.sampled_from(["alpha", "bravo", "carol", "delta", "echo"]),
            min_size=0,
            max_size=14,
        ),
        min_size=2,
        max_size=12,
    )
)
@_SETTINGS
def test_decontamination_matches_python_twin(spark, docs):
    """shared_probe_ngrams == brute-force Python shingling. A tiny vocab
    forces genuine 8-gram collisions between probe and corpus docs."""
    from hadoop_lab_spark.plans.mlprep import shared_probe_ngrams

    n, mod = 8, 3  # small probe_mod so examples actually have probes
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["n_shared_8grams"]
        for r in shared_probe_ngrams(df, probe_mod=mod, n=n).collect()
    }

    def shingles(toks):
        return {tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    probe = set()
    for i, toks in enumerate(docs):
        if i % mod == 0:
            probe |= shingles(toks)
    expected = {}
    for i, toks in enumerate(docs):
        if i % mod == 0:
            continue
        shared = len(shingles(toks) & probe)
        if shared:
            expected[i] = shared
    assert got == expected, (got, expected)


@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-1e3,
                max_value=1e3,
                allow_nan=False,
                width=32,
            ),
            min_size=0,
            max_size=8,
        ),
        min_size=1,
        max_size=10,
    )
)
@_SETTINGS
def test_int8_quantize_matches_python_twin(spark, vecs):
    """int8_quantize_audit == numpy-free Python fold, including the
    all-zero-vector lane (scale 0 → error 0, never NaN) and the
    truncation policy."""
    import math

    from pyspark.sql import types as T

    from hadoop_lab_spark.plans.mlprep import int8_quantize_audit

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    df = spark.createDataFrame(list(enumerate(vecs)), schema)
    got = {
        r["vec_id"]: (r["scale_q"], r["max_abs_err"])
        for r in int8_quantize_audit(df).collect()
    }

    def trunc6(x):
        y = x * 1e6
        return (math.floor(y) if abs(y) < 2**53 else y) / 1e6

    expected = {}
    for i, v in enumerate(vecs):
        if not v:
            continue  # empty vectors are filtered
        fl = [float(__import__("struct").unpack("f", __import__("struct").pack("f", x))[0]) for x in v]
        sc = max(abs(x) for x in fl) / 127.0
        if sc == 0:
            expected[i] = (0.0, 0.0)
        else:
            err = max(abs(x - math.floor(x / sc + 0.5) * sc) for x in fl)
            expected[i] = (trunc6(sc), trunc6(err))
    assert set(got) == set(expected)
    for i in expected:
        assert got[i] == pytest.approx(expected[i], abs=0.0), (
            i,
            vecs[i],
            got[i],
            expected[i],
        )


# --- composite deletion-neighborhood blocking invariants (r5) ---------------

_name = st.text(
    alphabet=st.sampled_from(list("abC1#é 火")), min_size=1, max_size=10
)


@given(st.lists(_name, min_size=2, max_size=8, unique=True))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_fine_blocking_matches_python_pair_model(spark, tmp_path_factory, names):
    """The fine twin's matched pairs must equal the Python model of its
    contract on ANY names: pairs agreeing on (name minus last char) or
    (stem + last char) within the same pass, verified lev<=2. In
    particular every equal-length pair differing in EXACTLY one of the
    last two characters must be found — the pigeonhole guarantee the
    lane's doc promises."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_lab_spark.plans.registry import REGISTRY, load_all_query_modules

    load_all_query_modules()
    d = str(tmp_path_factory.mktemp("fineprop"))
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(range(len(names)), pa.int64()),
                "c_name": pa.array(names, pa.string()),
            }
        ),
        os.path.join(d, "customer.parquet"),
    )

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    def keys(n: str):
        stem = n[: max(len(n) - 2, 1)]
        return (n[: max(len(n) - 1, 1)], stem + n[-1])

    expect = set()
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = names[i], names[j]
            ka, kb = keys(a), keys(b)
            if (ka[0] == kb[0] or ka[1] == kb[1]) and lev(a, b) <= 2:
                expect.add((i, j))

    df = REGISTRY["customer_name_fuzzy_blocks_fine"].fn(spark, d)
    got_matches = sum(r.n_matches for r in df.collect())
    assert got_matches == len(expect), (sorted(expect), names)

    # pigeonhole guarantee: equal-length pairs sharing the (guarded)
    # stem and differing in exactly one position — that position is in
    # the tail by stem equality, so one of the two deletion passes must
    # catch the pair
    for i, j in [
        (i, j)
        for i in range(len(names))
        for j in range(i + 1, len(names))
        if len(names[i]) == len(names[j]) >= 2
        and sum(x != y for x, y in zip(names[i], names[j])) == 1
        and names[i][: max(len(names[i]) - 2, 1)]
        == names[j][: max(len(names[j]) - 2, 1)]
    ]:
        assert (i, j) in expect


@given(st.integers(min_value=0, max_value=10**12))
@settings(max_examples=200, deadline=None)
def test_adaptive_planes_agrees_with_duckdb_formula(n):
    """The Spark side computes the plane knob in Python, the oracle in
    DuckDB SQL; ceil(log2(n/N0)) must agree for EVERY reachable corpus
    size or the two engines would silently bucket differently. DuckDB's
    prm CTE is replayed here as a scalar query over the same n."""
    import duckdb

    from hadoop_lab_spark.functions import similarity as S
    from hadoop_lab_spark.plans.pipeline import (
        ADAPTIVE_PLANES_N0,
        adaptive_planes,
    )

    sql_planes = duckdb.sql(
        f"SELECT {S.LSH_PLANES} + greatest(0, CAST(ceil(log2("
        f"greatest({n}, 1) / {ADAPTIVE_PLANES_N0}.0)) AS INT))"
    ).fetchone()[0]
    # the oracle counts rows (n >= 0); count 0 never reaches log2 in SQL
    # because an empty clean table yields no tagged rows at all — the
    # Python guard max(n, 1) models that vacuous case
    assert adaptive_planes(n) == sql_planes, n
