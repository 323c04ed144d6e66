"""Property-based and model tests for the r5 scale-pattern family
(plans/scale_ops.py): PageRank, prefix-filter set-similarity join,
sorted-neighborhood blocking, stratified sampling, HLL mergeability,
and two-phase skyline — each checked against an independent pure-Python
twin on hypothesis-generated inputs, beyond the registry's DuckDB
differential (which only exercises the shapes the corpus happens to
contain)."""

from __future__ import annotations

import re

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from hadoop_lab_spark.operators.graph import pagerank
from hadoop_lab_spark.plans.scale_ops import (
    prefix_jaccard_join,
    skyline_2d,
    sorted_neighborhood_candidates,
    sorted_neighborhood_candidates_global,
)

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# PageRank vs pure-Python power iteration
# ---------------------------------------------------------------------------
def _py_pagerank(edges: set[tuple[int, int]], iterations: int, d: float = 0.85):
    nodes = sorted({u for e in edges for u in e})
    out: dict[int, int] = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    rank = {v: 1.0 for v in nodes}
    for _ in range(iterations):
        contrib: dict[int, float] = {}
        for s, t in edges:
            contrib[t] = contrib.get(t, 0.0) + rank[s] / out[s]
        rank = {v: (1 - d) + d * contrib.get(v, 0.0) for v in nodes}
    return rank


@given(
    st.sets(
        st.tuples(st.integers(0, 11), st.integers(0, 11)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(1, 4),
)
@_SETTINGS
def test_pagerank_matches_python_power_iteration(spark, edges, iterations):
    edf = spark.createDataFrame(sorted(edges), "src bigint, dst bigint")
    got = {r["id"]: r["rank"] for r in pagerank(edf, iterations=iterations).collect()}
    want = _py_pagerank(edges, iterations)
    assert set(got) == set(want)
    for v in want:
        # Accumulation order differs (Python dict fold vs shuffle
        # partials); the fixpoint values agree to float noise.
        assert got[v] == pytest.approx(want[v], rel=1e-9), v


def test_pagerank_rejects_zero_iterations(spark):
    edf = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    with pytest.raises(ValueError):
        pagerank(edf, iterations=0)


def test_pagerank_sink_and_source_shape(spark):
    # 1->2->3 with 3 dangling: classic chain. One round:
    # r(1)=0.15, r(2)=0.15+0.85*1=1.0, r(3)=1.0. Two rounds:
    # r(2)=0.15+0.85*0.15, r(3)=0.15+0.85*1.0.
    edf = spark.createDataFrame([(1, 2), (2, 3)], "src bigint, dst bigint")
    got = {r["id"]: r["rank"] for r in pagerank(edf, iterations=2).collect()}
    assert got[1] == pytest.approx(0.15)
    assert got[2] == pytest.approx(0.15 + 0.85 * 0.15)
    assert got[3] == pytest.approx(0.15 + 0.85 * 1.0)


# ---------------------------------------------------------------------------
# Prefix-filter Jaccard join vs brute force (3-word-shingle sets,
# matching functions/dedup.py:word_shingle_arrays)
# ---------------------------------------------------------------------------
_WORDS = ["alpha", "bravo", "carol", "delta", "echo", "fox", "golf", "hotel"]


def _py_shingles(text: str, n: int = 3) -> frozenset[str]:
    # Mirror word_shingle_arrays exactly: trim spaces, split on the
    # explicit WS_RE class (no \x0b — Java \s vs RE2 divergence).
    toks = re.split(r"[ \t\n\r\f]+", text.strip(" "))
    if len(toks) < n:
        return frozenset()
    return frozenset(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))


def _py_jaccard_pairs(docs: list[str], t: float):
    toks = {i: _py_shingles(s) for i, s in enumerate(docs)}
    out = {}
    for a in toks:
        for b in toks:
            if a < b and toks[a] and toks[b]:
                i = len(toks[a] & toks[b])
                j = i / (len(toks[a]) + len(toks[b]) - i)
                if j >= t:
                    out[(a, b)] = j
    return out


@given(
    st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=8).map(" ".join),
        min_size=2,
        max_size=14,
    ),
    st.sampled_from([0.4, 0.6, 0.8]),
)
@_SETTINGS
def test_prefix_jaccard_join_equals_bruteforce(spark, docs, threshold):
    """Prefix filtering is LOSSLESS: the candidate pruning must return
    exactly the brute-force qualifying pair set at any threshold.
    Short docs (< 3 tokens) have no shingle set and must produce no
    pairs — the word_shingle_arrays arity filter."""
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id bigint, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in prefix_jaccard_join(df, threshold=threshold).collect()
    }
    want = _py_jaccard_pairs(docs, threshold)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=0.0), k  # exact int ratio


# ---------------------------------------------------------------------------
# Sorted-neighborhood bucketed stitch vs the global sliding window
# ---------------------------------------------------------------------------
@given(
    st.lists(
        st.text(alphabet="ab", min_size=3, max_size=6),
        min_size=2,
        max_size=25,
    ),
    st.integers(1, 2),
)
@_SETTINGS
def test_sorted_neighborhood_equals_global_window(spark, keys, w):
    """With 1-char buckets over a 2-letter alphabet every bucket holds
    >= w rows only sometimes — hypothesis will generate both. Restrict
    the assertion to inputs where the precondition holds (the documented
    equivalence condition); the bucketed result must then match the
    global w-neighborhood exactly."""
    rows = [(i, k) for i, k in enumerate(keys)]
    from collections import Counter

    bucket_sizes = Counter(k[:1] for k in keys)
    if min(bucket_sizes.values()) < w:
        return  # precondition of the equivalence theorem not met
    df = spark.createDataFrame(rows, "id bigint, key string")
    got = {
        (r["k_a"], r["k_b"])
        for r in sorted_neighborhood_candidates(
            df, key_col="key", id_col="id", w=w, bucket_chars=1
        ).collect()
    }
    order = [i for i, _ in sorted(rows, key=lambda r: (r[1], r[0]))]
    want = {
        (order[i], order[i + d])
        for i in range(len(order))
        for d in range(1, w + 1)
        if i + d < len(order)
    }
    assert got == want


def test_sorted_neighborhood_rejects_large_w(spark):
    df = spark.createDataFrame([(1, "a")], "id bigint, key string")
    with pytest.raises(ValueError):
        sorted_neighborhood_candidates(df, key_col="key", id_col="id", w=3)


#: Middle bucket 'b' holds ONE row < w=2: the global window pair
#: (2,"ab")-(4,"ca") hops OVER it, which the adjacent-bucket stitch can
#: never produce — exactly the silent-incompleteness case the strict
#: guard exists for (ADVICE r5).
_SPARSE_BUCKET_ROWS = [(1, "aa"), (2, "ab"), (3, "ba"), (4, "ca"), (5, "cb")]


def test_sorted_neighborhood_strict_guard_raises_on_sparse_bucket(spark):
    """strict (the default) must fail the JOB, not return an incomplete
    candidate set, when any bucket holds fewer than w rows."""
    df = spark.createDataFrame(_SPARSE_BUCKET_ROWS, "id bigint, key string")
    cands = sorted_neighborhood_candidates(
        df, key_col="key", id_col="id", w=2, bucket_chars=1
    )
    with pytest.raises(Exception, match="fewer than w=2"):
        cands.collect()


def test_sorted_neighborhood_non_strict_is_bucket_local(spark):
    """strict=False opts into bucket-local semantics: all within-bucket
    and adjacent-boundary pairs, but NOT the (2,4) pair that hops over
    the sparse 'b' bucket — the documented trade, now explicit."""
    df = spark.createDataFrame(_SPARSE_BUCKET_ROWS, "id bigint, key string")
    got = {
        (r["k_a"], r["k_b"])
        for r in sorted_neighborhood_candidates(
            df, key_col="key", id_col="id", w=2, bucket_chars=1, strict=False
        ).collect()
    }
    want_global = {(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (3, 5), (4, 5)}
    assert got == want_global - {(2, 4)}


@given(
    st.lists(
        st.text(alphabet="ab", min_size=0, max_size=6),
        min_size=2,
        max_size=25,
    ),
    st.integers(1, 3),
)
@_SETTINGS
def test_sorted_neighborhood_global_equals_window_unconditionally(
    spark, keys, w
):
    """The two-level-ranking variant has NO precondition: it must equal
    the global w-window on EVERY input — sparse buckets, empty-string
    keys, w beyond the stitch version's lead() limit. This is the
    'chain the stitch' answer from ADVICE r5, verified where the stitch
    version's equivalence theorem does not even apply."""
    rows = [(i, k) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "id bigint, key string")
    got = {
        (r["k_a"], r["k_b"])
        for r in sorted_neighborhood_candidates_global(
            df, key_col="key", id_col="id", w=w, bucket_chars=1
        ).collect()
    }
    order = [i for i, _ in sorted(rows, key=lambda r: (r[1], r[0]))]
    want = {
        (order[i], order[i + d])
        for i in range(len(order))
        for d in range(1, w + 1)
        if i + d < len(order)
    }
    assert got == want


def test_sorted_neighborhood_global_plan_broadcasts_offsets(spark):
    """The scale contract of the two-level ranking: the bucket-offset
    table (bucket-dim-sized) must reach the ranked rows via a BROADCAST
    join — a shuffled join there would re-exchange the whole table on
    bkt a second time — and the position joins must stay equi-joins
    (no nested loop)."""
    df = spark.range(100).selectExpr(
        "id", "concat('k', cast(id % 7 as string), '-', cast(id as string)) AS key"
    )
    plan = (
        sorted_neighborhood_candidates_global(
            df, key_col="key", id_col="id", w=2, bucket_chars=2
        )
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "BroadcastHashJoin" in plan, plan[:1000]
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_quota_sample_null_event_id_contract(spark, tmp_path):
    """NULL quota keys would md5 to NULL, and Spark orders NULLs FIRST
    on ASC while DuckDB orders them LAST — without the explicit
    isNotNull contract (ADVICE r5) quota membership silently flips
    between the lane and its oracle. Re-run the full differential on a
    mirror sf dir whose events table has NULL event_ids injected."""
    import os

    import duckdb as _duckdb

    from hadoop_lab_spark.plans.registry import REGISTRY, load_all_query_modules
    from hadoop_lab_spark.sources.tables import TABLES, table_path

    load_all_query_modules()
    from hadoop_lab_spark.testing import assert_matches_oracle, duckdb_connection

    from .conftest import SF_DIR

    dst = tmp_path / "sfnull"
    dst.mkdir()
    for name in TABLES:
        if name != "events":
            os.symlink(table_path(SF_DIR, name), dst / f"{name}.parquet")
    src_events = table_path(SF_DIR, "events")
    _duckdb.execute(
        f"""COPY (
            SELECT CASE WHEN event_id % 11 = 0 THEN NULL ELSE event_id END
                       AS event_id,
                   ts, user_id, event_type, value, props
            FROM read_parquet('{src_events}')
        ) TO '{dst}/events.parquet' (FORMAT PARQUET)"""
    )
    n_null = _duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{dst}/events.parquet') WHERE event_id IS NULL"
    ).fetchone()[0]
    assert n_null > 0, "fixture must actually contain NULL keys"
    con = duckdb_connection(str(dst))
    try:
        spec = REGISTRY["quota_sample_per_type"]
        assert_matches_oracle(
            spec.fn(spark, str(dst)), con, spec.oracle, name="quota_sample_null"
        )
    finally:
        con.close()


# ---------------------------------------------------------------------------
# Two-phase skyline vs brute-force dominance
# ---------------------------------------------------------------------------
def _py_skyline(pts: list[tuple[int, float, int]]):
    out = set()
    for k, p, s in pts:
        dominated = any(
            (q[1] <= p and q[2] >= s and (q[1] < p or q[2] > s)) for q in pts
        )
        if not dominated:
            out.add((k, p, s))
    return out


@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 9)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t,
    )
)
@_SETTINGS
def test_skyline_matches_bruteforce(spark, raw):
    """Small integer price/size grids force heavy ties and duplicates —
    the strict-dominance edge cases (equal price, equal size, equal
    both) the window sweep must get right."""
    pts = [(i, float(p), s) for i, (p, s) in enumerate(raw)]
    df = spark.createDataFrame(
        pts, "p_partkey bigint, p_retailprice double, p_size int"
    )
    got = {
        (r["p_partkey"], r["p_retailprice"], r["p_size"])
        for r in skyline_2d(df, buckets=4).collect()
    }
    assert got == _py_skyline(pts)


def test_skyline_duplicate_points_both_survive(spark):
    # Identical (price, size) points never dominate each other.
    pts = [(1, 5.0, 3), (2, 5.0, 3), (3, 9.0, 1)]
    df = spark.createDataFrame(
        pts, "p_partkey bigint, p_retailprice double, p_size int"
    )
    got = {r["p_partkey"] for r in skyline_2d(df).collect()}
    assert got == {1, 2}


# ---------------------------------------------------------------------------
# Stratified sampling: membership + HLL mergeability on synthetic data
# ---------------------------------------------------------------------------
def test_stratified_sample_full_rate_keeps_everything(spark):
    """purchase's 256/256 rate must keep every purchase row — the
    boundary where hash sampling degenerates to the identity."""
    from hadoop_lab_spark.plans.registry import REGISTRY, load_all_query_modules
    from tests.conftest import SF_DIR

    load_all_query_modules()
    out = {
        r["event_type"]: r["n_sampled"]
        for r in REGISTRY["stratified_sample_events"].fn(spark, SF_DIR).collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    totals = {r["event_type"]: r["n"] for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert out["purchase"] == totals["purchase"]
    # Down-sampled strata must be proper non-empty subsets at this SF.
    for stratum in ("click", "view", "error"):
        assert 0 < out[stratum] < totals[stratum]


def test_hll_union_of_parts_equals_direct_sketch(spark):
    """Mergeability on synthetic data: union of per-group sketches ==
    one-pass sketch EXACTLY — valid here because 50 distinct values
    keep every sketch in sparse (coupon) mode, where DataSketches'
    union is genuinely lossless. At dense-mode cardinalities the
    registered lane gates a 2% drift bound instead (the union's
    HLL_8-gadget round-trip breaks bit-equality; measured at sf1.0)."""
    rows = [(i % 7, i % 50) for i in range(2000)]
    df = spark.createDataFrame(rows, "g int, v int")
    merged = (
        df.groupBy("g")
        .agg(F.hll_sketch_agg("v").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("v")).alias("est")
    ).collect()[0]["est"]
    assert merged == direct


# ---------------------------------------------------------------------------
# Triangle counting vs brute force
# ---------------------------------------------------------------------------
@given(
    st.sets(
        st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=0,
        max_size=40,
    )
)
@_SETTINGS
def test_triangle_count_matches_bruteforce(spark, raw_edges):
    """Degree-ordered orientation must count every triangle exactly
    once on arbitrary graphs, including degree ties (where the id
    tiebreak decides the orientation)."""
    from itertools import combinations

    from hadoop_lab_spark.plans.scale_ops import triangle_count

    und = {(min(a, b), max(a, b)) for a, b in raw_edges}
    nodes = {v for e in und for v in e}
    want = sum(
        1
        for x, y, z in combinations(sorted(nodes), 3)
        if (x, y) in und and (y, z) in und and (x, z) in und
    )
    if und:
        edf = spark.createDataFrame(sorted(und), "a bigint, b bigint")
    else:
        edf = spark.createDataFrame([], "a bigint, b bigint")
    got = triangle_count(edf).collect()[0]["n_triangles"]
    assert got == want


def test_triangle_count_complete_graph(spark):
    # K5 has C(5,3) = 10 triangles; every vertex ties on degree, so the
    # orientation falls back to the id order everywhere.
    from itertools import combinations

    from hadoop_lab_spark.plans.scale_ops import triangle_count

    edges = [(a, b) for a, b in combinations(range(5), 2)]
    edf = spark.createDataFrame(edges, "a bigint, b bigint")
    assert triangle_count(edf).collect()[0]["n_triangles"] == 10


# ---------------------------------------------------------------------------
# Curation composition vs a pure-Python four-stage model
# ---------------------------------------------------------------------------
@given(
    st.lists(
        st.tuples(
            st.lists(st.sampled_from(_WORDS), min_size=0, max_size=30).map(
                " ".join
            ),
            st.sampled_from(["en", "de", None]),
        ),
        min_size=0,
        max_size=25,
    )
)
@_SETTINGS
def test_curation_pipeline_matches_python_model(spark, tmp_path_factory, raw):
    """The four composed stages (token gate, md5-fingerprint dedup with
    min-id keeper, per-language md5-rate sampling, per-language card)
    re-implemented independently in Python over a synthetic documents
    table — duplicates across languages and NULL langs included."""
    import hashlib
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_lab_spark.plans.registry import REGISTRY, load_all_query_modules

    load_all_query_modules()
    d = tmp_path_factory.mktemp("curation")
    docs = [
        (i, text if text else None, lang, "synth", len(text))
        for i, (text, lang) in enumerate(raw)
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in docs], pa.int64()),
                "text": pa.array([r[1] for r in docs], pa.string()),
                "lang": pa.array([r[2] for r in docs], pa.string()),
                "source": pa.array([r[3] for r in docs], pa.string()),
                "n_chars": pa.array([r[4] for r in docs], pa.int64()),
            }
        ),
        os.path.join(str(d), "documents.parquet"),
    )

    def md5hex(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    # Stage 1+2: token gate, canonical-fingerprint dedup (keeper=min id)
    kept = {}
    for i, text, lang, _, n_chars in docs:
        if text is None or len(re.split(r"[ \t\n\r\f]+", text.strip(" "))) < 20:
            continue
        # canonical form: lower, collapse whitespace runs to single
        # spaces, trim — mirror functions/text.fingerprint_md5
        canon = re.sub(r"[ \t\n\r\f]+", " ", text.lower()).strip()
        fp = md5hex(canon)
        if fp not in kept or kept[fp][0] > i:
            kept[fp] = (i, lang, n_chars)
    # Stage 3: per-language md5-rate sampling (en 64/256, else keep)
    model = {}
    for i, lang, n_chars in kept.values():
        bucket = int(md5hex(str(i))[:2], 16)
        rate = 64 if lang == "en" else 256
        if bucket >= rate:
            continue
        key = lang if lang is not None else "unknown"
        n, total, mn, mx = model.get(key, (0, 0, None, None))
        model[key] = (
            n + 1,
            total + n_chars,
            i if mn is None else min(mn, i),
            i if mx is None else max(mx, i),
        )

    got = {
        r["lang"]: (r["n_docs"], r["total_chars"], r["min_doc_id"], r["max_doc_id"])
        for r in REGISTRY["curation_pipeline_e2e"].fn(spark, str(d)).collect()
    }
    assert got == model


# ---------------------------------------------------------------------------
# CMS grid merge is exactly lossless for ANY partitioning of the input
# ---------------------------------------------------------------------------
@given(
    st.lists(
        st.tuples(
            st.sampled_from(_WORDS), st.integers(0, 3), st.integers(1, 9)
        ),
        min_size=1,
        max_size=30,
    )
)
@_SETTINGS
def test_cms_grid_merge_equals_direct_for_any_split(spark, rows):
    """(tok, part, count) rows split into arbitrary per-part sketches:
    entrywise-summing the per-part grids must equal the grid of the
    pooled frequencies — linearity, on hypothesis-partitioned input."""
    from hadoop_lab_spark.functions import sketch as K

    df = spark.createDataFrame(rows, "tok string, part int, c long")
    fan = [
        F.struct(F.lit(d).alias("row"), K._bucket(F.col("tok"), d).alias("bucket"))
        for d in range(K.CMS_DEPTH)
    ]
    rb = F.explode(F.array(*fan)).alias("rb")
    flat = df.select("part", "c", rb).select(
        "part", "c", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    )
    merged = (
        flat.groupBy("part", "row", "bucket")
        .agg(F.sum("c").alias("cell"))
        .groupBy("row", "bucket")
        .agg(F.sum("cell").alias("m"))
    )
    direct = flat.groupBy("row", "bucket").agg(F.sum("c").alias("d"))
    joined = direct.join(merged, ["row", "bucket"], "full_outer").collect()
    assert joined, "grid must be non-empty"
    for r in joined:
        assert r["d"] is not None and r["m"] is not None and r["d"] == r["m"], r


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_sorted_neighborhood_equals_simple_global_window_on_real_data(
    spark, sf_dir
):
    """The registered oracle mirrors the bucketed formulation (so the
    differential is exact by construction); THIS test closes the loop
    against the independent simple definition — one global sliding
    window, no buckets — on the real customer tables, proving the
    boundary stitching reconstructs the textbook semantics there."""
    import duckdb

    from hadoop_lab_spark.plans.registry import REGISTRY, load_all_query_modules

    load_all_query_modules()
    got = {
        (r["k_a"], r["k_b"], r["lev"])
        for r in REGISTRY["sorted_neighborhood_pairs"].fn(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW customer AS SELECT * FROM read_parquet("
            f"'{sf_dir}/customer.parquet')"
        )
        want = set(
            con.execute(
                """
                WITH nbr AS (
                    SELECT c_custkey AS k_a, c_name AS n_a,
                           lead(c_custkey, 1) OVER w AS k1, lead(c_name, 1) OVER w AS n1,
                           lead(c_custkey, 2) OVER w AS k2, lead(c_name, 2) OVER w AS n2
                    FROM customer WHERE c_name IS NOT NULL
                    WINDOW w AS (ORDER BY c_name, c_custkey)
                ),
                pairs AS (
                    SELECT k_a, k1 AS k_b, n_a, n1 AS n_b FROM nbr WHERE k1 IS NOT NULL
                    UNION ALL
                    SELECT k_a, k2, n_a, n2 FROM nbr WHERE k2 IS NOT NULL
                )
                SELECT k_a, k_b, CAST(levenshtein(n_a, n_b) AS INTEGER) AS lev
                FROM pairs WHERE levenshtein(n_a, n_b) <= 2
                """
            ).fetchall()
        )
    finally:
        con.close()
    assert got == want


@given(
    st.dictionaries(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
            lambda e: e[0] != e[1]
        ),
        st.integers(1, 5),
        min_size=1,
        max_size=25,
    ),
    st.integers(1, 3),
)
@_SETTINGS
def test_weighted_pagerank_matches_python(spark, wedges, iterations):
    """Out-strength-normalized weighted PageRank vs a Python model;
    weight-1 edges must reduce to the unweighted recurrence."""
    edf = spark.createDataFrame(
        [(a, b, float(w)) for (a, b), w in sorted(wedges.items())],
        "src bigint, dst bigint, w double",
    )
    got = {
        r["id"]: r["rank"]
        for r in pagerank(edf, iterations=iterations, weight_col="w").collect()
    }
    nodes = sorted({v for e in wedges for v in e})
    strength: dict[int, float] = {}
    for (s_, _), w in wedges.items():
        strength[s_] = strength.get(s_, 0.0) + w
    rank = {v: 1.0 for v in nodes}
    for _ in range(iterations):
        contrib: dict[int, float] = {}
        for (s_, t_), w in wedges.items():
            contrib[t_] = contrib.get(t_, 0.0) + rank[s_] * w / strength[s_]
        rank = {v: 0.15 + 0.85 * contrib.get(v, 0.0) for v in nodes}
    assert set(got) == set(rank)
    for v in rank:
        assert got[v] == pytest.approx(rank[v], rel=1e-9), v
