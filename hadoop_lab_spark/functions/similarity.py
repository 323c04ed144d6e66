"""Embedding similarity search over array<float> columns.

Two tiers, per the standard ANN playbook:

- :func:`cosine_topk` — exact brute force. The right baseline, and the
  right *answer* when the query set is small: broadcast the queries,
  stream the corpus once, TakeOrdered per query. Linear in corpus size,
  embarrassingly parallel, zero shuffle of the corpus.
- :func:`lsh_ann_topk` — the scale path: random-hyperplane LSH buckets
  the corpus by sign signature; a query only scans its own bucket.
  Planes are derived from md5 (deterministic, engine-portable), so the
  DuckDB oracle reproduces the exact same buckets and results.

All vector math is built-in higher-order functions (zip_with +
aggregate) over DOUBLE — JVM-evaluated, no Python per row. Cosines are
rounded to 6dp before ranking so cross-engine float accumulation
differences can never flip a rank boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Number of hyperplanes for the LSH signature (2^PLANES buckets).
LSH_PLANES = 6


def _dot(a: Column, b: Column) -> Column:
    """Σ a[i]·b[i] in DOUBLE (left-fold; deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column, decimals: int = 6) -> Column:
    """Truncated cosine similarity between two float-array columns.

    Truncation (floor(x·10^d)/10^d), not round(): round()'s half-way
    case differs between engines, floor of a bit-identical double never
    does (see functions/text.py::trunc, including its ≥2⁵³ magnitude
    guard, which this shares).

    Zero-norm policy: cosine is UNDEFINED for a zero vector — the score
    is NULL (sorted last in any top-k) instead of an ANSI
    DIVIDE_BY_ZERO that kills the job on one degenerate embedding.
    Oracle twin: nullif(denominator, 0). Found by
    tests/test_adversarial_corpus.py.

    Guard mechanism — every guard here references the expensive fold
    exactly ONCE (the dot products are CodegenFallback HOFs with no
    subexpression elimination, so a CASE/nullif that mentions them
    twice doubles this function's cost; measured 1.7 → 3.7 s on
    dedup_embedding_cosine before this form):

    - ``try_divide`` (not nullif) nulls the zero-norm division;
    - ``nanvl`` maps the inf-norm NaN (overflowing vectors) to NULL, so
      the plain floor is total — Spark's floor(NaN) is silently 0 and
      floor(±inf) saturates to ±2⁶³, both wrong. Degenerate similarity
      is therefore uniformly NULL on both engines (oracle twin: CASE
      isnan → NULL), sorted last in any top-k.
    """
    scale = 10**decimals
    denom = F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b))
    raw = F.nanvl(F.try_divide(_dot(a, b), denom), F.lit(None).cast("double"))
    return F.floor(raw * scale) / scale


def norm(v: Column) -> Column:
    """‖v‖ = sqrt(Σ v[i]²) — the factorable half of :func:`cosine`.
    Same fold, same cast, same sqrt as cosine's denominator, so
    ``cosine_normed(a, b, norm(a), norm(b))`` is BIT-identical to
    ``cosine(a, b)`` while letting the norms ride each ROW instead of
    being re-folded per candidate pair."""
    return F.sqrt(_dot(v, v))


def cosine_normed(
    a: Column, b: Column, na: Column, nb: Column, decimals: int = 6
) -> Column:
    """:func:`cosine` with the two self-norms precomputed (r12
    optimization round). Every similarity join here scores candidate
    PAIRS, but two of cosine's three interpreted array folds depend on
    one vector alone — per-row work misplaced into the pair stage
    (where the threshold filter, pushed into the join condition, can
    even evaluate it twice). Callers compute ``norm(v)`` once per row
    (query/corpus/tagged projections) and pass it through; the
    expression tree below is cosine()'s own with the identical
    argument order (na·nb == sqrt(a·a)·sqrt(b·b) in the same IEEE
    multiply), so the value — and every oracle — is unchanged.
    Measured on dedup_embedding_cosine_wide (sf0.1, 5 interleaved
    reps, identical output): 1.97 → 1.58 s median together with the
    sig-exchange pin in :func:`cosine_near_dup_pairs`."""
    scale = 10**decimals
    raw = F.nanvl(F.try_divide(_dot(a, b), na * nb), F.lit(None).cast("double"))
    return F.floor(raw * scale) / scale


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-pairs excluded).

    Returns (query_id, neighbor_id, cos, rk). The queries side is
    broadcast — the corpus is scanned once with no shuffle; the only
    exchange is the per-query window over candidate rows (k·|queries|
    after row_number pruning, negligible).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        norm(F.col(vec_col)).alias("_qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        norm(F.col(vec_col)).alias("_cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_normed(
                F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")
            ).alias("cos"),
        )
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rk", F.row_number().over(win)).filter(F.col("rk") <= k)


def hyperplane_weight(plane: Column | int, dim: Column) -> Column:
    """Deterministic pseudo-random plane weight in {−7.5 … +7.5}:
    first hex nibble of md5('<plane>_<dim>') minus 7.5. Portable —
    the oracle SQL computes the identical planes."""
    p = F.lit(plane) if isinstance(plane, int) else plane
    h = F.md5(F.concat(p.cast("string"), F.lit("_"), dim.cast("string")).cast("binary"))
    nib = F.instr(F.lit("0123456789abcdef"), F.substring(h, 1, 1)) - 1
    return nib.cast("double") - 7.5


def _plane_weights(plane: int, dims: int) -> list[float]:
    """Driver-side twin of :func:`hyperplane_weight`: identical values
    (md5 of the same '<plane>_<dim>' string), computed once at
    plan-build time instead of per row per element in the JVM."""
    import hashlib

    return [
        int(hashlib.md5(f"{plane}_{d}".encode()).hexdigest()[0], 16) - 7.5
        for d in range(dims)
    ]


def lsh_signature(vec_col: Column, planes: int = LSH_PLANES, max_dim: int = 64) -> Column:
    """Sign signature: one char per hyperplane ('1' if v·w ≥ 0).

    Plane weights are embedded as LITERAL arrays (computed driver-side —
    same md5-derived values as :func:`hyperplane_weight`, verified by a
    unit test), so the per-row work is one zip_with+fold per plane in
    whole-stage codegen: no per-element hashing, no join, no shuffle.

    ``max_dim`` bounds the supported vector width; wider vectors raise
    at runtime rather than silently mis-hashing (zip_with would pad the
    weight side with nulls).
    """

    def bit(p: int) -> Column:
        w = F.array(*[F.lit(x) for x in _plane_weights(p, max_dim)])
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.slice(w, 1, F.size(vec_col)),
                lambda v, wt: v.cast("double") * wt,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0"))

    # NULL-vector rows must not trip the width guard (size(NULL) is NULL,
    # and when(NULL, …) falls into the raise branch — found by
    # tests/test_adversarial_corpus.py). They get the all-'0' signature
    # both here (NULL proj comparison → otherwise-'0') and in the SQL
    # oracle's CASE, and their cosine is NULL downstream.
    guard = F.coalesce(F.size(vec_col) <= max_dim, F.lit(True))
    sig = F.concat(*[bit(p) for p in range(planes)])
    return F.when(guard, sig).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"lsh_signature: vector wider than max_dim={max_dim}: "),
                F.size(vec_col).cast("string"),
            )
        )
    )


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = LSH_PLANES,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    The corpus is signature-bucketed once (reusable across query sets —
    at 100 TB you'd persist it partitioned by signature); each query
    joins only its bucket, so scan cost per query drops from O(N) to
    O(N / 2^planes) expected. Recall < 1 by construction: neighbors
    across a hyperplane are missed — the standard LSH trade; raise
    recall with multi-probe (flip one signature bit) or fewer planes.
    """
    sig = lsh_signature(F.col(vec_col), planes)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        sig.alias("sig"),
        norm(F.col(vec_col)).alias("_cn"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        sig.alias("sig"),
        norm(F.col(vec_col)).alias("_qn"),
    )
    scored = (
        c.join(F.broadcast(q), "sig")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_normed(
                F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")
            ).alias("cos"),
        )
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rk", F.row_number().over(win)).filter(F.col("rk") <= k)


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = LSH_PLANES,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ θ),
    blocked by LSH bucket so only same-bucket pairs are scored."""
    # r12 optimization round, two changes (measured together on the
    # _wide lane: 1.97 → 1.58 s sf0.1 median, identical output):
    # - per-vector norms ride the tagged rows (cosine_normed) so the
    #   pair stage folds ONE dot product per candidate instead of
    #   three — the threshold filter is pushed into the join
    #   condition, which otherwise evaluates all three folds per
    #   candidate and again per survivor;
    # - the tagged table is pinned behind its own hashpartitioning(sig)
    #   exchange, so the self-join's two sides reuse ONE
    #   signature+norm computation (the same duplicated-Generate shape
    #   the r12 audit found in minhash_near_dups; without the pin each
    #   side re-derives sig + norm from the scan).
    sig = lsh_signature(F.col(vec_col), planes)
    tagged = df.select(
        F.col(id_col),
        F.col(vec_col),
        sig.alias("sig"),
        norm(F.col(vec_col)).alias("_n"),
    ).repartition(F.col("sig"))
    a = tagged.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), "sig",
        F.col("_n").alias("_na"),
    )
    b = tagged.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), "sig",
        F.col("_n").alias("_nb"),
    )
    return (
        a.join(b, "sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine_normed(
                F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str = "label",
) -> DataFrame:
    """IVF-style approximate top-k: coarse quantizer → probe lists →
    exact rerank. The third ANN tier next to brute force and
    hyperplane LSH.

    The inverted lists are the existing ``list_col`` partitions; each
    list's centroid is its seed member (the vector with the smallest id
    — a deterministic, engine-portable choice where a k-means mean would
    differ across engines in accumulation ulps). A query scores every
    centroid (tiny broadcast cross join), probes its ``nprobe`` nearest
    lists, and reranks only those lists' members exactly.

    Scan cost per query: O(N · nprobe / n_lists) expected, vs O(N)
    brute force. At 100 TB the corpus would be stored partitioned by
    list id so probing prunes partitions at the source.
    """
    centroids = corpus.groupBy(list_col).agg(
        F.min_by(F.col(vec_col), F.col(id_col)).alias("_cent")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        norm(F.col(vec_col)).alias("_qn"),
    )
    probe_scores = q.crossJoin(F.broadcast(centroids)).select(
        "query_id",
        "_qv",
        "_qn",
        F.col(list_col),
        cosine(F.col("_qv"), F.col("_cent")).alias("_cs"),
    )
    probe_win = Window.partitionBy("query_id").orderBy(
        F.col("_cs").desc(), F.col(list_col).asc()
    )
    probes = (
        probe_scores.withColumn("_pr", F.row_number().over(probe_win))
        .filter(F.col("_pr") <= nprobe)
        .select("query_id", "_qv", "_qn", list_col)
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.col(list_col),
        norm(F.col(vec_col)).alias("_cn"),
    )
    scored = (
        c.join(F.broadcast(probes), list_col)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_normed(
                F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")
            ).alias("cos"),
        )
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rk", F.row_number().over(win)).filter(F.col("rk") <= k)


def lsh_ann_topk_multiprobe(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = LSH_PLANES,
) -> DataFrame:
    """Multi-probe LSH top-k: each query scans its own bucket PLUS the
    `planes` buckets one Hamming bit away (flip each signature bit).

    The standard recall lever without re-hashing: a true neighbor lost
    to a single hyperplane disagreement is recovered by the flipped
    probe. Candidate cost grows ×(planes+1) per query but stays
    O(N·(planes+1)/2^planes) expected — still bucket-bounded, never a
    corpus scan. Results are a superset of single-probe
    :func:`lsh_ann_topk` candidates with identical cosines.
    """
    sig = lsh_signature(F.col(vec_col), planes)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        sig.alias("sig"),
        norm(F.col(vec_col)).alias("_cn"),
    )

    def flip(s: Column, p: int) -> Column:
        ch = F.substring(s, p + 1, 1)
        flipped = F.when(ch == "1", F.lit("0")).otherwise(F.lit("1"))
        return F.concat(F.substring(s, 1, p), flipped, F.substring(s, p + 2, planes - p - 1))

    base = sig.alias("_s0")
    probes = F.array(F.col("_s0"), *[flip(F.col("_s0"), p) for p in range(planes)])
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
            base,
            norm(F.col(vec_col)).alias("_qn"),
        )
        .select("query_id", "_qv", "_qn", F.explode(probes).alias("sig"))
    )
    scored = (
        c.join(F.broadcast(q), "sig")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_normed(
                F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")
            ).alias("cos"),
        )
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rk", F.row_number().over(win)).filter(F.col("rk") <= k)
