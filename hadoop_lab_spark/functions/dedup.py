"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design for 100 TB:

- Everything is expressed as DataFrame transformations whose shuffles
  are keyed on bounded-cardinality keys (shingle, (band, signature),
  (doc, bit)) — no all-pairs stage ever materializes. Candidate
  generation is blocking-based (LSH bands / shared shingles), so cost
  scales with the number of *colliding* pairs, not n².
- Hashes are lexicographic minima of md5 hex strings: md5 is a
  uniform hash, so `min(md5(seed || shingle))` is a valid min-wise
  (MinHash) sketch per seed, portable bit-for-bit across engines —
  which is what lets DuckDB oracle-check the whole pipeline.
- Hot-shingle blowup (a boilerplate shingle shared by millions of
  docs) is capped by `max_shingle_freq` — standard practice; dropped
  shingles only lose candidates that share *other* shingles too.

The MapReduce reference has no dedup at all; this module is part of the
training-data-pipeline extension surface (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Defaults shared with the oracle SQL in plans/pipeline.py.
MINHASH_SEEDS = 12
LSH_BANDS = 4  # rows per band = MINHASH_SEEDS / LSH_BANDS
SHINGLE_N = 3
SIMHASH_BITS = 64


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = SHINGLE_N) -> DataFrame:
    """(id, shingle) pairs: distinct n-word shingles per document.

    Documents with fewer than n tokens are dropped (no shingle exists);
    mirrored in the oracle SQL with ``len(toks) >= n``.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    df = df.select(F.col(id_col), toks.alias("_toks")).filter(F.size("_toks") >= n)
    shingles = F.transform(
        F.sequence(F.lit(1), F.size("_toks") - (n - 1)),
        lambda i: F.array_join(F.slice("_toks", i, n), " "),
    )
    return (
        df.select(F.col(id_col), F.explode(shingles).alias("shingle"))
        .distinct()
    )


def _band_signatures(
    shingles: DataFrame, id_col: str, seeds: int, bands: int
) -> DataFrame:
    """(id, band, band_sig): LSH band signatures from minhashes."""
    rows_per_band = seeds // bands
    seeded = shingles.select(
        F.col(id_col),
        F.col("shingle"),
        F.explode(F.sequence(F.lit(0), F.lit(seeds - 1))).alias("seed"),
    )
    h = F.md5(
        F.concat(F.col("seed").cast("string"), F.lit("#"), F.col("shingle")).cast("binary")
    )
    minhashes = seeded.groupBy(id_col, "seed").agg(F.min(h).alias("mh"))
    banded = minhashes.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
    return banded.groupBy(id_col, "band").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "mh"))),
                    lambda s: s["mh"],
                ),
                "|",
            ).cast("binary")
        ).alias("band_sig")
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = SHINGLE_N,
    seeds: int = MINHASH_SEEDS,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """(id_a, id_b) candidate near-duplicate pairs: documents agreeing on
    at least one full LSH band (id_a < id_b, distinct).

    The self-join is keyed on (band, band_sig) — only documents whose
    band signature collides ever meet, so the pair stage is linear in
    collisions. With seeds=12, bands=4 (r=3), the match curve passes
    ~50% at Jaccard ≈ 0.44.
    """
    sh = word_shingles(df, id_col, text_col, n)
    bands_df = _band_signatures(sh, id_col, seeds, bands)
    left = bands_df.select(
        F.col(id_col).alias("id_a"), F.col("band"), F.col("band_sig")
    )
    right = bands_df.select(
        F.col(id_col).alias("id_b"), F.col("band"), F.col("band_sig")
    )
    return (
        left.join(right, ["band", "band_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def exact_jaccard(
    shingles: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """(id_a, id_b, jaccard): exact shingle-set Jaccard for given pairs.

    |A∩B| comes from one join on (pair, shingle); |A|,|B| from a tiny
    per-doc count. jaccard = inter / (|A|+|B|−inter) — integer ratio,
    bit-identical across engines.
    """
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = shingles.select(F.col(id_col).alias("id_a"), "shingle")
    b = shingles.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        pairs.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter")
                / (F.col("n_a") + F.col("n_b") - F.col("inter"))
            ).alias("jaccard"),
        )
    )


def minhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    n: int = SHINGLE_N,
    seeds: int = MINHASH_SEEDS,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: candidates by band collision,
    verified by exact Jaccard ≥ threshold. Returns (id_a, id_b, jaccard)."""
    sh = word_shingles(df, id_col, text_col, n)
    pairs = lsh_candidate_pairs(df, id_col, text_col, n, seeds, bands)
    return exact_jaccard(sh, pairs, id_col).filter(F.col("jaccard") >= threshold)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    n: int = SHINGLE_N,
    max_shingle_freq: int = 1000,
) -> DataFrame:
    """Exhaustive n-gram Jaccard near-dups: candidates are documents
    sharing ≥1 shingle (blocking join on the shingle itself), then exact
    Jaccard ≥ threshold. Unlike LSH this has perfect recall w.r.t.
    shingle overlap; `max_shingle_freq` drops degenerate boilerplate
    shingles to bound the blocking join's fan-out at scale."""
    sh = word_shingles(df, id_col, text_col, n)
    rare = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
    rare = rare.filter(F.col("df_") <= max_shingle_freq).select("shingle")
    blocked = sh.join(rare, "shingle")
    a = blocked.select(F.col(id_col).alias("id_a"), "shingle")
    b = blocked.select(F.col(id_col).alias("id_b"), "shingle")
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return exact_jaccard(sh, pairs, id_col).filter(F.col("jaccard") >= threshold)


def simhash_bits(
    df: DataFrame, id_col: str, text_col: str, bits: int = SIMHASH_BITS
) -> DataFrame:
    """(id, simhash): SimHash as a `bits`-char '0'/'1' string.

    Token weights = term frequency. Bit j of a token's md5 is extracted
    from hex nibble j//4 (big-endian within the nibble): portable to any
    engine with md5 + instr. Per-(doc, bit) signed weight sums flip to
    '1' when positive. A bitstring (not BIGINT) avoids sign pitfalls and
    diffs cheaply by char comparison.

    Plan: tokens → tf per (doc, token) → ×bits explode → sum per
    (doc, bit) → 1 collect per doc (bits rows). Bounded ×64 blowup,
    all hash-partitioned aggregates. (A pandas_udf computing the same
    per-partition would cut the explode at extreme scale; the relational
    form keeps it oracle-checkable and still scales linearly.)
    """
    toks = F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok")
    tf = (
        df.select(F.col(id_col), toks)
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("w"))
        .withColumn("h", F.md5(F.col("tok").cast("binary")))
    )
    j = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j")
    per_bit = tf.select(F.col(id_col), "w", "h", j)
    # nibble value via position in the hex alphabet; bit extraction with
    # integer shift/mask (expr: shift amount is itself a column).
    signed = F.expr(
        "w * (2 * ((( instr('0123456789abcdef', substring(h, CAST(j / 4 AS INT) + 1, 1)) - 1 )"
        "          >> (3 - CAST(j % 4 AS INT))) & 1) - 1)"
    )
    sums = per_bit.groupBy(id_col, "j").agg(F.sum(signed).alias("s"))
    bitchar = F.when(F.col("s") > 0, F.lit("1")).otherwise(F.lit("0"))
    return (
        sums.select(F.col(id_col), "j", bitchar.alias("b"))
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "b"))), lambda s: s["b"]
                ),
                "",
            ).alias("simhash")
        )
    )
