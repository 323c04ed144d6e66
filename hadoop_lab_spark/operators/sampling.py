"""Deterministic sampling + skew-safe aggregation escape hatches.

``df.sample()`` is seed-dependent per partition split and not
reproducible across engines or even across repartitions — useless for
an oracle-checked pipeline and dangerous for incremental 100 TB runs
(membership changes when file splits change). Hash-bucket sampling
fixes membership per KEY: a row's inclusion depends only on its key
bytes, so reruns, engines, and partitionings all agree.

``collect_per_group_salted`` is the documented escape hatch for hot
keys in collect-style aggregations (SURVEY §7.3.5): a two-level
aggregate whose first level fans one pathological key out over
``buckets`` salted sub-keys so no single task materializes the whole
group.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Sampling-hash domain: first 2 hex chars of md5 → 256 buckets.
HASH_BUCKETS = 256


def hash_bucket(key: Column | str, buckets: int = HASH_BUCKETS) -> Column:
    """Deterministic, engine-portable bucket in [0, buckets): integer
    value of the md5 hex prefix. md5 is uniform, so buckets are too.
    DuckDB twin: the instr-nibble arithmetic (see plans/advanced.py).

    ``buckets`` must be a power of two: the prefix domain is 16^hexlen,
    and ``% buckets`` is only uniform when buckets divides it (e.g.
    buckets=100 over 16² would give buckets 0-55 a 3/256 share vs 2/256
    for the rest — exactly the modulo bias a deterministic sampler must
    not have). Powers of two always divide the power-of-two domain, so
    enforcing them makes every reachable configuration exactly uniform.

    For non-oracle production paths, ``xxhash64`` is the cheaper choice;
    md5 keeps the DuckDB oracle bit-exact.
    """
    if buckets < 1 or (buckets & (buckets - 1)) != 0:
        raise ValueError(
            f"buckets must be a power of two for an unbiased modulo over the "
            f"hex-prefix domain, got {buckets}"
        )
    c = F.col(key) if isinstance(key, str) else key
    hexlen = max(1, -(-(buckets - 1).bit_length() // 4))  # ceil(bits/4)
    return (
        F.conv(F.substring(F.md5(c.cast("string").cast("binary")), 1, hexlen), 16, 10)
        .cast("int")
        % buckets
    )


def deterministic_sample(
    df: DataFrame, key: str, keep_buckets: int, buckets: int = HASH_BUCKETS
) -> DataFrame:
    """Keep rows whose key hashes into the first ``keep_buckets`` of
    ``buckets`` — a keep_buckets/buckets fraction with per-key
    stability (all rows of a key are kept or dropped together)."""
    return df.filter(hash_bucket(key, buckets) < keep_buckets)


def collect_per_group_salted(
    df: DataFrame,
    keys: str | Sequence[str],
    value: str | Column,
    buckets: int = 16,
    out: str = "collected",
    sep: str = ", ",
    salt_on: str | Column | None = None,
) -> DataFrame:
    """Sorted string-collect per key, salted: level 1 collects per
    (key, salt) sub-group, level 2 merges the ≤``buckets`` partial
    arrays per key. Result is identical to the unsalted
    ``collect_per_group`` (elements sorted before joining) — only the
    shuffle shape changes: the hottest key costs |key|/buckets rows per
    task at level 1 instead of |key| in one task.

    ``salt_on`` picks the column whose hash spreads the hot key —
    it MUST be high-cardinality WITHIN a key for the bound to hold: the
    default (the value itself) degrades to |key|/|distinct values| when
    values repeat (e.g. an enum-typed value gives ≤5 effective salt
    buckets no matter how many were requested — the r4 skew stress
    caught exactly this). Pass a row-unique column (an event id) for a
    true |key|/buckets bound.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    value_col = F.col(value) if isinstance(value, str) else value
    if salt_on is None:
        salt_src = value_col
    else:
        salt_src = F.col(salt_on) if isinstance(salt_on, str) else salt_on
    salt = hash_bucket(salt_src, buckets).alias("_salt")
    partial = (
        df.select(*keys, value_col.alias("_v"), salt)
        .groupBy(*keys, "_salt")
        .agg(F.collect_list("_v").alias("_part"))
    )
    # Same all-NULL-group contract as collect_per_group: an empty merged
    # list means every value in the key was NULL → NULL, not '' (matches
    # SQL string_agg; the two collects must stay bit-identical).
    merged = F.array_sort(F.flatten(F.collect_list("_part")))
    joined = F.when(F.size(merged) == 0, F.lit(None).cast("string")).otherwise(
        F.array_join(merged, sep)
    )
    return partial.groupBy(*keys).agg(joined.alias(out))
