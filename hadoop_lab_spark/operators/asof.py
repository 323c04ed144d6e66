"""As-of (temporal) join — an operator Spark lacks natively.

Implemented as the union-sort trick (SURVEY §2.11 extension surface —
the composition-of-built-ins path, not a UDF):

1. tag both inputs and union them on (key, ts);
2. one window per key ordered by (ts, tag) carries the LAST right-side
   row forward (``last(..., ignorenulls=True)``);
3. keep only left rows — each now paired with the most recent right
   row at-or-before its timestamp.

Cost: one hash Exchange per input on the key plus a per-key sort —
identical shape to a SortMergeJoin, with NO range-condition row
explosion (a naive ``l.ts >= r.ts`` theta join produces O(|L|·|R|)
intermediate rows per key; this produces |L|+|R|). This is the standard
scalable formulation used by time-series engines; DuckDB's built-in
ASOF JOIN (the oracle) has the same semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    keys: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_prefix: str = "r_",
) -> DataFrame:
    """LEFT as-of join: each left row gains the right row with the
    greatest ``right_ts`` ≤ its ``left_ts`` (same key), or NULLs.

    Equal timestamps match (inclusive, like DuckDB ``ASOF JOIN ... ON
    l.ts >= r.ts``): the right row sorts before the left at a tie via
    the tag. Right-side columns come back prefixed with
    ``right_prefix``. Right-side (key, ts) pairs should be unique —
    with duplicates, the union-sort picks the row latest in (ts, tag)
    order, which is a deterministic but arbitrary winner.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    r_payload = F.struct(*[F.col(c) for c in right.columns]).alias("_r")
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(
            right.select(r_payload).schema["_r"].dataType
        ).alias("_r"),
    )
    r_tagged = right.select(
        *[
            (F.col(c) if c in keys else F.lit(None).cast(left.schema[c].dataType)).alias(c)
            for c in left.columns
        ],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        r_payload,
    )
    unioned = l_tagged.unionByName(r_tagged)
    win = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("_match", F.last("_r", ignorenulls=True).over(win))
    out_cols = [F.col(c) for c in left.columns] + [
        F.col(f"_match.{c}").alias(f"{right_prefix}{c}")
        for c in right.columns
        if c not in keys
    ]
    return carried.filter(F.col("_is_left") == 1).select(*out_cols)
