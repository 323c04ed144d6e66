"""Group-by aggregation operators (SURVEY.md §2.4) and top-k.

All of these are single-shuffle plans: scan → project/filter (codegen) →
partial aggregate → Exchange on the group keys → final aggregate. The
reference implements each as a hand-written Reducer; here they are thin,
typed wrappers over built-in aggregates so Catalyst keeps map-side
partial aggregation (the reference only gets that where it remembered to
set a combiner — only lab2 did, `lab2/WordCount.sh:114`).

Determinism policy (SURVEY.md §2.10.7-8): the reference's argmax
tie-break and collected-string order are shuffle-arrival-order, i.e.
non-deterministic. We fix both deterministically (documented divergence):
argmax breaks ties on the smallest witness value; collect sorts elements.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(keys: str | Sequence[str]) -> list[str]:
    return [keys] if isinstance(keys, str) else list(keys)


def count_per_group(df: DataFrame, keys: str | Sequence[str], out: str = "cnt") -> DataFrame:
    """COUNT(*) per key — lab2/lab8/lab10 reducers (`lab8/ProductSalesAnalyzer.sh:96-105`)."""
    return df.groupBy(*_cols(keys)).agg(F.count(F.lit(1)).alias(out))


def max_per_group(
    df: DataFrame, keys: str | Sequence[str], value: str | Column, out: str = "max_value"
) -> DataFrame:
    """MAX(value) per key — lab3/lab6 reducers (`lab3/HighestTemperature.sh:100-113`)."""
    value_col = F.col(value) if isinstance(value, str) else value
    return df.groupBy(*_cols(keys)).agg(F.max(value_col).alias(out))


def sum_per_group(
    df: DataFrame, keys: str | Sequence[str], value: str | Column, out: str = "sum_value"
) -> DataFrame:
    """SUM(value) per key — lab5's dot-product accumulation (`lab5/MatrixMultiplication.sh:124-128`)."""
    value_col = F.col(value) if isinstance(value, str) else value
    return df.groupBy(*_cols(keys)).agg(F.sum(value_col).alias(out))


def argmax_per_group(
    df: DataFrame,
    keys: str | Sequence[str],
    order_value: str,
    witness: str,
    max_out: str = "max_value",
    witness_out: str = "argmax",
) -> DataFrame:
    """Per key: MAX(order_value) plus the witness column's value on the
    row attaining that max.

    Lab11's reducer (`lab11/UberTripAnalyzer.sh:94-112`) keeps a running
    strictly-greater max, so its tie winner is whichever tied value the
    shuffle delivered first — non-deterministic. Deterministic policy
    here: ties broken by the smallest witness (documented divergence,
    SURVEY §2.10.7).

    ``min_by(witness, struct(-value, witness))`` keeps this a single
    hash aggregate — no window sort, no extra shuffle: minimizing the
    struct lexicographically means "largest value, then smallest
    witness". Requires a numeric order column (negation); for non-numeric
    ordering use :func:`topk_per_group` with k=1.
    """
    keys = _cols(keys)
    value_col = F.col(order_value)
    tie_order = F.struct((-value_col).alias("nv"), F.col(witness).alias("w"))
    agg = df.groupBy(*keys).agg(
        F.min_by(F.col(witness), tie_order).alias(witness_out),
        F.max(value_col).alias(max_out),
    )
    return agg.select(*keys, witness_out, max_out)


def collect_per_group(
    df: DataFrame,
    keys: str | Sequence[str],
    value: str | Column,
    out: str = "collected",
    sep: str = ", ",
) -> DataFrame:
    """Concatenate all values per key — lab4/lab9 reducers
    (`lab4/StudentGrades.sh:107-120`, `lab9/MovieTagsAnalyzer.sh:85-96`).

    Elements are sorted before joining (deterministic divergence,
    SURVEY §2.10.8); the reference emits them in shuffle-arrival order.
    ``concat_ws``-style joining means no trailing-separator cleanup is
    ever needed (the reference strips it by regex, `lab9:93` — §2.3 T8).

    Scale note: collect_list is an ObjectHashAggregate; a pathologically
    hot key at 100 TB needs salting (two-level collect) — escape hatch
    documented in SURVEY §7.3.5.
    """
    value_col = F.col(value) if isinstance(value, str) else value
    # A group whose values are ALL NULL collects an empty list; emit NULL
    # for it, not '' — matching SQL string_agg (collect_list skips NULLs
    # on both engines, but array_join would manufacture '' where
    # string_agg returns NULL; hostile-events differential finding).
    lst = F.array_sort(F.collect_list(value_col))
    joined = F.when(F.size(lst) == 0, F.lit(None).cast("string")).otherwise(
        F.array_join(lst, sep)
    )
    return df.groupBy(*_cols(keys)).agg(joined.alias(out))


def topk_per_group(
    df: DataFrame,
    keys: str | Sequence[str],
    order_value: str,
    k: int,
    tiebreak: str | None = None,
    rank_out: str = "rk",
) -> DataFrame:
    """Generalized top-k per group (reference only has k=1 — SURVEY §2.6 O2).

    Window row_number over (value DESC, tiebreak ASC). One shuffle on the
    group keys; rows beyond k are dropped before any downstream operator.
    """
    order = [F.col(order_value).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    win = Window.partitionBy(*_cols(keys)).orderBy(*order)
    return df.withColumn(rank_out, F.row_number().over(win)).filter(F.col(rank_out) <= k)
