"""Word count — the lab2 pipeline, Spark-first.

Reference: ``lab2/WordCount.sh:61-123`` — StringTokenizer over each line
(whitespace tokenization, case-sensitive, `:85-88`), emit (word, 1), a
combiner for map-side partial counts (`:114`), reduce to sums, single
sorted text output.

Spark mapping: ``explode(split(...))`` is the flatMap; ``groupBy.count``
is the shuffle+reduce; the combiner is automatic (HashAggregate always
runs partial → final, so the shuffle moves one row per distinct word per
partition, not one row per token — exactly what lab2's combiner buys,
without writing it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# StringTokenizer's default delimiter set is " \t\n\r\f" —
# lab2/WordCount.sh:85 uses the default constructor.
_TOKEN_SPLIT_RE = r"[ \t\n\r\f]+"


def tokenize(df: DataFrame, text_col: str = "text", out: str = "word") -> DataFrame:
    """1→N flatMap: one output row per whitespace token (SURVEY §2.3 T1).

    Case-sensitive, no normalization — parity rule §2.10.1. Empty tokens
    (produced by leading separators) are dropped, matching
    StringTokenizer, which never returns empty tokens.
    """
    token = F.explode(F.split(F.col(text_col), _TOKEN_SPLIT_RE)).alias(out)
    return df.select(token).filter(F.col(out) != "")


def wordcount(
    df: DataFrame, text_col: str = "text", word_out: str = "word", count_out: str = "cnt"
) -> DataFrame:
    """Case-sensitive word frequency over a text column.

    Plan shape at scale: parquet scan (only ``text_col`` read) →
    generate/explode → partial HashAggregate (map-side combine) →
    Exchange hashpartitioning(word) → final HashAggregate. The only
    shuffle carries (word, partial_count) pairs.
    """
    return (
        tokenize(df, text_col, word_out)
        .groupBy(word_out)
        .agg(F.count(F.lit(1)).alias(count_out))
    )
