"""Frequency sketches: count-min heavy hitters over a token stream.

A count-min sketch (Cormode & Muthukrishnan 2005) summarizes an
arbitrarily large frequency distribution in a fixed d x w counter grid:
each item is hashed by d independent hash rows into one bucket per row;
estimate(item) = min over rows of its bucket total. Estimates are always
>= the true count (pure overcount from collisions), with error bounded
by eps = e/w of the total mass at confidence 1 - (1/e)^d.

Why this is THE 100 TB shape for "top tokens over a corpus":
- the sketch is a ``groupBy(row, bucket)`` over at most d*w keys —
  map-side partial aggregation collapses every partition to <= d*w
  counter rows before the shuffle, so shuffle volume is O(d*w *
  n_partitions) regardless of corpus size or vocabulary size;
- the finished sketch (d*w rows, here 4x512 = 2048) is broadcast to
  estimate any candidate set without shuffling the corpus again;
- the grid is mergeable (entrywise sum), so per-day sketches combine
  into per-month ones for free — the streaming/batch unification story.

Hashes are plan-literal md5 prefixes (row seed concatenated into the
input), so a SQL oracle replays them bit-for-bit: bucket = the first
four hex nibbles of md5('{row}#' || token) folded big-endian, mod w.
WIDTH is a power of two dividing the 16-bit nibble domain, so the
modulo is exactly uniform (same requirement as operators/sampling.py).

No reference analog (the reference's closest job is plain wordcount,
``lab2/WordCount.sh``); this is part of the training-data-pipeline
extension surface (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadoop_lab_spark.functions.text import WS_RE

CMS_DEPTH = 4  #: hash rows (d)
CMS_WIDTH = 512  #: buckets per row (w); MUST divide 16^4 (power of two)


def _bucket(tok: Column, row: int) -> Column:
    """Row-``row`` bucket of a token: first 16 md5 bits of 'row#tok', mod w."""
    h = F.md5(F.concat(F.lit(f"{row}#"), tok).cast("binary"))
    return (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % CMS_WIDTH).cast(
        "int"
    )


def token_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """Exact term frequencies: (tok, c) with c BIGINT. One uniform-key
    shuffle with map-side combine — scalable to any corpus size."""
    toks = F.explode(F.split(F.trim(F.col(text_col)), WS_RE)).alias("tok")
    return (
        df.select(toks)
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def cms_estimates(tf: DataFrame) -> DataFrame:
    """Count-min estimates for every token in a (tok, c) frequency table.

    Returns (tok, c, est) with est BIGINT, est >= c always.

    Plan: the token table fans out x``CMS_DEPTH`` to (tok, c, row,
    bucket); the sketch is the bounded ``groupBy(row, bucket)`` sum
    (<= d*w rows, map-side combined); estimation broadcast-joins the
    sketch back onto the fan-out and takes the per-token min. The exact
    count rides along in the same aggregate (c is functionally
    dependent on tok), so no third pass over tf is needed.

    The fan-out is pinned behind ``repartition(row, bucket)``: the
    sketch's groupBy is then partition-local (its clustering is already
    satisfied) and the estimation probe hits the SAME Exchange as a
    ReusedExchange — so the upstream token-frequency scan+shuffle run
    exactly once per query, without cache()/persist() (a registry query
    must not touch the driver-owned session's storage). Previously the
    unpinned lineage executed the tf aggregate twice (ADVICE r2).
    """
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("row"), _bucket(F.col("tok"), d).alias("bucket")
                )
                for d in range(CMS_DEPTH)
            ]
        )
    ).alias("rb")
    fanout = (
        tf.select("tok", "c", rows)
        .select("tok", "c", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .repartition(F.col("row"), F.col("bucket"))
    )
    sketch = (
        fanout.groupBy("row", "bucket")
        .agg(F.sum("c").cast("bigint").alias("total"))
    )
    return (
        fanout.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("tok")
        .agg(F.min("c").alias("c"), F.min("total").alias("est"))
    )
