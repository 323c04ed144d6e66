"""Sparse (COO) matrix multiply as a relational plan — lab5, Spark-first.

Reference: `lab5/MatrixMultiplication.sh:61-159` replicates every A-cell
K times and every B-cell K times in the mapper (`:86-98`, K hardcoded to
2 at `:86,:106`), then dot-products aligned vectors per (i,j) key in the
reducer (`:103-133`). That replication strategy moves O(nnz·K) rows
through the shuffle and cannot scale.

The relational formulation is strictly better and is what any engine
should plan:

    C(i,j) = SUM_k A(i,k) * B(k,j)
           ≡ A JOIN B ON A.k = B.row, GROUP BY A.i, B.col, SUM(A.v*B.v)

- shuffle moves O(nnz) rows once (or zero times for the broadcast side);
- Catalyst picks BroadcastHashJoin when one matrix fits the broadcast
  threshold (typical: a projection matrix), SortMergeJoin otherwise;
- dimensions come from the data, never hardcoded (fixes lab5's K=2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def coo_matmul(
    a: DataFrame,
    b: DataFrame,
    broadcast_b: bool | None = None,
    out: str = "value",
) -> DataFrame:
    """Multiply two COO matrices: columns ``(i, j, value)`` each.

    ``a`` is M×K with (i=row, j=col), ``b`` is K×N. Returns (i, j, value)
    of the M×N product.

    ``broadcast_b``: force/forbid broadcasting the right side; ``None``
    lets Catalyst/AQE decide from size statistics (AQE converts to
    broadcast at runtime when the shuffle side turns out small).
    """
    left = a.select(F.col("i"), F.col("j").alias("k"), F.col("value").alias("a_v"))
    right = b.select(F.col("i").alias("k"), F.col("j"), F.col("value").alias("b_v"))
    if broadcast_b:
        right = F.broadcast(right)
    # Products accumulate in BIGINT: INT cells up to ±1e8 overflow an
    # INT32 multiply under ANSI mode (tests/test_adversarial_corpus.py);
    # the oracle twin casts the same operand.
    return (
        left.join(right, "k")
        .groupBy("i", "j")
        .agg(F.sum(F.col("a_v").cast("long") * F.col("b_v")).alias(out))
    )
