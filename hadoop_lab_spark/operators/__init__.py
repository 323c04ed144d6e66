"""Relational operators — composable ``DataFrame -> DataFrame`` functions.

Every operator mirrors a capability of the reference's MapReduce jobs
(SURVEY.md §2) but is expressed with built-in Column expressions so the
plan stays inside whole-stage codegen and shuffles only where the
semantics demand it.
"""

from hadoop_lab_spark.operators.wordcount import tokenize, wordcount
from hadoop_lab_spark.operators.relational import (
    argmax_per_group,
    collect_per_group,
    count_per_group,
    max_per_group,
    sum_per_group,
    topk_per_group,
)
from hadoop_lab_spark.operators.transforms import (
    bucketize,
    classify_threshold,
    row_greatest,
)
from hadoop_lab_spark.operators.matmul import coo_matmul
from hadoop_lab_spark.operators.asof import asof_join_backward
from hadoop_lab_spark.operators.sampling import (
    collect_per_group_salted,
    deterministic_sample,
    hash_bucket,
)

__all__ = [
    "asof_join_backward",
    "collect_per_group_salted",
    "deterministic_sample",
    "hash_bucket",
    "tokenize",
    "wordcount",
    "count_per_group",
    "max_per_group",
    "sum_per_group",
    "argmax_per_group",
    "collect_per_group",
    "topk_per_group",
    "bucketize",
    "classify_threshold",
    "row_greatest",
    "coo_matmul",
]
