"""hadoop-lab-spark — a PySpark-native analytics engine.

A brand-new engine providing (and extending) the query/data-processing
capability surface of the reference `BiswajitHemram/hadoop-lab` (10 Hadoop
MapReduce batch jobs; see SURVEY.md). Everything is expressed Spark-first:
DataFrames + built-in column expressions so Catalyst/Tungsten keep predicate
pushdown, column pruning, partial aggregation, and whole-stage codegen intact
at scale. No row-at-a-time Python UDFs exist in the parity surface.

Layout
------
- ``session``    — SparkSession factory with pinned, scale-aware confs.
- ``sources``    — parquet star-schema loader + reference-text quirk readers.
- ``operators``  — relational operators (group-aggs, argmax, collect, matmul).
- ``functions``  — text analysis, dedup (exact/MinHash-LSH/SimHash/Jaccard),
                   embedding similarity search.
- ``plans``      — the query registry: every query paired with its DuckDB
                   oracle SQL (the correctness contract).
- ``streaming``  — Structured Streaming variants (windowed aggs, watermarks).
- ``multimodal`` — binary-column (image/audio) plumbing over mapInPandas.
"""

from hadoop_lab_spark.session import get_spark, tune_session

__version__ = "0.1.0"

__all__ = ["get_spark", "tune_session", "__version__"]
