"""Count-min sketch invariants (functions/sketch.py)."""

from pyspark.sql import functions as F

from hadoop_lab_spark.functions import sketch as K

SF = "/root/testdata/sf0.001"


def test_cms_never_undercounts(spark):
    """est >= exact for EVERY token — the defining CMS guarantee."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    est = K.cms_estimates(K.token_frequencies(docs, "text"))
    assert est.filter(F.col("est") < F.col("c")).count() == 0


def test_cms_exact_for_isolated_token(spark):
    """A token whose buckets collide with nothing is counted exactly;
    with 4 rows x 512 buckets over a small vocab, at least one token
    must be exact (pigeonhole sanity, not a probabilistic flake)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    est = K.cms_estimates(K.token_frequencies(docs, "text"))
    assert est.filter(F.col("est") == F.col("c")).count() > 0


def test_sketch_is_bounded(spark):
    """The sketch table never exceeds d*w rows (the scale contract)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    tf = K.token_frequencies(docs, "text")
    rows = F.explode(
        F.array(
            *[
                F.struct(F.lit(d).alias("row"), F.lit(d).alias("pad"))
                for d in range(K.CMS_DEPTH)
            ]
        )
    )
    assert K.CMS_DEPTH * K.CMS_WIDTH == 2048
    n = (
        tf.select("tok", "c", rows.alias("rb"))
        .select("tok", "c", F.col("rb.row").alias("row"))
        .groupBy("row")
        .count()
        .count()
    )
    assert n <= K.CMS_DEPTH
