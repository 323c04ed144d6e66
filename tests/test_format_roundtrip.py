"""Source/sink format coverage: CSV and JSON round-trips with explicit
schemas must preserve values exactly.

The parity surface reads parquet (driver tables) and raw text (labs);
these tests cover the remaining everyday formats — `spark.read.csv`
with schema + header and `spark.read.json` with schema — including the
type fidelity corners (dates, doubles, embedded delimiters, nulls).
"""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("day", T.DateType()),
    ]
)

_ROWS = [
    (1, "plain", 1.5, datetime.date(2024, 1, 2)),
    (2, "comma, inside", -0.25, datetime.date(1999, 12, 31)),
    (3, 'quote " inside', 1e-9, datetime.date(2024, 2, 29)),
    (4, None, None, None),
    (5, "tab\tinside", 12345.678, datetime.date(2024, 6, 30)),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(_ROWS, _SCHEMA)


def _assert_same(df_out, df_in) -> None:
    assert df_out.schema == df_in.schema
    assert sorted(map(tuple, df_out.collect())) == sorted(map(tuple, df_in.collect()))


def test_csv_roundtrip(spark, df, tmp_path):
    path = str(tmp_path / "csv")
    df.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.schema(_SCHEMA).option("header", True).csv(path)
    _assert_same(back, df)


def test_json_roundtrip(spark, df, tmp_path):
    path = str(tmp_path / "json")
    df.write.mode("overwrite").json(path)
    back = spark.read.schema(_SCHEMA).json(path)
    _assert_same(back, df)


def test_csv_malformed_rows_dropped_not_fatal(spark, tmp_path):
    """DROPMALFORMED mirrors the reference's skip-don't-fail discipline
    (SURVEY §2.10.10) at the format-reader level."""
    p = tmp_path / "bad.csv"
    p.write_text("k,name\n1,ok\nnot-a-number,broken\n2,fine\n")
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("name", T.StringType())]
    )
    back = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "DROPMALFORMED")
        .csv(str(p))
    )
    assert {r["k"] for r in back.collect()} == {1, 2}
