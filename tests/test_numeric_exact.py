"""Property tests for functions/numeric.py: the exact decimal money sum
must be (a) equal to an independent pure-Python exact model and (b) a
function of the row MULTISET alone — invariant to any permutation and
any partitioning of the input. This is the unit-level twin of the
end-to-end layout gate (tests/test_input_layout.py): that gate proves
whole lanes don't care how the scan is split; this one proves the
accumulator primitive itself, under hypothesis-driven adversarial
values (cent-exact money, 6dp products, jumbo 1e12 magnitudes, values
engineered near .xx5 rounding boundaries where the double sum's last
ulp decides the rounded digit).
"""

from __future__ import annotations

import decimal

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from hadoop_lab_spark.functions.numeric import (
    FAST_ABS_BOUND,
    exact_round_avg,
    exact_round_avg_fast,
    exact_round_sum,
    exact_round_sum_fast,
    nan_excluded,
    sql_exact_round_avg_fast,
    sql_exact_round_sum_fast,
)

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# Money-like addends: integer cents (2dp) and 6dp micro-values, spanning
# tiny to hostile-jumbo magnitudes. Drawing CENTS as integers keeps the
# double binary-exact enough that the Python model below (exact Decimal
# arithmetic over the double's true value) is the indisputable answer.
_cents = st.integers(min_value=-(10**14), max_value=10**14)
_micros = st.integers(min_value=-(10**12), max_value=10**12)


def _model_round_sum(values: list[float], nd: int = 2) -> float | None:
    """Independent exact model: sum the doubles' TRUE values (Decimal(x)
    is exact for any float), quantize at 6dp HALF_UP per addend (the
    DECIMAL(28,6) cast image), sum exactly, round HALF_UP at nd."""
    if not values:
        return None
    q6 = decimal.Decimal(1).scaleb(-6)
    total = sum(
        decimal.Decimal(v).quantize(q6, rounding=decimal.ROUND_HALF_UP)
        for v in values
    )
    qn = decimal.Decimal(1).scaleb(-nd)
    return float(total.quantize(qn, rounding=decimal.ROUND_HALF_UP))


def _spark_sums(spark, values: list[float], n_parts: int) -> tuple[float, float]:
    """(exact_round_sum, exact_round_avg) over `values` split across
    n_parts partitions in reversed order."""
    rows = [(v,) for v in values]
    df = spark.createDataFrame(rows, "v double").repartition(n_parts)
    out = df.agg(
        exact_round_sum("v").alias("s"),
        exact_round_avg("v").alias("a"),
    ).collect()[0]
    return out["s"], out["a"]


@given(st.lists(_cents, min_size=1, max_size=60))
@_SETTINGS
def test_exact_round_sum_matches_model_and_layout(spark, cents):
    values = [c / 100.0 for c in cents]
    expected = _model_round_sum(values)
    s1, _ = _spark_sums(spark, values, 1)
    s2, _ = _spark_sums(spark, list(reversed(values)), 7)
    assert s1 == expected, (values, s1, expected)
    assert s2 == expected, "permuted/repartitioned input moved the exact sum"


@given(st.lists(_micros, min_size=1, max_size=60))
@_SETTINGS
def test_exact_round_sum_6dp_products(spark, micros):
    # 6dp values (the worst fractional digits a money product carries)
    values = [m / 1_000_000.0 for m in micros]
    expected = _model_round_sum(values)
    s1, _ = _spark_sums(spark, values, 3)
    assert s1 == expected, (values, s1, expected)


def test_boundary_case_from_the_layout_gate(spark):
    """The class of input that motivated the refactor: many cent-exact
    addends whose DOUBLE sum lands within an ulp of a .xx5 boundary.
    0.01 is not binary-exact; 288 × 6.10 accumulates enough error that
    float addition order decides round(x, 2)'s last digit — decimal
    accumulation must not care."""
    values = [6.10] * 288
    expected = _model_round_sum(values)  # exactly 1756.80
    assert expected == 1756.80
    for parts in (1, 7, 32):
        s, _ = _spark_sums(spark, values, parts)
        assert s == expected, f"{parts} partitions: {s} != {expected}"


def test_exact_round_avg_matches_model(spark):
    values = [0.1] * 30 + [123456.78, -99999.99]
    q6 = decimal.Decimal(1).scaleb(-6)
    total = sum(
        decimal.Decimal(v).quantize(q6, rounding=decimal.ROUND_HALF_UP)
        for v in values
    )
    expected = round(float(total) / len(values), 4)
    _, a = _spark_sums(spark, values, 5)
    assert a == pytest.approx(expected, abs=0.0)


def test_out_of_range_addend_contract(spark):
    """Pin the documented range edge: an addend beyond DECIMAL(28,6)'s
    22 integer digits (~1e22) ERRORS on BOTH engines — Spark 4 runs
    ANSI mode by default (NUMERIC_VALUE_OUT_OF_RANGE at the cast; the
    repo sets no ansi override anywhere, asserted below) and DuckDB's
    CAST raises out-of-range. Loud on both sides: a fixture pushing
    such a value can never make the engines silently agree on a
    truncated sum. In-range jumbo values (the hostile 1e12 money tier)
    must sum exactly."""
    from hadoop_lab_spark import session as S

    assert not any("ansi" in k for k in {**S._STATIC_CONF, **S._RUNTIME_CONF})
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"

    jumbo = 1.0e12  # hostile-fixture tier: inside range, exact
    df = spark.createDataFrame([(jumbo,), (0.25,)], "v double")
    out = df.agg(exact_round_sum("v").alias("s")).collect()[0]
    assert out["s"] == 1.0e12 + 0.25

    from pyspark.errors.exceptions.captured import ArithmeticException

    over = 1.0e30  # beyond 22 integer digits
    df2 = spark.createDataFrame([(over,), (0.25,)], "v double")
    with pytest.raises(ArithmeticException):
        df2.agg(exact_round_sum("v").alias("s")).collect()

    import duckdb

    con = duckdb.connect()
    try:
        with pytest.raises(duckdb.Error):
            con.execute("SELECT CAST(1e30 AS DECIMAL(28,6))")
    finally:
        con.close()


# ---------------------------------------------------------------------------
# Micro-long fast path (r7): same contract, string-free addend
# ---------------------------------------------------------------------------
def _model_round_sum_fast(values: list[float], nd: int = 2) -> float | None:
    """Independent exact model of exact_round_sum_fast: fast addends are
    floor(v*1e6 + 0.5) in IEEE double arithmetic (Python floats ARE
    IEEE doubles, so `math.floor(v * 1e6 + 0.5)` walks Spark's exact
    steps); slow addends are the decimal-image micros. The micros sum
    exactly, round HALF_UP at 10^(6-nd), then the r8 finisher: ONE
    correctly-rounded int→double of the SCALE-0 micros (CPython's
    float(int) is correctly rounded, like Spark's decimal→double and
    the oracle's VARCHAR-routed cast), then ONE IEEE division by 1e6
    — mirrored operation-for-operation. (The r7 finisher converted the
    decimal-rescaled UNITS instead; DuckDB double-rounds that scaled
    conversion above 2**53 micros — the nan-purchase 2e12+10 tie
    catch, see functions/numeric.py block comment.)"""
    import math

    if not values:
        return None
    total = decimal.Decimal(0)
    for v in values:
        if abs(v) < FAST_ABS_BOUND:
            total += decimal.Decimal(math.floor(v * 1e6 + 0.5))
        else:
            # Split image: exact truncation + half-away fraction micros
            # (the engines' slow branch, walked in the same IEEE steps).
            frac = math.fmod(v, 1.0)
            frac_mic = math.floor(abs(frac) * 1e6 + 0.5)
            total += decimal.Decimal(v - frac) * 10**6 + (
                -frac_mic if v < 0 else frac_mic
            )
    rounded = total.quantize(
        decimal.Decimal(1).scaleb(6 - nd), rounding=decimal.ROUND_HALF_UP
    )
    return float(int(rounded)) / 1e6


def _spark_fast_sums(spark, values: list[float], n_parts: int):
    rows = [(v,) for v in values]
    df = spark.createDataFrame(rows, "v double").repartition(n_parts)
    out = df.agg(
        exact_round_sum_fast("v").alias("s"),
        exact_round_avg_fast("v").alias("a"),
    ).collect()[0]
    return out["s"], out["a"]


@given(st.lists(_cents, min_size=1, max_size=60))
@_SETTINGS
def test_fast_sum_matches_model_classic_and_layout(spark, cents):
    """Money-like addends: the fast path must equal its own exact model,
    equal the CLASSIC decimal-image sum wherever that equivalence is a
    THEOREM (group micros within 2**53 — beyond it the classic DuckDB
    twin's scaled decimal→double conversion double-rounds, the very
    divergence the r8 finisher fixed, so bit-equality to classic is
    neither achievable nor wanted there), and not care about
    permutation/partitioning."""
    values = [c / 100.0 for c in cents]
    expected = _model_round_sum_fast(values)
    if abs(sum(cents)) * 10**4 < 2**53:
        assert expected == _model_round_sum(values), "models diverge on money"
    s1, _ = _spark_fast_sums(spark, values, 1)
    s2, _ = _spark_fast_sums(spark, list(reversed(values)), 7)
    assert s1 == expected, (values, s1, expected)
    assert s2 == expected, "permuted/repartitioned input moved the fast sum"


@given(st.lists(_micros, min_size=1, max_size=60))
@_SETTINGS
def test_fast_sum_6dp_products(spark, micros):
    values = [m / 1_000_000.0 for m in micros]
    expected = _model_round_sum_fast(values)
    assert expected == _model_round_sum(values), "models diverge on 6dp"
    s1, _ = _spark_fast_sums(spark, values, 3)
    assert s1 == expected, (values, s1, expected)


def test_fast_slow_branch_and_out_of_range(spark):
    """Jumbo values ride the slow (split-image) branch: 1e12+0.25 is
    above FAST_ABS_BOUND and must sum exactly; at 1e16 and beyond both
    engines ERROR loudly (r8: above double integer precision the
    shortest-string and exact-value integer images diverge — see the
    numeric.py slow-branch comment — so the cast refuses instead of
    letting the engines answer differently)."""
    import duckdb

    df = spark.createDataFrame([(1.0e12 + 0.25,), (0.25,)], "v double")
    out = df.agg(exact_round_sum_fast("v").alias("s")).collect()[0]
    assert out["s"] == 1.0e12 + 0.5

    from pyspark.errors.exceptions.captured import ArithmeticException

    for jumbo in (1.0e16, 5e21, 1.0e30):
        df2 = spark.createDataFrame([(jumbo,), (0.25,)], "v double")
        with pytest.raises(ArithmeticException):
            df2.agg(exact_round_sum_fast("v").alias("s")).collect()
        con = duckdb.connect()
        try:
            with pytest.raises(duckdb.Error):
                con.execute(
                    f"SELECT {sql_exact_round_sum_fast('v')}"
                    f" FROM (VALUES ({jumbo!r}), (0.25)) AS t(v)"
                ).fetchone()
        finally:
            con.close()


def test_fast_sql_twin_mixed_branches(spark):
    """The DuckDB twin must reproduce the Spark fast sum/avg
    bit-for-bit on a mix that exercises both branches, negatives,
    sub-cent values, a jumbo 5e21 addend (slow split image far beyond
    double-representable micros), and the exact class the hostile-star
    gate caught: a slow-branch value whose group sum lands on a
    half-cent (500000000000.125 + 0.25 → x.375 — DuckDB's plain
    double→decimal CAST scales in double and lands on .374992 there,
    which is why the slow branch is a SPLIT image, not a cast)."""
    import duckdb

    def spark_agg(vals, col):
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        return df.agg(col.alias("x")).collect()[0]["x"]

    def duck(vals, expr):
        con = duckdb.connect()
        try:
            rows = ",".join(f"({v!r})" for v in vals)
            return con.execute(
                f"SELECT {expr} FROM (VALUES {rows}) AS t(v)"
            ).fetchone()[0]
        finally:
            con.close()

    mixes = [
        # 8765432109876543.0 is an odd 16-digit integer in [2**53, 1e16):
        # spacing-2 territory where the shortest-string and exact-value
        # integer images still provably coincide (numeric.py slow-branch
        # comment) — the largest legal addend class
        [1.0, 0.07, -3.335, 1e12 + 0.25, 8765432109876543.0,
         2147483647.9, 2147483648.5],
        [(1e12 + 0.25) * 0.5, 0.25],  # hostile-star half-cent case → x.38
        [-(1e12 + 0.25) * 0.5, -0.25],  # negative twin → away-rounding
        # r8 finisher catch, pinned live from the nan-purchase run:
        # 2e12+10 — its micros land on an EXACT int128→double tie past
        # 2**53, where DuckDB's scaled-decimal cast printed …009.9998
        [1e12, 1e12, 10.0],
        [-1e12, -1e12, -10.0],
        # group micros past 2**64 (3 × ~9e15 units): DuckDB's direct
        # int128→double composes fl(upper)·2^64 + fl(lower) and
        # double-rounds — the VARCHAR hop in the sql twins is what
        # keeps these equal
        [9.007e15, 9.007e15, 9.007e15, 0.25],
        [-9.007e15, -9.007e15, -9.007e15, -0.25],
    ]
    for vals in mixes:
        s = spark_agg(vals, exact_round_sum_fast("v"))
        o_s = duck(vals, sql_exact_round_sum_fast("v"))
        assert repr(s) == repr(o_s), (vals, s, o_s)
        assert s == _model_round_sum_fast(vals), (vals, s)
        a = spark_agg(vals, exact_round_avg_fast("v"))
        o_a = duck(vals, sql_exact_round_avg_fast("v"))
        assert repr(a) == repr(o_a), (vals, a, o_a)
    # The half-cent group must round away on both engines.
    assert spark_agg(mixes[1], exact_round_sum_fast("v")) == 500000000000.38
    assert spark_agg(mixes[2], exact_round_sum_fast("v")) == -500000000000.38


def test_fast_nan_posture(spark):
    """NaN rides the slow branch (abs(NaN) < bound is false), so the
    posture is IDENTICAL to exact_round_sum: Spark silently NULLs the
    addend, the DuckDB twin ERRORS — an unguarded NaN lane fails
    loudly in the differential; nan_excluded composes as before."""
    import duckdb

    df = spark.createDataFrame(
        [(1.25,), (float("nan"),), (None,), (2.50,)], "v double"
    )
    out = df.agg(
        exact_round_sum_fast(nan_excluded("v")).alias("s")
    ).collect()[0]
    assert out["s"] == 3.75
    unguarded = df.agg(exact_round_sum_fast("v").alias("s")).collect()[0]
    assert unguarded["s"] == 3.75, "Spark silently drops the NaN addend"
    con = duckdb.connect()
    try:
        with pytest.raises(duckdb.Error):
            con.execute(
                f"SELECT {sql_exact_round_sum_fast('v')} FROM "
                "(VALUES (1.25), (CAST('nan' AS DOUBLE)), (2.50)) AS t(v)"
            )
    finally:
        con.close()


def test_nan_excluded_guard(spark):
    """NaN addends are dropped (they'd NULL silently through the Spark
    cast while ERRORING the DuckDB oracle — numeric.py contract); NULLs
    pass through as NULL; the finite part still sums exactly."""
    df = spark.createDataFrame(
        [(1.25,), (float("nan"),), (None,), (2.50,)], "v double"
    )
    out = df.agg(exact_round_sum(nan_excluded("v")).alias("s")).collect()[0]
    assert out["s"] == 3.75
    all_bad = spark.createDataFrame([(float("nan"),), (None,)], "v double")
    out2 = all_bad.agg(exact_round_sum(nan_excluded("v")).alias("s")).collect()[0]
    assert out2["s"] is None, "sum over only NaN/NULL must stay NULL"


def test_finisher_image_engine_identical_bulk(spark):
    """Batched cross-engine fuzz of the r8 FINISHER alone (micros→double):
    400 seeded pseudo-random micros sums spanning 1e3..1e27 — through
    the >2**53 and >2**64 zones where DuckDB's direct conversions
    double-round — must produce the identical double on Spark
    (native decimal→double + /1e6) and DuckDB (VARCHAR hop + /1e6),
    and both must equal the independent correctly-rounded model
    (CPython int→float is correctly rounded). One Spark job, one
    DuckDB query — per-value fuzzing at lane level would cost minutes.
    Deterministic LCG, not random: the examples are pinned forever."""
    import duckdb

    vals, x = [], 88172645463325252
    for i in range(400):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        mag = 10 ** (3 + (x % 25))
        v = (x % mag) * (1 if (x >> 8) % 2 else -1)
        vals.append(v)

    # Spark: the exact finisher steps round_micros_to_double applies
    # after the per-group ROUND (values are already scale-0 here).
    df = spark.createDataFrame(
        [(str(v),) for v in vals], "m string"
    ).select(
        (F.col("m").cast("decimal(31,0)").cast("double") / F.lit(1e6)).alias("d")
    )
    got_spark = [r["d"] for r in df.collect()]

    con = duckdb.connect()
    try:
        rows = ",".join(f"('{v}')" for v in vals)
        got_duck = [
            r[0]
            for r in con.execute(
                "SELECT CAST(CAST(CAST(m AS DECIMAL(31,0)) AS VARCHAR) AS DOUBLE)"
                f" / 1e6 FROM (VALUES {rows}) AS t(m)"
            ).fetchall()
        ]
    finally:
        con.close()

    model = [float(v) / 1e6 for v in vals]
    assert got_spark == model, "Spark finisher image diverged from model"
    assert got_duck == model, "DuckDB finisher image diverged from model"
