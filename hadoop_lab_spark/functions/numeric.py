"""Order-invariant numeric aggregation.

Double-precision SUM is not associative: the result moves at the last
ulp with the order rows reach the accumulator, and that order is a
degree of freedom the engine owns — shuffle partition count, scan-split
boundaries, file listing order, AQE coalescing. ``round(sum(double), 2)``
therefore flips its final digit whenever the accumulated value lands
near a rounding boundary (caught live by ``tests/test_input_layout.py``:
``promo_revenue_share`` returned 804395.40 on a 1-file scan and
804395.41 on a 7-part scan of the SAME rows at sf0.001).

The fix is the one TPC-H itself specifies: money is DECIMAL, and
decimal addition is exact and associative, so the sum is a function of
the row MULTISET alone — any partitioning, any layout, any engine.
``exact_round_sum`` casts the per-row addend to ``DECIMAL(28, 6)``
(deterministic: double→decimal conversion is a per-row scalar op),
sums exactly, rounds, and casts back to double for a driver-hashable
flat schema. The matching oracle idiom is ``sql_exact_round_sum``.

Precision choice: 28 leaves 22 integer digits — hostile fixtures push
1e12 money values through 3-factor products, far inside range, and the
sum accumulator widens to DECIMAL(38, 6) on both engines (≈1e31
headroom; a 100 TB corpus of 1e12-scale addends peaks near 1e22). A
FINITE addend beyond the 22 digits errors LOUDLY on both engines
(Spark 4 runs ANSI by default → NUMERIC_VALUE_OUT_OF_RANGE; DuckDB
CAST raises) — pinned by tests/test_numeric_exact.py, so corrupt
jumbo data can never silently truncate a sum. NaN is the one value
that NULLs instead of erroring on Spark (even under ANSI), which is
why the NaN guard below is a separate explicit contract.
Scale 6 covers the 4–6 fractional digits a product of 2dp money values
carries. Cost at 100 TB: precision > 18 accumulates in Int128 instead
of a compact long — measurably slower than a double sum, which is the
price of a layout-invariant answer; TPC-H's own DECIMAL(15,2) columns
pay the same.

Tie-safety of the double→decimal cast: a 2dp/4dp money value whose
fraction is binary-exact terminates at ≤ 4 decimal digits (digits 5–6
zero — no tie at digit 6); one that is not binary-exact has a ~50-digit
expansion with no exact tie at digit 6, so Spark's HALF_UP and any
other reasonable rounding mode agree on the DECIMAL(28,6) image.

Non-finite addends (NaN/±inf) are the caller's contract, not this
module's: Spark's double→decimal cast silently NULLs them while DuckDB
CAST raises "out of range for INT128" — so any lane summing a column
that can hold NaN MUST exclude it explicitly on both sides (the repo's
standing ADVICE-r3 convention: `F.when(~F.isnan(c), c)` mirrored by
`CASE WHEN NOT isnan(x) THEN x END`; :func:`nan_excluded` /
:func:`sql_nan_excluded` package the pair). An unguarded lane cannot
diverge silently: the differential gates fail LOUDLY with the DuckDB
cast error (exactly how tests/test_adversarial_corpus.py caught the
three lanes that leaned on double-sum NaN-poisoning parity). NULL
interplay is engine-asymmetric but sum-equivalent: Spark isnan(NULL)
is false (addend NULL via the value itself), DuckDB isnan(NULL) is
NULL (CASE falls through to NULL) — both sums skip the row.

The guard must be isnan-based, never a threshold comparison: NaN
COMPARISONS diverge too (measured on the shipped engines: Spark puts
NaN above every value, so ``NaN >= 50`` is true; DuckDB 1.0's
vectorized parquet path yields ``NaN >= 50`` false and ``NaN < 50``
TRUE — and disagrees with its own constant-folded literals). A lane
that thresholds a NaN-capable column must exclude NaN rows first
(``value IS NULL OR NOT isnan(value)``, the existing convention in
null_semantics_sampler / range_join_value_bands).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Decimal type every exact sum accumulates in — see module docstring.
SUM_DECIMAL = "decimal(28,6)"


def exact_sum(col: Column | str) -> Column:
    """Layout/partitioning-invariant SUM: exact decimal accumulation.

    Returns the un-rounded DECIMAL(38,6) sum — compose with rounding or
    further arithmetic; cast before returning it from a lane (driver
    schemas are double).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(SUM_DECIMAL))


def nan_excluded(col: Column | str) -> Column:
    """NaN-guarded addend for :func:`exact_round_sum` over a column that
    can hold NaN (see module docstring: unguarded NaN NULLs on Spark but
    errors the DuckDB oracle). NULLs pass through as NULL either way —
    the sum skips them on both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(~F.isnan(c), c)


def sql_nan_excluded(expr: str) -> str:
    """Oracle-side twin of :func:`nan_excluded` (DuckDB ANSI SQL)."""
    return f"CASE WHEN NOT isnan({expr}) THEN ({expr}) END"


def exact_round_sum(col: Column | str, nd: int = 2) -> Column:
    """``round(sum(col), nd)`` with an exact decimal accumulator,
    returned as DOUBLE. Drop-in replacement for
    ``F.round(F.sum(col), nd)`` wherever the addend is money-like."""
    return F.round(exact_sum(col), nd).cast("double")


def exact_round_avg(col: Column | str, nd: int = 4) -> Column:
    """``round(avg(col), nd)`` made layout-invariant: exact decimal sum,
    cast to double (unique image), then ONE double division by the
    non-null count. Decimal division itself is avoided — result-scale
    rules differ between engines; double÷bigint is IEEE-identical
    everywhere."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(exact_sum(c).cast("double") / F.count(c), nd)


def sql_exact_round_avg(expr: str, nd: int = 4) -> str:
    """Oracle-side twin of :func:`exact_round_avg` (DuckDB ANSI SQL)."""
    return f"round(CAST(sum(CAST(({expr}) AS DECIMAL(28,6))) AS DOUBLE) / count({expr}), {nd})"


def sql_exact_sum(expr: str) -> str:
    """Oracle-side twin of :func:`exact_sum` (DuckDB ANSI SQL)."""
    return f"sum(CAST(({expr}) AS DECIMAL(28,6)))"


def sql_exact_round_sum(expr: str, nd: int = 2) -> str:
    """Oracle-side twin of :func:`exact_round_sum` (DuckDB ANSI SQL)."""
    return f"CAST(round({sql_exact_sum(expr)}, {nd}) AS DOUBLE)"


# ---------------------------------------------------------------------------
# Fast path: micro-long addends (r7, VERDICT r6 #3)
# ---------------------------------------------------------------------------
# Spark's double→decimal cast goes through Double.toString + BigDecimal
# parse — measured at ~45% of pricing_summary's whole wall time once the
# r6 decimal refactor landed (PERFORMANCE.md "r7: micro-long fast
# path"). For addends inside the double-exact rounding zone the same
# 6dp image is reachable without strings: floor(x*1e6 + 0.5) in plain
# IEEE arithmetic, cast LONG→DECIMAL (integer repack, no parse), summed
# exactly in micros, rescaled once per GROUP after the aggregate.
#
# The branch keeps the r6 contract intact:
# - |x| < 2**31 (fast): floor(x*1e6 + 0.5) in doubles. Error budget vs
#   the true decimal micros of a micro-exact (≤6dp) money value below
#   the bound: the input double's own quantization is ≤ 0.5·ulp(2**31)
#   ·1e6 ≈ 0.12 µ and the product rounding ≤ 0.5·ulp(2**31·1e6) ≈
#   0.13 µ — total < 0.25 µ, strictly inside the half-micro window, so
#   the floor IS the true half-up 6dp image. (A first cut used 2**32;
#   hypothesis found a cent value near the bound where the two error
#   terms sum past 0.5 µ — the bound must leave the input-quantization
#   term room, not just the product term.) For addends that are NOT
#   micro-exact decimals (double PRODUCTS like price*(1-disc), whose
#   expansions run past digit 6), the fast image may pick the other
#   side of a 1 µ boundary than the string-image cast in rare rows —
#   a deterministic, per-row, engine-mirrored contract difference
#   bounded by 1 µ per addend, NOT an accumulation artifact; the three
#   converted lanes were additionally verified value-identical to
#   their classic r6 results at sf0.01/0.1/1.0 empirically.
# - |x| >= 2**31 (slow): the SPLIT image — integer part by exact IEEE
#   truncation (x - x % 1.0 is exact at every magnitude: the fraction
#   of a double is always representable, and fmod/subtraction return
#   it exactly), fraction micros by the same floor(+0.5) on |frac|
#   with the sign reapplied (= half-away rounding, matching HALF_UP).
#   The integer part alone goes through a double→decimal(16,0) cast,
#   which is the entire point: the hostile-star gate caught DuckDB's
#   double→decimal cast SCALING IN DOUBLE (CAST((1e12+0.25)*0.5 AS
#   DECIMAL(28,6)) = 500000000000.124992, not .125 — micros above
#   2**53 are not representable mid-flight), so a slow branch defined
#   as "the decimal image of x" means two DIFFERENT images once
#   |x| ≳ 9e9. The split image equals the true half-away 6dp image of
#   the double's exact value (up to the same ±1 µ near-tie ambiguity
#   as the fast branch).
#   LOUD bound at 1e16 (r8, tightened from the r7 (22,0) cast): the
#   two engines build the integer-part decimal DIFFERENTLY — DuckDB
#   from the double's exact binary value, Spark via Double.toString's
#   shortest round-trip string — and those agree only while every
#   integer-valued double still PRINTS as its exact integer. Below
#   1e16 that is a theorem (v < 2**53 is exact; in [2**53, 1e16) the
#   spacing is 2, so distinguishing v from v±2 forces all 16 digits);
#   at 1e16+ the shortest string starts rounding the tail and the r8
#   mixed-branches fuzz caught the two images differing (3.95e19:
#   exact …487552 vs string …490000 — a silent r7 divergence, since
#   (22,0) let such addends through). A double that big has already
#   lost UNIT precision, so a "money" addend there is corrupt data:
#   the (16,0) cast makes both engines error loudly instead of
#   answering differently. NaN/±inf propagate to a NULL addend on
#   Spark (NaN truncation casts to NULL decimal) while the DuckDB
#   twin's cast ERRORS — the classic loud-differential NaN posture;
#   nan_excluded composes as before.
# The final image (r8 form): the rounded micros stay a SCALE-0 decimal
# through the double conversion, then ONE IEEE division by 1e6 yields
# units. The conversion is CORRECTLY ROUNDED on each engine by a
# per-engine route — Spark's decimal→double (BigDecimal.doubleValue)
# natively; DuckDB via VARCHAR (exact digits → strtod), because
# DuckDB's direct int128→double composes fl(upper)·2^64 + fl(lower)
# and double-rounds once |micros| > 2**64 (and is sign-asymmetric
# past 2**53 — the r7 hostile-star finding 2 generalized; both
# measured on 5k fuzzed magnitudes up to 1e31, where the VARCHAR
# route matched CPython's correctly-rounded int→float on all of
# them). Correctly-rounded conversion + one correctly-rounded IEEE
# division by an exact divisor ⇒ the image is engine-identical BY
# CONSTRUCTION for every representable micros sum. The r7 form
# instead rescaled in exact decimal (micros × 0.000001) and converted
# the SCALED decimal — DuckDB converts those as fl(unscaled)·10^-scale
# (two roundings) while Spark single-rounds, so the images diverged
# once the micros exceeded 2**53; the NaN-purchase fixture caught it
# live on a 2 000 000 000 010.000000 sum whose unscaled micros land
# on an exact int128→double tie (DuckDB printed …009.9998) — pinned
# in tests/test_numeric_exact.py. For micros below 2**53 the r7 and
# r8 images agree exactly (conversion exact there, division correctly
# rounds the same rational); past 2**53 the r8 image moves only
# where r7's was already cross-engine divergent. The micros sum is narrowed to DECIMAL(31,0) before
# converting, capping Σ|units| at 1e25 per group (classic: 1e32; both
# absurdly above any real corpus, both ANSI-loud on breach).
# Both branches are per-row deterministic and the accumulation is exact
# integer decimal — layout/partitioning invariance holds as for
# :func:`exact_round_sum`. Cross-path equality at the branch boundary
# is never required because the branch predicate is part of the
# contract and is mirrored on both engines.
#
# NOTE on the CLASSIC helpers' domain, recorded while fixing this: the
# classic oracle idiom CAST(x AS DECIMAL(28,6)) carries the same
# DuckDB double-scaling limitation, so exact_round_sum's cross-engine
# image agreement is guaranteed only where the addend's true micros
# are double-representable (|x| ≲ 9e9, or exactly-representable
# micros like round 1e12 values — every shipped corpus qualifies);
# a lane whose addends can exceed that domain should use the fast
# helpers, whose split image agrees by construction up to the LOUD
# 1e16 addend bound (beyond which both engines error instead of
# diverging). The classic final
# CAST(... AS DOUBLE) additionally inherits DuckDB's sign-asymmetric
# decimal→double conversion (sign-asymmetric past 2**53 unscaled —
# hostile-star r7 finding 2) for
# NEGATIVE sums beyond ~9e9 units — also out of every shipped
# corpus's range, also fixed in the fast twins.

#: Fast-path magnitude bound — see error budget above.
FAST_ABS_BOUND = 2147483648.0  # 2**31


def micro_addend(col: Column | str) -> Column:
    """Per-row addend in exact integer MICROS (scale-0 decimal) — the
    fast-path building block, public for operators that must hold the
    accumulator OPEN across batches (streaming state stores sum these
    micros exactly per micro-batch; :func:`round_micros_to_double`
    finishes the snapshot). Batch lanes should use the composed
    :func:`exact_round_sum_fast` family instead."""
    c = F.col(col) if isinstance(col, str) else col
    fast = F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("decimal(22,0)")
    frac = c % F.lit(1.0)  # exact IEEE: the fraction of a double is representable
    frac_mic = F.floor(F.abs(frac) * F.lit(1e6) + F.lit(0.5))  # LONG, half-away w/ sign below
    slow = (
        # (16,0) enforces the loud 1e16 bound; the (22,0) re-cast widens
        # the backing type so the ×1e6 repack cannot overflow int64
        (c - frac).cast("decimal(16,0)").cast("decimal(22,0)")
        * F.lit(1000000).cast("decimal(7,0)")
        + F.when(c < 0, -frac_mic).otherwise(frac_mic).cast("decimal(22,0)")
    )
    return F.when(F.abs(c) < F.lit(FAST_ABS_BOUND), fast).otherwise(slow)


def _sql_micro_addend(expr: str) -> str:
    """Oracle-side twin of :func:`micro_addend` (DuckDB ANSI SQL)."""
    e = f"({expr})"
    frac_mic = f"floor(abs({e} % 1.0) * 1e6 + 0.5)"
    return (
        f"CASE WHEN abs{e} < 2147483648.0 "
        f"THEN CAST(CAST(floor({e} * 1e6 + 0.5) AS BIGINT) AS DECIMAL(22,0)) "
        f"ELSE CAST(CAST({e} - ({e} % 1.0) AS DECIMAL(16,0)) AS DECIMAL(22,0))"
        f" * CAST(1000000 AS DECIMAL(7,0))"
        f" + CAST(CASE WHEN {e} < 0 THEN -{frac_mic} ELSE {frac_mic} END"
        f" AS DECIMAL(22,0)) END"
    )


def exact_sum_double_fast(col: Column | str) -> Column:
    """Un-rounded fast-path sum as DOUBLE units: exact micros sum,
    narrowed to DECIMAL(31,0) (ANSI-loud past Σ|units| = 1e25 per
    group), one scale-0 decimal→double conversion (correctly rounded
    on both engines at any magnitude), one IEEE division by 1e6.
    The composition sites (q8 mkt_share ratio, q17 /7.0) do further
    IEEE arithmetic on this value identically on both engines."""
    return F.sum(micro_addend(col)).cast("decimal(31,0)").cast("double") / F.lit(1e6)


def sql_exact_sum_double_fast(expr: str) -> str:
    """Oracle-side twin of :func:`exact_sum_double_fast`. The VARCHAR
    hop makes DuckDB's wide-decimal→double correctly rounded (block
    comment above); Spark needs no hop."""
    return (
        f"(CAST(CAST(CAST(sum({_sql_micro_addend(expr)}) AS DECIMAL(31,0))"
        f" AS VARCHAR) AS DOUBLE) / 1e6)"
    )


def exact_round_sum_fast(col: Column | str, nd: int = 2) -> Column:
    """:func:`exact_round_sum` with the micro-long fast path. Same
    layout-invariance and loud-overflow posture; the final image is
    engine-identical at any magnitude (scale-0 micros→double + one
    IEEE division — see the fast-path block comment). Use on hot
    scan-side money sums; the plain helper remains the default."""
    return round_micros_to_double(F.sum(micro_addend(col)), nd)


def round_micros_to_double(sum_micros: Column, nd: int = 2) -> Column:
    """Finish an OPEN micros accumulator (a sum of :func:`micro_addend`
    values, possibly re-aggregated across micro-batches or partial
    sinks): round to ``nd`` decimals, narrow to DECIMAL(31,0) micros
    (ANSI-loud past Σ|units| = 1e25), convert the SCALE-0 decimal to
    double (single int128→double, correctly rounded on both engines),
    divide by 1e6 in IEEE — the exact finisher
    :func:`exact_round_sum_fast` applies, split out so streaming state
    stores can keep integer micros between batches and stay
    micro-batch-boundary invariant.

    Accuracy bound (ADVICE r8): the composed image (correctly-rounded
    micros→double, then an IEEE /1e6) can sit up to ~1.5 ulp from the
    true rounded value — each step is ≤0.5 ulp but they compound, e.g.
    exact 2000000000010.00 → 2000000000009.9998 past 2**53 micros.
    The trade is deliberate: the image is ENGINE-IDENTICAL at any
    magnitude (both engines compose the same two steps), which is what
    the differential gate needs; a single direct conversion would be
    ≤0.5 ulp but engine-divergent past 2**53. Full analysis in the
    fast-path block comment above and PERFORMANCE.md r8."""
    micros = F.round(sum_micros, nd - 6).cast("decimal(31,0)")
    return micros.cast("double") / F.lit(1e6)


def sql_exact_round_sum_fast(expr: str, nd: int = 2) -> str:
    """Oracle-side twin of :func:`exact_round_sum_fast` (VARCHAR hop:
    see :func:`sql_exact_sum_double_fast`)."""
    return (
        f"(CAST(CAST(CAST(round(sum({_sql_micro_addend(expr)}), {nd - 6})"
        f" AS DECIMAL(31,0)) AS VARCHAR) AS DOUBLE) / 1e6)"
    )


def exact_round_avg_fast(col: Column | str, nd: int = 4) -> Column:
    """:func:`exact_round_avg` with the micro-long fast path: exact
    micros sum, scale-0 decimal→double (engine-identical), /1e6 to
    units, one further double division by the non-null count, round —
    every IEEE step mirrored in the SQL twin. Narrowing bound:
    Σ|units| < 1e25 per group (DECIMAL(31,0) micros), ANSI-loud on
    breach — same cap as the sum helper."""
    c = F.col(col) if isinstance(col, str) else col
    units = exact_sum_double_fast(c)
    return F.round(units / F.count(c), nd)


def sql_exact_round_avg_fast(expr: str, nd: int = 4) -> str:
    """Oracle-side twin of :func:`exact_round_avg_fast`."""
    return f"round({sql_exact_sum_double_fast(expr)} / count({expr}), {nd})"
