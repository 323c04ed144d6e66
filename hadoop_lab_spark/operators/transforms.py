"""Row-level scalar transforms (SURVEY.md §2.3).

Pure Column-expression builders — they run inside whole-stage codegen,
below any shuffle, so at 100 TB they cost one pass over the scan and
nothing more. No Python executes per row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


#: Grade boundaries of lab4 (`lab4/StudentGrades.sh:91-103`): ≥90 A,
#: ≥80 B, ≥70 C, ≥60 D, else F — exact parity rule SURVEY §2.10.2.
GRADE_BOUNDARIES: tuple[tuple[int, str], ...] = (
    (90, "A"),
    (80, "B"),
    (70, "C"),
    (60, "D"),
)


def bucketize(
    value: Column | str,
    boundaries: Sequence[tuple[float, str]] = GRADE_BOUNDARIES,
    default: str = "F",
) -> Column:
    """CASE-chain bucketing (lab4's marks→letter, SURVEY §2.3 T2).

    Boundaries are (threshold, label) pairs checked in order with ``>=``,
    exactly mirroring the reference's if/else ladder.
    """
    col = F.col(value) if isinstance(value, str) else value
    expr: Column | None = None
    for threshold, label in boundaries:
        clause = (col >= threshold, F.lit(label))
        expr = F.when(*clause) if expr is None else expr.when(*clause)
    assert expr is not None, "need at least one boundary"
    return expr.otherwise(F.lit(default))


def classify_threshold(
    value: Column | str,
    threshold: float = 30,
    above: str = "Shiny",
    below: str = "Cool",
) -> Column:
    """Binary threshold classification (lab7, `lab7/WeatherAnalyzer.sh:92`).

    Boundary is inclusive: ``value >= threshold`` → ``above``
    (SURVEY §2.10.3 — 30 classifies as Shiny).
    """
    col = F.col(value) if isinstance(value, str) else value
    return F.when(col >= threshold, F.lit(above)).otherwise(F.lit(below))


def row_greatest(*cols: Column | str) -> Column:
    """Horizontal per-row max (lab6, `lab6/MaxElectricityConsumption.sh:90-96`).

    The reference loops over monthly columns *excluding* the trailing
    annual_avg (`lab6:93`) — callers express that by simply not passing
    the excluded column. Evaluated map-side, below the aggregate, so the
    shuffle carries one value per row, not the whole wide row.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    if len(cs) == 1:
        return cs[0]
    return F.greatest(*cs)


def try_int(col: Column | str) -> Column:
    """Failure-tolerant int cast — skip-don't-fail discipline.

    The reference drops rows where ``Integer.parseInt`` throws
    (`lab3/HighestTemperature.sh:90-92`); the Spark-native equivalent is
    try_cast + an isNotNull filter downstream (SURVEY §1.2, §2.2 P4).
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("int")
