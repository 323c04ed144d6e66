"""Differential parity tests on the reference's OWN bundled datasets.

Runs each lab pipeline on the exact input file the reference job ships
(read-only from /root/reference; skipped when absent) and compares
against an independent pure-Python reimplementation of the Java
mapper/reducer semantics — a second implementation, not shared code, so
a bug in the Spark pipeline can't hide in the expectation.

Where the reference is non-deterministic (collect order, argmax ties —
SURVEY §2.10.7-8) the Python twin applies our documented deterministic
policy (sorted elements, smallest witness), matching labs.py.
"""

from __future__ import annotations

import os
import re
from collections import Counter, defaultdict

import pytest

from hadoop_lab_spark import labs

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)


def _read(path: str) -> list[str]:
    with open(path, encoding="utf-8", newline="") as f:
        return f.read().splitlines()


def _rows(df) -> set[tuple]:
    return {tuple(r) for r in df.collect()}


def _grade(m: int) -> str:
    return "A" if m >= 90 else "B" if m >= 80 else "C" if m >= 70 else "D" if m >= 60 else "F"


def test_lab2_reference_input(spark):
    words = Counter()
    for line in _read(f"{REF}/lab2/input2.txt"):
        for tok in re.split(r"[ \t\n\r\f]+", line):
            if tok:
                words[tok] += 1
    got = _rows(labs.lab2_wordcount(spark, f"{REF}/lab2/input2.txt"))
    assert got == {(w, c) for w, c in words.items()}


def test_lab3_reference_input(spark):
    best: dict[str, int] = {}
    for line in _read(f"{REF}/lab3/Temperature.txt"):
        parts = re.split(r"\s+", line.strip())
        if len(parts) != 2:
            continue
        try:
            temp = int(parts[1])
        except ValueError:
            continue
        year = parts[0]
        best[year] = max(best.get(year, temp), temp)
    got = _rows(labs.lab3_highest_temperature(spark, f"{REF}/lab3/Temperature.txt"))
    assert got == {(y, t) for y, t in best.items()}
    # the BOM'd header really was dropped by cast failure, not by accident
    assert not any(y.lstrip("﻿").lower() == "year" for y, _ in got)


def test_lab4_reference_input(spark):
    per_student = defaultdict(list)
    for line in _read(f"{REF}/lab4/input4.txt"):
        parts = line.split(",")
        if len(parts) != 3:
            continue
        try:
            marks = int(parts[2].strip())
        except ValueError:
            continue
        per_student[parts[0].strip()].append(f"{parts[1].strip()}:{_grade(marks)}")
    expected = {(s, ", ".join(sorted(v))) for s, v in per_student.items()}
    got = _rows(labs.lab4_student_grades(spark, f"{REF}/lab4/input4.txt"))
    assert got == expected


def test_lab5_reference_input(spark):
    a: dict[tuple[int, int], int] = {}
    b: dict[tuple[int, int], int] = {}
    for line in _read(f"{REF}/lab5/input5.txt"):
        parts = line.split(",")
        if len(parts) < 4:
            continue
        tag, i, j, v = parts[0].strip(), int(parts[1]), int(parts[2]), int(parts[3])
        (a if tag == "A" else b)[(i, j)] = v
    prod: dict[tuple[int, int], int] = defaultdict(int)
    for (ai, ak), av in a.items():
        for (bk, bj), bv in b.items():
            if ak == bk:
                prod[(ai, bj)] += av * bv
    expected = {(f"{i},{j}", v) for (i, j), v in prod.items()}
    got = _rows(labs.lab5_matrix_multiply(spark, f"{REF}/lab5/input5.txt"))
    assert got == expected
    # SURVEY §5: C = [[19,22],[43,50]]
    assert ("0,0", 19) in got and ("1,1", 50) in got


def test_lab6_reference_input(spark):
    best: dict[str, int] = {}
    for line in _read(f"{REF}/lab6/electric_consumption.txt"):
        parts = re.split(r"\s+", line.strip())
        if len(parts) < 3 or parts[0].lower() == "year":
            continue
        try:
            row_max = max(int(p) for p in parts[1:-1])
        except ValueError:
            continue  # row-skip on any bad month (try wraps the loop)
        best[parts[0]] = max(best.get(parts[0], row_max), row_max)
    got = _rows(labs.lab6_max_electricity(spark, f"{REF}/lab6/electric_consumption.txt"))
    assert got == {(y, m) for y, m in best.items()}


def test_lab7_reference_input(spark):
    expected = set()
    for line in _read(f"{REF}/lab7/input7.txt"):
        if not line.strip():
            continue
        parts = re.split(r"\s+", line.strip())
        if len(parts) < 2 or parts[0].lower() == "date":
            continue
        try:
            t = int(parts[1])
        except ValueError:
            continue
        expected.add((parts[0], "Shiny" if t >= 30 else "Cool"))
    got = _rows(labs.lab7_weather(spark, f"{REF}/lab7/input7.txt"))
    assert got == expected
    # boundary rule: the 30-degree day classifies Shiny (SURVEY §2.10.3)
    assert all(w == "Shiny" for d, w in expected if d == "2025-03-21")


def test_lab8_reference_input(spark):
    counts = Counter()
    for line in _read(f"{REF}/lab8/productsSold_dataset.txt"):
        if line.startswith("Transaction"):
            continue
        fields = line.split(",")
        if len(fields) > 8:
            counts[fields[8].strip()] += 1
    got = _rows(labs.lab8_product_sales(spark, f"{REF}/lab8/productsSold_dataset.txt"))
    assert got == {(c, n) for c, n in counts.items()}


def test_lab9_reference_input(spark):
    tags = defaultdict(list)
    for line in _read(f"{REF}/lab9/input9.txt"):
        fields = line.split("::")
        if len(fields) >= 3:
            tags[fields[1].strip()].append(fields[2].strip())
    expected = {(m, ", ".join(sorted(v))) for m, v in tags.items()}
    got = _rows(labs.lab9_movie_tags(spark, f"{REF}/lab9/input9.txt"))
    assert got == expected


def test_lab10_reference_input(spark):
    counts = Counter()
    for line in _read(f"{REF}/lab10/Books-mini.csv"):
        if line.startswith("ISBN"):
            continue
        fields = line.split(",")
        if len(fields) > 3:
            counts[fields[3].strip()] += 1
    expected = {(y, n) for y, n in counts.items()}
    got = _rows(labs.lab10_book_publications(spark, f"{REF}/lab10/Books-mini.csv"))
    assert got == expected


def test_lab11_reference_input(spark):
    per_date = defaultdict(list)
    for line in _read(f"{REF}/lab11/uber_dataset.csv"):
        if line.startswith("dispatching_base_number"):
            continue
        fields = line.split(",")
        if len(fields) >= 4:
            try:
                trips = int(fields[3].strip())
            except ValueError:
                continue
            per_date[fields[1].strip()].append((fields[0].strip(), trips))
    expected = set()
    for date, pairs in per_date.items():
        mx = max(t for _, t in pairs)
        base = min(b for b, t in pairs if t == mx)  # deterministic tie policy
        expected.add((date, base, mx))
    got = _rows(labs.lab11_uber_trips(spark, f"{REF}/lab11/uber_dataset.csv"))
    assert got == expected
