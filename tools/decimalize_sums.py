"""One-shot codemod: convert layout-dependent double SUM/AVG aggregates
to exact decimal accumulation (functions/numeric.py) in both the Spark
lane code and its DuckDB oracle string.

Rewrites, with balanced-paren argument matching:
  F.round(F.sum(X), n)  -> exact_round_sum(X, n)      [.agg sites only]
  F.round(F.avg(X), n)  -> exact_round_avg(X, n)
  round(sum(X), n)      -> CAST(round(sum(CAST(X AS DECIMAL(28,6))), n) AS DOUBLE)
  round(avg(X), n)      -> round(CAST(sum(CAST(X AS DECIMAL(28,6))) AS DOUBLE) / count(X), n)

Window sites (`.over(`) are intentionally left alone: their ORDER BY
fixes the accumulation order, so they are already layout-invariant.
Run once, review `git diff`, delete nothing automatically.
"""

from __future__ import annotations

import re
import sys


def _match_call(text: str, start: int) -> int:
    """Given index of '(' return index just past matching ')'."""
    depth = 0
    for i in range(start, len(text)):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    raise ValueError("unbalanced parens")


def rewrite(text: str, opener: str, inner: str, build) -> tuple[str, int]:
    """Find every `opener` + '(' + inner + '(' ARG ')' ', ' N ')' and
    replace via build(arg, n). opener/inner are literal prefixes like
    'F.round' / 'F.sum'."""
    out = []
    i = 0
    count = 0
    pat = re.compile(re.escape(opener) + r"\(\s*" + re.escape(inner) + r"\(")
    while True:
        m = pat.search(text, i)
        if not m:
            out.append(text[i:])
            break
        out.append(text[i : m.start()])
        inner_open = m.end() - 1  # index of inner '('
        inner_close = _match_call(text, inner_open)
        arg = text[inner_open + 1 : inner_close - 1]
        rest = text[inner_close:]
        mm = re.match(r"\s*,\s*(\d+)\s*\)", rest)
        if not mm:
            # not the simple two-arg round form; leave untouched
            out.append(text[m.start() : inner_close])
            i = inner_close
            continue
        n = mm.group(1)
        # skip window sites: the rounded agg is applied .over(...)
        tail = rest[mm.end() : mm.end() + 8]
        if tail.lstrip().startswith(".over("):
            out.append(text[m.start() : inner_close + mm.end()])
            i = inner_close + mm.end()
            continue
        out.append(build(arg.strip(), n))
        i = inner_close + mm.end()
        count += 1
    return "".join(out), count


def spark_sum(arg: str, n: str) -> str:
    call = f"exact_round_sum({arg})" if n == "2" else f"exact_round_sum({arg}, {n})"
    return call


def spark_avg(arg: str, n: str) -> str:
    call = f"exact_round_avg({arg})" if n == "4" else f"exact_round_avg({arg}, {n})"
    return call


def sql_sum(arg: str, n: str) -> str:
    return f"CAST(round(sum(CAST({arg} AS DECIMAL(28,6))), {n}) AS DOUBLE)"


def sql_avg(arg: str, n: str) -> str:
    return (
        f"round(CAST(sum(CAST({arg} AS DECIMAL(28,6))) AS DOUBLE) / count({arg}), {n})"
    )


def main(paths: list[str]) -> None:
    for p in paths:
        with open(p) as f:
            text = f.read()
        total = 0
        for opener, inner, build in (
            ("F.round", "F.sum", spark_sum),
            ("F.round", "F.avg", spark_avg),
            ("round", "sum", sql_sum),
            ("round", "avg", sql_avg),
        ):
            text, c = rewrite(text, opener, inner, build)
            total += c
        with open(p, "w") as f:
            f.write(text)
        print(f"{p}: {total} sites rewritten")


if __name__ == "__main__":
    main(sys.argv[1:])
