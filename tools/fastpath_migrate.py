"""One-shot codemod (VERDICT r7 #1): migrate the classic decimal money
helpers to the micro-long fast path in BOTH the Spark lane code and its
literal DuckDB oracle string, in lock-step.

Spark side (textual rename — same signatures):
  exact_round_sum(X[, n])  -> exact_round_sum_fast(X[, n])
  exact_round_avg(X[, n])  -> exact_round_avg_fast(X[, n])
  (exact_sum composition sites are migrated by hand — q8/q17.)

Oracle side (balanced-paren matching, whitespace/newline tolerant),
replacing the r6 codemod's literal expansions with f-string calls of
the sql twins so the lane and oracle can never drift apart again:
  CAST(round(sum(CAST(X AS DECIMAL(28,6))), n) AS DOUBLE)
      -> {sql_exact_round_sum_fast("X"[, n])}
  round(CAST(sum(CAST(X AS DECIMAL(28,6))) AS DOUBLE) / count(X), n)
      -> {sql_exact_round_avg_fast("X"[, n])}
  CAST(sum(CAST(X AS DECIMAL(28,6))) AS DOUBLE)
      -> {sql_exact_sum_double_fast("X")}

Any triple-quoted string that gains an interpolation is promoted to an
f-string; promotion REFUSES (loud, per-site) if the string already
contains other braces or the extracted X contains a double quote —
those sites are listed for manual migration. Window `.over(` sites and
already-fast sites are untouched. Run once, review `git diff`, fix
imports by hand, run the suite.
"""

from __future__ import annotations

import re
import sys


def _match_paren(text: str, i: int) -> int:
    """`i` at '(' — return index OF the matching ')'."""
    depth = 0
    for j in range(i, len(text)):
        if text[j] == "(":
            depth += 1
        elif text[j] == ")":
            depth -= 1
            if depth == 0:
                return j
    raise ValueError("unbalanced parens")


_DEC_SUFFIX = re.compile(r"\s+AS\s+DECIMAL\(28,\s*6\)\s*$", re.IGNORECASE)


def _extract_cast_arg(text: str, cast_open: int) -> tuple[str, int] | None:
    """cast_open at the '(' of CAST( X AS DECIMAL(28,6) ). Returns
    (X collapsed to one line, index just past the ')') or None if the
    inner cast is not the DECIMAL(28,6) idiom."""
    close = _match_paren(text, cast_open)
    inner = text[cast_open + 1 : close]
    m = _DEC_SUFFIX.search(inner)
    if not m:
        return None
    x = re.sub(r"\s+", " ", inner[: m.start()]).strip()
    return x, close + 1


def _fcall(fn: str, x: str, n: str | None = None, default: str | None = None) -> str:
    if '"' in x:
        raise SystemExit(f"MANUAL: double quote inside extracted arg: {x!r}")
    arg = f'"{x}"'
    if n is not None and n != default:
        return f"{{{fn}({arg}, {n})}}"
    return f"{{{fn}({arg})}}"


# --- pattern B: classic avg literal ----------------------------------------
PAT_B = re.compile(
    r"round\s*\(\s*CAST\s*\(\s*sum\s*\(\s*CAST\s*\(", re.IGNORECASE
)
# --- pattern A: classic rounded-sum literal ---------------------------------
PAT_A = re.compile(
    r"CAST\s*\(\s*round\s*\(\s*sum\s*\(\s*CAST\s*\(", re.IGNORECASE
)
# --- pattern C: classic bare sum→double literal -----------------------------
PAT_C = re.compile(r"CAST\s*\(\s*sum\s*\(\s*CAST\s*\(", re.IGNORECASE)


def _rewrite_b(text: str) -> tuple[str, int]:
    out, i, count = [], 0, 0
    while True:
        m = PAT_B.search(text, i)
        if not m:
            out.append(text[i:])
            break
        got = _extract_cast_arg(text, m.end() - 1)
        if got is None:
            out.append(text[i : m.end()])
            i = m.end()
            continue
        x, after = got
        # ) closes sum, AS DOUBLE ) closes the CAST, then / count( Y ), n )
        mm = re.match(
            r"\s*\)\s*AS\s+DOUBLE\s*\)\s*/\s*count\s*\(", text[after:], re.IGNORECASE
        )
        if not mm:
            out.append(text[i : m.end()])
            i = m.end()
            continue
        cnt_open = after + mm.end() - 1
        cnt_close = _match_paren(text, cnt_open)
        y = re.sub(r"\s+", " ", text[cnt_open + 1 : cnt_close]).strip()
        if y != x:
            raise SystemExit(f"MANUAL: avg count arg {y!r} != sum arg {x!r}")
        m3 = re.match(r"\s*,\s*(\d+)\s*\)", text[cnt_close + 1 :])
        if not m3:
            out.append(text[i : m.end()])
            i = m.end()
            continue
        out.append(text[i : m.start()])
        out.append(_fcall("sql_exact_round_avg_fast", x, m3.group(1), "4"))
        i = cnt_close + 1 + m3.end()
        count += 1
    return "".join(out), count


def _rewrite_a(text: str) -> tuple[str, int]:
    out, i, count = [], 0, 0
    while True:
        m = PAT_A.search(text, i)
        if not m:
            out.append(text[i:])
            break
        got = _extract_cast_arg(text, m.end() - 1)
        if got is None:
            out.append(text[i : m.end()])
            i = m.end()
            continue
        x, after = got
        mm = re.match(
            r"\s*\)\s*,\s*(\d+)\s*\)\s*AS\s+DOUBLE\s*\)", text[after:], re.IGNORECASE
        )
        if not mm:
            out.append(text[i : m.end()])
            i = m.end()
            continue
        out.append(text[i : m.start()])
        out.append(_fcall("sql_exact_round_sum_fast", x, mm.group(1), "2"))
        i = after + mm.end()
        count += 1
    return "".join(out), count


def _rewrite_c(text: str) -> tuple[str, int]:
    out, i, count = [], 0, 0
    while True:
        m = PAT_C.search(text, i)
        if not m:
            out.append(text[i:])
            break
        got = _extract_cast_arg(text, m.end() - 1)
        if got is None:
            out.append(text[i : m.end()])
            i = m.end()
            continue
        x, after = got
        mm = re.match(r"\s*\)\s*AS\s+DOUBLE\s*\)", text[after:], re.IGNORECASE)
        if not mm:
            out.append(text[i : m.end()])
            i = m.end()
            continue
        out.append(text[i : m.start()])
        out.append(_fcall("sql_exact_sum_double_fast", x))
        i = after + mm.end()
        count += 1
    return "".join(out), count


def _promote_fstrings(text: str, path: str) -> str:
    """Make every triple-quoted string that contains a `{sql_exact_`
    interpolation an f-string; refuse if it carries other braces."""
    spans = [m.span() for m in re.finditer(r'"""', text)]
    if len(spans) % 2:
        raise SystemExit(f"MANUAL: odd triple-quote count in {path}")
    offset = 0
    for (s0, s1), (e0, _) in zip(spans[0::2], spans[1::2]):
        s0 += offset
        s1 += offset
        e0 += offset
        body = text[s1:e0]
        if "{sql_exact_" not in body:
            continue
        if text[s0 - 1] == "f":
            continue  # already an f-string — braces are live there
        other = re.sub(r"\{sql_exact_[a-z_]+\([^{}]*\)\}", "", body)
        if "{" in other or "}" in other:
            raise SystemExit(
                f"MANUAL: string at byte {s0} in {path} has other braces"
            )
        text = text[:s0] + "f" + text[s0:]
        offset += 1
    return text


_SPARK_RENAMES = (
    (re.compile(r"\bexact_round_sum\((?!\))"), "exact_round_sum_fast("),
    (re.compile(r"\bexact_round_avg\((?!\))"), "exact_round_avg_fast("),
)


def main(paths: list[str]) -> None:
    for p in paths:
        with open(p) as f:
            text = f.read()
        nb = na = nc = 0
        text, nb = _rewrite_b(text)
        text, na = _rewrite_a(text)
        text, nc = _rewrite_c(text)
        ns = 0
        for pat, rep in _SPARK_RENAMES:
            text, k = pat.subn(rep, text)
            ns += k
        text = _promote_fstrings(text, p)
        with open(p, "w") as f:
            f.write(text)
        print(f"{p}: oracle sum={na} avg={nb} bare={nc}; spark renames={ns}")


if __name__ == "__main__":
    main(sys.argv[1:])
