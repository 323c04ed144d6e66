"""Text analysis: tokenization stats, quality scoring, language ID,
document fingerprinting.

All pure Column expressions (no UDFs): at 100 TB these run inside the
scan's codegen stage, cost one pass, and never move data. Each helper
has a documented DuckDB-SQL twin used by the oracle queries in
plans/pipeline.py — the constants below are shared by both sides so the
two implementations cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Whitespace tokenizer shared with the oracle SQL. An EXPLICIT character
#: class, not ``\s+``: Java regex's ``\s`` includes U+000B (vertical tab)
#: while DuckDB's RE2 ``\s`` does not, so ``\s+`` silently diverges
#: between the Spark plan and its oracle on text containing ``\x0b``.
#: The raw string below contains literal backslash escapes, which both
#: Java regex and RE2 parse identically — the SAME constant is embedded
#: in the oracle SQL, so the two sides cannot drift.
WS_RE = r"[ \t\n\r\f]+"

#: BPE-ish token pattern: runs of word chars OR single non-space symbols.
#: Approximates subword-tokenizer token counts well enough for budget
#: estimation without shipping a vocab.
BPE_TOKEN_RE = r"[0-9A-Za-z_]+|[^0-9A-Za-z_\s]"

#: Marker stopwords per language for the n-gram/stopword lang-id
#: heuristic. Deliberately small: membership of high-frequency function
#: words separates European languages cheaply; CJK is detected by
#: codepoint range instead.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"),
    "en": ("the", "and", "of", "to", "in", "is", "it", "for", "on", "with"),
    "es": ("el", "la", "los", "las", "que", "de", "y", "en", "un", "una"),
    "fr": ("le", "les", "et", "des", "du", "une", "est", "dans", "pour", "sur"),
}

#: CJK unified ideographs — presence ⇒ 'zh' under this heuristic.
CJK_RE = "[一-鿿]"

#: English stopwords for quality scoring (ratio of function words is a
#: cheap fluency signal).
QUALITY_STOPWORDS = LANG_MARKERS["en"] + ("a", "an", "that", "this", "as", "are", "was")

#: Char k-gram size for the rolling fingerprint.
FINGERPRINT_K = 8


def trunc(c: Column, decimals: int = 6) -> Column:
    """Truncate a double to `decimals` places: floor(x·10^d)/10^d.

    Used instead of round() for cross-engine float policy: round()'s
    half-way behavior differs between engines (Spark rounds the shortest
    decimal repr HALF_UP, DuckDB rounds the binary value), so an exact
    .xxxxxx5 flips between them. floor of a bit-identical double is
    bit-identical everywhere. Oracle twin: floor(x * 1e6) / 1e6.

    Magnitude guard (found by tests/test_adversarial_corpus.py): Spark's
    FLOOR(double) returns BIGINT and SATURATES at ±2⁶³ (DuckDB's stays
    double), so a 1e29-magnitude value silently truncated to 9.2e12.
    Doubles at |x·10^d| ≥ 2⁵³ are already integral — floor is the
    identity there — so the guard branches to the identity, which also
    passes ±inf and NaN through instead of dying in the long cast.
    DuckDB's double floor behaves identically by construction.
    """
    scale = 10**decimals
    y = c * scale
    return F.when(F.abs(y) < F.lit(float(2**53)), F.floor(y)).otherwise(y) / scale


def tokens(text: Column | str) -> Column:
    """Whitespace tokens of a trimmed string (empty string → [''])."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), WS_RE)


def token_count(text: Column | str) -> Column:
    """Whitespace token count. DuckDB twin: len(regexp_split_to_array(trim(x), WS_RE))."""
    return F.size(tokens(text))


def bpe_token_count(text: Column | str) -> Column:
    """BPE-ish token count via regexp_count.
    DuckDB twin: len(regexp_extract_all(x, pattern))."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(BPE_TOKEN_RE))


def stopword_ratio(text: Column | str, stops: tuple[str, ...] = QUALITY_STOPWORDS) -> Column:
    """Fraction of tokens that are stopwords.
    DuckDB twin: len(list_filter(toks, t -> list_contains([...], t))) / len(toks)."""
    toks = tokens(text)
    stops_arr = F.array(*[F.lit(s) for s in stops])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stops_arr, t)))
    return hits / F.size(toks)


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are (ASCII) punctuation, with a
    guarded denominator: the empty string scores 0 instead of raising
    DIVIDE_BY_ZERO under ANSI mode (one empty doc must not kill a
    100 TB job — found by tests/test_adversarial_corpus.py).
    DuckDB twin: len(regexp_extract_all(x, pat)) / greatest(length(x), 1)."""
    c = F.col(text) if isinstance(text, str) else text
    pat = r"[!-/:-@\[-`{-~]"
    return F.regexp_count(c, F.lit(pat)) / F.greatest(F.length(c), F.lit(1))


def mean_token_length(text: Column | str) -> Column:
    """Average token length in characters."""
    c = F.col(text) if isinstance(text, str) else text
    non_space = F.length(F.regexp_replace(c, WS_RE, ""))
    return non_space / F.size(tokens(c))


def quality_score(text: Column | str) -> Column:
    """Composite document-quality heuristic in [0, 1]:

    0.3·min(n_tokens/100, 1) + 0.3·stopword_ratio
    + 0.2·(1 − punct_ratio) + 0.2·min(mean_token_len/8, 1)

    Length rewards substance, stopword ratio rewards fluent prose,
    punctuation penalizes markup/boilerplate, mean token length rewards
    real words over fragments. Truncated to 6dp (cross-engine float
    policy — see :func:`trunc`). The formula is intentionally simple —
    the point is a deterministic, scan-local score, not a learned model.
    """
    c = F.col(text) if isinstance(text, str) else text
    score = (
        0.3 * F.least(token_count(c) / 100.0, F.lit(1.0))
        + 0.3 * stopword_ratio(c)
        + 0.2 * (1.0 - punct_ratio(c))
        + 0.2 * F.least(mean_token_length(c) / 8.0, F.lit(1.0))
    )
    return trunc(score, 6)


def _marker_hits(text: Column | str, lang: str) -> Column:
    toks = tokens(F.lower(F.col(text) if isinstance(text, str) else text))
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))


def lang_id(text: Column | str) -> Column:
    """Heuristic language ID: CJK codepoints ⇒ zh; else the language
    whose marker-stopword hit count is maximal (first of de/en/es/fr on
    ties — deterministic); all-zero ⇒ 'und'.
    """
    c = F.col(text) if isinstance(text, str) else text
    cjk = F.regexp_count(c, F.lit(CJK_RE))
    hits = {lang: _marker_hits(c, lang) for lang in sorted(LANG_MARKERS)}
    best = F.greatest(*hits.values())
    expr = F.when(cjk > 0, F.lit("zh")).when(best == 0, F.lit("und"))
    for lang in sorted(LANG_MARKERS):
        expr = expr.when(hits[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def fingerprint_md5(text: Column | str) -> Column:
    """Canonical-form fingerprint: md5 of lowercased, whitespace-collapsed
    text. Identical docs modulo spacing/case collide — the exact-dedup key."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.trim(F.regexp_replace(F.lower(c), WS_RE, " ")).cast("binary"))


def fingerprint_chargram_min(text: Column | str, k: int = FINGERPRINT_K) -> Column:
    """Rolling-hash document fingerprint: minimum md5 over all k-char
    grams (a 1-hash MinHash over character shingles). Lexicographic min
    of a uniform hash is a valid min-wise sketch; near-identical docs
    share it with high probability. Texts shorter than k use the whole
    text as the single gram.
    """
    c = F.col(text) if isinstance(text, str) else text
    # ONE fused lambda (substring+md5), not transform∘transform: the
    # chained form materializes the gram array before hashing it.
    # Negative result (r3, measured at sf0.1): rewriting as explode →
    # codegen md5 → groupBy-min — the shape that won for SimHash — is
    # 8× SLOWER here (2.5 → 18.7 s): grams ≈ chars, so the Generate
    # fan-out (~15M rows) costs far more than interpreted-HOF md5 saves.
    # The HOF runs ~6M md5/s, already hash-throughput-bound.
    return F.array_min(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(c) - (k - 1), F.lit(1))),
            lambda i: F.md5(F.substring(c, i, k).cast("binary")),
        )
    )
