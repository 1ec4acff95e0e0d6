"""Text-analysis column expressions for LLM-data-pipeline work over the
``documents`` table: tokenization, quality scoring, language ID,
fingerprinting. Everything is built-in Spark SQL functions (JVM-side,
codegen'd) — no Python UDFs — and every formula is written to be
bit-reproducible in ANSI SQL for oracle checking (integer-exact
intermediates, fixed evaluation order for the few double ops).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WORD_RE = "[A-Za-z0-9]+"

# tiny function-word profiles for the heuristic language classifier;
# checked in alphabetical order of language code on ties
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en": ("the", "is", "and", "of", "to", "a", "in"),
    "es": ("el", "la", "de", "que", "y", "los", "un"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans"),
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def words(col: Column | str) -> Column:
    """Whitespace tokenization (single-space corpus)."""
    return F.split(_c(col), " ")


def word_token_count(col: Column | str) -> Column:
    """BPE-ish token estimate: count of alphanumeric runs — a stable
    proxy for subword token counts without a tokenizer dependency."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(WORD_RE), F.lit(0)))


def whitespace_token_count(col: Column | str) -> Column:
    return F.size(words(col))


def stopword_ratio(ws: Column, stops: tuple[str, ...]) -> Column:
    """Fraction of tokens that are stopwords (int/int division — exact
    cross-engine)."""
    stop_arr = F.array(*[F.lit(s) for s in stops])
    n_stop = F.size(F.filter(ws, lambda w: F.array_contains(stop_arr, w)))
    return n_stop / F.size(ws)


def mean_word_length(col: Column | str) -> Column:
    """Average token length = non-space chars / token count."""
    c = _c(col)
    return F.length(F.regexp_replace(c, " ", "")) / F.size(words(c))


def quality_score(col: Column | str) -> Column:
    """Composite heuristic quality score in [0, 1]:
    0.4 * min(tokens,100)/100 + 0.3 * stopword_ratio +
    0.3 * min(mean_word_len,10)/10. Fixed evaluation order so the SQL
    oracle reproduces it bit-for-bit."""
    ws = words(col)
    len_term = F.least(F.size(ws), F.lit(100)) / F.lit(100)
    stop_term = stopword_ratio(ws, LANG_PROFILES["en"])
    mwl_term = F.least(mean_word_length(col), F.lit(10.0)) / F.lit(10)
    return len_term * 0.4 + stop_term * 0.3 + mwl_term * 0.3


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language function-word hit counts (the n-gram-profile
    language-ID heuristic, profile = unigram function words)."""
    ws = words(col)
    out = {}
    for lang, profile in LANG_PROFILES.items():
        arr = F.array(*[F.lit(s) for s in profile])
        out[lang] = F.size(F.filter(ws, lambda w: F.array_contains(arr, w)))
    return out


def lang_id(col: Column | str) -> Column:
    """argmax language by profile score; ties resolve to the
    alphabetically-first language code. Documents matching no profile
    get 'und' (undetermined)."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # build the CASE in reverse-alphabetical order so the earliest
    # alphabetical language ends up as the outermost (winning) branch
    for lang in sorted(scores, reverse=True):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def content_fingerprint(col: Column | str) -> Column:
    """Exact-content fingerprint: md5 of lowercased text."""
    return F.md5(F.lower(_c(col)))


def bag_fingerprint(col: Column | str) -> Column:
    """Order-insensitive fingerprint: md5 over the sorted distinct
    token bag — robust to token reordering (shuffled near-dups)."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(words(col)))))


def rolling_fingerprint(col: Column | str) -> Column:
    """Polynomial rolling hash over tokens (mod 2^31-1), seeded from a
    32-bit md5 prefix per token — a document fingerprint whose collision
    behavior is order-sensitive, unlike the bag fingerprint. All
    arithmetic stays in exact integer range (acc < 2^31, token hash
    < 2^32, acc*31 + h < 2^38 << 2^63)."""
    tok_hash = lambda w: F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long")  # noqa: E731
    return F.aggregate(
        words(col),
        F.lit(0).cast("long"),
        lambda acc, w: (acc * 31 + tok_hash(w)) % F.lit(2147483647).cast("long"),
    )
