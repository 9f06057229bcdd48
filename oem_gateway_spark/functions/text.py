"""Text-analysis layer for training-data pipelines: quality stats,
language-ID heuristic, token counting, fingerprinting.

Each builder has a DuckDB-SQL twin driven by the SAME constants (stopword
lists, regexes) so the oracle replays identical rules.  Everything is
built-in expressions — no Python in the hot path; at 100 TB these are pure
map operators that pipeline with the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword lists per language for the n-gram/stopword language-ID heuristic.
# Tie-break order = LANGS order (argmax with earlier-language preference).
LANGS = ("en", "es", "de", "fr", "zh")
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "de": ("der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu"),
    "fr": ("le", "la", "et", "les", "des", "en", "un", "du", "une", "est"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1", "zhe4", "men5"),
}
# BPE-ish token regex: alpha runs, digit runs, or single non-space symbols.
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def word_tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda w: F.length(w) > 0)


def word_tokens_sql(expr: str) -> str:
    return (
        f"list_filter(string_split_regex(lower({expr}), '[^a-z0-9]+'),"
        " w -> length(w) > 0)"
    )


def stopword_hits(word_arr: Column, lang: str) -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(word_arr, lambda w: F.array_contains(sw, w)))


def stopword_hits_sql(words_expr: str, lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({words_expr}, w -> list_contains([{lst}], w)))"


def langid(word_arr: Column) -> Column:
    """Predicted language = argmax of stopword hits (LANGS order breaks
    ties; all-zero scores fall back to 'en')."""
    scores = {lang: stopword_hits(word_arr, lang) for lang in LANGS}
    best = F.lit("en")
    best_score = F.lit(-1)
    # Iterate in reverse so earlier languages win ties.
    for lang in reversed(LANGS):
        is_better = scores[lang] >= best_score
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_score = F.when(is_better, scores[lang]).otherwise(best_score)
    return best


def langid_sql(words_expr: str) -> str:
    score = {lang: stopword_hits_sql(words_expr, lang) for lang in LANGS}
    # Same reverse fold as langid(): earlier langs win ties via >=.
    expr_lang, expr_score = "'en'", "-1"
    for lang in reversed(LANGS):
        s = score[lang]
        expr_lang = f"CASE WHEN ({s}) >= ({expr_score}) THEN '{lang}' ELSE ({expr_lang}) END"
        expr_score = f"CASE WHEN ({s}) >= ({expr_score}) THEN ({s}) ELSE ({expr_score}) END"
    return expr_lang


def bpe_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(TOKEN_REGEX), F.lit(0)))


def bpe_token_count_sql(expr: str) -> str:
    return f"len(regexp_extract_all(lower({expr}), '{TOKEN_REGEX}'))"


def normalize_text(text: Column) -> Column:
    """Dedup normalization: lowercase, strip non-alnum, collapse spaces."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(text), "[^a-z0-9 ]", " "), " +", " "
        )
    )


def normalize_text_sql(expr: str) -> str:
    return (
        f"trim(regexp_replace(regexp_replace(lower({expr}),"
        f" '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint = md5 of normalized text."""
    return F.md5(normalize_text(text))


def fingerprint_sql(expr: str) -> str:
    return f"md5({normalize_text_sql(expr)})"
