"""Text-analysis functions for training-data pipelines.

All hot-path functions are built-in-expression compositions (JVM-side,
whole-stage-codegen friendly) — no Python UDFs. Each has a DuckDB-SQL
mirror in the query catalog so the driver's oracle can verify it.

Word-token model matches the synthetic ``documents`` fixture (space-
separated words); the BPE-ish token regex handles general text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# word-ish pieces OR single non-space punctuation — a cheap BPE-style
# pre-tokenizer (the real byte-pair merge table would live in a Pandas
# UDF; this regex is the distributed-count-compatible approximation).
TOKEN_REGEX = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"

STOPWORDS_EN = (
    "the a an and or of to in is are was were be been it this that "
    "for on with as at by from"
).split()


def tokens(col: Column | str) -> Column:
    """Whitespace tokens, lowercased, empties removed."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_token_count(col: Column | str) -> Column:
    """Count of BPE-ish regex tokens (words + punctuation marks)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), F.lit(0)))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are punctuation (quality signal)."""
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return n_punct / F.greatest(F.length(c), F.lit(1))


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are (English) stopwords."""
    sw = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS_EN)])
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic: rewards moderate length
    and stopword presence, penalizes punctuation soup. The exact
    formula is arbitrary but fixed — it exists to be computed
    identically at 100 TB and in the DuckDB oracle."""
    c = F.col(col) if isinstance(col, str) else col
    len_component = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    sw_component = F.least(stopword_ratio(c) * 4.0, F.lit(1.0))
    punct_penalty = F.least(punct_ratio(c) * 5.0, F.lit(1.0))
    return F.round(
        0.5 * len_component + 0.5 * sw_component - 0.3 * punct_penalty, 6
    )


# Tiny per-language stopword lists for the n-gram/stopword-overlap
# language-ID heuristic. Deliberately small and fixed so the SQL
# mirror stays readable; extend per deployment.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "de", "es"],
}


def lang_id(col: Column | str) -> Column:
    """Stopword-overlap language guess; 'und' (undetermined) when no
    marker hits. Ties break by the fixed language order."""
    toks = tokens(col)
    scores = []
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        # single-arg lambda: PySpark binds extra params to the element
        # index, so the marker array must be closed over, not a param
        scores.append(
            (lang, F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t))))
        )
    best = F.lit("und")
    best_score = F.lit(0)
    # fixed-order fold: strictly-greater keeps earlier language on tie
    for lang, score in scores:
        is_better = score > best_score
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase
    text. Engine-portable (md5 exists in Spark and DuckDB) — the
    exact-dedup key. A rolling-hash winnowing fingerprint lives in
    operators.dedup as the near-dup path."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.trim(F.lower(c)), r"\s+", " "))
