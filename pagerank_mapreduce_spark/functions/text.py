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


# ------------------------------------------------ winnowing fingerprints

# Explicit polynomial so the DuckDB oracle can recompute the identical
# values (engine hash builtins differ across engines; arithmetic does
# not). B/M small enough that the k-gram hash stays in 32-bit range.
WINNOW_BASE = 31
WINNOW_MOD = 1000003


def winnow_fingerprints(
    df, text_col: str = "text", k: int = 5, w: int = 8, out: str = "fps"
):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003): rolling k-gram character hashes over the normalized
    text, then the minimum hash of every w-length window, distinct and
    sorted — a position-robust fingerprint set whose overlap survives
    insertions/deletions that break exact fingerprints.

    Pure built-in expressions (transform/zip_with/least — JVM-side):
    the k-gram hash is an unrolled polynomial
    ``sum(ascii(char_j) * B^(k-1-j)) mod M``, NOT an engine hash
    builtin, so the DuckDB oracle reproduces values exactly.

    DataFrame-level (adds column ``out: ARRAY<INT>``, drops nothing)
    rather than a single Column expression, deliberately: a lambda
    body that references an enclosing *expression* re-evaluates it per
    array element, so composing transform(grams)-inside-transform as
    one expression costs O(len²) regexp+hash work per row. Staging
    each step as a named column keeps every lambda referencing a bound
    attribute (CollapseProject declines to inline multiply-referenced
    non-trivial aliases), and the per-window minimum is computed as a
    ``least``-fold over w shifted slices — O(len·w) total, with the
    gram array built exactly once.

    Typical use: explode ``out`` and group by fingerprint for
    copy-detection, or compare fingerprint sets per candidate pair.
    """
    from pagerank_mapreduce_spark.operators.dedup import _spread

    df = _spread(df)
    t = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")

    def gram(i: Column) -> Column:
        h = F.lit(0)
        for j in range(k):
            h = h + F.ascii(F.col("__t").substr(i + F.lit(j), F.lit(1))) * F.lit(
                WINNOW_BASE ** (k - 1 - j)
            )
        return F.pmod(h, F.lit(WINNOW_MOD))

    m = F.greatest(F.length("__t") - k + 1, F.lit(1))
    staged = (
        df.withColumn("__t", t)
        .withColumn("__grams", F.transform(F.sequence(F.lit(1), m), gram))
        .withColumn("__L", F.greatest(F.size("__grams") - w + 1, F.lit(1)))
    )
    # windowed minima as an elementwise least-fold over shifted views;
    # slices that run past the end come back short and zip_with null-
    # pads them — least() ignores nulls, so edges stay correct
    wmins = F.slice("__grams", F.lit(1), F.col("__L"))
    for s in range(1, w):
        shifted = F.slice(F.col("__grams"), F.lit(1 + s), F.col("__L"))
        wmins = F.zip_with(wmins, shifted, lambda a, b: F.least(a, b))
    return (
        staged.withColumn(out, F.array_sort(F.array_distinct(wmins)))
        .drop("__t", "__grams", "__L")
    )


def winnow_oracle_ctes(k: int = 5, w: int = 8) -> str:
    """DuckDB CTE chain computing, per documents row, the same
    fingerprint list as :func:`winnow_fingerprints` (value parity is
    exact — same polynomial, same window minima). Yields a relation
    ``fps(doc_id, fps LIST<BIGINT>)``; compose with a final SELECT."""
    poly = " + ".join(
        f"ascii(substr(t, i + {j}, 1)) * {WINNOW_BASE ** (k - 1 - j)}"
        for j in range(k)
    )
    return f"""
      s AS (SELECT doc_id,
                   regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS t
            FROM documents),
      g AS (SELECT doc_id, t, greatest(length(t) - {k} + 1, 1) AS m FROM s),
      h AS (SELECT doc_id, m,
                   list_transform(range(1, m + 1),
                                  i -> ({poly}) % {WINNOW_MOD}) AS hs
            FROM g),
      wnd AS (SELECT doc_id,
                     list_transform(range(1, greatest(m - {w} + 1, 1) + 1),
                                    j -> list_aggregate(hs[j:j+{w - 1}], 'min')) AS wl
              FROM h),
      fps AS (SELECT doc_id, list_sort(list_distinct(wl)) AS fps FROM wnd)"""


def chunk_tokens(
    col: Column | str, size: int = 50, overlap: int = 10
) -> Column:
    """Split a document into token-bounded chunks with overlap — the
    standard pre-embedding chunking step of an LLM data pipeline.

    Returns ARRAY<STRING>: chunk i spans tokens [i*step, i*step+size)
    with step = size-overlap; the final chunk may be short; an
    empty/whitespace-only document yields one empty chunk. Pure
    JVM-side array expressions — the per-document work is O(tokens),
    and chunking composes with explode for a (doc, chunk) relation
    that downstream embedding UDFs consume batch-wise."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    step = size - overlap
    toks = tokens(col)
    n = F.size(toks)
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(step)).cast("int")
    )
    idx = F.sequence(F.lit(0), n_chunks - 1)
    return F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i * step + 1, size), " ")
    )


# PII patterns kept lookaround-free so Java regex (Spark) and RE2-style
# engines (DuckDB, Go) agree byte-for-byte on every match.
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
)


def redact_pii(col: Column | str) -> Column:
    """Replace email/phone/IPv4/SSN-shaped spans with typed tags —
    the pre-training scrub pass. Chained regexp_replace, all
    JVM-side; order matters (emails first, so their digit runs are
    gone before the phone/IP patterns look)."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, tag in PII_PATTERNS:
        c = F.regexp_replace(c, pat, tag)
    return c
