"""Repetition-based corpus quality signals (Gopher-style).

Large-scale LLM corpus filters drop documents dominated by repeated
content (Rae et al. 2021, "Scaling Language Models", appendix A1.1:
duplicate-line fractions and most-frequent-n-gram character
fractions; the same family of rules appears in C4 and RefinedWeb).
These are per-document metrics, so the distributed shape is two
narrow explode → groupBy(doc_id, unit) → groupBy(doc_id) cascades
joined back on doc_id — every aggregate is algebraic (map-side
partial agg), the shuffle key is the document id, and nothing is
collected to the driver. Skewed document lengths are safe: a huge
document contributes many (doc_id, unit) rows but they partial-agg
before the shuffle.

Tokenization reuses dedup.shingles (lowercased whitespace tokens) so
the DuckDB oracle mirror in queries.py shares the simhash oracle's
CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_mapreduce_spark.operators.dedup import shingles, tokens


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Per-document repetition metrics:

    - ``dup_line_frac`` — fraction of non-empty lines occurring more
      than once in the document.
    - ``dup_line_char_frac`` — fraction of line characters contained
      in those duplicated lines (Gopher's character-weighted twin).
    - ``top_ngram_char_frac`` — characters covered by the most
      frequent word ``n``-gram (count × gram length) over total text
      characters; ties on count break toward the longer gram so both
      engines agree.

    Documents with no non-empty lines or no n-grams report 0.0 —
    guarded denominators, no NULL propagation."""
    base = df.select(F.col(id_col), F.length(text_col).alias("chars"))

    line_rows = df.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.col(text_col), "\n"), lambda l: F.length(l) > 0)
        ).alias("line"),
    )
    line_stats = (
        line_rows.groupBy(id_col, "line")
        .agg(F.count("*").alias("cnt"))
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("total_lines"),
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias(
                "dup_lines"
            ),
            F.sum(F.col("cnt") * F.length("line")).alias("line_chars"),
            F.sum(
                F.when(F.col("cnt") > 1, F.col("cnt") * F.length("line")).otherwise(0)
            ).alias("dup_line_chars"),
        )
    )

    # documents with fewer than n tokens contain NO n-grams and must
    # report 0.0 — shingles()'s short-text fallback (whole text as one
    # pseudo-gram, needed by MinHash so every doc gets a signature)
    # would score them top_ngram_char_frac ≈ 1.0 and a Gopher-style
    # threshold would drop every short document as "repetitive"
    grams = F.when(
        F.size(tokens(text_col)) >= n, shingles(text_col, n)
    ).otherwise(F.array().cast("array<string>"))
    gram_rows = df.select(F.col(id_col), F.explode(grams).alias("gram"))
    gram_stats = (
        gram_rows.groupBy(id_col, "gram")
        .agg(F.count("*").alias("cnt"), F.length("gram").alias("glen"))
        .groupBy(id_col)
        .agg(F.max(F.struct("cnt", "glen")).alias("top"))
        .select(
            id_col,
            (F.col("top.cnt") * F.col("top.glen")).alias("top_gram_chars"),
        )
    )

    return (
        base.join(line_stats, id_col, "left")
        .join(gram_stats, id_col, "left")
        .select(
            F.col(id_col),
            F.round(
                F.coalesce(
                    F.col("dup_lines")
                    / F.greatest(F.col("total_lines"), F.lit(1)),
                    F.lit(0.0),
                ),
                6,
            ).alias("dup_line_frac"),
            F.round(
                F.coalesce(
                    F.col("dup_line_chars")
                    / F.greatest(F.col("line_chars"), F.lit(1)),
                    F.lit(0.0),
                ),
                6,
            ).alias("dup_line_char_frac"),
            F.round(
                F.coalesce(
                    F.col("top_gram_chars")
                    / F.greatest(F.col("chars"), F.lit(1)),
                    F.lit(0.0),
                ),
                6,
            ).alias("top_ngram_char_frac"),
        )
    )
