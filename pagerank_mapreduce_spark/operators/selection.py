"""Importance-based data selection for LLM training corpora.

DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
NeurIPS) — scores every raw document by how target-like it is under
two bag-of-hashed-n-gram unigram models::

    log w(x) = Σ over n-grams g of x:  log( p_target(b(g)) / q_raw(b(g)) )

with b(·) hashing unigrams and bigrams into a fixed bucket space and
p/q add-λ-smoothed multinomials fitted on the target and raw subsets.
Documents are then resampled ∝ w(x) (the resampling step is the
repo's existing deterministic weighted-sampling machinery —
rel_weighted_sample / text_temperature_mix; this module computes the
weights, the hard distributed part).

Scale shape: one explode → groupBy(bucket) builds both models (the
bucket relation is ≤ n_buckets rows — broadcastable by construction,
like the ANN codebooks), then one explode → broadcast-join →
groupBy(doc) computes every document's weight. Both aggregates are
algebraic (map-side partial agg); the shuffle keys are the bucket id
and the doc id. Nothing is collected to the driver.

Cross-engine determinism: the bucket hash is the portable 60-bit md5
(dedup.portable_hash60 — replays as ``('0x' || substr(md5(g),1,15))::
BIGINT`` in DuckDB) and each bucket's log-ratio is quantized to
integer NANO-UNITS, so the per-document Σ is a BIGINT dot product —
exact and summation-order-independent, the same discipline as
average_precision (operators/evaluation.py) and the seasonal
decomposition. |log-ratio| is bounded by ln((N+λB)/λ) ≈ 30, so the
quantized units stay ≤ ~3e10 and a document needs > ~3e8 n-grams to
overflow BIGINT — far past any real document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pagerank_mapreduce_spark.functions.text import tokens
from pagerank_mapreduce_spark.operators.dedup import portable_hash60


def _uni_bigrams(text: Column) -> Column:
    """Unigrams ∪ bigrams over lowercased whitespace tokens. A
    document with a single token contributes only its unigram (no
    degenerate bigram fallback — the oracle mirrors this exactly).

    Shape matters: bigrams pair two SLICES with zip_with, never
    ``element_at(toks, i)`` inside a transform — element_at re-
    evaluates the tokenizing split per element, turning a 700-word
    document into ~700 re-splits (O(len²); measured 7.2 s just to
    explode 536k grams at sf0.1 before this fix)."""
    toks = tokens(text)
    n = F.size(toks)
    bigrams = F.when(
        n < 2, F.array().cast("array<string>")
    ).otherwise(
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    )
    return F.filter(F.concat(toks, bigrams), lambda g: g != "")


def dsir_weights(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    smoothing: float = 1.0,
    round_to: int = 6,
) -> DataFrame:
    """Per-document DSIR log importance weight of every document
    against the ``is_target`` subset (the target domain) vs the rest
    (the raw pool). Positive = more target-like than the raw average.

    Output: (``id_col``, n_grams BIGINT, dsir_logw DOUBLE) for every
    document with non-NULL id and text — target documents score too
    (useful as a sanity band: they should skew positive)."""
    tgt = is_target.cast("int")
    base = docs.select(
        F.col(id_col), tgt.alias("_t"), F.col(text_col).alias("_x")
    ).filter(F.col(id_col).isNotNull() & F.col("_x").isNotNull())
    # collapse to (doc, gram) COUNTS before anything touches md5: the
    # crypto hash is the expensive step (the ml_bootstrap_ci lesson —
    # per-instance md5 was 19.5 s at sf0.1; SCALE.md r10), and token
    # instances repeat heavily under any Zipf vocabulary, so hash the
    # DISTINCT grams once and join the counts to them. The vocab
    # relation is vocabulary-sized, not corpus-sized; the join is a
    # plain equi-join on the gram string (AQE broadcasts it when
    # small — no hint, a 100 TB n-gram vocabulary must be allowed to
    # shuffle).
    # NOT checkpointed, although three consumers derive from it (the
    # vocab, the models, the scores): the collapse's shuffle output is
    # already reused across them (ReusedExchange), so materializing a
    # DATA-SIZED relation is pure overhead — measured slower at both
    # sf0.1 (3.1 vs 2.5 s) and 100× (168 vs 148 s). Contrast with the
    # rank metrics, whose checkpointed collapse is distinct-value-
    # sized, not data-sized.
    doc_grams = (
        base.select(
            id_col, "_t", F.explode(_uni_bigrams(F.col("_x"))).alias("_g")
        )
        .groupBy(id_col, "_t", "_g")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    vocab = (
        doc_grams.select("_g")
        .distinct()
        .withColumn(
            "_b", F.pmod(portable_hash60(F.col("_g")), F.lit(n_buckets))
        )
    )
    grams = doc_grams.join(vocab, "_g")

    counts = grams.groupBy("_b").agg(
        F.sum(F.col("_t") * F.col("_c")).cast("bigint").alias("_ct"),
        F.sum((F.lit(1) - F.col("_t")) * F.col("_c"))
        .cast("bigint")
        .alias("_cr"),
    )
    totals = counts.agg(
        F.sum("_ct").alias("_tt"), F.sum("_cr").alias("_tr")
    )
    # full bucket grid: a bucket unseen in one model still carries its
    # smoothing mass, else the log-ratio of a target-only bucket would
    # be NULL instead of strongly positive
    s = F.lit(float(smoothing))
    sb = F.lit(float(smoothing) * n_buckets)
    grid = (
        docs.sparkSession.range(n_buckets)
        .select(F.col("id").alias("_b"))
        .join(counts, "_b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "_b",
            F.round(
                (
                    F.log(
                        (F.coalesce("_ct", F.lit(0)) + s)
                        / (F.col("_tt") + sb)
                    )
                    - F.log(
                        (F.coalesce("_cr", F.lit(0)) + s)
                        / (F.col("_tr") + sb)
                    )
                )
                * F.lit(1e9),
                0,
            )
            .cast("bigint")
            .alias("_lr_u"),
        )
    )
    return (
        grams.join(F.broadcast(grid), "_b")
        .groupBy(id_col)
        .agg(
            F.sum("_c").alias("n_grams"),
            F.round(
                F.sum(F.col("_c") * F.col("_lr_u")).cast("double")
                / F.lit(1e9),
                round_to,
            ).alias("dsir_logw"),
        )
    )
