"""Deduplication operators for large-scale training-data pipelines.

Five families, each a first-class operator over a document DataFrame:

- exact            — hash-groupBy on a normalized fingerprint (md5)
- minhash_lsh      — shingle → minhash signature → band-bucket join
- simhash          — 64-bit simhash + band-bucket candidate pairing
- ngram_jaccard    — exact n-gram Jaccard verification on candidates
- embedding cosine — see operators.similarity (near-dup by vector)

Scale stance (100 TB): never build the global pair matrix. Candidate
generation is always *bucketed* (LSH bands / simhash bands) so the
only joins are equi-joins on bucket keys, which shuffle-partition
cleanly; exact verification runs only within buckets. Hot buckets
(boilerplate text) are the skew risk — AQE skew-join handles moderate
cases; pathological buckets should be capped upstream.

Hashing uses Spark's built-in xxhash64/murmur (JVM-side, codegen).
These are deterministic across executors/runs — but engine-specific,
so LSH-based operators are verified by the rows-only track plus local
invariant tests, while exact dedup has a full DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pagerank_mapreduce_spark.functions.text import fingerprint, tokens


# ----------------------------------------------------------- exact


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative per normalized-text group.

    One shuffle on the fingerprint; min() is algebraic so map-side
    combine applies. Output: (id_col, fp) — join back to recover
    payload columns, keeping the shuffle payload narrow.
    """
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, "fp")
    )


# ----------------------------------------------------- minhash LSH


def shingles(col: Column | str, k: int = 3) -> Column:
    """Word k-shingles as strings (sliding window over tokens)."""
    toks = tokens(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n < k, F.array(F.array_join(toks, " "))).otherwise(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " "))
    )


def minhash_signature(col: Column | str, num_hashes: int = 32, k: int = 3) -> Column:
    """MinHash signature: per hash function i, min over shingles of
    xxhash64(shingle, seed=i). Pure built-ins — the signature is an
    ARRAY<BIGINT> of length num_hashes computed JVM-side."""
    sh = shingles(col, k)
    return F.array(
        *[
            F.array_min(F.transform(sh, lambda s, i=i: F.xxhash64(s, F.lit(i))))
            for i in range(num_hashes)
        ]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash-LSH.

    rows_per_band = num_hashes/bands; two docs land in the same bucket
    iff a whole band of their signatures matches. Self-join is an
    equi-join on (band, band_hash) — broadcast-free, shuffle-clean.
    Output: (a, b) id pairs with a < b, distinct.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    sig = df.select(
        F.col(id_col), minhash_signature(text_col, num_hashes, k).alias("sig")
    )
    banded = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",", *[F.element_at("sig", b * r + j + 1) for j in range(r)]
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"))
        .distinct()
    )


def ngram_jaccard(df_pairs: DataFrame, docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs.

    Joins the (a, b) pair relation back to shingle sets and computes
    |A∩B|/|A∪B| with array built-ins. Candidates only — never all
    pairs. Output: (a, b, jaccard DOUBLE)."""
    sets_df = docs.select(
        F.col(id_col), F.array_distinct(shingles(text_col, k)).alias("sh")
    )
    return (
        df_pairs.join(sets_df.withColumnRenamed(id_col, "a").withColumnRenamed("sh", "sh_a"), "a")
        .join(sets_df.withColumnRenamed(id_col, "b").withColumnRenamed("sh", "sh_b"), "b")
        .select(
            "a",
            "b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
    )


def minhash_dedup(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact Jaccard filter.
    Returns pairs (a, b, jaccard) with jaccard >= threshold."""
    cand = minhash_lsh_candidates(df, text_col, id_col, num_hashes, bands, k)
    return ngram_jaccard(cand, df, text_col, id_col, k).filter(
        F.col("jaccard") >= threshold
    )


# -------------------------------------------------------- simhash


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
              k: int = 2) -> DataFrame:
    """63-bit SimHash over word k-shingles (sign bit skipped to stay in
    positive BIGINT space). Returns (id_col, sh BIGINT).

    Shape: explode shingles → xxhash64 → ONE groupBy(id) with 63
    algebraic sign-sum aggregates → assemble bits. One shuffle keyed
    on the doc id; every aggregate gets map-side partial aggregation,
    so skewed document lengths stay safe at scale."""
    hashed = df.select(
        F.col(id_col), F.explode(shingles(text_col, k)).alias("s")
    ).select(id_col, F.xxhash64("s").alias("h"))
    sign_sums = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(63)
    ]
    agg = hashed.groupBy(id_col).agg(*sign_sums)
    sh = F.lit(0)
    for i in range(63):
        sh = sh.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        )
    return agg.select(F.col(id_col), sh.cast("bigint").alias("sh"))


def simhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
    k: int = 2,
) -> DataFrame:
    """Near-dup candidates: docs agreeing on at least one of ``bands``
    16-bit slices of their simhash (covers Hamming distance < bands).
    Same bucketed-equi-join shape as MinHash-LSH."""
    width = 64 // bands
    sim = simhash64(df, text_col, id_col, k)
    banded = sim.select(
        id_col,
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("sh"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "sh", "bb.band", "bb.bucket")
    l, r = banded.alias("l"), banded.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("a"),
            F.col(f"r.{id_col}").alias("b"),
            F.bit_count(F.col("l.sh").bitwiseXOR(F.col("r.sh"))).alias("hamming"),
        )
        .distinct()
    )
    return pairs
