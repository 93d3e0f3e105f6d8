"""Deterministic probabilistic sketches: count-min and Bloom.

Approximate structures with EXACTLY replayable arithmetic: both
sketches hash with the repo's portable 16-bit md5 convention, so
estimates — including their overcounts and false positives — are a
pure function of the data and replay bit-for-bit in the DuckDB
oracle. (Contrast `approx_count_distinct`, whose HLL internals are
engine-private — the one irreducibly rows-only aggregate in the
catalog.)

Scale design:

- A count-min sketch is ``depth x width`` counters — KILOBYTES. The
  build is one algebraic groupBy over the exploded (row, bucket)
  pairs (map-side partials bound reducer input by depth*width per
  task); the estimate side BROADCASTS the sketch, so frequency
  lookups for any probe set are a broadcast join + min — no shuffle
  of the probe relation.
- A Bloom filter here is the set of occupied bit positions (absent
  bit == absent row — identical semantics to a bitmap, in relational
  clothing). Build: k positions per key, distinct. Probe: a key is
  "maybe present" iff all k of its positions are occupied —
  the classic shuffle-avoiding semi-join prefilter: ship the
  kilobyte filter, not the join key column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cms_bucket",
    "cms_build",
    "cms_estimate",
    "bloom_positions",
    "bloom_build",
    "bloom_maybe_contains",
    "fm_distinct_estimate",
]


def cms_bucket(key: Column, row: Column, width: int) -> Column:
    """Portable bucket hash: md5_16('row:key') % width.

    NULL keys must be filtered BEFORE hashing (every entry point in
    this module does): ``concat_ws`` skips NULL arguments, so a NULL
    key would hash as just the row prefix here while an oracle's
    ``concat(row, ':', CAST(key AS VARCHAR))`` yields ``'row:'`` —
    silently different md5 inputs and divergent sketch contents."""
    h = F.md5(F.concat_ws(":", row.cast("string"), key.cast("string")))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % width


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min sketch of ``key_col``'s frequency distribution:
    (row, bucket, c) with depth*width rows at most."""
    rows = F.explode(
        F.sequence(F.lit(0), F.lit(depth - 1))
    ).alias("row")
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(F.col(key_col).alias("_k"), rows)
        .select("row", cms_bucket(F.col("_k"), F.col("row"), width).alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("c"))
    )


def cms_estimate(
    cms: DataFrame, probes: DataFrame, key_col: str, depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Frequency estimate per probe key: min over the depth rows of
    the key's bucket counters. Returns (key_col, est). Keys that hit
    an empty counter estimate 0 (possible only for keys absent from
    the build)."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    pb = probes.filter(F.col(key_col).isNotNull()).select(
        F.col(key_col), rows
    ).select(
        key_col,
        "row",
        cms_bucket(F.col(key_col), F.col("row"), width).alias("bucket"),
    )
    return (
        pb.join(F.broadcast(cms), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("est"))
    )


def bloom_positions(key: Column, k: int = 3, bits: int = 1024) -> Column:
    """Array of the key's k bit positions (md5_16('i:key') % bits)."""
    return F.array(
        *[
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit(str(i)), key.cast("string"))),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("int")
            % bits
            for i in range(k)
        ]
    )


def bloom_build(
    df: DataFrame, key_col: str, k: int = 3, bits: int = 1024
) -> DataFrame:
    """Occupied-position relation (pos) of the build side's keys.
    NULL keys carry no membership information and are excluded."""
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(
            F.explode(bloom_positions(F.col(key_col), k, bits)).alias("pos")
        )
        .distinct()
    )


def bloom_maybe_contains(
    probes: DataFrame,
    bloom: DataFrame,
    key_col: str,
    k: int = 3,
    bits: int = 1024,
) -> DataFrame:
    """Filter ``probes`` to keys whose k positions are ALL occupied
    ("maybe present"; absent keys pass only as false positives).
    Duplicate probe rows collapse (set semantics). The filter
    relation broadcasts; the probe side never shuffles."""
    pp = probes.filter(F.col(key_col).isNotNull()).withColumn(
        "_pos", F.explode(bloom_positions(F.col(key_col), k, bits))
    )
    # "all occupied" == no exploded position misses the filter — a
    # max-over-is-null is duplicate-safe where a hit COUNT is not
    # (a key's own k positions may collide)
    hit = (
        pp.join(F.broadcast(bloom), pp["_pos"] == bloom["pos"], "left")
        .groupBy(*probes.columns)
        .agg(F.max(F.col("pos").isNull()).alias("_miss"))
    )
    return hit.filter(~F.col("_miss")).drop("_miss")


# --------------------------- portable distinct sketch (PCSA / FM)


def _fm_bucket_rank(key: Column, buckets: int):
    """(bucket, rank) of a key under the portable md5 convention:
    bucket = md5_16(key) % buckets; rank = 1 + trailing zeros of the
    NEXT 32 md5 bits (33 when zero). log2(x & -x) is exact on the
    power-of-two it receives, so the rank is integer-identical in
    every engine."""
    h = F.md5(key.cast("string"))
    bucket = F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % buckets
    x = F.conv(F.substring(h, 5, 8), 16, 10).cast("bigint")
    rank = F.when(x == 0, F.lit(33)).otherwise(
        (F.log2((x.bitwiseAND(-x)).cast("double")) + 1.0).cast("int")
    )
    return bucket, rank


def fm_distinct_estimate(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    buckets: int = 64,
    round_digits: int = 4,
) -> DataFrame:
    """Per-group approximate distinct count — textbook Flajolet-Martin
    PCSA (probabilistic counting with stochastic averaging): each
    bucket keeps the OR-bitmap of observed ranks; ``R_b`` is the
    position of the bucket's lowest UNSET bit;
    ``est = buckets / 0.77351 * 2^(sum R_b / buckets)``.

    The PORTABLE twin of ``approx_count_distinct``: Spark's HLL
    internals are engine-private (that catalog entry is irreducibly
    rows-only), but this sketch's md5/bit arithmetic replays
    bit-for-bit in any engine, so the ESTIMATE itself — bias and all
    — is oracle-checkable (exact counts ride alongside in the catalog
    query, keeping the error visible). Same merge algebra as HLL
    (per-bucket OR), so it shards/combines map-side like any
    algebraic aggregate; the state is ``buckets`` bigints per group.
    An empty bucket's bitmap is 0 → R_b = 0, so present-bucket sums
    already equal dense sums.
    """
    bucket, rank = _fm_bucket_rank(F.col(key_col), buckets)
    per_bucket = (
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols, bucket.alias("_b"), rank.alias("_r"))
        # the DataFrame-API shiftleft wants a literal shift; the SQL
        # form takes a column
        .withColumn("_bit", F.expr("shiftleft(CAST(1 AS BIGINT), _r - 1)"))
        .groupBy(*group_cols, "_b")
        .agg(F.bit_or("_bit").alias("_bm"))
    )
    # lowest unset bit of the bitmap: (~bm) & (bm + 1) is that bit's
    # power of two; log2 of it is exact
    low_unset = F.bitwise_not(F.col("_bm")).bitwiseAND(F.col("_bm") + 1)
    r_b = F.log2(low_unset.cast("double")).cast("int")
    return (
        per_bucket.select(*group_cols, r_b.alias("_r"))
        .groupBy(*group_cols)
        .agg(
            F.round(
                F.lit(buckets)
                / 0.77351
                * F.pow(
                    2.0,
                    F.sum("_r").cast("double") / F.lit(float(buckets)),
                ),
                round_digits,
            ).alias("est")
        )
    )
