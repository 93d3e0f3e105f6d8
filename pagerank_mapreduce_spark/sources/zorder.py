"""Z-order (Morton) layout — multi-dimensional data skipping.

Partitioning (partitioned.py) prunes on ONE column; many 100 TB scans
filter on TWO (user x time, key x value band, lat x lon). A linear
layout on either column leaves the other unpruned. The Z-order curve
interleaves the bits of both columns so that records close in the
2-D box are close on the curve — a box predicate then touches only
the curve ranges that intersect the box, which is exactly the
Delta/Iceberg ``OPTIMIZE ZORDER BY`` trick, rebuilt here from plain
expressions + the Hive partition layout:

- ``z_value(a, b)``: pure bit-interleave expression (JVM-side, inside
  whole-stage codegen; no UDF).
- ``write_zordered``: partition directories on the top ``bucket_bits``
  of z (the coarse curve position), sort within partitions by full z
  (parquet row-group min/max stay tight for row-group skipping).
- ``read_zorder_box``: enumerate the curve buckets intersecting the
  query box driver-side (pure arithmetic on at most 2^bucket_bits
  bucket ids — no data touched), prune directories with an ``isin``
  partition filter, and apply the exact residual box predicate.

The curve math is engine-portable integer bit arithmetic, so the
catalog query's DuckDB oracle replays it term for term
(``z_value_sql`` emits the same expression tree in SQL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "z_value",
    "z_value_sql",
    "overlapping_buckets",
    "write_zordered",
    "read_zorder_box",
]


def z_value(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into one Morton code: z bit ``2i`` is a's bit ``i``, z bit
    ``2i+1`` is b's bit ``i``. Pure expression — 2*bits shift/mask
    terms OR-folded, fully inside codegen."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def z_value_sql(a_expr: str, b_expr: str, bits: int = 16) -> str:
    """The same Morton interleave as :func:`z_value`, as a DuckDB SQL
    expression string — the oracle replay."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a_expr} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b_expr} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def overlapping_buckets(
    a_range: tuple[int, int],
    b_range: tuple[int, int],
    bits: int = 16,
    bucket_bits: int = 8,
) -> list[int]:
    """Bucket ids (top ``bucket_bits`` of z) whose curve region
    intersects the query box — pure driver-side arithmetic over at
    most 2^bucket_bits ids, nothing scanned. ``bucket_bits`` must be
    even so a and b contribute equally to the prefix."""
    if bucket_bits % 2 != 0:
        raise ValueError("bucket_bits must be even")
    half = bucket_bits // 2
    shift = bits - half  # low bits NOT represented in the bucket
    a_lo, a_hi = a_range
    b_lo, b_hi = b_range
    out = []
    for beta in range(1 << bucket_bits):
        # de-interleave the bucket prefix: bucket bit j is z bit
        # (2*bits - bucket_bits + j); even z bits belong to a
        a_pre = b_pre = 0
        for j in range(bucket_bits):
            zbit = 2 * bits - bucket_bits + j
            if (beta >> j) & 1:
                if zbit % 2 == 0:
                    a_pre |= 1 << (zbit // 2 - shift)
                else:
                    b_pre |= 1 << (zbit // 2 - shift)
        a_min, a_max = a_pre << shift, ((a_pre + 1) << shift) - 1
        b_min, b_max = b_pre << shift, ((b_pre + 1) << shift) - 1
        if a_min <= a_hi and a_lo <= a_max and b_min <= b_hi and b_lo <= b_max:
            out.append(beta)
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    a_col: str,
    b_col: str,
    bits: int = 16,
    bucket_bits: int = 8,
) -> None:
    """Persist ``df`` Z-ordered on ``(a_col, b_col)``: directory per
    curve bucket (the prunable coarse position), rows range-sorted by
    full z inside so parquet row-group min/max stats stay tight."""
    z = z_value(a_col, b_col, bits)
    zb = F.shiftright(z, 2 * bits - bucket_bits).cast("int")
    (
        df.withColumn("_z", z)
        .withColumn("_zb", zb)
        .repartitionByRange("_zb", "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .partitionBy("_zb")
        .parquet(path)
    )


def read_zorder_box(
    spark: SparkSession,
    path: str,
    a_col: str,
    b_col: str,
    a_range: tuple[int, int],
    b_range: tuple[int, int],
    bits: int = 16,
    bucket_bits: int = 8,
) -> DataFrame:
    """Box query over a Z-ordered layout: directory pruning via the
    pre-computed bucket set, exact residual predicate on the columns
    themselves (buckets over-approximate the box)."""
    buckets = overlapping_buckets(a_range, b_range, bits, bucket_bits)
    df = spark.read.parquet(path)
    return (
        df.filter(F.col("_zb").isin(buckets))
        .filter(
            (F.col(a_col) >= a_range[0])
            & (F.col(a_col) <= a_range[1])
            & (F.col(b_col) >= b_range[0])
            & (F.col(b_col) <= b_range[1])
        )
        .drop("_zb")
    )
