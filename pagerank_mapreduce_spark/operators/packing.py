"""Sequence packing: assign documents to fixed-token-budget training
chunks by a global running sum — without a global-order window.

The operator a pre-training data pipeline runs last: given per-doc
token counts and a deterministic document order, concatenate docs
into context-window chunks of ``budget`` tokens. The chunk id of a
doc is ``floor(exclusive_prefix_sum(weight) / budget)`` over the
global ``order_col`` order (budget-bucketed packing: a doc that
straddles a boundary is counted into the chunk its prefix starts in,
the deterministic distributed-friendly variant of greedy first-fit).

Scale design (the whole point of this module): the naive formulation
is one window over ``Window.orderBy(order_col)`` — a SINGLE-PARTITION
sort of the entire corpus, the canonical 100 TB scale-killer. Instead
the prefix sum is computed in the classic two-phase shape:

1. coarse ORDER-PRESERVING bucket of ``order_col`` via
   ``width_bucket`` (needs one tiny min/max job);
2. per-bucket exclusive running sum — a window partitioned by bucket,
   so every partition sorts only its own slice;
3. per-bucket totals (one tiny agg: ``num_buckets`` rows), cumulated
   into bucket offsets driver-free with a window over the TINY
   relation, broadcast-joined back.

One data shuffle (by bucket), one broadcast — the plan a 1000-executor
cluster wants. ``width_bucket`` buckets are only as balanced as
``order_col``'s distribution; for pathological id skew pass a larger
``num_buckets`` (empty buckets are free) — rows with equal
``order_col`` would make the in-bucket prefix nondeterministic, so
``order_col`` must be unique (doc ids).

No reference counterpart (the reference is a PageRank engine); this
is part of the training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    weight_col: str,
    order_col: str = "doc_id",
    budget: int = 2048,
    num_buckets: int = 1024,
) -> DataFrame:
    """Add ``chunk_id`` = floor(exclusive prefix sum of ``weight_col``
    in global ``order_col`` order / ``budget``).

    ``order_col`` must be numeric and unique per row; null weights
    count as 0 (a doc with no tokens occupies no budget). Rows with a
    NULL ``order_col`` have no place in the global order — they pass
    through with ``chunk_id`` NULL (never silently dropped) and
    contribute nothing to any prefix sum.
    """
    bounds = df.agg(
        F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
    ).first()
    if bounds is None or bounds["lo"] is None:
        return df.withColumn("chunk_id", F.lit(None).cast("bigint"))
    lo, hi = bounds["lo"], bounds["hi"]

    w = F.coalesce(F.col(weight_col).cast("bigint"), F.lit(0))
    # width_bucket is monotone in order_col, so bucket order == global
    # order; hi+1 keeps the max row inside the last regular bucket
    bucketed = df.withColumn(
        "_b",
        F.width_bucket(
            F.col(order_col), F.lit(lo), F.lit(hi) + F.lit(1), F.lit(num_buckets)
        ),
    )

    local_w = (
        Window.partitionBy("_b")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn(
        "_local_excl", F.coalesce(F.sum(w).over(local_w), F.lit(0))
    )

    # num_buckets rows: the single-partition window here is over the
    # TINY per-bucket totals, not the data
    offs_w = (
        Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        # NULL-order rows (NULL bucket) are outside the global order:
        # excluded here so their weights never shift a real bucket's
        # offset (NULL _b sorts first in ASC and would otherwise be
        # counted into every prefix)
        bucketed.filter(F.col("_b").isNotNull())
        .groupBy("_b")
        .agg(F.sum(w).alias("_bt"))
        .withColumn("_off", F.coalesce(F.sum("_bt").over(offs_w), F.lit(0)))
        .select("_b", "_off")
    )

    # left join: a NULL order_col yields a NULL bucket, which an
    # inner join would silently drop from the corpus — such rows
    # keep their payload and get chunk_id NULL instead
    return (
        local.join(F.broadcast(offsets), "_b", "left")
        .withColumn(
            "chunk_id",
            F.floor((F.col("_off") + F.col("_local_excl")) / F.lit(budget)),
        )
        .drop("_b", "_local_excl", "_off")
    )
