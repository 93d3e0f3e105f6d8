"""Bucketed-table layout — the engine's co-located-join strategy.

MR-MPI's aggregate() routes all copies of a key to one processor per
job (src/mapreduce.cpp:382-536). Bucketing does that routing ONCE at
write time: both sides of a recurring equi-join stored bucketed on
the join key join with ZERO exchanges afterwards — the win that
matters for the PageRank loop (same edge relation joined every
iteration) and for fact-fact joins re-run per dashboard refresh.

At 100 TB: pick bucket counts so a single bucket of the larger table
fits an executor's memory (buckets = size / ~256 MB, rounded to a
power of two); both sides must agree on (keys, bucket count) or
Spark falls back to shuffling the mismatched side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    path: str,
    table: str,
    num_buckets: int,
    *keys: str,
    sort: bool = True,
) -> None:
    """Persist ``df`` bucketed (and per-bucket sorted) on ``keys``.

    Sorting within buckets additionally lets sort-merge joins skip
    their sort step entirely — the plan degenerates to a zip-merge
    over pre-sorted bucket files.
    """
    writer = df.write.bucketBy(num_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.option("path", path).mode("overwrite").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a table written by :func:`write_bucketed`. Bucket metadata
    lives in the catalog, so the plain ``table()`` read carries the
    co-partitioning guarantee into join planning."""
    return spark.table(table)
