"""Hive-style partitioned layout — the engine's file-pruning strategy.

Bucketing (bucketed.py) co-locates join keys; PARTITIONING prunes
whole directories off the scan before a single byte is read. At
100 TB this is the difference between "query touches the 3 days it
asked for" and "query lists 36,500 day-directories": a filter on the
partition column becomes a PartitionFilters entry in the scan node
and never reaches row-level evaluation.

Two uses matter here:

- Time/category layout: ``events`` partitioned by ``event_type`` (or
  date) so per-type analytics scan one directory.
- ANN index layout: the LSH bucket id as the partition column — the
  probe's bucket filter prunes to the handful of probed buckets'
  files, which is precisely the "at scale the bucket column is a
  partition key" design the similarity operators document.

Partition-count discipline: keep cardinality ≤ ~10^4 directories
(low-cardinality categories, days, LSH buckets of ≤ 2^16) — a
high-cardinality partition column creates a small-files problem
instead of a pruning win; that case is what bucketing is for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    *partition_cols: str,
    max_records_per_file: int | None = None,
) -> None:
    """Persist ``df`` as parquet partitioned by ``partition_cols``
    (one directory level per column, low-cardinality first).

    ``max_records_per_file`` caps file size inside hot partitions —
    the skew guard for e.g. one event type dominating the corpus."""
    writer = df.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout; partition columns come back as
    regular columns (parsed from directory names), and any filter on
    them prunes directories at planning time."""
    return spark.read.parquet(path)


def scan_is_pruned(df: DataFrame) -> bool:
    """True iff the (filtered) scan plan carries a non-empty
    PartitionFilters clause — the assertion that a partition-column
    predicate actually prunes instead of surviving as a row filter.
    Plan-audit helper used by tests; cheap (string inspection of the
    formatted explain — same stable surface as plans.audit, no
    private JVM internals, no job)."""
    import re

    from pagerank_mapreduce_spark.plans.audit import formatted_plan

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", formatted_plan(df))
    return bool(m and m.group(1).strip())
