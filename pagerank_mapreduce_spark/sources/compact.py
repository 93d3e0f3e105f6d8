"""Small-files compaction — the lake-maintenance pass every streaming
or incremental writer eventually owes.

foreachBatch appends, per-trigger micro-batches, and per-partition
writers all leave a long tail of kilobyte parquet files; at 100 TB
the scan cost is dominated by file-open/footer-read overhead and the
driver's listing, not bytes. Compaction = read, re-partition to the
target file count, optionally range-sort (restoring min/max stat
tightness for data skipping, the zorder.py concern), write to a NEW
location and let the caller swap — never an in-place rewrite, so a
failed compaction leaves the source untouched (rename-swap is the
atomic commit, same stance as the streaming file sink's manifest).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class CompactionStats:
    files_before: int
    files_after: int
    rows: int


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    out_path: str,
    target_rows_per_file: int = 1_000_000,
    sort_cols: list[str] | None = None,
) -> CompactionStats:
    """Rewrite ``src_path``'s parquet files into
    ``ceil(rows / target_rows_per_file)`` files at ``out_path``.
    With ``sort_cols``, rows are range-partitioned AND sorted within
    files on those columns, so each output file owns a tight min/max
    band (scan pruning); without, a plain round-robin repartition
    balances file sizes exactly."""
    df = spark.read.parquet(src_path)
    files_before = len(df.inputFiles())
    rows = df.count()
    n_files = max(1, math.ceil(rows / target_rows_per_file))
    if sort_cols:
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(out_path)
    files_after = len(spark.read.parquet(out_path).inputFiles())
    return CompactionStats(files_before, files_after, rows)
