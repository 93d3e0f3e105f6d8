"""Edge-list sources.

The reference's only external input format is a text file of directed
hyperlink edges, one ``"<src> <dst>"`` per line, validated against
``(0|[1-9][0-9]*)\\s(0|[1-9][0-9]*)$`` with an abort naming the first
bad line (reference: mr-pr-cpp.cpp:89-108 ``parse_hlfile``,
mr-pr-mpi.cpp:44-62, mr-pr-mpi-base.cpp:167-196).

Spark-first equivalents:

- ``read_edge_list`` — distributed text scan (FileSourceScanExec does
  the byte-balanced, line-aligned splitting that the reference's mmap
  datasource hand-rolls at include/detail/datasource.hpp:93-168) +
  regex validation + typed projection. Validation failure raises with
  the first offending line, matching the reference's
  ``"invalid input at line number : N"`` abort semantics.
- ``derive_edges`` — a deterministic graph derived from the driver's
  parquet fixtures (FIXTURES.md Track B), so graph queries run inside
  the parquet world and have a DuckDB-SQL mirror.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Anchored form of the reference's validation regex (mr-pr-cpp.cpp:93).
EDGE_LINE_REGEX = r"^(0|[1-9][0-9]*)[ \t](0|[1-9][0-9]*)$"
_EDGE_RE = re.compile(r"(0|[1-9][0-9]*)[ \t](0|[1-9][0-9]*)")


def _invalid_line_error(spark: SparkSession, file_path: str, sample: str) -> str:
    """Reproduce the reference's abort message
    ``"invalid input at line number : N"`` (1-based,
    mr-pr-cpp.cpp:96-98). Line numbers are not stable across a
    distributed scan, so they are recovered by re-scanning the single
    offending file sequentially: ``sc.textFile`` splits arrive in
    byte-offset order, making ``zipWithIndex`` exact. This extra job
    touches one file and runs only on the abort path — the happy path
    stays a single distributed validation pass."""
    rdd = spark.sparkContext.textFile(file_path).zipWithIndex()
    hits = (
        rdd.filter(
            # mirror the distributed filter exactly: F.rtrim strips
            # trailing spaces only, so rstrip(" ") here — not rstrip()
            lambda t: t[0].rstrip(" ") != ""
            and not _EDGE_RE.fullmatch(t[0].rstrip(" "))
        )
        .map(lambda t: t[1])
    )
    try:
        first = hits.min()
    except ValueError:  # empty RDD — fall back to content-only report
        return f"invalid input line: {sample!r} in {file_path}"
    return (
        f"invalid input at line number : {first + 1}"
        f" ({file_path}: {sample!r})"
    )


def read_edge_list(
    spark: SparkSession,
    path: str | list[str],
    validate: bool = True,
    line_sep: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Read a ``"<src> <dst>"`` text edge list into edges(src,dst).

    Duplicate edges and self-loops are preserved — the reference
    parser never dedups (mr-pr-cpp.cpp:89-108) and each duplicate
    contributes to PageRank separately.

    ``line_sep`` maps MR-MPI's map() variants 3/4 (split files into
    byte-balanced chunks aligned to a caller-chosen separator char,
    src/mapreduce.cpp:1157-1379): Spark's text source performs the
    same separator-aligned splitting via the ``lineSep`` option, with
    ``spark.sql.files.maxPartitionBytes`` as the chunk-size knob.

    ``path`` may be a single file, a directory, a glob, or a list of
    any of these; ``recursive=True`` descends into subdirectories —
    together these are MR-MPI's map() variant 2 (file/dir name
    expansion with optional recursion, src/mapreduce.cpp:1022-1051
    ``findfiles``). The reference's file-of-filenames mode is the
    list form after reading the listing client-side.
    """
    reader = spark.read
    if line_sep is not None:
        reader = reader.option("lineSep", line_sep)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    paths = path if isinstance(path, list) else [path]
    lines = reader.text(paths)
    if validate:
        # Cheap distributed validation pass; on failure, recover the
        # reference's 1-based line number with a sequential re-scan of
        # the one offending file (see _invalid_line_error).
        bad = (
            lines.filter(F.length(F.rtrim(F.col("value"))) > 0)
            .filter(~F.rtrim(F.col("value")).rlike(EDGE_LINE_REGEX))
            .select("value", F.col("_metadata.file_path").alias("file_path"))
            .limit(1)
            .collect()
        )
        if bad:
            raise ValueError(
                _invalid_line_error(
                    spark, bad[0]["file_path"], bad[0]["value"]
                )
            )
    parts = F.split(F.rtrim(F.col("value")), r"[ \t]")
    return (
        lines.filter(F.length(F.rtrim(F.col("value"))) > 0)
        .select(
            parts.getItem(0).cast("bigint").alias("src"),
            parts.getItem(1).cast("bigint").alias("dst"),
        )
    )


# Deterministic fixture-derived graph (mirrored by DERIVE_EDGES_SQL so the
# DuckDB oracle sees the identical edge set). o_orderkey is unique and
# o_custkey skews toward repeat customers, so the modulo projection yields
# a multigraph with duplicate edges, self-loops and dangling vertices —
# the same stressors as the reference's test corpus (FIXTURES.md Track A).
def derive_edges(spark: SparkSession, sf_dir: str, n_vertices: int = 1000) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return orders.select(
        (F.col("o_orderkey") % n_vertices).cast("bigint").alias("src"),
        (F.col("o_custkey") % n_vertices).cast("bigint").alias("dst"),
    )


def derive_edges_sql(n_vertices: int = 1000) -> str:
    """DuckDB-SQL mirror of :func:`derive_edges`."""
    return (
        f"SELECT CAST(o_orderkey % {n_vertices} AS BIGINT) AS src, "
        f"CAST(o_custkey % {n_vertices} AS BIGINT) AS dst FROM orders"
    )
