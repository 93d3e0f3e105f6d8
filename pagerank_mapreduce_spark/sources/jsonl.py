"""JSONL document source — the ingest format training-data pipelines
actually receive corpora in (one JSON object per line, schema drift
and truncated lines included).

Counterpart of the strict edge-list reader (``sources/edges.py``,
reference abort semantics A2): where the reference aborts on the
first malformed line, a corpus ingest wants the malformed lines
QUARANTINED — parsed rows flow on, broken lines land in a side
relation carrying their raw text for triage. Spark's PERMISSIVE mode
plus an explicit ``columnNameOfCorruptRecord`` provides exactly that
contract; ``strict=True`` restores the reference-style abort
(FAILFAST).

Scale notes: an explicit schema is REQUIRED — schema inference scans
the whole input once before the real read (a 2× pass over 100 TB) and
is order-dependent under drift. Line-delimited JSON splits by byte
ranges like any text source, so parallelism is file-split-bound; the
corrupt-record column is NULL for clean rows and prunes away when
unselected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str | list[str],
    schema: StructType | str,
    strict: bool = False,
) -> DataFrame:
    """Read line-delimited JSON with an explicit schema.

    ``strict=False`` (default): PERMISSIVE — malformed lines yield a
    row whose data columns are NULL and whose ``_corrupt_record``
    column holds the raw line (split with :func:`split_corrupt`).
    ``strict=True``: FAILFAST — the first malformed line raises, the
    reference's abort posture.
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if strict:
        return spark.read.schema(schema).option("mode", "FAILFAST").json(path)
    # build a COPY — StructType.add mutates in place, so it would
    # permanently append the corrupt column to a caller-owned schema
    with_corrupt = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    return (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): clean rows without the corrupt column,
    quarantined raw lines for triage.

    The parsed relation is cached first: Spark refuses a filter that
    references ONLY the corrupt column of an uncached JSON relation
    (the internal raw-record column exists only during parsing), and
    both halves consume the same parse anyway.
    """
    if CORRUPT_COL not in df.columns:
        raise ValueError(f"split_corrupt: no {CORRUPT_COL} column — "
                         "read with read_jsonl(strict=False)")
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, bad


def write_jsonl(
    df: DataFrame,
    path: str,
    max_records_per_file: int | None = None,
) -> None:
    """Write line-delimited JSON — the corpus EXPORT face of this
    module; ``read_jsonl(write_jsonl(df))`` round-trips exactly
    (JSON string escaping keeps embedded newlines/quotes one line per
    record). Spark's native json writer streams row-by-row JVM-side;
    ``max_records_per_file`` is the small-files/giant-files dial
    (sources/compact.py exists for when it was set wrong)."""
    w = df.write.mode("overwrite")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.json(path)
