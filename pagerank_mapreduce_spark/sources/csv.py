"""CSV source with quarantine — the other interchange format corpora
and dimension feeds arrive in (exports from warehouses, spreadsheets,
logging systems; delimiters, quoting, and ragged rows included).

Same contract as the JSONL source (``sources/jsonl.py``): PERMISSIVE
parsing with an explicit ``columnNameOfCorruptRecord`` quarantines
malformed lines into a side relation carrying their raw text, while
``strict=True`` restores the reference-style first-error abort
(FAILFAST — the edge reader's A2 posture). Schema is REQUIRED for the
same scale reason: inference is a full extra pass over the input and
is sample-order-dependent.

CSV-specific notes:

- a row is corrupt when it fails to PARSE against the schema (wrong
  type, malformed quoting). Column-count drift alone is NOT corrupt
  under Spark's CSV reader: missing trailing columns read as NULL and
  extra columns are dropped — callers needing strict arity should
  validate ``raw`` widths on the quarantine relation's side or count
  delimiters in a derived column.
- the round-trip writer quotes minimally and writes an explicit
  header; reading it back with the same schema is the identity on
  clean frames (pinned in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_csv_quarantine(
    spark: SparkSession,
    path: str | list[str],
    schema: StructType | str,
    strict: bool = False,
    sep: str = ",",
    header: bool = True,
) -> DataFrame:
    """Read CSV with an explicit schema.

    ``strict=False`` (default): PERMISSIVE — rows that fail to parse
    yield NULL data columns plus the raw line in ``_corrupt_record``
    (split with :func:`split_corrupt_csv`). ``strict=True``: FAILFAST.
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    reader = (
        spark.read.option("sep", sep)
        .option("header", str(header).lower())
        .option("enforceSchema", "true")
        # RFC-4180 doubled-quote escaping, matching write_csv — the
        # reader and writer MUST agree or quoted quotes shear rows
        .option("escape", '"')
    )
    if strict:
        return reader.schema(schema).option("mode", "FAILFAST").csv(path)
    # build a COPY — StructType.add mutates in place, so it would
    # permanently append the corrupt column to a caller-owned schema
    with_corrupt = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    return (
        reader.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def split_corrupt_csv(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) — same cache-first shape as the JSONL
    splitter: both halves consume one parse, and filtering on only
    the corrupt column requires the materialized relation."""
    if CORRUPT_COL not in df.columns:
        raise ValueError(
            f"split_corrupt_csv: no {CORRUPT_COL} column — "
            "read with read_csv_quarantine(strict=False)"
        )
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, bad


def write_csv(
    df: DataFrame,
    path: str,
    sep: str = ",",
    mode: str = "overwrite",
) -> None:
    """Write a CSV export that round-trips with the quarantining
    reader: explicit header, minimal quoting, escaped quotes."""
    (
        df.write.mode(mode)
        .option("sep", sep)
        .option("header", "true")
        .option("escape", '"')
        .csv(path)
    )
