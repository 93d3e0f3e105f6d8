"""CSV source with quarantine (sources/csv.py): PERMISSIVE parse with
corrupt-row side relation, FAILFAST strict mode, and the write/read
round-trip identity on clean frames."""

from __future__ import annotations

import pytest

from pagerank_mapreduce_spark.sources.csv import (
    read_csv_quarantine,
    split_corrupt_csv,
    write_csv,
)

SCHEMA = "doc_id bigint, score double, label string"


def _write(tmp_path, lines, name="in.csv"):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


GOOD = ["doc_id,score,label", "1,0.5,alpha", "2,1.25,beta"]
BAD = ['3,not_a_number,"gamma', "4,2.5,delta"]


def test_quarantine_splits_parse_failures(spark, tmp_path):
    path = _write(tmp_path, GOOD + BAD)
    df = read_csv_quarantine(spark, path, SCHEMA)
    clean, bad = split_corrupt_csv(df)
    got = sorted((r["doc_id"], r["score"], r["label"]) for r in clean.collect())
    assert got == [(1, 0.5, "alpha"), (2, 1.25, "beta"), (4, 2.5, "delta")]
    raws = [r["raw_line"] for r in bad.collect()]
    assert len(raws) == 1 and "not_a_number" in raws[0]


def test_strict_mode_aborts_on_first_bad_row(spark, tmp_path):
    path = _write(tmp_path, GOOD + BAD)
    with pytest.raises(Exception):
        read_csv_quarantine(spark, path, SCHEMA, strict=True).collect()
    # clean input parses fine under strict
    ok = _write(tmp_path, GOOD, "ok.csv")
    assert read_csv_quarantine(spark, ok, SCHEMA, strict=True).count() == 2


def test_write_read_round_trip(spark, tmp_path):
    rows = [(1, 0.5, 'quo"ted'), (2, None, "has,comma"), (3, 2.0, None)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = str(tmp_path / "out")
    write_csv(df, out)
    back = read_csv_quarantine(spark, out, SCHEMA)
    clean, bad = split_corrupt_csv(back)
    assert bad.count() == 0
    assert sorted(map(tuple, clean.collect())) == sorted(rows)


def test_split_requires_permissive_read(spark, tmp_path):
    path = _write(tmp_path, GOOD)
    df = read_csv_quarantine(spark, path, SCHEMA, strict=True)
    with pytest.raises(ValueError, match="split_corrupt_csv"):
        split_corrupt_csv(df)


def test_quarantine_does_not_mutate_caller_schema(spark, tmp_path):
    # StructType.add mutates in place; the reader must copy, or a
    # reused caller-owned schema accretes _corrupt_record fields and a
    # later strict read / write carries the stray column (r9 ADVICE)
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL(SCHEMA)
    path = _write(tmp_path, GOOD)
    before = [f.name for f in schema.fields]
    read_csv_quarantine(spark, path, schema)
    read_csv_quarantine(spark, path, schema)
    assert [f.name for f in schema.fields] == before
    # and the strict read with the same object stays three-column
    strict = read_csv_quarantine(spark, path, schema, strict=True)
    assert strict.columns == before
