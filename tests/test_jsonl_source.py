"""JSONL ingest: schema-explicit parse, corrupt-line quarantine,
strict-abort parity with the edge reader's posture."""

from __future__ import annotations

import pytest

from pagerank_mapreduce_spark.sources.jsonl import (
    read_jsonl,
    split_corrupt,
)

SCHEMA = "doc_id bigint, text string, lang string"


@pytest.fixture()
def jsonl_path(tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en"}\n'
        '{"doc_id": 2, "text": "bonjour", "lang": "fr"}\n'
        'this line is not json at all\n'
        '{"doc_id": 3, "text": "truncated...\n'
        '{"doc_id": 4, "text": "ok", "lang": "de"}\n'
    )
    return str(p)


def test_permissive_quarantines_corrupt_lines(spark, jsonl_path):
    df = read_jsonl(spark, jsonl_path, SCHEMA)
    clean, bad = split_corrupt(df)
    got = {r.doc_id: (r.text, r.lang) for r in clean.collect()}
    assert got == {
        1: ("hello world", "en"),
        2: ("bonjour", "fr"),
        4: ("ok", "de"),
    }
    raws = sorted(r.raw_line for r in bad.collect())
    assert len(raws) == 2
    assert any("not json" in r for r in raws)
    assert any("truncated" in r for r in raws)
    # clean side carries no corrupt column
    assert "_corrupt_record" not in clean.columns


def test_strict_mode_aborts(spark, jsonl_path):
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        read_jsonl(spark, jsonl_path, SCHEMA, strict=True).collect()


def test_split_requires_permissive_read(spark, jsonl_path):
    df = read_jsonl(spark, jsonl_path, SCHEMA).drop("_corrupt_record")
    with pytest.raises(ValueError):
        split_corrupt(df)


def test_partial_schema_prunes_columns(spark, jsonl_path):
    # narrower schema: unlisted JSON fields are simply not parsed
    df = read_jsonl(spark, jsonl_path, "doc_id bigint, lang string")
    clean, _ = split_corrupt(df)
    assert clean.columns == ["doc_id", "lang"]
    assert {r.doc_id for r in clean.collect()} >= {1, 2, 4}


def test_jsonl_write_read_round_trip(spark, tmp_path):
    from pagerank_mapreduce_spark.sources.jsonl import (
        read_jsonl,
        split_corrupt,
        write_jsonl,
    )

    rows = [
        (1, 'line with "quotes" and a\nnewline', "en"),
        (2, "unicode: ümläut 中文", "de"),
        (3, None, "fr"),  # NULL field must survive
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    p = str(tmp_path / "out.jsonl")
    write_jsonl(df, p)
    back = read_jsonl(spark, p, "doc_id bigint, text string, lang string")
    clean, bad = split_corrupt(back)
    assert bad.count() == 0
    got = sorted(map(tuple, clean.collect()))
    assert got == sorted(rows, key=lambda r: r[0])


def test_read_jsonl_does_not_mutate_caller_schema(spark, tmp_path):
    # same no-mutation contract as the CSV reader (r9 ADVICE): a
    # caller-owned StructType must not accrete _corrupt_record fields
    from pyspark.sql.types import StructType

    p = tmp_path / "in.jsonl"
    p.write_text('{"doc_id": 1, "text": "a"}\n')
    schema = StructType.fromDDL("doc_id bigint, text string")
    before = [f.name for f in schema.fields]
    read_jsonl(spark, str(p), schema)
    read_jsonl(spark, str(p), schema)
    assert [f.name for f in schema.fields] == before
