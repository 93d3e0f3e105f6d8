"""Lake-layout schema evolution: mergeSchema reads across parquet
files written with different column sets — the append-a-column case
every long-lived 100 TB table hits."""

from __future__ import annotations


def test_merge_schema_union_and_nulls(spark, tmp_path):
    p = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "a")], "id bigint, name string"
    ).write.parquet(p + "/part=1")
    spark.createDataFrame(
        [(2, "b", 9.5)], "id bigint, name string, score double"
    ).write.parquet(p + "/part=2")
    df = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(df.columns) == {"id", "name", "score", "part"}
    rows = {r.id: (r.name, r.score) for r in df.collect()}
    # the old file's missing column surfaces as NULL, not an error
    assert rows == {1: ("a", None), 2: ("b", 9.5)}


def test_without_merge_schema_first_file_wins(spark, tmp_path):
    # the default read infers from one footer — documents why the
    # engine's sources default to EXPLICIT schemas (sources/jsonl.py
    # abort-on-corrupt stance): silent column loss is worse than a
    # schema error
    p = str(tmp_path / "tbl2")
    spark.createDataFrame([(1,)], "id bigint").write.parquet(p + "/part=1")
    spark.createDataFrame(
        [(2, 1.5)], "id bigint, score double"
    ).write.parquet(p + "/part=2")
    df = spark.read.parquet(p)
    assert "id" in df.columns
    # score may or may not appear depending on which footer Spark
    # sampled — the point: it is NOT guaranteed, unlike mergeSchema
    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) >= {"id", "score"}
