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


def test_compact_small_files(spark, tmp_path):
    from pyspark.sql import functions as F

    from pagerank_mapreduce_spark.sources.compact import compact_parquet

    src = str(tmp_path / "frag")
    out = str(tmp_path / "compacted")
    spark.range(10_000).withColumn("v", F.col("id") % 97).repartition(
        64
    ).write.parquet(src)
    st = compact_parquet(spark, src, out, target_rows_per_file=5_000)
    assert st.files_before == 64
    assert st.files_after == 2
    assert st.rows == 10_000
    a = sorted(r.id for r in spark.read.parquet(src).collect())
    b = sorted(r.id for r in spark.read.parquet(out).collect())
    assert a == b


def test_compact_sorted_files_are_disjoint_bands(spark, tmp_path):
    from pyspark.sql import functions as F

    from pagerank_mapreduce_spark.sources.compact import compact_parquet

    src = str(tmp_path / "frag2")
    out = str(tmp_path / "sorted")
    spark.range(8_000).withColumn(
        "k", (F.col("id") * 7919) % 1000
    ).repartition(32).write.parquet(src)
    st = compact_parquet(
        spark, src, out, target_rows_per_file=2_000, sort_cols=["k"]
    )
    assert st.files_after == 4
    # each output file must own a k-band disjoint from the others —
    # the min/max tightness that makes parquet stats prunable
    import pyarrow.parquet as pq
    import glob

    bands = []
    for f in glob.glob(out + "/part-*.parquet"):
        t = pq.read_table(f, columns=["k"])
        ks = t.column("k").to_pylist()
        if ks:
            bands.append((min(ks), max(ks)))
    bands.sort()
    for (lo1, hi1), (lo2, hi2) in zip(bands, bands[1:]):
        assert hi1 <= lo2, bands
