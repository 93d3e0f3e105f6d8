"""Partitioned layout = the engine's file-pruning strategy at scale.

A filter on the partition column must become a PartitionFilters
clause in the scan (directories pruned at planning time), not a row
filter — at 100 TB that's the difference between scanning 3 probed
LSH buckets and scanning the whole ANN index."""

from __future__ import annotations

from pyspark.sql import functions as F

from pagerank_mapreduce_spark.operators import similarity as S
from pagerank_mapreduce_spark.sources.partitioned import (
    read_partitioned,
    scan_is_pruned,
    write_partitioned,
)
from pagerank_mapreduce_spark.sources.tables import load_table


def test_partitioned_events_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_type")
    write_partitioned(events, path, "event_type")

    back = read_partitioned(spark, path)
    # round-trip parity (partition column comes back from dir names)
    assert back.count() == events.count()
    want = {
        (r["event_type"], r["n"])
        for r in events.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    got = {
        (r["event_type"], r["n"])
        for r in back.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert got == want

    # the category filter prunes directories, not rows
    one = back.filter(F.col("event_type") == "click")
    assert scan_is_pruned(one)
    # and an unfiltered read has nothing to prune
    assert not scan_is_pruned(back)


def test_lsh_index_partitioned_probe_prunes(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    query = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    bucketed = S.lsh_bucketize(emb, dim=len(query))
    path = str(tmp_path / "ann_index")
    # the materialized ANN index: bucket id as the partition key
    write_partitioned(bucketed, path, "bucket")

    index = read_partitioned(spark, path)
    top = S.lsh_topk(index, query, k=10)
    # probe filter (bucket within Hamming ball) reaches the directory
    # level — bit_count over the partition column is still a
    # partition-only predicate, so pruning applies
    assert scan_is_pruned(top)
    # probe over the partitioned index = probe over the in-memory frame
    want = [(r["vec_id"], r["cos"]) for r in S.lsh_topk(bucketed, query, k=10).collect()]
    got = [(r["vec_id"], r["cos"]) for r in top.collect()]
    assert got == want
