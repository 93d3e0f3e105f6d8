"""Streaming sinks + the bucketed-layout engine API."""

from __future__ import annotations

from pyspark.sql import functions as F

from pagerank_mapreduce_spark.plans import exchange_count, join_strategies
from pagerank_mapreduce_spark.sources.bucketed import (
    read_bucketed,
    write_bucketed,
)
from pagerank_mapreduce_spark.sources.tables import load_table
from pagerank_mapreduce_spark.streaming.sinks import (
    write_stream_foreach_batch,
    write_stream_parquet,
)
from pagerank_mapreduce_spark.streaming.windows import (
    read_events_stream,
    tumbling_counts,
)


def test_parquet_file_sink_is_complete_and_exactly_once(spark, sf_dir, tmp_path):
    stream = read_events_stream(spark, sf_dir)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    write_stream_parquet(stream, out, ckpt)
    written = spark.read.parquet(out)
    batch = load_table(spark, sf_dir, "events")
    assert written.count() == batch.count()
    # restart with the same checkpoint: no new data -> no duplicates
    write_stream_parquet(read_events_stream(spark, sf_dir), out, ckpt)
    assert spark.read.parquet(out).count() == batch.count()


def test_foreach_batch_sees_batch_dataframes(spark, sf_dir, tmp_path):
    stream = tumbling_counts(read_events_stream(spark, sf_dir))
    seen: list[tuple[int, int]] = []

    def sink(batch_df, batch_id):
        assert not batch_df.isStreaming
        seen.append((batch_id, batch_df.count()))

    write_stream_foreach_batch(
        stream, sink, str(tmp_path / "ckpt"), output_mode="complete"
    )
    assert seen and sum(n for _, n in seen) > 0


def test_bucketed_api_joins_without_exchange(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    write_bucketed(li, str(tmp_path / "li"), "li_b_api", 4, "l_orderkey")
    write_bucketed(od, str(tmp_path / "od"), "od_b_api", 4, "o_orderkey")
    try:
        saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            a = read_bucketed(spark, "li_b_api")
            b = read_bucketed(spark, "od_b_api")
            joined = a.join(b, a.l_orderkey == b.o_orderkey).groupBy(
                "o_orderstatus"
            ).agg(F.sum("l_quantity").alias("qty"))
            # the join itself is exchange-free: the only shuffle is the
            # final aggregation's, and the join is sort-merge over
            # pre-sorted buckets
            assert exchange_count(joined) == 1
            assert join_strategies(joined).get("SortMergeJoin", 0) == 1
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b_api")
        spark.sql("DROP TABLE IF EXISTS od_b_api")
