"""Streaming joins: batch-vs-stream parity through availableNow."""

from __future__ import annotations

from pagerank_mapreduce_spark.sources.tables import load_table
from pagerank_mapreduce_spark.streaming.joins import (
    enrich_stream,
    interval_join_streams,
)
from pagerank_mapreduce_spark.streaming.windows import (
    read_events_stream,
    run_to_memory_sink,
)


def test_stream_static_enrich_matches_batch(spark, sf_dir):
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    batch = enrich_stream(
        load_table(spark, sf_dir, "events").select("event_id", "user_id"), cu
    )
    stream = enrich_stream(
        read_events_stream(spark, sf_dir).select("event_id", "user_id"), cu
    )
    q = run_to_memory_sink(stream, "enrich_sink", mode="append")
    q.awaitTermination()
    got = spark.table("enrich_sink").collect()
    want = batch.collect()
    key = lambda r: (r["event_id"],)
    assert sorted(map(tuple, got), key=lambda t: t[0]) == sorted(
        map(tuple, want), key=lambda t: t[0]
    )


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    def split(df):
        c = df.filter(df.event_type == "click").select(
            "event_id", "user_id", "ts"
        )
        p = df.filter(df.event_type == "purchase").select(
            df.event_id.alias("p_id"), df.user_id.alias("p_user"), df.ts.alias("p_ts")
        ).withColumnRenamed("p_user", "user_id").withColumnRenamed("p_ts", "ts")
        return c, p

    ev_b = load_table(spark, sf_dir, "events")
    cb, pb = split(ev_b)
    want = {
        (r["event_id"], r["p_id"])
        for r in interval_join_streams(cb, pb).collect()
    }
    ev_s = read_events_stream(spark, sf_dir)
    cs, ps = split(ev_s)
    q = run_to_memory_sink(
        interval_join_streams(cs, ps).select("event_id", "p_id"),
        "ssj_sink",
        mode="append",
    )
    q.awaitTermination()
    got = {
        (r["event_id"], r["p_id"]) for r in spark.table("ssj_sink").collect()
    }
    assert got == want
