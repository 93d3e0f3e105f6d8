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


def test_stateful_joins_derive_both_state_watermarks(spark, sf_dir):
    # the join time bounds must be plain interval arithmetic:
    # StreamingJoinHelper can only derive a side's state-eviction
    # watermark from casts/interval terms, and a bound it cannot
    # parse silently leaves that side's join buffer growing forever.
    # Pin the derivation by checking the executed streaming plan's
    # "state cleanup" section names BOTH value predicates.
    import contextlib
    import io

    from pagerank_mapreduce_spark.streaming.joins import asof_enrich_stream

    ev = read_events_stream(spark, sf_dir)
    lhs = ev.select("event_id", "user_id", "ts")
    rhs = ev.filter(ev.event_type == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_enrich_stream(lhs, rhs, by="user_id", on="ts", horizon_seconds=3600)
    q = run_to_memory_sink(out, "wm_probe_sink", mode="append")
    q.awaitTermination()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain(extended=False)
    plan = buf.getvalue()
    assert "left value predicate: (ts" in plan, plan
    assert "right value predicate: (ts" in plan, plan


def _asof_sides(df):
    lhs = df.select("event_id", "user_id", "ts")
    rhs = df.filter(df.event_type == "purchase").select(
        "user_id", "ts", "value"
    )
    return lhs, rhs


def test_asof_enrich_batch_equals_asof_join_with_tolerance(spark, sf_dir):
    from pagerank_mapreduce_spark.operators.asof import asof_join
    from pagerank_mapreduce_spark.streaming.joins import asof_enrich_stream

    ev = load_table(spark, sf_dir, "events")
    lhs, rhs = _asof_sides(ev)
    want = {
        (r["event_id"], r["r_value"])
        for r in asof_join(
            lhs, rhs, on="ts", by="user_id", tolerance=3600.0
        ).select("event_id", "r_value").collect()
    }
    got = {
        (r["event_id"], r["r_value"])
        for r in asof_enrich_stream(
            lhs, rhs, by="user_id", on="ts", horizon_seconds=3600
        ).select("event_id", "r_value").collect()
    }
    assert got == want


def test_asof_enrich_stream_matches_batch(spark, sf_dir):
    # append-mode parity is exact up to the final watermark: rows
    # whose event time is within the watermark of the stream's max
    # timestamp are legitimately still in state when availableNow
    # drains — everything emitted must match the batch answer, and
    # everything older than (max_ts - watermark) must be emitted
    import datetime

    from pagerank_mapreduce_spark.streaming.joins import asof_enrich_stream

    ev_b = load_table(spark, sf_dir, "events")
    lb, rb = _asof_sides(ev_b)
    want = {
        r["event_id"]: (r["ts"], r["r_value"])
        for r in asof_enrich_stream(lb, rb)
        .select("event_id", "ts", "r_value")
        .collect()
    }
    ev_s = read_events_stream(spark, sf_dir)
    ls, rs = _asof_sides(ev_s)
    q = run_to_memory_sink(
        asof_enrich_stream(ls, rs).select("event_id", "ts", "r_value"),
        "asof_sink",
        mode="append",
    )
    q.awaitTermination()
    got = {
        r["event_id"]: (r["ts"], r["r_value"])
        for r in spark.table("asof_sink").collect()
    }
    # every emitted row equals the batch row
    for eid, row in got.items():
        assert row == want[eid], eid
    # completeness below the final watermark (2 h default)
    max_ts = max(ts for ts, _ in want.values())
    boundary = max_ts - datetime.timedelta(hours=2)
    overdue = {eid for eid, (ts, _) in want.items() if ts <= boundary}
    missing = overdue - set(got)
    assert not missing, f"{len(missing)} pre-watermark rows not emitted"
    assert len(got) > 0.9 * len(want)
