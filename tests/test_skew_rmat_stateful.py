"""Tests for skew-mitigation operators, the R-MAT generator, and the
transformWithStateInPandas stateful operator."""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pagerank_mapreduce_spark.graph import pagerank
from pagerank_mapreduce_spark.graph.rmat import rmat_edges
from pagerank_mapreduce_spark.operators import skew
from pagerank_mapreduce_spark.sources.tables import load_table
from pagerank_mapreduce_spark.streaming.stateful import tws_user_totals
from pagerank_mapreduce_spark.streaming.windows import run_to_memory_sink
from tests.conftest import worker_handshake_guard


# ------------------------------------------------------------- skew


def test_salted_agg_matches_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = skew.salted_agg(
        ev,
        ["event_type"],
        [
            ("sum", "value", "total"),
            ("count", "*", "cnt"),
            ("min", "value", "vmin"),
            ("max", "value", "vmax"),
        ],
        n_salt=16,
    )
    want = ev.groupBy("event_type").agg(
        F.sum("value").alias("total"),
        F.count("*").alias("cnt"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    g = {r["event_type"]: r for r in got.collect()}
    w = {r["event_type"]: r for r in want.collect()}
    assert g.keys() == w.keys()
    for k in w:
        assert g[k]["cnt"] == w[k]["cnt"]
        assert g[k]["vmin"] == w[k]["vmin"]
        assert g[k]["vmax"] == w[k]["vmax"]
        assert abs(g[k]["total"] - w[k]["total"]) < 1e-6 * max(1.0, abs(w[k]["total"]))


def test_salted_agg_rejects_non_algebraic(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="non-algebraic"):
        skew.salted_agg(ev, ["event_type"], [("median", "value", "m")])


def test_salted_agg_spreads_hot_key(spark, sf_dir):
    # the partial phase must see a hot key split across multiple salts
    ev = load_table(spark, sf_dir, "events")
    salted = ev.withColumn(
        "s", skew.salt_column(16, *[c for c in ev.columns if c != "event_type"])
    )
    n_buckets = salted.select("event_type", "s").distinct().count()
    n_keys = ev.select("event_type").distinct().count()
    assert n_buckets > n_keys  # hot keys genuinely fan out


def test_salted_join_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderpriority"
    )
    got = (
        skew.salted_join(li, o, "k", n_salt=8)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("s"))
    )
    want = (
        li.join(o, "k")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("s"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_agg_avg_decomposes(spark, sf_dir):
    # avg is algebraic via (sum, count) partials — the documented
    # decomposition; null values skipped like the built-in
    ev = load_table(spark, sf_dir, "events")
    got = {
        r["event_type"]: r["v_avg"]
        for r in skew.salted_agg(
            ev, ["event_type"], [("avg", "value", "v_avg")], n_salt=16
        ).collect()
    }
    want = {
        r["event_type"]: r["v_avg"]
        for r in ev.groupBy("event_type")
        .agg(F.avg("value").alias("v_avg"))
        .collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9 * max(1.0, abs(want[k]))


def test_salted_join_outer_matches_plain(spark):
    # unmatched rows of the exploded (non-skewed) side must survive
    # exactly ONCE in right/full outer joins, not once per salt copy
    skewed = spark.createDataFrame(
        [(1, "a"), (1, "b"), (3, "c")], "k long, x string"
    )
    other = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "k long, v double"
    )
    key = lambda t: tuple((x is None, str(x)) for x in t)  # noqa: E731
    for how in ("right", "full", "left", "inner"):
        got = sorted(
            map(tuple, skew.salted_join(skewed, other, "k", n_salt=8, how=how).collect()),
            key=key,
        )
        want = sorted(map(tuple, skewed.join(other, "k", how).collect()), key=key)
        assert got == want, how


def test_salted_join_columns_match_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderstatus"
    )
    assert (
        skew.salted_join(li, o, "k", n_salt=4).columns == li.join(o, "k").columns
    )


# ------------------------------------------------------------ R-MAT


def test_rmat_shape_and_determinism(spark):
    e1 = rmat_edges(spark, scale=8, edge_factor=4, seed=7, dedup=False)
    assert e1.count() == 4 << 8
    stats = e1.agg(
        F.min("src"), F.max("src"), F.min("dst"), F.max("dst")
    ).first()
    assert stats[0] >= 0 and stats[2] >= 0
    assert stats[1] < 256 and stats[3] < 256
    e2 = rmat_edges(spark, scale=8, edge_factor=4, seed=7, dedup=False)
    assert sorted(map(tuple, e1.collect())) == sorted(map(tuple, e2.collect()))


def test_rmat_is_skewed(spark):
    # Graph500 parameters must give a heavy-tailed out-degree
    # distribution: the hottest vertex far exceeds the mean degree
    e = rmat_edges(spark, scale=10, edge_factor=8, seed=42)
    deg = e.groupBy("src").count()
    top = deg.agg(F.max("count")).first()[0]
    mean = deg.agg(F.avg("count")).first()[0]
    assert top > 5 * mean


def test_rmat_portable_skewed_and_shuffle_free(spark):
    # the portable-coin twin must keep the R-MAT character (heavy
    # tail, bounded vertex space) and generate without any shuffle
    # before the dedup — the fold is expression-only over range()
    from pagerank_mapreduce_spark.graph.rmat import rmat_edges_portable
    from pagerank_mapreduce_spark.plans.audit import exchange_count

    raw = rmat_edges_portable(spark, scale=8, edge_factor=8, seed=42, dedup=False)
    assert exchange_count(raw) == 0
    stats = raw.agg(F.max("src"), F.max("dst")).first()
    assert stats[0] < 256 and stats[1] < 256
    deg = raw.groupBy("src").count()
    top = deg.agg(F.max("count")).first()[0]
    mean = deg.agg(F.avg("count")).first()[0]
    assert top > 5 * mean


def test_rmat_portable_oracle_alternate_params(spark):
    # the DuckDB replay must track the generator across parameters,
    # not just the catalog's (scale=10, ef=8, seed=42) point
    import duckdb

    from pagerank_mapreduce_spark.graph.rmat import (
        rmat_edges_portable,
        rmat_oracle_sql,
    )

    kw = dict(scale=7, edge_factor=4, a=0.45, b=0.25, c=0.15, seed=99)
    got = sorted(
        map(tuple, rmat_edges_portable(spark, **kw).collect())
    )
    exp = sorted(duckdb.connect().execute(rmat_oracle_sql(**kw)).fetchall())
    assert got == exp and len(got) > 100


def test_rmat_dedup_removes_duplicates(spark):
    raw = rmat_edges(spark, scale=6, edge_factor=16, seed=1, dedup=False)
    ded = rmat_edges(spark, scale=6, edge_factor=16, seed=1, dedup=True)
    assert ded.count() == raw.distinct().count() < raw.count()


def test_rmat_pagerank_converges(spark):
    e = rmat_edges(spark, scale=8, edge_factor=8, seed=42)
    res = pagerank(e, max_iterations=50)
    total = res.ranks.agg(F.sum("rank")).first()[0]
    assert abs(total - 1.0) < 1e-6


# ----------------------------------------- transformWithStateInPandas


def _protobuf_available() -> bool:
    # transformWithStateInPandas drives its state protocol over
    # protobuf; absent/broken protobuf crashes the streaming runner
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas needs google.protobuf (no pip copy and no cloud-sdk copy to shim — see conftest._ensure_protobuf)",
)
def test_tws_totals_across_batches(spark, tmp_path):
    d1 = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime(["2024-01-01 10:00:00"] * 3),
            "user_id": [1, 1, 2],
            "event_type": ["a", "b", "a"],
            "value": [1.0, 2.0, 10.0],
            "props": ["{}"] * 3,
        }
    )
    d2 = pd.DataFrame(
        {
            "event_id": [4, 5],
            "ts": pd.to_datetime(["2024-01-01 11:00:00"] * 2),
            "user_id": [1, 3],
            "event_type": ["a", "a"],
            "value": [4.0, 7.5],
            "props": ["{}"] * 2,
        }
    )
    src = tmp_path / "tws_src"
    src.mkdir()
    d1.to_parquet(src / "b1.parquet", coerce_timestamps="us")
    d2.to_parquet(src / "b2.parquet", coerce_timestamps="us")
    now = time.time()
    os.utime(src / "b1.parquet", (now - 60, now - 60))
    os.utime(src / "b2.parquet", (now, now))

    schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        with worker_handshake_guard():
            q = run_to_memory_sink(
                tws_user_totals(stream), "t_tws", mode="update"
            )
            q.awaitTermination(120)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    rows = spark.table("t_tws").collect()
    last = {}
    for r in rows:
        last[r["user_id"]] = (r["n_events"], r["total_value"])
    # state carried across micro-batches: user 1 = 3 events / 7.0
    assert last == {1: (3, 7.0), 2: (1, 10.0), 3: (1, 7.5)}
    assert sum(1 for r in rows if r["user_id"] == 1) == 2


def test_tws_batch_analogue(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = tws_user_totals(ev)
    want = ev.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.sum("value"), 4).alias("t"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_temperature_resample_balances_groups(spark):
    from pagerank_mapreduce_spark.operators.sessions import (
        temperature_resample,
    )
    from pyspark.sql import functions as F

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id bigint, grp string")
    out = temperature_resample(df, "grp", 0.5, "doc_id")
    got = {
        r.grp: r.n
        for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    # smallest group anchors at rate 1 — kept whole
    assert got["small"] == 100
    # big group targets sqrt(100/900) = 1/3 of its rows (md5 noise)
    assert 240 <= got["big"] <= 360
    # alpha=1 keeps everything
    assert temperature_resample(df, "grp", 1.0, "doc_id").count() == 1000


def test_temperature_resample_validates(spark):
    import pytest

    from pagerank_mapreduce_spark.operators.sessions import (
        temperature_resample,
    )

    df = spark.createDataFrame([(1, "a")], "doc_id bigint, grp string")
    with pytest.raises(ValueError):
        temperature_resample(df, "grp", 0.5)  # no key cols
    with pytest.raises(ValueError):
        temperature_resample(df, "grp", 1.5, "doc_id")


def test_weighted_sample_favors_heavy_rows(spark):
    from pagerank_mapreduce_spark.operators.sessions import weighted_sample

    # one row carries 1000x the weight of 99 others: across the md5
    # randomness it must essentially always be sampled into the top 10
    rows = [(i, 1.0) for i in range(99)] + [(999, 1000.0)]
    df = spark.createDataFrame(rows, "id bigint, w double")
    got = {r.id for r in weighted_sample(df, "w", 10, "id").collect()}
    assert 999 in got and len(got) == 10
    # deterministic: identical on re-run
    again = {r.id for r in weighted_sample(df, "w", 10, "id").collect()}
    assert got == again


def test_weighted_sample_validates(spark):
    import pytest

    from pagerank_mapreduce_spark.operators.sessions import weighted_sample

    df = spark.createDataFrame([(1, 1.0)], "id bigint, w double")
    with pytest.raises(ValueError):
        weighted_sample(df, "w", 5)


def test_temperature_resample_null_group_kept(spark):
    from pagerank_mapreduce_spark.operators.sessions import (
        temperature_resample,
    )

    rows = [(i, "a") for i in range(50)] + [(100 + i, None) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id bigint, grp string")
    out = temperature_resample(df, "grp", 1.0, "doc_id")
    # alpha=1 keeps every row — including the NULL group, which must
    # not vanish through the threshold join
    assert out.count() == 100


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas needs google.protobuf (no pip copy and no cloud-sdk copy to shim — see conftest._ensure_protobuf)",
)
def test_tws_cusum_across_batches(spark, tmp_path):
    # the CUSUM fold state (S, max, n, first alert) must survive the
    # micro-batch boundary: user 1's series crosses the threshold
    # only because batch 2 continues batch 1's accumulated S
    from pagerank_mapreduce_spark.streaming.stateful import (
        tws_cusum_alerts,
    )

    d1 = pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": pd.to_datetime(
                ["2024-01-01 10:00:00", "2024-01-01 10:01:00"]
            ),
            "user_id": [1, 1],
            "event_type": ["a", "a"],
            "value": [15.0, 15.0],  # S = 9.5 then 19.0 (target 5.5)
            "props": ["{}"] * 2,
        }
    )
    d2 = pd.DataFrame(
        {
            "event_id": [3],
            "ts": pd.to_datetime(["2024-01-01 10:02:00"]),
            "user_id": [1],
            "event_type": ["a"],
            "value": [15.0],  # S = 28.5 > 20 -> alert at obs 3
            "props": ["{}"],
        }
    )
    src = tmp_path / "tws_cusum_src"
    src.mkdir()
    d1.to_parquet(src / "b1.parquet", coerce_timestamps="us")
    d2.to_parquet(src / "b2.parquet", coerce_timestamps="us")
    now = time.time()
    os.utime(src / "b1.parquet", (now - 60, now - 60))
    os.utime(src / "b2.parquet", (now, now))
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        with worker_handshake_guard():
            q = run_to_memory_sink(
                tws_cusum_alerts(stream), "t_tws_cusum", mode="update"
            )
            q.awaitTermination(120)
    finally:
        if prev is None:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass"
            )
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    rows = spark.table("t_tws_cusum").collect()
    per_batch = [
        (r["n"], r["max_cusum"], r["alert_at"], r["alert"])
        for r in rows
        if r["user_id"] == 1
    ]
    # batch 1: no alert yet (max 19.0); batch 2: alert at obs 3
    assert (2, 19.0, None, False) in per_batch
    assert (3, 28.5, 3, True) in per_batch


def test_tws_cusum_batch_analogue_matches_operator(spark, sf_dir):
    # the batch path of the streaming wrapper must be the exact
    # oracle-checked operator (same target/threshold/tiebreak)
    from pagerank_mapreduce_spark.operators.sessions import cusum_alerts
    from pagerank_mapreduce_spark.streaming.stateful import (
        tws_cusum_alerts,
    )

    ev = load_table(spark, sf_dir, "events")
    got = tws_cusum_alerts(ev)
    want = cusum_alerts(ev, "ts", "user_id", "value", 5.5, 20.0, "event_id")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_tws_ewma_batch_analogue_matches_operator(spark, sf_dir):
    from pagerank_mapreduce_spark.operators.sessions import ewma_smooth
    from pagerank_mapreduce_spark.streaming.stateful import tws_ewma

    ev = load_table(spark, sf_dir, "events")
    got = tws_ewma(ev)
    want = ewma_smooth(ev, "ts", "user_id", "value", 0.2, "event_id")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas needs google.protobuf (no pip copy and no cloud-sdk copy to shim — see conftest._ensure_protobuf)",
)
def test_tws_ewma_across_batches(spark, tmp_path):
    # E must continue from batch 1's state: value 10 then 0,0 in batch
    # 2 gives 10 -> 8 -> 6.4, impossible if batch 2 restarted at E=0
    from pagerank_mapreduce_spark.streaming.stateful import tws_ewma

    d1 = pd.DataFrame(
        {
            "event_id": [1],
            "ts": pd.to_datetime(["2024-01-01 10:00:00"]),
            "user_id": [1],
            "event_type": ["a"],
            "value": [10.0],
            "props": ["{}"],
        }
    )
    d2 = pd.DataFrame(
        {
            "event_id": [2, 3],
            "ts": pd.to_datetime(
                ["2024-01-01 10:01:00", "2024-01-01 10:02:00"]
            ),
            "user_id": [1, 1],
            "event_type": ["a", "a"],
            "value": [0.0, 0.0],
            "props": ["{}"] * 2,
        }
    )
    src = tmp_path / "tws_ewma_src"
    src.mkdir()
    d1.to_parquet(src / "b1.parquet", coerce_timestamps="us")
    d2.to_parquet(src / "b2.parquet", coerce_timestamps="us")
    now = time.time()
    os.utime(src / "b1.parquet", (now - 60, now - 60))
    os.utime(src / "b2.parquet", (now, now))
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        with worker_handshake_guard():
            q = run_to_memory_sink(
                tws_ewma(stream), "t_tws_ewma", mode="update"
            )
            q.awaitTermination(120)
    finally:
        if prev is None:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass"
            )
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    rows = spark.table("t_tws_ewma").collect()
    per_batch = [
        (r["n"], r["ewma_last"], r["ewma_max"])
        for r in rows
        if r["user_id"] == 1
    ]
    assert (1, 10.0, 10.0) in per_batch
    assert (3, 6.4, 10.0) in per_batch


def test_tws_holt_batch_analogue_matches_operator(spark, sf_dir):
    from pagerank_mapreduce_spark.operators.sessions import holt_smooth
    from pagerank_mapreduce_spark.streaming.stateful import tws_holt

    ev = load_table(spark, sf_dir, "events")
    got = tws_holt(ev)
    want = holt_smooth(
        ev, "ts", "user_id", "value", 0.5, 0.25, "event_id"
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas needs google.protobuf (no pip copy and no cloud-sdk copy to shim — see conftest._ensure_protobuf)",
)
def test_tws_holt_across_batches(spark, tmp_path):
    # the (level, trend) pair must continue from batch 1's state:
    # values 10, 20 in batch 1 give l=15, b=1.25; batch 2's value 0
    # gives l = .5*0 + .5*(15+1.25) = 8.125,
    # b = .25*(8.125-15) + .75*1.25 = -0.78125 — impossible if batch 2
    # restarted from scratch (it would emit l=0, b=0)
    from pagerank_mapreduce_spark.streaming.stateful import tws_holt

    d1 = pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": pd.to_datetime(
                ["2024-01-01 10:00:00", "2024-01-01 10:01:00"]
            ),
            "user_id": [1, 1],
            "event_type": ["a", "a"],
            "value": [10.0, 20.0],
            "props": ["{}"] * 2,
        }
    )
    d2 = pd.DataFrame(
        {
            "event_id": [3],
            "ts": pd.to_datetime(["2024-01-01 10:02:00"]),
            "user_id": [1],
            "event_type": ["a"],
            "value": [0.0],
            "props": ["{}"],
        }
    )
    src = tmp_path / "tws_holt_src"
    src.mkdir()
    d1.to_parquet(src / "b1.parquet", coerce_timestamps="us")
    d2.to_parquet(src / "b2.parquet", coerce_timestamps="us")
    now = time.time()
    os.utime(src / "b1.parquet", (now - 60, now - 60))
    os.utime(src / "b2.parquet", (now, now))
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        with worker_handshake_guard():
            q = run_to_memory_sink(
                tws_holt(stream), "t_tws_holt", mode="update"
            )
            q.awaitTermination(120)
    finally:
        if prev is None:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass"
            )
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    rows = spark.table("t_tws_holt").collect()
    per_batch = [
        (r["n"], r["level_last"], r["trend_last"], r["forecast_1"])
        for r in rows
        if r["user_id"] == 1
    ]
    assert (2, 15.0, 1.25, 16.25) in per_batch
    assert (3, 8.125, -0.78125, 7.34375) in per_batch


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas needs google.protobuf (no pip copy and no cloud-sdk copy to shim — see conftest._ensure_protobuf)",
)
def test_tws_holt_winters_across_batches(spark, tmp_path):
    # the (level, trend, seasonal-profile) state must continue from
    # batch 1 — period 2, dyadic params, values 10, 20 | 0:
    #   batch 1: t1 l=10 b=0; t2 (p=1) l=15, b=1.25, s=[0, 1.25]
    #            -> season_next = s[0] = 0, forecast 16.25
    #   batch 2: t3 (p=0) l=8.125, b=-0.78125, s[0]=-2.03125
    #            -> season_next = s[1] = 1.25 (CARRIED from batch 1 —
    #               impossible if the profile restarted), forecast
    #               8.125 - 0.78125 + 1.25 = 8.59375
    from pagerank_mapreduce_spark.streaming.stateful import (
        tws_holt_winters,
    )

    d1 = pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": pd.to_datetime(
                ["2024-01-01 10:00:00", "2024-01-01 10:01:00"]
            ),
            "user_id": [1, 1],
            "event_type": ["a", "a"],
            "value": [10.0, 20.0],
            "props": ["{}"] * 2,
        }
    )
    d2 = pd.DataFrame(
        {
            "event_id": [3],
            "ts": pd.to_datetime(["2024-01-01 10:02:00"]),
            "user_id": [1],
            "event_type": ["a"],
            "value": [0.0],
            "props": ["{}"],
        }
    )
    src = tmp_path / "tws_hw_src"
    src.mkdir()
    d1.to_parquet(src / "b1.parquet", coerce_timestamps="us")
    d2.to_parquet(src / "b2.parquet", coerce_timestamps="us")
    now = time.time()
    os.utime(src / "b1.parquet", (now - 60, now - 60))
    os.utime(src / "b2.parquet", (now, now))
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        with worker_handshake_guard():
            q = run_to_memory_sink(
                tws_holt_winters(stream, period=2), "t_tws_hw", mode="update"
            )
            q.awaitTermination(120)
    finally:
        if prev is None:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass"
            )
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    rows = spark.table("t_tws_hw").collect()
    per_batch = [
        (
            r["n"], r["level_last"], r["trend_last"],
            r["season_next"], r["forecast_1"],
        )
        for r in rows
        if r["user_id"] == 1
    ]
    assert (2, 15.0, 1.25, 0.0, 16.25) in per_batch
    assert (3, 8.125, -0.78125, 1.25, 8.59375) in per_batch
