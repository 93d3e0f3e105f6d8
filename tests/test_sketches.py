"""Sketch semantics: CMS never undercounts and is exact sans
collisions; Bloom has no false negatives and collapses duplicates."""

from __future__ import annotations

from pyspark.sql import functions as F

from pagerank_mapreduce_spark.operators.sketches import (
    bloom_build,
    bloom_maybe_contains,
    cms_build,
    cms_estimate,
)


def test_cms_estimate_lower_bounded_by_truth(spark):
    rows = [(i % 7,) for i in range(200)] + [(99,)] * 13
    df = spark.createDataFrame(rows, "k bigint")
    cms = cms_build(df, "k", depth=4, width=64)
    probes = df.select("k").distinct()
    est = {r.k: r.est for r in cms_estimate(cms, probes, "k", 4, 64).collect()}
    exact = {r.k: r.n for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    for k, n in exact.items():
        assert est[k] >= n  # CMS never undercounts


def test_cms_exact_when_no_collisions(spark):
    # 3 keys in a 256-wide sketch: collisions astronomically unlikely
    # for this fixed hash — and if one existed the assert would have
    # failed deterministically forever (not flaky)
    df = spark.createDataFrame([(1,)] * 5 + [(2,)] * 3 + [(3,)], "k bigint")
    cms = cms_build(df, "k")
    est = {
        r.k: r.est
        for r in cms_estimate(cms, df.select("k").distinct(), "k").collect()
    }
    assert est == {1: 5, 2: 3, 3: 1}


def test_cms_absent_key_estimates_zero_or_collision(spark):
    df = spark.createDataFrame([(1,)], "k bigint")
    cms = cms_build(df, "k")
    probes = spark.createDataFrame([(777,)], "k bigint")
    (row,) = cms_estimate(cms, probes, "k").collect()
    assert row.est in (0, 1)


def test_bloom_no_false_negatives_and_dedup(spark):
    build = spark.createDataFrame([(i,) for i in range(50)], "k bigint")
    bloom = bloom_build(build, "k")
    probes = spark.createDataFrame(
        [(i,) for i in range(40, 60)] + [(45,)], "k bigint"  # dup 45
    )
    got = sorted(r.k for r in bloom_maybe_contains(probes, bloom, "k").collect())
    # every present key must pass; the duplicate collapses
    for k in range(40, 50):
        assert k in got
    assert got.count(45) == 1
    # absent keys may only appear as (rare, deterministic) false
    # positives — sanity: not everything passes
    assert len(got) < 21


def test_fm_distinct_reasonable_and_duplicate_insensitive(spark):
    from pyspark.sql import functions as F

    from pagerank_mapreduce_spark.operators.sketches import (
        fm_distinct_estimate,
    )

    # 500 distinct keys, each duplicated 4x: the estimate must ignore
    # multiplicity entirely (bit-identical with and without dups) and
    # land within the sketch's coarse error envelope
    base = [(1, i) for i in range(500)]
    df1 = spark.createDataFrame(base, "g int, k bigint")
    df4 = spark.createDataFrame(base * 4, "g int, k bigint")
    (e1,) = fm_distinct_estimate(df1, ["g"], "k").collect()
    (e4,) = fm_distinct_estimate(df4, ["g"], "k").collect()
    assert e1.est == e4.est
    assert 150 < e1.est < 1500  # deterministic, checked once forever


def test_sketches_ignore_null_keys(spark):
    # NULL keys carry no frequency/membership information and must be
    # excluded BEFORE hashing: concat_ws silently skips NULL arguments
    # (a NULL key would hash as just the row/seed prefix), while the
    # DuckDB oracles' concat() does not — the filter keeps both sides
    # of the parity contract on the same relation
    from pyspark.sql import functions as F

    from pagerank_mapreduce_spark.operators.sketches import (
        bloom_build,
        bloom_maybe_contains,
        cms_build,
        cms_estimate,
        fm_distinct_estimate,
    )

    with_null = spark.createDataFrame(
        [("a",), ("b",), (None,)], "k string"
    )
    without = with_null.filter(F.col("k").isNotNull())

    cms_w = sorted(map(tuple, cms_build(with_null, "k").collect()))
    cms_o = sorted(map(tuple, cms_build(without, "k").collect()))
    assert cms_w == cms_o

    bl_w = sorted(r["pos"] for r in bloom_build(with_null, "k").collect())
    bl_o = sorted(r["pos"] for r in bloom_build(without, "k").collect())
    assert bl_w == bl_o

    # a NULL probe key never reports membership or an estimate row
    probes = spark.createDataFrame([("a",), (None,)], "k string")
    maybe = bloom_maybe_contains(probes, bloom_build(without, "k"), "k")
    assert [r["k"] for r in maybe.collect()] == ["a"]
    est = cms_estimate(cms_build(without, "k"), probes, "k")
    assert sorted(r["k"] for r in est.collect()) == ["a"]

    g = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, None)], "g int, k string"
    )
    (e_w,) = fm_distinct_estimate(g, ["g"], "k").collect()
    (e_o,) = fm_distinct_estimate(
        g.filter(F.col("k").isNotNull()), ["g"], "k"
    ).collect()
    assert e_w.est == e_o.est
