"""Approximate aggregates: no cross-engine REPLAY oracle exists
(sketch internals are engine-specific), but the estimates are
deterministic for a fixed input, so rel_approx_count_distinct's
oracle pins committed GOLDEN values per fixture scale (keyed on the
lineitem rowcount) and these tests supply the statistical rigor by
bounding the approximation against the exact twin.

Regenerating the goldens (only if the fixtures or Spark's HLL++
implementation ever change — both deterministic today)::

    PYTHONPATH=. python -c "
    from pyspark.sql import functions as F
    from pagerank_mapreduce_spark.session import get_spark
    s = get_spark()
    for sf in ('sf0.001','sf0.01','sf0.1'):
        li = s.read.parquet(f'/root/testdata/{sf}/lineitem.parquet')
        print(sf, li.count(), li.groupBy('l_returnflag').agg(
            F.approx_count_distinct('l_partkey', 0.01)).collect())"

then update the VALUES table in the rel_approx_count_distinct oracle
(pagerank_mapreduce_spark/queries.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pagerank_mapreduce_spark.queries import CATALOG
from pagerank_mapreduce_spark.sources.tables import load_table


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    approx = {
        r["l_returnflag"]: r["approx_parts"]
        for r in CATALOG["rel_approx_count_distinct"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k, n in exact.items():
        # rsd=0.01 requested; allow 5 sigma
        assert abs(approx[k] - n) <= max(1, 0.05 * n), (k, approx[k], n)


def test_approx_count_distinct_envelope_column(spark, sf_dir):
    # the catalog entry carries its own error-envelope verdict — the
    # strengthened rows-only contract: every group must self-report
    # within_envelope, and the exact twin must equal an independent
    # count_distinct
    rows = CATALOG["rel_approx_count_distinct"].fn(spark, sf_dir).collect()
    assert rows and all(r["within_envelope"] for r in rows), rows
    exact = {
        r["l_returnflag"]: r["n"]
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert {r["l_returnflag"]: r["exact_parts"] for r in rows} == exact


def test_kv_stats_detail_conservation(spark, sf_dir):
    # mr_kv_stats_detail's conservation invariants: the per-proc
    # histogram (explicit hash routing, now oracle-replayed) must
    # account for every pair of the independent exact count, cover
    # all 32 procs, and be reasonably balanced (a broken hash would
    # show as a lopsided histogram); the PHYSICAL-partition variant
    # keeps its own contract via M.kv_stats
    from pagerank_mapreduce_spark.operators.mapreduce import kv_stats

    rows = CATALOG["mr_kv_stats_detail"].fn(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "lineitem").count()
    assert sum(r["pairs"] for r in rows) == n
    assert {r["proc"] for r in rows} == set(range(32))
    avg = n / 32
    assert all(0.5 * avg <= r["pairs"] <= 1.5 * avg for r in rows)
    # physical twin: global line conserves the same total
    phys = kv_stats(load_table(spark, sf_dir, "lineitem")).first()
    assert phys["total_pairs"] == n
    assert phys["min_pairs"] * phys["partitions"] <= n
    assert phys["max_pairs"] * phys["partitions"] >= n


def test_approx_percentile_brackets_exact(spark, sf_dir):
    approx = {
        r["l_linestatus"]: r["p50"]
        for r in CATALOG["rel_approx_percentile"].fn(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_linestatus"]: r["p50"]
        for r in li.groupBy("l_linestatus")
        .agg(F.percentile("l_quantity", F.lit(0.5)).alias("p50"))
        .collect()
    }
    # accuracy=10000 → rank error ≤ group_size/10000; quantities are
    # integers 1..50, so the approximate median is within one value
    for k, p in exact.items():
        assert abs(approx[k] - p) <= 1.0, (k, approx[k], p)
