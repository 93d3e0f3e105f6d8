"""Approximate aggregates: no exact oracle exists (sketches are
engine-specific), so the catalog checks them rows-only — these tests
supply the missing rigor by bounding the approximation against the
exact twin computed in the same engine."""

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
    # mr_kv_stats_detail's conservation invariants: the per-partition
    # histogram must account for every pair of the independent exact
    # count, and min/max must bound the mean
    row = CATALOG["mr_kv_stats_detail"].fn(spark, sf_dir).first()
    assert row["conserved"], row
    n = load_table(spark, sf_dir, "lineitem").count()
    assert row["total_pairs"] == n


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
