"""Bucketing = the engine's co-located-join strategy at scale.

The PageRank loop re-joins the same edge relation every iteration and
TPC-H-shaped workloads re-join lineitem⋈orders constantly; writing
both sides bucketed by the join key removes the per-query shuffle
entirely (the reference's analogue: MR-MPI aggregate() pre-routing
all copies of a key to one processor, src/mapreduce.cpp:382-536 —
done once at write time instead of per job)."""

from __future__ import annotations

import contextlib
import io
import re


def _exchange_ids(df) -> set[str]:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return set(re.findall(r"\((\d+)\) Exchange", buf.getvalue()))


def test_bucketed_join_is_exchange_free(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "li_b"))
        .mode("overwrite")
        .saveAsTable("li_bucketed")
    )
    (
        o.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "o_b"))
        .mode("overwrite")
        .saveAsTable("o_bucketed")
    )
    try:
        a, b = spark.table("li_bucketed"), spark.table("o_bucketed")
        # force the shuffle-join path so the assertion is about
        # bucketing, not about broadcast kicking in at test scale
        saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, a.l_orderkey == b.o_orderkey).groupBy(
                "o_orderstatus"
            ).count()
            # exactly ONE exchange: the final aggregation's. The join
            # itself reads co-bucketed scans with no shuffle.
            assert len(_exchange_ids(joined)) == 1
            unbucketed = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
                "o_orderstatus"
            ).count()
            assert len(_exchange_ids(unbucketed)) >= 2  # join shuffles both sides
            assert sorted(map(tuple, joined.collect())) == sorted(
                map(tuple, unbucketed.collect())
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")
