"""ORC source/sink round-trip: Spark ships the ORC reader/writer
in-box (no extra jars), so the engine's format surface includes it
alongside parquet / csv / jsonl. These tests pin that every fixture
column type — including timestamps and array<float> embeddings —
survives an ORC round-trip bit-for-bit, and that predicate pushdown
reaches the ORC scan the same way it does parquet."""

from __future__ import annotations

from pagerank_mapreduce_spark.sources.tables import load_table


def test_orc_roundtrip_preserves_values_and_schema(spark, sf_dir, tmp_path):
    for t in ("nation", "events", "documents", "embeddings"):
        df = load_table(spark, sf_dir, t)
        path = str(tmp_path / t)
        df.write.orc(path)
        back = spark.read.orc(path)
        assert back.schema == df.schema, (t, back.schema, df.schema)
        want = sorted(map(tuple, df.collect()))
        got = sorted(map(tuple, back.collect()))
        assert got == want, t


def test_orc_scan_gets_pushdown_and_pruning(spark, sf_dir, tmp_path):
    from pagerank_mapreduce_spark.plans.audit import formatted_plan

    df = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    df.write.orc(path)
    q = (
        spark.read.orc(path)
        .filter("o_orderstatus = 'F'")
        .select("o_orderkey", "o_totalprice")
    )
    plan = formatted_plan(q)
    # filter reaches the ORC scan; only the referenced columns are read
    assert "PushedFilters" in plan and "o_orderstatus" in plan
    assert "ReadSchema" in plan
    read_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "o_orderkey" in read_line and "o_totalprice" in read_line
    assert "o_comment" not in read_line
