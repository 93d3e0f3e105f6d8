"""Fixture-drift tripwire.

Round 3 lost 12 driver queries, 35 tests and the whole bench to ONE
silent fixture change (events.ts regenerated as parquet timestamp[us]
after shipping as int64 nanos). This test pins the post-load dtype of
every fixture table so the next regeneration fails here, loudly and
alone, instead of as dozens of confusing downstream analysis errors.

The loader (sources/tables.py) is REQUIRED to normalize events.ts to
TimestampType regardless of whether the parquet carries int64 nanos,
TIMESTAMP(NANOS), or TIMESTAMP(MICROS)/NTZ on disk.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from pagerank_mapreduce_spark.sources.tables import TABLE_NAMES, load_table

# Column -> expected Spark type after load_table(). Only the columns
# whose dtype downstream code depends on are pinned; extra columns are
# allowed (additive fixture changes shouldn't fail).
EXPECTED = {
    "region": {"r_regionkey": T.IntegerType(), "r_name": T.StringType()},
    "nation": {"n_nationkey": T.IntegerType(), "n_regionkey": T.IntegerType()},
    "customer": {"c_custkey": T.LongType(), "c_acctbal": T.DoubleType()},
    "supplier": {"s_suppkey": T.LongType(), "s_nationkey": T.IntegerType()},
    "part": {"p_partkey": T.LongType(), "p_retailprice": T.DoubleType()},
    "orders": {
        "o_orderkey": T.LongType(),
        "o_custkey": T.LongType(),
        "o_totalprice": T.DoubleType(),
        "o_orderdate": T.TimestampNTZType(),
    },
    "lineitem": {
        "l_orderkey": T.LongType(),
        "l_partkey": T.LongType(),
        "l_suppkey": T.LongType(),
        "l_quantity": T.DoubleType(),
        "l_extendedprice": T.DoubleType(),
        "l_discount": T.DoubleType(),
        "l_shipdate": T.TimestampNTZType(),
        "l_returnflag": T.StringType(),
    },
    "events": {
        "event_id": T.LongType(),
        # The tripwire: MUST be session-tz TIMESTAMP after load, never
        # raw int64 nanos and never TIMESTAMP_NTZ (epoch arithmetic in
        # asof/range/sessionize casts it to double).
        "ts": T.TimestampType(),
        "user_id": T.LongType(),
        "event_type": T.StringType(),
        "value": T.DoubleType(),
        "props": T.StringType(),
    },
    "documents": {"doc_id": T.LongType(), "text": T.StringType()},
    "embeddings": {
        "vec_id": T.LongType(),
        "embedding": T.ArrayType(T.FloatType()),
        "label": T.IntegerType(),
    },
}


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_fixture_table_dtypes(spark, sf_dir, name):
    df = load_table(spark, sf_dir, name)
    actual = {f.name: f.dataType for f in df.schema.fields}
    for col, expected_type in EXPECTED[name].items():
        assert col in actual, f"{name}.{col} missing from fixture"
        assert actual[col] == expected_type, (
            f"{name}.{col} loaded as {actual[col]}, expected {expected_type} "
            "— fixture schema drifted; fix sources/tables.py normalization"
        )
    # events must also survive an epoch cast (the exact op that died in r3)
    if name == "events":
        df.selectExpr("cast(ts as double) as epoch_s").limit(1).collect()
    # embedding width is pinned at call sites (queries.py passes dim=64
    # to embedding_near_dups to keep the plan lazy) — trip on drift
    if name == "embeddings":
        (width,) = df.selectExpr("size(embedding) as d").limit(1).collect()[0]
        assert width == 64, f"embeddings dim drifted to {width}, call sites pin 64"
