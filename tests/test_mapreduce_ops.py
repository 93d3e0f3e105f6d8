from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pagerank_mapreduce_spark.operators import mapreduce as M


@pytest.fixture(scope="module")
def kv(spark):
    # small KV relation: (key, value)
    data = [(i % 5, i) for i in range(100)]
    return spark.createDataFrame(data, "key int, value int")


def test_mr_map_tasks(spark):
    # MR-MPI map() v1: nmap generator tasks fan out over the cluster
    df = M.mr_map_tasks(
        spark, 4, lambda t: [(t, j) for j in range(3)], "task int, j int"
    )
    rows = sorted((r["task"], r["j"]) for r in df.collect())
    assert rows == [(t, j) for t in range(4) for j in range(3)]


def test_mr_map_kv_iterate(kv):
    # MR-MPI map() v5: emit new KVs from an existing KV set
    out = M.mr_map(
        kv,
        lambda pdf: pd.DataFrame({"key": pdf["key"], "doubled": pdf["value"] * 2}),
        "key int, doubled int",
    )
    got = {(r["key"], r["doubled"]) for r in out.collect()}
    assert (0, 0) in got and (4, 198) in got
    assert len(got) == 100


def test_aggregate_then_convert_equals_collate(kv):
    # collate == aggregate (shuffle by key) + convert (local group)
    via_parts = M.convert(M.aggregate(kv, "key", num_partitions=4), "key", "value")
    # after aggregate, each key lives in exactly one partition → one
    # row per key, same multiset of values as the global collate
    local = {
        r["key"]: sorted(r["values"]) for r in via_parts.collect()
    }
    full = {
        r["key"]: sorted(r["values"])
        for r in M.collate(kv, "key", "value").collect()
    }
    assert local == full


def test_convert_is_partition_local(kv):
    # without a prior shuffle, convert must NOT combine across
    # partitions: total rows >= number of distinct keys
    parts = kv.repartition(8)
    out = M.convert(parts, "key", "value")
    per_key = out.groupBy("key").count().collect()
    assert all(r["count"] >= 1 for r in per_key)
    total_values = out.select(F.explode("values")).count()
    assert total_values == 100  # nothing lost, nothing merged globally


def test_compress_local_sum(kv):
    # compress = partition-local combiner; global groupBy of its
    # output equals the direct global sum
    local = M.compress(M.aggregate(kv, "key", num_partitions=4), "key", "value")
    got = {
        r["key"]: r["total"]
        for r in local.groupBy("key").agg(F.sum("value").alias("total")).collect()
    }
    want = {
        r["key"]: r["total"]
        for r in kv.groupBy("key").agg(F.sum("value").alias("total")).collect()
    }
    assert got == want


def test_clone(kv):
    out = M.clone(kv.limit(5), "value")
    for r in out.collect():
        assert isinstance(r["values"], list) and len(r["values"]) == 1


def test_collapse_and_scrunch(kv):
    collapsed = M.collapse(kv.repartition(4))
    assert collapsed.count() <= 4
    assert collapsed.select(F.explode("rows")).count() == 100
    scr = M.scrunch(kv, 1)
    assert scr.count() == 1
    assert scr.select(F.explode("rows")).count() == 100


def test_gather(kv):
    assert M.gather(kv.repartition(8), 2).rdd.getNumPartitions() == 2


def test_add_union(kv):
    assert M.add(kv, kv).count() == 200


def test_sort_keys_global_and_local(kv):
    glob = [r["key"] for r in M.sort_keys(kv, "key").collect()]
    assert glob == sorted(glob)
    loc = M.sort_keys(kv.repartition(4), "key", local=True)
    # per-partition sorted
    def check(it):
        keys = [r["key"] for r in it]
        assert keys == sorted(keys)
        return iter([])

    loc.rdd.mapPartitions(check).count()


def test_sort_multivalues(kv):
    out = M.sort_multivalues(M.collate(kv, "key", "value"), ascending=False)
    for r in out.collect():
        assert r["values"] == sorted(r["values"], reverse=True)


def test_kv_stats(kv):
    row = M.kv_stats(kv.repartition(4)).first()
    assert row["total_pairs"] == 100
    assert row["partitions"] <= 4
    assert row["min_pairs"] >= 0 and row["max_pairs"] <= 100


def test_word_frequency_and_topk(spark):
    docs = spark.createDataFrame(
        [("a b b c c c",), ("c d",)], "text string"
    )
    wf = {r["word"]: r["cnt"] for r in M.word_frequency(docs).collect()}
    assert wf == {"a": 1, "b": 2, "c": 4, "d": 1}
    top = M.top_k(
        M.word_frequency(docs), 2, F.col("cnt").desc(), F.col("word")
    ).collect()
    assert [(r["word"], r["cnt"]) for r in top] == [("c", 4), ("b", 2)]
    # TakeOrderedAndProject (heap-based top-k), not a global sort
    plan = M.top_k(M.word_frequency(docs), 2, F.col("cnt").desc())._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_mr_reduce_emits_multiple_rows(spark):
    import pandas as pd
    from pagerank_mapreduce_spark.operators.mapreduce import mr_reduce

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "k string, v int"
    )

    def expand(key, pdf: pd.DataFrame) -> pd.DataFrame:
        # emit one row per value plus a summary row — UDTF shape
        rows = [(key, int(v)) for v in pdf["v"]] + [(key, int(pdf["v"].sum()))]
        return pd.DataFrame(rows, columns=["k", "out"])

    got = sorted(
        tuple(r) for r in mr_reduce(df, "k", expand, "k string, out int").collect()
    )
    assert got == [("a", 1), ("a", 2), ("a", 3), ("b", 3), ("b", 3)]


def test_mr_reduce_blocks_spans_batches(spark):
    import pandas as pd
    from pagerank_mapreduce_spark.operators.mapreduce import mr_reduce_blocks

    # force tiny Arrow batches so a single group spans many blocks
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        df = (
            spark.range(1000)
            .selectExpr("CAST(id % 3 AS STRING) AS k", "id AS v")
        )

        seen_blocks = []

        def fold(key, blocks):
            total, n, nblocks = 0, 0, 0
            for b in blocks:
                total += int(b["v"].sum())
                n += len(b)
                nblocks += 1
            seen_blocks.append(nblocks)
            yield pd.DataFrame({"k": [key], "total": [total], "n": [n]})

        got = {
            r["k"]: (r["total"], r["n"])
            for r in mr_reduce_blocks(
                df, "k", fold, "k string, total long, n long"
            ).collect()
        }
        expect = {}
        for i in range(1000):
            k = str(i % 3)
            t, n = expect.get(k, (0, 0))
            expect[k] = (t + i, n + 1)
        assert got == expect
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_print_kv_typed_formats(spark):
    # MR-MPI print() format flags (keyvalue.cpp:790-815)
    df = (
        spark.createDataFrame(
            [(1, 2.5), (7, -0.125)], "key int, value double"
        )
        .repartition(1)
        .sortWithinPartitions("key")
    )
    lines = [r["line"] for r in M.print_kv(df, kflag=1, vflag=4).collect()]
    assert lines[0].startswith("KV pair: proc 0, sizes 4 8, key 1, value ")
    assert "2.5" in lines[0] and "-0.125" in lines[1]
    # NULL flag and string sizes (strlen+1, C string incl. NUL)
    sdf = spark.createDataFrame([("abc", "xy")], "key string, value string")
    (line,) = [r["line"] for r in M.print_kv(sdf, kflag=5, vflag=0).collect()]
    assert ", sizes 4 0, key abc, value NULL" in line
    # pair flags take a 2-element array column
    pdf = spark.createDataFrame([([1, 2], [3, 4])], "key array<int>, value array<int>")
    (pline,) = [r["line"] for r in M.print_kv(pdf, kflag=6, vflag=6).collect()]
    assert "sizes 8 8, key 1 2, value 3 4" in pline
    # partition-local nstride keeps every nstride-th pair
    big = spark.range(100).select(
        F.col("id").cast("int").alias("key"), F.col("id").alias("value")
    ).repartition(1).sortWithinPartitions("key")
    kept = M.print_kv(big, kflag=1, vflag=2, nstride=10).count()
    assert kept == 10
    # uint64 flags reinterpret the sign bit like C's %lu: -1 is the
    # all-ones 64-bit pattern
    udf = spark.createDataFrame([(1, -1)], "key int, value long")
    (uline,) = [r["line"] for r in M.print_kv(udf, kflag=1, vflag=2).collect()]
    assert "value 18446744073709551615" in uline
    updf = spark.createDataFrame(
        [([-1, 2], [3, 4])], "key array<long>, value array<int>"
    )
    (upline,) = [r["line"] for r in M.print_kv(updf, kflag=7, vflag=6).collect()]
    assert "key 18446744073709551615 2, value 3 4" in upline
    # invalid flags abort like mapreduce.cpp:1572-1573
    with pytest.raises(ValueError, match="Invalid print args"):
        M.print_kv(df, kflag=8)


def test_cap_per_group_requires_key_cols(spark):
    import pytest

    from pagerank_mapreduce_spark.operators.sessions import cap_per_group

    df = spark.createDataFrame([(1, "a")], "id bigint, g string")
    with pytest.raises(ValueError, match="key column"):
        cap_per_group(df, "g", 1)


def test_png_dimensions_real_header(spark):
    # a genuine 1-pixel PNG (signature + IHDR), plus junk: the parser
    # reads 24 bytes of header, never decodes, never crashes
    import struct
    import zlib

    from pyspark.sql import functions as F

    from pagerank_mapreduce_spark.operators.multimodal import png_dimensions

    def png(w, h):
        ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)
        chunk = b"IHDR" + ihdr
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", len(ihdr))
            + chunk
            + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
        )

    rows = [(1, png(640, 480)), (2, png(1, 1)), (3, b"not a png at all")]
    df = spark.createDataFrame(rows, "id bigint, payload binary")
    out = {
        r.id: (r.m.width, r.m.height) if r.m else None
        for r in df.select("id", png_dimensions("payload").alias("m")).collect()
    }
    assert out == {1: (640, 480), 2: (1, 1), 3: None}


def test_wav_audio_meta_real_header(spark):
    import struct

    from pagerank_mapreduce_spark.operators.multimodal import wav_audio_meta

    def wav(rate, ch):
        fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
        return (
            b"RIFF"
            + struct.pack("<I", 36)
            + b"WAVE"
            + b"fmt "
            + struct.pack("<I", 16)
            + fmt
        )

    rows = [(1, wav(44100, 2)), (2, wav(16000, 1)), (3, b"RIFFxxxxJUNK")]
    df = spark.createDataFrame(rows, "id bigint, payload binary")
    out = {
        r.id: (r.m.sample_rate, r.m.channels) if r.m else None
        for r in df.select("id", wav_audio_meta("payload").alias("m")).collect()
    }
    assert out == {1: (44100, 2), 2: (16000, 1), 3: None}
