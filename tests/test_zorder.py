"""Z-order layout: curve math vs a Python model, and the write ->
box-query -> directory-pruning round trip."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from pagerank_mapreduce_spark.sources.partitioned import scan_is_pruned
from pagerank_mapreduce_spark.sources.zorder import (
    overlapping_buckets,
    read_zorder_box,
    write_zordered,
    z_value,
)


def _interleave(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_python_model(spark):
    rng = random.Random(7)
    rows = [
        (i, rng.randrange(1 << 16), rng.randrange(1 << 16)) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id bigint, a bigint, b bigint")
    out = {r.id: r.z for r in df.select("id", z_value("a", "b").alias("z")).collect()}
    for i, a, b in rows:
        assert out[i] == _interleave(a, b)


def test_overlapping_buckets_exact_cover(spark):
    # brute-force ground truth: a bucket belongs iff some (a, b) in
    # the box lands in it — checked on a tiny 4-bit curve where full
    # enumeration is feasible
    bits, bucket_bits = 4, 2
    a_range, b_range = (3, 9), (5, 12)
    got = set(overlapping_buckets(a_range, b_range, bits, bucket_bits))
    want = set()
    for a in range(a_range[0], a_range[1] + 1):
        for b in range(b_range[0], b_range[1] + 1):
            want.add(_interleave(a, b, bits) >> (2 * bits - bucket_bits))
    assert got == want


def test_zorder_box_roundtrip_and_pruning(spark, tmp_path):
    rng = random.Random(11)
    rows = [
        (i, rng.randrange(1 << 16), rng.randrange(1 << 16)) for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "id bigint, a bigint, b bigint")
    path = str(tmp_path / "zlayout")
    write_zordered(df, path, "a", "b")

    a_range, b_range = (1000, 5000), (60000, 65535)
    out = read_zorder_box(spark, path, "a", "b", a_range, b_range)
    # the bucket isin must prune directories at planning time
    assert scan_is_pruned(out)
    got = sorted(r.id for r in out.collect())
    want = sorted(
        i
        for i, a, b in rows
        if a_range[0] <= a <= a_range[1] and b_range[0] <= b <= b_range[1]
    )
    assert got == want
    # and the curve must actually skip most of the space: the box is
    # ~6% of the (a, b) plane, so far fewer than half the buckets match
    n_buckets = len(overlapping_buckets(a_range, b_range))
    assert n_buckets < 128, n_buckets


def test_zorder_schema_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 3, 4, "x")], "id bigint, a bigint, b bigint, tag string"
    )
    path = str(tmp_path / "z1")
    write_zordered(df, path, "a", "b")
    out = read_zorder_box(spark, path, "a", "b", (0, 10), (0, 10))
    rows = out.collect()
    assert len(rows) == 1
    assert set(out.columns) == {"id", "a", "b", "tag"}


def test_zorder_random_boxes_property(spark, tmp_path):
    # randomized boxes: the pruned box query must equal the brute
    # filter for every box, including empty and full-plane ones
    rng = random.Random(23)
    rows = [
        (i, rng.randrange(1 << 16), rng.randrange(1 << 16)) for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "id bigint, a bigint, b bigint")
    path = str(tmp_path / "zprop")
    write_zordered(df, path, "a", "b")
    boxes = [
        ((0, (1 << 16) - 1), (0, (1 << 16) - 1)),  # full plane
        ((70000, 70001), (0, 10)),                  # empty (a out of data range is fine)
        ((0, 0), (0, 0)),                           # point
    ] + [
        (
            tuple(sorted((rng.randrange(1 << 16), rng.randrange(1 << 16)))),
            tuple(sorted((rng.randrange(1 << 16), rng.randrange(1 << 16)))),
        )
        for _ in range(5)
    ]
    for a_range, b_range in boxes:
        got = sorted(
            r.id
            for r in read_zorder_box(
                spark, path, "a", "b", a_range, b_range
            ).collect()
        )
        want = sorted(
            i
            for i, a, b in rows
            if a_range[0] <= a <= a_range[1] and b_range[0] <= b <= b_range[1]
        )
        assert got == want, (a_range, b_range)
