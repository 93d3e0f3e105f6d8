"""Unit tests for sequence packing and decontamination — the
training-pipeline finishing passes (operators/packing.py,
operators/dedup.py::decontaminate). The catalog parity test checks
both against DuckDB on the fixtures; these tests pin the semantics
on adversarial synthetic inputs and the packing plan's scale shape.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from pagerank_mapreduce_spark.operators.dedup import decontaminate
from pagerank_mapreduce_spark.operators.packing import pack_sequences
from pagerank_mapreduce_spark.plans.audit import formatted_plan


def _reference_chunks(rows: list[tuple[int, int | None]], budget: int):
    """Single-threaded exclusive-prefix-sum packing."""
    out, acc = {}, 0
    for oid, w in sorted(rows):
        out[oid] = acc // budget
        acc += w or 0
    return out


def test_pack_sequences_matches_reference(spark):
    rng = random.Random(7)
    rows = [(i, rng.randrange(0, 200)) for i in range(537)]
    rng.shuffle(rows)  # arrival order != pack order
    df = spark.createDataFrame(rows, "id bigint, w bigint").repartition(8)
    got = {
        r["id"]: r["chunk_id"]
        for r in pack_sequences(
            df, "w", "id", budget=256, num_buckets=7
        ).collect()
    }
    assert got == _reference_chunks(rows, 256)


def test_pack_sequences_null_weights_and_sparse_ids(spark):
    # null weight occupies no budget; ids are sparse and non-zero-based
    rows = [(1000, 100), (2000, None), (2001, 100), (9999, 100)]
    df = spark.createDataFrame(rows, "id bigint, w bigint")
    got = {
        r["id"]: r["chunk_id"]
        for r in pack_sequences(df, "w", "id", budget=150).collect()
    }
    assert got == _reference_chunks(rows, 150)


def test_pack_sequences_empty(spark):
    df = spark.createDataFrame([], "id bigint, w bigint")
    out = pack_sequences(df, "w", "id", budget=10)
    assert out.count() == 0
    assert "chunk_id" in out.columns


def test_pack_sequences_plan_has_no_global_data_sort(spark):
    # the whole point of the operator: the corpus-sized side must
    # never pass through a SinglePartition exchange (that would be a
    # global sort of the data). Exactly one SinglePartition exchange
    # is expected — the window over the tiny per-bucket totals.
    rows = [(i, i % 50) for i in range(300)]
    df = spark.createDataFrame(rows, "id bigint, w bigint").repartition(8)
    plan = formatted_plan(pack_sequences(df, "w", "id", budget=64))
    assert plan.count("SinglePartition") == 1
    assert "hashpartitioning(_b" in plan


def test_decontaminate_exact_counts(spark):
    train = spark.createDataFrame(
        [
            (1, "a b c d e"),      # shares 2-grams "a b","b c","c d","d e"
            (2, "x y z w q"),      # shares nothing
            (3, "c d c d"),        # distinct shared 2-grams: "c d", "d c"?
        ],
        "doc_id bigint, text string",
    )
    test = spark.createDataFrame(
        [(10, "a b c"), (11, "c d e f")], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: r["n_shared_ngrams"]
        for r in decontaminate(train, test, k=2).collect()
    }
    # test-set distinct 2-grams: {a b, b c, c d, d e, e f}
    # doc 1 distinct 2-grams {a b, b c, c d, d e} -> 4 shared
    # doc 2 -> none (absent from result)
    # doc 3 distinct {c d, d c} -> 1 shared
    assert got == {1: 4, 3: 1}


def test_decontaminate_short_docs_whole_text_gram(spark):
    # docs shorter than k collapse to a single whole-text gram:
    # contaminated only by an identical short doc
    train = spark.createDataFrame(
        [(1, "hi there"), (2, "bye now")], "doc_id bigint, text string"
    )
    test = spark.createDataFrame([(9, "hi there")], "doc_id bigint, text string")
    got = {
        r["doc_id"]: r["n_shared_ngrams"]
        for r in decontaminate(train, test, k=5).collect()
    }
    assert got == {1: 1}


def test_pack_sequences_null_order_passes_through(spark):
    # NULL order rows can't be placed in the global order: they keep
    # their payload with chunk_id NULL, and their weights must not
    # shift any real bucket's offset
    rows = [(1, 100), (None, 999), (2, 100), (3, 100)]
    df = spark.createDataFrame(rows, "id bigint, w bigint")
    got = {
        r["id"]: r["chunk_id"]
        for r in pack_sequences(df, "w", "id", budget=150, num_buckets=2).collect()
    }
    assert got == {1: 0, 2: 0, 3: 1, None: None}


def test_decontaminate_rolling_equals_exact_strings(spark, sf_dir):
    # the rolling-hash default must reproduce the exact string-gram
    # counts per doc (collisions aside) on real fixture text
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    train = docs.filter(F.col("doc_id") % 10 != 0)
    test = docs.filter(F.col("doc_id") % 10 == 0)
    a = sorted(
        tuple(r) for r in decontaminate(train, test, k=4).collect()
    )
    b = sorted(
        tuple(r)
        for r in decontaminate(train, test, k=4, hash_grams=False).collect()
    )
    assert a == b and len(a) > 0


def test_decontaminate_short_docs_no_structured_collisions(spark):
    # regression: an unrotated XOR fold made "ha ha" == "no no" == ""
    # (repeated tokens cancel) and "a b" == "b a" (order-insensitive)
    train = spark.createDataFrame(
        [(1, "ha ha"), (2, "a b"), (3, "x y")],
        "doc_id bigint, text string",
    )
    test = spark.createDataFrame(
        [(9, "no no"), (10, "b a"), (11, "x y")],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: r["n_shared_ngrams"]
        for r in decontaminate(train, test, k=5).collect()
    }
    assert got == {3: 1}
