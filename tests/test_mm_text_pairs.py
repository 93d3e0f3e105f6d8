"""Round-8 pair generators: perceptual aHash near-dups (multimodal)
and TF-IDF cosine near-dups (lexical-semantic). Catalog parity runs
in test_oracle_parity; these pin the operator semantics directly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pagerank_mapreduce_spark.operators import multimodal as MM
from pagerank_mapreduce_spark.operators.ranking import tfidf_cosine_pairs


def _media(spark, rows):
    return spark.createDataFrame(
        [
            (i, "text", t.encode(), "text/plain", len(t.encode()))
            for i, t in rows
        ],
        MM.MEDIA_SCHEMA,
    )


def test_ahash_identical_payloads_pair(spark):
    # byte-identical payloads share sha256 → identical features →
    # identical aHash → exactly one (a, b) candidate
    media = _media(spark, [(1, "same bytes"), (2, "same bytes"), (3, "other")])
    out = MM.ahash_near_dups(media, decoder="fake").collect()
    assert [(r["a"], r["b"]) for r in out] == [(1, 2)]


def test_ahash_bits_integer_quantization(spark):
    # a hand-built feature vector: bytes (0, 255, 0, 255, 0, 255, 0,
    # 255) → mean 127.5 → bits exactly at the odd positions
    df = spark.createDataFrame(
        [([0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0],)], "feature array<float>"
    )
    h = df.select(MM.ahash_from_feature(F.col("feature")).alias("h")).first()["h"]
    assert h == sum(1 << i for i in (1, 3, 5, 7))


def test_ahash_cap_drops_hash_clique_whole(spark):
    # 4 identical payloads form one bucket of 4 > cap 3 → dropped
    # whole; the distinct pair elsewhere survives
    media = _media(
        spark,
        [(i, "clique") for i in range(4)] + [(10, "pairx"), (11, "pairx")],
    )
    out = MM.ahash_near_dups(media, decoder="fake", max_bucket_size=3).collect()
    assert [(r["a"], r["b"]) for r in out] == [(10, 11)]


def test_ahash_hamming_probe_finds_adjacent_hashes(spark):
    # controlled decoder: payload "a" → hash 0b001, "b" → 0b011,
    # "c" → 0b010 — (a,b) and (b,c) are 1 bit apart, (a,c) is 2
    feats = {
        "a": [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        "b": [1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        "c": [0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
    }

    def decoder(payload: bytes) -> list[float]:
        return feats[payload.decode()]

    media = _media(spark, [(1, "a"), (2, "b"), (3, "c")])
    # exact buckets: all hashes distinct → no candidates
    assert MM.ahash_near_dups(media, decoder=decoder).count() == 0
    # 1-bit probing: adjacent pairs surface with their true distance,
    # the 2-bit pair stays out
    got = sorted(
        (r["a"], r["b"], r["hamming"])
        for r in MM.ahash_near_dups(
            media, decoder=decoder, probe_hamming=1
        ).collect()
    )
    assert got == [(1, 2, 1), (2, 3, 1)]
    with pytest.raises(ValueError, match="probe_hamming"):
        MM.ahash_near_dups(media, decoder=decoder, probe_hamming=2)


def test_ahash_excludes_failed_decodes(spark):
    media = _media(spark, [(1, "same bytes"), (2, "same bytes")])

    def decoder(payload: bytes) -> list[float]:
        raise ValueError("poison payload")

    assert MM.ahash_near_dups(media, decoder=decoder).count() == 0


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_cosine_identical_docs_score_one(spark):
    d = _docs(
        spark,
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta gamma"),
            (3, "delta epsilon zeta"),
        ],
    )
    out = {(r["a"], r["b"]): r["cos"] for r in tfidf_cosine_pairs(d).collect()}
    assert out == {(1, 2): 1.0}


def test_tfidf_cosine_df_pruning_excludes_hot_terms(spark):
    # "common" appears in every doc; with max_df=2 it is pruned from
    # the vectors, so docs sharing ONLY it never pair
    d = _docs(
        spark,
        [(1, "common alpha"), (2, "common beta"), (3, "common gamma")],
    )
    assert tfidf_cosine_pairs(d, threshold=0.01, max_df=2).count() == 0
    # unpruned, the shared term does produce pairs
    assert tfidf_cosine_pairs(d, threshold=0.01, max_df=10).count() == 3


def test_tfidf_cosine_threshold_filters(spark):
    d = _docs(
        spark,
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma epsilon"),
            (3, "alpha zeta eta theta"),
        ],
    )
    pairs = {
        (r["a"], r["b"]): r["cos"]
        for r in tfidf_cosine_pairs(d, threshold=0.0, max_df=10).collect()
    }
    # overlap of 3/4 terms beats overlap of 1/4
    assert pairs[(1, 2)] > pairs[(1, 3)]
    high = tfidf_cosine_pairs(d, threshold=pairs[(1, 3)] + 0.01, max_df=10)
    assert (1, 3) not in {(r["a"], r["b"]) for r in high.collect()}


def test_tfidf_cosine_no_cartesian_in_plan(spark):
    # the pair generator must be an equi-join on the term — a
    # cartesian/broadcast-nested-loop on the doc side would be the
    # quadratic plan the df cap exists to prevent (the only cross
    # join allowed is the 1-row corpus-size scalar)
    d = _docs(spark, [(1, "alpha beta"), (2, "alpha gamma")])
    plan = (
        tfidf_cosine_pairs(d)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
