"""Edge-case tests for corpus-statistics ranking (TF-IDF / BM25 /
bigram LM). The catalog oracle parity test covers the fixture-scale
happy path; these pin the boundary semantics."""

from __future__ import annotations

import math

import pytest

from pagerank_mapreduce_spark.operators.ranking import (
    bigram_lm_score,
    bm25_score,
    tfidf_topk,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_tfidf_rare_term_outranks_common(spark):
    docs = _docs(
        spark,
        [
            (1, "common rare"),
            (2, "common common common"),
            (3, "common other"),
        ],
    )
    out = {
        (r.doc_id, r.term): r.tfidf
        for r in tfidf_topk(docs, k=2).collect()
    }
    # doc 1: at equal tf, "rare" (df=1) must outrank "common" (df=3)
    assert out[(1, "rare")] > out[(1, "common")]
    # smoothed idf formula check: tf * (ln((N+1)/(df+1)) + 1)
    assert out[(1, "rare")] == pytest.approx(
        1 * (math.log(4 / 2) + 1), abs=1e-6
    )


def test_tfidf_k_bounds_and_tie_break(spark):
    docs = _docs(spark, [(1, "a b c d e f g h"), (2, "a b")])
    rows = tfidf_topk(docs, k=3).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.term)
    assert len(per_doc[1]) == 3
    # all terms in doc 1 tie (tf=1; a,b have df=2, rest df=1) — the
    # df=1 terms win, then term-lexicographic order breaks the tie
    assert per_doc[1] == sorted(per_doc[1])


def test_bm25_requires_query_terms(spark):
    docs = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError):
        bm25_score(docs, [])


def test_bm25_matches_manual_single_doc_corpus(spark):
    # one doc, one query term appearing twice among 4 tokens
    docs = _docs(spark, [(1, "q w q z")])
    row = bm25_score(docs, ["q"]).collect()[0]
    n, df, tf, dl, avgdl, k1, b = 1, 1, 2, 4.0, 4.0, 1.2, 0.75
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    expect = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
    assert row.bm25 == pytest.approx(expect, abs=1e-6)


def test_bm25_case_insensitive_query(spark):
    docs = _docs(spark, [(1, "Spark spark"), (2, "other")])
    rows = bm25_score(docs, ["SPARK"]).collect()
    assert [r.doc_id for r in rows] == [1]


def test_lm_score_short_docs_zero_bigrams(spark):
    docs = _docs(spark, [(1, "solo"), (2, ""), (3, "a b a b")])
    out = {r.doc_id: (r.lm_score, r.n_bigrams) for r in
           bigram_lm_score(docs).collect()}
    assert out[1] == (0.0, 0)
    assert out[2] == (0.0, 0)
    assert out[3][1] == 3


def test_lm_score_repetitive_beats_novel(spark):
    # a doc made of one repeated bigram scores higher than a doc of
    # bigrams seen once each — the "word salad" signal
    docs = _docs(
        spark,
        [(1, "x y x y x y x y"), (2, "p q r s t u v w")],
    )
    out = {r.doc_id: r.lm_score for r in bigram_lm_score(docs).collect()}
    assert out[1] > out[2]


def test_lm_score_manual_two_token_corpus(spark):
    docs = _docs(spark, [(1, "a b")])
    row = bigram_lm_score(docs).collect()[0]
    # c2(a,b)=1, c1(a)=1, V=2 -> ln(2/3)
    assert row.lm_score == pytest.approx(math.log(2 / 3), abs=1e-6)
    assert row.n_bigrams == 1


# ------------------------------------------------------ Naive Bayes


def _ldocs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string"
    )


def test_nb_classify_separable_vocab(spark):
    # disjoint vocabularies: every doc must classify to its own label
    from pagerank_mapreduce_spark.operators.ranking import nb_classify

    docs = _ldocs(
        spark,
        [
            (1, "aa bb aa", "x"),
            (2, "bb aa aa aa", "x"),
            (3, "cc dd cc", "y"),
            (4, "dd dd cc", "y"),
        ],
    )
    out = {r.doc_id: r.pred for r in nb_classify(docs).collect()}
    assert out == {1: "x", 2: "x", 3: "y", 4: "y"}


def test_nb_classify_manual_formula(spark):
    # one doc, two labels — hand-check the smoothed log-likelihood
    import math

    from pagerank_mapreduce_spark.operators.ranking import nb_classify

    docs = _ldocs(
        spark,
        [
            (1, "w w v", "x"),
            (2, "u u u", "y"),
        ],
    )
    row = [r for r in nb_classify(docs).collect() if r.doc_id == 1][0]
    # vocab {w, v, u} => V=3; label x: n_l=3, c(x,w)=2, c(x,v)=1
    expect = (
        math.log(1 / 2)
        + 2 * math.log((2 + 1.0) / (3 + 3))
        + 1 * math.log((1 + 1.0) / (3 + 3))
    )
    assert row.pred == "x"
    assert row.nb_score == pytest.approx(expect, abs=1e-6)


def test_nb_classify_tie_breaks_to_smallest_label(spark):
    # perfectly symmetric corpus: identical priors, identical token
    # counts per label — every score ties across labels and must
    # resolve to the lexicographically smallest label
    from pagerank_mapreduce_spark.operators.ranking import nb_classify

    docs = _ldocs(
        spark,
        [
            (1, "aa", "x"),
            (2, "aa", "y"),
        ],
    )
    out = {r.doc_id: r.pred for r in nb_classify(docs).collect()}
    assert out == {1: "x", 2: "x"}


def test_dsir_weights_separate_target_like_documents(spark):
    # DSIR (Xie et al. 2023): under hashed unigram+bigram models fit
    # on target vs raw, documents written in the target vocabulary
    # must score strictly above documents in the raw vocabulary, with
    # a mixed document in between
    from pyspark.sql import functions as F

    from pagerank_mapreduce_spark.operators.selection import dsir_weights

    rows = []
    for i in range(20):
        rows.append((i, "alpha beta gamma alpha beta", 1))  # target
    for i in range(20, 40):
        rows.append((i, "delta epsilon zeta delta epsilon", 0))  # raw
    rows.append((100, "alpha beta gamma beta alpha", 0))  # target-like raw
    rows.append((101, "delta epsilon zeta epsilon", 0))  # raw-like raw
    rows.append((102, "alpha delta beta epsilon", 0))  # mixed
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt int")
    out = {
        r["doc_id"]: r
        for r in dsir_weights(df, F.col("tgt") == 1).collect()
    }
    # n_grams = tokens + bigrams = 2n - 1
    assert out[100]["n_grams"] == 9
    assert out[100]["dsir_logw"] > 0 > out[101]["dsir_logw"]
    assert out[101]["dsir_logw"] < out[102]["dsir_logw"] < out[100]["dsir_logw"]
    # single-token doc: unigram only, no degenerate bigram
    one = spark.createDataFrame(
        [(0, "alpha", 1), (1, "beta", 0)], "doc_id long, text string, tgt int"
    )
    got = dsir_weights(one, F.col("tgt") == 1).collect()
    assert {r["n_grams"] for r in got} == {1}


def test_bpe_train_hand_computed_merges(spark):
    # Sennrich et al.'s worked example shape: corpus where 'es' is the
    # top pair, then 'est' via the merged symbol; plus the overlap
    # chain ('oooo' under merge (o,o) must become (oo)(oo), the greedy
    # left-to-right contract)
    from pagerank_mapreduce_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(
        [(1, "lowest lowest newest newest newest widest")],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, n_merges=3).collect()
    got = [(m["merge_rank"], m["left"], m["right"], m["pair_count"])
           for m in merges]
    # 'es' and 'st' both appear 6x; tie-break on pair string asc
    assert got[0] == (1, "e", "s", 6)
    # after merging 'es': pair ('es','t') appears 6x, beats others
    assert got[1] == (2, "es", "t", 6)
    assert merges[1]["merged"] == "est"
    # third: 'west' path — 'w' 'est' appears 5x (lowest 2 + newest 3)
    assert got[2] == (3, "w", "est", 5)

    # overlap chain: merge (o,o) on 'oooo' consumes non-overlapping
    # left-to-right, so the SECOND merge can pair the two 'oo's
    chain = spark.createDataFrame(
        [(1, "oooo oooo oooo")], "doc_id long, text string"
    )
    m = bpe_train(chain, n_merges=2).collect()
    assert (m[0]["left"], m[0]["right"], m[0]["pair_count"]) == ("o", "o", 9)
    assert (m[1]["left"], m[1]["right"], m[1]["pair_count"]) == ("oo", "oo", 3)


def test_bpe_token_counts_consistent_with_merges(spark):
    # applying k merges can only shrink symbol counts, by exactly the
    # per-word number of merge hits; zero merges = character count
    from pagerank_mapreduce_spark.operators.bpe import (
        bpe_token_counts,
    )

    docs = spark.createDataFrame(
        [(1, "lowest newest"), (2, "newest newest wide")],
        "doc_id long, text string",
    )
    zero = {r["doc_id"]: r for r in bpe_token_counts(docs, 0).collect()}
    # 0 merges: tokens = characters
    assert (zero[1]["n_words"], zero[1]["n_bpe_tokens"]) == (2, 12)
    assert (zero[2]["n_words"], zero[2]["n_bpe_tokens"]) == (3, 16)
    k3 = {r["doc_id"]: r for r in bpe_token_counts(docs, 3).collect()}
    for d in (1, 2):
        assert k3[d]["n_words"] == zero[d]["n_words"]
        assert k3[d]["n_bpe_tokens"] < zero[d]["n_bpe_tokens"]


def test_bpe_vocab_local_matches_distributed_incl_exhaustion(spark):
    # the two trainer modes are one algorithm with two physical
    # plans: identical merges at every rank, including the
    # exhaustion point where the vocabulary collapses to single
    # symbols and BOTH must stop at the same rank
    from pagerank_mapreduce_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(
        [
            (1, "oooo ooo oo lowest newest"),
            (2, "newest newest abab ababab"),
            (3, "widest wide wid oooo abab"),
        ],
        "doc_id long, text string",
    )
    # 200 >> the possible merge count: exercises exhaustion
    for k in (5, 200):
        a = [tuple(r) for r in bpe_train(docs, n_merges=k).collect()]
        b = [
            tuple(r)
            for r in bpe_train(
                docs, n_merges=k, mode="vocab_local"
            ).collect()
        ]
        assert a == b, (k, a[:4], b[:4])
    assert 0 < len(a) < 200  # exhaustion actually hit


def test_bpe_apply_chunked_matches_single_expression(spark):
    # chunking the merge application (bounded plan depth) must be
    # bit-identical to the single chained-replace expression for
    # every chunk size, including chunk 1 (one checkpoint per merge)
    from pagerank_mapreduce_spark.operators.bpe import bpe_token_counts

    docs = spark.createDataFrame(
        [
            (1, "lowest lowest newest oooo"),
            (2, "newest newest widest ababab"),
        ],
        "doc_id long, text string",
    )
    want = sorted(
        tuple(r)
        for r in bpe_token_counts(docs, n_merges=9, chunk_size=10**6)
        .collect()
    )
    for chunk in (1, 2, 4):
        got = sorted(
            tuple(r)
            for r in bpe_token_counts(
                docs, n_merges=9, chunk_size=chunk,
                train_mode="vocab_local",
            ).collect()
        )
        assert got == want, chunk


def test_bpe_rank_merge_apply_matches_replace_chain(spark):
    # the k-independent Arrow-kernel apply must fire exactly the
    # replace chain's non-no-op merges in chain order — bit-identical
    # counts at small and deep merge counts (deep enough that merges
    # compose: later merges consume earlier merges' outputs)
    import random

    from pagerank_mapreduce_spark.operators.bpe import bpe_token_counts

    rng = random.Random(17)
    rows = [
        (
            i,
            " ".join(
                "".join(
                    rng.choice("abcde") for _ in range(rng.randint(1, 9))
                )
                for _ in range(rng.randint(1, 20))
            ),
        )
        for i in range(150)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for k in (4, 60):
        want = sorted(
            tuple(r)
            for r in bpe_token_counts(
                docs, n_merges=k, train_mode="vocab_local"
            ).collect()
        )
        got = sorted(
            tuple(r)
            for r in bpe_token_counts(
                docs,
                n_merges=k,
                train_mode="vocab_local",
                apply_mode="rank_merge",
            ).collect()
        )
        assert got == want, k


def test_bpe_word_segments_modes_identical(spark):
    # the vocabulary table (word -> space-joined tokens) must be
    # bit-identical between the Arrow rank_merge kernel and the
    # chained-replace path — this pins the actual TOKEN STRINGS, a
    # stronger check than the count-level apply tests
    from pagerank_mapreduce_spark.operators.bpe import bpe_word_segments

    docs = spark.createDataFrame(
        [
            (1, "lowest lowest newest oooo ababab"),
            (2, "newest newest widest abab oooo"),
        ],
        "doc_id long, text string",
    )
    a = sorted(
        tuple(r)
        for r in bpe_word_segments(
            docs, n_merges=8, train_mode="vocab_local",
            apply_mode="rank_merge",
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in bpe_word_segments(
            docs, n_merges=8, train_mode="vocab_local",
            apply_mode="replace", chunk_size=3,
        ).collect()
    )
    assert a == b
    by_word = {w: (s, n) for w, s, n in a}
    # segmentation concatenates back to the word; token count matches
    for w, (s, n) in by_word.items():
        assert s.replace(" ", "") == w, (w, s)
        assert len(s.split(" ")) == n, (w, s, n)
    # 8 merges on this corpus definitely fuse something
    assert any(n < len(w) for w, (_, n) in by_word.items())


def test_bpe_vocab_min_count_prunes_exactly(spark):
    # the frequency-floor prune == training on the corpus with
    # sub-floor words REMOVED (exact-by-definition semantics), and
    # floor 1 == the unpruned default
    from pyspark.sql import functions as F

    from pagerank_mapreduce_spark.functions.text import tokens
    from pagerank_mapreduce_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(
        [
            (1, "lowest lowest newest rare1"),
            (2, "newest newest widest rare2 lowest"),
            (3, "widest oooo oooo rare3 newest"),
        ],
        "doc_id long, text string",
    )
    wc = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .count()
    )
    keep = {r["w"] for r in wc.filter(F.col("count") >= 2).collect()}
    pruned_rows = [
        (r["doc_id"], " ".join(w for w in r["text"].split() if w in keep))
        for r in docs.collect()
    ]
    pruned = spark.createDataFrame(pruned_rows, "doc_id long, text string")
    got = [
        tuple(r)
        for r in bpe_train(
            docs, 30, mode="vocab_local", vocab_min_count=2
        ).collect()
    ]
    want = [
        tuple(r) for r in bpe_train(pruned, 30, mode="vocab_local").collect()
    ]
    assert got == want
    floor1 = [
        tuple(r)
        for r in bpe_train(
            docs, 30, mode="vocab_local", vocab_min_count=1
        ).collect()
    ]
    default = [
        tuple(r) for r in bpe_train(docs, 30, mode="vocab_local").collect()
    ]
    assert floor1 == default
    with pytest.raises(ValueError):
        bpe_train(docs, 3, vocab_min_count=0)


def test_rrf_fuse_hand_computed(spark):
    from pagerank_mapreduce_spark.operators.ranking import rrf_fuse

    # list A ranks (1,2,3); list B ranks (3,2,4). doc 2: 1/62+1/62;
    # doc 3: 1/63+1/61; doc 1: 1/61; doc 4: 1/63.
    a = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.7)], "doc_id bigint, s double"
    )
    b = spark.createDataFrame(
        [(3, 0.99), (2, 0.5), (4, 0.4)], "doc_id bigint, s double"
    )
    out = {
        r.doc_id: r
        for r in rrf_fuse([("a", a), ("b", b)], top=10).collect()
    }
    assert out[2].rrf == pytest.approx(1 / 62 + 1 / 62, abs=1e-6)
    assert out[3].rrf == pytest.approx(1 / 63 + 1 / 61, abs=1e-6)
    assert out[1].rrf == pytest.approx(1 / 61, abs=1e-6)
    assert out[1].r_b is None and out[1].r_a == 1
    # doc 3 beats doc 2: 1/63+1/61 > 2/62
    ordered = sorted(out.values(), key=lambda r: -r.rrf)
    assert ordered[0].doc_id == 3


def test_tfidf_query_score_linear_in_tf(spark):
    from pagerank_mapreduce_spark.operators.ranking import (
        tfidf_query_score,
    )

    docs = _docs(
        spark,
        [
            (1, "spark spark spark other"),
            (2, "spark other words here"),
            (3, "nothing relevant at all"),
        ],
    )
    out = {
        r.doc_id: r.tfidf_q
        for r in tfidf_query_score(docs, ["spark"], top=10).collect()
    }
    # linear tf: doc 1 scores exactly 3x doc 2 (same idf term)
    assert out[1] == pytest.approx(3 * out[2], abs=1e-5)
    assert 3 not in out
