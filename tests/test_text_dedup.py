from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pagerank_mapreduce_spark.functions import text as T
from pagerank_mapreduce_spark.operators import dedup as D
from pagerank_mapreduce_spark.operators import multimodal as MM
from pagerank_mapreduce_spark.operators import similarity as S


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0 (modulo id)
        (2, base + " today"),  # near dup of 0
        (3, "der hund ist sehr gross und die katze ist klein das haus"),
        (4, "completely different words about spark query engines here"),
        (5, "  THE   quick brown fox jumps over the lazy dog and runs far away "),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_dedup_normalizes(docs):
    kept = D.exact_dedup(docs)
    ids = sorted(r["doc_id"] for r in kept.collect())
    # 0,1,5 collapse (5 differs only in case/whitespace) → keep 0
    assert ids == [0, 2, 3, 4]


def test_minhash_finds_planted_near_dup(docs):
    pairs = D.minhash_dedup(docs, threshold=0.5)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert (0, 1) in got  # exact dup always survives
    assert (0, 2) in got or (1, 2) in got  # near dup found
    assert all(4 not in p for p in got)  # unrelated doc never pairs


def test_ngram_jaccard_values(spark, docs):
    pairs = spark.createDataFrame([(0, 1), (0, 4)], "a bigint, b bigint")
    j = {(r["a"], r["b"]): r["jaccard"] for r in D.ngram_jaccard(pairs, docs).collect()}
    assert j[(0, 1)] == pytest.approx(1.0)
    assert j[(0, 4)] == pytest.approx(0.0)


def test_simhash_hamming_orders_similarity(docs):
    pairs = D.simhash_candidates(docs, bands=4, k=2)
    ham = {(r["a"], r["b"]): r["hamming"] for r in pairs.collect()}
    assert ham.get((0, 1)) == 0  # identical text → identical simhash
    if (0, 2) in ham and (3, 4) in ham:
        assert ham[(0, 2)] < ham[(3, 4)]


def test_lang_id(spark):
    rows = [
        (0, "the cat and the dog of the house is big"),
        (1, "der hund und die katze ist das haus"),
        (2, "xyz qqq zzz"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r["lang"] for r in df.select("doc_id", T.lang_id("text").alias("lang")).collect()}
    assert got == {0: "en", 1: "de", 2: "und"}


def test_quality_and_token_counts(spark):
    df = spark.createDataFrame(
        [(0, "the quick brown fox is here"), (1, "!!! ??? ;;; :::")],
        "doc_id bigint, text string",
    )
    out = df.select(
        "doc_id",
        T.token_count("text").alias("tc"),
        T.bpe_token_count("text").alias("btc"),
        T.quality_score("text").alias("q"),
    ).collect()
    rows = {r["doc_id"]: r for r in out}
    assert rows[0]["tc"] == 6
    assert rows[0]["btc"] == 6
    assert rows[1]["btc"] == 12  # each punct char is a token
    assert rows[0]["q"] > rows[1]["q"]  # clean text beats punct soup


def test_cosine_topk_self_is_top(spark):
    rows = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    top = S.cosine_topk(df, [1.0, 0.0, 0.0, 0.0], k=2).collect()
    assert top[0]["vec_id"] == 0 and top[0]["cos"] == pytest.approx(1.0)


def test_lsh_topk_contains_exact_top1(spark, sf_dir):
    from pagerank_mapreduce_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    query = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    exact = S.cosine_topk(emb, query, k=1).first()["vec_id"]
    bucketed = S.lsh_bucketize(emb, dim=len(query))
    approx = [r["vec_id"] for r in S.lsh_topk(bucketed, query, k=10).collect()]
    assert exact in approx  # query's own bucket holds the exact top-1


def test_ivf_full_probe_equals_bruteforce(spark, sf_dir):
    from pagerank_mapreduce_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    query = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    assigned, centroids = S.ivf_build(emb, n_lists=8)
    # probing every list must reproduce the exact brute-force top-k
    full = [
        (r["vec_id"], r["cos"])
        for r in S.ivf_topk(assigned, centroids, query, k=10, nprobe=8).collect()
    ]
    exact = [(r["vec_id"], r["cos"]) for r in S.cosine_topk(emb, query, k=10).collect()]
    assert full == exact
    # a narrow probe still finds the query's own vector (cos = 1)
    narrow = [
        r["vec_id"]
        for r in S.ivf_topk(assigned, centroids, query, k=10, nprobe=1).collect()
    ]
    assert 0 in narrow


def test_ivf_sampled_full_probe_equals_bruteforce(spark, sf_dir):
    from pagerank_mapreduce_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    query = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    assigned, centroids = S.ivf_sampled_build(emb, n_lists=8)
    # the sampled codebook shares the probe machinery, so the same
    # recall invariant must hold: full probe == brute force
    full = [
        (r["vec_id"], r["cos"])
        for r in S.ivf_topk(assigned, centroids, query, k=10, nprobe=8).collect()
    ]
    exact = [(r["vec_id"], r["cos"]) for r in S.cosine_topk(emb, query, k=10).collect()]
    assert full == exact
    # every vector lands in exactly one list, lists cover the codebook
    lists = {r["list_id"] for r in assigned.select("list_id").distinct().collect()}
    assert lists <= set(range(8))
    # a centroid vector is assigned to its own list (distance 0)
    own = assigned.filter(F.col("vec_id") == 3).first()["list_id"]
    assert own == 3


def test_assignment_vectorized_equals_expr(spark, sf_dir):
    # the BLAS-batched production assignment must agree row-for-row
    # with the oracle-replayable expression mode (same squared-L2
    # argmin, same first-minimum tie-break); a flip would need two
    # centroid distances equal to within summation-order rounding
    from pagerank_mapreduce_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a_expr, cb1 = S.ivf_sampled_build(emb, n_lists=8, assignment="expr")
    a_vec, cb2 = S.ivf_sampled_build(emb, n_lists=8, assignment="vectorized")
    assert cb1 == cb2
    x = sorted((r["vec_id"], r["list_id"]) for r in a_expr.collect())
    y = sorted((r["vec_id"], r["list_id"]) for r in a_vec.collect())
    assert x == y
    # the whole semdedup pipeline agrees too (drop decisions included)
    d_expr = sorted(map(tuple, S.semdedup(emb, n_clusters=8, threshold=0.4).collect()))
    d_vec = sorted(
        map(
            tuple,
            S.semdedup(
                emb, n_clusters=8, threshold=0.4, assignment="vectorized"
            ).collect(),
        )
    )
    assert d_expr == d_vec


def test_semdedup_matrix_scoring_equals_expr(spark, sf_dir):
    # the per-cluster BLAS gram path must reproduce the expression
    # path's drop decisions exactly (same sorted-id pair orientation,
    # same min-kept/max-cos aggregation, same 8-digit rounding)
    from pagerank_mapreduce_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a = sorted(map(tuple, S.semdedup(emb, n_clusters=8, threshold=0.4).collect()))
    b = sorted(
        map(
            tuple,
            S.semdedup(
                emb,
                n_clusters=8,
                threshold=0.4,
                assignment="vectorized",
                scoring="matrix",
            ).collect(),
        )
    )
    assert a == b and a


def test_semdedup_matrix_scoring_honors_cap(spark):
    # an oversize cluster emits nothing in matrix mode too (drop-whole
    # semantics of hot_bucket_guard, applied inside the group kernel):
    # cluster 0 = {0, 2..7} (7 members > cap 5, dropped whole);
    # cluster 1 = {1, 10, 11} scores normally
    rows = (
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
        + [(i, [1.0, 0.0]) for i in range(2, 8)]
        + [(10, [0.0, 1.0]), (11, [0.0, 1.0])]
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    for sc in ("expr", "matrix"):
        out = sorted(
            (r["vec_id"], r["kept_with"])
            for r in S.semdedup(
                df,
                n_clusters=2,
                threshold=0.5,
                max_cluster_size=5,
                scoring=sc,
            ).collect()
        )
        assert out == [(10, 1), (11, 1)], (sc, out)


def test_semdedup_rejects_unknown_scoring(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="expr|matrix"):
        S.semdedup(df, n_clusters=2, scoring="nope").collect()


def test_two_level_assignment_probe_all_equals_exact(spark, sf_dir):
    # coarse_probe == coarse probes every super-cluster, so the
    # approximate scheme must reproduce the exact assignment
    from pagerank_mapreduce_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").limit(16).collect()
    cents = [[float(x) for x in r["embedding"]] for r in rows]
    exact = sorted(
        (r["vec_id"], r["list_id"])
        for r in S.assign_nearest_centroid(
            emb, cents, assignment="vectorized"
        ).collect()
    )
    full = sorted(
        (r["vec_id"], r["list_id"])
        for r in S.assign_nearest_centroid_two_level(
            emb, cents, coarse=4, coarse_probe=4
        ).collect()
    )
    assert exact == full


def test_two_level_assignment_recall_floor(spark, sf_dir):
    # narrow probing is approximate; near-uniform synthetic embeddings
    # are the hardest case (same argument as the IVF-KMeans recall
    # floor) — measured 0.4-0.6 at probe=2/8 across fixtures, floored
    # at 0.25 so a broken coarse ranking (≈ probe/coarse ≈ 0.1 per
    # super-cluster hit at random) fails without flaking
    from pagerank_mapreduce_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").limit(64).collect()
    cents = [[float(x) for x in r["embedding"]] for r in rows]
    exact = dict(
        (r["vec_id"], r["list_id"])
        for r in S.assign_nearest_centroid(
            emb, cents, assignment="vectorized"
        ).collect()
    )
    approx = dict(
        (r["vec_id"], r["list_id"])
        for r in S.assign_nearest_centroid_two_level(
            emb, cents, coarse=8, coarse_probe=2
        ).collect()
    )
    recall = sum(1 for k in exact if approx[k] == exact[k]) / len(exact)
    assert recall >= 0.25, recall


def test_assignment_rejects_unknown_mode(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="expr|vectorized"):
        S.assign_nearest_centroid(
            emb, [[1.0, 0.0]], assignment="nope"
        ).collect()


def test_ivf_kmeans_narrow_probe_recall_floor(spark, sf_dir):
    # the Spark ML KMeans codebook (ivf_build) can never have an
    # exact oracle, so pin its approximate regime instead: at
    # nprobe=2 < n_lists=8 top-10 overlap vs brute force must clear
    # a fixed floor. (Round 14: the sim_ivf_kmeans_topk catalog
    # entry switched to the spread-init Lloyd codebook and is now
    # full-hash checked; ivf_build remains the operator-library
    # KMeans path this floor guards.) Measured
    # recall@10 across sf0.001/0.01/0.1 is 0.4-0.6 on the synthetic
    # embeddings (near-uniform vectors are IVF's hardest case); the
    # floor 0.3 fails on any real regression (broken assignment or
    # probe selection lands near k/n ≈ 0.02) without flaking on
    # codebook sensitivity to scale.
    from pagerank_mapreduce_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    query = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    assigned, centroids = S.ivf_build(emb, n_lists=8)
    approx = {
        r["vec_id"]
        for r in S.ivf_topk(assigned, centroids, query, k=10, nprobe=2).collect()
    }
    exact = {r["vec_id"] for r in S.cosine_topk(emb, query, k=10).collect()}
    assert len(approx & exact) / 10 >= 0.3
    # deterministic anchor: the query's own vector lives in the
    # closest centroid's list, which a 2-probe always visits
    assert 0 in approx


def test_multimodal_feature_extraction(docs):
    media = MM.documents_as_media(docs)
    feats = MM.extract_features(media)
    rows = feats.collect()
    assert len(rows) == docs.count()
    assert all(r["decode_ok"] for r in rows)
    assert all(len(r["feature"]) == 8 for r in rows)
    # identical payloads → identical features (deterministic decode)
    by_id = {r["media_id"]: list(r["feature"]) for r in rows}
    assert by_id[0] == by_id[1]
    assert by_id[0] != by_id[4]


def test_multimodal_poison_payload_does_not_kill_stage(docs):
    def picky(payload: bytes):
        if b"different" in payload:
            raise ValueError("poison")
        return MM._fake_decode(payload)

    media = MM.documents_as_media(docs)
    rows = MM.extract_features(media, decoder=picky).collect()
    bad = [r for r in rows if not r["decode_ok"]]
    assert len(bad) == 1 and bad[0]["media_id"] == 4


def test_decoder_resolution():
    # "auto" (the operator default) selects the real PIL kernel when
    # the lib is importable, the deterministic fake otherwise — the
    # operator becomes real the day the container gains the dep
    expected = MM._pil_decode if MM._HAS_PIL else MM._fake_decode
    assert MM._resolve_decoder("auto") is expected
    assert MM._resolve_decoder(None) is expected
    assert MM._resolve_decoder("fake") is MM._fake_decode
    custom = lambda payload: [0.0]  # noqa: E731
    assert MM._resolve_decoder(custom) is custom
    if not MM._HAS_PIL:
        with pytest.raises(ImportError):
            MM._resolve_decoder("pil")
    with pytest.raises(ValueError):
        MM._resolve_decoder("jpeg2000")


@pytest.mark.skipif(not MM._HAS_PIL, reason="Pillow not installed")
def test_multimodal_real_pil_path(spark):
    # exercised automatically once the container gains Pillow: a real
    # 2x2 PNG flows through decode + resize end-to-end
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (2, 2), color=128).save(buf, format="PNG")
    media = spark.createDataFrame(
        [(0, "image", buf.getvalue(), "image/png", len(buf.getvalue()))],
        MM.MEDIA_SCHEMA,
    )
    row = MM.extract_features(media, decoder="pil").first()
    assert row["decode_ok"] and len(row["feature"]) == 8
    assert all(abs(v - 128 / 255) < 1e-6 for v in row["feature"])
    resized = MM.resize_images(media, 4, 4).first()
    img = Image.open(io.BytesIO(bytes(resized["payload"])))
    assert img.size == (4, 4)
    assert resized["n_bytes"] == len(bytes(resized["payload"]))


def test_frame_sampling_shape(docs):
    media = MM.documents_as_media(docs)
    frames = MM.sample_frames(media, every_n=1)
    assert frames.count() >= docs.count()  # ≥1 frame per media
    assert frames.columns == ["media_id", "frame_no", "feature"]


def test_hot_bucket_cap_bounds_pair_explosion(spark):
    # 12 identical docs land in the SAME bucket in every band — the
    # pathological boilerplate clique. With the cap below the clique
    # size, every bucket is dropped whole and no pairs are emitted;
    # with the cap disabled, all 66 pairs appear.
    clique = "repeated boilerplate header text appearing in every single document"
    rows = [(i, clique) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    uncapped = D.minhash_lsh_candidates(df, max_bucket_size=None)
    assert uncapped.count() == 12 * 11 // 2

    capped = D.minhash_lsh_candidates(df, max_bucket_size=4)
    assert capped.count() == 0

    # default cap (512) leaves small buckets untouched
    assert D.minhash_lsh_candidates(df).count() == 12 * 11 // 2

    # simhash twin honors the same guard
    assert D.simhash_candidates(df, max_bucket_size=4).count() == 0
    assert D.simhash_candidates(df, max_bucket_size=None).count() == 12 * 11 // 2


def test_embedding_near_dups_hot_bucket_cap(spark):
    # 12 identical embeddings all land in one LSH bucket — the
    # degenerate corpus that would turn a raw bucket self-join
    # quadratic. With the cap below the clique size the bucket is
    # dropped whole (0 pairs); uncapped, all 66 pairs score 1.0.
    vec = [1.0] * 8
    rows = [(i, vec) for i in range(12)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    uncapped = S.embedding_near_dups(
        emb, threshold=0.99, n_planes=4, dim=8, max_bucket_size=None
    )
    assert uncapped.count() == 12 * 11 // 2

    capped = S.embedding_near_dups(
        emb, threshold=0.99, n_planes=4, dim=8, max_bucket_size=4
    )
    assert capped.count() == 0

    # a small bucket elsewhere survives the cap: two near-identical
    # vectors pointing away from the clique still pair up
    rows += [(100, [-1.0] * 8), (101, [-1.0] * 7 + [-0.9])]
    emb2 = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    pairs = {
        (r["a"], r["b"])
        for r in S.embedding_near_dups(
            emb2, threshold=0.99, n_planes=4, dim=8, max_bucket_size=4
        ).collect()
    }
    assert pairs == {(100, 101)}


def test_hot_bucket_cap_keeps_pairs_from_selective_bands(spark):
    # Two docs share all bands (true near-dups) while a hot clique
    # floods one synthetic bucket: capping must drop the clique's
    # pairs but keep the selective pair.
    base = "the quick brown fox jumps over the lazy dog and runs far away"
    rows = [(0, base), (1, base + " today")]
    clique = "repeated boilerplate header text appearing in every single document"
    rows += [(100 + i, clique) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = {
        (r["a"], r["b"])
        for r in D.minhash_lsh_candidates(df, max_bucket_size=4).collect()
    }
    assert (0, 1) in pairs
    assert all(a < 100 and b < 100 for a, b in pairs)


def test_repetition_stats_multiline(spark):
    from pagerank_mapreduce_spark.operators.quality import repetition_stats

    docs = spark.createDataFrame(
        [
            # 4 non-empty lines, "spam ham" twice: dup_line_frac=0.5;
            # dup chars = 2*8 of 8+8+4+3=23 line chars
            (1, "spam ham\nspam ham\nxy z\n\nabc"),
            # no duplicate lines, top 2-gram "a b" appears twice
            (2, "a b a b a"),
            (3, ""),  # empty doc: all zeros
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}
    assert got[1]["dup_line_frac"] == 0.5
    assert got[1]["dup_line_char_frac"] == round(16 / 23, 6)
    assert got[2]["dup_line_frac"] == 0.0
    # "a b" occurs twice (overlapping windows), covers 2*3 of 9 chars
    assert got[2]["top_ngram_char_frac"] == round(6 / 9, 6)
    assert got[3]["dup_line_frac"] == 0.0
    assert got[3]["dup_line_char_frac"] == 0.0
    assert got[3]["top_ngram_char_frac"] == 0.0


def test_repetition_stats_short_docs_have_no_ngrams(spark):
    # a document with fewer than n tokens contains NO n-grams —
    # shingles()'s whole-text fallback (needed by MinHash) must not
    # leak in and score every 1-token doc as ~100% repetitive
    from pagerank_mapreduce_spark.operators.quality import repetition_stats

    docs = spark.createDataFrame(
        [(1, "hello"), (2, "two words")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(docs, n=2).collect()}
    assert got[1]["top_ngram_char_frac"] == 0.0  # 1 token, no 2-grams
    assert got[2]["top_ngram_char_frac"] == round(9 / 9, 6)  # one 2-gram


def test_canonicalize_transitive_chain(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id long, text string"
    )
    # chain 1-2, 2-3 plus isolated pair 4-5: canonical follows the
    # transitive closure, not just direct pairs
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "a long, b long"
    )
    got = {r["doc_id"]: r["canonical"] for r in D.canonicalize(docs, pairs).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 4}
    kept = sorted(k for k, v in got.items() if k == v)
    assert kept == [0, 1, 4]


def test_pq_codebook_vector_has_zero_adc_to_itself(spark, sf_dir):
    # vec 0 is the first codebook sample, so every subspace encodes
    # it as itself and its ADC to its own query is exactly 0.0
    from pagerank_mapreduce_spark.operators.similarity import pq_build, pq_topk
    from pagerank_mapreduce_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    query = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    coded, cb = pq_build(emb, n_sub=8, n_centroids=8)
    top = pq_topk(coded, cb, query, k=3).collect()
    assert top[0].vec_id == 0 and top[0].adc == 0.0
    assert top[0].cos == 1.0
    # codes are within the codebook range
    row = coded.filter(F.col("vec_id") == 0).first()
    assert all(0 <= c < 8 for c in row.codes) and len(row.codes) == 8


def test_pq_validates_shapes(spark):
    from pagerank_mapreduce_spark.operators.similarity import pq_build, pq_topk

    emb = spark.createDataFrame(
        [(i, [float(i)] * 6) for i in range(4)],
        "vec_id bigint, embedding array<float>",
    )
    with pytest.raises(ValueError):  # 6 not divisible by 4
        pq_build(emb, n_sub=4, n_centroids=2)
    with pytest.raises(ValueError):  # corpus smaller than codebook
        pq_build(emb, n_sub=2, n_centroids=10)
    coded, cb = pq_build(emb, n_sub=2, n_centroids=2)
    with pytest.raises(ValueError):  # query dim mismatch
        pq_topk(coded, cb, [0.0] * 4)


def test_pq_separable_clusters_rank_correctly(spark):
    # two well-separated clusters: ADC must rank the query's cluster
    # first even through the lossy codes
    from pagerank_mapreduce_spark.operators.similarity import pq_build, pq_topk

    near = [(i, [0.1 + 0.01 * i] * 8) for i in range(5)]
    far = [(i + 10, [9.0 + 0.01 * i] * 8) for i in range(5)]
    emb = spark.createDataFrame(
        near + far, "vec_id bigint, embedding array<double>"
    )
    coded, cb = pq_build(emb, n_sub=4, n_centroids=4)
    top = pq_topk(coded, cb, [0.01] * 8, k=5).collect()
    assert {r.vec_id for r in top} == {0, 1, 2, 3, 4}


def test_incremental_pairs_cross_side_only(spark):
    from pyspark.sql import functions as F

    # index: docs 1, 2 (near-identical); new batch: docs 11 (dup of
    # 1/2), 12 (dup of 11 — but new-new must NOT pair), 13 (novel)
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),
            (11, base),
            (12, base),
            (13, "completely different text with nothing shared here at all"),
        ],
        "doc_id bigint, text string",
    )
    out = D.minhash_incremental_pairs(
        docs, F.col("doc_id") >= 10, threshold=0.5
    ).collect()
    pairs = {(r.a, r.b) for r in out}
    # every pair is (index, new)
    assert all(a < 10 <= b for a, b in pairs)
    # both index docs match both duplicate newcomers; the novel doc
    # and the new-new duplicate pair are absent
    assert pairs == {(1, 11), (1, 12), (2, 11), (2, 12)}
    assert all(r.jaccard >= 0.5 for r in out)


def test_incremental_pair_cap_bounds_cross_product(spark):
    from pyspark.sql import functions as F

    # a boilerplate clique spanning both sides: uncapped would emit
    # 10x10 pairs from one bucket; cap 16 drops the bucket whole
    same = "identical boilerplate text repeated in every document here"
    docs = spark.createDataFrame(
        [(i, same) for i in range(10)] + [(100 + i, same) for i in range(10)],
        "doc_id bigint, text string",
    )
    capped = D.minhash_incremental_pairs(
        docs, F.col("doc_id") >= 100, threshold=0.5, max_bucket_pairs=16
    )
    assert capped.count() == 0
    uncapped = D.minhash_incremental_pairs(
        docs, F.col("doc_id") >= 100, threshold=0.5, max_bucket_pairs=None
    )
    assert uncapped.count() == 100


# ------------------------------------------ semdedup (round 7)


def test_semdedup_drops_in_cluster_near_dups(spark):
    # codebook = 2 smallest ids ([1,0,0,0] and [0,1,0,0]); 4/5 are
    # near/exact dups of vec 0 in cluster 0, 6 of vec 1 in cluster 1
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.71, 0.70, 0.0, 0.0]),  # cluster 0 (boundary)
        (3, [0.70, 0.71, 0.0, 0.0]),  # cluster 1 (boundary)
        (4, [1.0, 0.01, 0.0, 0.0]),
        (5, [1.0, 0.0, 0.0, 0.0]),  # exact copy of 0
        (6, [0.0, 1.0, 0.01, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = {
        r["vec_id"]: (r["kept_with"], r["cos"])
        for r in S.semdedup(emb, n_clusters=2, threshold=0.95).collect()
    }
    assert set(out) == {4, 5, 6}
    assert out[5] == (0, 1.0)  # exact copy: kept with the original
    assert out[4][0] == 0 and out[4][1] >= 0.9999
    assert out[6][0] == 1
    # 2 and 3 are near-identical (cos ~0.99997) but land in DIFFERENT
    # clusters — semdedup is blind to cross-cluster pairs by design
    # (the recall/scale trade the paper makes); neither is dropped


def test_semdedup_cap_drops_oversize_cluster_whole(spark):
    rows = [(i, [1.0, 0.0 + i * 1e-6]) for i in range(10)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    # every vector lands in one cluster of 10 > cap=5 → dropped whole
    out = S.semdedup(emb, n_clusters=2, threshold=0.5, max_cluster_size=5)
    assert out.count() == 0


# ------------------------------- duplicated-span coverage (round 7)


def test_span_coverage_interval_union(spark):
    # d0/d1 share the 5-token run "a b c d e" → two dup 4-grams each,
    # whose [s, s+4) intervals OVERLAP: covered = 5 positions, not 8
    rows = [
        (0, "a b c d e u1 u2 u3"),
        (1, "z1 a b c d e z2"),
        (2, "p q r s t v w"),
        (3, "x y"),  # shorter than n → zero-coverage row, not dropped
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r["doc_id"]: r for r in D.dup_span_coverage(docs, n=4).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    assert (out[0]["dup_ngrams"], out[0]["covered_tokens"]) == (2, 5)
    assert out[0]["dup_ratio"] == round(5 / 8, 6)
    assert (out[1]["dup_ngrams"], out[1]["covered_tokens"]) == (2, 5)
    assert out[1]["dup_ratio"] == round(5 / 7, 6)
    assert out[2]["covered_tokens"] == 0 and out[2]["dup_ratio"] == 0.0
    assert out[3]["n_tokens"] == 2 and out[3]["covered_tokens"] == 0


def test_span_coverage_within_doc_repeat_not_counted(spark):
    # the same 4-gram repeated INSIDE one doc is not a cross-doc dup
    rows = [
        (0, "a b c d a b c d"),
        (1, "q r s t u v w x"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in D.dup_span_coverage(docs, n=4).collect()}
    assert out[0]["covered_tokens"] == 0
    assert out[1]["covered_tokens"] == 0


def test_semdedup_kmeans_codebook_drops_exact_dup(spark):
    # identical vectors always co-cluster whatever the codebook, so
    # the quality path must still drop the planted copy
    rows = [(i, [float(i % 4 == 0), float(i % 4 == 1), float(i % 4 == 2),
                 float(i % 4 == 3)]) for i in range(8)]
    rows.append((8, rows[0][1]))  # exact copy of vec 0
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = {r["vec_id"]: r["kept_with"]
           for r in S.semdedup(emb, n_clusters=4, threshold=0.99,
                               codebook="kmeans").collect()}
    assert out.get(8) is not None  # the copy is dropped...
    # ...and kept with an identical-vector partner (0 or 4)
    assert out[8] in (0, 4)


def test_semdedup_rejects_unknown_codebook(spark):
    emb = spark.createDataFrame([(0, [1.0])], "vec_id bigint, embedding array<double>")
    with pytest.raises(ValueError, match="codebook"):
        S.semdedup(emb, codebook="nope")


def test_span_coverage_fast_key_matches_portable(spark, sf_dir):
    # the rolling-xxhash64 production key and the portable md5 key
    # must produce identical coverage on a collision-free corpus —
    # both the hand corpus and the fixture documents
    rows = [
        (0, "a b c d e u1 u2 u3"),
        (1, "z1 a b c d e z2"),
        (2, "p q r s t v w"),
        (3, "x y"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    a = sorted(map(tuple, D.dup_span_coverage(docs, n=4).collect()))
    b = sorted(map(tuple, D.dup_span_coverage(docs, n=4, gram_key="fast").collect()))
    assert a == b
    fixture = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fa = sorted(map(tuple, D.dup_span_coverage(fixture, n=8).collect()))
    fb = sorted(map(tuple, D.dup_span_coverage(fixture, n=8, gram_key="fast").collect()))
    assert fa == fb


def test_span_coverage_rejects_unknown_key_mode(spark):
    docs = spark.createDataFrame([(0, "a b")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="gram_key"):
        D.dup_span_coverage(docs, gram_key="nope")


# ------------------------------------- paragraph-level dedup (r8)


def _para_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_paragraph_dedup_keeps_first_and_reassembles(spark):
    from pagerank_mapreduce_spark.operators.dedup import paragraph_dedup

    docs = _para_docs(
        spark,
        [(1, "A\n\nB"), (2, "B\n\nC"), (3, "A\n\nC")],
    )
    got = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    assert got[1]["text"] == "A\n\nB" and got[1]["n_kept"] == 2
    assert got[2]["text"] == "C" and got[2]["n_dropped"] == 1
    # every paragraph of doc 3 lost, the row survives with empty text
    assert got[3]["text"] == "" and got[3]["n_kept"] == 0
    assert got[3]["n_dropped"] == 2


def test_paragraph_dedup_is_idempotent(spark):
    from pagerank_mapreduce_spark.operators.dedup import paragraph_dedup

    docs = _para_docs(
        spark,
        [(1, "x\n\ny\n\nz"), (2, "y\n\nw"), (3, "w\n\nx\n\nq")],
    )
    once = paragraph_dedup(docs)
    twice = paragraph_dedup(once.filter(F.col("n_kept") > 0))
    a = {(r["doc_id"], r["text"]) for r in once.filter(F.col("n_kept") > 0).collect()}
    b = {(r["doc_id"], r["text"]) for r in twice.collect()}
    assert a == b
    assert all(r["n_dropped"] == 0 for r in twice.collect())


def test_paragraph_dedup_drops_blank_fragments(spark):
    from pagerank_mapreduce_spark.operators.dedup import paragraph_dedup

    docs = _para_docs(spark, [(1, "A\n\n   \n\nB")])
    got = paragraph_dedup(docs).first()
    assert got["text"] == "A\n\nB"
    assert got["n_kept"] == 2 and got["n_dropped"] == 0


def test_word_chunk_splitter_remainder_and_dedup(spark):
    from pagerank_mapreduce_spark.operators.dedup import (
        paragraph_dedup,
        word_chunk_splitter,
    )

    docs = _para_docs(
        spark,
        [(1, "a b c d e f g"), (2, "a b c x y")],
    )
    chunks = docs.select(
        F.posexplode(word_chunk_splitter("text", 3)).alias("pos", "p")
    )
    assert [r["p"] for r in chunks.collect() if r["pos"] == 2] == ["g"]
    got = {
        r["doc_id"]: r
        for r in paragraph_dedup(
            docs, splitter=word_chunk_splitter("text", 3), joiner=" "
        ).collect()
    }
    # doc 2's first chunk "a b c" loses to doc 1's
    assert got[2]["text"] == "x y" and got[2]["n_dropped"] == 1
    assert got[1]["text"] == "a b c d e f g"


# --------------------------------- prefix-filtering Jaccard join (r8)


def test_jaccard_prefix_hand_computed(spark):
    docs = _para_docs(
        spark, [(1, "a b c d"), (2, "a b c e"), (3, "x y z w")]
    )
    # J(1,2) = 3/5 = 0.6; doc 3 shares nothing
    got = D.jaccard_prefix_pairs(docs, threshold=0.6).collect()
    assert [(r["a"], r["b"], r["jaccard"]) for r in got] == [(1, 2, 0.6)]
    assert D.jaccard_prefix_pairs(docs, threshold=0.61).count() == 0


def test_jaccard_prefix_is_lossless_vs_brute_force(spark):
    # deterministic random-ish corpus over a 12-token vocabulary:
    # every brute-force qualifying pair must survive the prefix
    # filter (the theorem), and nothing else may appear
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for d in range(40):
        toks = sorted({vocab[(d * 7 + k * k) % 12] for k in range(3 + d % 7)})
        rows.append((d, " ".join(toks)))
    docs = _para_docs(spark, rows)
    for t in (0.5, 0.7, 0.9):
        got = {
            (r["a"], r["b"]): r["jaccard"]
            for r in D.jaccard_prefix_pairs(docs, threshold=t).collect()
        }
        sets = {d: set(s.split()) for d, s in rows}
        expect = {}
        for a in range(40):
            for b in range(a + 1, 40):
                j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
                if j >= t:
                    expect[(a, b)] = round(j, 6)
        assert got == expect, f"threshold {t}"


def test_jaccard_prefix_cap_documents_exactness_trade(spark):
    # capping a prefix bucket drops qualifying pairs — allowed only
    # as an explicit opt-in, so verify it actually drops
    docs = _para_docs(
        spark, [(i, "a b c") for i in range(5)]
    )
    assert D.jaccard_prefix_pairs(docs, threshold=1.0).count() == 10
    assert (
        D.jaccard_prefix_pairs(
            docs, threshold=1.0, max_prefix_bucket=2
        ).count()
        == 0
    )


# ------------------------- deletion-neighborhood fuzzy match (r8)


def test_fuzzy_pairs_all_edit_types(spark):
    # substitution (cat/cut), deletion (cat/at), insertion (cat/cart)
    # all land at distance 1; (cut/at) and (at/cart) are distance 2
    docs = _para_docs(
        spark, [(1, "cat"), (2, "cut"), (3, "at"), (4, "cart")]
    )
    got = sorted(
        (r["a"], r["b"], r["dist"])
        for r in D.fuzzy_match_pairs(docs, "text").collect()
    )
    assert got == [(1, 2, 1), (1, 3, 1), (1, 4, 1)]


def test_fuzzy_pairs_transposition_is_filtered(spark):
    # "ab" and "ba" share delete-one buckets ("a" and "b") but their
    # Levenshtein distance is 2 -- verification must drop them
    docs = _para_docs(spark, [(1, "ab"), (2, "ba")])
    assert D.fuzzy_match_pairs(docs, "text").count() == 0


def test_fuzzy_pairs_exact_duplicates_pair_at_zero(spark):
    docs = _para_docs(spark, [(1, "same"), (2, "same")])
    got = D.fuzzy_match_pairs(docs, "text").collect()
    assert [(r["a"], r["b"], r["dist"]) for r in got] == [(1, 2, 0)]


def test_fuzzy_pairs_lossless_vs_brute_force(spark):
    import itertools

    vals = [
        "Customer#0041", "Customer#0042", "Customer#0043",
        "Customer#0142", "Customer#1042", "Customer#004",
        "Customer#00425", "Xustomer#0042", "Customer#9999",
    ]
    rows = list(enumerate(vals))
    docs = _para_docs(spark, rows)
    got = sorted(
        (r["a"], r["b"], r["dist"])
        for r in D.fuzzy_match_pairs(docs, "text").collect()
    )

    def lev(x, y):
        d = list(range(len(y) + 1))
        for i, cx in enumerate(x, 1):
            prev, d[0] = d[0], i
            for j, cy in enumerate(y, 1):
                prev, d[j] = d[j], min(
                    d[j] + 1, d[j - 1] + 1, prev + (cx != cy)
                )
        return d[len(y)]

    expect = sorted(
        (a, b, lev(va, vb))
        for (a, va), (b, vb) in itertools.combinations(rows, 2)
        if lev(va, vb) <= 1
    )
    assert got == expect


def test_fuzzy_pairs_rejects_unsupported_distance(spark):
    docs = _para_docs(spark, [(1, "x")])
    with pytest.raises(ValueError, match="max_dist"):
        D.fuzzy_match_pairs(docs, "text", max_dist=2)


# ------------------------------ deterministic Lloyd k-means (r8)


def test_lloyd_build_refines_and_probe_all_is_exact(spark, sf_dir):
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assigned, centroids = S.lloyd_build(emb, n_lists=4, iters=2)
    sampled_assigned, init = S.ivf_sampled_build(emb, n_lists=4)
    # the update actually moved the codebook off the sampled init
    assert centroids != init
    # probe-all reproduces brute-force cosine top-k exactly
    query = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    got = [
        (r["vec_id"], r["cos"])
        for r in S.ivf_topk(assigned, centroids, query, k=5, nprobe=4).collect()
    ]
    brute = [
        (r["vec_id"], r["cos"])
        for r in S.cosine_topk(emb, query, k=5).collect()
    ]
    assert got == brute


def test_lloyd_build_requires_enough_vectors(spark):
    import pytest as _pytest

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id bigint, embedding array<float>",
    )
    with _pytest.raises(ValueError, match="lloyd_build"):
        S.lloyd_build(emb, n_lists=5)


# ----------------------------------------------------- IVF-PQ (r8)


def test_ivfpq_codes_shape_and_probe(spark, sf_dir):
    from pagerank_mapreduce_spark.operators.similarity import (
        ivfpq_build,
        ivfpq_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    coded, centroids, codebook = ivfpq_build(
        emb, n_lists=4, n_sub=8, n_centroids=4
    )
    # codes: one int per subspace, all within the codebook
    row = coded.filter(F.col("vec_id") == 20).first()
    assert len(row["codes"]) == 8
    assert all(0 <= c < 4 for c in row["codes"])
    # the PQ codebook is sampled from residuals and must NOT be the
    # degenerate all-zero book (the coarse rows' own residuals)
    assert any(any(abs(x) > 0 for x in c) for s in codebook for c in s)
    query = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    out = ivfpq_topk(coded, centroids, codebook, query, k=7, nprobe=2).collect()
    assert len(out) == 7
    adcs = [r["adc"] for r in out]
    assert adcs == sorted(adcs) and all(a >= 0 for a in adcs)


def test_ivfpq_guards(spark):
    from pagerank_mapreduce_spark.operators.similarity import ivfpq_build

    emb = spark.createDataFrame(
        [(i, [float(i)] * 8) for i in range(6)],
        "vec_id bigint, embedding array<float>",
    )
    with pytest.raises(ValueError, match="ivfpq_build"):
        ivfpq_build(emb, n_lists=4, n_sub=8, n_centroids=4)
    with pytest.raises(ValueError, match="divisible"):
        ivfpq_build(emb.limit(6), n_lists=3, n_sub=3, n_centroids=3)


def test_ivf_kmeans_catalog_entry_carries_quality_verdict(spark, sf_dir):
    # the catalog entry must ship the quality cross-check columns
    # (recall vs exact brute force, agreement with the head-init
    # Lloyd twin) and the verdict must be TRUE. Round 14: the entry's
    # codebook is the spread-init deterministic Lloyd build and the
    # whole relation (metrics included) is hash-checked by
    # _ivf_kmeans_quality_oracle — this test remains the fast
    # in-suite pin of the verdict itself
    from pagerank_mapreduce_spark.queries import CATALOG

    rows = CATALOG["sim_ivf_kmeans_topk"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(r["quality_ok"] for r in rows)
    assert all(0.0 <= r["recall10"] <= 1.0 for r in rows)
    # the exact-topk flags must be consistent with the scalar recall
    assert sum(r["in_exact_topk"] for r in rows) == round(
        rows[0]["recall10"] * 10
    )


def test_int8_quantize_codes_and_roundtrip(spark):
    # hand-checked codes: max|v| = 2.54 -> scale 0.02; 1.27/0.02 =
    # 63.5 rounds half-AWAY-from-zero to 64 (the cross-engine rule);
    # zero vector -> scale 0, all-zero codes, no division blowup
    rows = [(0, [2.54, -1.27, 0.01]), (1, [0.0, 0.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r for r in S.int8_quantize(emb).collect()}
    assert got[0]["qvec"] == [127, -64, 1]
    assert abs(got[0]["scale"] - 0.02) < 1e-12
    assert got[1]["qvec"] == [0, 0, 0] and got[1]["scale"] == 0.0
    assert all(-127 <= q <= 127 for q in got[0]["qvec"])


def test_int8_topk_tracks_exact_topk(spark, sf_dir):
    from pagerank_mapreduce_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    query = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    rows = S.int8_topk(emb, query, k=10).collect()
    assert len(rows) == 10
    # the query's own vector must win with q_cos == cos == 1
    self_row = [r for r in rows if r["vec_id"] == 0][0]
    assert self_row["q_cos"] == 1.0 and self_row["cos"] == 1.0
    # int8 distortion on 64-dim unit-ish vectors is small: every
    # returned quantized cosine is within 0.05 of the exact one
    assert all(abs(r["q_cos"] - r["cos"]) < 0.05 for r in rows)
    # and recall vs exact top-10 clears a high floor (int8 is nearly
    # lossless at this dimensionality, unlike the coarse IVF probes)
    exact = {r["vec_id"] for r in S.cosine_topk(emb, query, k=10).collect()}
    assert len({r["vec_id"] for r in rows} & exact) >= 8


def test_dup_cluster_stats_census(spark):
    from pagerank_mapreduce_spark.operators.dedup import dup_cluster_stats

    docs = spark.createDataFrame(
        [
            (0, "alpha beta"), (1, "ALPHA   beta"),  # same fp (size 2)
            (2, "gamma"), (3, "gamma"), (4, "gamma"),  # size 3
            (5, "unique one"),  # size 1
        ],
        ["doc_id", "text"],
    )
    rows = {r["cluster_size"]: r for r in dup_cluster_stats(docs).collect()}
    assert rows[1]["n_clusters"] == 1 and rows[1]["dup_docs"] == 0
    assert rows[2]["n_clusters"] == 1 and rows[2]["dup_docs"] == 1
    assert rows[3]["n_clusters"] == 1 and rows[3]["dup_docs"] == 2
    # dup ratio = (1 + 2) removable / 6 docs = 0.5, on every row
    assert all(r["corpus_dup_ratio"] == 0.5 for r in rows.values())
    assert sum(r["n_docs"] for r in rows.values()) == 6


def test_leakproof_split_pins_clusters_to_one_side(spark):
    from pagerank_mapreduce_spark.operators.dedup import leakproof_split

    # many duplicate pairs -> the by-doc split must leak SOME cluster
    # (ids hash independently), the by-cluster split must leak none
    rows = [(i, f"dup text {i % 20}") for i in range(200)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = leakproof_split(docs).collect()
    by = {}
    for r in out:
        by.setdefault(r["method"], []).append(r)
    cl = by["by_cluster"]
    assert all(r["leaky_clusters"] == 0 for r in cl)
    assert sum(r["n_docs"] for r in cl) == 200
    assert sum(r["n_clusters"] for r in cl) == 20  # no straddling
    dd = by["by_doc"]
    assert dd[0]["leaky_clusters"] > 0  # 10-doc clusters straddle
    assert sum(r["n_docs"] for r in dd) == 200
    # straddling inflates the per-split cluster-appearance total
    assert sum(r["n_clusters"] for r in dd) > 20


def test_mmr_rerank_diversifies_near_duplicate_hits(spark):
    # two near-identical highly-relevant vectors + one moderately
    # relevant orthogonal-ish one: plain top-2 returns the twins, MMR
    # (lambda=0.5) must swap the second twin for the diverse vector
    from pagerank_mapreduce_spark.operators.similarity import (
        cosine_topk,
        mmr_rerank,
    )

    rows = [
        (0, [1.0, 0.0, 0.0]),      # query
        (1, [0.99, 0.14, 0.0]),    # hit A
        (2, [0.99, 0.141, 0.0]),   # hit A' (near-dup of A)
        (3, [0.7, 0.0, 0.7]),      # diverse, less relevant
        (4, [0.0, 1.0, 0.0]),      # irrelevant
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    plain = [
        r["vec_id"]
        for r in cosine_topk(emb.filter("vec_id <> 0"), [1.0, 0.0, 0.0], k=2)
        .collect()
    ]
    assert plain == [1, 2]  # the twins crowd the top
    mmr = mmr_rerank(
        emb, [1.0, 0.0, 0.0], k=2, n_candidates=4, lam=0.5,
        exclude_ids=(0,),
    ).collect()
    assert [r["vec_id"] for r in mmr] == [1, 3]
    assert [r["rank"] for r in mmr] == [1, 2]
    # first pick's mmr = lambda * rel (empty selected set)
    assert abs(mmr[0]["mmr"] - 0.5 * 0.990148) < 1e-5


def test_keep_best_elects_highest_quality_duplicate(spark):
    # same normalized text, different quality: keep_best elects the
    # highest score (ties -> lowest id), exact_dedup the lowest id —
    # the two keep-policies must agree on the group structure and
    # differ only in the representative
    from pyspark.sql import functions as F

    from pagerank_mapreduce_spark.operators.dedup import (
        exact_dedup,
        keep_best,
    )

    rows = [
        (1, "Hello  World", 12),   # normalizes equal to 2 and 3
        (2, "hello world", 11),
        (3, "HELLO WORLD ", 30),   # best quality -> the winner
        (4, "something else", 5),
        (5, "another doc", 7),
        (6, "another  DOC", 7),    # tie on score -> lowest id (5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, q long")
    best = {r["fp"]: (r["doc_id"], r["score"])
            for r in keep_best(df, "q").collect()}
    low = {r["fp"]: r["doc_id"] for r in exact_dedup(df).collect()}
    assert set(best) == set(low) and len(best) == 3
    hello_fp = [fp for fp, (d, _) in best.items() if d == 3]
    assert len(hello_fp) == 1          # quality won over id
    assert low[hello_fp[0]] == 1       # min-id policy picks 1
    another = [v for v in best.values() if v[0] in (5, 6)]
    assert another == [(5, 7)]         # score tie -> lowest id


def test_containment_is_directional_and_detects_inclusion(spark):
    # doc 2 is a strict prefix of doc 1: every shingle of doc 2
    # appears in doc 1, so C(2->1) = 1.0 while C(1->2) < 1 (and below
    # the threshold here) -- the asymmetry Jaccard cannot express
    from pagerank_mapreduce_spark.operators.dedup import (
        containment_pairs,
    )

    long = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    short = "alpha beta gamma delta epsilon"
    other = "one two three four five six seven"
    df = spark.createDataFrame(
        [(1, long), (2, short), (3, other)], "doc_id long, text string"
    )
    got = {
        (r.a, r.b): r.containment
        for r in containment_pairs(df, threshold=0.7, max_df=10).collect()
    }
    assert got == {(2, 1): 1.0}
    # lower threshold surfaces the reverse direction too: doc 1 has 8
    # shingles, 3 of them inside doc 2 -> C(1->2) = 0.375
    got_lo = {
        (r.a, r.b): r.containment
        for r in containment_pairs(
            df, threshold=0.3, max_df=10
        ).collect()
    }
    assert got_lo[(1, 2)] == 0.375 and got_lo[(2, 1)] == 1.0
    assert (3, 1) not in got_lo and (1, 3) not in got_lo
