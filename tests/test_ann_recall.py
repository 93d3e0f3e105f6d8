"""ANN recall regression gate (round 12, r11 verdict item 3).

The round-11 scorecard (tools/ann_recall.py, SCALE.md) found learned
KMeans collapsing to recall@10 = 0.21 on the 10x fixture with a
fixed-size codebook — exactly the class of silent quality regression
neither the bench wall nor the DuckDB oracle can see (an IVF probe
with a bad codebook is still oracle-exact: the oracle replays the
same bad codebook). This test makes codebook recall a SUITE gate:
each build path must clear a measured floor at sf0.001, so a change
to assignment, probe ranking, tie-breaks, or the builds themselves
fails CI instead of silently shipping a worse index.

Floors are set from the round-12 measurement at sf0.001 (n = 500,
n_lists = 8, 12 evenly-spread queries, nprobe = 4):

    sampled 0.683 / lloyd-2 0.775 / spark-ml kmeans 0.825

with an absolute margin below each (builds and queries are fully
deterministic on the fixed fixture — KMeans is seeded — so the
margin absorbs code-change noise, not run-to-run noise). Thresholds
recorded in SCALE.md round-12 section.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pagerank_mapreduce_spark.operators import similarity as S

K = 10
NQ = 12
N_LISTS = 8

# (label, build fn, recall@10 floor at nprobe=4)
_PATHS = [
    ("sampled", lambda e: S.ivf_sampled_build(e, n_lists=N_LISTS), 0.60),
    ("lloyd2", lambda e: S.lloyd_build(e, n_lists=N_LISTS, iters=2), 0.70),
    # rank-spread init measures 0.867 here vs head's 0.775 — better
    # even without id-geometry correlation (round 12)
    ("lloyd2-spread",
     lambda e: S.lloyd_build(e, n_lists=N_LISTS, iters=2, init="spread"),
     0.78),
    ("kmeans", lambda e: S.ivf_build(e, n_lists=N_LISTS), 0.70),
]


@pytest.fixture(scope="module")
def recall_setup(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").localCheckpoint()
    ids = [r["vec_id"] for r in emb.select("vec_id").orderBy("vec_id").collect()]
    n = len(ids)
    # evenly spread across the id space — NOT the first ids, which
    # ARE the sampled/lloyd codebook init
    qids = [ids[(i * n) // NQ] for i in range(NQ)]
    qvecs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    }
    exact = {
        qid: {
            r["vec_id"]
            for r in S.cosine_topk(emb, list(v), k=K).collect()
        }
        for qid, v in qvecs.items()
    }
    return emb, qvecs, exact


@pytest.mark.parametrize("label,build,floor", _PATHS,
                         ids=[p[0] for p in _PATHS])
def test_codebook_recall_floor(recall_setup, label, build, floor):
    emb, qvecs, exact = recall_setup
    assigned, centroids = build(emb)
    assigned = assigned.localCheckpoint()
    r = S.ivf_recall_at_k(
        emb, assigned, centroids, qvecs, k=K, nprobe=4, exact=exact
    )
    assert r >= floor, (
        f"{label} codebook recall@10 regressed: {r:.3f} < floor {floor} "
        "(see SCALE.md round-12 recall gate)"
    )


def test_quantized_paths_recall_floors(recall_setup):
    # the compression paths, at the CATALOG entries' own settings.
    # Round-12 measured values at sf0.001 (floors in parens):
    #   int8            0.992 (>= 0.95) — near-exact by design: the
    #                   per-vector scales cancel out of cosine
    #   pq n_cent=8     0.242 (>= 0.15) — sampled (not learned)
    #                   codebook; knob responds: 0.267 @ 32, 0.300 @ 64
    #   ivfpq np=2      0.167 (>= 0.10) — residual-PQ ADC on top of
    #                   the coarse quantizer; 0.333 @ n_cent=64 np=8
    #   lsh hamming<=1  0.183 (>= 0.10) — 0.475 @ hamming<=2
    # These are REGRESSION floors, not quality certificates: the
    # sampled-codebook quantizers trade recall for SQL-replayability
    # and the measured numbers say exactly how much (SCALE.md
    # round-12). A code change pushing any path below its floor
    # fails here.
    emb, qvecs, exact = recall_setup
    coded_pq, cb = S.pq_build(emb)
    coded_pq = coded_pq.localCheckpoint()
    r_pq = S.topk_recall_at_k(
        emb, lambda qv, k: S.pq_topk(coded_pq, cb, qv, k=k),
        qvecs, k=K, exact=exact,
    )
    assert r_pq >= 0.15, r_pq
    coded_ip, cents, cb2 = S.ivfpq_build(emb)
    coded_ip = coded_ip.localCheckpoint()
    r_ip = S.topk_recall_at_k(
        emb,
        lambda qv, k: S.ivfpq_topk(coded_ip, cents, cb2, qv, k=k, nprobe=2),
        qvecs, k=K, exact=exact,
    )
    assert r_ip >= 0.10, r_ip
    r_i8 = S.topk_recall_at_k(
        emb, lambda qv, k: S.int8_topk(emb, qv, k=k),
        qvecs, k=K, exact=exact,
    )
    assert r_i8 >= 0.95, r_i8
    dim = len(next(iter(qvecs.values())))
    bucketed = S.lsh_bucketize(emb, dim).localCheckpoint()
    r_lsh = S.topk_recall_at_k(
        emb, lambda qv, k: S.lsh_topk(bucketed, qv, k=k, probe_hamming=1),
        qvecs, k=K, exact=exact,
    )
    assert r_lsh >= 0.10, r_lsh
    # IVF+SQ8 (round 12): int8 scoring on the probed lists loses
    # (almost) nothing vs float scoring — measured 0.683 here, equal
    # to the float sampled-IVF row, and 0.858 on spread-Lloyd vs its
    # float 0.867. Floors track the float paths' floors.
    assigned, cents = S.ivf_sampled_build(emb, n_lists=N_LISTS)
    assigned = assigned.localCheckpoint()
    r_i = S.topk_recall_at_k(
        emb,
        lambda qv, k: S.ivf_int8_topk(assigned, cents, qv, k=k, nprobe=4),
        qvecs, k=K, exact=exact,
    )
    assert r_i >= 0.60, r_i


def test_pq_lloyd_refines_distortion_and_holds_recall(recall_setup):
    # the learned (per-subspace Lloyd) PQ codebook must strictly
    # reduce quantization distortion vs the sampled init — that is
    # WHAT Lloyd optimizes, and on this fixture it's the honest
    # quality metric (recall@10 here is centroid-count-bound:
    # measured 0.242 sampled vs 0.267 lloyd-2, while distortion
    # drops 0.958 -> 0.694, −28%). Recall floor rides along.
    from pagerank_mapreduce_spark.operators.similarity import (
        matrix_lit,
        sqdist,
    )

    emb, qvecs, exact = recall_setup

    def distortion(coded, cb):
        n_sub, sd = len(cb), len(cb[0][0])
        v = F.col("embedding").cast("array<double>")
        err = None
        for s in range(n_sub):
            sl = F.slice(v, s * sd + 1, sd)
            term = F.element_at(
                F.transform(matrix_lit(cb[s]), lambda c: sqdist(sl, c)),
                F.col("codes")[s] + 1,
            )
            err = term if err is None else err + term
        return coded.agg(F.avg(err)).first()[0]

    coded0, cb0 = S.pq_build(emb)
    coded2, cb2 = S.pq_lloyd_build(emb, iters=2)
    d0, d2 = distortion(coded0, cb0), distortion(coded2, cb2)
    assert d2 < d0 * 0.9, (d0, d2)
    coded2 = coded2.localCheckpoint()
    r = S.topk_recall_at_k(
        emb, lambda qv, k: S.pq_topk(coded2, cb2, qv, k=k),
        qvecs, k=K, exact=exact,
    )
    assert r >= 0.15, r


def test_ivfpq_lloyd_beats_sampled_on_both_metrics(recall_setup):
    # the fully-learned IVF-PQ must beat the sampled build on BOTH
    # residual distortion and recall — measured at sf0.001:
    # distortion 1.380 -> 0.646 (-53%), recall@10 (nprobe=2)
    # 0.167 -> 0.275. Unlike flat PQ, residual codebooks have signal
    # to learn, so recall moves too; floors leave code-change margin.
    from pagerank_mapreduce_spark.operators.similarity import (
        matrix_lit,
        sqdist,
    )

    emb, qvecs, exact = recall_setup

    def resid_distortion(coded, cents, cb):
        n_sub, sd = len(cb), len(cb[0][0])
        v = F.col("embedding").cast("array<double>")
        cvec = F.element_at(matrix_lit(cents), F.col("list_id") + 1)
        rv = F.zip_with(v, cvec, lambda x, y: x - y)
        err = None
        for s in range(n_sub):
            sl = F.slice(rv, s * sd + 1, sd)
            term = F.element_at(
                F.transform(matrix_lit(cb[s]), lambda c: sqdist(sl, c)),
                F.col("codes")[s] + 1,
            )
            err = term if err is None else err + term
        return coded.agg(F.avg(err)).first()[0]

    c0, ct0, cb0 = S.ivfpq_build(emb)
    c1, ct1, cb1 = S.ivfpq_lloyd_build(emb)
    d0 = resid_distortion(c0, ct0, cb0)
    d1 = resid_distortion(c1, ct1, cb1)
    assert d1 < d0 * 0.7, (d0, d1)
    c1 = c1.localCheckpoint()
    r = S.topk_recall_at_k(
        emb,
        lambda qv, k: S.ivfpq_topk(c1, ct1, cb1, qv, k=k, nprobe=2),
        qvecs, k=K, exact=exact,
    )
    assert r >= 0.20, r
    # rank-spread init on BOTH codebooks (coarse + residual samples)
    # measures 0.333 here vs head's 0.275 (round 12); floor with
    # margin
    c2, ct2, cb2 = S.ivfpq_lloyd_build(emb, init="spread")
    c2 = c2.localCheckpoint()
    r2 = S.topk_recall_at_k(
        emb,
        lambda qv, k: S.ivfpq_topk(c2, ct2, cb2, qv, k=k, nprobe=2),
        qvecs, k=K, exact=exact,
    )
    assert r2 >= 0.25, r2


def test_full_probe_is_exact(recall_setup):
    # the recall invariant: nprobe == n_lists scans every list, so
    # the probe IS brute force — recall exactly 1.0 (any miss means
    # the probe path itself, not the codebook, is broken)
    emb, qvecs, exact = recall_setup
    assigned, centroids = S.ivf_sampled_build(emb, n_lists=N_LISTS)
    assigned = assigned.localCheckpoint()
    r = S.ivf_recall_at_k(
        emb, assigned, centroids, qvecs, k=K, nprobe=N_LISTS, exact=exact
    )
    assert r == 1.0, r


# ------------------------------------------ spread init (round 12)


def _clustered_emb(spark):
    # 4 clusters at distinct corners of an 8-dim cube, ids GROUPED by
    # cluster (id // 25 = cluster) — the id-geometry correlation that
    # breaks head init: ids 0..3 (the head sample) all sit in cluster
    # 0, so neither Lloyd nor the encode ever sees the other three.
    corners = [
        [10.0, 10, 10, 10, 0, 0, 0, 0],
        [0.0, 0, 0, 0, 10, 10, 10, 10],
        [10.0, 0, 10, 0, 10, 0, 10, 0],
        [0.0, 10, 0, 10, 0, 10, 0, 10],
    ]
    rows = []
    for vid in range(100):
        c = corners[vid // 25]
        # deterministic sub-unit jitter so vectors are distinct
        rows.append((vid, [x + ((vid * 7 + d) % 10) / 20.0
                           for d, x in enumerate(c)]))
    return spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")


def test_spread_sample_dense_and_strided(spark):
    emb = _clustered_emb(spark)
    picked = [r["vec_id"] for r in S.spread_sample(emb, 4)]
    assert picked == [0, 25, 50, 75]
    # uniformly strided ids: same spread (bucket math is id-domain)
    strided = emb.withColumn("vec_id", F.col("vec_id") * 10)
    picked = [r["vec_id"] for r in S.spread_sample(strided, 4)]
    assert picked == [0, 250, 500, 750]


def test_spread_sample_gappy_ids_rank_spread(spark):
    # rank spread, NOT id-domain spread: a far id outlier (the 10x
    # fixture strides copies by 10M) must not empty the selection —
    # picks are the first rank of each of n equal rank-groups,
    # ceil(i*N/n): N=51 -> ranks {0,13,26,39} -> those ids
    emb = _clustered_emb(spark)
    gappy = emb.filter((F.col("vec_id") < 50) | (F.col("vec_id") == 99))
    gappy = gappy.withColumn(
        "vec_id",
        F.when(F.col("vec_id") == 99, F.lit(1000)).otherwise(F.col("vec_id")),
    )
    picked = [r["vec_id"] for r in S.spread_sample(gappy, 4)]
    assert picked == [0, 13, 26, 39]
    # only N < n is unsatisfiable
    with pytest.raises(ValueError, match="rows"):
        S.spread_sample(emb.limit(2), 4)


def test_spread_init_escapes_id_geometry_correlation(spark):
    # THE promoted scorecard finding as a deterministic unit test:
    # on the clustered fixture, head init's PQ distortion is cluster-
    # diameter-scale (every centroid in cluster 0), spread init's is
    # jitter-scale — an order of magnitude apart, robust to margin.
    from pagerank_mapreduce_spark.operators.similarity import (
        matrix_lit,
        sqdist,
    )

    emb = _clustered_emb(spark).localCheckpoint()

    def distortion(coded, cb):
        n_sub, sd = len(cb), len(cb[0][0])
        v = F.col("embedding").cast("array<double>")
        err = None
        for s in range(n_sub):
            sl = F.slice(v, s * sd + 1, sd)
            term = F.element_at(
                F.transform(matrix_lit(cb[s]), lambda c: sqdist(sl, c)),
                F.col("codes")[s] + 1,
            )
            err = term if err is None else err + term
        return coded.agg(F.avg(err)).first()[0]

    kw = dict(n_sub=2, n_centroids=4, iters=2)
    coded_h, cb_h = S.pq_lloyd_build(emb, **kw)
    coded_s, cb_s = S.pq_lloyd_build(emb, init="spread", **kw)
    d_h, d_s = distortion(coded_h, cb_h), distortion(coded_s, cb_s)
    assert d_s < d_h * 0.5, (d_h, d_s)
    # same story for the IVF coarse quantizer: spread-init Lloyd
    # centroids land one per cluster, so every assignment is local
    _, cents = S.lloyd_build(emb, n_lists=4, iters=2, init="spread")
    owners = {min(range(4), key=lambda c: sum(
        (cents[c][d] - corner[d]) ** 2 for d in range(8)))
        for corner in ([10.0, 10, 10, 10, 0, 0, 0, 0],
                       [0.0, 0, 0, 0, 10, 10, 10, 10],
                       [10.0, 0, 10, 0, 10, 0, 10, 0],
                       [0.0, 10, 0, 10, 0, 10, 0, 10])}
    assert len(owners) == 4, cents


def test_ivf_knn_join_full_probe_matches_brute(recall_setup):
    # batch-join analogue of test_full_probe_is_exact: with nprobe ==
    # n_lists every list is probed, so the pruned join IS the brute
    # join — per-query results must match exactly (ids AND order).
    # Also pins the scale plan: the probe-pairs side broadcasts; the
    # corpus side never sort-merge-joins.
    from pagerank_mapreduce_spark.plans.audit import join_strategies

    emb, qvecs, exact = recall_setup
    assigned, cents = S.ivf_sampled_build(emb, n_lists=N_LISTS)
    assigned = assigned.localCheckpoint()
    qids = sorted(qvecs)[:3]
    q = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    out = S.ivf_knn_join(assigned, cents, q, k=5, nprobe=N_LISTS)
    strat = join_strategies(out)
    assert strat.get("BroadcastHashJoin", 0) >= 1, strat
    assert strat.get("SortMergeJoin", 0) == 0, strat
    # re-derive per-query rank from the row VALUES, not collect()
    # order — Spark does not guarantee the window's intra-partition
    # sort survives to collect (round-13 ADVICE fix). (cos desc, nid)
    # is exactly the window's ordering, so this is the same ranking.
    got = {}
    for r in sorted(
        out.collect(), key=lambda r: (r["qid"], -r["cos"], r["nid"])
    ):
        got.setdefault(r["qid"], []).append(r["nid"])
    for qid in qids:
        brute = [
            r["vec_id"]
            for r in S.cosine_topk(
                emb.filter(F.col("vec_id") != qid), list(qvecs[qid]), k=5
            ).collect()
        ]
        assert got[qid] == brute, (qid, got[qid], brute)


def test_ivf_knn_join_shuffle_and_pruned_modes(recall_setup, tmp_path):
    # round-13 de-risk of the batch join at self-join scale: the
    # broadcast hint is gated (auto falls back to a shuffled list_id
    # join past max_broadcast_pairs), and prune_scan turns the probed
    # -list union into a PartitionFilters entry on a partitioned
    # index layout. Every mode must be row-identical to the forced-
    # broadcast baseline.
    from pagerank_mapreduce_spark.sources.partitioned import (
        read_partitioned,
        scan_is_pruned,
        write_partitioned,
    )

    emb, qvecs, exact = recall_setup
    assigned, cents = S.ivf_sampled_build(emb, n_lists=N_LISTS)
    assigned = assigned.localCheckpoint()
    qids = sorted(qvecs)[:3]
    q = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )

    def rows(df):
        return sorted(
            (r["qid"], r["nid"], r["cos"]) for r in df.collect()
        )

    base = rows(
        S.ivf_knn_join(assigned, cents, q, k=5, nprobe=2, broadcast=True)
    )
    # forced shuffle fallback: identical result (AQE may or may not
    # re-upgrade the join — only the VALUES are contractual here)
    assert rows(
        S.ivf_knn_join(assigned, cents, q, k=5, nprobe=2, broadcast=False)
    ) == base
    # auto mode with a 1-pair budget must take the fallback branch
    # (and still match); with the default budget it must broadcast
    assert rows(
        S.ivf_knn_join(
            assigned, cents, q, k=5, nprobe=2, max_broadcast_pairs=1
        )
    ) == base
    from pagerank_mapreduce_spark.plans.audit import join_strategies

    auto = S.ivf_knn_join(assigned, cents, q, k=5, nprobe=2)
    assert join_strategies(auto).get("BroadcastHashJoin", 0) >= 1
    assert rows(auto) == base
    # partitioned-by-list index + prune_scan: the probed-list union
    # lands in PartitionFilters (directory pruning), rows unchanged
    spark = emb.sparkSession
    path = str(tmp_path / "ivf_index")
    write_partitioned(assigned, path, "list_id")
    idx = read_partitioned(spark, path)
    pruned = S.ivf_knn_join(
        idx, cents, q, k=5, nprobe=2, prune_scan=True
    )
    assert scan_is_pruned(pruned)
    assert rows(pruned) == base
