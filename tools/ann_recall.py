"""ANN recall scorecard (round 11, r10 verdict item 6): measure
recall@k vs exact brute-force for the three IVF codebook paths —
sampled (no refinement, fully SQL-replayable), deterministic
fixed-iteration Lloyd (SQL-replayable refinement), and Spark-ML
KMeans (the quality path; learned, rows-only) — so the
determinism/quality trade is MEASURED, not asserted.

Method: build each index once over the fixture embeddings
(n_lists scaled to the fixture), then probe NQ=20 query
vectors drawn evenly across the id space (NOT the first ids — those
ARE the sampled codebook) at nprobe=2 and nprobe=4; recall@10 = mean
over queries of |ANN top-10 ∩ exact top-10| / 10. Build and probe
walls are reported separately (builds amortize over queries).

Usage: python tools/ann_recall.py [fixture_dir] [n_lists]
Default fixture: <repo>/.scale/sf1 (the 10x decade fixture) with
n_lists=32 — the codebook SCALES with the data (the scale fixture is
10 translated copies of sf0.1, so the catalog entries' n_lists=8
cannot cover 10 disjoint regions and any recall number at that
setting measures fixture geometry, not codebook quality; the
SemDeDup N/k-constant regime from tools/make_scale_fixture.py).
Prints one markdown table ready for SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from pagerank_mapreduce_spark.operators import similarity as S
from pagerank_mapreduce_spark.session import get_spark

K = 10
NQ = 20


def main() -> None:
    fixture = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale",
        "sf1",
    )
    n_lists = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark(app_name="ann-recall")
    emb = spark.read.parquet(f"{fixture}/embeddings.parquet")
    all_ids = [
        r["vec_id"] for r in emb.select("vec_id").orderBy("vec_id").collect()
    ]
    n = len(all_ids)
    # NQ ids spread evenly across the PRESENT id space (the scale
    # fixtures stride vec_id per copy, so arithmetic ids don't exist)
    qids = [all_ids[(i * n) // NQ] for i in range(NQ)]
    qvecs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    }
    qids = sorted(qvecs)

    exact = {}
    t0 = time.monotonic()
    for qid in qids:
        exact[qid] = {
            r["vec_id"]
            for r in S.cosine_topk(emb, qvecs[qid], k=K).collect()
        }
    exact_wall = time.monotonic() - t0

    # (build fn, probe metric): "cosine" rows train SPHERICAL Lloyd
    # (round 13 — unit-normalized vectors, re-normalized centroids)
    # and probe with the normalized query, so list ranking matches
    # the cosine geometry the candidates are scored in — the fix for
    # the r12 finding that L2-trained codebooks probe badly against
    # cosine ground truth on the geometry-correlated 10x fixture.
    builds = {
        "ivf_sampled (SQL-replayable)": (
            lambda: S.ivf_sampled_build(
                emb, n_lists=n_lists, assignment="vectorized"
            ),
            "l2",
        ),
        "lloyd iters=2 (SQL-replayable)": (
            lambda: S.lloyd_build(
                emb, n_lists=n_lists, iters=2, assignment="vectorized"
            ),
            "l2",
        ),
        "lloyd iters=2 SPREAD init": (
            lambda: S.lloyd_build(
                emb, n_lists=n_lists, iters=2, assignment="vectorized",
                init="spread",
            ),
            "l2",
        ),
        "SPHERICAL lloyd-2 (cosine)": (
            lambda: S.lloyd_build(
                emb, n_lists=n_lists, iters=2, assignment="vectorized",
                metric="cosine",
            ),
            "cosine",
        ),
        "SPHERICAL lloyd-2 SPREAD init": (
            lambda: S.lloyd_build(
                emb, n_lists=n_lists, iters=2, assignment="vectorized",
                init="spread", metric="cosine",
            ),
            "cosine",
        ),
        "spark-ml kmeans (learned)": (
            lambda: S.ivf_build(emb, n_lists=n_lists),
            "l2",
        ),
    }
    print(f"fixture={fixture} n={n} dim=64 k={K} queries={len(qids)} "
          f"n_lists={n_lists}; exact scan x{len(qids)}: "
          f"{exact_wall:.2f}s")
    # `top4 %` = share of rows in the 4 largest lists: an unbalanced
    # codebook (head init on id-geometry-correlated data piles whole
    # regions into few lists) makes nprobe=4 an accidental near-full
    # scan — its high recall is paid for in scanned rows, which is
    # why recall must be read WITH balance, never alone.
    print("| codebook path | build s | top4 % | nprobe=2 recall@10 "
          "| probe s | nprobe=4 recall@10 | probe s |")
    print("|---|---|---|---|---|---|---|")
    for name, (build, metric) in builds.items():
        t0 = time.monotonic()
        assigned, centroids = build()
        assigned = assigned.localCheckpoint()  # index materialized once
        build_wall = time.monotonic() - t0
        sizes = sorted(
            (r["count"] for r in
             assigned.groupBy("list_id").count().collect()),
            reverse=True,
        )
        top4 = 100.0 * sum(sizes[:4]) / max(1, sum(sizes))
        cells = []
        for nprobe in (2, 4):
            t0 = time.monotonic()
            recall = S.ivf_recall_at_k(
                emb, assigned, centroids, qvecs, k=K, nprobe=nprobe,
                exact=exact, metric=metric,
            )
            probe_wall = time.monotonic() - t0
            cells.append(f"{recall:.3f} | {probe_wall:.2f}")
        print(f"| {name} | {build_wall:.2f} | {top4:.1f} | {cells[0]} "
              f"| {cells[1]} |")

    # PQ-family compression paths (the round-12 scorecard section,
    # now committed: head vs SPREAD init side by side). n_centroids
    # scales with the fixture like n_lists does.
    n_cent = n_lists
    pq_paths = {
        "pq lloyd-2 head init": lambda: S.pq_lloyd_build(
            emb, n_centroids=n_cent, iters=2
        ),
        "pq lloyd-2 SPREAD init": lambda: S.pq_lloyd_build(
            emb, n_centroids=n_cent, iters=2, init="spread"
        ),
    }
    print("| pq path | build s | recall@10 | probe s |")
    print("|---|---|---|---|")
    for name, build in pq_paths.items():
        t0 = time.monotonic()
        coded, cb = build()
        coded = coded.localCheckpoint()
        build_wall = time.monotonic() - t0
        t0 = time.monotonic()
        r = S.topk_recall_at_k(
            emb, lambda qv, k: S.pq_topk(coded, cb, qv, k=k),
            qvecs, k=K, exact=exact,
        )
        probe_wall = time.monotonic() - t0
        print(f"| {name} | {build_wall:.2f} | {r:.3f} | {probe_wall:.2f} |")
    for name, init in (
        ("ivfpq lloyd head init, np=4", "head"),
        ("ivfpq lloyd SPREAD init, np=4", "spread"),
    ):
        t0 = time.monotonic()
        coded, cents, cb = S.ivfpq_lloyd_build(
            emb, n_lists=n_lists, n_centroids=n_cent, init=init
        )
        coded = coded.localCheckpoint()
        build_wall = time.monotonic() - t0
        t0 = time.monotonic()
        r = S.topk_recall_at_k(
            emb,
            lambda qv, k: S.ivfpq_topk(coded, cents, cb, qv, k=k, nprobe=4),
            qvecs, k=K, exact=exact,
        )
        probe_wall = time.monotonic() - t0
        print(f"| {name} | {build_wall:.2f} | {r:.3f} | {probe_wall:.2f} |")
    t0 = time.monotonic()
    r = S.topk_recall_at_k(
        emb, lambda qv, k: S.int8_topk(emb, qv, k=k),
        qvecs, k=K, exact=exact,
    )
    print(f"| int8 symmetric | — | {r:.3f} | {time.monotonic() - t0:.2f} |")
    # IVF+SQ8: int8's recall at a fraction of its scan — the
    # composition the two standalone rows above argue for
    for name, build in (
        ("ivf(head)+int8, np=4", lambda: S.ivf_sampled_build(
            emb, n_lists=n_lists, assignment="vectorized")),
        ("ivf(SPREAD lloyd)+int8, np=4", lambda: S.lloyd_build(
            emb, n_lists=n_lists, iters=2, assignment="vectorized",
            init="spread")),
    ):
        t0 = time.monotonic()
        assigned, cents = build()
        assigned = assigned.localCheckpoint()
        build_wall = time.monotonic() - t0
        t0 = time.monotonic()
        r = S.topk_recall_at_k(
            emb,
            lambda qv, k: S.ivf_int8_topk(assigned, cents, qv, k=k, nprobe=4),
            qvecs, k=K, exact=exact,
        )
        probe_wall = time.monotonic() - t0
        print(f"| {name} | {build_wall:.2f} | {r:.3f} | {probe_wall:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
