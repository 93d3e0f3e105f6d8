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
