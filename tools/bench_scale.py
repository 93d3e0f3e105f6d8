"""Scale-tier benchmark: the heaviest DATA-SIZED catalog entries on
the 10x fixture (`.scale/sf1`, built by tools/make_scale_fixture.py)
— the round-14 evidence tier the r13 verdict mandated (item 1): at
sf0.1 nearly every bench entry is per-job fixed-overhead bound
(8-core total == 32-core total), so shuffle/parallelism wins and
regressions are invisible to the driver's sf0.1 artifact. This tier
makes them measurable without touching the driver's bench contract
(`bench.py` is unchanged).

Scope: entries whose inputs are the documents/embeddings tables the
scale fixture replicates (text/dedup/sim/mm families, plus the
data-sized loop twins text_textrank_phrases and
text_word_communities). TPC-H- and fixture-graph-derived entries
(rel_*/graph_*) are excluded: their graph is pinned to the
N_GRAPH=1000 vertex space (a query constant), so a 10x input only
densifies multi-edges instead of scaling the computation.

Methodology matches bench.py's timed region exactly: noop sink,
min-of-N reps (default 2, every rep recorded), sf0.001 warm-up,
host-health canary on the artifact. Core count comes from
$SPARK_GRAFT_CPUS, the fixture from $SPARK_GRAFT_SF_DIR (default
.scale/sf1).

Usage:
    python tools/make_scale_fixture.py            # once, ~25 MB
    SPARK_GRAFT_CPUS=32 python tools/bench_scale.py
    SPARK_GRAFT_CPUS=8  python tools/bench_scale.py
Output: one JSON line per run; commit the two runs as
BENCH_r<N>_sf1_local.json {"cpus32": ..., "cpus8": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import canary_py, canary_jvm  # noqa: E402
from pagerank_mapreduce_spark.queries import CATALOG  # noqa: E402
from pagerank_mapreduce_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get(
    "SPARK_GRAFT_SF_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".scale", "sf1"),
)

SCALE_QUERIES = [
    # loop twins (weighted pagerank / multi-level louvain over the
    # document-derived co-occurrence graph — data-sized level 1)
    "text_textrank_phrases",
    "text_word_communities",
    # dedup candidate generators (dedup_fuzzy_pairs is excluded: it
    # reads the TPC-H customer table, which the scale fixture does
    # not replicate)
    "dedup_span_coverage",
    "dedup_minhash_pairs",
    "dedup_incremental",
    "dedup_paragraphs",
    "dedup_containment",
    # similarity trainers + probes (N/k-constant caveat: the catalog
    # entries pin n_lists/n_centroids = 8, a query constant, so the
    # trainer aggregates scale linearly in N while list sizes grow —
    # recall at 10x is measured separately in SCALE.md)
    "sim_pq_spread_topk",
    "sim_pq_lloyd_topk",
    "sim_ivfpq_lloyd_topk",
    "sim_ivf_cosine_topk",
    "sim_ivf_int8_topk",
    "sim_ivf_knn_join",
    "sim_semdedup",
    "sim_hybrid_fusion",
    # multimodal decode + probe pairs
    "mm_ahash_probe_pairs",
    "mm_ahash_near_dups",
    # text kernels
    "text_bpe_train",
    "text_bpe_pack",
    "text_dsir_weights",
    "text_lm_score",
    "text_decontaminate",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    if not os.path.isdir(SF_DIR):
        raise SystemExit(
            f"scale fixture missing at {SF_DIR}; run "
            "tools/make_scale_fixture.py first"
        )
    c_before = canary_py()
    spark = get_spark(app_name="pagerank-mapreduce-spark-bench-scale")
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for wq in ("dedup_minhash_pairs", "sim_pq_lloyd_topk",
                   "text_textrank_phrases", "mm_ahash_near_dups"):
            try:
                materialize(CATALOG[wq].fn(spark, warm_dir))
            except Exception:
                pass
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name in SCALE_QUERIES:
        spark.sparkContext.setJobDescription(f"bench_scale: {name}")
        rr = []
        for _ in range(reps):
            t0 = time.monotonic()
            materialize(CATALOG[name].fn(spark, SF_DIR))
            rr.append(round(time.monotonic() - t0, 3))
        runs[name] = rr
        timings[name] = min(rr)
        print(f"# {name}: {rr}", file=sys.stderr, flush=True)
    spark.sparkContext.setJobDescription(None)
    c_after = canary_py()
    jvm_ms = canary_jvm(spark)
    worst = c_before if c_before["py"] >= c_after["py"] else c_after
    doc = {
        "metric": "scale_tier_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "runs": runs,
        "sf_dir": SF_DIR,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", ""),
        "canary": {
            "py": c_before["py"],
            "py2": c_after["py"],
            "spin": worst["spin"],
            "jvm": jvm_ms,
            "regime": worst["regime"],
        },
    }
    print(json.dumps(doc, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
