"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints per-run detail as an earlier JSON line, then ONE compact final
JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>,
   "geo_cmp": {"vs": ..., "n": ..., "ratio": ...}}

The FINAL line is kept under 1900 chars (compact separators, per-run
arrays moved to the detail line) because the driver records only the
last 2000 chars of stdout and parses the bench JSON out of that tail
— round 9's committed artifact had `parsed: null` and a mid-line
truncation because `runs` pushed the single line past the capture
window (r9 verdict item 5). `geo_cmp` is the geometric-mean runtime
ratio over queries shared with the newest committed BENCH_r*_local.json,
so round-over-round drift stays machine-checkable as the headline set
grows (r9 verdict item 8).

Each query is materialized with the noop writer (full computation,
no driver collect). The flagship PageRank runs to convergence on the
fixture-derived graph — per-iteration time is the comparable number
vs BASELINE.md (the reference times its MapReduce phase; Spark's
fixed per-job overhead dominates at these scales, see BASELINE.md
"Interpretation").
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pagerank_mapreduce_spark.queries import CATALOG
from pagerank_mapreduce_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = [
    "pagerank",
    "graph_rev_adjacency",
    "rel_q1_pricing",
    "rel_q9_product_profit",
    "rel_q21_waiting_supplier",
    "rel_top_revenue_orders",
    "rel_sortmerge_join",
    "rel_window_moving",
    "mr_compress_wordcount",
    "dedup_exact",
    "dedup_minhash_pairs",
    "sim_cosine_topk",
    "stream_session",
    "graph_connected_components",
    "graph_triangles",
    "text_winnow_fingerprints",
    "ts_asof_last_purchase",
    # round-5 additions (new keys; the 17 above stay comparable
    # round-over-round)
    "graph_cc_star",
    "ts_asof_bucketed",
    "text_decontaminate",
    "text_pack_sequences",
    "ts_cdc_snapshot",
    # round-6 additions
    "text_tfidf_topk",
    "text_lm_score",
    "graph_kcore",
    "sim_pq_topk",
    "dedup_incremental",
    "ts_resample_hourly",
    # round-7 additions
    "sim_semdedup",
    "dedup_span_coverage",
    "ts_scd2_history",
    "ts_snapshot_diff",
    "graph_hits",
    "graph_walks",
    "text_nb_predict",
    "graph_node2vec",
    "rel_cms_user_counts",
    "graph_scc",
    # round-8 additions: the remaining round-7 sketch/layout/quality
    # entries, so regressions there stop being invisible
    "rel_bloom_prune",
    "rel_fm_distinct",
    "rel_zorder_values",
    "rel_expectations",
    "ts_interpolate_hourly",
    "ts_week_over_week",
    "mm_ahash_near_dups",
    "mm_ahash_probe_pairs",
    "text_tfidf_cosine_pairs",
    "dedup_paragraphs",
    "ml_roc_auc",
    "ml_spearman_corr",
    "graph_adamic_adar",
    "dedup_fuzzy_pairs",
    "sim_ivf_lloyd_topk",
    "sim_ivfpq_topk",
    # round-9 additions: scorer diagnostics, quantized ANN, dedup census
    "ml_ks_statistic",
    "ml_auc_by_source",
    "ml_calibration_bins",
    "sim_int8_topk",
    "dedup_cluster_stats",
    "text_split_leakproof",
    "ml_psi",
    "ml_bootstrap_ci",
    "stream_drift_psi",
    "graph_betweenness",
    "graph_harmonic",
    "ts_cusum_alerts",
    # round-10 additions
    "stream_drift_ks",
    "ml_average_precision",
    "text_dsir_weights",
    "ts_seasonal_decompose",
    "sim_mmr_rerank",
    "ts_ewma",
    "text_bpe_train",
    # round-10 continuation: hybrid retrieval, ranking quality,
    # link prediction, community detection, monitors, skyline
    "text_rrf_fusion",
    "ml_ndcg_by_source",
    "graph_link_scores",
    "graph_louvain_quality",
    "ts_holt",
    "ts_ohlc",
    "rel_skyline",
    "ml_gain_deciles",
    "sim_hybrid_fusion",
    "dedup_containment",
    "graph_core_numbers",
    "stream_ohlc",
    "ts_transitions",
    # round-11 additions: realistic-graph TextRank (the r10 verdict's
    # bench blind spot), scale-viable BPE paths, multi-level Louvain
    "text_textrank_phrases",
    "text_bpe_merges_local",
    "text_bpe_apply_chunked",
    "graph_louvain_full",
    # round-12 additions: k-independent tokenizer apply + the shipped
    # vocabulary table, pruned training
    "text_bpe_apply_rank_merge",
    "text_bpe_word_segments",
    "text_bpe_merges_pruned",
    "text_bpe_pack",
    "sim_pq_lloyd_topk",
    "sim_ivfpq_lloyd_topk",
    "ts_holt_winters",
    "stream_holt_winters",
    # round-12 continuation: spread-init learned PQ, IVF+SQ8,
    # IVF batch ANN join
    "sim_pq_spread_topk",
    "sim_ivf_int8_topk",
    "sim_ivf_knn_join",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    m = re.search(r"sf([\d.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    spark = get_spark(app_name="pagerank-mapreduce-spark-bench")
    # JVM/codegen warm-up on the tiniest fixture: exercise the parquet
    # reader, join, aggregate, window and checkpoint code paths once so
    # per-query timings measure steady-state execution, not first-use
    # classloading/JIT. (The reference's numbers likewise time only the
    # MapReduce phase, not process startup — BASELINE.md "Metric".)
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for wq in (
            "pagerank",
            "rel_q1_pricing",
            "rel_window_rank",
            "rel_top_revenue_orders",
            "dedup_minhash_pairs",
            "stream_session",
            "graph_triangles",
            "graph_connected_components",
            "ts_asof_last_purchase",
        ):
            try:
                materialize(CATALOG[wq].fn(spark, warm_dir))
            except Exception:
                pass
    else:
        spark.range(1000).count()

    # best-of-N per query (default 2): the min over repetitions is the
    # interference-robust wall-clock estimator — single-shot timings on
    # a shared host can vary 2× on GC/compaction noise with identical
    # plans. N=1 restores the old single-shot behavior.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name in BENCH_QUERIES:
        reps_here = []
        for _ in range(reps):
            t0 = time.monotonic()
            materialize(CATALOG[name].fn(spark, SF_DIR))
            reps_here.append(round(time.monotonic() - t0, 3))
        # the min is the interference-robust headline, but EVERY rep is
        # recorded so round-over-round comparisons can't be flattered
        # by selective minima across runs (r8 verdict item 8)
        runs[name] = reps_here
        timings[name] = min(reps_here)

    total = round(sum(timings.values()), 3)
    # per-run detail rides an EARLIER line: complete, but expendable
    # if the driver's 2000-char tail window cuts it
    print(json.dumps({"detail": "per_run", "runs": runs},
                     separators=(",", ":")))
    print(final_line(timings, total, sf))
    spark.stop()


def _prev_local(root: str) -> tuple[str, dict] | None:
    """The newest committed BENCH_r*_local.json's (tag, queries)."""
    import glob

    best = None
    for path in glob.glob(os.path.join(root, "BENCH_r*_local.json")):
        m = re.search(r"BENCH_r(\d+)_local\.json$", path)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), path)
    if best is None:
        return None
    try:
        with open(best[1]) as fh:
            prev = json.load(fh).get("queries", {})
    except (OSError, ValueError):
        return None
    return f"r{best[0]:02d}_local", prev


def geo_cmp(timings: dict[str, float], root: str) -> dict | None:
    """Geomean runtime ratio vs the newest committed BENCH_r*_local.json
    over the queries present in both (current/previous, <1 = faster) —
    computed over the FULL timing map, before any final-line rollup,
    so the comparable set never shrinks with line capacity."""
    import math

    pl = _prev_local(root)
    if pl is None:
        return None
    _, prev = pl
    shared = [
        q for q in timings
        if isinstance(prev.get(q), (int, float)) and prev[q] > 0
        and timings[q] > 0
    ]
    if not shared:
        return None
    lg = sum(math.log(timings[q] / prev[q]) for q in shared) / len(shared)
    return {"vs": pl[0], "n": len(shared),
            "ratio": round(math.exp(lg), 3)}


# the driver's 2000-char tail physically caps how many per-query
# names fit on one JSON line (~25 chars each at 1 decimal); past this
# count the FASTEST entries roll up into a `rest` summary on the
# driver-facing line — the committed BENCH_r*_local.json always
# carries the complete map, so nothing is lost from the record
MAX_FINAL_ENTRIES = 68


def final_line(
    timings: dict[str, float],
    total: float,
    sf: float,
    budget: int = 1900,
    root: str | None = None,
) -> str:
    """The one line the driver must be able to parse out of its
    2000-char stdout tail: compact separators; if the headline set
    grows the line past ``budget``, per-query values degrade to 2
    then 1 decimals (the detail line keeps 3), then the FASTEST
    entries beyond ``MAX_FINAL_ENTRIES`` roll up into
    ``rest: {n, sum}`` (slowest entries — the regression-relevant
    ones — stay named), then geo_cmp drops. Asserts the budget holds
    so growth past every lever fails HERE, at bench time, not
    silently at the driver."""
    if root is None:
        root = os.path.dirname(os.path.abspath(__file__))
    doc = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    cmp_ = geo_cmp(timings, root)
    if cmp_:
        doc["geo_cmp"] = cmp_
    line = json.dumps(doc, separators=(",", ":"))
    digits = 3
    for digits in (2, 1):
        if len(line) <= budget:
            break
        doc["queries"] = {q: round(v, digits) for q, v in timings.items()}
        line = json.dumps(doc, separators=(",", ":"))
    if len(line) > budget and len(timings) > MAX_FINAL_ENTRIES:
        # which entries get NAMED on the capped line (r10 verdict
        # item 3 — a pure slowest-first cut silently dropped the
        # round-over-round number for whichever fast entries moved):
        #   1. every entry whose ratio vs the newest committed local
        #      artifact moved >1.15x either way (regression-relevant
        #      regardless of absolute cost),
        #   2. every entry NEW since that artifact (first driver
        #      number on record),
        #   3. then the slowest of the rest until capacity.
        # Unmoved, previously-recorded fast entries roll up into
        # rest{n,sum}; their numbers stay in BENCH_r*_local.json.
        pl = _prev_local(root)
        prev = pl[1] if pl else {}

        def prio(q: str) -> tuple:
            p = prev.get(q)
            if not isinstance(p, (int, float)) or p <= 0:
                return (1, -timings[q])  # new entry
            r = timings[q] / p if timings[q] > 0 else 1.0
            moved = r > 1.15 or r < 1 / 1.15
            return (1 if moved else 2, -timings[q])

        keep = sorted(timings.items(), key=lambda kv: (*prio(kv[0]), kv[0]))
        named = dict(keep[:MAX_FINAL_ENTRIES])
        rest = keep[MAX_FINAL_ENTRIES:]
        doc["queries"] = {q: round(v, digits) for q, v in named.items()}
        doc["rest"] = {
            "n": len(rest),
            "sum": round(sum(v for _, v in rest), 2),
        }
        line = json.dumps(doc, separators=(",", ":"))
    if len(line) > budget and "geo_cmp" in doc:
        # last lever before failing: the geomean also lives in the
        # committed BENCH_r*_local.json, the per-query map does not
        del doc["geo_cmp"]
        line = json.dumps(doc, separators=(",", ":"))
    assert len(line) <= budget, (
        f"final bench line {len(line)} chars > {budget}: the headline "
        "set has outgrown the driver's tail capture — trim or split it"
    )
    return line


if __name__ == "__main__":
    main()
