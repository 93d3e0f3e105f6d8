"""Pin the physical-plan properties the engine relies on at scale.

These tests assert properties of `.explain("formatted")`, not
results: a Catalyst or engine-code change that silently drops
predicate pushdown, column pruning, a broadcast, or whole-stage
codegen from a headline query fails here even though answers stay
correct. SURVEY.md §4.2 lists these as the Spark-given replacements
for the reference's hand-coded physical tricks — this file is the
evidence they are actually in effect.
"""

from __future__ import annotations

from pagerank_mapreduce_spark.plans import (
    codegen_span_count,
    exchange_count,
    formatted_plan,
    join_strategies,
    plan_audit,
    pushed_filters,
    read_schemas,
)
from pagerank_mapreduce_spark.queries import CATALOG


def _q(spark, sf_dir, name):
    return CATALOG[name].fn(spark, sf_dir)


def test_q6_filters_reach_the_scan(spark, sf_dir):
    # TPC-H Q6 is the pushdown showcase: every predicate must reach
    # the parquet reader, and only the 4 referenced columns load.
    df = _q(spark, sf_dir, "rel_q6_forecast_revenue")
    plan = formatted_plan(df)
    pushed = " ".join(pushed_filters(plan))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed to scan:\n{plan}"
    (schema,) = read_schemas(plan)
    assert set(schema) == {
        "l_shipdate",
        "l_discount",
        "l_quantity",
        "l_extendedprice",
    }, f"column pruning failed: scan reads {schema}"


def test_q5_broadcasts_every_dimension(spark, sf_dir):
    # region/nation/supplier are marked broadcast in the query;
    # only the two fact-fact joins may shuffle.
    df = _q(spark, sf_dir, "rel_q5_region_revenue")
    js = join_strategies(df)
    assert js.get("BroadcastHashJoin", 0) >= 3, js
    fact_joins = js.get("SortMergeJoin", 0) + js.get("ShuffledHashJoin", 0)
    assert fact_joins <= 2, js


def test_bpe_pack_single_partition_only_on_bucket_totals(spark, sf_dir):
    # tokenizer-aware packing (round 12): the two-phase prefix sum
    # may use exactly ONE single-partition exchange — the offsets
    # window over the num_buckets per-bucket TOTALS (a fixed ~1024
    # rows), never the data. A second SinglePartition means the
    # global ORDER BY window crept back in and the operator stopped
    # being distributable.
    df = _q(spark, sf_dir, "text_bpe_pack")
    plan = formatted_plan(df)
    assert plan.count("SinglePartition") == 1, plan


def test_q21_semi_anti_shapes_no_nested_loop(spark, sf_dir):
    # TPC-H Q21 (the r11→r10 bench-drift adjudication, round 12):
    # the EXISTS/NOT-EXISTS correlations must stay equi-keyed
    # semi/anti joins with the supplier-inequality as a residual
    # condition — never a BroadcastNestedLoopJoin or cartesian (the
    # non-equi part must ride the l_orderkey equi-key). Supplier and
    # orders are dimension-sized → broadcast. Scale-invariant pins
    # only: at sf0.001 AQE may broadcast the anti side too, so the
    # anti join's STRATEGY is not pinned, its keyed-ness is.
    df = _q(spark, sf_dir, "rel_q21_waiting_supplier")
    plan = formatted_plan(df)
    js = join_strategies(plan)
    assert js.get("BroadcastNestedLoopJoin", 0) == 0, js
    assert js.get("CartesianProduct", 0) == 0, js
    assert js.get("BroadcastHashJoin", 0) >= 2, js  # orders, supplier
    assert "LeftSemi" in plan and "LeftAnti" in plan, plan


def test_q1_aggregation_is_codegen_and_single_exchange(spark, sf_dir):
    # scan → partial agg → exchange → final agg: exactly one shuffle,
    # and the hot path fully inside whole-stage codegen. Codegen
    # spans are only visible on the executed (AQE-final) plan.
    df = _q(spark, sf_dir, "rel_q1_pricing")
    plan = formatted_plan(df, execute=True)
    assert exchange_count(plan) == 1, plan
    assert codegen_span_count(df) >= 1, plan


def test_rev_adjacency_single_shuffle(spark, sf_dir):
    # the reference's whole MapReduce phase is ONE hash shuffle
    # (map → collate → reduce, SURVEY.md §2.1 A3-A5); the Spark plan
    # must not add more. The edge-derivation subtree may add its own
    # exchange at most once.
    df = _q(spark, sf_dir, "graph_rev_adjacency")
    assert exchange_count(df) <= 2, formatted_plan(df)


def test_exact_dedup_single_shuffle_narrow_payload(spark, sf_dir):
    # one exchange on the fingerprint; the scan must read only the
    # id and text columns (payload stays behind until the join-back).
    df = _q(spark, sf_dir, "dedup_exact")
    plan = formatted_plan(df)
    assert exchange_count(plan) == 1, plan
    for schema in read_schemas(plan):
        assert set(schema) <= {"doc_id", "text"}, schema


def test_q3_customer_filter_pushed_and_broadcast(spark, sf_dir):
    df = _q(spark, sf_dir, "rel_q3_shipping_priority")
    plan = formatted_plan(df)
    pushed = " ".join(pushed_filters(plan))
    assert "c_mktsegment" in pushed, plan
    assert join_strategies(plan).get("BroadcastHashJoin", 0) >= 1, plan


def test_plan_audit_summary_shape(spark, sf_dir):
    audit = plan_audit(_q(spark, sf_dir, "rel_q6_forecast_revenue"))
    assert set(audit) == {
        "exchanges",
        "pushed_filters",
        "read_schemas",
        "join_strategies",
        "codegen_spans",
    }
    # pure scan-filter-agg: the single exchange is the 1-row final agg
    assert audit["exchanges"] == 1


def test_asof_bucketed_plan_is_equi_join_only(spark, sf_dir):
    # the skew-safe as-of join must stay in equi-join + window land:
    # a BroadcastNestedLoopJoin or CartesianProduct would mean the
    # bucket salt or boundary-carry join degenerated into pair space
    df = _q(spark, sf_dir, "ts_asof_bucketed")
    js = join_strategies(df)
    assert js.get("BroadcastNestedLoopJoin", 0) == 0, js
    assert js.get("CartesianProduct", 0) == 0, js
    # the window key is salted: partition spec includes the bucket
    plan = formatted_plan(df)
    assert "_b" in plan


def test_triangles_wedge_exchange_is_shared(spark, sf_dir):
    # the wedge self-join's two inputs are the identical cached
    # `oriented` relation shuffled on the identical key (`lo`), so the
    # oriented edge list must be shuffled AT MOST ONCE: one Exchange +
    # a ReusedExchange, never two independent shuffles of the same
    # data. Checked under the 100 TB plan shape (AQE and broadcast
    # off — at fixture scale AQE hides the exchanges by broadcasting
    # everything).
    from pagerank_mapreduce_spark.graph import algorithms as GA
    from pagerank_mapreduce_spark.sources.edges import derive_edges

    conf = spark.conf
    saved = {
        "spark.sql.adaptive.enabled": conf.get("spark.sql.adaptive.enabled"),
        "spark.sql.autoBroadcastJoinThreshold": conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
    }
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        tri = GA.triangles(derive_edges(spark, sf_dir, 1000))
        tri.count()  # materialize caches: final plan reads InMemoryTableScan
        plan = formatted_plan(tri)
        assert "ReusedExchange" in plan, plan
        # and the whole query stays within the audited shuffle budget:
        # deg agg, two orientation joins, wedge (shared), closing x2
        assert exchange_count(tri) <= 6, exchange_count(tri)
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_embedding_near_dups_plan_is_equi_join_only(spark, sf_dir):
    # post-guard pair generation: bucket groupBy + explode + two
    # id equi-joins — never a theta self-join over vectors
    df = _q(spark, sf_dir, "sim_embedding_near_dups")
    js = join_strategies(df)
    assert js.get("BroadcastNestedLoopJoin", 0) == 0, js
    assert js.get("CartesianProduct", 0) == 0, js
    plan = formatted_plan(df)
    # the hot-bucket drop metric is attached
    assert "CollectMetrics" in plan or "hot_buckets" in plan


def test_cap_per_group_prunes_map_side(spark, sf_dir):
    # the rank filter must compile to WindowGroupLimit BELOW the
    # exchange: each map task pre-prunes to the group's top-n before
    # any row moves, bounding shuffle volume at n x input partitions
    from pagerank_mapreduce_spark.operators.sessions import cap_per_group

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    from pagerank_mapreduce_spark.plans.audit import _final_tree

    plan = formatted_plan(cap_per_group(docs, "source", 10, "doc_id"))
    # the operator TREE prints top-down, so the MAP-SIDE (partial)
    # limit is a WindowGroupLimit appearing AFTER the Exchange line;
    # the one before it is the post-shuffle final pass
    tree = _final_tree(plan)
    assert "Exchange" in tree, plan
    below_exchange = tree.split("Exchange", 1)[1]
    assert "WindowGroupLimit" in below_exchange, plan


def test_tfidf_topk_prunes_map_side(spark, sf_dir):
    # the per-doc top-k rank filter must compile to WindowGroupLimit
    # below the exchange, same contract as cap_per_group
    from pagerank_mapreduce_spark.operators.ranking import tfidf_topk
    from pagerank_mapreduce_spark.plans.audit import _final_tree

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = formatted_plan(tfidf_topk(docs, k=5))
    tree = _final_tree(plan)
    assert "Exchange" in tree, plan
    assert "WindowGroupLimit" in tree.split("Exchange", 1)[1], plan


def test_lm_score_has_no_positional_self_join(spark, sf_dir):
    # bigrams come from zip_with over array slices — one scan, no
    # (doc, pos) sort-merge self-join; the exchange budget pins the
    # shape (8 with broadcastable model relations; a regression to
    # the posexplode formulation measured 11)
    from pagerank_mapreduce_spark.operators.ranking import bigram_lm_score
    from pagerank_mapreduce_spark.plans.audit import exchange_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = bigram_lm_score(docs)
    assert exchange_count(df) <= 8, formatted_plan(df)
    assert "SortMergeJoin" not in formatted_plan(df)


def test_scd2_windows_share_one_exchange(spark, sf_dir):
    # both window passes (lag run-marking, lead interval-closing)
    # partition on the same key, so Catalyst must plan exactly ONE
    # shuffle — a second exchange means the windows stopped sharing
    # their partitioning
    df = _q(spark, sf_dir, "ts_scd2_history")
    plan = formatted_plan(df)
    assert exchange_count(plan) == 1, plan


def test_span_coverage_plans_no_expand(spark, sf_dir):
    # dup_ngrams rides the p == s flag through the SINGLE-distinct
    # aggregate; a second count_distinct would plan an Expand that
    # doubles the exploded position rows through the shuffle
    df = _q(spark, sf_dir, "dedup_span_coverage")
    plan = formatted_plan(df)
    assert "Expand" not in plan, plan


def test_semdedup_plan_is_equi_join_only(spark, sf_dir):
    # pair generation must stay bucketed: cluster members explode
    # JVM-side and vectors join back by id — any
    # BroadcastNestedLoopJoin/CartesianProduct means the cross join
    # came back
    df = _q(spark, sf_dir, "sim_semdedup")
    js = join_strategies(df)
    assert "BroadcastNestedLoopJoin" not in js, js
    assert "CartesianProduct" not in js, js


def test_walk_step_is_two_key_equi_join(spark, sf_dir):
    # a walk step must probe exactly the picked successor — an equi
    # hash/merge join on (cur, pick) = (src, idx). A nested-loop or
    # cartesian plan would match every successor of a hub and filter
    # after, turning one probe into deg(hub) matched rows per walk.
    from pyspark.sql import functions as F

    from pagerank_mapreduce_spark.graph.walks import _walk_step

    live = spark.createDataFrame(
        [(0, 1, 2, "1")], "walk_id bigint, cur bigint, d_cur bigint, path string"
    )
    succ = spark.createDataFrame(
        [(1, 0, 2, 1), (1, 1, 3, 0)],
        "src bigint, idx int, dst bigint, d_dst bigint",
    )
    df = _walk_step(live, succ, 0, 42)
    js = join_strategies(df)
    assert "BroadcastNestedLoopJoin" not in js, js
    assert "CartesianProduct" not in js, js


def test_nb_predict_argmax_prunes_map_side(spark, sf_dir):
    # the per-doc argmax must compile to a WindowGroupLimit (map-side
    # top-1 prune), and the only nested-loop joins allowed are the
    # broadcast scalar/label relations — never a CartesianProduct
    df = _q(spark, sf_dir, "text_nb_predict")
    plan = formatted_plan(df)
    assert "WindowGroupLimit" in plan, plan
    js = join_strategies(df)
    assert "CartesianProduct" not in js, js


def test_phrase_pmi_topk_avoids_global_sort(spark, sf_dir):
    # ORDER BY pmi LIMIT 50 must plan as TakeOrderedAndProject
    # (per-partition heap + driver merge), not a full Sort exchange
    df = _q(spark, sf_dir, "text_phrase_pmi")
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    js = join_strategies(df)
    assert "CartesianProduct" not in js, js


def test_bloom_probe_side_does_not_shuffle(spark, sf_dir):
    # the whole point of the Bloom prefilter: the kilobyte position
    # relation broadcasts; the probe side must never hash-exchange
    # for the membership join
    df = _q(spark, sf_dir, "rel_bloom_prune")
    js = join_strategies(df)
    assert js.get("BroadcastHashJoin", 0) >= 1, js
    assert "CartesianProduct" not in js, js


def test_cms_sketch_broadcasts(spark, sf_dir):
    # estimate side: probes join the (<= depth*width row) sketch via
    # broadcast — frequency lookup without shuffling the probe relation
    df = _q(spark, sf_dir, "rel_cms_user_counts")
    js = join_strategies(df)
    assert js.get("BroadcastHashJoin", 0) >= 1, js


def test_ahash_pairs_plan_is_bucket_shaped(spark, sf_dir):
    # aHash candidates must be one keyed aggregation over the hashed
    # ids with JVM-side in-bucket explosion — no join at all (the
    # pairs never rejoin payloads), so any join node or Expand in the
    # plan means the shape regressed
    df = _q(spark, sf_dir, "mm_ahash_near_dups")
    js = join_strategies(df)
    assert not js, f"pair generation grew a join: {js}"
    plan = formatted_plan(df)
    assert "Expand" not in plan, plan


def test_tfidf_cosine_pairs_no_cartesian_and_keyed_joins(spark, sf_dir):
    # the all-pairs similarity must stay an inverted-index equi-join
    # on the term plus id-keyed norm joins. The nested-loop joins in
    # the plan are all instances of the broadcast 1-ROW corpus-size
    # scalar: the weighted relation is consumed by three subtrees
    # (norms, pair left, pair right), each carrying its own copy of
    # the scalar join — duplicated in the FORMATTED plan but
    # physically shared at runtime (the executed plan shows the
    # tf/df aggregation exchanges as ReusedExchange). A true
    # CartesianProduct (docs × docs) is the regression this guards.
    df = _q(spark, sf_dir, "text_tfidf_cosine_pairs")
    js = join_strategies(df)
    assert "CartesianProduct" not in js, js
    plan = formatted_plan(df, execute=True)
    assert "ReusedExchange" in plan, "tf/df subtrees no longer shared"


def test_ahash_probe_pairs_stays_bucket_shaped(spark, sf_dir):
    # the 1-bit multi-probe path anchors pair generation inside the
    # same keyed aggregation (no anchor x probe join): any join node
    # means the one-sided explosion regressed to a relational join
    # that would rescan the decode stage per branch
    df = _q(spark, sf_dir, "mm_ahash_probe_pairs")
    js = join_strategies(df)
    assert not js, f"probe pair generation grew a join: {js}"


def test_adamic_adar_no_cartesian_single_wedge_agg(spark, sf_dir):
    # wedge pairs must come from the per-center neighbor-array
    # explosion — a neighbor x neighbor relational join (or worse, a
    # cartesian) is the scale regression this guards; the only joins
    # are the existing-edge anti-join and AQE's broadcast choices
    df = _q(spark, sf_dir, "graph_adamic_adar")
    js = join_strategies(df)
    assert "CartesianProduct" not in js, js
    assert sum(js.values()) <= 1, f"extra joins appeared: {js}"


def test_roc_auc_single_partition_only_on_tiny_relations(spark, sf_dir):
    # the rank computation must never globally sort the score
    # relation: the plan's windows are (a) PARTITIONED by bucket and
    # (b) an unpartitioned window over the <= n_buckets bucket-totals
    # relation; the SinglePartition exchanges must all feed scalar
    # aggregates or that tiny window, never the per-score relation
    df = _q(spark, sf_dir, "ml_roc_auc")
    plan = formatted_plan(df)
    assert "Window" in plan
    # the distinct-score collapse is localCheckpointed (round-10: it
    # feeds the prefix machinery three ways), so the keyed exchange
    # no longer shows in the FINAL plan — pin it on the collapse
    # stage itself: the heavy relation shuffles on the score key
    # (partial -> exchange -> final hash aggregate), never collapsing
    # to one task
    from pyspark.sql import functions as F

    from pagerank_mapreduce_spark.sources.tables import load_table

    base = load_table(spark, sf_dir, "embeddings").select(
        F.element_at("embedding", 1).cast("double").alias("_s")
    )
    collapse = base.groupBy("_s").agg(F.count(F.lit(1)).alias("n"))
    cplan = formatted_plan(collapse)
    assert "hashpartitioning(_s" in cplan, cplan


def test_fuzzy_pairs_plan_is_bucket_shaped(spark, sf_dir):
    # deletion-neighborhood candidates are one keyed aggregation over
    # the registered keys with in-bucket explosion and JVM-side
    # levenshtein — a join (or worse, a cartesian against the name
    # relation) means the index regressed to relational matching
    df = _q(spark, sf_dir, "dedup_fuzzy_pairs")
    js = join_strategies(df)
    assert not js, f"fuzzy pair generation grew a join: {js}"


def test_ks_prefix_machinery_shuffles_on_the_score_key(spark, sf_dir):
    # same contract as the AUC pin: the bucketed-prefix windows stay
    # in the final plan (the collapse stage itself is checkpointed —
    # its keyed-exchange pin lives in the roc_auc test above); assert
    # the window machinery is present and every data-sized window is
    # bucket-partitioned, not global
    df = _q(spark, sf_dir, "ml_ks_statistic")
    plan = formatted_plan(df)
    assert "Window" in plan
    assert "hashpartitioning(_bkt" in plan, plan


def test_grouped_auc_windows_partition_on_group_and_bucket(spark, sf_dir):
    # the grouped rank machinery must keep ALL windows partitioned —
    # one pipeline over all groups, never a global sort of the score
    # relation; the offsets window partitions on the group
    df = _q(spark, sf_dir, "ml_auc_by_source")
    plan = formatted_plan(df)
    assert "hashpartitioning(source" in plan, plan
    # no unpartitioned data-sized window: every Window in this plan
    # declares a partition spec (the formatted node lists its
    # partitionBy inside the window definition arguments)
    import re

    for m in re.finditer(r"Arguments: \[[^\]]*windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        assert spec.strip().startswith(("source", "_bkt")), spec


def test_bootstrap_single_keyed_exchange(spark, sf_dir):
    # the replicate means must come from ONE keyed shuffle on _b
    # (map-side partial sums absorb the x100 explode); the final CI
    # is a scalar aggregate over B rows
    df = _q(spark, sf_dir, "ml_bootstrap_ci")
    plan = formatted_plan(df)
    assert "hashpartitioning(_b" in plan, plan
    js = join_strategies(df)
    assert "CartesianProduct" not in js, js


def test_windowed_psi_reference_is_broadcast(spark, sf_dir):
    # the per-window grid joins the reference proportions via
    # broadcast — the ref side is n_bins rows and must never shuffle
    # the window relation to meet it
    df = _q(spark, sf_dir, "stream_drift_psi")
    js = join_strategies(df)
    assert js.get("BroadcastHashJoin", 0) >= 1, js
    assert "CartesianProduct" not in js, js


def test_ndcg_topk_is_window_group_limit(spark, sf_dir):
    # both the actual and the ideal per-group orderings must compile
    # to rank-limit pushdown (WindowGroupLimit pre-prunes each map
    # task's partition to the group top-k BEFORE the shuffle) — a
    # plain window + filter would sort every group's full contents
    df = _q(spark, sf_dir, "ml_ndcg_by_source")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("WindowGroupLimit") >= 4, plan


def test_link_scores_no_cartesian_single_wedge_agg(spark, sf_dir):
    # same guard as adamic_adar: candidates must come from the
    # per-center array explosion, with only the edge anti-join and
    # the two degree joins (broadcast at fixture scale) beside it
    df = _q(spark, sf_dir, "graph_link_scores")
    js = join_strategies(df)
    assert "CartesianProduct" not in js, js
    assert sum(js.values()) <= 3, f"extra joins appeared: {js}"


def test_skyline_no_global_sort_of_distinct_relation(spark, sf_dir):
    # the frontier must never globally sort the distinct-x relation:
    # windows are per-bucket, plus one window over the <= n_buckets
    # bucket-totals relation; the final output carries no Sort at all
    # beyond those window sorts
    df = _q(spark, sf_dir, "rel_skyline")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # two windows: in-bucket prefix max + bucket-offsets prefix max
    assert plan.count("Window") >= 2, plan
    # no TakeOrdered / global Sort over the data-sized relation: the
    # only SinglePartition exchanges are (a) the percentile-edge
    # scalar aggregate, (b) the <= n_buckets bucket-totals feeding
    # the offsets window, (c) the offsets window itself — all
    # bounded; a fourth would mean the distinct-x relation leaked
    # into a global stage
    sp = [
        ln for ln in plan.splitlines() if "SinglePartition" in ln
    ]
    assert len(sp) <= 3, plan


def test_textrank_phrases_scan_prunes_to_text(spark, sf_dir):
    # the whole phrase-graph pipeline derives from ONE column: the
    # documents scan must load `text` alone (a scan dragging doc_id/
    # lang/source/n_chars through the explode would 5x the input).
    # The entry's eager checkpoints hide the scan from the FINAL
    # plan, so the pin inspects the co-occurrence-count stage — the
    # relation the first checkpoint materializes
    from pyspark.sql import functions as F

    from pagerank_mapreduce_spark.functions import text as T
    from pagerank_mapreduce_spark.queries import _bigram_seq
    from pagerank_mapreduce_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    seq = _bigram_seq(T.tokens(F.col("text")))
    cnt = (
        docs.select(seq.alias("_t"))
        .filter(F.size("_t") >= 2)
        .select(F.explode("_t").alias("_u"))
        .groupBy("_u")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    plan = formatted_plan(cnt)
    doc_schemas = read_schemas(plan)
    assert doc_schemas, f"no documents scan found:\n{plan}"
    for schema in doc_schemas:
        assert set(schema) <= {"text"}, (
            f"documents scan reads more than text: {schema}"
        )


def test_louvain_sweep_no_cartesian_and_algebraic_argmin(spark, sf_dir):
    # the level sweep must stay a keyed adjacency x strength join
    # with a struct-min groupBy: no cartesian anywhere in 4 levels,
    # no window function over the vertex relation (the argmin is
    # algebraic, map-side combinable)
    from pagerank_mapreduce_spark.graph.algorithms import louvain_levels
    from pagerank_mapreduce_spark.graph.rmat import rmat_edges_portable

    e = rmat_edges_portable(spark, scale=8, edge_factor=8, seed=7)
    df = louvain_levels(e, max_levels=2)
    js = join_strategies(df)
    assert "CartesianProduct" not in js, js


def test_bpe_chunked_apply_bounds_expression_depth(spark, sf_dir):
    # the chunk contract made literal: with chunk_size=c the analyzed
    # plan of the word-segment relation never carries more than c
    # chained replaces — at a real 32k-merge vocabulary this is the
    # difference between a plan and an analyzer blowup
    from pagerank_mapreduce_spark.operators import bpe as BPE
    from pagerank_mapreduce_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = BPE.bpe_token_counts(
        docs, n_merges=12, chunk_size=4, train_mode="vocab_local"
    )
    plan = out._jdf.queryExecution().analyzed().toString()
    # the final chunk's replaces are the only ones left in the plan —
    # earlier chunks were cut off by their localCheckpoint
    assert plan.count("replace(") <= 4, (
        f"{plan.count('replace(')} chained replaces leaked past the "
        "chunk boundary"
    )
