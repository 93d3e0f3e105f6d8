"""Property-based tests (hypothesis) — beyond the reference's own
test strategy (golden outputs only, SURVEY.md §5.1): randomized
inputs exercise dangling vertices, self-loops, duplicate edges,
disconnected graphs, empty groups, and unicode keys that fixed
fixtures miss.

Each example executes real Spark jobs, so example counts are kept
small and deadlines disabled; shrinking still produces minimal
counterexamples on failure.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pagerank_mapreduce_spark.operators import dedup as D
from pagerank_mapreduce_spark.operators import mapreduce as M

from tests.oracle_pagerank import pagerank_oracle

TOL = 1e-4  # correctness_checker.cpp:48

SPARK_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# random edge lists over a small id space: dense enough for real
# structure, small enough that the NumPy oracle is instant
edge_lists = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=1,
    max_size=40,
)

kv_rows = st.lists(
    st.tuples(st.integers(0, 5), st.integers(-1000, 1000)),
    min_size=0,
    max_size=60,
)


@SPARK_SETTINGS
@given(edges=edge_lists)
def test_pagerank_matches_numpy_oracle(spark, edges):
    from pagerank_mapreduce_spark.graph import pagerank

    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    got = {
        r["id"]: r["rank"] for r in pagerank(df).ranks.collect()
    }
    expected, _ = pagerank_oracle(edges)
    assert len(got) == len(expected)
    for i, exp in enumerate(expected):
        assert got[i] == pytest.approx(exp, abs=TOL), f"vertex {i}"
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


@SPARK_SETTINGS
@given(rows=kv_rows)
def test_compress_partials_refold_to_global_sum(spark, rows):
    # compress is the partition-local combiner (MR-MPI compress(),
    # src/mapreduce.cpp:717-819): a key may legitimately appear once
    # per partition. The combiner invariant is that re-folding the
    # partials reproduces the global aggregate.
    if not rows:
        return
    df = spark.createDataFrame(rows, "k INT, v BIGINT")
    got: dict[int, int] = {}
    for r in M.compress(df, "k", "v", how="sum").collect():
        got[r["k"]] = got.get(r["k"], 0) + r["v"]
    want: dict[int, int] = {}
    for k, v in rows:
        want[k] = want.get(k, 0) + v
    assert got == want


@SPARK_SETTINGS
@given(rows=kv_rows)
def test_collate_preserves_value_multiset(spark, rows):
    if not rows:
        return
    df = spark.createDataFrame(rows, "k INT, v BIGINT")
    out = M.collate(df, "k", "v").collect()
    got = {r["k"]: sorted(r["values"]) for r in out}
    want: dict[int, list[int]] = {}
    for k, v in rows:
        want.setdefault(k, []).append(v)
    assert got == {k: sorted(vs) for k, vs in want.items()}


@SPARK_SETTINGS
@given(rows=kv_rows)
def test_sort_multivalues_sorts_in_place(spark, rows):
    if not rows:
        return
    df = M.collate(
        spark.createDataFrame(rows, "k INT, v BIGINT"), "k", "v"
    )
    out = M.sort_multivalues(df).collect()
    for r in out:
        assert list(r["values"]) == sorted(r["values"])


texts = st.lists(
    st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
        max_size=30,
    ),
    min_size=1,
    max_size=20,
)


@SPARK_SETTINGS
@given(docs=texts)
def test_exact_dedup_keeps_min_id_and_is_idempotent(spark, docs):
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    kept = D.exact_dedup(df).collect()
    # one representative per fingerprint, and it is the minimum id
    by_fp: dict[str, list[int]] = {}
    for r in kept:
        by_fp.setdefault(r["fp"], []).append(r["doc_id"])
    for fp, ids in by_fp.items():
        assert len(ids) == 1
    # idempotent: dedup of the representatives keeps them all
    kept_ids = {r["doc_id"] for r in kept}
    again = D.exact_dedup(
        df.filter(df.doc_id.isin(list(kept_ids)))
    ).collect()
    assert {r["doc_id"] for r in again} == kept_ids


@SPARK_SETTINGS
@given(
    text=st.text(
        alphabet=st.sampled_from("abc defg "), min_size=1, max_size=60
    )
)
def test_minhash_signature_deterministic_and_self_similar(spark, text):
    df = spark.createDataFrame(
        [(0, text), (1, text)], "doc_id BIGINT, text STRING"
    )
    sigs = {r["doc_id"]: r["sig"] for r in D.minhash_signatures(df).collect()}
    if sigs:  # whitespace-only text yields no shingle rows
        assert sigs.get(0) == sigs.get(1)


@SPARK_SETTINGS
@given(edges=edge_lists)
def test_cc_star_equals_label_propagation(spark, edges):
    # the two CC round structures must produce identical labelings on
    # any graph: self-loops, duplicates, disconnected pieces included
    from pagerank_mapreduce_spark.graph import algorithms as GA

    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    lp = {
        r["id"]: r["comp"]
        for r in GA.connected_components(df).collect()
    }
    star = {
        r["id"]: r["comp"]
        for r in GA.connected_components_star(df).collect()
    }
    assert star == lp


asof_events = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 1000)),  # (key, ts)
    min_size=1,
    max_size=40,
)


@SPARK_SETTINGS
@given(lrows=asof_events, rrows=asof_events)
def test_asof_bucketed_equals_plain(spark, lrows, rrows):
    # the skew-safe variant must be indistinguishable from the plain
    # path on any input, in both directions, with and without
    # tolerance — numeric `on` column, bucket width chosen so events
    # straddle many buckets
    from pagerank_mapreduce_spark.operators.asof import (
        asof_join,
        asof_join_bucketed,
    )

    left = spark.createDataFrame(
        [(i, k, float(t)) for i, (k, t) in enumerate(lrows)],
        "event_id long, user_id long, ts double",
    )
    right = spark.createDataFrame(
        [(k, float(t), float(i)) for i, (k, t) in enumerate(rrows)],
        "user_id long, ts double, value double",
    )
    for direction in ("backward", "forward"):
        for tol in (None, 50.0):
            plain = {
                r["event_id"]: r["r_value"]
                for r in asof_join(
                    left, right, on="ts", by="user_id",
                    direction=direction, tolerance=tol,
                ).collect()
            }
            bucketed = {
                r["event_id"]: r["r_value"]
                for r in asof_join_bucketed(
                    left, right, on="ts", by="user_id",
                    direction=direction, tolerance=tol,
                    bucket_seconds=64.0,
                ).collect()
            }
            assert bucketed == plain, (direction, tol)


@SPARK_SETTINGS
@given(edges=edge_lists, k=st.integers(1, 4))
def test_kcore_matches_python_peel(spark, edges, k):
    from pagerank_mapreduce_spark.graph.algorithms import kcore

    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    changed = True
    while changed:
        kill = [v for v, ns in adj.items() if len(ns) < k]
        changed = bool(kill)
        for v in kill:
            for u in adj[v]:
                adj[u].discard(v)
            del adj[v]
    want = {v: len(ns) for v, ns in adj.items()}
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.id: r.deg for r in kcore(df, k=k).collect()}
    assert got == want


@SPARK_SETTINGS
@given(edges=edge_lists, rounds=st.integers(0, 3))
def test_lpa_matches_python_simulation(spark, edges, rounds):
    from collections import Counter

    from pagerank_mapreduce_spark.graph.algorithms import label_propagation

    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    lbl = {v: v for v in adj}
    for _ in range(rounds):
        nxt = {}
        for v, ns in adj.items():
            c = Counter(lbl[u] for u in ns)
            top = max(c.values())
            nxt[v] = min(l for l, n in c.items() if n == top)
        lbl = nxt
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.id: r.comm for r in label_propagation(df, rounds=rounds).collect()}
    if adj:  # self-loop-only inputs yield an empty vertex set
        assert got == lbl
    else:
        assert got == {}


@SPARK_SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 2),  # key
            st.integers(0, 10_000),  # seconds offset
            st.floats(-100, 100, allow_nan=False, width=32),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_resample_matches_python_carry(spark, rows):
    from datetime import datetime, timedelta

    from pagerank_mapreduce_spark.operators.asof import (
        resample_carry_forward,
    )

    base = datetime(2026, 3, 1)
    data = [
        (k, base + timedelta(seconds=s), float(v), i)
        for i, (k, s, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "user_id bigint, ts timestamp, value double, event_id bigint"
    )
    got = {
        (r.user_id, r.grid_ts): r.value
        for r in resample_carry_forward(
            df, "ts", "user_id", "value", "1 hour", "event_id"
        ).collect()
    }
    want = {}
    bykey: dict[int, list] = {}
    for k, t, v, i in data:
        bykey.setdefault(k, []).append((t, i, v))
    for k, obs in bykey.items():
        obs.sort()
        lo = obs[0][0].replace(minute=0, second=0, microsecond=0)
        hi = obs[-1][0].replace(minute=0, second=0, microsecond=0) + timedelta(
            hours=1
        )
        g = lo
        while g <= hi:
            carried = [v for t, i, v in obs if t <= g]
            if carried:
                want[(k, g)] = carried[-1]
            g += timedelta(hours=1)
    assert got == want


# ------------------------------- paragraph dedup / fuzzy match (r8)

para_corpora = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
        min_size=1,
        max_size=5,
    ),
    min_size=1,
    max_size=12,
)


@SPARK_SETTINGS
@given(corpus=para_corpora)
def test_paragraph_dedup_brute_force_and_idempotent(spark, corpus):
    from pyspark.sql import functions as F

    rows = [(i, "\n\n".join(paras)) for i, paras in enumerate(corpus)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_kept"], r["n_dropped"])
        for r in D.paragraph_dedup(docs).collect()
    }
    # python model: corpus-wide keep-first by (doc_id, pos)
    seen: set[str] = set()
    for i, paras in enumerate(corpus):
        kept = []
        dropped = 0
        for p in paras:
            if p in seen:
                dropped += 1
            else:
                seen.add(p)
                kept.append(p)
        assert got[i] == ("\n\n".join(kept), len(kept), dropped), (i, corpus)
    # idempotence: a second pass never drops anything
    once = D.paragraph_dedup(docs).filter(F.col("n_kept") > 0)
    again = D.paragraph_dedup(once.select("doc_id", "text"))
    assert again.filter(F.col("n_dropped") > 0).count() == 0


short_words = st.lists(
    st.text(alphabet="abc", min_size=0, max_size=4),
    min_size=1,
    max_size=12,
)


@SPARK_SETTINGS
@given(words=short_words)
def test_fuzzy_pairs_brute_force_on_random_strings(spark, words):
    # tiny alphabet + short strings maximize collisions, including
    # empty strings, duplicates, and transpositions
    rows = list(enumerate(words))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = sorted(
        (r["a"], r["b"], r["dist"])
        for r in D.fuzzy_match_pairs(docs, "text").collect()
    )

    def lev(x, y):
        d = list(range(len(y) + 1))
        for i, cx in enumerate(x, 1):
            prev, d[0] = d[0], i
            for j, cy in enumerate(y, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (cx != cy))
        return d[len(y)]

    expect = sorted(
        (a, b, lev(wa, wb))
        for a, wa in rows
        for b, wb in rows
        if a < b and lev(wa, wb) <= 1
    )
    assert got == expect, words


@SPARK_SETTINGS
@given(
    seed=st.integers(0, 10_000),
    n=st.integers(10, 24),
    k=st.integers(2, 4),
)
def test_lloyd_build_matches_numpy_model(spark, seed, n, k):
    # deterministic Lloyd must reproduce a NumPy re-implementation of
    # its exact spec: smallest-id init, squared-L2 argmin with
    # lowest-index ties, per-dim mean rounded to 9, empty clusters
    # keeping the previous centroid, fixed 2 iterations
    import numpy as np

    from pagerank_mapreduce_spark.operators import similarity as S

    rng = np.random.RandomState(seed)
    vecs = rng.randint(0, 5, size=(n, 4)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    assigned, centroids = S.lloyd_build(emb, n_lists=k, iters=2)

    c = vecs[:k].astype("float64")
    for _ in range(2):
        d = ((vecs[:, None, :].astype("float64") - c[None]) ** 2).sum(axis=2)
        lab = d.argmin(axis=1)  # argmin takes the first minimum
        nxt = c.copy()
        for j in range(k):
            if (lab == j).any():
                nxt[j] = np.round(
                    vecs[lab == j].astype("float64").mean(axis=0), 9
                )
        c = nxt
    d = ((vecs[:, None, :].astype("float64") - c[None]) ** 2).sum(axis=2)
    lab = d.argmin(axis=1)

    got_c = np.array(centroids)
    assert np.array_equal(got_c, c), (got_c, c)
    got_lab = {r["vec_id"]: r["list_id"] for r in assigned.collect()}
    assert got_lab == {i: int(lab[i]) for i in range(n)}


score_label_rows = st.lists(
    st.tuples(
        st.integers(-50, 50),  # score (int -> exact float, heavy ties)
        st.integers(0, 1),
    ),
    min_size=2,
    max_size=60,
)


@SPARK_SETTINGS
@given(rows=score_label_rows)
def test_ks_statistic_matches_python_cdf_walk(spark, rows):
    # exact KS vs a brute-force python walk over the sorted distinct
    # scores (inclusive CDFs), including all-one-class degeneracy
    from pagerank_mapreduce_spark.operators.evaluation import ks_statistic

    n_pos = sum(y for _, y in rows)
    n_neg = len(rows) - n_pos
    df = spark.createDataFrame(
        [(float(s), y) for s, y in rows], ["s", "y"]
    )
    got = ks_statistic(df, "s", "y").first()
    if n_pos == 0 or n_neg == 0:
        # pinned contract (round-10, was skipped before): a one-class
        # input yields NULL ks — same NULL-on-degenerate contract as
        # roc_auc — never an ANSI DIVIDE_BY_ZERO error
        assert got["ks"] is None
        assert (got["n_pos"], got["n_neg"]) == (n_pos, n_neg)
        return
    cp = cn = 0
    best = 0.0
    for s in sorted({s for s, _ in rows}):
        cp += sum(1 for x, y in rows if x == s and y == 1)
        cn += sum(1 for x, y in rows if x == s and y == 0)
        best = max(best, abs(cp / n_pos - cn / n_neg))
    assert abs(got["ks"] - round(best, 6)) <= 1e-6
    assert (got["n_pos"], got["n_neg"]) == (n_pos, n_neg)


@SPARK_SETTINGS
@given(rows=score_label_rows, k=st.sampled_from([3, 16]))
def test_auc_bucket_count_invariance_extends_to_grouped(spark, rows, k):
    # grouped AUC must be invariant to n_buckets (it only re-shapes
    # the prefix computation) and equal the ungrouped AUC per slice
    from pagerank_mapreduce_spark.operators.evaluation import (
        roc_auc,
        roc_auc_by_group,
    )

    data = [("g" + str(i % 2), float(s), y) for i, (s, y) in enumerate(rows)]
    df = spark.createDataFrame(data, ["g", "s", "y"])
    a = {
        r["g"]: r["auc"]
        for r in roc_auc_by_group(df, "s", "y", ["g"], n_buckets=k).collect()
    }
    for g in sorted({d[0] for d in data}):
        solo = roc_auc(
            df.filter(df.g == g), "s", "y", n_buckets=1024
        ).first()
        want = solo["auc"] if solo["n_pos"] > 0 and solo["n_neg"] > 0 else None
        assert a[g] == want, (g, a[g], want)


@SPARK_SETTINGS
@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6),
        min_size=1,
        max_size=30,
    ),
    k=st.integers(1, 4),
)
def test_bpe_train_matches_textbook_greedy(spark, words, k):
    # INDEPENDENT check of the double-separator replace trick: a
    # textbook scan-based BPE (Sennrich et al. 2016 pseudo-code —
    # pair counts at every adjacent position, argmax with
    # lexicographic tie-break, greedy left-to-right non-overlapping
    # merge with an explicit index scan) must produce the identical
    # merge sequence on random corpora, including pathological
    # all-same-letter words where overlap handling matters most
    from collections import Counter

    from pagerank_mapreduce_spark.operators.bpe import bpe_train

    def textbook(word_counts, n_merges):
        vocab = {tuple(w): c for w, c in word_counts.items()}
        out = []
        for rank in range(1, n_merges + 1):
            pairs = Counter()
            for syms, c in vocab.items():
                for i in range(len(syms) - 1):
                    pairs[(syms[i], syms[i + 1])] += c
            if not pairs:
                break
            best = min(pairs, key=lambda p: (-pairs[p], p))
            out.append((rank, best[0], best[1], pairs[best]))
            new_vocab = {}
            for syms, c in vocab.items():
                merged = []
                i = 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == best[0]
                        and syms[i + 1] == best[1]
                    ):
                        merged.append(best[0] + best[1])
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                key = tuple(merged)
                new_vocab[key] = new_vocab.get(key, 0) + c
            vocab = new_vocab
        return out

    counts = Counter(words)
    want = textbook(counts, k)
    docs = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    got = [
        (r["merge_rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train(docs, n_merges=k).collect()
    ]
    assert got == want
    # the vocab_local trainer (one Arrow kernel, incremental pair
    # maintenance) must replay the identical merge sequence
    got_local = [
        (r["merge_rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train(docs, n_merges=k, mode="vocab_local").collect()
    ]
    assert got_local == want


@SPARK_SETTINGS
@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6),
        min_size=1,
        max_size=25,
    ),
    k=st.integers(1, 8),
)
def test_bpe_rank_merge_apply_matches_textbook_apply(spark, words, k):
    # the rank-skipping heap apply (one Arrow kernel, k-independent
    # plan) must segment every word exactly like a textbook
    # sequential apply: each learned merge applied in rank order,
    # left-to-right non-overlapping — on random corpora including
    # the all-same-letter overlap pathologies where the ascending-pop
    # equivalence argument earns its keep
    from pagerank_mapreduce_spark.operators.bpe import (
        bpe_train,
        bpe_word_segments,
    )

    docs = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    merges = [
        (r["left"], r["right"])
        for r in bpe_train(docs, n_merges=k, mode="vocab_local")
        .orderBy("merge_rank")
        .collect()
    ]

    def textbook_apply(word: str) -> list[str]:
        t = list(word)
        for left, right in merges:
            out, i = [], 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == left and t[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            t = out
        return t

    got = {
        r["word"]: (r["segments"], r["n_tokens"])
        for r in bpe_word_segments(
            docs, n_merges=k, train_mode="vocab_local",
            apply_mode="rank_merge",
        ).collect()
    }
    for w in set(words):
        want = textbook_apply(w)
        assert got[w] == (" ".join(want), len(want)), (w, got[w], want)
