"""Rank-statistic evaluation operators (operators/evaluation.py):
exact ROC-AUC and Spearman rho, computed with two-phase distributed
ranks — verified against hand-computed Mann-Whitney / rank-Pearson
values and for invariance to the bucket count (the distribution knob
must never change the result)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pagerank_mapreduce_spark.operators.evaluation import (
    roc_auc,
    spearman_corr,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "score double, y int")


def test_auc_perfect_separation(spark):
    out = roc_auc(
        _df(spark, [(1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)]), "score", "y"
    ).first()
    assert out["auc"] == 1.0
    assert (out["n_pos"], out["n_neg"]) == (2, 2)


def test_auc_hand_computed_mixed(spark):
    # pos scores {2, 4}, neg {1, 3}: concordant pairs 3 of 4
    out = roc_auc(
        _df(spark, [(1.0, 0), (2.0, 1), (3.0, 0), (4.0, 1)]), "score", "y"
    ).first()
    assert out["auc"] == 0.75


def test_auc_all_tied_is_half(spark):
    out = roc_auc(
        _df(spark, [(5.0, 0), (5.0, 1), (5.0, 0), (5.0, 1)]), "score", "y"
    ).first()
    assert out["auc"] == 0.5


def test_auc_tie_gets_half_credit(spark):
    # pos@1 ties neg@1 (0.5), pos@2 beats neg@1 (1.0) -> 0.75
    out = roc_auc(
        _df(spark, [(1.0, 0), (1.0, 1), (2.0, 1)]), "score", "y"
    ).first()
    assert out["auc"] == 0.75


def test_auc_bucket_count_invariant(spark):
    rows = [
        (float((i * 37) % 11), 1 if (i * 13) % 3 == 0 else 0)
        for i in range(200)
    ]
    df = _df(spark, rows)
    a1 = roc_auc(df, "score", "y", n_buckets=2).first()["auc"]
    a2 = roc_auc(df, "score", "y", n_buckets=1024).first()["auc"]
    # brute-force Mann-Whitney over all (pos, neg) pairs
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    wins = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p in pos
        for n in neg
    )
    expect = round(wins / (len(pos) * len(neg)), 6)
    assert a1 == a2 == expect


def test_spearman_monotone_and_reversed(spark):
    df = spark.createDataFrame(
        [(float(i), float(i * i)) for i in range(1, 20)], "x double, y double"
    )
    assert spearman_corr(df, "x", "y").first()["rho"] == 1.0
    rev = spark.createDataFrame(
        [(float(i), float(-i)) for i in range(1, 20)], "x double, y double"
    )
    assert spearman_corr(rev, "x", "y").first()["rho"] == -1.0


def test_spearman_ties_match_rank_pearson(spark):
    rows = [(1.0, 2.0), (1.0, 3.0), (2.0, 3.0), (3.0, 1.0), (3.0, 5.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    got = spearman_corr(df, "x", "y").first()
    # average ranks by hand
    rx = {1.0: 1.5, 2.0: 3.0, 3.0: 4.5}
    ry = {1.0: 1.0, 2.0: 2.0, 3.0: 3.5, 5.0: 5.0}
    xs = [rx[a] for a, _ in rows]
    ys = [ry[b] for _, b in rows]
    n = len(rows)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
    expect = round(
        cov
        / math.sqrt(
            sum((a - mx) ** 2 for a in xs) * sum((b - my) ** 2 for b in ys)
        ),
        6,
    )
    assert got["rho"] == expect
    assert got["n"] == n


def test_spearman_excludes_null_rows(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, None), (None, 3.0), (4.0, 4.0), (5.0, 5.0)],
        "x double, y double",
    )
    out = spearman_corr(df, "x", "y").first()
    assert out["n"] == 3
    assert out["rho"] == 1.0


def test_auc_excludes_null_rows(spark):
    df = spark.createDataFrame(
        [(1.0, 0), (2.0, None), (None, 1), (3.0, 1), (4.0, 1)],
        "score double, y int",
    )
    out = roc_auc(df, "score", "y").first()
    assert (out["n_pos"], out["n_neg"]) == (2, 1)
    assert out["auc"] == 1.0


def test_rank_buckets_balanced_under_value_skew(spark):
    # round-9 ADVICE: value-range bucketing (width_bucket over min/max)
    # degenerates under one outlier max — nearly every distinct score
    # lands in bucket 1 and the per-bucket window becomes the global
    # sort this module exists to avoid. Percentile-edge bucketing must
    # keep the LARGEST bucket ~N/n_buckets even when the value range
    # is dominated by a single outlier.
    from pagerank_mapreduce_spark.operators.evaluation import _avg_ranks

    n, k = 4000, 8
    rows = [(float(i),) for i in range(n)] + [(1e15,)]
    df = spark.createDataFrame(rows, ["s"])
    ranked = _avg_ranks(df, "s", [], n_buckets=k, _keep_bucket=True)
    sizes = {
        r["_bkt"]: r["c"]
        for r in ranked.groupBy("_bkt").agg(F.count("*").alias("c")).collect()
    }
    # with value-range buckets the max size would be n (all but the
    # outlier in one bucket); with rank buckets it's ~(n+1)/k
    assert max(sizes.values()) < 2 * (n + 1) / k, sizes
    assert len(sizes) >= k // 2, sizes
    # and the ranks themselves are still exact: 1..n then the outlier
    got = {r["s"]: r["avg_rank"] for r in ranked.collect()}
    assert got[0.0] == 1.0 and got[1e15] == float(n + 1)


def test_ks_statistic_hand_computed(spark):
    # scores 1,2,3,4 with labels 0,0,1,1: CDFs diverge maximally at
    # score 2 (F- = 1.0, F+ = 0.0) -> KS = 1.0 (perfect separation)
    from pagerank_mapreduce_spark.operators.evaluation import ks_statistic

    df = spark.createDataFrame(
        [(1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)], ["s", "y"]
    )
    row = ks_statistic(df, "s", "y").first()
    assert row["ks"] == 1.0 and row["n_pos"] == 2 and row["n_neg"] == 2
    # identical distributions -> KS 0
    df2 = spark.createDataFrame(
        [(1.0, 0), (1.0, 1), (2.0, 0), (2.0, 1)], ["s", "y"]
    )
    assert ks_statistic(df2, "s", "y").first()["ks"] == 0.0
    # partial overlap, hand-walked: scores 1-,2+,3-,4+ ->
    # cum at 1: |0 - .5| = .5; at 2: |.5-.5|=0; at 3: |.5-1|=.5; at 4: 0
    df3 = spark.createDataFrame(
        [(1.0, 0), (2.0, 1), (3.0, 0), (4.0, 1)], ["s", "y"]
    )
    assert ks_statistic(df3, "s", "y").first()["ks"] == 0.5


def test_roc_auc_by_group_matches_ungrouped_per_slice(spark):
    from pagerank_mapreduce_spark.operators.evaluation import (
        roc_auc,
        roc_auc_by_group,
    )

    rows = [
        ("a", 1.0, 0), ("a", 2.0, 0), ("a", 3.0, 1), ("a", 4.0, 1),
        ("b", 1.0, 1), ("b", 2.0, 0), ("b", 3.0, 1), ("b", 4.0, 0),
        ("c", 1.0, 1), ("c", 2.0, 1),  # no negatives -> NULL auc
    ]
    df = spark.createDataFrame(rows, ["g", "s", "y"])
    got = {
        r["g"]: (r["auc"], r["n_pos"], r["n_neg"])
        for r in roc_auc_by_group(df, "s", "y", ["g"]).collect()
    }
    for g in ("a", "b"):
        solo = roc_auc(df.filter(F.col("g") == g), "s", "y").first()
        assert got[g] == (solo["auc"], solo["n_pos"], solo["n_neg"]), g
    assert got["c"][0] is None and got["c"] == (None, 2, 0)


def test_calibration_bins_hand_computed(spark):
    from pagerank_mapreduce_spark.operators.evaluation import (
        calibration_bins,
    )

    # two bins: p=0.1 twice (one positive -> frac 0.5, gap 0.4),
    # p=0.95 twice (both positive -> frac 1.0, gap 0.05);
    # ECE = (2*0.4 + 2*0.05)/4 = 0.225
    df = spark.createDataFrame(
        [(0.1, 0), (0.1, 1), (0.95, 1), (0.95, 1)], ["p", "y"]
    )
    rows = {r["bin"]: r for r in calibration_bins(df, "p", "y").collect()}
    assert set(rows) == {1, 9}
    assert rows[1]["frac_pos"] == 0.5 and rows[1]["gap"] == 0.4
    assert rows[9]["mean_p"] == 0.95 and rows[9]["gap"] == 0.05
    assert all(r["ece"] == 0.225 for r in rows.values())
    # p = 1.0 clamps into the top bin instead of creating bin 10
    top = calibration_bins(
        spark.createDataFrame([(1.0, 1)], ["p", "y"]), "p", "y"
    ).first()
    assert top["bin"] == 9


def test_psi_zero_on_identical_and_positive_on_shift(spark):
    from pagerank_mapreduce_spark.operators.evaluation import psi

    # identical ref/cur distributions -> every contrib 0, psi 0
    same = spark.createDataFrame(
        [(float(v), r) for v in (1, 2, 3, 4) for r in (0, 1)], ["v", "r"]
    )
    rows = psi(same, "v", F.col("r") == 1, n_bins=10, lo=0.0, hi=10.0).collect()
    assert all(r["psi"] == 0.0 and r["contrib"] == 0.0 for r in rows)
    # a shifted current distribution -> positive psi, and the scalar
    # equals the sum of the per-bin contributions
    shifted = spark.createDataFrame(
        [(1.0, 1), (2.0, 1), (1.5, 1), (8.0, 0), (9.0, 0), (8.5, 0)],
        ["v", "r"],
    )
    rows = psi(shifted, "v", F.col("r") == 1, n_bins=10, lo=0.0, hi=10.0).collect()
    assert rows[0]["psi"] > 0.25  # fully disjoint = strong drift
    assert abs(sum(r["contrib"] for r in rows) - rows[0]["psi"]) < 2e-6
    # clamping: out-of-range values land in edge bins, not new ones
    edge = spark.createDataFrame([(-5.0, 1), (99.0, 0)], ["v", "r"])
    bins = {r["bin"] for r in psi(edge, "v", F.col("r") == 1).collect()}
    assert bins <= {0, 9}


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    from pagerank_mapreduce_spark.operators.evaluation import (
        bootstrap_mean_ci,
    )

    df = spark.createDataFrame(
        [(i, float(i % 10)) for i in range(1000)], ["id", "v"]
    )
    a = bootstrap_mean_ci(df, "v", "id").first()
    b = bootstrap_mean_ci(df, "v", "id").first()
    assert a == b  # md5 coins: bit-deterministic across runs
    assert a["n_replicates"] == 100
    # true mean 4.5; the bootstrap CI must bracket it and be tight-ish
    assert a["lo95"] < 4.5 < a["hi95"]
    assert a["hi95"] - a["lo95"] < 1.0
    # the replicate-mean average stays near the sample mean
    assert abs(a["mean"] - 4.5) < 0.3


def test_degenerate_inputs_yield_null_not_ansi_error(spark):
    # Round-10 ADVICE: every scorer diagnostic must DEGRADE on a
    # degenerate input (NULL / ε-floor), never throw DIVIDE_BY_ZERO
    # under ANSI mode (the Spark 4 default) — the same contract
    # roc_auc already pinned for one-class inputs.
    from pagerank_mapreduce_spark.operators.evaluation import (
        bootstrap_mean_ci,
        ks_statistic,
        psi,
    )

    # ks: one-class input -> NULL ks, counts still reported
    one_class = _df(spark, [(1.0, 1), (2.0, 1), (3.0, 1)])
    out = ks_statistic(one_class, "score", "y").first()
    assert out["ks"] is None
    assert (out["n_pos"], out["n_neg"]) == (3, 0)

    # psi: one-sided input (all rows reference) -> the empty side's
    # proportion takes the ε floor, psi finite and positive
    ref_only = spark.createDataFrame(
        [(1.0, 1), (2.0, 1), (3.0, 1)], ["v", "r"]
    )
    rows = psi(ref_only, "v", F.col("r") == 1).collect()
    assert rows and all(r["psi"] is not None for r in rows)
    assert all(r["p_cur"] == 1e-6 for r in rows)  # floored, not crashed

    # bootstrap: 1-row input -> ~37% of replicates draw weight 0 and
    # have no defined mean; they are dropped, the rest average to the
    # single value exactly
    one_row = spark.createDataFrame([(1, 7.0)], ["id", "v"])
    ci = bootstrap_mean_ci(one_row, "v", "id").first()
    assert ci["mean"] == 7.0 and ci["lo95"] == 7.0 and ci["hi95"] == 7.0
    assert 0 < ci["n_replicates"] <= 100


def test_average_precision_hand_computed(spark):
    from pagerank_mapreduce_spark.operators.evaluation import (
        average_precision,
    )

    # sklearn.average_precision_score([1,0,1,1], [4,3,2,1]) = 1/3·1
    # + 1/3·(2/3) + 1/3·(3/4) = 0.805556 (descending thresholds 4,3,2,1)
    out = average_precision(
        _df(spark, [(4.0, 1), (3.0, 0), (2.0, 1), (1.0, 1)]), "score", "y"
    ).first()
    assert out["ap"] == 0.805556
    assert (out["n_pos"], out["n_neg"]) == (3, 1)
    # perfect separation -> AP 1; ties collapse to one threshold
    perfect = average_precision(
        _df(spark, [(1.0, 0), (1.0, 0), (2.0, 1), (2.0, 1)]), "score", "y"
    ).first()
    assert perfect["ap"] == 1.0
    # one-class -> NULL (the roc_auc degenerate contract)
    deg = average_precision(
        _df(spark, [(1.0, 0), (2.0, 0)]), "score", "y"
    ).first()
    assert deg["ap"] is None
    # bucket-count invariance: the distribution knob never moves AP
    df = _df(spark, [(float(i % 7), int(i % 3 == 0)) for i in range(60)])
    a = average_precision(df, "score", "y", n_buckets=3).first()["ap"]
    b = average_precision(df, "score", "y", n_buckets=256).first()["ap"]
    assert a == b


def test_ndcg_hand_computed_and_degenerate(spark):
    import math

    from pagerank_mapreduce_spark.operators.evaluation import ndcg_at_k

    # group "g": score order = docs (1, 3, 2) with rel (2, 0, 1) ->
    # DCG = 3/log2(2) + 0/log2(3) + 1/log2(4); ideal order by gain
    # desc = rel 2 then 1 then 0 -> IDCG = 3/log2(2) + 1/log2(3).
    # group "z": all rel 0 -> NULL ndcg (try_divide contract).
    df = spark.createDataFrame(
        [
            ("g", 1, 9.0, 2),
            ("g", 2, 7.0, 1),
            ("g", 3, 8.0, 0),
            ("z", 4, 5.0, 0),
            ("z", 5, 4.0, 0),
        ],
        "grp string, doc_id int, score double, rel int",
    )
    out = {
        r.grp: r
        for r in ndcg_at_k(
            df, "score", "rel", ["grp"], k=10, tiebreak="doc_id"
        ).collect()
    }
    dcg = 3.0 + 1.0 / math.log2(4)
    idcg = 3.0 + 1.0 / math.log2(3)
    assert out["g"].dcg == pytest.approx(dcg, abs=2e-6)
    assert out["g"].idcg == pytest.approx(idcg, abs=2e-6)
    assert out["g"].ndcg == pytest.approx(dcg / idcg, abs=2e-6)
    assert out["z"].ndcg is None
    assert out["z"].dcg == 0.0


def test_ndcg_perfect_ranking_is_one(spark):
    from pagerank_mapreduce_spark.operators.evaluation import ndcg_at_k

    # score order == relevance order -> ndcg exactly 1
    df = spark.createDataFrame(
        [("g", i, float(10 - i), 5 - i) for i in range(5)],
        "grp string, doc_id int, score double, rel int",
    )
    row = ndcg_at_k(
        df, "score", "rel", ["grp"], k=3, tiebreak="doc_id"
    ).collect()[0]
    assert row.ndcg == 1.0


def test_skyline_matches_bruteforce_and_handles_ties(spark):
    import random

    from pagerank_mapreduce_spark.operators.skyline import skyline_2d

    rng = random.Random(7)
    pts = [
        (round(rng.uniform(0, 100), 1), float(rng.randint(0, 50)))
        for _ in range(400)
    ]
    # force x-ties with differing y, exact duplicates, and a NULL row
    pts += [(50.0, 1.0), (50.0, 2.0), (99.9, 3.0), (99.9, 3.0)]
    df = spark.createDataFrame(pts, "x double, y double").unionByName(
        spark.createDataFrame([(None, 1.0)], "x double, y double")
    )
    got = {(r.x, r.y) for r in skyline_2d(df, "x", "y").collect()}
    clean = [p for p in pts]
    expect = {
        (x, y)
        for (x, y) in set(clean)
        if not any(
            qx >= x and qy >= y and (qx > x or qy > y)
            for (qx, qy) in clean
        )
    }
    assert got == expect
    # the global max-x point is always on the frontier
    mx = max(p[0] for p in clean)
    assert any(abs(x - mx) < 1e-12 for (x, y) in got)


def test_skyline_bucket_count_invariance(spark):
    from pagerank_mapreduce_spark.operators.skyline import skyline_2d

    rows = [(float(i % 97), float((i * 37) % 53)) for i in range(500)]
    df = spark.createDataFrame(rows, "x double, y double")
    a = {(r.x, r.y) for r in skyline_2d(df, "x", "y", n_buckets=4).collect()}
    b = {(r.x, r.y) for r in skyline_2d(df, "x", "y", n_buckets=256).collect()}
    assert a == b and a


def test_cumulative_gains_hand_computed(spark):
    from pagerank_mapreduce_spark.operators.evaluation import (
        cumulative_gains,
    )

    # 4 rows, 2 tiles: scores 4,3 (pos, neg) | 2,1 (pos, neg).
    # tile 0: n=2, pos=1, gain 0.5, lift (1/2)/(2/4)=1.0
    # tile 1: cum 4 rows 2 pos, gain 1.0, lift (2/4)/(2/4)=1.0
    df = spark.createDataFrame(
        [(4.0, 1), (3.0, 0), (2.0, 1), (1.0, 0)], "s double, y int"
    )
    rows = {
        r.tile: r for r in cumulative_gains(df, "s", "y", n_tiles=2).collect()
    }
    assert rows[0].n == 2 and rows[0].n_pos == 1
    assert rows[0].gain == 0.5 and rows[0].lift == 1.0
    assert rows[1].cum_n == 4 and rows[1].cum_pos == 2
    assert rows[1].gain == 1.0 and rows[1].lift == 1.0
    # perfect scorer: all positives in the top tile -> lift = 1/rate
    df2 = spark.createDataFrame(
        [(4.0, 1), (3.0, 1), (2.0, 0), (1.0, 0)], "s double, y int"
    )
    r0 = {
        r.tile: r
        for r in cumulative_gains(df2, "s", "y", n_tiles=2).collect()
    }[0]
    assert r0.gain == 1.0 and r0.lift == 2.0


def test_cumulative_gains_ties_stay_together(spark):
    from pagerank_mapreduce_spark.operators.evaluation import (
        cumulative_gains,
    )

    # one distinct score spans what would be both tiles: all 4 rows
    # share s=1.0 -> above_n=0 -> everything lands in tile 0
    df = spark.createDataFrame(
        [(1.0, 1), (1.0, 0), (1.0, 1), (1.0, 0)], "s double, y int"
    )
    rows = cumulative_gains(df, "s", "y", n_tiles=2).collect()
    assert len(rows) == 1 and rows[0].tile == 0 and rows[0].n == 4
