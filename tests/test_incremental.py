"""Incremental aggregate state: merge(state(A), state(B)) must equal
state(A ∪ B) — the materialized-view contract — plus null/disjoint
edge cases."""

from __future__ import annotations

import random

from pagerank_mapreduce_spark.operators.incremental import (
    agg_state,
    finalize_state,
    merge_agg_states,
)


def _collect(df):
    return {
        r.k: (r.cnt, round(r.sm, 9), r.mn, r.mx) for r in df.collect()
    }


def test_merge_equals_full_recompute_randomized(spark):
    rng = random.Random(3)
    rows = [
        (rng.randrange(8), round(rng.uniform(-100, 100), 2))
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "k bigint, v double")
    cut = 250
    a = spark.createDataFrame(rows[:cut], "k bigint, v double")
    b = spark.createDataFrame(rows[cut:], "k bigint, v double")
    merged = merge_agg_states(
        agg_state(a, ["k"], "v"), agg_state(b, ["k"], "v"), ["k"]
    )
    full = agg_state(df, ["k"], "v")
    got, want = _collect(merged), _collect(full)
    assert set(got) == set(want)
    for k in want:
        gc, gs, gmn, gmx = got[k]
        wc, ws, wmn, wmx = want[k]
        assert gc == wc and gmn == wmn and gmx == wmx
        assert abs(gs - ws) < 1e-6


def test_merge_disjoint_keys_and_nulls(spark):
    a = spark.createDataFrame([(1, 5.0), (1, None)], "k bigint, v double")
    b = spark.createDataFrame([(2, 7.0)], "k bigint, v double")
    out = _collect(
        merge_agg_states(
            agg_state(a, ["k"], "v"), agg_state(b, ["k"], "v"), ["k"]
        )
    )
    # key 1 only in A (null dropped), key 2 only in B: the outer join
    # must carry each side's state through unchanged
    assert out[1] == (1, 5.0, 5.0, 5.0)
    assert out[2] == (1, 7.0, 7.0, 7.0)


def test_finalize_avg(spark):
    a = spark.createDataFrame([(1, 2.0), (1, 4.0)], "k bigint, v double")
    st = finalize_state(agg_state(a, ["k"], "v"))
    (row,) = st.collect()
    assert row.avg == 3.0
