"""Unit + property tests for changelog compaction / snapshot merge
(operators/cdc.py). The catalog parity test checks ts_cdc_snapshot
against DuckDB; these pin the MERGE semantics on adversarial cases:
delete-then-reinsert, delete of a key absent from base, base
passthrough, and a randomized last-writer-wins oracle.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pagerank_mapreduce_spark.operators.cdc import (
    apply_changelog,
    merge_snapshot,
)

SPARK_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

CH_SCHEMA = "k bigint, seq bigint, v double, op string"


def _merge_reference(base: dict, changes: list[tuple]) -> dict:
    state = dict(base)
    for k, seq, v, op in sorted(changes, key=lambda r: r[1]):
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    return state


def test_merge_semantics_adversarial(spark):
    base = spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 30.0)], "k bigint, v double")
    changes = spark.createDataFrame(
        [
            (1, 1, 11.0, "U"),   # plain update
            (2, 1, 0.0, "D"),    # delete existing
            (2, 2, 22.0, "U"),   # ...then re-insert (survives)
            (3, 1, 31.0, "U"),
            (3, 2, 0.0, "D"),    # update then delete (drops)
            (9, 1, 90.0, "U"),   # insert of a key absent from base
            (8, 1, 0.0, "D"),    # delete of a key absent from base (no-op)
        ],
        CH_SCHEMA,
    )
    got = {
        r["k"]: r["v"]
        for r in merge_snapshot(base, changes, ["k"], ["seq"]).collect()
    }
    assert got == {1: 11.0, 2: 22.0, 9: 90.0}


def test_apply_changelog_no_base(spark):
    changes = spark.createDataFrame(
        [(1, 1, 5.0, "U"), (1, 2, 6.0, "U"), (2, 1, 7.0, "D")], CH_SCHEMA
    )
    got = {
        r["k"]: r["v"]
        for r in apply_changelog(changes, ["k"], ["seq"]).collect()
    }
    assert got == {1: 6.0}


@SPARK_SETTINGS
@given(
    base=st.dictionaries(st.integers(0, 6), st.floats(0, 100, width=32), max_size=5),
    ops=st.lists(
        st.tuples(
            st.integers(0, 6),
            st.floats(0, 100, width=32),
            st.sampled_from(["U", "U", "D"]),
        ),
        max_size=25,
    ),
)
def test_merge_matches_sequential_reference(spark, base, ops):
    changes = [(k, i, v, op) for i, (k, v, op) in enumerate(ops)]
    base_df = spark.createDataFrame(
        list(base.items()) or [], "k bigint, v double"
    )
    ch_df = spark.createDataFrame(changes or [], CH_SCHEMA)
    got = {
        r["k"]: r["v"]
        for r in merge_snapshot(base_df, ch_df, ["k"], ["seq"]).collect()
    }
    assert got == _merge_reference(base, changes)


def test_null_op_is_upsert_not_delete(spark):
    # a malformed NULL op must not act as a delete (plain != would
    # evaluate NULL and drop the key)
    changes = spark.createDataFrame(
        [(1, 1, 5.0, None), (2, 1, 6.0, "D")], CH_SCHEMA
    )
    got = {
        r["k"]: r["v"]
        for r in apply_changelog(changes, ["k"], ["seq"]).collect()
    }
    assert got == {1: 5.0}


def test_merge_rejects_mismatched_base_columns(spark):
    import pytest

    base = spark.createDataFrame([(1, 10.0, "x")], "k bigint, v double, extra string")
    changes = spark.createDataFrame([(1, 1, 11.0, "U")], CH_SCHEMA)
    with pytest.raises(ValueError, match="payload"):
        merge_snapshot(base, changes, ["k"], ["seq"])


# ----------------------------------------- SCD Type-2 (round 7)


def test_scd2_run_length_collapse(spark):
    from pagerank_mapreduce_spark.operators.cdc import scd2_history

    rows = [
        (1, "A", 10, 100),
        (1, "A", 20, 101),  # same state → collapses into the A run
        (1, "B", 30, 102),
        (1, "A", 40, 103),  # state returns → NEW interval, not merged
        (2, "X", 15, 104),  # single event → one open interval
    ]
    df = spark.createDataFrame(rows, "k bigint, s string, t bigint, e bigint")
    out = sorted(
        (
            (r["k"], r["s"], r["valid_from"], r["valid_to"])
            for r in scd2_history(df, ["k"], "s", ["t", "e"]).collect()
        )
    )
    assert out == [
        (1, "A", 10, 30),
        (1, "A", 40, None),
        (1, "B", 30, 40),
        (2, "X", 15, None),
    ]


def test_scd2_same_ts_ties_break_on_id(spark):
    from pagerank_mapreduce_spark.operators.cdc import scd2_history

    # two changes at the same timestamp: event_id orders them, the
    # first becomes a zero-length interval [30, 30)
    rows = [(1, "A", 10, 1), (1, "B", 30, 2), (1, "C", 30, 3)]
    df = spark.createDataFrame(rows, "k bigint, s string, t bigint, e bigint")
    out = sorted(
        (
            (r["s"], r["valid_from"], r["valid_to"])
            for r in scd2_history(df, ["k"], "s", ["t", "e"]).collect()
        )
    )
    assert out == [("A", 10, 30), ("B", 30, 30), ("C", 30, None)]


@given(
    st.lists(
        st.tuples(
            st.integers(1, 3),  # key
            st.sampled_from(["A", "B", "C"]),  # state
        ),
        min_size=1,
        max_size=30,
    )
)
@SPARK_SETTINGS
def test_scd2_intervals_tile_and_reconstruct(spark, events):
    from pagerank_mapreduce_spark.operators.cdc import scd2_history

    # distinct timestamps per key (ties are covered by the unit test
    # above; the reconstruction property needs a total event order)
    rows = [(k, s, 10 * i, i) for i, (k, s) in enumerate(events)]
    df = spark.createDataFrame(rows, "k bigint, s string, t bigint, e bigint")
    hist = scd2_history(df, ["k"], "s", ["t", "e"]).collect()
    by_key: dict[int, list] = {}
    for r in hist:
        by_key.setdefault(r["k"], []).append(r)
    for k, ivs in by_key.items():
        ivs.sort(key=lambda r: r["valid_from"])
        # intervals tile: each closes exactly where the next opens;
        # only the last is open-ended
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["s"] != b["s"]  # consecutive runs always differ
        assert ivs[-1]["valid_to"] is None
        # reconstruction: every event falls in exactly the interval
        # carrying its state
        for kk, s, t, _ in rows:
            if kk != k:
                continue
            covering = [
                r
                for r in ivs
                if r["valid_from"] <= t
                and (r["valid_to"] is None or t < r["valid_to"])
            ]
            assert len(covering) == 1 and covering[0]["s"] == s


# ----------------------------------------- snapshot diff (round 7)


def test_snapshot_diff_classifies_ops(spark):
    from pagerank_mapreduce_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None), (4, 40.0)], "k bigint, v double"
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, 21.0), (3, None), (5, 50.0)], "k bigint, v double"
    )
    got = {
        r["k"]: (r["op"], r["v"])
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    # 1 unchanged, 3 unchanged (NULL == NULL null-safely) → absent
    assert got == {2: ("U", 21.0), 4: ("D", None), 5: ("I", 50.0)}


@given(
    st.dictionaries(st.integers(0, 9), st.integers(0, 3), max_size=8),
    st.dictionaries(st.integers(0, 9), st.integers(0, 3), max_size=8),
)
@SPARK_SETTINGS
def test_snapshot_diff_merge_round_trip(spark, old_d, new_d):
    from pagerank_mapreduce_spark.operators.cdc import (
        merge_snapshot,
        snapshot_diff,
    )

    schema = "k bigint, v bigint"
    old = spark.createDataFrame(list(old_d.items()) or [], schema)
    new = spark.createDataFrame(list(new_d.items()) or [], schema)
    diff = snapshot_diff(old, new, ["k"])
    rebuilt = merge_snapshot(old, diff, ["k"], [])
    assert {
        (r["k"], r["v"]) for r in rebuilt.collect()
    } == set(new_d.items())
    # and the diff is minimal: no row for keys with unchanged values
    assert all(
        r["k"] not in old_d
        or r["k"] not in new_d
        or old_d[r["k"]] != new_d[r["k"]]
        for r in diff.collect()
    )
