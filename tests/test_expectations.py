"""Expectations operator: exact violation counts on planted defects."""

from __future__ import annotations

import pytest

from pagerank_mapreduce_spark.operators.expectations import (
    accepted_values,
    expect,
    foreign_key,
    in_range,
    matches,
    not_null,
    unique,
)


def _report(df, checks):
    return {
        r.check: (r.violations, r.total, r.passed)
        for r in expect(df, checks).collect()
    }


def test_expect_planted_violations(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 10.0, "x@y.io"),
            (1, "a", -5.0, "nope"),       # dup id, below range, bad email
            (2, None, 10.0, "b@c.de"),    # null name
            (3, "zz", 1000.0, None),      # bad enum, above range, null email
        ],
        "id bigint, name string, v double, email string",
    )
    parent = spark.createDataFrame([(1,), (2,)], "pid bigint")
    rep = _report(
        df,
        [
            not_null("name"),
            unique("id"),
            in_range("v", 0, 100),
            accepted_values("name", ["a", "b"]),
            matches("email", r"^[^@]+@[^@]+$"),
            foreign_key("id", parent, "pid"),
        ],
    )
    assert rep["not_null(name)"] == (1, 4, False)
    assert rep["unique(id)"] == (1, 4, False)
    assert rep["in_range(v,0,100)"] == (2, 4, False)
    # null name counts as a violation for accepted_values too
    assert rep["accepted_values(name)"] == (2, 4, False)
    assert rep["matches(email)"] == (2, 4, False)
    # id=3 has no parent; the two id=1 rows both match
    assert rep["foreign_key(id->pid)"] == (1, 4, False)


def test_expect_all_pass(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, name string")
    rep = _report(df, [not_null("name"), unique("id")])
    assert all(v == (0, 2, True) for v in rep.values())


def test_expect_empty_checks_raises(spark):
    df = spark.createDataFrame([(1,)], "id bigint")
    with pytest.raises(ValueError):
        expect(df, [])


def test_expect_single_scan_for_row_checks(spark, sf_dir):
    # k row-level checks must not become k scans: the report plan
    # (before the FK union) reads the table once
    import re

    from pagerank_mapreduce_spark.plans import formatted_plan

    df = spark.createDataFrame([(1, 2.0)], "id bigint, v double")
    rep = expect(df, [not_null("id"), in_range("v", 0, 1), unique("id")])
    plan = formatted_plan(rep)
    assert len(re.findall(r"\(\d+\) Scan ", plan)) == 1, plan


def test_expect_randomized_against_python_model(spark):
    import random

    rng = random.Random(5)
    rows = [
        (
            rng.choice([None, rng.randrange(6)]),
            rng.choice([None, "a", "b", "zz"]),
            rng.choice([None, rng.uniform(-50, 150)]),
        )
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "id bigint, name string, v double")
    rep = _report(
        df,
        [not_null("id"), in_range("v", 0, 100), accepted_values("name", ["a", "b"]), unique("id")],
    )
    n = len(rows)
    want_nn = sum(1 for r in rows if r[0] is None)
    want_ir = sum(1 for r in rows if r[2] is None or r[2] < 0 or r[2] > 100)
    want_av = sum(1 for r in rows if r[1] not in ("a", "b"))
    distinct_ids = len({r[0] for r in rows if r[0] is not None})
    # count_distinct ignores NULL ids; surplus = total - distinct
    want_uq = n - distinct_ids
    assert rep["not_null(id)"] == (want_nn, n, want_nn == 0)
    assert rep["in_range(v,0,100)"] == (want_ir, n, want_ir == 0)
    assert rep["accepted_values(name)"] == (want_av, n, want_av == 0)
    assert rep["unique(id)"] == (want_uq, n, want_uq == 0)
