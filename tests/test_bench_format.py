"""The driver records only the last 2000 chars of bench.py's stdout
and parses the bench JSON out of that tail; round 9's committed
artifact had `parsed: null` because the per-run arrays pushed the
single output line past the window. Pin the final-line contract:
compact, complete, parseable, and under budget with the CURRENT
headline set (so growing BENCH_QUERIES past the levers fails here,
not silently at the driver)."""

from __future__ import annotations

import json

import bench


def _fake_timings():
    # worst-case realistic values: 3-decimal, double-digit seconds
    return {q: 12.345 for q in bench.BENCH_QUERIES}


def _fake_canary():
    return {"py": 412.3, "py2": 388.1, "spin": 1.141, "jvm": 850.3,
            "regime": 1.65}


def test_final_line_fits_driver_tail_and_parses():
    timings = _fake_timings()
    line = bench.final_line(
        timings, round(sum(timings.values()), 3), 0.1,
        canary=_fake_canary(),
    )
    assert len(line) <= 1900
    assert "\n" not in line
    doc = json.loads(line)
    assert doc["metric"] == "headline_queries_total_wall"
    assert doc["unit"] == "sec"
    assert doc["sf"] == 0.1
    # the named map is EXACTLY the canonical FINAL_NAMED set (fixed
    # across rounds — r12 verdict item 7); everything else rolls up
    # into rest{n, sum}, fully accounted
    assert set(doc["queries"]) == set(bench.FINAL_NAMED)
    missing = set(bench.BENCH_QUERIES) - set(doc["queries"])
    assert doc["rest"]["n"] == len(missing)
    assert doc["rest"]["sum"] == round(
        sum(timings[q] for q in missing), 2
    )
    # the host-health canary rides the parsed artifact (r12 verdict
    # item 1): regime is the machine-checkable adjudication evidence
    assert doc["canary"]["regime"] == 1.65
    assert doc["canary"]["py"] == 412.3


def test_final_named_is_fixed_and_valid():
    # the key-set contract: FINAL_NAMED ⊆ BENCH_QUERIES, no dupes,
    # and the named map's KEYS do not depend on this round's timings
    # — two completely different timing profiles produce identical
    # key sets (what makes consecutive driver artifacts comparable).
    assert len(bench.FINAL_NAMED) == len(set(bench.FINAL_NAMED))
    assert set(bench.FINAL_NAMED) <= set(bench.BENCH_QUERIES)
    t1 = {q: 12.345 for q in bench.BENCH_QUERIES}
    t2 = {q: 0.001 * (i + 1)
          for i, q in enumerate(bench.BENCH_QUERIES)}
    k1 = set(json.loads(bench.final_line(t1, 1.0, 0.1))["queries"])
    k2 = set(json.loads(bench.final_line(t2, 1.0, 0.1))["queries"])
    assert k1 == k2 == set(bench.FINAL_NAMED)


def test_geo_cmp_regime_normalization(tmp_path):
    # r12's open wound, closed: a pure host-regime slowdown (every
    # entry 2x, canary regime 2x) must normalize to rn ≈ 1.0, while
    # the raw ratio still reports the 2x — both visible, machine-
    # checkable. A prev artifact WITHOUT a canary normalizes against
    # regime 1.0.
    prev = {"queries": {"a": 1.0, "b": 2.0},
            "canary": {"regime": 1.0}}
    (tmp_path / "BENCH_r12_local.json").write_text(json.dumps(prev))
    out = bench.geo_cmp({"a": 2.0, "b": 4.0}, str(tmp_path), regime=2.0)
    assert out["ratio"] == 2.0
    assert out["rn"] == 1.0
    # prev artifact predating the canary: prev regime defaults to 1.0
    (tmp_path / "BENCH_r12_local.json").write_text(
        json.dumps({"queries": {"a": 1.0, "b": 2.0}})
    )
    out = bench.geo_cmp({"a": 2.0, "b": 4.0}, str(tmp_path), regime=2.0)
    assert out["rn"] == 1.0
    # no regime passed -> no rn key (old call shape unchanged)
    out = bench.geo_cmp({"a": 2.0, "b": 4.0}, str(tmp_path))
    assert "rn" not in out
    # all_queries (complete map, round 13+) preferred over the named
    # subset for the comparison base
    (tmp_path / "BENCH_r13_local.json").write_text(json.dumps({
        "queries": {"a": 99.0},
        "all_queries": {"a": 1.0, "b": 2.0},
    }))
    out = bench.geo_cmp({"a": 2.0, "b": 4.0}, str(tmp_path))
    assert out == {"vs": "r13_local", "n": 2, "ratio": 2.0}


def test_canary_py_shape():
    c = bench.canary_py(reps=1)
    assert set(c) == {"py", "spin", "regime"}
    assert c["py"] > 0 and c["regime"] > 0
    assert c["spin"] >= 0.9  # wall can't be much below cpu


def test_geo_cmp_vs_newest_local_artifact(tmp_path):
    (tmp_path / "BENCH_r03_local.json").write_text(
        json.dumps({"queries": {"a": 2.0, "b": 1.0, "zzz": 4.0}})
    )
    (tmp_path / "BENCH_r07_local.json").write_text(
        json.dumps({"queries": {"a": 1.0, "b": 4.0}})
    )
    # newest artifact (r07) wins; shared keys only; geomean of
    # (2.0/1.0, 1.0/4.0) = sqrt(0.5) ~ 0.707
    out = bench.geo_cmp({"a": 2.0, "b": 1.0, "c": 9.9}, str(tmp_path))
    assert out == {"vs": "r07_local", "n": 2, "ratio": 0.707}
    # no artifacts -> None, bench still prints a valid line
    empty = tmp_path / "none"
    empty.mkdir()
    assert bench.geo_cmp({"a": 1.0}, str(empty)) is None


def test_geo_cmp_runs_against_committed_artifacts():
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = bench.geo_cmp(_fake_timings(), root)
    # BENCH_r09_local.json is committed: the comparison must engage
    assert out is not None and out["n"] > 0
