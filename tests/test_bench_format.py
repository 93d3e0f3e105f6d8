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


def test_final_line_fits_driver_tail_and_parses():
    timings = _fake_timings()
    line = bench.final_line(timings, round(sum(timings.values()), 3), 0.1)
    assert len(line) <= 1900
    assert "\n" not in line
    doc = json.loads(line)
    assert doc["metric"] == "headline_queries_total_wall"
    assert doc["unit"] == "sec"
    assert doc["sf"] == 0.1
    # every named entry is a real headline query; past the line's
    # physical capacity entries roll up into rest{n, sum} by the
    # moved/new-first policy, and the rollup accounts for every
    # missing name
    assert set(doc["queries"]) <= set(bench.BENCH_QUERIES)
    missing = set(bench.BENCH_QUERIES) - set(doc["queries"])
    if missing:
        assert doc["rest"]["n"] == len(missing)
        assert doc["rest"]["sum"] == round(
            sum(timings[q] for q in missing), 2
        )
        assert len(doc["queries"]) == bench.MAX_FINAL_ENTRIES
    else:
        assert "rest" not in doc


def test_final_line_rollup_names_moved_and_new_first(tmp_path):
    # the r10 verdict's item 3: a pure slowest-first cut hid the
    # round-over-round number of any FAST entry that moved. The
    # policy now names (1) entries whose ratio vs the newest local
    # artifact moved >1.15x, (2) entries new since it, then (3) the
    # slowest of the rest. Build a scenario where a fast mover and a
    # fast new entry would have been rolled up under slowest-first.
    qs = bench.BENCH_QUERIES
    timings = {q: 50.0 + i for i, q in enumerate(qs)}
    fast_mover, fast_new = qs[0], qs[1]  # the two smallest values
    prev = {q: timings[q] for q in qs}
    prev[fast_mover] = timings[fast_mover] / 2.0  # 2x regression
    del prev[fast_new]  # no prior record
    (tmp_path / "BENCH_r09_local.json").write_text(
        json.dumps({"queries": prev})
    )
    line = bench.final_line(
        timings, round(sum(timings.values()), 3), 0.1,
        root=str(tmp_path),
    )
    doc = json.loads(line)
    if "rest" in doc:
        assert fast_mover in doc["queries"]
        assert fast_new in doc["queries"]
        # the rolled-up set is exactly the fastest UNMOVED recorded
        # entries: every rolled entry is faster than every named
        # non-priority entry
        rolled = set(qs) - set(doc["queries"])
        named_rest = (
            set(doc["queries"]) - {fast_mover, fast_new}
        )
        assert all(
            timings[r] <= min(timings[q] for q in named_rest)
            for r in rolled
        )


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
