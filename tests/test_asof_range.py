"""As-of and range join unit semantics (the DuckDB parity test covers
the fixture-scale backward case; these pin the edge semantics)."""

from __future__ import annotations

from datetime import datetime, timedelta

from pagerank_mapreduce_spark.operators.asof import (
    asof_join,
    asof_join_bucketed,
    range_join,
)


def _ts(m):
    return datetime(2024, 1, 1, 0, m)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(20), "b"), (2, _ts(5), "c")],
        "user_id BIGINT, ts TIMESTAMP, name STRING",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 100.0), (1, _ts(15), 150.0), (3, _ts(1), 999.0)],
        "user_id BIGINT, ts TIMESTAMP, value DOUBLE",
    )
    return left, right


def test_asof_backward_picks_latest_at_or_before(spark):
    left, right = _frames(spark)
    got = {
        r["name"]: r["r_value"]
        for r in asof_join(left, right).collect()
    }
    # "a" at :10 sees the simultaneous :10 row (<= semantics);
    # "b" at :20 sees :15; user 2 has no right rows -> NULL
    assert got == {"a": 100.0, "b": 150.0, "c": None}


def test_asof_forward_picks_earliest_at_or_after(spark):
    left, right = _frames(spark)
    got = {
        r["name"]: r["r_value"]
        for r in asof_join(left, right, direction="forward").collect()
    }
    assert got == {"a": 100.0, "b": None, "c": None}


def test_asof_right_ties_resolve_to_max_payload(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "x")], "user_id BIGINT, ts TIMESTAMP, name STRING"
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 1.0), (1, _ts(5), 2.0)],
        "user_id BIGINT, ts TIMESTAMP, value DOUBLE",
    )
    (row,) = asof_join(left, right).collect()
    assert row["r_value"] == 2.0


def test_range_join_window_and_key_bounds(spark):
    a = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(40), 101), (2, _ts(10), 102)],
        "user_id BIGINT, ts TIMESTAMP, event_id BIGINT",
    )
    b = spark.createDataFrame(
        [(1, _ts(12), 200), (1, _ts(25), 201), (2, _ts(50), 202)],
        "user_id BIGINT, ts TIMESTAMP, event_id BIGINT",
    )
    pairs = {
        (r["a_event_id"], r["b_event_id"])
        for r in range_join(a, b, 600.0).collect()  # 10 minutes
    }
    # 100@:10 matches 200@:12 (2 min); 101@:40 matches 201@:25 is 15
    # min -> out; 102 user 2 vs 202@:50 is 40 min -> out
    assert pairs == {(100, 200)}
    wide = {
        (r["a_event_id"], r["b_event_id"])
        for r in range_join(a, b, 1800.0).collect()  # 30 minutes
    }
    assert wide == {(100, 200), (100, 201), (101, 200), (101, 201)}


def test_asof_tolerance_nulls_stale_matches(spark):
    from pagerank_mapreduce_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 1, 100.0), (2, 1, 205.0), (3, 2, 50.0)],
        "event_id long, user_id long, ts double",
    )
    right = spark.createDataFrame(
        [(1, 95.0, 7.0), (1, 200.0, 9.0)], "user_id long, ts double, value double"
    )
    got = {
        r["event_id"]: r["r_value"]
        for r in asof_join(
            left, right, on="ts", by="user_id", tolerance=10.0
        ).collect()
    }
    # event 1: nearest preceding at 95 (gap 5 ≤ 10) → matched
    # event 2: nearest preceding at 200 (gap 5) → matched, no fallback
    # event 3: user 2 has no purchases → NULL
    assert got == {1: 7.0, 2: 9.0, 3: None}
    # tightening the tolerance nulls instead of falling back to 95
    tight = {
        r["event_id"]: r["r_value"]
        for r in asof_join(
            left, right, on="ts", by="user_id", tolerance=3.0
        ).collect()
    }
    assert tight == {1: None, 2: None, 3: None}


def test_asof_tolerance_exact_at_boundary_microseconds(spark):
    # gap EXACTLY equal to the tolerance must match (<=), including
    # with odd-microsecond timestamps where double epoch-seconds
    # carry ~0.25 µs of ulp and could flip the comparison. Gap here:
    # exactly 1 second, timestamps with a .000001 fractional part.
    lt = datetime(2026, 1, 1, 12, 0, 1, 1)
    rt = datetime(2026, 1, 1, 12, 0, 0, 1)
    left = spark.createDataFrame(
        [(1, lt, "x")], "user_id BIGINT, ts TIMESTAMP, name STRING"
    )
    right = spark.createDataFrame(
        [(1, rt, 7.0)], "user_id BIGINT, ts TIMESTAMP, value DOUBLE"
    )
    for direction in ("backward", "nearest"):
        rows = asof_join(
            left, right, on="ts", by="user_id",
            direction=direction, tolerance=1.0,
        ).collect()
        assert rows[0]["r_value"] == 7.0, direction
        # one microsecond past the tolerance → NULL
        rows = asof_join(
            left, right, on="ts", by="user_id",
            direction=direction, tolerance=0.999999,
        ).collect()
        assert rows[0]["r_value"] is None, direction


def test_asof_nearest_picks_min_gap_ties_backward(spark):
    from pagerank_mapreduce_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 1, 100.0), (2, 1, 104.0), (3, 1, 150.0)],
        "event_id long, user_id long, ts double",
    )
    right = spark.createDataFrame(
        [(1, 95.0, 7.0), (1, 105.0, 9.0)], "user_id long, ts double, value double"
    )
    got = {
        r["event_id"]: r["r_value"]
        for r in asof_join(
            left, right, on="ts", by="user_id", direction="nearest"
        ).collect()
    }
    # 100: gaps 5/5 — tie goes backward (95 → 7.0)
    # 104: forward 105 (gap 1) beats backward 95 (gap 9)
    # 150: only backward candidates remain → 105 → 9.0
    assert got == {1: 7.0, 2: 9.0, 3: 9.0}
    # tolerance composes with nearest
    tight = {
        r["event_id"]: r["r_value"]
        for r in asof_join(
            left, right, on="ts", by="user_id", direction="nearest", tolerance=2.0
        ).collect()
    }
    assert tight == {1: None, 2: 9.0, 3: None}


def _hot_key_frames(spark):
    # one pathologically hot user (most of the stream) + a few cold
    # ones; right rows sparse so most buckets have NO right row and
    # the cross-boundary carry must reach back several buckets
    base = datetime(2026, 1, 1)
    lrows, rrows = [], []
    eid = 0
    for m in range(0, 600, 7):  # hot key 1: left every 7 min over 10 h
        lrows.append((eid, 1, base + timedelta(minutes=m)))
        eid += 1
    for m in (3, 290):  # only two right rows, hours apart
        rrows.append((1, base + timedelta(minutes=m), float(m)))
    for u in (2, 3):  # cold keys
        lrows.append((eid, u, base + timedelta(minutes=50 * u)))
        eid += 1
        rrows.append((u, base + timedelta(minutes=10 * u), float(u)))
    left = spark.createDataFrame(
        lrows, "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        rrows, "user_id long, ts timestamp, value double"
    )
    return left, right


def test_asof_bucketed_matches_plain_on_hot_key(spark):
    left, right = _hot_key_frames(spark)
    for direction in ("backward", "forward"):
        for tol in (None, 600.0):
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
                    bucket_seconds=1800.0,  # 20 buckets over the 10 h
                ).collect()
            }
            assert bucketed == plain, (direction, tol)
    # sanity: some matches are non-NULL and some cross a bucket
    # boundary (right row at minute 3, left rows hours later)
    plain = {
        r["event_id"]: r["r_value"]
        for r in asof_join(left, right, on="ts", by="user_id").collect()
    }
    assert plain[20] == 3.0  # left at minute 140, carried from minute 3


def test_asof_bucketed_salts_the_hot_key(spark):
    # the point of the variant: the hot key's window work spreads
    # over many (key, bucket) groups instead of one. Assert on the
    # OPERATOR's plan — the within-bucket window must partition by
    # the salted (_k, _b) key — and on the actual group fan-out its
    # bucketing induces on the hot key
    import re

    from pyspark.sql import functions as F

    from pagerank_mapreduce_spark.plans.audit import formatted_plan

    left, right = _hot_key_frames(spark)
    df = asof_join_bucketed(
        left, right, on="ts", by="user_id", bucket_seconds=1800.0
    )
    plan = formatted_plan(df)
    # the carry window's partition spec includes the bucket salt
    assert re.search(r"windowspecdefinition\(_k#\d+L?, _b#\d+L?", plan), plan
    # and the hot key's rows really spread across many salted groups
    n_groups = (
        left.filter(F.col("user_id") == 1)
        .select(
            F.floor(
                F.unix_micros("ts") / F.lit(int(1800.0 * 1e6))
            ).alias("b")
        )
        .distinct()
        .count()
    )
    assert n_groups >= 20


def test_asof_bucketed_matches_plain_on_null_keys(spark):
    # NULL by-keys: the plain path's window partitionBy groups them
    # together and carries their matches — the bucketed path's
    # null-safe carry joins must reproduce that exactly, including
    # across a bucket boundary
    left = spark.createDataFrame(
        [(1, None, _ts(50)), (2, 7, _ts(50))],
        "event_id BIGINT, user_id BIGINT, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [(None, _ts(1), 7.0), (7, _ts(2), 9.0)],
        "user_id BIGINT, ts TIMESTAMP, value DOUBLE",
    )
    plain = {
        r["event_id"]: r["r_value"]
        for r in asof_join(left, right, on="ts", by="user_id").collect()
    }
    bucketed = {
        r["event_id"]: r["r_value"]
        for r in asof_join_bucketed(
            left, right, on="ts", by="user_id", bucket_seconds=100.0
        ).collect()
    }
    assert plain == {1: 7.0, 2: 9.0}
    assert bucketed == plain


def test_asof_null_timestamps_match_nothing(spark):
    # NULL-timestamp rows on either side can never participate in an
    # as-of match (DuckDB ASOF / pandas merge_asof semantics): a NULL
    # right row must not act as a "-infinity" carry under the
    # nulls-first ascending sort, and a NULL left row gets NULL in
    # every direction
    left = spark.createDataFrame(
        [(1, 1, _ts(9)), (2, 1, None)],
        "event_id BIGINT, user_id BIGINT, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [(1, None, 99.0), (1, _ts(10), 5.0)],
        "user_id BIGINT, ts TIMESTAMP, value DOUBLE",
    )
    for direction in ("backward", "forward", "nearest"):
        got = {
            r["event_id"]: r["r_value"]
            for r in asof_join(
                left, right, on="ts", by="user_id", direction=direction
            ).collect()
        }
        # event 1 at 09:00: backward→no row at-or-before, forward and
        # nearest→10:00; event 2 (NULL ts)→always NULL
        want1 = None if direction == "backward" else 5.0
        assert got == {1: want1, 2: None}, direction
    bucketed = {
        r["event_id"]: r["r_value"]
        for r in asof_join_bucketed(
            left, right, on="ts", by="user_id", bucket_seconds=60.0
        ).collect()
    }
    assert bucketed == {1: None, 2: None}


def test_asof_ntz_exact_across_dst(spark):
    # TIMESTAMP_NTZ gaps must be pure wall-clock arithmetic: under a
    # DST-observing session time zone, a cast-based conversion is
    # non-monotonic across spring-forward and corrupts tolerance
    # checks; the field-based conversion must not care about the zone
    from pyspark.sql import functions as F

    saved = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        left = spark.createDataFrame(
            [(1, "2026-03-08 03:00:00")], "event_id BIGINT, s STRING"
        ).select("event_id", F.col("s").cast("timestamp_ntz").alias("ts"))
        right = spark.createDataFrame(
            [("2026-03-08 01:30:00", 5.0)], "s STRING, value DOUBLE"
        ).select(
            F.col("s").cast("timestamp_ntz").alias("ts"),
            F.lit(1).cast("bigint").alias("event_id"),
            "value",
        ).select(F.col("event_id").alias("user_id"), "ts", "value")
        lhs = left.select("event_id", F.lit(1).cast("bigint").alias("user_id"), "ts")
        # wall-clock gap 01:30 -> 03:00 is 5400 s; tolerance 5400 must
        # match, 5399 must not (the broken cast computes 1800 s here)
        hit = asof_join(lhs, right, on="ts", by="user_id", tolerance=5400.0)
        miss = asof_join(lhs, right, on="ts", by="user_id", tolerance=5399.0)
        assert hit.collect()[0]["r_value"] == 5.0
        assert miss.collect()[0]["r_value"] is None
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)


def test_range_join_subsecond_width_boundary(spark):
    # candidate buckets are computed on the exact micros basis: with
    # double-seconds bucketing, sub-second widths at 2026 epochs can
    # push a boundary row one bucket over and silently drop a
    # qualifying pair that the exact final predicate accepts
    from datetime import datetime as dt

    base = dt(2026, 1, 1, 12, 0, 0)
    width = 1e-4  # 100 microseconds
    left = spark.createDataFrame(
        [(1, base.replace(microsecond=200))],
        "user_id BIGINT, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [(1, base.replace(microsecond=300)), (1, base.replace(microsecond=301))],
        "user_id BIGINT, ts TIMESTAMP",
    )
    got = {
        r["b_ts"].microsecond
        for r in range_join(
            left, right, width_seconds=width, on="ts", by="user_id"
        ).collect()
    }
    assert got == {300}  # |gap| = 100 µs qualifies; 101 µs does not


def test_asof_bucketed_rejects_nearest(spark):
    left, right = _hot_key_frames(spark)
    import pytest

    with pytest.raises(ValueError):
        asof_join_bucketed(left, right, direction="nearest")


def test_asof_on_type_mismatch_raises(spark):
    # a left/right 'on' type mismatch would silently convert one side
    # through the wrong basis — it must fail loudly instead
    import pytest
    from pyspark.sql import functions as F

    from pagerank_mapreduce_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2026-01-01 00:00:00")], "user_id bigint, ts string"
    ).select("user_id", F.col("ts").cast("timestamp_ntz").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2026-01-01 00:00:00", 1.0)], "user_id bigint, ts string, value double"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    with pytest.raises(ValueError, match="type mismatch"):
        asof_join(left, right)


def test_resample_carry_forward_known(spark):
    from datetime import datetime

    from pagerank_mapreduce_spark.operators.asof import (
        resample_carry_forward,
    )

    rows = [
        (1, datetime(2026, 1, 1, 0, 30), 10.0, 1),
        (1, datetime(2026, 1, 1, 2, 0), 20.0, 2),  # exactly on grid
        (1, datetime(2026, 1, 1, 3, 45), 30.0, 3),
        (2, datetime(2026, 1, 1, 5, 15), 7.0, 4),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, value double, event_id bigint"
    )
    out = {
        (r.user_id, r.grid_ts.hour): r.value
        for r in resample_carry_forward(
            df, "ts", "user_id", "value", "1 hour", "event_id"
        ).collect()
    }
    # hour 0 grid point (00:00) precedes the first observation -> dropped
    assert (1, 0) not in out
    assert out[(1, 1)] == 10.0  # carried
    assert out[(1, 2)] == 20.0  # boundary observation included
    assert out[(1, 3)] == 20.0  # 3:00 before the 3:45 reading
    assert out[(1, 4)] == 30.0  # trailing step covers the last reading
    assert out[(2, 6)] == 7.0  # single-reading key still represented
    assert (2, 5) not in out  # 5:00 precedes its first observation
    assert len(out) == 5


def test_resample_same_instant_tiebreak(spark):
    from datetime import datetime

    from pagerank_mapreduce_spark.operators.asof import (
        resample_carry_forward,
    )

    t = datetime(2026, 1, 1, 1, 0)
    df = spark.createDataFrame(
        [(1, t, 5.0, 10), (1, t, 9.0, 11)],
        "user_id bigint, ts timestamp, value double, event_id bigint",
    )
    out = resample_carry_forward(
        df, "ts", "user_id", "value", "1 hour", "event_id"
    ).collect()
    # the LAST observation in event_id order wins the carry, at the
    # boundary grid point and the trailing one
    assert len(out) == 2 and {r.value for r in out} == {9.0}


def test_resample_ignores_null_timestamps(spark):
    from datetime import datetime

    from pagerank_mapreduce_spark.operators.asof import (
        resample_carry_forward,
    )

    df = spark.createDataFrame(
        [
            (1, datetime(2026, 1, 1, 1, 30), 5.0, 1),
            (1, None, 99.0, 2),
        ],
        "user_id bigint, ts timestamp, value double, event_id bigint",
    )
    out = resample_carry_forward(
        df, "ts", "user_id", "value", "1 hour", "event_id"
    ).collect()
    assert all(r.value == 5.0 for r in out) and len(out) == 1


def test_resample_interpolate_known(spark):
    from datetime import datetime

    from pagerank_mapreduce_spark.operators.asof import resample_interpolate

    rows = [
        (1, datetime(2026, 1, 1, 0, 30), 10.0, 1),
        (1, datetime(2026, 1, 1, 2, 0), 20.0, 2),   # exactly on grid
        (1, datetime(2026, 1, 1, 3, 0), 50.0, 3),   # exactly on grid
        (2, datetime(2026, 1, 1, 5, 15), 7.0, 4),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, value double, event_id bigint"
    )
    out = {
        (r.user_id, r.grid_ts.hour): r.value
        for r in resample_interpolate(
            df, "ts", "user_id", "value", "1 hour", "event_id"
        ).collect()
    }
    # 01:00 lies 30/90 of the way from 00:30(10) to 02:00(20)
    assert abs(out[(1, 1)] - (10.0 + 10.0 * (30 / 90))) < 1e-9
    assert out[(1, 2)] == 20.0  # exact observation instant
    assert out[(1, 3)] == 50.0  # exact observation instant (last obs)
    # 00:00 precedes the first obs; 04:00 follows the last -> dropped
    assert (1, 0) not in out and (1, 4) not in out
    # single-reading key: no grid instant coincides with 05:15 -> empty
    assert not any(u == 2 for u, _ in out)


def test_resample_interpolate_same_instant_ties_use_last(spark):
    from datetime import datetime

    from pagerank_mapreduce_spark.operators.asof import resample_interpolate

    rows = [
        (1, datetime(2026, 1, 1, 1, 0), 5.0, 1),
        (1, datetime(2026, 1, 1, 1, 0), 9.0, 2),  # same instant, later id
        (1, datetime(2026, 1, 1, 2, 0), 19.0, 3),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, value double, event_id bigint"
    )
    out = {
        r.grid_ts.hour: r.value
        for r in resample_interpolate(
            df, "ts", "user_id", "value", "1 hour", "event_id"
        ).collect()
    }
    assert out[1] == 9.0  # exact instant takes the tiebreak-last value
    assert out[2] == 19.0


def test_asof_randomized_against_python_model(spark):
    # fuzz all three directions (+ tolerance) against a brute-force
    # Python model on random second-granularity series with same-
    # instant ties and keys missing from either side
    import random

    rng = random.Random(29)
    for trial in range(3):
        left = [
            (rng.randrange(5), datetime(2026, 1, 1, 0, 0, rng.randrange(60)), i)
            for i in range(40)
        ]
        right = [
            (rng.randrange(6), datetime(2026, 1, 1, 0, 0, rng.randrange(60)),
             float(rng.randrange(1000)))
            for _ in range(40)
        ]
        ldf = spark.createDataFrame(left, "user_id bigint, ts timestamp, lid bigint")
        rdf = spark.createDataFrame(right, "user_id bigint, ts timestamp, value double")

        # pre-reduce ties like the operator: one row per (key, ts),
        # max payload struct
        best = {}
        for k, t, v in right:
            cur = best.get((k, t))
            if cur is None or v > cur:
                best[(k, t)] = v
        rr = [(k, t, v) for (k, t), v in best.items()]

        def model(direction, tolerance=None):
            out = {}
            for k, t, lid in left:
                cands = []
                for k2, t2, v in rr:
                    if k2 != k:
                        continue
                    dt = (t2 - t).total_seconds()
                    if direction == "backward" and t2 <= t:
                        cands.append((t2, v))
                    elif direction == "forward" and t2 >= t:
                        cands.append((t2, v))
                    elif direction == "nearest":
                        cands.append((abs(dt), 0 if t2 <= t else 1, t2, v))
                if not cands:
                    out[lid] = None
                    continue
                if direction == "backward":
                    t2, v = max(cands)
                elif direction == "forward":
                    t2, v = min(cands)
                else:
                    _, _, t2, v = min(cands)
                if tolerance is not None and abs((t2 - t).total_seconds()) > tolerance:
                    v = None
                out[lid] = v
            return out

        for direction in ("backward", "forward", "nearest"):
            got = {
                r["lid"]: r["r_value"]
                for r in asof_join(ldf, rdf, direction=direction).collect()
            }
            assert got == model(direction), (trial, direction)
        got = {
            r["lid"]: r["r_value"]
            for r in asof_join(ldf, rdf, tolerance=5.0).collect()
        }
        assert got == model("backward", tolerance=5.0), (trial, "tolerance")


def test_cusum_alerts_hand_computed(spark):
    from pyspark.sql import functions as F

    from pagerank_mapreduce_spark.operators.sessions import cusum_alerts

    # user 1: values 9,9,9 vs target 5 -> S = 4, 8, 12; crosses 10 at
    # the 3rd observation. user 2: dips below clamp then recovers:
    # 1 -> S=0 (clamped), 9 -> 4, 2 -> 1 -> never crosses.
    rows = [
        (1, 1, "2024-01-01 00:00:00", 9.0),
        (2, 1, "2024-01-01 01:00:00", 9.0),
        (3, 1, "2024-01-01 02:00:00", 9.0),
        (4, 2, "2024-01-01 00:00:00", 1.0),
        (5, 2, "2024-01-01 01:00:00", 9.0),
        (6, 2, "2024-01-01 02:00:00", 2.0),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "value"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["user_id"]: r
        for r in cusum_alerts(
            df, "ts", "user_id", "value", 5.0, 10.0, "event_id"
        ).collect()
    }
    assert got[1]["max_cusum"] == 12.0 and got[1]["alert_at"] == 3
    assert got[1]["alert"] is True and got[1]["n"] == 3
    assert got[2]["max_cusum"] == 4.0 and got[2]["alert_at"] is None
    assert got[2]["alert"] is False
    # NULL value rows are excluded, not folded as zeros
    df2 = df.withColumn(
        "value", F.when(F.col("event_id") == 2, None).otherwise(F.col("value"))
    )
    g2 = {
        r["user_id"]: r
        for r in cusum_alerts(
            df2, "ts", "user_id", "value", 5.0, 10.0, "event_id"
        ).collect()
    }
    assert g2[1]["n"] == 2 and g2[1]["max_cusum"] == 8.0


def test_seasonal_decompose_recovers_pure_daily_pattern(spark):
    # a series that is EXACTLY a repeating daily shape must decompose
    # into constant trend + the shape + zero residual — and the
    # integer micro-unit arithmetic makes "zero" exact, not approx
    import datetime as dt

    from pagerank_mapreduce_spark.operators.sessions import (
        seasonal_decompose_hourly,
    )

    pattern = [h % 6 + 1 for h in range(24)]  # counts 1..6 by hour
    rows = []
    eid = 0
    t0 = dt.datetime(2024, 3, 1)
    for day in range(6):
        for h in range(24):
            for _ in range(pattern[h]):
                rows.append(
                    (eid, t0 + dt.timedelta(days=day, hours=h), "a")
                )
                eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    out = seasonal_decompose_hourly(ev).collect()
    mid = [r for r in out if r["trend"] is not None]
    assert mid, "no full centered windows"
    daily_mean = sum(pattern) / 24
    for r in mid:
        # trend = the daily mean everywhere (up to the 1e-6 quantum)
        assert abs(r["trend"] - daily_mean) < 2e-6, r
        # decomposition identity, exactly, in micro-units
        assert r["resid"] == 0.0, r
        assert abs(r["cnt"] - (r["trend"] + r["seasonal"])) < 2e-6, r
    # edges without a full centered window carry NULLs
    assert any(r["trend"] is None for r in out)


def test_ewma_hand_computed_and_init(spark):
    # E_1 = x_1 (no zero-seeding bias); constant series stays at the
    # constant; hand-fold a short series
    from pagerank_mapreduce_spark.operators.sessions import ewma_smooth

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, float(v))
        for i, v in enumerate([10.0, 0.0, 0.0, 0.0])
    ] + [(10 + i, t0 + dt.timedelta(minutes=i), 2, 7.0) for i in range(3)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    out = {r["user_id"]: r for r in
           ewma_smooth(df, "ts", "user_id", "value", 0.2, "event_id")
           .collect()}
    # user 1: 10 -> 8 -> 6.4 -> 5.12 (alpha=0.2 fold from E_1 = x_1)
    e = 10.0
    for v in (0.0, 0.0, 0.0):
        e = (0.2 * v) + (0.8 * e)
    assert out[1]["ewma_last"] == round(e, 6) == 5.12
    assert out[1]["ewma_max"] == 10.0
    assert out[1]["n"] == 4
    # constant series: EWMA pinned at the constant, exactly
    assert out[2]["ewma_last"] == 7.0 and out[2]["ewma_max"] == 7.0


def test_fold_engine_cross_batch_state_carrying(spark):
    # the mapInPandas fold carries per-key state across Arrow batch
    # boundaries inside a partition; force 7-row batches so a single
    # key's series is guaranteed to span several batches, and compare
    # against a plain in-memory fold. Also pins that a key whose rows
    # straddle the batch seam is emitted exactly once.
    import random

    from pagerank_mapreduce_spark.operators.sessions import ewma_smooth

    rng = random.Random(11)
    rows = []
    for uid in range(6):
        for i in range(rng.randint(1, 60)):
            rows.append((uid, i, float(rng.randint(-5, 50))))
    df = spark.createDataFrame(rows, "user_id long, t long, v double")
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        got = {
            r.user_id: (r.n, r.ewma_last, r.ewma_max)
            for r in ewma_smooth(df, "t", "user_id", "v", 0.2).collect()
        }
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", prev
        )
    a, b = 0.2, 0.8
    series = {}
    for uid, t, v in sorted(rows):
        e, mx, n = series.get(uid, (None, None, 0))
        e = v if e is None else (a * v) + (b * e)
        mx = e if mx is None or e > mx else mx
        series[uid] = (e, mx, n + 1)
    want = {
        uid: (n, round(e, 6), round(mx, 6))
        for uid, (e, mx, n) in series.items()
    }
    assert got == want


def test_fold_smoothers_skip_nan_and_null_keys(spark):
    # round-11 parity fixes: (a) a literal NaN double (which passes
    # isNotNull) is SKIPPED by all three batch folds exactly like
    # their streaming twins — folded results and n must equal the
    # NaN-free series; (b) a NULL key row is dropped, not turned into
    # one output row per input row (the NaN-key chunk-boundary bug)
    import math

    from pyspark.sql import functions as F

    from pagerank_mapreduce_spark.operators.sessions import (
        cusum_alerts,
        ewma_smooth,
        holt_smooth,
    )

    clean_rows = [
        (1, 1, "2024-01-01 00:00:00", 9.0),
        (3, 1, "2024-01-01 02:00:00", 7.0),
        (4, 1, "2024-01-01 03:00:00", 8.0),
    ]
    dirty_rows = clean_rows + [
        (2, 1, "2024-01-01 01:00:00", float("nan")),  # NaN mid-series
        (5, None, "2024-01-01 00:00:00", 4.0),        # NULL key
        (6, None, "2024-01-01 01:00:00", 5.0),
    ]
    schema = "event_id long, user_id long, ts string, value double"
    clean = spark.createDataFrame(clean_rows, schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    dirty = spark.createDataFrame(dirty_rows, schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    for op, args in (
        (cusum_alerts, ("ts", "user_id", "value", 5.0, 10.0, "event_id")),
        (ewma_smooth, ("ts", "user_id", "value", 0.3, "event_id")),
        (holt_smooth, ("ts", "user_id", "value", 0.5, 0.25, "event_id")),
    ):
        a = sorted(map(tuple, op(clean, *args).collect()))
        b = sorted(map(tuple, op(dirty, *args).collect()))
        assert a == b, (op.__name__, a, b)
        assert len(b) == 1  # null-key rows emit NOTHING
        assert not any(
            isinstance(x, float) and math.isnan(x) for x in b[0]
        )


def test_holt_winters_hand_computed_and_first_cycle_is_holt(spark):
    # Winters 1960 additive, period 2, alpha .5 beta .25 gamma .25 on
    # [10, 12, 14, 10] — every intermediate is a dyadic rational so
    # the hand computation is exact:
    #   t1: l=10 b=0 s=[0,0]
    #   t2 (p=1): l=11, b=.25, s[1]=.25
    #   t3 (p=0): l=12.625, b=.59375, s[0]=.34375
    #   t4 (p=1): l=11.484375, b=.16015625, s[1]=-.18359375
    #   season_next = s[4 % 2 = 0] = .34375
    from pyspark.sql import functions as F

    from pagerank_mapreduce_spark.operators.sessions import (
        holt_smooth,
        holt_winters_smooth,
    )

    rows = [
        (i + 1, 1, f"2024-01-01 0{i}:00:00", v)
        for i, v in enumerate([10.0, 12.0, 14.0, 10.0])
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = holt_winters_smooth(
        df, "ts", "user_id", "value", 2, 0.5, 0.25, 0.25, "event_id"
    ).collect()[0]
    assert (
        got["n"],
        got["level_last"],
        got["trend_last"],
        got["season_next"],
        got["forecast_1"],
    ) == (4, 11.484375, 0.160156, 0.34375, 11.988281), got

    # zero-seasonal init: for the first period+1 observations every
    # seasonal READ is still 0, so level/trend are EXACTLY Holt's —
    # the degeneracy that makes the init convention predictable
    hw = holt_winters_smooth(
        df, "ts", "user_id", "value", 3, 0.5, 0.25, 0.25, "event_id"
    ).collect()[0]  # 4 observations = period+1
    h = holt_smooth(
        df, "ts", "user_id", "value", 0.5, 0.25, "event_id"
    ).collect()[0]
    assert (hw["level_last"], hw["trend_last"]) == (
        h["level_last"], h["trend_last"],
    )
    import pytest

    with pytest.raises(ValueError):
        holt_winters_smooth(df, "ts", "user_id", "value", 0)
