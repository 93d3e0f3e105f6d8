"""As-of and range joins — time-series operators Spark lacks.

Neither exists in the reference (strictly batch KV MapReduce) nor as
a Spark built-in; both are staples of event/market data pipelines,
so the engine provides them as compositions of built-in operators —
no UDF, no cross product, scale-clean shuffles.

**as-of join** (``asof_join``): for each left row, the single right
row with the largest ``on`` ≤ left's ``on`` (direction="backward";
"forward" = smallest ≥) within the same ``by`` key. Implemented as
union → one hash shuffle on the key → per-key sort → running
``last(payload, ignorenulls)`` window. Cost: ONE exchange + sort
over |L|+|R| rows — never the |L|×|R| pair space; a merge of
pre-sorted inputs, exactly how kdb/pandas do it serially.

**range join** (``range_join``): all (a, b) pairs within the same
``by`` key whose ``on`` values differ by at most ``width``.
Implemented by time-bucketing both sides at ``width`` granularity
and equi-joining on (key, bucket) with the left side exploded to its
3 adjacent buckets, then exact-filtering. |candidates| ≈ 3·|pairs
per bucket| instead of |L|×|R| per key.

Skew: both shuffle on the ``by`` key; a pathologically hot key
(half the stream from one user) concentrates its sort/join on one
task. Window partitions are invisible to AQE's skew handling, so the
engine ships the mitigation composed: :func:`asof_join_bucketed`
salts the window key with a coarse time bucket and restores
exactness with a cross-boundary carry — same results, hot key spread
over |buckets| tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, TimestampNTZType, TimestampType


def _exact_on(col: Column, dtype: DataType) -> Column:
    """Gap-arithmetic basis for an ``on`` column: integer
    microseconds for timestamps — double epoch-seconds carry ~0.25 µs
    of ulp at 2026 epochs, enough to flip a ``gap <= tolerance``
    comparison exactly at the boundary — and the column's own value
    for numeric types.

    TIMESTAMP_NTZ is converted from its FIELDS (datediff + hour/
    minute/second extraction), never via ``cast("timestamp")``: the
    cast routes through the session time zone, which is non-monotonic
    across a DST spring-forward (a later wall-clock NTZ can map to an
    earlier instant), corrupting gaps and bucket assignment. Field
    extraction is wall-clock-pure, matching the DuckDB oracles'
    ``date_diff('microsecond', ...)`` local-datetime semantics."""
    if isinstance(dtype, TimestampNTZType):
        days = F.datediff(
            F.to_date(col), F.lit("1970-01-01").cast("date")
        ).cast("long")
        sec_frac = F.date_part(F.lit("SECOND"), col)  # decimal w/ fraction
        return (
            days * F.lit(86_400_000_000)
            + F.hour(col).cast("long") * F.lit(3_600_000_000)
            + F.minute(col).cast("long") * F.lit(60_000_000)
            + (sec_frac * 1_000_000).cast("long")
        )
    if isinstance(dtype, TimestampType):
        return F.unix_micros(col)
    return col


def _tolerance_lit(tolerance: float, dtype: DataType) -> Column:
    """``tolerance`` scaled to the same units as :func:`_exact_on`:
    seconds → integer microseconds for timestamps, pass-through for
    numeric ``on`` columns."""
    if isinstance(dtype, (TimestampType, TimestampNTZType)):
        return F.lit(int(round(float(tolerance) * 1_000_000)))
    return F.lit(float(tolerance))


def _shared_on_type(left: DataFrame, right: DataFrame, on: str) -> DataType:
    """The ``on`` column's type, required identical on both inputs.

    The exact-arithmetic basis (:func:`_exact_on`) is type-directed;
    applying the right side's basis to a left side of a different
    type (e.g. TIMESTAMP vs TIMESTAMP_NTZ) would convert the left
    through the session time zone — the non-monotonic DST hazard the
    basis exists to avoid — and silently drop or add boundary
    matches. Mismatches fail loudly instead."""
    lt, rt = left.schema[on].dataType, right.schema[on].dataType
    if lt != rt:
        raise ValueError(
            f"'on' column {on!r} type mismatch: left {lt.simpleString()} "
            f"vs right {rt.simpleString()} — cast one side explicitly"
        )
    return rt


# Public aliases: these helpers have cross-module consumers
# (operators.sessions builds its gap arithmetic on the same exact
# basis) — the underscore names remain for in-module brevity.
exact_on = _exact_on
tolerance_lit = _tolerance_lit


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    direction: str = "backward",
    prefix: str = "r_",
    tolerance: float | None = None,
) -> DataFrame:
    """Left as-of join; right payload columns come back ``prefix``ed
    (NULL where no right row qualifies).

    Ties inside ``right`` on (by, on) are resolved deterministically
    by pre-reducing right to one row per (by, on) via max over the
    payload struct — same rule DuckDB's ASOF applies after its
    greatest-ts selection.

    ``tolerance`` (pandas ``merge_asof`` semantics): the matched
    right row must additionally lie within ``tolerance`` of the left
    timestamp — in seconds when ``on`` is a timestamp, in ``on``'s
    own units when numeric. A nearest-in-direction row beyond the
    gap yields NULL (it does not fall back to an older row). Free at
    scale: the right timestamp rides the carried struct, so the gap
    check is a post-window projection — no extra shuffle.
    """
    if direction == "nearest":
        return _asof_nearest(left, right, on, by, prefix, tolerance)
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward', 'forward' or 'nearest'")
    payload_cols = [c for c in right.columns if c not in (by, on)]
    rp = F.struct(*[F.col(c) for c in payload_cols])
    # NULL-timestamp right rows can never be an as-of match (DuckDB
    # ASOF and pandas merge_asof both drop them); without this filter
    # they sort nulls-FIRST under the backward ascending order and
    # would be carried as a bogus "-infinity" match
    right_u = (
        right.filter(F.col(on).isNotNull())
        .groupBy(by, on)
        .agg(F.max(rp).alias("_rp"))
    )
    on_type = _shared_on_type(left, right, on)
    if tolerance is not None:
        # carry the right timestamp (exact units) with the payload
        # for the gap check
        right_u = right_u.select(
            by,
            on,
            F.struct(
                _exact_on(F.col(on), on_type).alias("_rt"),
                F.col("_rp").alias("_pl"),
            ).alias("_rp"),
        )
    rp_type = right_u.schema["_rp"].dataType

    lp = F.struct(*[F.col(c) for c in left.columns])
    l2 = left.select(
        F.col(by).alias("_k"),
        F.col(on).alias("_t"),
        F.lit(1).alias("_side"),
        lp.alias("_lp"),
        F.lit(None).cast(rp_type).alias("_rp"),
    )
    lp_type = l2.schema["_lp"].dataType
    r2 = right_u.select(
        F.col(by).alias("_k"),
        F.col(on).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lp_type).alias("_lp"),
        F.col("_rp"),
    )
    # backward: ascending time, right (side 0) sorts before left at
    # equal timestamps so an exactly-simultaneous right row is
    # visible. forward: descending time, same tie rule.
    order = (
        [F.col("_t").asc(), F.col("_side").asc()]
        if direction == "backward"
        else [F.col("_t").desc(), F.col("_side").asc()]
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = (
        l2.unionByName(r2)
        .withColumn("_carried", F.last("_rp", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        # a NULL-timestamp LEFT row matches nothing (under forward's
        # descending order nulls sort last and would otherwise see
        # every right row as "preceding")
        .withColumn(
            "_carried", F.when(F.col("_t").isNotNull(), F.col("_carried"))
        )
    )
    if tolerance is not None:
        gap = F.abs(_exact_on(F.col("_t"), on_type) - F.col("_carried._rt"))
        joined = joined.withColumn(
            "_carried",
            F.when(gap <= _tolerance_lit(tolerance, on_type), F.col("_carried._pl")),
        )
    out_cols = [F.col(f"_lp.{c}").alias(c) for c in left.columns] + [
        F.col(f"_carried.{c}").alias(f"{prefix}{c}") for c in payload_cols
    ]
    return joined.select(*out_cols)


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    direction: str = "backward",
    prefix: str = "r_",
    tolerance: float | None = None,
    bucket_seconds: float = 3600.0,
) -> DataFrame:
    """Skew-safe as-of join: identical semantics to :func:`asof_join`
    (directions "backward"/"forward"), but the window key is salted
    with a coarse time bucket — ``(by, floor(on / bucket_seconds))``
    — so a pathologically hot ``by`` key (half the stream from one
    user) no longer serializes its sort/carry on a single task.
    Window partitions are invisible to AQE skew handling, so this is
    the one operator where that salt must be composed by hand.

    Exactness across bucket boundaries is restored with a two-pass
    carry:

    1. within each (key, bucket): the plain running
       ``last(ignorenulls)`` carry;
    2. per (key, bucket), the boundary right row (latest for
       backward, earliest for forward) is reduced to a one-row
       summary; a second window over that *tiny* bucket relation
       (rows = distinct buckets per key, ``rowsBetween(…, -1)`` so a
       bucket never sees itself) computes the carry *entering* each
       bucket, which is equi-joined back on (key, bucket) and
       coalesced under the within-bucket carry.

    Cost: the same single wide shuffle as the plain path but on the
    salted key, plus one window+join over the bucket summary — a
    relation ~|buckets| in size (a year of one hot key at 1-hour
    buckets is 8 760 rows). Pick ``bucket_seconds`` so the hot key's
    rows-per-bucket is around your target partition size.

    direction="nearest" is not offered here: it needs both carries
    and the salt would double the boundary machinery — use the plain
    path, which is only skewed if one ``by`` key dominates *and*
    needs nearest semantics."""
    if direction not in ("backward", "forward"):
        raise ValueError(
            "asof_join_bucketed supports direction 'backward' or 'forward'"
        )
    backward = direction == "backward"
    on_type = _shared_on_type(left, right, on)
    payload_cols = [c for c in right.columns if c not in (by, on)]
    rp = F.struct(*[F.col(c) for c in payload_cols])
    # NULL-timestamp right rows match nothing — see asof_join
    right_u = (
        right.filter(F.col(on).isNotNull())
        .groupBy(by, on)
        .agg(F.max(rp).alias("_pl"))
        .select(
            by,
            on,
            F.struct(
                _exact_on(F.col(on), on_type).alias("_rt"), F.col("_pl")
            ).alias("_rp"),
        )
    )
    rp_type = right_u.schema["_rp"].dataType

    if isinstance(on_type, (TimestampType, TimestampNTZType)):
        width = F.lit(int(round(float(bucket_seconds) * 1_000_000)))
    else:
        width = F.lit(float(bucket_seconds))

    def _bucket(c: Column) -> Column:
        return F.floor(_exact_on(c, on_type) / width).cast("long")

    lp = F.struct(*[F.col(c) for c in left.columns])
    l2 = left.select(
        F.col(by).alias("_k"),
        F.col(on).alias("_t"),
        _bucket(F.col(on)).alias("_b"),
        F.lit(1).alias("_side"),
        lp.alias("_lp"),
        F.lit(None).cast(rp_type).alias("_rp"),
    )
    lp_type = l2.schema["_lp"].dataType
    r2 = right_u.select(
        F.col(by).alias("_k"),
        F.col(on).alias("_t"),
        _bucket(F.col(on)).alias("_b"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lp_type).alias("_lp"),
        F.col("_rp"),
    )
    u = l2.unionByName(r2)
    order = (
        [F.col("_t").asc(), F.col("_side").asc()]
        if backward
        else [F.col("_t").desc(), F.col("_side").asc()]
    )
    w_in = (
        Window.partitionBy("_k", "_b")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_cin", F.last("_rp", ignorenulls=True).over(w_in))

    # pass 2: boundary right row per (key, bucket) → carry entering
    # each bucket. Struct max/min orders by the leading _rt field.
    bx = F.struct(F.col("_rp._rt").alias("_o"), F.col("_rp").alias("_s"))
    rsum = (
        r2.groupBy("_k", "_b")
        .agg((F.max(bx) if backward else F.min(bx)).alias("_bx"))
        .select("_k", "_b", F.col("_bx._s").alias("_brp"))
    )
    buckets = u.select("_k", "_b").distinct()
    w_x = (
        Window.partitionBy("_k")
        .orderBy(F.col("_b").asc() if backward else F.col("_b").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # joins back on (_k, _b) are NULL-SAFE: the plain path's window
    # partitionBy groups NULL keys together and carries their matches,
    # so the bucketed path must too — a plain equi-join would drop
    # every NULL-keyed carry and diverge from the documented
    # plain-path equivalence (still a hash-partitionable condition,
    # not a nested loop)
    entering = (
        buckets.alias("bk")
        .join(
            rsum.alias("rs"),
            F.col("bk._k").eqNullSafe(F.col("rs._k"))
            & F.col("bk._b").eqNullSafe(F.col("rs._b")),
            "left",
        )
        .select(
            F.col("bk._k").alias("_k"),
            F.col("bk._b").alias("_b"),
            F.col("rs._brp").alias("_brp"),
        )
        .withColumn("_cent", F.last("_brp", ignorenulls=True).over(w_x))
        .select("_k", "_b", "_cent")
    )

    j = (
        u.filter(F.col("_side") == 1)
        .alias("ul")
        .join(
            entering.alias("en"),
            F.col("ul._k").eqNullSafe(F.col("en._k"))
            & F.col("ul._b").eqNullSafe(F.col("en._b")),
            "left",
        )
        .select("ul.*", F.col("en._cent").alias("_cent"))
        .withColumn("_carried", F.coalesce(F.col("_cin"), F.col("_cent")))
        # NULL-timestamp left rows match nothing — mirrors asof_join
        .withColumn(
            "_carried", F.when(F.col("_t").isNotNull(), F.col("_carried"))
        )
    )
    if tolerance is not None:
        gap = F.abs(_exact_on(F.col("_t"), on_type) - F.col("_carried._rt"))
        j = j.withColumn(
            "_carried",
            F.when(
                gap <= _tolerance_lit(tolerance, on_type), F.col("_carried")
            ),
        )
    out_cols = [F.col(f"_lp.{c}").alias(c) for c in left.columns] + [
        F.col(f"_carried._pl.{c}").alias(f"{prefix}{c}") for c in payload_cols
    ]
    return j.select(*out_cols)


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    prefix: str,
    tolerance: float | None,
) -> DataFrame:
    """direction="nearest": the right row minimizing |gap|, ties →
    backward (pandas merge_asof rule). Both directional carries are
    computed over the SAME union frame with two window passes (one
    ascending, one descending — two sorts, still one shuffle on the
    key, never a pair space); the winner is a per-row projection."""
    payload_cols = [c for c in right.columns if c not in (by, on)]
    on_type = _shared_on_type(left, right, on)
    rp = F.struct(*[F.col(c) for c in payload_cols])
    # NULL-timestamp right rows match nothing — see asof_join
    right_u = (
        right.filter(F.col(on).isNotNull())
        .groupBy(by, on)
        .agg(F.max(rp).alias("_pl"))
        .select(
            by,
            on,
            F.struct(
                _exact_on(F.col(on), on_type).alias("_rt"), F.col("_pl")
            ).alias("_rp"),
        )
    )
    rp_type = right_u.schema["_rp"].dataType
    lp = F.struct(*[F.col(c) for c in left.columns])
    l2 = left.select(
        F.col(by).alias("_k"),
        F.col(on).alias("_t"),
        F.lit(1).alias("_side"),
        lp.alias("_lp"),
        F.lit(None).cast(rp_type).alias("_rp"),
    )
    lp_type = l2.schema["_lp"].dataType
    r2 = right_u.select(
        F.col(by).alias("_k"),
        F.col(on).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lp_type).alias("_lp"),
        F.col("_rp"),
    )
    wb = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").desc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    j = (
        l2.unionByName(r2)
        .withColumn("_cb", F.last("_rp", ignorenulls=True).over(wb))
        .withColumn("_cf", F.last("_rp", ignorenulls=True).over(wf))
        .filter(F.col("_side") == 1)
    )
    t = _exact_on(F.col("_t"), on_type)
    gb = F.abs(t - F.col("_cb._rt"))
    gf = F.abs(t - F.col("_cf._rt"))
    chosen = (
        F.when(F.col("_cb").isNull(), F.col("_cf"))
        .when(F.col("_cf").isNull(), F.col("_cb"))
        .when(gf < gb, F.col("_cf"))
        .otherwise(F.col("_cb"))
    )
    # NULL-timestamp left rows match nothing (they sort nulls-last
    # under the forward descending order and would pick up _cf)
    j = j.withColumn("_c", F.when(F.col("_t").isNotNull(), chosen))
    if tolerance is not None:
        j = j.withColumn(
            "_c",
            F.when(
                F.abs(t - F.col("_c._rt"))
                <= _tolerance_lit(tolerance, on_type),
                F.col("_c"),
            ),
        )
    out_cols = [F.col(f"_lp.{c}").alias(c) for c in left.columns] + [
        F.col(f"_c._pl.{c}").alias(f"{prefix}{c}") for c in payload_cols
    ]
    return j.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    width_seconds: float,
    on: str = "ts",
    by: str = "user_id",
    l_prefix: str = "a_",
    r_prefix: str = "b_",
) -> DataFrame:
    """All (left, right) pairs with the same ``by`` key and
    ``|left.on - right.on| <= width_seconds``. Equi-join on
    (key, time-bucket) with a 3-bucket explosion of the left side,
    then the exact predicate — never a per-key cross product."""
    # buckets are computed on the SAME exact basis as the final
    # predicate (integer microseconds for timestamps): with a
    # double-seconds basis, a sub-second width at 2026 epochs carries
    # enough ulp error to push a boundary row one bucket over, where
    # the ±1 explosion no longer reaches it — a silently dropped
    # qualifying pair. On the exact basis the explosion really does
    # cover every |gap| <= width candidate.
    on_type = _shared_on_type(left, right, on)
    if isinstance(on_type, (TimestampType, TimestampNTZType)):
        width = F.lit(int(round(float(width_seconds) * 1_000_000)))
    else:
        width = F.lit(float(width_seconds))

    def _bucket(c: Column) -> Column:
        return F.floor(_exact_on(c, on_type) / width).cast("long")

    bucket = _bucket(F.col(on))
    l2 = left.select(
        F.col(by).alias("_k"),
        F.col(on).alias("_lt"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lp"),
        F.explode(
            F.array(bucket - 1, bucket, bucket + 1)
        ).alias("_b"),
    )
    r2 = right.select(
        F.col(by).alias("_k2"),
        F.col(on).alias("_rt"),
        F.struct(*[F.col(c) for c in right.columns]).alias("_rp2"),
        _bucket(F.col(on)).alias("_b2"),
    )
    pairs = l2.join(
        r2, (F.col("_k") == F.col("_k2")) & (F.col("_b") == F.col("_b2"))
    ).filter(
        F.abs(
            _exact_on(F.col("_lt"), on_type)
            - _exact_on(F.col("_rt"), on_type)
        )
        <= _tolerance_lit(width_seconds, on_type)
    )
    out = [F.col(f"_lp.{c}").alias(f"{l_prefix}{c}") for c in left.columns] + [
        F.col(f"_rp2.{c}").alias(f"{r_prefix}{c}") for c in right.columns
    ]
    return pairs.select(*out)


def resample_carry_forward(
    df: DataFrame,
    on: str,
    by: str,
    value_col: str,
    step: str = "1 hour",
    *tiebreak_cols: str,
) -> DataFrame:
    """Resample an irregular time series onto a regular grid with
    last-observation-carried-forward fill: per ``by`` key, emit one
    row per ``step`` from ``date_trunc`` of the key's first
    observation through its last, valued at the most recent
    observation at-or-before the grid instant. The grid runs from
    ``date_trunc`` of the first observation through one step past
    ``date_trunc`` of the last, so every observation is represented
    by at least one grid point; leading grid points before the first
    observation are dropped rather than emitted NULL. Output:
    (by, grid_ts, value).

    Same family as :func:`asof_join` and shares its scale stance:
    observations and grid points union into ONE relation, ONE shuffle
    on the key, and a single window carry — never a grid×observation
    pair join. The grid explode is bounded by span/step per key; a
    key observed over years at 1-hour steps yields ~10⁴ rows, not a
    join blowup. ``tiebreak_cols`` orders same-instant observations
    (pass a unique id for determinism — the carry takes the LAST in
    that order); observations sort before their exact-instant grid
    point, so a reading at the grid boundary is included.

    NULL timestamps are excluded up front (the module-wide as-of
    convention): engines disagree on NULL placement in window orders,
    and a NULL-instant observation has no defined carry position.
    """
    df = df.filter(F.col(on).isNotNull())
    obs = df.select(
        F.col(by),
        F.col(on).alias("_t"),
        F.col(value_col).alias("_v"),
        F.lit(0).alias("_src"),
        *[F.col(c).alias(f"_tb_{c}") for c in tiebreak_cols],
    )
    step_i = F.expr(f"interval {step}")
    unit = step.split()[-1].rstrip("s")
    grid = (
        df.groupBy(by)
        .agg(F.min(on).alias("_a"), F.max(on).alias("_b"))
        .select(
            F.col(by),
            F.explode(
                F.sequence(
                    F.date_trunc(unit, "_a"),
                    F.date_trunc(unit, "_b") + step_i,
                    step_i,
                )
            ).alias("_t"),
            F.lit(None).cast(df.schema[value_col].dataType).alias("_v"),
            F.lit(1).alias("_src"),
            *[
                F.lit(None)
                .cast(df.schema[c].dataType)
                .alias(f"_tb_{c}")
                for c in tiebreak_cols
            ],
        )
    )
    un = obs.unionByName(grid)
    w = (
        Window.partitionBy(by)
        .orderBy("_t", "_src", *[f"_tb_{c}" for c in tiebreak_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        un.withColumn("_fill", F.last("_v", ignorenulls=True).over(w))
        .filter((F.col("_src") == 1) & F.col("_fill").isNotNull())
        .select(F.col(by), F.col("_t").alias("grid_ts"), F.col("_fill").alias(value_col))
    )


def resample_interpolate(
    df: DataFrame,
    on: str,
    by: str,
    value_col: str,
    step: str = "1 hour",
    *tiebreak_cols: str,
) -> DataFrame:
    """Resample onto a regular grid with LINEAR interpolation between
    the surrounding observations (the gap-fill companion to
    :func:`resample_carry_forward`, which steps):

    ``v(g) = pv + (nv - pv) * (g - pt) / (nt - pt)`` over microsecond
    timestamps, where (pt, pv) is the last observation at-or-before
    the grid instant and (nt, nv) the first strictly after. Grid
    points outside the observed span (no prev, or no next and not
    exactly on an observation) are dropped, not extrapolated; a grid
    point landing exactly on an observation takes that observation's
    value (same-instant ties resolved by ``tiebreak_cols``, last for
    prev / the strictly-later rule for next). NULL timestamps and
    NULL values are excluded up front (module-wide convention).

    Scale stance: identical to carry-forward — obs and grid union
    into ONE relation, ONE shuffle on the key; the forward scan is a
    running window over the ascending sort and the backward scan a
    running window over the DESCENDING sort of the same exchange.
    Never a grid x observation join, and never an
    [currentRow, unboundedFollowing) frame: Spark executes that frame
    by re-scanning the partition remainder per row — O(rows²) per key,
    measured 3.0 s vs 0.78 s at sf0.1 (721-row keys) and quadratically
    worse as per-key spans grow (round-9 profile, SCALE.md). The
    second sort is O(n log n) map-side work on the already-shuffled
    partition — the cheap direction.
    """
    df = df.filter(F.col(on).isNotNull() & F.col(value_col).isNotNull())
    obs = df.select(
        F.col(by),
        F.col(on).alias("_t"),
        F.col(value_col).alias("_v"),
        F.lit(0).alias("_src"),
        *[F.col(c).alias(f"_tb_{c}") for c in tiebreak_cols],
    )
    step_i = F.expr(f"interval {step}")
    unit = step.split()[-1].rstrip("s")
    grid = (
        df.groupBy(by)
        .agg(F.min(on).alias("_a"), F.max(on).alias("_b"))
        .select(
            F.col(by),
            F.explode(
                F.sequence(
                    F.date_trunc(unit, "_a"),
                    F.date_trunc(unit, "_b") + step_i,
                    step_i,
                )
            ).alias("_t"),
            F.lit(None).cast(df.schema[value_col].dataType).alias("_v"),
            F.lit(1).alias("_src"),
            *[
                F.lit(None).cast(df.schema[c].dataType).alias(f"_tb_{c}")
                for c in tiebreak_cols
            ],
        )
    )
    un = obs.unionByName(grid)
    order = [F.col("_t"), F.col("_src")] + [
        F.col(f"_tb_{c}") for c in tiebreak_cols
    ]
    w_fwd = (
        Window.partitionBy(by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the backward scan runs as a RUNNING frame over the exact reverse
    # of the same total order — "first obs at-or-after this row" under
    # asc == "last obs at-or-before this row" under desc; both frames
    # include the current row, which is a NULL-obs grid row wherever
    # the output filter keeps it, so the two forms agree row for row
    w_bwd = (
        Window.partitionBy(by)
        .orderBy(*[c.desc() for c in order])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_obs = F.col("_src") == 0
    ot = F.when(is_obs, F.col("_t"))
    ov = F.when(is_obs, F.col("_v"))
    out = (
        un.withColumn("_pt", F.last(ot, ignorenulls=True).over(w_fwd))
        .withColumn("_pv", F.last(ov, ignorenulls=True).over(w_fwd))
        .withColumn("_nt", F.last(ot, ignorenulls=True).over(w_bwd))
        .withColumn("_nv", F.last(ov, ignorenulls=True).over(w_bwd))
    )
    g_us = F.unix_micros(F.col("_t"))
    p_us = F.unix_micros(F.col("_pt"))
    n_us = F.unix_micros(F.col("_nt"))
    val = F.when(g_us == p_us, F.col("_pv")).otherwise(
        F.col("_pv")
        + (F.col("_nv") - F.col("_pv"))
        * ((g_us - p_us).cast("double") / (n_us - p_us).cast("double"))
    )
    return (
        out.filter(
            (F.col("_src") == 1)
            & F.col("_pt").isNotNull()
            & (F.col("_nt").isNotNull() | (g_us == p_us))
        )
        .select(
            F.col(by), F.col("_t").alias("grid_ts"), val.alias(value_col)
        )
    )
