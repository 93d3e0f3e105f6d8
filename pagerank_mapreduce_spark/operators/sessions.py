"""Batch sessionization + deterministic sampling — event-pipeline
staples with exact cross-engine semantics.

``sessionize`` is the batch twin of the streaming session window
(streaming/windows.py session_counts): it assigns explicit session
numbers with plain window functions, so downstream joins/aggs can
key on (user, session_no). One hash shuffle on the key + per-key
sort — the same cost envelope as any windowed query; state never
accumulates (unlike streaming, where the state store holds open
sessions).

``stratified_sample`` extends the md5-bucket Bernoulli sampling of
rel_hash_sample with per-stratum rates. Hash-keyed sampling is
reproducible across engines, runs, partitionings and retries —
df.sample() is none of those — which is what makes a 100 TB sampling
step idempotently re-runnable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    gap_seconds: int,
    on: str = "ts",
    by: str = "user_id",
    tiebreak: str | None = None,
) -> DataFrame:
    """Append ``session_no`` (0-based per ``by`` key): a new session
    starts when the gap to the previous event exceeds
    ``gap_seconds``. Gap arithmetic is integer microseconds via
    ``asof.exact_on`` — exact at the boundary, and wall-clock-pure
    for TIMESTAMP_NTZ (a session-timezone cast is non-monotonic
    across DST and could split or merge sessions spuriously);
    ``tiebreak`` makes the ordering total when timestamps collide."""
    from pagerank_mapreduce_spark.operators.asof import (
        exact_on,
        tolerance_lit,
    )

    on_type = df.schema[on].dataType
    order = [F.col(on)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(by).orderBy(*order)
    us = exact_on(F.col(on), on_type)
    gap = tolerance_lit(float(gap_seconds), on_type)
    brk = (
        F.when(F.lag(us).over(w).isNull(), 1)
        .when(us - F.lag(us).over(w) > gap, 1)
        .otherwise(0)
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        "session_no", (F.sum(brk).over(wsum) - 1).cast("bigint")
    )


def hash_bucket(*cols: Column | str, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets): first 16 bits of the md5
    of the '-'-joined key columns. md5 exists identically in every
    engine (unlike xxhash64/murmur), so oracles can reproduce it."""
    key = F.concat_ws(
        "-", *[F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in cols]
    )
    return (F.conv(F.substring(F.md5(key), 1, 4), 16, 10).cast("int") % buckets)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, int],
    default_rate: int = 0,
    *key_cols: str,
) -> DataFrame:
    """Keep ~``rates[stratum]``% of each stratum (integers 0-100),
    ``default_rate``% elsewhere, selected by :func:`hash_bucket` over
    ``key_cols`` — per-row deterministic, join-stable, re-runnable."""
    rate = F.lit(default_rate)
    for value, pct in rates.items():
        rate = F.when(F.col(strata_col) == value, F.lit(pct)).otherwise(rate)
    return df.filter(hash_bucket(*key_cols) < rate)


def cap_per_group(
    df: DataFrame, group_col: str, n: int, *key_cols: str
) -> DataFrame:
    """Keep at most ``n`` rows per group, selected in deterministic
    md5-of-key order — the "cap documents per source/domain" pass of
    corpus mixing, reproducible across engines and re-runs (unlike a
    per-group random sample).

    Scale shape: rank-filter windows compile to Spark's
    WindowGroupLimit — each map task pre-prunes its partition to the
    group's top-``n`` BEFORE the shuffle, so a group with 10⁹ rows
    moves at most ``n × num_input_partitions`` rows, not 10⁹. The
    plan pin lives in test_plan_audit.py.
    """
    if not key_cols:
        # without key columns the md5 is a constant and the order has
        # no tiebreaker — the kept subset would depend on task layout,
        # violating the determinism contract above
        raise ValueError("cap_per_group needs at least one key column")
    order = F.md5(
        F.concat_ws(
            "-", *[F.col(c).cast("string") for c in key_cols]
        )
    )
    w = Window.partitionBy(group_col).orderBy(order, *key_cols)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .drop("_rk")
    )


def temperature_resample(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.5,
    *key_cols: str,
) -> DataFrame:
    """Deterministic temperature-based corpus rebalancing: downsample
    each group so the kept distribution follows ``n_g ** alpha``
    (multilingual-sampling style — ``alpha=1`` keeps proportions,
    ``alpha=0`` equalizes groups). The smallest group anchors at
    keep-rate 1, so nothing is upsampled:
    ``rate_g = (min_n / n_g) ** (1 - alpha)``.

    Selection reuses the 16-bit md5 bucket of ``key_cols`` — the same
    engine-portable, re-runnable choice as :func:`hash_bucket` /
    :func:`stratified_sample`, compared against the per-group integer
    threshold ``floor(rate * 65536)``. ``alpha=0.5`` routes through
    ``sqrt`` (IEEE-exact in every engine) so oracles replay the
    thresholds bit-for-bit; other alphas use ``pow``, whose last-ulp
    rounding is *not* standardized — fine operationally, but prefer
    0.5 when a cross-engine hash check matters.

    Scale shape: one algebraic groupBy-count (tiny output: one row
    per group), the minimum folded over that tiny relation, both
    broadcast back onto the corpus — the fact table is touched once,
    filtered map-side, never shuffled.
    """
    if not key_cols:
        raise ValueError("temperature_resample needs at least one key column")
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"temperature_resample: alpha {alpha} not in [0, 1]")
    counts = df.groupBy(group_col).agg(F.count("*").alias("_n"))
    mn = F.broadcast(counts.agg(F.min("_n").alias("_mn")))
    ratio = F.col("_mn").cast("double") / F.col("_n")
    if alpha == 0.5:
        rate = F.sqrt(ratio)
    else:
        rate = F.pow(ratio, F.lit(1.0 - alpha))
    thresholds = F.broadcast(
        counts.crossJoin(mn).select(
            group_col,
            F.floor(rate * 65536).cast("bigint").alias("_thr"),
        )
    )
    key = F.concat_ws(
        "-", *[F.col(c).cast("string") for c in key_cols]
    )
    bucket16 = F.conv(F.substring(F.md5(key), 1, 4), 16, 10).cast("bigint")
    # null-safe equality: groupBy counts NULL as a group of its own,
    # so a NULL-group row must meet its own threshold rather than
    # silently vanishing through a plain inner join
    thr = thresholds.withColumnRenamed(group_col, "_grp")
    return (
        df.join(
            thr,
            F.col(group_col).eqNullSafe(F.col("_grp")),
        )
        .filter(bucket16 < F.col("_thr"))
        .drop("_grp", "_thr")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    *key_cols: str,
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): each row draws the md5-derived
    uniform u of its key columns and ranks by ``ln(u) / weight``
    descending — the top ``n`` constitute an exact weighted sample,
    computed distributed as a single top-n (TakeOrdered — no global
    sort, no per-group state). Weights must be strictly positive.

    The same engine-portability contract as :func:`hash_bucket`: u is
    ``(bucket16 + 1) / 65537`` so it is never 0 or 1, and the rank
    key is one ln + one divide on identical doubles — re-runnable,
    join-stable, and replayable by a SQL oracle.
    """
    if not key_cols:
        raise ValueError("weighted_sample needs at least one key column")
    key = F.concat_ws(
        "-", *[F.col(c).cast("string") for c in key_cols]
    )
    bucket16 = F.conv(F.substring(F.md5(key), 1, 4), 16, 10).cast("bigint")
    u = (bucket16 + 1) / F.lit(65537.0)
    rank_key = F.log(u) / F.col(weight_col)
    return (
        df.withColumn("_es_key", rank_key)
        .orderBy(F.col("_es_key").desc(), *key_cols)
        .limit(n)
        .drop("_es_key")
    )


def _fold_series_by_key(
    src: DataFrame,
    sort_cols: list[str],
    out_schema: str,
    out_cols: list[str],
    make_state,
    fold_chunk,
    finish,
) -> DataFrame:
    """Shared engine for per-key sequential folds (CUSUM, EWMA):
    shuffle once on ``_k``, sort each partition by (``_k``, sort
    columns), then run ONE Arrow kernel per batch with fold state
    carried across batch boundaries inside each partition.

    Why not ``groupBy(..).applyInPandas``: that runner makes one
    Python call + one pandas DataFrame per GROUP, and with thousands
    of small keys (1,500 users at sf0.1) the per-group overhead is
    the entire cost — measured 4.4 s → ~1 s for the EWMA/CUSUM pair
    at sf0.1 by folding all groups inside per-batch kernels instead.
    At 100 TB the same argument holds harder: key count grows with
    data, batch count grows with data / 10k, and the fold is a
    single straight-line pass either way.

    Contract: ``src`` carries the key as ``_k`` and is pre-filtered —
    including ``_k IS NOT NULL``: a null key surfaces as NaN in the
    pandas batch, and NaN != NaN would make the key-change detection
    below treat EVERY null-key row as a fresh key (one output row per
    input row, where the groupBy it replaced emitted one row for the
    whole null group). All three callers filter the key; a new caller
    must too. (``_k``, *sort_cols) must be a total order (the
    module's tiebreak convention), which makes the partition-sorted
    stream — and therefore the fold — deterministic under any
    partitioning.
    ``fold_chunk(state, values)`` consumes one contiguous same-key
    numpy slice in stream order; ``finish(key, state, out)`` appends
    one output row to the ``out`` column lists."""
    import numpy as np
    import pandas as pd

    sentinel = object()

    def gen(batches):
        cur = sentinel
        state = None
        pend = {c: [] for c in out_cols}
        n_pend = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ks = pdf["_k"].to_numpy()
            vs = pdf["_v"].to_numpy()
            change = np.nonzero(ks[1:] != ks[:-1])[0] + 1
            bounds = [0, *change.tolist(), len(ks)]
            for i in range(len(bounds) - 1):
                s0, e0 = bounds[i], bounds[i + 1]
                k = ks[s0]
                if cur is not sentinel and k != cur:
                    finish(cur, state, pend)
                    n_pend += 1
                    state = None
                if state is None:
                    state = make_state()
                fold_chunk(state, vs[s0:e0])
                cur = k
            if n_pend >= 4096:
                yield pd.DataFrame(pend)
                pend = {c: [] for c in out_cols}
                n_pend = 0
        if cur is not sentinel:
            finish(cur, state, pend)
        if pend[out_cols[0]]:
            yield pd.DataFrame(pend)

    ordered = src.repartition(F.col("_k")).sortWithinPartitions(
        F.col("_k").asc_nulls_last(),
        *[F.col(c).asc_nulls_last() for c in sort_cols],
    )
    return ordered.mapInPandas(gen, out_schema)


def cusum_alerts(
    df: DataFrame,
    on: str,
    by: str,
    value_col: str,
    target: float,
    threshold: float,
    *tiebreak_cols: str,
) -> DataFrame:
    """One-sided CUSUM changepoint detection per key (Page 1954)::

        S_0 = 0;  S_i = max(0, S_{i-1} + (x_i - target))

    alerting when S crosses ``threshold`` — the classic sequential
    monitor for a sustained upward shift in a per-key series (the
    changepoint complement to the distributional PSI monitor). Output
    one row per key: (by, n, max_cusum, alert_at, alert) where
    ``alert_at`` is the 1-based observation index of the first
    crossing (NULL if never) under the (on, tiebreak) total order.

    The recurrence's max(0, ·) clamp breaks every prefix-sum
    decomposition (unlike plain cumsum, it is not expressible as a
    window aggregate), so a Python fold is the sanctioned shape —
    run through :func:`_fold_series_by_key` (one Arrow kernel per
    batch, state carried across batches; see that docstring for the
    applyInPandas-overhead A/B). The C-double sequence is exactly
    the order the oracle's recursive CTE replays, so values are
    bit-identical. NULL timestamps/values are excluded up front and
    literal NaN doubles (which pass isNotNull) are skipped inside the
    fold — the streaming twin's exact behavior, so the bit-for-bit
    parity claim holds with NaNs present (module convention)."""
    src = df.filter(
        F.col(by).isNotNull()
        & F.col(on).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(by).alias("_k"),
        F.col(on).alias("_t"),
        F.col(value_col).cast("double").alias("_v"),
        *[F.col(c).alias(f"_tb_{c}") for c in tiebreak_cols],
    )
    sort_cols = ["_t"] + [f"_tb_{c}" for c in tiebreak_cols]
    tgt = float(target)
    thr = float(threshold)

    def make_state():
        # [s, mx, n, alert_at]
        return [0.0, 0.0, 0, None]

    def fold_chunk(st, vs):
        s, mx, n, at = st
        for v in vs:
            if v != v:  # NaN guard: the streaming twin's exact skip
                continue
            n += 1
            s = s + (float(v) - tgt)
            if s < 0.0:
                s = 0.0
            if s > mx:
                mx = s
            if at is None and s > thr:
                at = n
        st[0], st[1], st[2], st[3] = s, mx, n, at

    def finish(k, st, out):
        out["_k"].append(k)
        out["n"].append(st[2])
        out["max_cusum"].append(round(st[1], 6))
        out["alert_at"].append(st[3])
        out["alert"].append(st[3] is not None)

    out_schema = (
        f"_k {dict(df.dtypes)[by]}, n long, max_cusum double, "
        "alert_at long, alert boolean"
    )
    out_cols = ["_k", "n", "max_cusum", "alert_at", "alert"]
    return _fold_series_by_key(
        src, sort_cols, out_schema, out_cols, make_state, fold_chunk,
        finish,
    ).select(
        F.col("_k").alias(by), "n", "max_cusum", "alert_at", "alert"
    )


def seasonal_decompose_hourly(
    events: DataFrame,
    ts_col: str = "ts",
    by: str = "event_type",
    period: int = 24,
    round_to: int = 6,
) -> DataFrame:
    """Classic additive seasonal decomposition of the hourly event-
    count series per ``by`` key: ``count = trend + seasonal + resid``
    with trend = the centered ``period``-row moving average over the
    ZERO-FILLED hourly grid, seasonal = the per-(key, hour-of-period)
    mean of the detrended values, resid = the remainder. The standard
    first step of time-series monitoring (the moving-average variant
    of STL; Cleveland et al. 1990 §2 — the loess refinement is a
    quality upgrade on the same skeleton, not a different dataflow).

    Scale shape: one groupBy to hourly counts, one per-key grid
    explode (sequence — bounded by the time span, not the data), one
    window over the key-partitioned series (frame = period rows), one
    algebraic groupBy for the seasonal profile, one broadcast-size
    join back. No driver collection, no global sort.

    Cross-engine determinism: all arithmetic runs in integer MICRO-
    UNITS — trend_u = (sum_over_frame · 1e6) div period, seasonal_u =
    (Σ (cnt·1e6 − trend_u)) div n — so no float summation order can
    leak into the result; floats appear only in the final rounded
    display columns. Rows without a full centered window carry NULL
    trend/seasonal/resid (the textbook edge contract).

    Output: (``by``, hour TIMESTAMP, cnt BIGINT, trend, seasonal,
    resid) rounded to ``round_to``."""
    half = period // 2
    hourly = (
        events.filter(F.col(ts_col).isNotNull())
        .groupBy(
            F.col(by), F.date_trunc("hour", F.col(ts_col)).alias("hour")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    span = hourly.groupBy(by).agg(
        F.min("hour").alias("_a"), F.max("hour").alias("_b")
    )
    grid = span.select(
        by,
        F.explode(
            F.sequence(
                F.col("_a"), F.col("_b"), F.expr("INTERVAL 1 HOUR")
            )
        ).alias("hour"),
    )
    filled = grid.join(hourly, [by, "hour"], "left").select(
        by, "hour", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    w = Window.partitionBy(by).orderBy("hour")
    frame = w.rowsBetween(-half, period - half - 1)
    filled = (
        filled.withColumn("_s24", F.sum("cnt").over(frame))
        .withColumn("_n24", F.count(F.lit(1)).over(frame))
        .withColumn(
            "_trend_u",
            F.when(
                F.col("_n24") == period,
                F.expr(f"(_s24 * 1000000L) div {period}"),
            ),
        )
    )
    seas = (
        filled.filter(F.col("_trend_u").isNotNull())
        .groupBy(by, F.hour("hour").alias("_hod"))
        .agg(
            F.expr("sum(cnt * 1000000L - _trend_u) div count(1)").alias(
                "_seas_u"
            )
        )
    )
    out = filled.withColumn("_hod", F.hour("hour")).join(
        F.broadcast(seas), [by, "_hod"], "left"
    )
    u = F.lit(1e6)
    trend = F.col("_trend_u") / u
    seasonal = F.col("_seas_u") / u
    resid = (F.col("cnt") * F.lit(1000000) - F.col("_trend_u") - F.col("_seas_u")) / u
    return out.select(
        by,
        "hour",
        "cnt",
        F.round(trend, round_to).alias("trend"),
        F.round(seasonal, round_to).alias("seasonal"),
        F.round(
            F.when(F.col("_trend_u").isNotNull(), resid), round_to
        ).alias("resid"),
    )


def ewma_smooth(
    df: DataFrame,
    on: str,
    by: str,
    value_col: str,
    alpha: float = 0.2,
    *tiebreak_cols: str,
    round_to: int = 6,
) -> DataFrame:
    """Exponentially-weighted moving average per key (the EWMA control
    chart of Roberts 1959, the smoothing complement to the CUSUM
    changepoint monitor)::

        E_1 = x_1;   E_i = α·x_i + (1−α)·E_{i−1}

    Output one row per key: (by, n, ewma_last, ewma_max) under the
    (on, tiebreak) total order, rounded.

    Like CUSUM, the recurrence is inherently sequential (E_i depends
    on E_{i−1} through a non-associative float combination), so a
    Python fold is the sanctioned shape — run through
    :func:`_fold_series_by_key` (one Arrow kernel per batch, state
    carried across batches; see that docstring for the
    applyInPandas-overhead A/B). The oracle replays the identical
    C-double sequence — same order, same parenthesization
    (α·x) + ((1−α)·E), bit-identical results. (The closed form
    E_i = α Σ (1−α)^{i−j} x_j IS prefix-decomposable in exact
    arithmetic, but computing it that way needs (1−α)^{−i} scaling
    factors that overflow double at series length ~1500 — the fold
    is the numerically honest shape.) NULL timestamps and values are
    excluded up front (module convention)."""
    a = float(alpha)
    b = 1.0 - a
    src = df.filter(
        F.col(by).isNotNull()
        & F.col(on).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(by).alias("_k"),
        F.col(on).alias("_t"),
        F.col(value_col).cast("double").alias("_v"),
        *[F.col(c).alias(f"_tb_{c}") for c in tiebreak_cols],
    )
    sort_cols = ["_t"] + [f"_tb_{c}" for c in tiebreak_cols]

    def make_state():
        # [e, mx, n]
        return [None, None, 0]

    def fold_chunk(st, vs):
        e, mx, n = st
        for v in vs:
            if v != v:  # NaN guard: the streaming twin's exact skip
                continue
            v = float(v)
            n += 1
            e = v if e is None else (a * v) + (b * e)
            if mx is None or e > mx:
                mx = e
        st[0], st[1], st[2] = e, mx, n

    def finish(k, st, out):
        out["_k"].append(k)
        out["n"].append(st[2])
        out["ewma_last"].append(round(st[0], round_to))
        out["ewma_max"].append(round(st[1], round_to))

    out_schema = (
        f"_k {dict(df.dtypes)[by]}, n long, ewma_last double, "
        "ewma_max double"
    )
    out_cols = ["_k", "n", "ewma_last", "ewma_max"]
    return _fold_series_by_key(
        src, sort_cols, out_schema, out_cols, make_state, fold_chunk,
        finish,
    ).select(F.col("_k").alias(by), "n", "ewma_last", "ewma_max")


def holt_smooth(
    df: DataFrame,
    on: str,
    by: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.25,
    *tiebreak_cols: str,
    round_to: int = 6,
) -> DataFrame:
    """Holt's linear-trend double exponential smoothing per key (Holt
    1957; the trend-aware step between EWMA and full Holt-Winters)::

        l_1 = x_1;  b_1 = 0
        l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}

    Output one row per key: (by, n, level_last, trend_last,
    forecast_1 = l_n + b_n) under the (on, tiebreak) total order,
    rounded. Same regime as :func:`ewma_smooth`: the two-state
    recurrence is non-associative, so it runs through
    :func:`_fold_series_by_key` (one Arrow kernel per batch, state
    carried across batches) with the oracle's recursive CTE
    replaying the identical C-double sequence — the b-update's
    reference to the NEW level is inlined as the same expression on
    both sides, so every intermediate double is bit-identical. The
    default α = 0.5, β = 0.25 are dyadic, making 1−α and 1−β exact
    and the parity argument unconditional."""
    a = float(alpha)
    ac = 1.0 - a
    g = float(beta)
    gc = 1.0 - g
    src = df.filter(
        F.col(by).isNotNull()
        & F.col(on).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(by).alias("_k"),
        F.col(on).alias("_t"),
        F.col(value_col).cast("double").alias("_v"),
        *[F.col(c).alias(f"_tb_{c}") for c in tiebreak_cols],
    )
    sort_cols = ["_t"] + [f"_tb_{c}" for c in tiebreak_cols]

    def make_state():
        # [l, b, n]
        return [None, 0.0, 0]

    def fold_chunk(st, vs):
        lev, b, n = st
        for v in vs:
            if v != v:  # NaN guard: the streaming twin's exact skip
                continue
            v = float(v)
            n += 1
            if lev is None:
                lev = v
                b = 0.0
            else:
                lnew = (a * v) + (ac * (lev + b))
                b = (g * (lnew - lev)) + (gc * b)
                lev = lnew
        st[0], st[1], st[2] = lev, b, n

    def finish(k, st, out):
        out["_k"].append(k)
        out["n"].append(st[2])
        out["level_last"].append(round(st[0], round_to))
        out["trend_last"].append(round(st[1], round_to))
        out["forecast_1"].append(round(st[0] + st[1], round_to))

    out_schema = (
        f"_k {dict(df.dtypes)[by]}, n long, level_last double, "
        "trend_last double, forecast_1 double"
    )
    out_cols = ["_k", "n", "level_last", "trend_last", "forecast_1"]
    return _fold_series_by_key(
        src, sort_cols, out_schema, out_cols, make_state, fold_chunk,
        finish,
    ).select(
        F.col("_k").alias(by), "n", "level_last", "trend_last",
        "forecast_1",
    )


def holt_winters_smooth(
    df: DataFrame,
    on: str,
    by: str,
    value_col: str,
    period: int = 24,
    alpha: float = 0.5,
    beta: float = 0.25,
    gamma: float = 0.25,
    *tiebreak_cols: str,
    round_to: int = 6,
) -> DataFrame:
    """Holt-Winters ADDITIVE triple exponential smoothing per key
    (Winters 1960) — the seasonal member completing the per-key
    monitor family (EWMA = level, Holt = level+trend, HW = level +
    trend + a ``period``-slot additive seasonal profile). POSITIONAL
    seasonality: observation t (1-based, per key, under the (on,
    tiebreak) total order) has phase ``(t−1) mod period``::

        t = 1:  l = x_1;  b = 0;  s[*] = 0
        t ≥ 2, p = (t−1) mod period:
            l_t = α·(x_t − s[p]) + (1−α)·(l_{t−1} + b_{t−1})
            b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
            s[p] ← γ·(x_t − l_t) + (1−γ)·s[p]

    Zero-seasonal init keeps the recurrence fully determined with no
    season-ahead warm-up data requirement (the textbook first-cycle
    averages need ≥ 2 complete cycles; with s init 0 the first cycle
    degenerates to exactly Holt, then the profile fills in — the
    same convention as l_1 = x_1 in :func:`ewma_smooth`).

    Output one row per key: (by, n, level_last, trend_last,
    season_next = s[n mod period] — the NEXT observation's phase
    slot, forecast_1 = l_n + b_n + season_next), rounded. Runs on
    :func:`_fold_series_by_key` (one Arrow kernel per batch, state =
    2 + ``period`` doubles per key — constant-size, the state-store
    argument of the streaming twins); the oracle replays the exact
    double sequence as a recursive CTE carrying the seasonal profile
    as a LIST column. Dyadic defaults make 1−α/1−β/1−γ exact so the
    cross-engine parity argument is unconditional."""
    if period < 1:
        raise ValueError(
            f"holt_winters_smooth: period must be >= 1, got {period}"
        )
    a = float(alpha)
    ac = 1.0 - a
    g = float(beta)
    gc = 1.0 - g
    d = float(gamma)
    dc = 1.0 - d
    m = int(period)
    src = df.filter(
        F.col(by).isNotNull()
        & F.col(on).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(by).alias("_k"),
        F.col(on).alias("_t"),
        F.col(value_col).cast("double").alias("_v"),
        *[F.col(c).alias(f"_tb_{c}") for c in tiebreak_cols],
    )
    sort_cols = ["_t"] + [f"_tb_{c}" for c in tiebreak_cols]

    def make_state():
        # [l, b, n, s(list of m)]
        return [None, 0.0, 0, [0.0] * m]

    def fold_chunk(st, vs):
        lev, b, n, s = st
        for v in vs:
            if v != v:  # NaN guard: the streaming twin's exact skip
                continue
            v = float(v)
            n += 1
            if lev is None:
                lev = v
                b = 0.0
            else:
                p = (n - 1) % m
                lnew = (a * (v - s[p])) + (ac * (lev + b))
                b = (g * (lnew - lev)) + (gc * b)
                s[p] = (d * (v - lnew)) + (dc * s[p])
                lev = lnew
        st[0], st[1], st[2] = lev, b, n

    def finish(k, st, out):
        lev, b, n, s = st
        sn = s[n % m]
        out["_k"].append(k)
        out["n"].append(n)
        out["level_last"].append(round(lev, round_to))
        out["trend_last"].append(round(b, round_to))
        out["season_next"].append(round(sn, round_to))
        out["forecast_1"].append(round(lev + b + sn, round_to))

    out_schema = (
        f"_k {dict(df.dtypes)[by]}, n long, level_last double, "
        "trend_last double, season_next double, forecast_1 double"
    )
    out_cols = [
        "_k", "n", "level_last", "trend_last", "season_next",
        "forecast_1",
    ]
    return _fold_series_by_key(
        src, sort_cols, out_schema, out_cols, make_state, fold_chunk,
        finish,
    ).select(
        F.col("_k").alias(by), "n", "level_last", "trend_last",
        "season_next", "forecast_1",
    )


def ohlc_resample(
    df: DataFrame,
    on: str,
    by: str,
    value_col: str,
    unit: str = "hour",
    tiebreak: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """OHLC candle resampling: per (key, time bucket) the open
    (first value), high, low, close (last value), count and rounded
    sum — the standard downsampling step for any numeric series
    (market candles, sensor rollups, metric pre-aggregation).

    ONE algebraic aggregation: open/close are ``min_by``/``max_by``
    over the (time, tiebreak) struct order — no window, no per-group
    sort, map-side partial aggregation absorbs hot keys, which is
    why this shape survives 100 TB where the textbook
    row_number-window formulation pays a full per-group sort.
    open/close/high/low are raw input doubles (identical in any
    engine); only the sum is rounded (summation order). ``tiebreak``
    makes the first/last picks total under timestamp collisions."""
    tb = [F.col(tiebreak)] if tiebreak else []
    order = F.struct(F.col(on), *tb)
    src = df.filter(
        F.col(on).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(by),
        F.date_trunc(unit, F.col(on)).alias("bucket_ts"),
        F.col(on),
        F.col(value_col).cast("double").alias("_v"),
        *tb,
    )
    return src.groupBy(by, "bucket_ts").agg(
        F.min_by("_v", order).alias("open"),
        F.max("_v").alias("high"),
        F.min("_v").alias("low"),
        F.max_by("_v", order).alias("close"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("_v"), round_to).alias("vsum"),
    )
