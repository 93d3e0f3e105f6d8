"""Arbitrary stateful streaming via transformWithStateInPandas.

Spark 4.x's successor to ``applyInPandasWithState`` (both implemented
in this engine — windows.stateful_user_totals uses the older API):
the processor is an object with named, typed state variables managed
by the state store (RocksDB provider required), instead of a single
opaque state tuple. This is the closest Spark analogue to the
reference's stateful reduce-UDF surface (SURVEY.md §2.4; MR-MPI
reduce callbacks, src/mapreduce.cpp:1688-1777) with state that
outlives a single invocation AND a single micro-batch.

Scale: state is per-key (two numbers per user here), partitioned by
the grouping key across executors; RocksDB spills to local disk, so
state size is bounded by disk not heap — the same out-of-core promise
MR-MPI makes for its KV pages (doc/Technical.txt).

Runtime requirements: the TWS state protocol runs over protobuf
(``google.protobuf``); environments without it can build the plan but
not execute the streaming query — the test suite gates on the import.
The batch path has no such dependency.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

__all__ = [
    "CusumProcessor",
    "EwmaProcessor",
    "HoltWintersProcessor",
    "UserTotalsProcessor",
    "tws_cusum_alerts",
    "tws_ewma",
    "tws_holt_winters",
    "tws_user_totals",
]

_STATE_SCHEMA = StructType(
    [
        StructField("cnt", LongType()),
        StructField("total", DoubleType()),
    ]
)

_OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"


class UserTotalsProcessor(StatefulProcessor):
    """Running (n_events, total_value) per user across micro-batches,
    held in a named ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        cnt, total = 0, 0.0
        if self._totals.exists():
            prev = self._totals.get()
            cnt, total = int(prev[0]), float(prev[1])
        for pdf in rows:
            cnt += len(pdf)
            total += float(pdf["value"].sum())
        self._totals.update((cnt, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [cnt],
                "total_value": [round(total, 4)],
            }
        )

    def close(self) -> None:
        pass


def tws_user_totals(events: DataFrame) -> DataFrame:
    """Streaming: per-user running totals via transformWithStateInPandas
    (requires the RocksDB state store provider — set by the session
    factory / test fixture). Batch: the equivalent algebraic agg."""
    if not events.isStreaming:
        return events.groupBy("user_id").agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTotalsProcessor(),
        outputStructType=_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


_CUSUM_STATE_SCHEMA = StructType(
    [
        StructField("s", DoubleType()),
        StructField("mx", DoubleType()),
        StructField("n", LongType()),
        StructField("alert_at", LongType()),
    ]
)

_CUSUM_OUTPUT_SCHEMA = (
    "user_id bigint, n bigint, max_cusum double, alert_at bigint, "
    "alert boolean"
)


class CusumProcessor(StatefulProcessor):
    """Streaming one-sided CUSUM per key (Page 1954), the
    transformWithStateInPandas twin of operators.sessions.cusum_alerts:
    S_i = max(0, S_{i-1} + (x_i − target)), alert at the first
    crossing of ``threshold``. The fold state (S, running max, count,
    first-alert index) lives in a named ValueState and survives
    micro-batch boundaries, so the monitor keeps its memory across a
    day of triggers — the property the batch operator cannot have.
    Rows are folded in (ts, event_id) order WITHIN each batch; the
    stream contract is in-order batches (a file source replaying a
    log, or a watermarked upstream sort), the standard CUSUM
    deployment. The fold arithmetic is the identical C-double
    sequence as the batch operator, so a single-batch stream
    reproduces the batch answer bit-for-bit."""

    def __init__(self, target: float, threshold: float) -> None:
        self._target = float(target)
        self._threshold = float(threshold)

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._st = handle.getValueState("cusum", _CUSUM_STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        s, mx, n, at = 0.0, 0.0, 0, None
        if self._st.exists():
            prev = self._st.get()
            s, mx, n = float(prev[0]), float(prev[1]), int(prev[2])
            at = None if prev[3] is None else int(prev[3])
        pdf = pd.concat(list(rows), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        for v in pdf["value"].to_numpy():
            if v != v:  # NaN guard (NULL values excluded upstream)
                continue
            n += 1
            s = s + (float(v) - self._target)
            if s < 0.0:
                s = 0.0
            if s > mx:
                mx = s
            if at is None and s > self._threshold:
                at = n
        self._st.update((s, mx, n, at))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n": [n],
                "max_cusum": [round(mx, 6)],
                "alert_at": [at],
                "alert": [at is not None],
            }
        )

    def close(self) -> None:
        pass


def tws_cusum_alerts(
    events: DataFrame, target: float = 5.5, threshold: float = 20.0
) -> DataFrame:
    """Streaming: per-user CUSUM with cross-batch state via
    transformWithStateInPandas. Batch: the oracle-checked Arrow fold
    (operators.sessions.cusum_alerts) with the same parameters."""
    if not events.isStreaming:
        from pagerank_mapreduce_spark.operators.sessions import (
            cusum_alerts,
        )

        return cusum_alerts(
            events, "ts", "user_id", "value", target, threshold,
            "event_id",
        )
    filtered = events.filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    return filtered.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=CusumProcessor(target, threshold),
        outputStructType=_CUSUM_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


_EWMA_STATE_SCHEMA = StructType(
    [
        StructField("e", DoubleType()),
        StructField("mx", DoubleType()),
        StructField("n", LongType()),
    ]
)

_EWMA_OUTPUT_SCHEMA = (
    "user_id bigint, n bigint, ewma_last double, ewma_max double"
)


class EwmaProcessor(StatefulProcessor):
    """Streaming EWMA per key, the transformWithStateInPandas twin of
    operators.sessions.ewma_smooth (same cross-batch-state rationale
    as CusumProcessor; same in-order-batches contract; identical
    C-double fold, so a single-batch stream reproduces the batch
    answer bit-for-bit)."""

    def __init__(self, alpha: float) -> None:
        self._a = float(alpha)
        self._b = 1.0 - float(alpha)

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._st = handle.getValueState("ewma", _EWMA_STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        e, mx, n = None, None, 0
        if self._st.exists():
            prev = self._st.get()
            e, mx, n = float(prev[0]), float(prev[1]), int(prev[2])
        pdf = pd.concat(list(rows), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        for v in pdf["value"].to_numpy():
            if v != v:
                continue
            v = float(v)
            n += 1
            e = v if e is None else (self._a * v) + (self._b * e)
            if mx is None or e > mx:
                mx = e
        if e is not None:
            self._st.update((e, mx, n))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n": [n],
                "ewma_last": [None if e is None else round(e, 6)],
                "ewma_max": [None if mx is None else round(mx, 6)],
            }
        )

    def close(self) -> None:
        pass


def tws_ewma(events: DataFrame, alpha: float = 0.2) -> DataFrame:
    """Streaming: per-user EWMA with cross-batch state. Batch: the
    oracle-checked Arrow fold (operators.sessions.ewma_smooth)."""
    if not events.isStreaming:
        from pagerank_mapreduce_spark.operators.sessions import (
            ewma_smooth,
        )

        return ewma_smooth(
            events, "ts", "user_id", "value", alpha, "event_id"
        )
    filtered = events.filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    return filtered.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=EwmaProcessor(alpha),
        outputStructType=_EWMA_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


_HOLT_STATE_SCHEMA = StructType(
    [
        StructField("l", DoubleType()),
        StructField("b", DoubleType()),
        StructField("n", LongType()),
    ]
)

_HOLT_OUTPUT_SCHEMA = (
    "user_id bigint, n bigint, level_last double, trend_last double, "
    "forecast_1 double"
)


class HoltProcessor(StatefulProcessor):
    """Streaming Holt linear-trend smoothing per key, the
    transformWithStateInPandas twin of operators.sessions.holt_smooth
    (same cross-batch-state rationale as EwmaProcessor; same
    in-order-batches contract; identical C-double fold incl. the
    inlined new-level reference in the b-update, so a single-batch
    stream reproduces the batch answer bit-for-bit)."""

    def __init__(self, alpha: float, beta: float) -> None:
        self._a = float(alpha)
        self._ac = 1.0 - float(alpha)
        self._g = float(beta)
        self._gc = 1.0 - float(beta)

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._st = handle.getValueState("holt", _HOLT_STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        lev, b, n = None, 0.0, 0
        if self._st.exists():
            prev = self._st.get()
            lev, b, n = float(prev[0]), float(prev[1]), int(prev[2])
        pdf = pd.concat(list(rows), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        for v in pdf["value"].to_numpy():
            if v != v:
                continue
            v = float(v)
            n += 1
            if lev is None:
                lev = v
                b = 0.0
            else:
                lnew = (self._a * v) + (self._ac * (lev + b))
                b = (self._g * (lnew - lev)) + (self._gc * b)
                lev = lnew
        if lev is not None:
            self._st.update((lev, b, n))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n": [n],
                "level_last": [None if lev is None else round(lev, 6)],
                "trend_last": [None if lev is None else round(b, 6)],
                "forecast_1": [
                    None if lev is None else round(lev + b, 6)
                ],
            }
        )

    def close(self) -> None:
        pass


def tws_holt(
    events: DataFrame, alpha: float = 0.5, beta: float = 0.25
) -> DataFrame:
    """Streaming: per-user Holt level+trend with cross-batch state.
    Batch: the oracle-checked Arrow fold
    (operators.sessions.holt_smooth)."""
    if not events.isStreaming:
        from pagerank_mapreduce_spark.operators.sessions import (
            holt_smooth,
        )

        return holt_smooth(
            events, "ts", "user_id", "value", alpha, beta, "event_id"
        )
    filtered = events.filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    return filtered.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=HoltProcessor(alpha, beta),
        outputStructType=_HOLT_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


_HW_OUTPUT_SCHEMA = (
    "user_id bigint, n bigint, level_last double, trend_last double, "
    "season_next double, forecast_1 double"
)


def _hw_state_schema() -> StructType:
    # the seasonal profile rides a single ARRAY<DOUBLE> state field —
    # per-key state stays 2 + period doubles (constant-size), the
    # same state-store bound the scalar processors carry
    return StructType(
        [
            StructField("l", DoubleType()),
            StructField("b", DoubleType()),
            StructField("n", LongType()),
            StructField("s", ArrayType(DoubleType())),
        ]
    )


class HoltWintersProcessor(StatefulProcessor):
    """Streaming Holt-Winters additive smoothing per key — the
    transformWithStateInPandas twin of
    operators.sessions.holt_winters_smooth (same cross-batch-state
    rationale as HoltProcessor; same in-order-batches contract;
    identical C-double fold incl. the per-phase seasonal slot, so a
    single-batch stream reproduces the batch answer bit-for-bit).
    POSITIONAL phase: the per-key observation COUNT carried in state
    drives ``(t−1) mod period``, so phases continue seamlessly across
    micro-batch boundaries."""

    def __init__(
        self, period: int, alpha: float, beta: float, gamma: float
    ) -> None:
        if period < 1:
            raise ValueError(
                f"HoltWintersProcessor: period must be >= 1, got {period}"
            )
        self._m = int(period)
        self._a = float(alpha)
        self._ac = 1.0 - float(alpha)
        self._g = float(beta)
        self._gc = 1.0 - float(beta)
        self._d = float(gamma)
        self._dc = 1.0 - float(gamma)

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._st = handle.getValueState("hw", _hw_state_schema())

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        lev, b, n, s = None, 0.0, 0, [0.0] * self._m
        if self._st.exists():
            prev = self._st.get()
            lev, b, n = float(prev[0]), float(prev[1]), int(prev[2])
            s = [float(x) for x in prev[3]]
        pdf = pd.concat(list(rows), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        for v in pdf["value"].to_numpy():
            if v != v:
                continue
            v = float(v)
            n += 1
            if lev is None:
                lev = v
                b = 0.0
            else:
                p = (n - 1) % self._m
                lnew = (self._a * (v - s[p])) + (self._ac * (lev + b))
                b = (self._g * (lnew - lev)) + (self._gc * b)
                s[p] = (self._d * (v - lnew)) + (self._dc * s[p])
                lev = lnew
        if lev is not None:
            self._st.update((lev, b, n, s))
        sn = s[n % self._m]
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n": [n],
                "level_last": [None if lev is None else round(lev, 6)],
                "trend_last": [None if lev is None else round(b, 6)],
                "season_next": [
                    None if lev is None else round(sn, 6)
                ],
                "forecast_1": [
                    None if lev is None else round(lev + b + sn, 6)
                ],
            }
        )

    def close(self) -> None:
        pass


def tws_holt_winters(
    events: DataFrame,
    period: int = 24,
    alpha: float = 0.5,
    beta: float = 0.25,
    gamma: float = 0.25,
) -> DataFrame:
    """Streaming: per-user Holt-Winters additive level+trend+seasonal
    with cross-batch state (period-slot profile in an ARRAY state
    field). Batch: the oracle-checked Arrow fold
    (operators.sessions.holt_winters_smooth)."""
    if not events.isStreaming:
        from pagerank_mapreduce_spark.operators.sessions import (
            holt_winters_smooth,
        )

        return holt_winters_smooth(
            events, "ts", "user_id", "value", period, alpha, beta,
            gamma, "event_id",
        )
    filtered = events.filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    return filtered.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=HoltWintersProcessor(period, alpha, beta, gamma),
        outputStructType=_HW_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
