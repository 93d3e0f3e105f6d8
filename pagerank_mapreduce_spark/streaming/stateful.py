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
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

__all__ = ["UserTotalsProcessor", "tws_user_totals"]

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
