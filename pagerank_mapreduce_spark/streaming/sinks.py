"""Streaming sinks.

The reference's only sink is a formatted text file written by rank 0
(mr-pr-cpp.cpp:254-267 — graph/io.py is the batch equivalent). A
streaming engine needs durable, exactly-once sinks; these helpers
wrap the three shapes that matter:

- file sink (parquet, checkpointed, exactly-once by manifest)
- foreachBatch (arbitrary batch logic per micro-batch — upserts,
  multi-sink fanout; at-least-once unless the callback is
  idempotent, which the batch_id parameter enables)
- memory sink (tests/demos only — driver-resident)

All run with ``trigger(availableNow=True)`` by default: process
everything available, then stop — the batch-like mode the tests and
the driver's bounded fixtures need; pass ``available_now=False`` for
a continuously-running query.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def write_stream_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
    await_termination: bool = True,
) -> StreamingQuery:
    """Checkpointed parquet file sink (exactly-once via the sink's
    file manifest + the checkpoint's offset log)."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now and await_termination:
        q.awaitTermination()
    return q


def write_stream_foreach_batch(
    df: DataFrame,
    func: Callable[[DataFrame, int], None],
    checkpoint: str,
    output_mode: str = "update",
    available_now: bool = True,
    await_termination: bool = True,
) -> StreamingQuery:
    """foreachBatch sink: ``func(batch_df, batch_id)`` runs once per
    micro-batch with a BATCH DataFrame — the bridge from a stream to
    any batch writer (jdbc upsert, merge-into, multi-sink fanout).
    Replays after failure re-deliver a batch_id; idempotent callbacks
    keyed on it give end-to-end exactly-once."""
    writer = (
        df.writeStream.foreachBatch(func)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now and await_termination:
        q.awaitTermination()
    return q
