"""Streaming joins — the remaining streaming category.

Two shapes, both expressed once and valid for batch AND streaming
inputs (the module convention of streaming/windows.py):

- **stream-static enrich**: stream ⋈ broadcast dimension. No state at
  all — the dimension is re-broadcast per micro-batch, so dimension
  updates between batches are picked up automatically.
- **stream-stream interval join**: both sides watermarked; the join
  condition bounds event-time distance, so each side's buffered state
  is evicted once the watermark passes the interval. Without the
  time bound Spark would have to buffer both streams forever — the
  watermark + interval IS the state-size contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on_left: str = "user_id",
    on_right: str = "c_custkey",
) -> DataFrame:
    """Stream-static equi-join against a broadcast dimension (the
    streaming analogue of MR-MPI broadcast(), src/mapreduce.cpp:
    542-596: replicate the small side everywhere, stream the big
    side)."""
    return events.join(
        F.broadcast(dim), events[on_left] == dim[on_right], "left"
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    on: str = "ts",
    within_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Pairs from two streams with the same key whose event times are
    within ``within_seconds`` (right.ts in [left.ts, left.ts+w]).
    Both sides watermarked when streaming; state is bounded by
    watermark + interval."""
    l = left.alias("l")
    r = right.alias("r")
    if left.isStreaming:
        l = left.withWatermark(on, watermark).alias("l")
    if right.isStreaming:
        r = right.withWatermark(on, watermark).alias("r")
    cond = (
        (F.col(f"l.{by}") == F.col(f"r.{by}"))
        & (F.col(f"r.{on}") >= F.col(f"l.{on}"))
        & (
            F.unix_micros(F.col(f"r.{on}"))
            <= F.unix_micros(F.col(f"l.{on}")) + within_seconds * 1_000_000
        )
    )
    return l.join(r, cond, "inner")
