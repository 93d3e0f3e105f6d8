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
    # the upper bound MUST be plain interval arithmetic on the event
    # time columns: Spark derives each side's state watermark by
    # symbolically solving the condition for the time columns
    # (StreamingJoinHelper), and it only understands casts/interval
    # arithmetic — a unix_micros()-based bound is opaque to it, the
    # state watermark silently fails to derive, and that side's join
    # buffer grows forever (verified against the physical plan's
    # "state cleanup" predicates)
    cond = (
        (F.col(f"l.{by}") == F.col(f"r.{by}"))
        & (F.col(f"r.{on}") >= F.col(f"l.{on}"))
        & (
            F.col(f"r.{on}")
            <= F.col(f"l.{on}") + F.expr(f"INTERVAL {within_seconds} SECONDS")
        )
    )
    return l.join(r, cond, "inner")


def asof_enrich_stream(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    on: str = "ts",
    horizon_seconds: int = 3600,
    watermark: str = "2 hours",
    prefix: str = "r_",
) -> DataFrame:
    """Streaming as-of enrichment: for each left event, the LATEST
    right event at-or-before it within ``horizon_seconds`` — the
    as-of join with tolerance=horizon (operators/asof.py semantics),
    re-expressed for unbounded inputs. The bounded lookback is not a
    compromise but the state contract: an unbounded streaming as-of
    would require keeping every key's last right row forever, while
    the horizon lets the interval join evict both sides' buffers once
    the watermark passes.

    Shape: interval-join candidates (r.on in [l.on - horizon, l.on]),
    then a max-struct reduce per left row — two chained stateful
    operators (join + aggregation) in append mode, which Structured
    Streaming supports with watermark propagation; the left event
    time stays in the grouping key so aggregation state also evicts
    by watermark. Valid for batch inputs unchanged (the module
    convention), where it equals
    ``asof_join(..., tolerance=horizon_seconds)`` exactly — the
    batch-parity test asserts that.

    Contract: left rows must be row-unique (carry an event id, as the
    fixture does). The grouped reduce is keyed on all left columns,
    so two byte-identical left rows collapse into one output — the
    per-row streaming as-of is only well-defined over a keyed stream
    (under at-least-once re-delivery, collapsing re-delivered
    duplicates is the desired behavior). NULL ``by`` keys enrich to
    NULL (SQL equi-join semantics — a stream-stream join cannot key
    state on NULL); the batch ``asof_join``'s window form carries
    NULL-key matches, so exact batch parity holds for non-NULL keys
    only."""
    payload_cols = [c for c in right.columns if c not in (by, on)]
    l = left.alias("l")
    r = right.alias("r")
    if left.isStreaming:
        l = left.withWatermark(on, watermark).alias("l")
    if right.isStreaming:
        r = right.withWatermark(on, watermark).alias("r")
    # interval arithmetic, not unix_micros: see interval_join_streams
    # — only this form lets Spark derive the right side's state
    # watermark, which is the whole point of the horizon
    cond = (
        (F.col(f"l.{by}") == F.col(f"r.{by}"))
        & (F.col(f"r.{on}") <= F.col(f"l.{on}"))
        & (
            F.col(f"r.{on}")
            >= F.col(f"l.{on}") - F.expr(f"INTERVAL {horizon_seconds} SECONDS")
        )
    )
    j = l.join(r, cond, "left_outer")
    grp = [F.col(f"l.{c}") for c in left.columns]
    best = F.max(
        F.struct(
            F.col(f"r.{on}").alias("_rt"),
            *[F.col(f"r.{c}").alias(c) for c in payload_cols],
        )
    ).alias("_best")
    out = j.groupBy(*grp).agg(best)
    return out.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"_best.{c}").alias(f"{prefix}{c}") for c in payload_cols],
    )
