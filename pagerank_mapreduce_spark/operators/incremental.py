"""Incremental aggregate maintenance — algebraic state merge.

The materialized-view pattern every 100 TB pipeline converges on:
never re-aggregate the full history when a batch lands; keep an
algebraic STATE per key (count/sum/min/max — each mergeable), fold
the new batch's partial state into it, and derive the final metrics
(avg) at read time. ``merge(state(A), state(B)) == state(A ∪ B)`` is
the correctness contract, and exactly what the catalog query's
full-recompute oracle checks.

Scale: computing the batch state is one algebraic groupBy over the
batch only (map-side partials); the merge is one full-outer equi-join
on the key between two already-aggregated (small) relations. History
is never rescanned — the cost of an update is O(batch + |keys|), not
O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["agg_state", "merge_agg_states", "finalize_state"]

_STATE_COLS = ("cnt", "sm", "mn", "mx")


def agg_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Per-key algebraic aggregation state over non-null values:
    (keys..., cnt, sm, mn, mx)."""
    v = F.col(value_col)
    return (
        df.filter(v.isNotNull())
        .groupBy(*keys)
        .agg(
            F.count(v).alias("cnt"),
            F.sum(v).alias("sm"),
            F.min(v).alias("mn"),
            F.max(v).alias("mx"),
        )
    )


def merge_agg_states(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Fold two states: full-outer join on the key, component-wise
    algebraic combine (null-safe min/max via the coalesce-swap)."""
    aa, bb = a.alias("a"), b.alias("b")
    ac = {c: F.col(f"a.{c}") for c in _STATE_COLS}
    bc = {c: F.col(f"b.{c}") for c in _STATE_COLS}
    return aa.join(bb, keys, "full_outer").select(
        *keys,
        (
            F.coalesce(ac["cnt"], F.lit(0)) + F.coalesce(bc["cnt"], F.lit(0))
        ).alias("cnt"),
        (
            F.coalesce(ac["sm"], F.lit(0.0)) + F.coalesce(bc["sm"], F.lit(0.0))
        ).alias("sm"),
        F.least(
            F.coalesce(ac["mn"], bc["mn"]), F.coalesce(bc["mn"], ac["mn"])
        ).alias("mn"),
        F.greatest(
            F.coalesce(ac["mx"], bc["mx"]), F.coalesce(bc["mx"], ac["mx"])
        ).alias("mx"),
    )


def finalize_state(state: DataFrame) -> DataFrame:
    """Derive the non-algebraic read-time metric (avg = sm / cnt)."""
    return state.withColumn("avg", F.col("sm") / F.col("cnt"))
