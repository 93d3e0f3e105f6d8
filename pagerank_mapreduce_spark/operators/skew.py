"""Skew-mitigation operators: salted aggregation and salted joins.

At 100 TB a handful of hot keys (power-law graph hubs — exactly the
Barabási fixtures the reference tests with, `test/barabasi-*.txt` —
or low-cardinality group keys) make one shuffle partition orders of
magnitude larger than the rest; the straggler dominates wall-clock.
Two standard mitigations, both semantically invisible to the result:

- **salted two-phase aggregation** (`salted_agg`): append a
  deterministic salt to the grouping key, pre-aggregate on
  ``(key, salt)`` — splitting each hot key across ``n_salt``
  reducers — then re-aggregate on ``key`` alone. Only works for
  algebraic (decomposable) aggregates; ``avg`` is carried as
  (sum, count).
- **salted replicate join** (`salted_join`): salt the big/skewed
  side, replicate every row of the smaller side ``n_salt`` times
  (one copy per salt value), and equi-join on ``(key, salt)``. Each
  hot key's rows now land on ``n_salt`` different reducers. Costs
  ``n_salt``× the small side's shuffle volume — use when the small
  side is too big to broadcast but far smaller than the skewed side.

Spark's AQE handles *sort-merge-join* skew automatically
(``spark.sql.adaptive.skewJoin.enabled``) by splitting oversized
partitions at runtime; these operators are the explicit form for the
cases AQE cannot see — aggregation skew, and joins whose skew is
known ahead of time (so the first shuffle is already balanced).

The reference has no analogue: its hash partitioner
(`mr-pr-mpi.cpp:66-71`, `include/detail/hash_partitioner.hpp:10-18`)
routes every copy of a key to one reducer unconditionally, so a hub
page's in-links all serialize through one process.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salt_column", "salted_agg", "salted_join"]

_SALT = "__salt"

# aggregate name -> (partial expr builder, final expr builder).
# Partial runs per (key, salt); final re-combines per key. ``avg``
# is handled separately in salted_agg (decomposed into sum + count
# partials, recombined as sum/sum).
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salt_column(n_salt: int, *cols: str | Column) -> Column:
    """Deterministic salt in [0, n_salt): hash of the distinguishing
    columns (NOT the group key — salting the key's own hash would put
    every copy of the key in the same salt bucket, defeating the
    point). Deterministic so retried tasks re-derive the same salt."""
    return F.pmod(F.hash(*cols), F.lit(n_salt)).alias(_SALT)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    metrics: list[tuple[str, str, str]],
    n_salt: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    metrics: (how, value_col, out_alias) with how ∈
    sum|count|min|max|avg — ``avg`` decomposes into (sum, count)
    partials and recombines as sum/sum (null values skipped, same as
    the built-in).
    salt_cols: columns whose hash spreads a hot key's rows (defaults
    to every non-key column).
    """
    for how, _, _ in metrics:
        if how != "avg" and how not in _ALGEBRAIC:
            raise ValueError(f"non-algebraic aggregate {how!r} cannot be salted")
    salt_cols = salt_cols or [c for c in df.columns if c not in keys]
    salted = df.withColumn(_SALT, salt_column(n_salt, *salt_cols))
    partial_exprs: list[Column] = []
    final_exprs: list[Column] = []
    for how, col, alias in metrics:
        if how == "avg":
            partial_exprs.append(F.sum(col).alias(f"__p_{alias}__s"))
            partial_exprs.append(F.count(col).alias(f"__p_{alias}__c"))
            final_exprs.append(
                (F.sum(f"__p_{alias}__s") / F.sum(f"__p_{alias}__c")).alias(
                    alias
                )
            )
        else:
            partial_exprs.append(
                _ALGEBRAIC[how][0](col).alias(f"__p_{alias}")
            )
            final_exprs.append(
                _ALGEBRAIC[how][1](f"__p_{alias}").alias(alias)
            )
    partial = salted.groupBy(*keys, _SALT).agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Replicate-join: salt the skewed side, explode the other side
    once per salt value, join on (key, salt). Result matches
    ``skewed.join(other, on, how)`` row for row — including outer
    joins: an ``other`` row that matches no skewed row at all exists
    once per salt copy under the replicate scheme, so for right/full
    joins the unmatched rows are produced separately (anti-join of
    ``other`` against the skewed key set — an algebraic distinct, so
    the hot keys collapse map-side) and unioned in null-padded
    exactly once."""
    salt_src = [c for c in skewed.columns if c != on]
    left = skewed.withColumn(_SALT, salt_column(n_salt, *salt_src))
    right = other.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    how_n = how.replace("_", "").lower()
    if how_n not in ("right", "rightouter", "full", "fullouter", "outer"):
        return left.join(right, [on, _SALT], how).drop(_SALT)
    matched_how = "left" if how_n in ("full", "fullouter", "outer") else "inner"
    matched = left.join(right, [on, _SALT], matched_how).drop(_SALT)
    skew_types = dict(skewed.dtypes)
    unmatched = other.join(
        skewed.select(on).distinct(), on, "left_anti"
    ).select(
        *[
            F.col(c)
            if c in other.columns
            else F.lit(None).cast(skew_types[c]).alias(c)
            for c in matched.columns
        ]
    )
    return matched.unionByName(unmatched)
