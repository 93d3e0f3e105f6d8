"""Data-quality expectations — the Deequ / dbt-test shape: declare
constraints, get back one report row per constraint with its exact
violation count. A 100 TB ingest gate runs this before anything else
touches the batch.

Design for scale:

- Every row-level check (not-null, range, accepted-values, regex)
  compiles to ONE conditional-sum column in a SINGLE aggregation pass
  over the table — k checks cost one scan, not k scans. The 1-row
  wide aggregate is stacked to long form driver-free.
- ``unique`` adds one ``count_distinct`` to the same pass (Catalyst
  plans the distinct/plain mix with one Expand — 2x the scan's rows
  through the partial agg, still one scan).
- ``foreign_key`` is the only multi-relation check: a left-anti join
  against the parent's key projection (broadcast when small, AQE
  otherwise), unioned into the report.

No reference counterpart — extension surface, same tier as the CDC /
ingest operators.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "Check",
    "not_null",
    "unique",
    "in_range",
    "accepted_values",
    "matches",
    "foreign_key",
    "expect",
]


@dataclass(frozen=True)
class Check:
    name: str
    # violation predicate (row-level checks); None for set-level checks
    violation: Column | None = None
    # set-level: distinct-key uniqueness
    unique_cols: tuple[str, ...] | None = None
    # set-level: FK containment
    fk: tuple[str, DataFrame, str] | None = None


def not_null(col: str) -> Check:
    return Check(f"not_null({col})", violation=F.col(col).isNull())


def in_range(col: str, lo, hi) -> Check:
    c = F.col(col)
    return Check(
        f"in_range({col},{lo},{hi})",
        violation=c.isNull() | (c < lo) | (c > hi),
    )


def accepted_values(col: str, values: Sequence) -> Check:
    c = F.col(col)
    return Check(
        f"accepted_values({col})", violation=c.isNull() | ~c.isin(list(values))
    )


def matches(col: str, regex: str) -> Check:
    c = F.col(col)
    return Check(
        f"matches({col})", violation=c.isNull() | ~c.rlike(regex)
    )


def unique(*cols: str) -> Check:
    return Check(f"unique({','.join(cols)})", unique_cols=tuple(cols))


def foreign_key(col: str, parent: DataFrame, parent_col: str) -> Check:
    return Check(
        f"foreign_key({col}->{parent_col})", fk=(col, parent, parent_col)
    )


def expect(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Run all ``checks``; returns (check, violations, total, passed),
    one row per check, violation counts exact."""
    if not checks:
        raise ValueError("expect: at least one check required")
    aggs = [F.count(F.lit(1)).alias("_total")]
    row_checks = [c for c in checks if c.violation is not None]
    uniq_checks = [c for c in checks if c.unique_cols is not None]
    fk_checks = [c for c in checks if c.fk is not None]
    for i, c in enumerate(row_checks):
        aggs.append(
            F.sum(F.when(c.violation, 1).otherwise(0)).alias(f"_v{i}")
        )
    for i, c in enumerate(uniq_checks):
        # surplus rows beyond one per key
        aggs.append(
            (
                F.count(F.lit(1))
                - F.count_distinct(*[F.col(x) for x in c.unique_cols])
            ).alias(f"_u{i}")
        )
    wide = df.agg(*aggs)
    stacked = []
    for i, c in enumerate(row_checks):
        stacked.append((c.name, f"_v{i}"))
    for i, c in enumerate(uniq_checks):
        stacked.append((c.name, f"_u{i}"))
    stack_expr = F.expr(
        "stack({n}, {pairs}) as (check, violations)".format(
            n=len(stacked),
            pairs=", ".join(f"'{nm}', {col}" for nm, col in stacked),
        )
    )
    report = wide.select(stack_expr, F.col("_total").alias("total"))
    for c in fk_checks:
        col, parent, pcol = c.fk
        orphans = (
            df.select(F.col(col))
            .filter(F.col(col).isNotNull())
            .join(
                parent.select(F.col(pcol).alias(col)).distinct(),
                col,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("violations"))
            .select(F.lit(c.name).alias("check"), "violations")
            .crossJoin(df.agg(F.count(F.lit(1)).alias("total")))
        )
        report = report.unionByName(orphans)
    return report.select(
        "check",
        F.col("violations").cast("bigint").alias("violations"),
        F.col("total").cast("bigint").alias("total"),
        (F.col("violations") == 0).alias("passed"),
    )
