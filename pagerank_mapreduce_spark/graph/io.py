"""PageRank result sink and approximate-equality checker.

Sink format replicates the reference writer (mr-pr-cpp.cpp:254-267):
one ``"<id> = <rank>"`` line per page with 12 significant digits
(``std::setprecision(12)`` default-float formatting ≈ ``%.12g``),
followed by a ``"s = <ranksum>"`` trailer line.

Checker replicates correctness_checker.cpp:24-66: line-wise numeric
compare with absolute tolerance 1e-4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def format_ranks(ranks: DataFrame) -> DataFrame:
    """Rank DataFrame (id, rank) → single-column formatted lines, in id
    order, with the ranksum trailer. Write with
    ``df.coalesce(1).write.text(path)`` for a byte-comparable file.

    ``%.12g`` matches C++ ``setprecision(12)`` stream formatting.
    """
    lines = ranks.orderBy("id").select(
        F.format_string("%d = %.12g", F.col("id"), F.col("rank")).alias("value")
    )
    trailer = ranks.agg(
        F.format_string("s = %.12g", F.sum("rank")).alias("value")
    )
    # union preserves the order of the unioned plans under coalesce(1)
    return lines.unionAll(trailer)


def ranks_close(a: DataFrame, b: DataFrame, tol: float = 1e-4) -> bool:
    """Distributed analogue of ./check f1 f2 (correctness_checker.cpp:48):
    per-id absolute difference within ``tol``; ids must match exactly."""
    joined = a.select("id", F.col("rank").alias("rank_a")).join(
        b.select("id", F.col("rank").alias("rank_b")), "id", "full_outer"
    )
    row = joined.agg(
        F.max(
            F.abs(
                F.coalesce("rank_a", F.lit(float("inf")))
                - F.coalesce("rank_b", F.lit(float("-inf")))
            )
        ).alias("max_diff")
    ).first()
    return row["max_diff"] is not None and row["max_diff"] <= tol
