"""Physical-plan audit helpers — make scale properties testable.

The reference hand-codes its physical strategy (hash routing,
map-side combine, out-of-core paging: SURVEY.md §4.1) so its
performance properties are fixed by construction. On Spark the
physical plan is chosen by Catalyst, which means a regression (a
filter that stops reaching the scan, a dimension that silently
stops broadcasting, an extra exchange) can appear without any code
change — these helpers turn the properties the engine relies on at
100 TB into assertions the test suite can pin:

- filters pushed into the parquet scan   (`pushed_filters`)
- column pruning at the scan             (`read_schemas`)
- shuffle count                          (`exchange_count`)
- join strategy                          (`join_strategies`)
- whole-stage codegen coverage           (`codegen_span_count`)

Everything parses ``df.explain("formatted")`` — the stable,
user-facing plan rendering — rather than private JVM internals.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame

__all__ = [
    "formatted_plan",
    "exchange_count",
    "pushed_filters",
    "read_schemas",
    "join_strategies",
    "codegen_span_count",
    "plan_audit",
]


def formatted_plan(df: DataFrame, execute: bool = False) -> str:
    """The ``explain("formatted")`` text of the plan.

    Under AQE the pre-execution rendering is the *initial* plan
    (``isFinalPlan=false``) — runtime re-planning (partition
    coalescing, skew splits) and WholeStageCodegen annotations only
    appear after the query has run. ``execute=True`` runs an action
    on the DataFrame's own plan first (a sink write would execute a
    *wrapped* plan and leave this one un-finalized) so the rendering
    shows the final, adaptively-optimized plan. Audit use only — it
    collects the result to the driver."""
    if execute:
        df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _final_tree(plan: str) -> str:
    """The operator tree of the (final, if executed) plan.

    Formatted output = tree(s) + per-operator detail sections; an
    executed AQE plan additionally renders the initial tree after
    the final one. Operator counting must see exactly ONE tree:
    final-only, details stripped."""
    tree = plan.split("== Initial Plan ==")[0]
    m = re.search(r"\n\s*\n\(\d+\) ", tree)
    return tree[: m.start()] if m else tree


def exchange_count(df: DataFrame | str) -> int:
    """Number of shuffle Exchange operators in the plan.

    Every exchange is a full materialize-and-redistribute of its
    input — the unit of cost that dominates at scale. Reused
    exchanges (Spark's shuffle reuse) are counted once; broadcast
    exchanges are not shuffles and are not counted.
    """
    plan = _final_tree(df if isinstance(df, str) else formatted_plan(df))
    ids = set(re.findall(r"(?<![A-Za-z])Exchange \((\d+)\)", plan))
    return len(ids)


def pushed_filters(df: DataFrame | str) -> list[str]:
    """All predicates the scans pushed down to the data source
    (parquet row-group / page skipping). A hot filter missing from
    this list is read-amplification at scale."""
    plan = df if isinstance(df, str) else formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(df: DataFrame | str) -> list[list[str]]:
    """Per-scan list of column names actually read from the source.

    A scan reading columns the query never uses means column pruning
    failed — at 100 TB that is the difference between reading 2
    columns and reading 40.
    """
    plan = df if isinstance(df, str) else formatted_plan(df)
    schemas: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        body = m.group(1)
        cols = [f.split(":")[0].strip() for f in body.split(",") if f.strip()]
        schemas.append(cols)
    return schemas


def join_strategies(df: DataFrame | str) -> dict[str, int]:
    """Count of physical join operators by strategy name
    (BroadcastHashJoin / SortMergeJoin / ShuffledHashJoin /
    BroadcastNestedLoopJoin / CartesianProduct)."""
    plan = _final_tree(df if isinstance(df, str) else formatted_plan(df))
    counts: dict[str, int] = {}
    for m in re.finditer(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"
        r"|BroadcastNestedLoopJoin|CartesianProduct) \S* ?\S*\s*\(\d+\)",
        plan,
    ):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    return counts


def codegen_span_count(df: DataFrame | str) -> int:
    """Number of WholeStageCodegen spans. Expressions inside a span
    run as generated JVM bytecode; operators outside fall back to
    interpreted row-at-a-time evaluation.

    Parses the *simple* explain rendering: ``formatted`` mode omits
    codegen annotations, while simple mode prefixes each codegen'd
    operator with ``*(span_id)``."""
    if isinstance(df, str):
        plan = df
    else:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain()
        plan = buf.getvalue()
    spans = set(re.findall(r"\*\((\d+)\)", plan))
    spans |= set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    return len(spans)


def plan_audit(df: DataFrame) -> dict:
    """One-call summary of the scale-relevant plan properties."""
    plan = formatted_plan(df)
    return {
        "exchanges": exchange_count(plan),
        "pushed_filters": pushed_filters(plan),
        "read_schemas": read_schemas(plan),
        "join_strategies": join_strategies(plan),
        "codegen_spans": codegen_span_count(df),
    }
