from pagerank_mapreduce_spark.plans.audit import (
    codegen_span_count,
    exchange_count,
    formatted_plan,
    join_strategies,
    plan_audit,
    pushed_filters,
    read_schemas,
)

__all__ = [
    "codegen_span_count",
    "exchange_count",
    "formatted_plan",
    "join_strategies",
    "plan_audit",
    "pushed_filters",
    "read_schemas",
]
