from .checks import (
    codegen_coverage,
    exchange_count,
    final_plan_str,
    has_broadcast_join,
    has_cartesian,
    has_sort_merge_join,
    plan_str,
    pushed_filters,
    read_schemas,
    scan_columns,
    single_partition_exchanges,
    summarize,
)

__all__ = [
    "codegen_coverage",
    "exchange_count",
    "final_plan_str",
    "has_broadcast_join",
    "has_cartesian",
    "has_sort_merge_join",
    "plan_str",
    "pushed_filters",
    "read_schemas",
    "scan_columns",
    "single_partition_exchanges",
    "summarize",
]
