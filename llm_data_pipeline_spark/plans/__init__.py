"""Physical-plan inspection helpers (optimizer hygiene, SURVEY.md §4)."""

from llm_data_pipeline_spark.plans.inspect import (
    assert_no_cartesian,
    broadcast_join_count,
    formatted_plan,
    pushed_filters,
    scan_read_schemas,
    wholestage_codegen_spans,
)

__all__ = [
    "assert_no_cartesian",
    "broadcast_join_count",
    "formatted_plan",
    "pushed_filters",
    "scan_read_schemas",
    "wholestage_codegen_spans",
]
