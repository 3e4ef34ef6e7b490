"""Inspect Catalyst physical plans for the properties that matter at scale.

The reference had no optimizer (SURVEY.md §4.1); in the Spark engine the
optimizer IS the execution strategy, so these helpers make its decisions
testable: predicate pushdown reaching the parquet scan, column pruning in
ReadSchema, broadcast joins for dimension tables, whole-stage codegen
coverage, and absence of cartesian products. tests/test_plans.py pins them
as regression guards — a plan that silently loses its pushdown or starts
shuffling a broadcastable dimension fails CI, not the 100 TB run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The `.explain("formatted")` text (captured, not printed)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def analyzed_plan(df: DataFrame) -> str:
    """The analyzed LOGICAL plan — the only inspectable plan for an
    un-started streaming DataFrame (executedPlan requires
    writeStream.start; stateful-operator guards assert on this)."""
    return df._jdf.queryExecution().analyzed().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema strings of every file scan (column-pruning evidence)."""
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", plan)]


def broadcast_join_count(df: DataFrame) -> int:
    """BroadcastHashJoin nodes, counted from the numbered details section
    only — formatted mode prints every operator twice (tree + details)."""
    return len(re.findall(r"\(\d+\) BroadcastHashJoin", formatted_plan(df)))


def shuffle_count(df: DataFrame) -> int:
    """Hash/range shuffle Exchange nodes (excludes BroadcastExchange).

    RoundRobin exchanges are excluded too: the only ones in this codebase
    come from ``queries.scatter()``, the conditional fan-out of
    single-row-group test files, which is a no-op on real multi-split
    scans — counting it would make the plan guards fail on an exchange
    that does not exist at scale.
    """
    plan = formatted_plan(df)
    total = len(re.findall(r"\(\d+\) Exchange\b", plan))
    round_robin = len(re.findall(r"Arguments: RoundRobinPartitioning", plan))
    return total - round_robin


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of distinct whole-stage-codegen stages.

    Under AQE the pre-execution formatted plan hides codegen stages, so
    also scan the executed-plan string, where codegen membership prints as
    a ``*(N)`` operator prefix (N = codegen stage id) rather than the
    literal ``WholeStageCodegen`` label formatted mode uses.
    """
    formatted = len(re.findall(r"WholeStageCodegen", formatted_plan(df)))
    simple_ids = {m.group(1) for m in re.finditer(r"\*\((\d+)\)", simple_plan(df))}
    return max(formatted, len(simple_ids))


def assert_no_cartesian(df: DataFrame) -> None:
    plan = formatted_plan(df)
    if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
        raise AssertionError("plan contains a cartesian/nested-loop join:\n" + plan)
