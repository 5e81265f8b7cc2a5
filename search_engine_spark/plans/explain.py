"""Physical-plan assertions — the engine's "did Catalyst do what we
designed for" guardrails, used by tests and bench.

The reference hand-picks plans (three search strategies, codegen SQL —
SURVEY.md §4); we instead DECLARE plans and assert the optimizer
delivered the physical properties we rely on at 100 TB: broadcast for
small dims, pushed filters on scans, whole-stage codegen in hot paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_broadcast_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        "expected a broadcast join in:\n" + plan
    )


def assert_pushed_filters(df: DataFrame, fragment: str) -> None:
    plan = physical_plan(df)
    assert "PushedFilters" in plan and fragment in plan, (
        f"expected pushed filter containing {fragment!r} in:\n" + plan
    )


def assert_wholestage_codegen(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "WholeStageCodegen" in plan, "no WholeStageCodegen span in:\n" + plan


def count_shuffles(df: DataFrame) -> int:
    return physical_plan(df).count("Exchange")
