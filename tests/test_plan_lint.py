"""Blanket physical-plan lint over EVERY registered driver query.

tests/test_plans.py pins specific hot paths to the plans we designed;
this sweep is the complementary no-regression gate: no registered
query may plan a row-at-a-time Python UDF stage, an unkeyed cartesian,
an un-allowlisted nested-loop join, or more shuffle Exchanges than its
documented budget (search_engine_spark/plans/lint.py). The same sweep
emits the per-round PLAN_AUDIT artifact via scripts/plan_audit.py.
"""

from __future__ import annotations

import os

import pytest

from search_engine_spark.plans.lint import (
    DEFAULT_SHUFFLE_BUDGET,
    SHUFFLE_BUDGET,
    audit_queries,
    lint_plan,
)

SF_DIR = os.environ.get("SPARK_GRAFT_LINT_SF", "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# lint_plan unit behavior on synthetic formatted-plan fragments
# ---------------------------------------------------------------------------
def _fake_plan(*nodes: str) -> str:
    return "== Physical Plan ==\n" + "\n".join(
        f"({i + 1}) {n}" for i, n in enumerate(nodes)
    )


def test_lint_flags_row_python_udf():
    r = lint_plan("q", _fake_plan("Scan parquet", "BatchEvalPython"))
    assert any("BatchEvalPython" in v for v in r.violations)


def test_lint_flags_cartesian():
    r = lint_plan("q", _fake_plan("CartesianProduct"))
    assert any("CartesianProduct" in v for v in r.violations)


def test_lint_flags_unallowlisted_bnlj_but_not_baselines():
    bad = lint_plan("q", _fake_plan("BroadcastNestedLoopJoin"))
    assert any("BroadcastNestedLoopJoin" in v for v in bad.violations)
    ok = lint_plan(
        "embedding_neardup_pairs", _fake_plan("BroadcastNestedLoopJoin")
    )
    assert not ok.violations


def test_lint_counts_shuffles_not_broadcast_or_reused():
    plan = _fake_plan(
        "Exchange", "BroadcastExchange", "ReusedExchange", "Exchange"
    )
    r = lint_plan("q", plan)
    assert r.exchanges == 2


def test_lint_enforces_budget():
    over = _fake_plan(*["Exchange"] * (DEFAULT_SHUFFLE_BUDGET + 1))
    assert lint_plan("q", over).violations
    at = _fake_plan(*["Exchange"] * DEFAULT_SHUFFLE_BUDGET)
    assert not lint_plan("q", at).violations


def test_lint_tree_section_not_double_counted():
    # formatted explain repeats operator names in the tree ("+- Exchange
    # ...") — only the numbered details entries may count
    plan = (
        "== Physical Plan ==\n"
        "AdaptiveSparkPlan\n"
        "+- Exchange hashpartitioning(x, 8)\n"
        "   +- Scan parquet\n\n"
        "(1) Scan parquet\n"
        "(2) Exchange\n"
    )
    assert lint_plan("q", plan).exchanges == 1


# ---------------------------------------------------------------------------
# the sweep: every queries() entry plans clean at sf0.001
# ---------------------------------------------------------------------------
@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"driver testdata missing: {SF_DIR}"
)
def test_every_registered_query_plans_clean(spark):
    reports = audit_queries(spark, SF_DIR)
    assert len(reports) >= 88, "registered query count shrank"
    bad = {r.name: r.violations for r in reports if r.violations}
    assert not bad, f"plan-lint violations: {bad}"
    # the budget table must not rot: every explicit entry still binds
    # (a query whose plan dropped below the default belongs back on it)
    by_name = {r.name: r for r in reports}
    for name, budget in SHUFFLE_BUDGET.items():
        assert name in by_name, f"budgeted query {name} vanished"
        assert by_name[name].exchanges > DEFAULT_SHUFFLE_BUDGET, (
            f"{name} now plans {by_name[name].exchanges} <= default "
            f"{DEFAULT_SHUFFLE_BUDGET}; drop its explicit budget {budget}"
        )
