"""Sweep every registered driver query's physical plan through the
plan lint (search_engine_spark/plans/lint.py) and emit one JSON line:
per-query Exchange counts, Python stage kinds, join strategies, and
any violations. The artifact (PLAN_AUDIT_r{N}.json) is the blanket
"no scale-killer plan shapes anywhere" evidence next to the targeted
pins in tests/test_plans.py.

Usage: python scripts/plan_audit.py [sf_dir] [name ...]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from search_engine_spark.plans.lint import audit_queries
from search_engine_spark.session import build_session


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:]) or None
    spark = build_session("plan_audit", cpus=4, shuffle_partitions=8)
    reports = audit_queries(spark, sf_dir, names=only)
    out = {
        "sf_dir": sf_dir,
        "n_queries": len(reports),
        "n_violations": sum(len(r.violations) for r in reports),
        "queries": {
            r.name: {
                "exchanges": r.exchanges,
                "python_stages": r.python_stages,
                "broadcast_joins": r.broadcast_joins,
                "sortmerge_joins": r.sortmerge_joins,
                "violations": r.violations,
            }
            for r in reports
        },
    }
    print(json.dumps(out))
    return 1 if out["n_violations"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
