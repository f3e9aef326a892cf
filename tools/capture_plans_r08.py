"""Capture `.explain('formatted')` for bench-headline queries into
plans/r08/<query>_<tag>.txt (tag = before/after) — the round-8
optimization evidence files. Reuses plan_audit's formatted_plan.

Usage: python tools/capture_plans_r08.py <tag> [query ...]
Defaults to every bench.HEADLINE query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402
from birli_spark.session import get_spark  # noqa: E402
from tools.plan_audit import formatted_plan  # noqa: E402


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    wanted = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r08")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan_capture_r08")
    qs = entrymod.queries()
    names = wanted or [n for n in bench.HEADLINE if n in qs]
    failures = []
    for name in names:
        try:
            plan = formatted_plan(qs[name](spark, sf_dir))
        except Exception as e:  # record, keep capturing the rest
            failures.append(name)
            plan = f"PLAN CAPTURE FAILED: {e}\n"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan.splitlines())} lines")
    spark.stop()
    if failures:
        print(f"FAILED: {failures}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
