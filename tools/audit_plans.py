"""Whole-catalog plan audit: flag scale hazards in every query plan.

Checks each registered query's physical plan at the given sf dir for:
- CartesianProduct (always a bug at scale)
- non-broadcast BroadcastNestedLoopJoin (i.e., BNLJ without a
  broadcast side is a row-by-row loop over a shuffled side)
- row-at-a-time PythonUDF in a hot path (BatchEvalPython) — Arrow
  (ArrowEvalPython / mapInPandas / FlatMapGroupsInPandas) is the
  sanctioned Python path
- unpartitioned Window (WindowExec with no PARTITION BY — "No
  Partition Defined": ships every input row to ONE task; the
  distributed-rank operator with_global_rank is the sanctioned
  replacement)

stream_* queries are skipped: calling them executes a streaming job;
their batch-side plans are covered by their batch twins.

Usage: python tools/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from local_stream_stack_spark.queries import QUERIES
from local_stream_stack_spark.session import get_spark


def has_unpartitioned_window(plan: str) -> bool:
    """True if any Window operator line lacks a partition spec.

    A fully-specified window prints ``Window [exprs], [part], [order]``
    (three top-level bracket groups). Two groups are ambiguous:
    ``[exprs], [part]`` (partition-only frame — fine) vs
    ``[exprs], [order]`` (ordered GLOBAL window — one task). The order
    spec always carries ASC/DESC markers, the partition spec never
    does. One group means a global unordered frame — also one task.
    """
    for line in plan.splitlines():
        stripped = line.lstrip(" +-:*")
        if not stripped.startswith("Window "):
            continue
        depth = 0
        groups: list[list[str]] = []
        for ch in stripped:
            if ch == "[":
                if depth == 0:
                    groups.append([])
                depth += 1
            elif ch == "]":
                depth -= 1
            elif depth >= 1 and groups:
                groups[-1].append(ch)
        if len(groups) >= 3:
            continue
        if len(groups) == 2:
            second = "".join(groups[1])
            if " ASC " in second or " DESC " in second:
                return True  # [exprs], [order] — ordered global window
            continue  # [exprs], [part] — partition-only frame
        return True  # one group: global unordered frame
    return False


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="plan-audit", shuffle_partitions=4)
    bad = 0
    for name, spec in sorted(QUERIES.items()):
        if name.startswith("stream_"):
            continue
        try:
            plan = (
                spec.fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {str(e)[:200]}")
            bad += 1
            continue
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CartesianProduct")
        if "BatchEvalPython" in plan:
            flags.append("row-at-a-time PythonUDF")
        if has_unpartitioned_window(plan):
            flags.append("unpartitioned Window")
        for line in plan.splitlines():
            if "BroadcastNestedLoopJoin" in line and "BuildLeft" not in line and "BuildRight" not in line:
                flags.append("non-broadcast BNLJ")
                break
        if flags:
            bad += 1
            print(f"FLAG  {name}: {', '.join(flags)}")
        else:
            print(f"ok    {name}")
    print(f"\n{bad} flagged")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
