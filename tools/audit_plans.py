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
- sort-sampling double execution (the round-13 family): an
  ``Exchange rangepartitioning`` (global orderBy) whose child segment
  contains an expensive operator (Python evaluation, Generate, a
  join, or a regex-heavy projection) with NO materialization boundary
  in between (another Exchange / Scan ExistingRDD / cached relation).
  The range partitioner's bound-sampling job re-executes that whole
  child segment a second time; pin it (localCheckpoint before the
  sort) or put an exchange below the sort.

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


# Nodes that MATERIALIZE their subtree for re-executions of the plan:
# a shuffle exchange keeps its map outputs (resample jobs reuse them),
# a broadcast exchange computes its relation once per plan, and a
# pinned/cached relation scans an RDD. Anything below one of these is
# NOT re-executed by the range partitioner's sampling job.
_SAMPLING_BARRIERS = (
    "Exchange ",
    "BroadcastExchange",
    "ReusedExchange",
    "AQEShuffleRead",
    "Scan ExistingRDD",
    "InMemoryTableScan",
    "LocalTableScan",
    "TableCacheQueryStage",
    "BroadcastQueryStage",
    "ShuffleQueryStage",
)

# Operators expensive enough that executing them twice for sort-bound
# sampling is a real regression (the round-13 pin family).
_EXPENSIVE_NODES = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "MapInArrow",
    "FlatMapGroupsInPandas",
    "TransformWithStateInPandas",
    "Generate",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)

# Expression markers that make a plain Project/Filter expensive enough
# to matter when doubled (regex engine / edit distance per row).
_EXPENSIVE_EXPRS = ("regexp_", "levenshtein", "split(", "rlike")


# Audited sort-sampling exceptions (r14): these queries DO re-execute
# a scan-rooted segment for the range partitioner's bound sampling,
# and each was examined: the segment is a sub-half-second tokenize/
# explode/broadcast-probe over a 5k-row corpus slice, so an eager pin
# (one extra sequential driver job, ~0.3 s local floor) costs what the
# resample does. The two heaviest (dedup_repeated_ngram_spans,
# doc_novelty_scores) were pin-vs-resample A/B-ed at sf0.1 and
# measured a wash (spans median 2.68 s unpinned vs 2.50 pinned, best
# 2.29 vs 2.35; novelty median 1.96 vs 2.06) — same verdict as the
# three r13 reverted pins. A NEW query matching the hazard shape is
# NOT excepted and will flag until examined.
RANGE_RESAMPLE_ACCEPTED = {
    "chunk_documents",
    "clean_text_scrub",
    "dedup_repeated_ngram_spans",
    "doc_fingerprint",
    "doc_novelty_scores",
    "explode_outer_rare_tokens",
    "join_anti",
    "join_outer_full",
    "null_semantics",
    "nulls_ordering",
    "q20_dominant_suppliers",
    "set_ops_bag",
    "udtf_tokenize",
    "unicode_nfc_normalize",
}


def _node_depth(line: str) -> int:
    """Character offset where the operator name starts in a plan line
    (the tree prefix is drawn from ``: ``, ``+-``, ``:-``, spaces)."""
    i = 0
    while i < len(line) and line[i] in " :+-|*(0123456789)":
        i += 1
    return i


def range_exchange_hazards(plan: str) -> list[str]:
    """Sort-sampling double-execution hazards in a physical plan.

    For every ``Exchange rangepartitioning`` node, walk its child
    segment — stopping each branch at the first materialization
    barrier (``_SAMPLING_BARRIERS``) — and report the expensive
    operators the bound-sampling job would re-execute. A segment only
    counts as a hazard when it ALSO reaches an unmaterialized
    base-table scan (``Scan parquet``/``FileScan``): that is the r13
    family's shape (corpus-scale scan -> expensive narrow ops ->
    global sort, all re-executed by the sampler). Expensive nodes
    sitting above pinned/exchanged inputs re-run only state-table-
    sized work — resampling those is cheaper than pinning them
    (measured r13: three such pins were A/B-ed and reverted).
    Returns one string per flagged exchange, empty when clean."""
    lines = plan.splitlines()
    hazards: list[str] = []
    for i, line in enumerate(lines):
        d = _node_depth(line)
        node = line[d:]
        if not node.startswith("Exchange rangepartitioning"):
            continue
        found: list[str] = []
        scans_base = False
        skip_deeper_than: int | None = None
        for sub in lines[i + 1:]:
            sd = _node_depth(sub)
            if sd <= d:
                break  # left the exchange's subtree
            if skip_deeper_than is not None:
                if sd > skip_deeper_than:
                    continue  # inside a barrier's subtree
                skip_deeper_than = None
            name = sub[sd:]
            if any(name.startswith(b) for b in _SAMPLING_BARRIERS):
                skip_deeper_than = sd
                continue
            if name.startswith("Scan parquet") or name.startswith(
                "FileScan"
            ) or name.startswith("ColumnarToRow"):
                scans_base = True
                continue
            hit = next(
                (n for n in _EXPENSIVE_NODES if name.startswith(n)), None
            )
            if hit is None and (
                name.startswith("Project") or name.startswith("Filter")
            ):
                if any(m in name for m in _EXPENSIVE_EXPRS):
                    hit = "regex-heavy " + name.split(" ")[0]
            if hit and hit not in found:
                found.append(hit)
        if found and scans_base:
            hazards.append(
                "rangepartitioning resamples unpinned segment with: "
                + ", ".join(found)
            )
    return hazards


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
        if name not in RANGE_RESAMPLE_ACCEPTED:
            flags.extend(range_exchange_hazards(plan))
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
