"""Isolate and profile registered queries for optimization work.

Runs each named query with the noop sink (guide §1.4) best-of-N on the
engine session, prints per-run and best times, and (with --plan) writes
``.explain("formatted")`` to plans/r13/<query>_<tag>.txt plus a one-line
plan-shape summary (Exchange count, join strategies, Python eval nodes,
PushedFilters presence) to stdout.

Usage:
  python tools/profile_query.py [--sf DIR] [--runs N] [--plan TAG] q1 q2 ...
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from local_stream_stack_spark.queries import QUERIES  # noqa: E402
from local_stream_stack_spark.session import get_spark  # noqa: E402


def plan_shape(plan: str) -> str:
    n_ex = len(re.findall(r"\bExchange\b", plan))
    n_aqe = len(re.findall(r"AQEShuffleRead", plan))
    joins = re.findall(
        r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)\b",
        plan,
    )
    pyeval = re.findall(
        r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|"
        r"FlatMapGroupsInPandas)\b",
        plan,
    )
    n_scan = len(re.findall(r"Scan parquet", plan))
    n_wsc = len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan)))
    from collections import Counter

    jc = dict(Counter(joins))
    pc = dict(Counter(pyeval))
    return (
        f"Exchange={n_ex} AQERead={n_aqe} scans={n_scan} codegen={n_wsc} "
        f"joins={jc or '{}'} py={pc or '{}'}"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plan", default=None, help="tag: write plans/r13/<q>_<tag>.txt")
    ap.add_argument("--warm", action="store_true", help="extra warm run not timed")
    ap.add_argument(
        "--plan-only",
        action="store_true",
        help="skip timed runs; just capture the plan (cheap, safe on a busy host)",
    )
    ap.add_argument(
        "--out-dir", default=None, help="override plans output directory"
    )
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark(app_name="profile-query",
                      extra_conf={"spark.driver.memory": "8g"})
    if not args.plan_only:
        # warm JVM + python worker pool like bench.py
        QUERIES["q6_forecast_revenue"].fn(spark, args.sf).write.format(
            "noop"
        ).mode("overwrite").save()
        par = spark.sparkContext.defaultParallelism
        spark.range(par * 4, numPartitions=par).mapInPandas(
            lambda it: it, schema="id long"
        ).write.format("noop").mode("overwrite").save()

    plans_dir = args.out_dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r13",
    )
    for name in args.queries:
        spec = QUERIES.get(name)
        if spec is None:
            print(f"{name}: NOT REGISTERED")
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        times = []
        if not args.plan_only:
            runs = args.runs + (1 if args.warm else 0)
            for i in range(runs):
                t0 = time.time()
                spec.fn(spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.time() - t0
                if args.warm and i == 0:
                    continue
                times.append(dt)
        df = spec.fn(spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        if args.plan:
            os.makedirs(plans_dir, exist_ok=True)
            path = os.path.join(plans_dir, f"{name}_{args.plan}.txt")
            with open(path, "w") as f:
                f.write(plan)
        best = f"best={min(times):.3f}s " if times else ""
        print(
            f"{name}: {best}runs={[round(t, 3) for t in times]} "
            f"| {plan_shape(plan)}",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
