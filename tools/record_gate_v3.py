"""Record the v3.0 per-query bench gate (VERDICT r8 task #2): read the
freshly-written BENCH_DETAIL.json — which must come from a QUIET-host
``SPARK_GRAFT_BENCH_RUNS=5 python bench.py`` run — and rewrite the
sentinel-delimited GATE_V3 block in bench.py with one anchor per
measured query (headline + extended). Subsequent bench runs emit
``worst5_vs_gate_v3`` ratios against these anchors, so a silent
regression anywhere in the catalog (the LLM tier included) surfaces in
the driver's compact line.

Usage:
    SPARK_GRAFT_BENCH_RUNS=5 python bench.py   # quiet host
    python tools/record_gate_v3.py
"""

from __future__ import annotations

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    detail = json.load(open(os.path.join(ROOT, "BENCH_DETAIL.json")))
    anchors = {
        **detail["queries"],
        **detail["queries_extended"],
        **detail.get("queries_tier3", {}),
    }
    # min-merge with the existing block (round-11 precedent): anchors
    # only ever TIGHTEN, so one hot recording can never loosen the
    # gate; brand-new queries take their fresh reading
    path = os.path.join(ROOT, "bench.py")
    src = open(path).read()
    m = re.search(
        r"# BEGIN GATE_V3 \(auto-generated\)\n(.*?)# END GATE_V3",
        src,
        flags=re.S,
    )
    if m:
        for name, val in re.findall(
            r'"([^"]+)":\s*([0-9.]+),', m.group(1)
        ):
            if name in anchors:
                anchors[name] = min(anchors[name], float(val))
    lines = ["GATE_V3: dict[str, float] = {"]
    for name in sorted(anchors):
        lines.append(f'    "{name}": {anchors[name]:.3f},')
    lines.append("}")
    block = (
        "# BEGIN GATE_V3 (auto-generated)\n"
        + "\n".join(lines)
        + "\n# END GATE_V3"
    )
    new = re.sub(
        r"# BEGIN GATE_V3 \(auto-generated\)\n.*?# END GATE_V3",
        block,
        src,
        count=1,
        flags=re.S,
    )
    if new == src:
        print("no change (or sentinel missing)", file=sys.stderr)
        return 1
    open(path, "w").write(new)
    print(f"wrote {len(anchors)} v3 anchors into bench.py")
    return 0


if __name__ == "__main__":
    sys.exit(main())
