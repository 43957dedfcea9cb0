"""Compute CHANGED_SINCE_GREEN for queries/registry.py (VERDICT r5
"What's wrong" #2): every oracle-backed, previously-driver-verified
query whose defining source file was git-modified AFTER the round
marker commit of its last GREEN round must be re-verified before it
can again count as safe filler — a rewrite riding an old green row is
the one remaining silent-regression channel.

Method:
- last green round per query = max round N where CORRECTNESS_r{N}.json
  has hash_match && rows_match && schema_match for it;
- round marker commit = the driver's "round N: verdict/..." commit
  (it contains CORRECTNESS_r{N}.json, so code committed after it is
  code the round-N gate never saw);
- the `sweep-baseline:` commit recorded in COVERAGE.md (the last
  commit at which a FULL-CATALOG parity sweep ran EXACT) acts as a
  floor: a sweep is a verification gate too, so "changed since last
  verified" means changed since the LATER of the query's green-round
  marker and the sweep baseline;
- a query is CHANGED if `git log <since>..HEAD -- <its file>` is
  non-empty (file-level granularity: over-approximates on purpose —
  re-queuing siblings costs only safe filler slots).

Usage:
    python tools/changed_since_green.py          # print the set
    python tools/changed_since_green.py --write  # rewrite the
        sentinel-delimited block in queries/registry.py in place

Run with --write at round close, AFTER the final code commit, then
confirm the window with `python tools/check_parity.py --window`.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from local_stream_stack_spark.queries import QUERIES  # noqa: E402
from local_stream_stack_spark.queries.registry import (  # noqa: E402
    DRIVER_VERIFIED_PREVIOUSLY,
)

REGISTRY_PATH = os.path.join(
    ROOT, "local_stream_stack_spark", "queries", "registry.py"
)
BEGIN = "# BEGIN CHANGED_SINCE_GREEN (auto-generated)"
END = "# END CHANGED_SINCE_GREEN"


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=ROOT, capture_output=True, text=True, check=True
    ).stdout.strip()


def last_green_rounds() -> dict[str, int]:
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, r in rows.items():
            if (
                r.get("hash_match")
                and r.get("rows_match")
                and r.get("schema_match")
            ):
                last[name] = max(last.get(name, 0), rnd)
    return last


def sweep_baseline() -> str | None:
    """Last full-catalog-sweep commit recorded in COVERAGE.md."""
    try:
        with open(os.path.join(ROOT, "COVERAGE.md")) as f:
            text = f.read()
        m = re.findall(r"^sweep-baseline:\s*([0-9a-f]{7,40})\s*$", text, re.M)
        return m[-1] if m else None
    except OSError:
        return None


def _later_of(a: str | None, b: str | None) -> str | None:
    if a is None:
        return b
    if b is None:
        return a
    r = subprocess.run(
        ["git", "merge-base", "--is-ancestor", a, b], cwd=ROOT
    )
    return b if r.returncode == 0 else a


def round_marker(rnd: int) -> str | None:
    """Commit hash of the driver's round-N results commit."""
    out = _git(
        "log", "--format=%H %s", "--all-match", f"--grep=^round {rnd}:"
    )
    for line in out.splitlines():
        h, _, msg = line.partition(" ")
        if re.match(rf"^round {rnd}: ", msg):
            return h
    return None


def main() -> int:
    write = "--write" in sys.argv
    greens = last_green_rounds()
    baseline = sweep_baseline()
    markers: dict[int, str | None] = {}
    changed_files: dict[tuple[str, str], bool] = {}
    changed: list[str] = []
    for name in sorted(DRIVER_VERIFIED_PREVIOUSLY):
        spec = QUERIES.get(name)
        if spec is None or not spec.oracle:
            continue
        rnd = greens.get(name)
        if rnd is not None and rnd not in markers:
            markers[rnd] = round_marker(rnd)
        since = _later_of(
            markers.get(rnd) if rnd is not None else None, baseline
        )
        if since is None:
            # no green round recorded AND no sweep baseline: treat
            # conservatively as changed so it gets (re)sampled
            changed.append(name)
            continue
        fname = os.path.relpath(spec.fn.__code__.co_filename, ROOT)
        key = (fname, since)
        if key not in changed_files:
            # diff against the WORKING TREE (not just HEAD) so
            # uncommitted edits count too
            diff = _git("diff", "--name-only", since, "--", fname)
            changed_files[key] = bool(diff)
        if changed_files[key]:
            changed.append(name)

    print(f"# {len(changed)} queries changed since their last green round")
    block = [BEGIN, "CHANGED_SINCE_GREEN: frozenset[str] = frozenset("]
    if changed:
        block.append("    {")
        for n in sorted(changed):
            block.append(f'        "{n}",')
        block.append("    }")
    block.append(")")
    block.append(END)
    text = "\n".join(block)
    print(text)
    if write:
        with open(REGISTRY_PATH) as f:
            src = f.read()
        i, j = src.index(BEGIN), src.index(END) + len(END)
        with open(REGISTRY_PATH, "w") as f:
            f.write(src[:i] + text + src[j:])
        print(f"# wrote block into {REGISTRY_PATH}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
