"""Round-start helper: fold the latest CORRECTNESS_r{N}.json into the
query registry's verification-window tiers.

Prints the updated DRIVER_VERIFIED_PREVIOUSLY set (previous verified +
newly fully-green rows + rows-only rows the driver has now recorded)
and flags rows that FAILED (hash/rows/schema mismatch or error) — those
must stay in the window and be fixed. Run:

    python tools/rotate_window.py CORRECTNESS_r02.json

then paste the printed set into queries/registry.py, empty
NEW_THIS_ROUND, and confirm with `python tools/check_parity.py --window`.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from local_stream_stack_spark.queries.registry import (  # noqa: E402
    DRIVER_VERIFIED_PREVIOUSLY,
    NEW_THIS_ROUND,
    QUERIES,
)


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    rows = json.load(open(sys.argv[1]))
    green, failed, rows_only = [], [], []
    for name, r in rows.items():
        if r.get("err") == "no_oracle":
            rows_only.append(name)
        elif r.get("hash_match") and r.get("rows_match") and r.get("schema_match"):
            green.append(name)
        else:
            failed.append((name, r))
    verified = sorted(set(DRIVER_VERIFIED_PREVIOUSLY) | set(green) | set(rows_only))
    print(f"# driver checked {len(rows)} rows: {len(green)} green,"
          f" {len(rows_only)} rows-only, {len(failed)} FAILED")
    for name, r in failed:
        print(f"# FAILED (fix + keep in window): {name}: {r}")
    unseen = [n for n in QUERIES if n not in verified
              and n not in {f[0] for f in failed}]
    print(f"# still never driver-verified: {len(unseen)}"
          f" (NEW_THIS_ROUND currently holds {len(NEW_THIS_ROUND)})")
    print("\nDRIVER_VERIFIED_PREVIOUSLY: frozenset[str] = frozenset(")
    print("    {")
    for n in verified:
        print(f'        "{n}",')
    print("    }")
    print(")")
    print("\nNEW_THIS_ROUND: frozenset[str] = frozenset()")
    return 0


if __name__ == "__main__":
    sys.exit(main())
