"""Data-layout operators: multi-dimensional clustering (Z-order) and
small-file compaction planning.

At 100 TB the dominant cost of most queries is the SCAN, and the scan
cost is set by LAYOUT: a table clustered on one key prunes only on
that key. Z-ordering interleaves the bits of several dimensions into
one sort key, so files (row groups) become hyper-rectangles in the
dimension space and min/max zone maps prune on EVERY interleaved
dimension at once — the technique behind Delta/Iceberg
``OPTIMIZE ... ZORDER BY``. The planner side of the same problem is
small-file compaction: bin-packing many small files into
target-size groups per partition so scan task count tracks data size,
not file count.

Everything here is pure integer expression math (no UDF, no shuffle of
its own), so layouts are deterministic and oracle-replayable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_value(dims: list[Column], bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of each dimension into one
    Z-value (Morton code): output bit ``k*len(dims)+d`` is bit ``k``
    of dimension ``d``. Dimensions must be non-negative ints; callers
    bucket/clamp first (``x % 2^bits``). Pure codegen — an O(bits x
    dims) bitwise expression tree, no UDF.

    Sorting by the Z-value and cutting into equal-count files yields
    files whose min/max spans are tight in EVERY dimension — the
    multi-dimensional clustering that makes zone-map pruning work for
    more than one predicate column."""
    n = len(dims)
    z = F.lit(0).cast("bigint")
    for d, c in enumerate(dims):
        cc = c.cast("bigint")
        for b in range(bits):
            bit = F.shiftrightunsigned(cc, b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * n + d)
    return z


def zorder_sql(dim_exprs: list[str], bits: int = 8) -> str:
    """The identical Morton interleave as a SQL expression string (for
    oracles / engines without the DataFrame API). ``dim_exprs`` are
    SQL snippets yielding the bucketed non-negative ints."""
    n = len(dim_exprs)
    terms = []
    for d, e in enumerate(dim_exprs):
        for b in range(bits):
            # each term fully parenthesized: SQL gives '+' higher
            # precedence than '<<', so 'a << j + b << k' would parse
            # as 'a << (j + b) << k'
            terms.append(f"(((({e}) >> {b}) & 1) << {b * n + d})")
    return "(" + " + ".join(terms) + ")"
