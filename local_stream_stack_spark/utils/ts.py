"""Timestamp compatibility helpers.

The driver's synthetic parquet stores naive (no-timezone) timestamps,
which Spark 4 reads as TIMESTAMP_NTZ (``spark.sql.parquet.
inferTimestampNTZ.enabled`` defaults to true), while earlier drops of
the same tables stored TIMESTAMP(NANOS) that the catalog decodes to a
session-zoned TIMESTAMP. ``unix_micros``/``unix_seconds`` reject NTZ
input outright, and casting NTZ<->LTZ silently injects the session
timezone — a correctness trap when the engine runs inside a session we
don't own (the correctness driver's vanilla SparkSession).

``epoch_us``/``epoch_s`` therefore compute epoch offsets via
``timestamp_diff`` against an NTZ epoch literal: works for both
timestamp types and is timezone-INDEPENDENT for NTZ input (the common
case — naive parquet data), matching DuckDB's ``epoch_us(ts)`` on the
same files exactly. For LTZ input the NTZ cast applies the session
timezone, which the engine pins to UTC (`session.configure_for_oracle`),
preserving instant semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = "Column | str"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def epoch_us(col: Column | str) -> Column:
    """Microseconds since 1970-01-01 00:00:00 for TIMESTAMP or
    TIMESTAMP_NTZ input (BIGINT). Timezone-independent for NTZ."""
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    return F.timestamp_diff("MICROSECOND", epoch, _c(col).cast("timestamp_ntz"))


def epoch_s(col: Column | str) -> Column:
    """Whole seconds since the epoch (BIGINT), floor semantics —
    equivalent to ``FLOOR(epoch(ts))`` in DuckDB."""
    return F.floor(epoch_us(col) / F.lit(1_000_000)).cast("bigint")
