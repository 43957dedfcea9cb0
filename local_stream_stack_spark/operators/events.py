"""Keyed event-stream operators (batch form).

Re-expresses the reference's Kafka data semantics relationally:
latest-per-key is the compacted-topic view (last record per key wins,
`/root/reference/sample_kafka_process.sh:165-192`), tombstones delete a
key (`:206-215`). The as-of join and sessionization are the standard
event-analytics composites Spark lacks as primitives (SURVEY.md §2B).

All three are one-shuffle plans: partitionBy(key) + a linear
per-partition pass. That is the formulation that holds at 100 TB —
no inequality joins, no per-row Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    desc: bool = True,
) -> DataFrame:
    """Latest (or earliest) record per key: Kafka log-compaction view.

    ``order_by`` must end in a unique column (e.g. event_id / offset)
    so the winner is deterministic. One shuffle on ``keys``; Spark
    plans a WindowGroupLimit so executors keep 1 row per key before
    the final filter.
    """
    ordering = [F.col(c).desc() if desc else F.col(c).asc() for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _one_row_per_key_ts(
    right: DataFrame, on: str, right_ts: str, right_cols: Sequence[str]
) -> DataFrame:
    """Reduce the right side to ONE row per (key, ts): the
    lexicographic max over the struct of ``right_cols``. Unlike
    independent per-column ``F.max``, the struct max returns the
    column values of a single real input row — a multi-column right
    payload can never mix values from different source rows
    (pandas ``merge_asof`` returns an actual row; so do we). A plain
    partial-aggregating groupBy: map-side combine, one shuffle on
    (key, ts)."""
    return (
        right.groupBy(on, right_ts)
        .agg(
            F.max(F.struct(*[F.col(c) for c in right_cols])).alias(
                "__row"
            )
        )
        .select(
            on,
            right_ts,
            *[F.col(f"__row.{c}").alias(c) for c in right_cols],
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the nearest right row with
    ``right_ts <= left_ts`` within the same ``on`` key.

    Union + sort + last_value(ignore nulls) pattern: tag both sides,
    union, and carry the latest right-side payload forward over a
    per-key event-time ordering. One shuffle on the key; linear scan.
    This avoids the inequality-join explosion entirely, which is the
    only formulation that survives 100 TB.

    The right side is first reduced to one row per (key, ts) — the
    lexicographic max over the WHOLE struct of ``right_cols``, so the
    surviving values all come from one real input row (independent
    per-column maxes could synthesize a row that never existed,
    ADVICE r7 #4) and ties are deterministic.

    Output: all left columns + ``right_ts`` (as column "right_ts") +
    ``right_cols``. If ``tolerance`` (SQL interval string, e.g.
    ``"INTERVAL 1 HOUR"``) is set, matches older than it are nulled.
    """
    tie_col = right_cols[0]
    r1 = _one_row_per_key_ts(right, on, right_ts, right_cols)

    left_payload = [c for c in left.columns if c not in (on, left_ts)]
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left_payload],
        *[F.lit(None).cast(r1.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
        F.lit(None).cast(r1.schema[right_ts].dataType).alias("__r_ts"),
    )
    r_tagged = r1.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(right_ts).alias("__r_ts"),
    )

    # Right rows sort before left rows at equal ts (asof is inclusive);
    # tie_col breaks any residual tie deterministically.
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__is_left", tie_col if tie_col in left.columns else F.lit(0))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in right_cols
        ],
        F.last("__r_ts", ignorenulls=True).over(w).alias("__f_ts"),
    )
    out = filled.filter(F.col("__is_left") == 1)
    if tolerance is not None:
        too_old = F.col("__f_ts") < F.col("__ts") - F.expr(tolerance)
        out = out.select(
            "*",
            *[
                F.when(too_old, F.lit(None)).otherwise(F.col(f"__f_{c}")).alias(f"__t_{c}")
                for c in right_cols
            ],
            F.when(too_old, F.lit(None)).otherwise(F.col("__f_ts")).alias("__t_ts"),
        )
        final_prefix = "__t_"
    else:
        final_prefix = "__f_"
    return out.select(
        F.col("__k").alias(on),
        F.col("__ts").alias(left_ts),
        *[F.col(c) for c in left_payload],
        *[F.col(f"{final_prefix}{c}").alias(c) for c in right_cols],
        F.col(f"{final_prefix}ts").alias("right_ts"),
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tolerance: str | None = None,
) -> DataFrame:
    """Nearest-direction as-of join: for each left row, the right row
    minimizing ``|right_ts - left_ts|`` within the same ``on`` key
    (pandas ``merge_asof(direction='nearest')`` semantics; ties go to
    the earlier/backward match).

    Same union + single-sort shape as :func:`asof_join` — the backward
    candidate comes from ``last_value(ignore nulls)`` over the
    preceding frame and the forward candidate from ``first_value``
    over the following frame of the SAME per-key ordering, so Spark
    computes both fills in one shuffle + one sort (two WindowExec
    nodes share the partitioning/ordering). Never an inequality join.

    Output: all left columns + ``right_ts``/``right_cols`` of the
    chosen match + a ``matched_direction`` column ('backward',
    'forward', or NULL when no match within ``tolerance``). The right
    side is reduced to one REAL row per (key, ts) first (whole-struct
    max — see :func:`_one_row_per_key_ts`), so ties are deterministic
    and column values stay row-consistent.
    """
    r1 = _one_row_per_key_ts(right, on, right_ts, right_cols)

    left_payload = [c for c in left.columns if c not in (on, left_ts)]
    tie_col = left_payload[0] if left_payload else None
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left_payload],
        *[
            F.lit(None).cast(r1.schema[c].dataType).alias(f"__r_{c}")
            for c in right_cols
        ],
        F.lit(None).cast(r1.schema[right_ts].dataType).alias("__r_ts"),
    )
    r_tagged = r1.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_payload
        ],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(right_ts).alias("__r_ts"),
    )

    # Right rows sort before left rows at equal ts, so an equal-ts
    # right row is visible to the backward frame (gap 0 wins anyway).
    # Right rows are unique per (key, ts) after the r1 reduction, so
    # the NULL tie column on them never decides an ordering.
    order = ["__ts", "__is_left"] + ([tie_col] if tie_col else [])
    wb = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(wb).alias(f"__b_{c}")
            for c in right_cols
        ],
        F.last("__r_ts", ignorenulls=True).over(wb).alias("__b_ts"),
        *[
            F.first(f"__r_{c}", ignorenulls=True).over(wf).alias(f"__f_{c}")
            for c in right_cols
        ],
        F.first("__r_ts", ignorenulls=True).over(wf).alias("__f_ts"),
    )
    picked = filled.filter(F.col("__is_left") == 1).select(
        "*",
        F.when(F.col("__b_ts").isNull() & F.col("__f_ts").isNull(), F.lit(None))
        .when(F.col("__f_ts").isNull(), F.lit("backward"))
        .when(F.col("__b_ts").isNull(), F.lit("forward"))
        .when(
            F.col("__ts") - F.col("__b_ts") <= F.col("__f_ts") - F.col("__ts"),
            F.lit("backward"),
        )
        .otherwise(F.lit("forward"))
        .alias("__dir"),
    )
    if tolerance is not None:
        chosen_ts = F.when(
            F.col("__dir") == "backward", F.col("__b_ts")
        ).when(F.col("__dir") == "forward", F.col("__f_ts"))
        in_tol = (chosen_ts >= F.col("__ts") - F.expr(tolerance)) & (
            chosen_ts <= F.col("__ts") + F.expr(tolerance)
        )
        picked = picked.withColumn(
            "__dir", F.when(in_tol, F.col("__dir"))
        )

    def _chosen(back: str, fwd: str):
        return (
            F.when(F.col("__dir") == "backward", F.col(back))
            .when(F.col("__dir") == "forward", F.col(fwd))
        )

    return picked.select(
        F.col("__k").alias(on),
        F.col("__ts").alias(left_ts),
        *[F.col(c) for c in left_payload],
        *[
            _chosen(f"__b_{c}", f"__f_{c}").alias(c)
            for c in right_cols
        ],
        _chosen("__b_ts", "__f_ts").alias("right_ts"),
        F.col("__dir").alias("matched_direction"),
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap: str = "INTERVAL 30 MINUTE",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign gaps-and-islands session ids per key (batch twin of
    streaming session windows).

    A new session starts when the gap to the previous event exceeds
    ``gap``. Adds a ``session_id`` column (1-based per key). One
    shuffle on ``key``.
    """
    order_cols = [ts] + ([order_tiebreak] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order_cols)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag(ts).over(w)
    new_session = F.when(
        prev_ts.isNull() | (F.col(ts) > prev_ts + F.expr(gap)), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn("__new", new_session).withColumn(
        "session_id", F.sum("__new").over(run).cast("bigint")
    ).drop("__new")


def sessionize_chunked(
    df: DataFrame,
    key: str,
    ts: str,
    gap_us: int = 30 * 60 * 1_000_000,
    chunk_us: int = 6 * 3600 * 1_000_000,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Skew-robust sessionization: identical SESSIONS to ``sessionize``
    (round-6 skew experiment, SCALE.md: a 90%-hot-user corpus slowed
    the plain per-key window 1.5-1.65x because a window partition
    cannot split), computed in two levels so no task ever sorts one
    key's full history:

    1. events sessionize WITHIN (key, time-chunk) — the hot key's
       stream splits across chunk partitions, bounding task input by
       events-per-chunk;
    2. the per-chunk SESSION SUMMARIES (disjoint [start, end]
       intervals, already ordered by time) re-run the same
       gaps-and-islands per key and merge across chunk boundaries —
       level-2 row count is sessions + chunk splits, typically orders
       of magnitude below events (the production hot key is a dense
       bot: many events, few sessions).

    Equivalence argument (pinned in tests/test_events_ops.py):
    sessions are maximal runs with inter-event gap <= G; level-1 can
    only over-split at chunk boundaries, and for adjacent-by-start
    summaries A, B the inter-session event gap is exactly
    B.start - A.end, so the level-2 pass merges precisely the
    boundary splits. Equal timestamps always share a chunk, so
    level-2 start ordering is unambiguous.

    Returns one row per (key, session_id): n_events,
    session_start_us, session_end_us — ``session_id`` numbered by
    session start, matching ``sessionize``'s per-key numbering.
    """
    from local_stream_stack_spark.utils.ts import epoch_us

    order_cols = ["__us"] + ([order_tiebreak] if order_tiebreak else [])
    ev = df.withColumn("__us", epoch_us(ts)).withColumn(
        "__chunk", F.floor(F.col("__us") / F.lit(chunk_us))
    )
    w1 = Window.partitionBy(key, "__chunk").orderBy(*order_cols)
    run1 = w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev1 = F.lag("__us").over(w1)
    new1 = F.when(
        prev1.isNull() | (F.col("__us") - prev1 > F.lit(gap_us)), F.lit(1)
    ).otherwise(F.lit(0))
    lvl1 = (
        ev.withColumn("__s1", F.sum(new1).over(run1))
        .groupBy(key, "__chunk", "__s1")
        .agg(
            F.count("*").alias("__n"),
            F.min("__us").alias("__start"),
            F.max("__us").alias("__end"),
        )
    )
    w2 = Window.partitionBy(key).orderBy("__start")
    run2 = w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_end = F.lag("__end").over(w2)
    new2 = F.when(
        prev_end.isNull() | (F.col("__start") - prev_end > F.lit(gap_us)),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        lvl1.withColumn("session_id", F.sum(new2).over(run2).cast("bigint"))
        .groupBy(key, "session_id")
        .agg(
            F.sum("__n").alias("n_events"),
            F.min("__start").alias("session_start_us"),
            F.max("__end").alias("session_end_us"),
        )
    )


def lag_gaps_chunked(
    df: DataFrame,
    key: str,
    ts_us: str,
    order_tiebreak: str | None = None,
    chunk_us: int = 6 * 3600 * 1_000_000,
) -> DataFrame:
    """Per-key inter-event gap (attributed to the LATER event) without
    a full per-key window — the generic form of the skew remedy behind
    ``sessionize_chunked`` (SCALE.md round-6 skew experiment: per-key
    lag degraded 1.65x under a 90% hot key).

    Level 1: per-chunk summaries (one partial-aggregated shuffle; per
    key their count is CALENDAR-bounded — #active chunks — never
    event-mass-bounded) yield each non-empty chunk's predecessor's
    last timestamp. Level 2: that value enters the (key, chunk)
    window as a synthetic CARRIER row — strictly the smallest
    timestamp in its chunk, since chunks partition time — so ONE
    window pass over events+carriers computes every gap: chunk-first
    events lag to their carrier, everything else lags normally, and
    carriers (whose own lag is NULL) drop out. No event-mass join, no
    plan-branch reuse. Equal timestamps always share a chunk, so
    ordering is unambiguous; the key's first event gets NULL, exactly
    like the plain lag.

    Adds ``gap_us`` to the input frame's columns.
    """
    order_cols = [ts_us] + ([order_tiebreak] if order_tiebreak else [])
    ev = df.withColumn("__chunk", F.floor(F.col(ts_us) / F.lit(chunk_us)))
    summaries = ev.groupBy(key, "__chunk").agg(
        F.max(ts_us).alias("__last_us")
    )
    ws = Window.partitionBy(key).orderBy("__chunk")
    carriers = (
        summaries.withColumn("__prev_last", F.lag("__last_us").over(ws))
        .filter(F.col("__prev_last").isNotNull())
        .select(
            F.col(key),
            F.col("__chunk"),
            F.col("__prev_last").alias(ts_us),
        )
        .withColumn("__carrier", F.lit(1))
    )
    aug = ev.withColumn("__carrier", F.lit(0)).unionByName(
        carriers, allowMissingColumns=True
    )
    w1 = Window.partitionBy(key, "__chunk").orderBy(*order_cols)
    return (
        aug.withColumn("gap_us", F.col(ts_us) - F.lag(ts_us).over(w1))
        .filter(F.col("__carrier") == 0)
        .drop("__chunk", "__carrier")
    )
