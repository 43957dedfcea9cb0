"""Event-stream operators in their batch (replay) form.

These re-express the reference's Kafka data semantics relationally
(SURVEY.md §2 A15-A17): latest-per-key = log compaction
(`sample_kafka_process.sh:165-192`), tombstone delete = null/marker
payload (`sample_kafka_process.sh:206-215`), plus the streaming
operator family (tumbling/sliding/session windows, dedup, as-of and
range joins) that Structured Streaming runs incrementally — identical
logical plans run here in batch so the DuckDB oracle can check them.
The live-streaming execution of the same operators lives in
``local_stream_stack_spark.streaming`` and is covered by pytest with
bounded sources.

All timestamps are emitted as epoch microseconds (BIGINT): Spark reads
the ns parquet as us-truncated TIMESTAMP, DuckDB as TIMESTAMP_NS; the
driver data is us-granular so both agree on epoch_us.

Scale notes: every operator here is a single shuffle on its key
(user_id) or on the window bucket; as-of uses the union+last_value
pattern (one shuffle, no range explosion) rather than an inequality
join, which is the 100 TB-safe formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from local_stream_stack_spark.catalog import load_table
from local_stream_stack_spark.operators.events import (
    latest_per_key,
    asof_join,
    sessionize,
)
from local_stream_stack_spark.queries.registry import query
from local_stream_stack_spark.session import configure_for_oracle
from local_stream_stack_spark.utils.ts import epoch_s, epoch_us


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_for_oracle(spark)
    return load_table(spark, sf_dir, "events")


@query(
    "latest_per_key",
    oracle="""
    SELECT user_id, event_id, event_type, value,
           CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS ts_us
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) t
    WHERE rn = 1
    ORDER BY user_id
    """,
)
def latest_per_key_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka log-compaction view: last record per key wins
    (`sample_kafka_process.sh:165-192`, README.md:131-176)."""
    e = _events(spark, sf_dir)
    return (
        latest_per_key(e, keys=["user_id"], order_by=["ts", "event_id"])
        .select(
            "user_id",
            "event_id",
            "event_type",
            "value",
            epoch_us("ts").alias("ts_us"),
        )
        .orderBy("user_id")
    )


@query(
    "compaction_tombstone",
    oracle="""
    SELECT user_id, event_id, event_type, value
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) t
    WHERE rn = 1 AND event_type <> 'error'
    ORDER BY user_id
    """,
)
def compaction_tombstone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction + tombstone delete: after latest-per-key, keys whose
    latest record is a tombstone disappear from the view
    (`sample_kafka_process.sh:206-215` uses null payloads; the events
    table has no null values, so 'error' stands in as the marker)."""
    e = _events(spark, sf_dir)
    return (
        latest_per_key(e, keys=["user_id"], order_by=["ts", "event_id"])
        .filter(F.col("event_type") != "error")
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id")
    )


@query(
    "asof_join_events",
    oracle="""
    WITH v1 AS (
      SELECT user_id, ts, MAX(event_id) AS view_event_id
      FROM events WHERE event_type = 'view'
      GROUP BY user_id, ts
    ),
    tagged AS (
      SELECT user_id, ts, NULL::BIGINT AS purchase_id, view_event_id, ts AS view_ts,
             0 AS is_left
      FROM v1
      UNION ALL
      SELECT user_id, ts, event_id AS purchase_id, NULL::BIGINT, NULL::TIMESTAMP_NS,
             1 AS is_left
      FROM events WHERE event_type = 'purchase'
    ),
    filled AS (
      SELECT user_id, ts, purchase_id, is_left,
             LAST_VALUE(view_event_id IGNORE NULLS) OVER w AS view_event_id,
             LAST_VALUE(view_ts IGNORE NULLS) OVER w AS view_ts
      FROM tagged
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_left, purchase_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT purchase_id, user_id,
           CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS purchase_ts_us,
           view_event_id,
           CAST(epoch_us(CAST(view_ts AS TIMESTAMP)) AS BIGINT) AS view_ts_us
    FROM filled
    WHERE is_left = 1
    ORDER BY purchase_id
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each 'purchase' matched to the nearest-earlier 'view'
    of the same user (SURVEY §2B joins — no native Spark asof).

    Implemented with the union + last_value(ignore nulls) pattern: one
    shuffle on user_id, linear scan per partition — never an
    inequality join, which would explode at scale. Right side is
    deduped to one row per (user, ts) so ties are deterministic.
    """
    e = _events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase")
    views = e.filter(F.col("event_type") == "view")
    joined = asof_join(
        left=purchases.select("user_id", "ts", F.col("event_id").alias("purchase_id")),
        right=views.select("user_id", "ts", F.col("event_id").alias("view_event_id")),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["view_event_id"],
        tolerance=None,
    )
    return joined.select(
        "purchase_id",
        "user_id",
        epoch_us("ts").alias("purchase_ts_us"),
        "view_event_id",
        epoch_us("right_ts").alias("view_ts_us"),
    ).orderBy("purchase_id")


@query(
    "range_join_views_before_purchase",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           COUNT(v.event_id) AS n_views_1h,
           COALESCE(CAST(ROUND(SUM(CAST(v.value AS DECIMAL(18,6))), 4) AS DOUBLE), 0.0) AS sum_view_value
    FROM events p
    LEFT JOIN events v
      ON p.user_id = v.user_id
     AND v.event_type = 'view'
     AND v.ts >= p.ts - INTERVAL 1 HOUR
     AND v.ts < p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id
    ORDER BY purchase_id
    """,
)
def range_join_views_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal range join: views in the hour before each purchase.

    Equi-join on user_id carries the range predicate as a join filter,
    so Spark executes a hash join + filter (not a BNLJ). At 100 TB the
    same plan holds because the equi-key bounds the pair space; for
    key-skewed data AQE skew-join splits the hot user.
    """
    e = _events(spark, sf_dir)
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"), F.col("event_id").alias("v_id"), F.col("value").alias("v_value")
    )
    return (
        p.join(
            v,
            (F.col("p_user") == F.col("v_user"))
            & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("v_ts") < F.col("p_ts")),
            "left",
        )
        .groupBy("purchase_id", F.col("p_user").alias("user_id"))
        .agg(
            F.count("v_id").alias("n_views_1h"),
            F.coalesce(
                F.expr("CAST(ROUND(SUM(CAST(v_value AS DECIMAL(18,6))), 4) AS DOUBLE)"),
                F.lit(0.0),
            ).alias("sum_view_value"),
        )
        .orderBy("purchase_id")
    )


@query(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts, event_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           CAST(epoch_us(CAST(MIN(ts) AS TIMESTAMP)) AS BIGINT) AS session_start_us,
           CAST(epoch_us(CAST(MAX(ts) AS TIMESTAMP)) AS BIGINT) AS session_end_us
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (gaps-and-islands, 30-min inactivity gap).

    The batch twin of streaming session windows: lag + cumulative sum
    over one user_id shuffle. See streaming/ops.py for the
    session_window streaming form of the same operator.
    """
    e = _events(spark, sf_dir)
    sess = sessionize(
        e, key="user_id", ts="ts", gap="INTERVAL 30 MINUTE", order_tiebreak="event_id"
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            epoch_us(F.min("ts")).alias("session_start_us"),
            epoch_us(F.max("ts")).alias("session_end_us"),
        )
        .orderBy("user_id", "session_id")
    )


@query(
    "sessionize_events_chunked",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts, event_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           CAST(epoch_us(CAST(MIN(ts) AS TIMESTAMP)) AS BIGINT) AS session_start_us,
           CAST(epoch_us(CAST(MAX(ts) AS TIMESTAMP)) AS BIGINT) AS session_end_us
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def sessionize_events_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKEW-ROBUST sessionization — the same sessions as
    ``sessionize_events`` (the oracle is LITERALLY the plain
    sessionize SQL: equality with unchunked semantics IS the
    correctness claim) computed without ever sorting one user's full
    history in one task: gaps-and-islands within (user, 6-hour chunk)
    first, then the identical pass over the per-chunk session
    summaries merges boundary splits (operators/events.py
    ``sessionize_chunked`` — equivalence argument there, measured
    skew motivation in SCALE.md). At 100 TB this is the sessionizer
    you run when per-key history is unbounded (bots, service
    accounts): level-1 task input is bounded by events-per-chunk, and
    the residual per-key window runs on session summaries, orders of
    magnitude smaller."""
    from local_stream_stack_spark.operators.events import sessionize_chunked

    e = _events(spark, sf_dir)
    return (
        sessionize_chunked(
            e,
            key="user_id",
            ts="ts",
            gap_us=30 * 60 * 1_000_000,
            chunk_us=6 * 3600 * 1_000_000,
            order_tiebreak="event_id",
        )
        .select(
            "user_id",
            "session_id",
            "n_events",
            "session_start_us",
            "session_end_us",
        )
        .orderBy("user_id", "session_id")
    )


@query(
    "tumbling_window_agg",
    oracle="""
    SELECT CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 3600) * 3600 AS BIGINT) AS window_start_s,
           event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregate — the batch twin of
    `groupBy(F.window("ts", "1 hour"))` in Structured Streaming
    (SURVEY §2B streaming-only rows)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.expr("CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE)").alias(
                "sum_value"
            ),
        )
        .select(
            epoch_s("w.start").alias("window_start_s"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start_s", "event_type")
    )


@query(
    "sliding_window_agg",
    oracle="""
    WITH buckets AS (
      SELECT CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 1800) * 1800 AS BIGINT) AS b0, value
      FROM events
    ),
    assigned AS (
      SELECT b0 AS window_start_s, value FROM buckets
      UNION ALL
      SELECT b0 - 1800 AS window_start_s, value FROM buckets
    )
    SELECT window_start_s, COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
    FROM assigned
    GROUP BY window_start_s
    ORDER BY window_start_s
    """,
)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h width, 30 min slide): each event lands in 2
    windows. F.window expands rows exactly like the oracle's 2-bucket
    union — row growth = width/slide, a constant, so scale-safe."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.expr("CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE)").alias(
                "sum_value"
            ),
        )
        .select(
            epoch_s("w.start").alias("window_start_s"),
            "n_events",
            "sum_value",
        )
        .orderBy("window_start_s")
    )


@query(
    "session_window_agg",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
      FROM flagged
    )
    SELECT user_id,
           CAST(epoch_us(CAST(MIN(ts) AS TIMESTAMP)) AS BIGINT) AS session_start_us,
           CAST(epoch_us(CAST(MAX(ts) AS TIMESTAMP)) AS BIGINT) + 1800000000
             AS session_end_us,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, sid
    ORDER BY user_id, session_start_us
    """,
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.session_window (30-min gap) in batch mode — the native Spark
    session operator whose streaming form closes sessions at the
    watermark. Session end = last event + gap (Spark semantics: a new
    event at exactly prev+gap starts a NEW session, hence the >= in
    the oracle's island split)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            epoch_us("w.start").alias("session_start_us"),
            epoch_us("w.end").alias("session_end_us"),
            "n_events",
        )
        .orderBy("user_id", "session_start_us")
    )


@query(
    "dedup_keys",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-level dedup — batch twin of streaming
    `dropDuplicates(["user_id","event_type"])` (keys-only output so the
    result is deterministic; value columns of dropDuplicates are
    first-seen and non-deterministic in batch)."""
    e = _events(spark, sf_dir)
    return e.select("user_id", "event_type").distinct()


@query(
    "asof_join_tolerance",
    oracle="""
    WITH v1 AS (
      SELECT user_id, ts, MAX(event_id) AS view_event_id
      FROM events WHERE event_type = 'view'
      GROUP BY user_id, ts
    ),
    tagged AS (
      SELECT user_id, ts, NULL::BIGINT AS purchase_id, view_event_id, ts AS view_ts,
             0 AS is_left
      FROM v1
      UNION ALL
      SELECT user_id, ts, event_id AS purchase_id, NULL::BIGINT, NULL::TIMESTAMP_NS,
             1 AS is_left
      FROM events WHERE event_type = 'purchase'
    ),
    filled AS (
      SELECT user_id, ts, purchase_id, is_left,
             LAST_VALUE(view_event_id IGNORE NULLS) OVER w AS view_event_id,
             LAST_VALUE(view_ts IGNORE NULLS) OVER w AS view_ts
      FROM tagged
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_left, purchase_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT purchase_id, user_id,
           CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS purchase_ts_us,
           CASE WHEN view_ts < ts - INTERVAL 2 HOUR THEN NULL
                ELSE view_event_id END AS view_event_id,
           CASE WHEN view_ts < ts - INTERVAL 2 HOUR THEN NULL
                ELSE CAST(epoch_us(CAST(view_ts AS TIMESTAMP)) AS BIGINT)
           END AS view_ts_us
    FROM filled
    WHERE is_left = 1
    ORDER BY purchase_id
    """,
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness bound: matches older than 2 hours
    null out (pandas merge_asof 'tolerance' semantics). Same
    union+last_value single-shuffle plan; the tolerance is a post-fill
    predicate, so the cost is identical to the unbounded form."""
    e = _events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase")
    views = e.filter(F.col("event_type") == "view")
    joined = asof_join(
        left=purchases.select("user_id", "ts", F.col("event_id").alias("purchase_id")),
        right=views.select("user_id", "ts", F.col("event_id").alias("view_event_id")),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["view_event_id"],
        tolerance="INTERVAL 2 HOURS",
    )
    return joined.select(
        "purchase_id",
        "user_id",
        epoch_us("ts").alias("purchase_ts_us"),
        "view_event_id",
        epoch_us("right_ts").alias("view_ts_us"),
    ).orderBy("purchase_id")


@query(
    "interval_join_peak_windows",
    oracle="""
    WITH peaks AS (
      SELECT event_type AS peak_type, ts AS peak_ts FROM (
        SELECT event_type, ts,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value DESC, event_id) AS rn
        FROM events
      ) t WHERE rn = 1
    ),
    iv AS (
      SELECT peak_type,
             peak_ts - INTERVAL 30 MINUTE AS lo,
             peak_ts + INTERVAL 30 MINUTE AS hi
      FROM peaks
    )
    SELECT iv.peak_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM iv JOIN events e ON e.ts >= iv.lo AND e.ts <= iv.hi
    GROUP BY iv.peak_type
    ORDER BY iv.peak_type
    """,
)
def interval_join_peak_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless interval containment join, binned: traffic around each
    event type's peak-value moment (±30 min), joined WITHOUT an equi
    key — the case Catalyst can only plan as a nested-loop join.
    ``binned_interval_join`` restores a hash join: points bin by hour,
    each interval explodes to its ≤2 covering bins, equi-join on the
    bin + residual range filter; a qualifying pair meets in exactly
    one bin so no dedup pass. The oracle runs the plain inequality
    join."""
    from local_stream_stack_spark.operators.joins import binned_interval_join

    e = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    peaks = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("event_type").alias("peak_type"),
            (F.col("ts") - F.expr("INTERVAL 30 MINUTES")).alias("lo"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("hi"),
        )
    )
    joined = binned_interval_join(
        e.select("ts", "user_id"), peaks, ts_col="ts",
        lo_col="lo", hi_col="hi", bin_width_s=3600,
    )
    return (
        joined.groupBy("peak_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("peak_type")
    )


@query(
    "scd2_history",
    oracle="""
    SELECT user_id,
           value,
           CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS valid_from_us,
           CAST(epoch_us(CAST(LEAD(ts) OVER w AS TIMESTAMP)) AS BIGINT)
             AS valid_to_us,
           CASE WHEN LEAD(ts) OVER w IS NULL THEN TRUE ELSE FALSE END
             AS is_current
    FROM events
    WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, valid_from_us
    """,
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2: each user's purchase history
    as versioned rows with [valid_from, valid_to) ranges and a
    current-row flag — the warehouse pattern for point-in-time joins
    (pair with asof_join_events for the lookup side). One shuffle on
    user_id; lead() closes each version when the next opens."""
    e = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            "value",
            epoch_us("ts").alias("valid_from_us"),
            epoch_us(F.lead("ts").over(w)).alias("valid_to_us"),
            F.lead("ts").over(w).isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from_us")
    )


@query(
    "funnel_stages",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_view_click,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_view_click_purchase
    """,
)
def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked AFTER their first
    view, then purchased AFTER that first click — the sequential
    pattern query behind conversion reports. Three staged per-user MIN
    aggregates, each stage joining only the (user, ts) survivors of
    the previous one: shuffle volume shrinks monotonically down the
    funnel and nothing ever carries event payloads."""
    e = _events(spark, sf_dir)
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    counts = (
        v.agg(F.count("*").alias("n")).select(F.lit(0).alias("s"), "n")
        .union(c.agg(F.count("*").alias("n")).select(F.lit(1).alias("s"), "n"))
        .union(p.agg(F.count("*").alias("n")).select(F.lit(2).alias("s"), "n"))
    )
    return counts.agg(
        F.max(F.when(F.col("s") == 0, F.col("n"))).alias("n_view"),
        F.max(F.when(F.col("s") == 1, F.col("n"))).alias("n_view_click"),
        F.max(F.when(F.col("s") == 2, F.col("n"))).alias(
            "n_view_click_purchase"
        ),
    )


@query(
    "cohort_retention",
    oracle="""
    WITH first_day AS (
      SELECT user_id,
             CAST(FLOOR(epoch(CAST(MIN(ts) AS TIMESTAMP)) / 86400) AS BIGINT)
               AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             CAST(FLOOR(epoch(CAST(e.ts AS TIMESTAMP)) / 86400) AS BIGINT)
               - f.cohort_day AS day_offset
      FROM events e JOIN first_day f ON e.user_id = f.user_id
    )
    SELECT cohort_day, day_offset, COUNT(*) AS n_users
    FROM activity
    WHERE day_offset <= 7
    GROUP BY cohort_day, day_offset
    ORDER BY cohort_day, day_offset
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day, counted
    on each subsequent day they return (offsets 0-7) — the
    engagement-curve query every product dashboard runs. Two shuffles
    on user_id (first-day aggregate, then the distinct day-offset
    set); day arithmetic is integer epoch-day, engine-exact."""
    e = _events(spark, sf_dir)
    day = (F.floor(epoch_us(F.col("ts")) / F.lit(86_400_000_000))).cast(
        "bigint"
    )
    first_day = e.groupBy("user_id").agg(F.min(day.alias("d")).alias("m")).select(
        "user_id", F.col("m").alias("cohort_day")
    )
    activity = (
        e.select("user_id", day.alias("day"))
        .join(first_day, "user_id")
        .select(
            "user_id",
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
        .filter(F.col("day_offset") <= 7)
    )
    return (
        activity.groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


@query(
    "zscore_outliers",
    oracle="""
    WITH s AS (
      SELECT event_type,
             AVG(value) AS mu,
             stddev_samp(value) AS sd
      FROM events GROUP BY event_type
    )
    SELECT event_id, event_type,
           CAST(ROUND(abs((e.value - s.mu) / s.sd), 4) AS DECIMAL(18,4)) AS az
    FROM events e JOIN s USING (event_type)
    ORDER BY az DESC, event_id
    LIMIT 20
    """,
)
def zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 per-type z-score outliers — the anomaly-flagging shape
    for metric streams (and the numeric twin of quality-score
    filtering on documents). Per-type mean/stddev aggregate in one
    shuffle to a tiny table that broadcasts back over the scan, so
    each event scores in codegen with no second wide exchange; the
    global top-20 is TakeOrderedAndProject on the 4-dp-rounded DECIMAL
    score (per-partition heaps, driver merges 20-row heads), making
    the cut boundary identical on both engines."""
    e = _events(spark, sf_dir)
    s = e.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    return (
        e.join(F.broadcast(s), "event_type")
        .select(
            "event_id",
            "event_type",
            F.round(F.abs((F.col("value") - F.col("mu")) / F.col("sd")), 4)
            .cast("decimal(18,4)")
            .alias("az"),
        )
        .orderBy(F.desc("az"), F.asc("event_id"))
        .limit(20)
    )


@query(
    "rollup_time_hierarchy",
    oracle="""
    WITH base AS (
      SELECT CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 60) * 60 AS BIGINT)
               AS bucket_s,
             CAST(value AS DECIMAL(18,6)) AS v
      FROM events
    )
    SELECT 'minute' AS granularity, bucket_s,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(ROUND(SUM(v), 4) AS DOUBLE) AS sum_value
    FROM base GROUP BY bucket_s
    UNION ALL
    SELECT 'hour', CAST(FLOOR(bucket_s / 3600) * 3600 AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           CAST(ROUND(SUM(v), 4) AS DOUBLE)
    FROM base GROUP BY 2
    UNION ALL
    SELECT 'day', CAST(FLOOR(bucket_s / 86400) * 86400 AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           CAST(ROUND(SUM(v), 4) AS DOUBLE)
    FROM base GROUP BY 2
    ORDER BY granularity, bucket_s
    """,
)
def rollup_time_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate hierarchy: minute tier
    aggregates the raw scan once; the hour tier re-aggregates MINUTE
    PARTIALS (sums of sums, counts of counts), and the day tier
    re-aggregates hour partials — raw events are never rescanned for
    the coarser grains. That is the TimescaleDB/Druid rollup cascade:
    at 100 TB the minute tier is a materialized table maintained
    incrementally (see the incremental-view query), and each coarser
    tier shuffles only ~|buckets| partial rows, not events. Decimal
    sums keep the cascade addition-order-exact, so re-aggregation
    matches the oracle's direct GROUP BY per grain."""
    e = _events(spark, sf_dir)
    minute = (
        e.select(
            (F.floor(epoch_s("ts") / 60) * 60).alias("bucket_s"),
            F.col("value").cast("decimal(18,6)").alias("v"),
        )
        .groupBy("bucket_s")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    )
    hour = minute.groupBy(
        (F.floor(F.col("bucket_s") / 3600) * 3600).alias("bucket_s")
    ).agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    day = hour.groupBy(
        (F.floor(F.col("bucket_s") / 86400) * 86400).alias("bucket_s")
    ).agg(F.sum("n").alias("n"), F.sum("s").alias("s"))

    def tier(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.lit(name).alias("granularity"),
            "bucket_s",
            F.col("n").cast("long").alias("n_events"),
            F.round(F.col("s"), 4).cast("double").alias("sum_value"),
        )

    return (
        tier(minute, "minute")
        .unionAll(tier(hour, "hour"))
        .unionAll(tier(day, "day"))
        .orderBy("granularity", "bucket_s")
    )


@query(
    "gap_fill_locf",
    oracle="""
    WITH users AS (SELECT DISTINCT user_id FROM events WHERE user_id < 5),
    spine AS (
      SELECT user_id, unnest(generate_series(0, 359)) AS m FROM users
    ),
    mv AS (
      SELECT user_id,
             CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 60) * 60 AS BIGINT)
               AS bucket_s,
             arg_max(value,
                     lpad(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS VARCHAR), 20, '0')
                     || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS v
      FROM events
      WHERE user_id < 5
        AND epoch(CAST(ts AS TIMESTAMP)) < 1704067200 + 21600
      GROUP BY 1, 2
    )
    SELECT s.user_id,
           CAST(1704067200 + s.m * 60 AS BIGINT) AS bucket_s,
           mv.v AS v_raw,
           last_value(mv.v IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.m
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
    FROM spine s
    LEFT JOIN mv ON mv.user_id = s.user_id
                AND mv.bucket_s = 1704067200 + s.m * 60
    ORDER BY s.user_id, bucket_s
    """,
)
def gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling with last-observation-carried-forward —
    the hypertable `locf(time_bucket(...))` shape: build a dense
    per-key minute spine (sequence + explode, no shuffle), left-join
    the per-minute last observation (max_by over (ts, event_id) keeps
    the pick deterministic), and forward-fill nulls with an
    ignore-nulls running last_value. Everything partitions by
    user_id: the spine explode, the join, and the fill window are one
    co-partitioned lineage, so at 100 TB the only exchange is the
    initial hash on user_id; the spine itself is generated, never
    scanned. Fixed 6-hour window keeps the demo bounded; v_raw stays
    null on empty minutes, v_filled carries the last seen value."""
    all_e = _events(spark, sf_dir).filter(F.col("user_id") < 5)
    e = all_e.filter(epoch_s("ts") < 1704067200 + 21600)
    users = all_e.select("user_id").distinct()
    spine = users.select(
        "user_id", F.explode(F.expr("sequence(0, 359)")).alias("m")
    )
    mv = (
        e.select(
            "user_id",
            (F.floor(epoch_s("ts") / 60) * 60).alias("bucket_s"),
            "value",
            F.concat(
                F.lpad(
                    epoch_us(F.col("ts")).cast("string"),
                    20,
                    "0",
                ),
                F.lpad(F.col("event_id").cast("string"), 12, "0"),
            ).alias("ord"),
        )
        .groupBy("user_id", "bucket_s")
        .agg(F.expr("max_by(value, ord)").alias("v"))
    )
    joined = spine.withColumn(
        "bucket_s", (F.lit(1704067200) + F.col("m") * 60).cast("long")
    ).join(mv, ["user_id", "bucket_s"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("m")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        "bucket_s",
        F.col("v").alias("v_raw"),
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
    ).orderBy("user_id", "bucket_s")


@query(
    "interpolate_linear",
    oracle="""
    WITH users AS (SELECT DISTINCT user_id FROM events WHERE user_id < 5),
    spine AS (
      SELECT user_id, unnest(generate_series(0, 359)) AS m FROM users
    ),
    mv AS (
      SELECT user_id,
             CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 60) AS BIGINT)
               - 28401120 AS m,
             arg_max(value,
                     lpad(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS VARCHAR), 20, '0')
                     || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS v
      FROM events
      WHERE user_id < 5
        AND epoch(CAST(ts AS TIMESTAMP)) < 1704067200 + 21600
      GROUP BY 1, 2
    ),
    j AS (
      SELECT s.user_id, s.m, mv.v,
             last_value(mv.v IGNORE NULLS) OVER w_prev AS pv,
             last_value(CASE WHEN mv.v IS NOT NULL THEN s.m END IGNORE NULLS)
               OVER w_prev AS pm,
             first_value(mv.v IGNORE NULLS) OVER w_next AS nv,
             first_value(CASE WHEN mv.v IS NOT NULL THEN s.m END IGNORE NULLS)
               OVER w_next AS nm
      FROM spine s LEFT JOIN mv USING (user_id, m)
      WINDOW
        w_prev AS (PARTITION BY s.user_id ORDER BY s.m
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY s.user_id ORDER BY s.m
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id,
           CAST(1704067200 + m * 60 AS BIGINT) AS bucket_s,
           CAST(ROUND((CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL
               THEN pv + (nv - pv) * (m - pm) / (nm - pm)
             WHEN pv IS NOT NULL THEN pv
             ELSE nv
           END) * 1000000) AS BIGINT) AS v_interp_e6
    FROM j
    ORDER BY user_id, bucket_s
    """,
)
def interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over the dense minute spine — the
    hypertable `interpolate()` twin of gap_fill_locf: empty minutes
    take the line between the previous and next observations
    (LOCF past the last one, backfill before the first). Same
    single-exchange shape as gap_fill_locf — the spine explode, join
    and BOTH fill windows (running-prev and running-next) share the
    one hash partitioning on user_id; the reverse-direction window
    is a sort within the same partition, not a second shuffle.
    28401120 = 1704067200/60 (minute index of the window start).
    Output is a scaled BIGINT (``v_interp_e6`` = value x 10^6):
    decimal-from-double hashes differently under the driver's typed
    canonicalization even when values are EXACT (r3 hash-fail cause)."""
    all_e = _events(spark, sf_dir).filter(F.col("user_id") < 5)
    e = all_e.filter(epoch_s("ts") < 1704067200 + 21600)
    users = all_e.select("user_id").distinct()
    spine = users.select(
        "user_id", F.explode(F.expr("sequence(0, 359)")).alias("m")
    )
    mv = (
        e.select(
            "user_id",
            (F.floor(epoch_s("ts") / 60) - 28401120).alias("m"),
            "value",
            F.concat(
                F.lpad(
                    epoch_us(F.col("ts")).cast("string"),
                    20,
                    "0",
                ),
                F.lpad(F.col("event_id").cast("string"), 12, "0"),
            ).alias("ord"),
        )
        .groupBy("user_id", "m")
        .agg(F.expr("max_by(value, ord)").alias("v"))
    )
    j = spine.join(mv, ["user_id", "m"], "left")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("m")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("m")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_m = F.when(F.col("v").isNotNull(), F.col("m"))
    j = (
        j.withColumn("pv", F.last("v", ignorenulls=True).over(w_prev))
        .withColumn("pm", F.last(obs_m, ignorenulls=True).over(w_prev))
        .withColumn("nv", F.first("v", ignorenulls=True).over(w_next))
        .withColumn("nm", F.first(obs_m, ignorenulls=True).over(w_next))
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("m") - F.col("pm"))
            / (F.col("nm") - F.col("pm")),
        )
        .when(F.col("pv").isNotNull(), F.col("pv"))
        .otherwise(F.col("nv"))
    )
    return j.select(
        "user_id",
        (F.lit(1704067200) + F.col("m") * 60).cast("long").alias("bucket_s"),
        F.round(interp * F.lit(1000000.0)).cast("bigint").alias("v_interp_e6"),
    ).orderBy("user_id", "bucket_s")


@query(
    "cms_heavy_hitters",
    oracle="""
    WITH probes AS (
      SELECT e.user_id, d.d,
             CAST('0x' || substring(md5(CAST(e.user_id AS VARCHAR)
                                        || '|' || CAST(d.d AS VARCHAR)),
                                    1, 8) AS BIGINT) % 1024 AS w
      FROM events e CROSS JOIN generate_series(0, 3) d(d)
    ),
    grid AS (
      SELECT d, w, COUNT(*) AS cnt FROM probes GROUP BY d, w
    ),
    keyprobes AS (
      SELECT DISTINCT user_id, d, w FROM probes
    ),
    est AS (
      SELECT k.user_id, MIN(g.cnt) AS est
      FROM keyprobes k JOIN grid g ON k.d = g.d AND k.w = g.w
      GROUP BY k.user_id
    )
    SELECT user_id, est FROM est
    ORDER BY est DESC, user_id
    LIMIT 20
    """,
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate heavy hitters via count-min sketch: sketch the
    user_id stream into a 4x1024 counter grid (shuffle bounded by the
    GRID size, not the event count), then point-estimate every
    distinct user against the broadcast grid and keep the top 20.

    Runs in ``portable`` hash mode (md5-derived 32-bit probe columns),
    so the previously rows-only query is fully ORACLE-BACKED: the SQL
    replays probe placement, the counter grid, and the min-over-depth
    estimate bit-for-bit. tests/test_sketches.py additionally pins the
    overestimate guarantee, the eps*N error bound, and counter-grid
    mergeability on fixtures. At 100 TB the shape is unchanged: the
    shuffle after the probe explode is bounded by the 4x1024 GRID, not
    the event count, and the grid broadcasts to the estimate join."""
    from local_stream_stack_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    e = _events(spark, sf_dir)
    sketch = cms_build(e, "user_id", depth=4, width=1024, portable=True)
    users = e.select("user_id").distinct()
    return (
        cms_estimate(
            sketch, users, "user_id", depth=4, width=1024, portable=True
        )
        .orderBy(F.desc("est"), F.asc("user_id"))
        .limit(20)
    )


@query(
    "time_weighted_avg",
    oracle="""
    WITH ord AS (
      SELECT user_id,
             CAST(value AS DECIMAL(24,6)) AS v,
             epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
             lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
             ) AS t_next
      FROM events
    ),
    seg AS (
      SELECT user_id, v, CAST(t_next - t_us AS DECIMAL(14,0)) AS dt
      FROM ord WHERE t_next IS NOT NULL
    )
    SELECT user_id,
           CAST(SUM(dt) AS BIGINT) AS span_us,
           CAST(ROUND(CAST(SUM(v * dt) AS DOUBLE)
                      / CAST(SUM(dt) AS DOUBLE) * 1000000) AS BIGINT)
             AS twa_e6
    FROM seg
    GROUP BY user_id
    HAVING SUM(dt) > 0
    ORDER BY user_id
    """,
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per user — the hypertable/metrics rollup
    primitive for irregular samples: each observation holds its value
    until the NEXT one (LOCF segments), and the mean weights each
    segment by its duration, so burst-sampled intervals don't dominate.

    One shuffle on user_id: the lead() window and the aggregate share
    the hash partitioning. Exactness discipline: value becomes a
    fixed-scale DECIMAL and the segment duration an integer, so
    SUM(v * dt) is an exact decimal on both engines — accumulation-
    order-independent — and the output is a single double division
    emitted as a scaled BIGINT (``twa_e6``)."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("t_us"), F.col("event_id")
    )
    seg = (
        e.select(
            "user_id",
            F.col("value").cast("decimal(24,6)").alias("v"),
            epoch_us("ts").alias("t_us"),
            "event_id",
        )
        .withColumn("t_next", F.lead("t_us").over(w))
        .filter(F.col("t_next").isNotNull())
        .select(
            "user_id",
            "v",
            (F.col("t_next") - F.col("t_us")).cast("decimal(14,0)").alias("dt"),
        )
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.sum("dt").cast("bigint").alias("span_us"),
            F.round(
                F.sum(F.col("v") * F.col("dt")).cast("double")
                / F.sum("dt").cast("double")
                * F.lit(1000000.0)
            )
            .cast("bigint")
            .alias("twa_e6"),
        )
        .filter(F.col("span_us") > 0)
        .orderBy("user_id")
    )


@query(
    "event_gap_quantiles_chunked",
    oracle="""
    WITH ord AS (
      SELECT user_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP))
               - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
                 ) AS gap_us
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_gaps,
           CAST(ROUND(median(gap_us)) AS BIGINT) AS p50_us,
           CAST(ROUND(quantile_cont(gap_us, 0.95)) AS BIGINT) AS p95_us
    FROM ord
    WHERE gap_us IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def event_gap_quantiles_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKEW-ROBUST twin of ``event_gap_quantiles`` — identical gaps
    (the oracle IS the plain per-key-lag SQL) computed via
    ``lag_gaps_chunked``: lag within (user, 6-hour chunk), chunk-first
    events filled from the previous non-empty chunk's last timestamp
    on calendar-bounded summaries. Measured motivation in SCALE.md:
    the plain per-key lag window degraded 1.65x under a 90% hot key,
    and a window partition cannot split; this form bounds task input
    by events-per-chunk."""
    from local_stream_stack_spark.operators.events import lag_gaps_chunked
    from local_stream_stack_spark.operators.quantiles import (
        exact_quantiles,
    )

    e = _events(spark, sf_dir)
    gaps = (
        lag_gaps_chunked(
            e.select(
                "user_id",
                "event_type",
                "event_id",
                epoch_us("ts").alias("t_us"),
            ),
            key="user_id",
            ts_us="t_us",
            order_tiebreak="event_id",
        )
        .filter(F.col("gap_us").isNotNull())
        .select("event_type", F.col("gap_us").cast("double").alias("gap_us"))
        # chunked-lag stage (chunk shuffle + boundary fix-up) feeds the
        # count agg AND the 3-pass quantile operator — pin once instead
        # of 4 re-executions (guide §5)
        .localCheckpoint(eager=True)
    )
    counts = gaps.groupBy("event_type").agg(F.count("*").alias("n_gaps"))
    q = exact_quantiles(
        gaps, "gap_us", [0.5, 0.95], ["event_type"], out_cols=["__p50", "__p95"]
    )
    return (
        counts.join(F.broadcast(q), "event_type")
        .select(
            "event_type",
            "n_gaps",
            F.round("__p50").cast("bigint").alias("p50_us"),
            F.round("__p95").cast("bigint").alias("p95_us"),
        )
        .orderBy("event_type")
    )


@query(
    "event_gap_quantiles",
    oracle="""
    WITH ord AS (
      SELECT user_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP))
               - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
                 ) AS gap_us
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_gaps,
           CAST(ROUND(median(gap_us)) AS BIGINT) AS p50_us,
           CAST(ROUND(quantile_cont(gap_us, 0.95)) AS BIGINT) AS p95_us
    FROM ord
    WHERE gap_us IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def event_gap_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap distribution (p50/p95 per event type of the
    LATER event) — the heartbeat/SLA monitor for event streams: a
    rising p95 gap is the first sign of a stalling producer.

    Composition of the per-user lag() window (one shuffle on user_id)
    with the distributed 3-pass exact-quantile operator on the derived
    gap column (gaps are ~continuous in microseconds, so the bin-
    refinement form applies, not the value histogram). Gap durations
    are exact integers; only the interpolated quantile is rounded,
    to a whole microsecond emitted as BIGINT."""
    from local_stream_stack_spark.operators.quantiles import (
        exact_quantiles,
    )

    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("t_us"), F.col("event_id")
    )
    gaps = (
        e.select(
            "user_id",
            "event_type",
            "event_id",
            epoch_us("ts").alias("t_us"),
        )
        .withColumn("gap_us", F.col("t_us") - F.lag("t_us").over(w))
        .filter(F.col("gap_us").isNotNull())
        .select("event_type", F.col("gap_us").cast("double").alias("gap_us"))
        # the per-user lag window (shuffle + sort) feeds the count agg
        # AND the 3-pass quantile operator — pin the 2-column gap
        # relation once instead of 4 window re-executions (guide §5)
        .localCheckpoint(eager=True)
    )
    counts = gaps.groupBy("event_type").agg(F.count("*").alias("n_gaps"))
    q = exact_quantiles(
        gaps, "gap_us", [0.5, 0.95], ["event_type"], out_cols=["__p50", "__p95"]
    )
    return (
        counts.join(F.broadcast(q), "event_type")
        .select(
            "event_type",
            "n_gaps",
            F.round("__p50").cast("bigint").alias("p50_us"),
            F.round("__p95").cast("bigint").alias("p95_us"),
        )
        .orderBy("event_type")
    )


# EWMA weight tables: computed ONCE in Python and injected as literals
# into BOTH engines (repr round-trips doubles exactly), so neither
# engine ever calls pow() — Math.pow and std::pow are not both
# correctly rounded and could diverge in the last ulp.
_EWMA_K = 20
_EWMA_POWERS = [1.0, 0.7, 0.48999999999999994, 0.3429999999999999, 0.24009999999999995, 0.16806999999999994, 0.11764899999999996, 0.08235429999999996, 0.05764800999999997, 0.04035360699999998, 0.028247524899999984, 0.019773267429999988, 0.01384128720099999, 0.009688901040699992, 0.006782230728489994, 0.004747561509942996, 0.0033232930569600965, 0.0023263051398720674, 0.001628413597910447, 0.001139889518537313]
_EWMA_CUMW = [1.0, 1.7, 2.19, 2.533, 2.7731, 2.9411699999999996, 3.0588189999999997, 3.1411732999999997, 3.1988213099999996, 3.2391749169999997, 3.2674224418999995, 3.2871957093299997, 3.301036996531, 3.3107258975716998, 3.3175081283001897, 3.3222556898101328, 3.3255789828670927, 3.327905288006965, 3.329533701604875, 3.3306735911234124]


@query(
    "ewma_latest_per_user",
    oracle="""
    WITH ord AS (
      SELECT user_id, value AS v,
             epoch_us(CAST(ts AS TIMESTAMP)) AS t_us, event_id
      FROM events
    ),
    fr AS (
      SELECT user_id,
             list(v) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
               AS vs,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY t_us DESC, event_id DESC) AS rn
      FROM ord
    )
    SELECT user_id,
           CAST(len(vs) AS BIGINT) AS n_obs,
           CAST(ROUND(
             list_reduce(
               list_transform(
                 list_zip(vs, list_reverse(([1.0::DOUBLE, 0.7::DOUBLE, 0.48999999999999994::DOUBLE, 0.3429999999999999::DOUBLE, 0.24009999999999995::DOUBLE, 0.16806999999999994::DOUBLE, 0.11764899999999996::DOUBLE, 0.08235429999999996::DOUBLE, 0.05764800999999997::DOUBLE, 0.04035360699999998::DOUBLE, 0.028247524899999984::DOUBLE, 0.019773267429999988::DOUBLE, 0.01384128720099999::DOUBLE, 0.009688901040699992::DOUBLE, 0.006782230728489994::DOUBLE, 0.004747561509942996::DOUBLE, 0.0033232930569600965::DOUBLE, 0.0023263051398720674::DOUBLE, 0.001628413597910447::DOUBLE, 0.001139889518537313::DOUBLE])[1:len(vs)])),
                 x -> x[1] * x[2]),
               (a, b) -> a + b)
             / ([1.0::DOUBLE, 1.7::DOUBLE, 2.19::DOUBLE, 2.533::DOUBLE, 2.7731::DOUBLE, 2.9411699999999996::DOUBLE, 3.0588189999999997::DOUBLE, 3.1411732999999997::DOUBLE, 3.1988213099999996::DOUBLE, 3.2391749169999997::DOUBLE, 3.2674224418999995::DOUBLE, 3.2871957093299997::DOUBLE, 3.301036996531::DOUBLE, 3.3107258975716998::DOUBLE, 3.3175081283001897::DOUBLE, 3.3222556898101328::DOUBLE, 3.3255789828670927::DOUBLE, 3.327905288006965::DOUBLE, 3.329533701604875::DOUBLE, 3.3306735911234124::DOUBLE])[len(vs)] * 1000000) AS BIGINT) AS ewma_e6
    FROM fr
    WHERE rn = 1
    ORDER BY user_id
    """,
)
def ewma_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha=0.3) of each
    user's value at their LATEST event, over a bounded 20-observation
    frame — the smoothed-metric primitive (EWMA anomaly baselines,
    learning-curve smoothing).

    The textbook recursive EWMA is order-unbounded state; the bounded
    adjusted form (weights renormalized over the frame actually
    present) is what a distributed engine should run: collect_list
    over a ROWS frame is at most K=20 values per row, the weighted
    fold is a JVM-side array HOF (zip_with + aggregate — no Python),
    and one hash partitioning on user_id serves both windows.
    Determinism: the weight and cumulative-weight tables are Python-
    computed double literals shared by both engines (no pow() calls),
    folds run left-to-right on both, and the output is a scaled
    BIGINT."""
    e = _events(spark, sf_dir)
    pow_lit = F.array(*[F.lit(p) for p in _EWMA_POWERS])
    cum_lit = F.array(*[F.lit(c) for c in _EWMA_CUMW])
    w_frame = Window.partitionBy("user_id").orderBy(
        "t_us", "event_id"
    ).rowsBetween(-(_EWMA_K - 1), 0)
    w_last = Window.partitionBy("user_id").orderBy(
        F.desc("t_us"), F.desc("event_id")
    )
    base = e.select(
        "user_id",
        F.col("value").alias("v"),
        epoch_us("ts").alias("t_us"),
        "event_id",
    )
    fr = base.select(
        "user_id",
        F.collect_list("v").over(w_frame).alias("vs"),
        F.row_number().over(w_last).alias("rn"),
    ).filter(F.col("rn") == 1)
    n = F.size("vs")
    weights = F.reverse(F.slice(pow_lit, F.lit(1), n))
    num = F.aggregate(
        F.zip_with(F.col("vs"), weights, lambda v, w: v * w),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    den = F.element_at(cum_lit, n)
    return fr.select(
        "user_id",
        n.cast("bigint").alias("n_obs"),
        F.round(num / den * F.lit(1000000.0)).cast("bigint").alias("ewma_e6"),
    ).orderBy("user_id")


@query(
    "kmv_distinct_rollup",
    oracle="""
    WITH h AS (
      SELECT DISTINCT event_type,
             CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8)
                  AS BIGINT) + 1 AS h
      FROM events
    ),
    kept AS (
      SELECT event_type, h FROM (
        SELECT event_type, h,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY h) AS rn
        FROM h) t
      WHERE rn <= 64
    ),
    per AS (
      SELECT event_type AS scope, COUNT(*) AS k_used, MAX(h) AS kth_hash
      FROM kept GROUP BY event_type
    ),
    mk AS (
      SELECT h FROM (SELECT DISTINCT h FROM kept) t ORDER BY h LIMIT 64
    ),
    mall AS (
      SELECT 'ALL' AS scope, COUNT(*) AS k_used, MAX(h) AS kth_hash
      FROM mk
    ),
    u AS (SELECT * FROM per UNION ALL SELECT * FROM mall)
    SELECT scope,
           CAST(k_used AS INT) AS k_used,
           CAST(kth_hash AS BIGINT) AS kth_hash,
           CAST(CASE WHEN k_used < 64 THEN k_used
                     ELSE CAST(ROUND(270582939648.0 / kth_hash) AS BIGINT)
                END AS BIGINT) AS est_distinct
    FROM u
    ORDER BY scope
    """,
)
def kmv_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches with a PORTABLE estimator —
    the oracle-backed member of the cardinality-sketch family
    (``approx_distinct_parts``/``hll_sketch_rollup`` pin Spark's own
    HLL, whose registers are engine-specific and rows-only by nature).

    K-minimum-values (k=64): per event_type keep the 64 smallest
    md5-derived 32-bit hashes of the key (WindowGroupLimit bounded —
    O(k) state per group at any scale), estimate distinct count as
    (k-1)*2^32/h_(k) (exact count when fewer than k survive), and roll
    every per-type sketch up into ONE global sketch by re-taking the k
    smallest of the union (distributed top-k) — sketch(A ∪ B) exactly,
    without rescanning raw data. 270582939648 = 63 * 2^32.
    tests/test_sketches.py pins the error bound and the exact
    merge-identity (merged sketch == sketch of the union)."""
    from local_stream_stack_spark.operators.sketches import (
        kmv_estimate_cols,
        kmv_merge,
        kmv_sketch,
    )

    e = _events(spark, sf_dir)
    kept = kmv_sketch(e, "event_id", ["event_type"], k=64)
    cols = kmv_estimate_cols(64)
    per = kept.groupBy(
        F.col("event_type").alias("scope")
    ).agg(*cols)
    merged = kmv_merge(kept, k=64).agg(*cols).select(
        F.lit("ALL").alias("scope"), "k_used", "kth_hash", "est_distinct"
    )
    return per.unionByName(merged).orderBy("scope")


@query(
    "kmv_overlap_daily",
    oracle="""
    WITH h AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d,
             CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8)
                  AS BIGINT) + 1 AS h
      FROM events
    ),
    kept AS (
      SELECT d, h FROM (
        SELECT d, h,
               ROW_NUMBER() OVER (PARTITION BY d ORDER BY h) AS rn
        FROM h) t
      WHERE rn <= 64
    ),
    per AS (
      SELECT d, COUNT(*) AS k_used, MAX(h) AS kth FROM kept GROUP BY d
    ),
    est AS (
      SELECT d,
             CAST(CASE WHEN k_used < 64 THEN k_used
                       ELSE CAST(ROUND(270582939648.0 / kth) AS BIGINT)
                  END AS BIGINT) AS est_dau
      FROM per
    ),
    pair_h AS (
      SELECT d, h FROM kept
      UNION
      SELECT d - 1 AS d, h FROM kept
    ),
    pair_kept AS (
      SELECT d, h FROM (
        SELECT d, h,
               ROW_NUMBER() OVER (PARTITION BY d ORDER BY h) AS rn
        FROM pair_h) t
      WHERE rn <= 64
    ),
    pair_est AS (
      SELECT d, CAST(CASE WHEN COUNT(*) < 64 THEN COUNT(*)
                          ELSE CAST(ROUND(270582939648.0 / MAX(h)) AS BIGINT)
                     END AS BIGINT) AS est_union
      FROM pair_kept GROUP BY d
    )
    SELECT a.d AS day,
           a.est_dau,
           b.est_dau AS est_dau_next,
           u.est_union,
           GREATEST(0, a.est_dau + b.est_dau - u.est_union) AS est_overlap,
           GREATEST(0, b.est_dau
             - GREATEST(0, a.est_dau + b.est_dau - u.est_union)) AS est_new
    FROM est a
    JOIN est b ON b.d = a.d + 1
    JOIN pair_est u ON u.d = a.d
    ORDER BY day
    """,
)
def kmv_overlap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day active-user overlap estimated from KMV sketches
    alone - theta-sketch-style set arithmetic (union by re-taking the
    k smallest of two sketches; intersection by inclusion-exclusion),
    so consecutive-day retention/churn estimates never rescan raw
    events: the pair stage runs on O(days x k) sketch rows. At k=64
    the per-day sketches saturate (125-138 DAU in the harness corpus),
    exercising the (k-1)*2^32/h_(k) estimator, not the exact-mode
    shortcut. Sketch build is the same WindowGroupLimit-bounded pass
    as kmv_distinct_rollup; error bound pinned in
    tests/test_sketches.py."""
    from local_stream_stack_spark.operators.sketches import kmv_sketch

    e = _events(spark, sf_dir)
    days = e.select(
        F.to_date("ts").alias("d"), "user_id"
    )
    kept = kmv_sketch(days, "user_id", ["d"], k=64)

    def estimate(df: DataFrame, out: str) -> DataFrame:
        return df.groupBy("d").agg(
            F.when(F.count("*") < 64, F.count("*").cast("bigint"))
            .otherwise(
                F.round(F.lit(270582939648.0) / F.max("h")).cast("bigint")
            )
            .alias(out)
        )

    est = estimate(kept, "est_dau")
    pair_h = kept.unionByName(
        kept.select(F.date_sub("d", 1).alias("d"), "h")
    ).distinct()
    w = Window.partitionBy("d").orderBy("h")
    pair_kept = (
        pair_h.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 64)
        .drop("__rn")
    )
    pair_est = estimate(pair_kept, "est_union")

    a = est.alias("a")
    b = est.select(
        F.date_sub("d", 1).alias("d"), F.col("est_dau").alias("est_dau_next")
    ).alias("b")
    overlap = F.greatest(
        F.lit(0).cast("bigint"),
        F.col("est_dau") + F.col("est_dau_next") - F.col("est_union"),
    )
    return (
        a.join(b, "d")
        .join(pair_est, "d")
        .select(
            F.col("d").alias("day"),
            "est_dau",
            "est_dau_next",
            "est_union",
            overlap.alias("est_overlap"),
            F.greatest(
                F.lit(0).cast("bigint"),
                F.col("est_dau_next") - overlap,
            ).alias("est_new"),
        )
        .orderBy("day")
    )


@query(
    "session_paths_top",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS session_id
      FROM flagged
    ),
    tri AS (
      SELECT event_type
             || '>' || LEAD(event_type, 1) OVER s
             || '>' || LEAD(event_type, 2) OVER s AS path
      FROM numbered
      WINDOW s AS (PARTITION BY user_id, session_id
                   ORDER BY ts, event_id)
    )
    SELECT path, COUNT(*) AS n_sessions_path
    FROM tri WHERE path IS NOT NULL
    GROUP BY path
    ORDER BY n_sessions_path DESC, path
    LIMIT 10
    """,
)
def session_paths_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path mining: the 10 most frequent 3-step event-type
    sequences inside 30-minute-gap sessions - the product-analytics
    "what do users do next" query, composed from the same
    gaps-and-islands sessionizer as sessionize_events plus two LEADs.

    Scale shape: one user_id shuffle for both windows (the session
    window partitions by a refinement of the first, so no second
    exchange), partial-agg path counts, TakeOrderedAndProject top-10.
    String concatenation of NULL leads yields NULL (both engines), so
    sub-3-event session tails drop out without an explicit length
    check. Per-key window skew: bounded like sessionize_events; the
    chunked remedy (sessionize_chunked) applies if key history is
    unbounded."""
    from local_stream_stack_spark.operators.events import sessionize

    e = _events(spark, sf_dir)
    numbered = sessionize(
        e,
        key="user_id",
        ts="ts",
        gap="INTERVAL 30 MINUTE",
        order_tiebreak="event_id",
    )
    s = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    tri = numbered.select(
        F.concat(
            F.col("event_type"),
            F.lit(">"),
            F.lead("event_type", 1).over(s),
            F.lit(">"),
            F.lead("event_type", 2).over(s),
        ).alias("path")
    )
    return (
        tri.filter(F.col("path").isNotNull())
        .groupBy("path")
        .agg(F.count("*").alias("n_sessions_path"))
        .orderBy(F.desc("n_sessions_path"), F.asc("path"))
        .limit(10)
    )


@query(
    "attribution_last_touch",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT user_id, ts, event_id, event_type FROM events
      WHERE event_type IN ('click', 'view')
    ),
    ranked AS (
      SELECT p.event_id AS pid, p.user_id, p.value,
             t.event_type AS ttype,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY t.ts DESC, t.event_id DESC)
               AS rn
      FROM p JOIN t
        ON t.user_id = p.user_id
       AND t.ts <= p.ts
       AND t.ts >= p.ts - INTERVAL 1 HOUR
    ),
    best AS (SELECT pid, ttype FROM ranked WHERE rn = 1),
    attributed AS (
      SELECT p.event_id, p.user_id, p.value,
             COALESCE(b.ttype, 'none') AS touch_type
      FROM p LEFT JOIN best b ON b.pid = p.event_id
    )
    SELECT touch_type,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM attributed
    GROUP BY touch_type
    ORDER BY touch_type
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase credits the
    latest click/view by the same user within the preceding hour
    (ties at one timestamp break on highest event_id); purchases with
    no qualifying touch report as 'none'.

    Composed from the asof_join operator - union + last_value over
    one user_id shuffle - NOT an inequality join: the oracle's
    classic formulation explodes quadratically per user at scale,
    the as-of scan does not (the same argument as
    asof_join_tolerance, which pins the operator itself; this query
    exercises it in the shape analytics teams actually run)."""
    from local_stream_stack_spark.operators.events import asof_join

    e = _events(spark, sf_dir)
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    t = e.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        "ts",
        F.concat(
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
            F.lit(":"),
            F.col("event_type"),
        ).alias("touch_key"),
    )
    j = asof_join(
        p,
        t,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["touch_key"],
        tolerance="INTERVAL 1 HOUR",
    )
    return (
        j.select(
            "user_id",
            "value",
            F.when(
                F.col("touch_key").isNull(), F.lit("none")
            )
            .otherwise(F.substring_index("touch_key", ":", -1))
            .alias("touch_type"),
        )
        .groupBy("touch_type")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("revenue_cents"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy("touch_type")
    )


@query(
    "conversion_lag_quantiles",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT user_id, ts, event_id, event_type FROM events
      WHERE event_type IN ('click', 'view')
    ),
    ranked AS (
      SELECT p.event_id AS pid, t.event_type AS ttype,
             epoch_us(CAST(p.ts AS TIMESTAMP))
               - epoch_us(CAST(t.ts AS TIMESTAMP)) AS lag_us,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY t.ts DESC, t.event_id DESC)
               AS rn
      FROM p JOIN t
        ON t.user_id = p.user_id
       AND t.ts <= p.ts
       AND t.ts >= p.ts - INTERVAL 1 HOUR
    )
    SELECT ttype AS touch_type,
           COUNT(*) AS n_conversions,
           CAST(ROUND(quantile_cont(lag_us, 0.5)) AS BIGINT)
             AS p50_lag_us,
           CAST(ROUND(quantile_cont(lag_us, 0.9)) AS BIGINT)
             AS p90_lag_us
    FROM ranked WHERE rn = 1
    GROUP BY ttype
    ORDER BY touch_type
    """,
)
def conversion_lag_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-conversion distribution: for each purchase with a
    qualifying last touch (click/view within the preceding hour,
    attribution_last_touch semantics), the median and p90 lag from
    touch to purchase per touch type - the follow-up question every
    attribution report gets.

    Same as-of scan as attribution_last_touch (one user_id shuffle,
    no inequality join), then the exact three-pass quantile operator
    over integer microsecond lags keyed by touch type - O(types x
    bins) state, interpolated results rounded once to BIGINT."""
    from local_stream_stack_spark.operators.events import asof_join
    from local_stream_stack_spark.operators.quantiles import exact_quantiles
    from local_stream_stack_spark.utils.ts import epoch_us

    e = _events(spark, sf_dir)
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    t = e.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        "ts",
        F.concat(
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
            F.lit(":"),
            F.col("event_type"),
        ).alias("touch_key"),
    )
    j = asof_join(
        p,
        t,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["touch_key"],
        tolerance="INTERVAL 1 HOUR",
    )
    lags = (
        j.filter(F.col("touch_key").isNotNull())
        .select(
            F.substring_index("touch_key", ":", -1).alias("touch_type"),
            (epoch_us(F.col("ts")) - epoch_us(F.col("right_ts")))
            .cast("double")
            .alias("lag_us"),
        )
        # the as-of join (union + user_id shuffle + window) feeds the
        # 3-pass quantile operator AND the count aggregate — pin the
        # 2-column lag relation once instead of 4 re-executions
        # (guide §5; bounded: one narrow row per conversion)
        .localCheckpoint(eager=True)
    )
    qs = exact_quantiles(
        lags, "lag_us", [0.5, 0.9], ["touch_type"],
        out_cols=["p50", "p90"],
    )
    n = lags.groupBy("touch_type").agg(F.count("*").alias("n_conversions"))
    return (
        n.join(qs, "touch_type")
        .select(
            "touch_type",
            "n_conversions",
            F.expr("CAST(ROUND(p50) AS BIGINT)").alias("p50_lag_us"),
            F.expr("CAST(ROUND(p90) AS BIGINT)").alias("p90_lag_us"),
        )
        .orderBy("touch_type")
    )


@query(
    "daily_count_anomalies",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    stats AS (
      SELECT event_type,
             COUNT(*) AS nd,
             SUM(n) AS s1,
             SUM(n * n) AS s2
      FROM daily GROUP BY event_type
    )
    SELECT d.event_type, d.day,
           CAST(d.n AS BIGINT) AS n_events,
           CAST(ROUND(10000.0
             * (CAST(d.n AS DOUBLE) * nd - CAST(s1 AS DOUBLE))
             / NULLIF(SQRT((CAST(nd AS DOUBLE) * CAST(s2 AS DOUBLE)
                            - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                           * (CAST(nd AS DOUBLE)
                              / (CAST(nd AS DOUBLE) - 1.0))), 0.0))
             AS BIGINT) AS z_e4
    FROM daily d JOIN stats USING (event_type)
    WHERE ABS((CAST(d.n AS DOUBLE) * nd - CAST(s1 AS DOUBLE))
              / NULLIF(SQRT((CAST(nd AS DOUBLE) * CAST(s2 AS DOUBLE)
                             - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                            * (CAST(nd AS DOUBLE)
                               / (CAST(nd AS DOUBLE) - 1.0))), 0.0))
          > 2.0
    ORDER BY event_type, day
    """,
)
def daily_count_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: days whose event count sits more
    than 2 sample standard deviations from that event type's daily
    mean - the ops alert behind every ingestion monitor.

    z derives entirely from integer moment sums (count, sum, sum of
    squares per type - one partial-agg pass over day-level counts),
    so the doubles are bit-stable; the z denominator folds nd*sd
    into one sqrt so the whole score is a single division. Emitted
    as a scaled BIGINT."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("nd"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    z = F.expr(
        """(CAST(n AS DOUBLE) * nd - CAST(s1 AS DOUBLE))
           / NULLIF(SQRT((CAST(nd AS DOUBLE) * CAST(s2 AS DOUBLE)
                          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                         * (CAST(nd AS DOUBLE)
                            / (CAST(nd AS DOUBLE) - 1.0))), 0.0)"""
    )
    return (
        daily.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 2.0)
        .select(
            "event_type",
            "day",
            F.col("n").cast("bigint").alias("n_events"),
            F.round(z * 10000).cast("bigint").alias("z_e4"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "hourly_value_quantiles",
    oracle="""
    SELECT CAST(EXTRACT(HOUR FROM ts) AS INT) AS hour_of_day,
           COUNT(*) AS n_events,
           CAST(ROUND(quantile_cont(value, 0.5) * 10000) AS BIGINT)
             AS p50_value_e4,
           CAST(ROUND(quantile_cont(value, 0.9) * 10000) AS BIGINT)
             AS p90_value_e4,
           CAST(ROUND(quantile_cont(value, 0.99) * 10000) AS BIGINT)
             AS p99_value_e4
    FROM events
    GROUP BY 1
    ORDER BY hour_of_day
    """,
)
def hourly_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour-of-day value distribution (p50/p90/p99) - the SLO/
    latency-band report shape, on the exact three-pass quantile
    operator (O(hours x bins) state, no per-group value buffers)
    keyed by hour; interpolated results round once to scaled
    BIGINTs."""
    from local_stream_stack_spark.operators.quantiles import (
        exact_quantiles,
    )

    e = _events(spark, sf_dir)
    vals = e.select(
        F.hour("ts").cast("int").alias("hour_of_day"),
        F.col("value").cast("double").alias("v"),
    )
    qs = exact_quantiles(
        vals, "v", [0.5, 0.9, 0.99], ["hour_of_day"],
        out_cols=["p50", "p90", "p99"],
    )
    n = vals.groupBy("hour_of_day").agg(F.count("*").alias("n_events"))
    return (
        n.join(qs, "hour_of_day")
        .select(
            "hour_of_day",
            "n_events",
            F.expr("CAST(ROUND(p50 * 10000) AS BIGINT)").alias(
                "p50_value_e4"
            ),
            F.expr("CAST(ROUND(p90 * 10000) AS BIGINT)").alias(
                "p90_value_e4"
            ),
            F.expr("CAST(ROUND(p99 * 10000) AS BIGINT)").alias(
                "p99_value_e4"
            ),
        )
        .orderBy("hour_of_day")
    )


@query(
    "kmv_rolling_wau",
    oracle="""
    WITH h AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d,
             CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8)
                  AS BIGINT) + 1 AS h
      FROM events
    ),
    kept AS (
      SELECT d, h FROM (
        SELECT d, h,
               ROW_NUMBER() OVER (PARTITION BY d ORDER BY h) AS rn
        FROM h) t
      WHERE rn <= 64
    ),
    days AS (SELECT DISTINCT d FROM kept),
    win AS (
      SELECT days.d AS day, kept.h
      FROM days JOIN kept
        ON kept.d BETWEEN days.d - 6 AND days.d
    ),
    wkept AS (
      SELECT day, h FROM (
        SELECT day, h,
               ROW_NUMBER() OVER (PARTITION BY day ORDER BY h) AS rn
        FROM (SELECT DISTINCT day, h FROM win) u) t
      WHERE rn <= 64
    ),
    ndays AS (
      SELECT a.d AS day, COUNT(*) AS n_days_in_window
      FROM days a JOIN days b ON b.d BETWEEN a.d - 6 AND a.d
      GROUP BY a.d
    ),
    est AS (
      SELECT day,
             CAST(CASE WHEN COUNT(*) < 64 THEN COUNT(*)
                       ELSE CAST(ROUND(270582939648.0 / MAX(h)) AS BIGINT)
                  END AS BIGINT) AS est_wau
      FROM wkept GROUP BY day
    )
    SELECT est.day,
           CAST(n_days_in_window AS INT) AS n_days_in_window,
           est_wau
    FROM est JOIN ndays ON ndays.day = est.day
    ORDER BY est.day
    """,
)
def kmv_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day weekly-active-users from DAILY sketches alone -
    the canonical mergeable-sketch rollup: each day's KMV is built
    once, and every window estimate is a union of <= 7 sketch rows
    re-cut to the k smallest, so WAU/MAU-style windows never rescan
    events and the rollup costs O(days x window x k) sketch rows
    total. The same sketches feed kmv_overlap_daily; mergeability
    (union sketch == sketch of union) is pinned in
    tests/test_sketches.py."""
    from local_stream_stack_spark.operators.sketches import kmv_sketch

    e = _events(spark, sf_dir)
    days_users = e.select(F.to_date("ts").alias("d"), "user_id")
    kept = kmv_sketch(days_users, "user_id", ["d"], k=64)
    days = kept.select("d").distinct()
    win = (
        days.select(F.col("d").alias("day"))
        .join(
            kept,
            F.col("d").between(F.date_sub(F.col("day"), 6), F.col("day")),
        )
        .select("day", "h")
        .distinct()
    )
    w = Window.partitionBy("day").orderBy("h")
    wkept = (
        win.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 64)
        .drop("__rn")
    )
    ndays = (
        days.select(F.col("d").alias("day"))
        .join(
            days.select(F.col("d").alias("d2")),
            F.col("d2").between(F.date_sub(F.col("day"), 6), F.col("day")),
        )
        .groupBy("day")
        .agg(F.count("*").cast("int").alias("n_days_in_window"))
    )
    est = wkept.groupBy("day").agg(
        F.when(F.count("*") < 64, F.count("*").cast("bigint"))
        .otherwise(
            F.round(F.lit(270582939648.0) / F.max("h")).cast("bigint")
        )
        .alias("est_wau")
    )
    return (
        est.join(ndays, "day")
        .select("day", "n_days_in_window", "est_wau")
        .orderBy("day")
    )


@query(
    "value_histogram_log2",
    oracle="""
    SELECT event_type,
           CAST(CASE WHEN value <= 0 THEN -9999
                     ELSE CAST(FLOOR(LOG2(value)) AS INT) END AS INT)
             AS bucket_log2,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)))
                AS BIGINT) AS sum_cents
    FROM events
    GROUP BY 1, 2
    ORDER BY event_type, bucket_log2
    """,
)
def value_histogram_log2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two value histogram per event type - the ops
    distribution report that needs no calibration pass (bucket =
    floor(log2(v)), non-positives pinned to the -9999 sentinel,
    distinct from the legitimate -1 bucket of values in [0.5, 1)), so unlike
    equi-width/equi-depth histograms it is one scan + one partial-agg
    groupBy with no extents or quantile stage. log2 of a positive
    double is exact enough that floor is engine-stable except exactly
    at powers of two, where both engines see the same double and the
    same correctly-rounded log2."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(
            "event_type",
            F.expr(
                """CAST(CASE WHEN value <= 0 THEN -9999
                       ELSE CAST(FLOOR(LOG2(value)) AS INT) END AS INT)"""
            ).alias("bucket_log2"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.expr(
                "CAST(ROUND(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)))"
                " AS BIGINT)"
            ).alias("sum_cents"),
        )
        .orderBy("event_type", "bucket_log2")
    )


@query(
    "active_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS ed
      FROM events
      WHERE ts IS NOT NULL
    ),
    runs AS (
      SELECT user_id,
             ed - ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ed) AS grp
      FROM days
    ),
    streaks AS (
      SELECT user_id, grp, COUNT(*) AS len
      FROM runs GROUP BY user_id, grp
    ),
    per_user AS (
      SELECT user_id, MAX(len) AS longest, SUM(len) AS n_active_days
      FROM streaks GROUP BY user_id
    )
    SELECT CAST(longest AS BIGINT) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(MIN(user_id) AS BIGINT) AS sample_user,
           CAST(SUM(n_active_days) AS BIGINT) AS total_active_days
    FROM per_user
    GROUP BY longest
    ORDER BY longest_streak
    """,
)
def active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user, reported as a
    distribution (streak length -> user count) — the gaps-and-islands
    classic behind retention / engagement-streak features.

    Distinct (user, epoch-day) rows, then the island key is
    day - ROW_NUMBER() per user (consecutive days share a key); both
    windows and all three aggregates are partitioned by user_id, so
    the whole plan is per-user-local after one shuffle — no global
    window anywhere."""
    ev = _events(spark, sf_dir)
    # NULL timestamps are excluded BEFORE the window: engines disagree
    # on NULL placement in window order (Spark NULLS FIRST, DuckDB
    # NULLS LAST), so a null day must never reach the island key.
    days = ev.filter(F.col("ts").isNotNull()).select(
        "user_id",
        F.expr(
            "datediff(CAST(ts AS DATE), DATE '1970-01-01')"
        ).alias("ed"),
    ).distinct()
    runs = days.select(
        "user_id",
        "ed",
        (
            F.col("ed")
            - F.row_number().over(
                Window.partitionBy("user_id").orderBy("ed")
            )
        ).alias("grp"),
    )
    streaks = runs.groupBy("user_id", "grp").agg(
        F.count("*").alias("len")
    )
    per_user = streaks.groupBy("user_id").agg(
        F.max("len").alias("longest"),
        F.sum("len").alias("n_active_days"),
    )
    return (
        per_user.groupBy(
            F.col("longest").cast("bigint").alias("longest_streak")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.min("user_id").cast("bigint").alias("sample_user"),
            F.sum("n_active_days").cast("bigint").alias(
                "total_active_days"
            ),
        )
        .orderBy("longest_streak")
    )


@query(
    "asof_join_nearest",
    oracle="""
    WITH v1 AS (
      SELECT user_id, ts, MAX(event_id) AS view_event_id
      FROM events WHERE event_type = 'view'
      GROUP BY user_id, ts
    ),
    tagged AS (
      SELECT user_id, ts, NULL::BIGINT AS purchase_id, view_event_id,
             ts AS view_ts, 0 AS is_left
      FROM v1
      UNION ALL
      SELECT user_id, ts, event_id AS purchase_id, NULL::BIGINT,
             NULL::TIMESTAMP_NS, 1 AS is_left
      FROM events WHERE event_type = 'purchase'
    ),
    filled AS (
      SELECT user_id, ts, purchase_id, is_left,
             LAST_VALUE(view_event_id IGNORE NULLS) OVER wb AS b_id,
             LAST_VALUE(view_ts IGNORE NULLS) OVER wb AS b_ts,
             FIRST_VALUE(view_event_id IGNORE NULLS) OVER wf AS f_id,
             FIRST_VALUE(view_ts IGNORE NULLS) OVER wf AS f_ts
      FROM tagged
      WINDOW wb AS (PARTITION BY user_id
                    ORDER BY ts, is_left, purchase_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY user_id
                    ORDER BY ts, is_left, purchase_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ),
    picked AS (
      SELECT user_id, purchase_id,
             CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS p_us,
             CAST(epoch_us(CAST(b_ts AS TIMESTAMP)) AS BIGINT) AS b_us,
             CAST(epoch_us(CAST(f_ts AS TIMESTAMP)) AS BIGINT) AS f_us,
             b_id, f_id,
             CASE
               WHEN b_ts IS NULL AND f_ts IS NULL THEN NULL
               WHEN f_ts IS NULL THEN 'backward'
               WHEN b_ts IS NULL THEN 'forward'
               WHEN epoch_us(CAST(ts AS TIMESTAMP))
                    - epoch_us(CAST(b_ts AS TIMESTAMP))
                    <= epoch_us(CAST(f_ts AS TIMESTAMP))
                    - epoch_us(CAST(ts AS TIMESTAMP)) THEN 'backward'
               ELSE 'forward'
             END AS dir0
      FROM filled WHERE is_left = 1
    ),
    tol AS (
      SELECT user_id, purchase_id, p_us,
             CASE
               WHEN dir0 = 'backward' AND p_us - b_us <= 3600000000
                 THEN dir0
               WHEN dir0 = 'forward' AND f_us - p_us <= 3600000000
                 THEN dir0
             END AS direction,
             b_id, b_us, f_id, f_us
      FROM picked
    )
    SELECT purchase_id, user_id, p_us AS purchase_ts_us,
           CASE direction WHEN 'backward' THEN b_id
                          WHEN 'forward' THEN f_id END AS view_event_id,
           CASE direction WHEN 'backward' THEN b_us - p_us
                          WHEN 'forward' THEN f_us - p_us END AS gap_us,
           direction AS matched_direction
    FROM tol
    ORDER BY purchase_id
    """,
)
def asof_join_nearest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join: each 'purchase' matched to the
    CLOSEST 'view' of the same user in either time direction, within a
    1-hour tolerance (pandas merge_asof direction='nearest'; ties go
    backward). Complements asof_join_events, which is backward-only —
    the variant a feature pipeline wants when the triggering event may
    be logged slightly before or after its context event.

    Union + one sort per user: the backward candidate from
    last_value(ignore nulls) over the preceding frame, the forward one
    from first_value over the following frame of the SAME ordering —
    one shuffle, no inequality join, so the plan survives 100 TB.
    gap_us is SIGNED (negative = view before purchase)."""
    from local_stream_stack_spark.operators.events import asof_join_nearest

    e = _events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase")
    views = e.filter(F.col("event_type") == "view")
    joined = asof_join_nearest(
        left=purchases.select(
            "user_id", "ts", F.col("event_id").alias("purchase_id")
        ),
        right=views.select(
            "user_id", "ts", F.col("event_id").alias("view_event_id")
        ),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["view_event_id"],
        tolerance="INTERVAL 1 HOUR",
    )
    return joined.select(
        "purchase_id",
        "user_id",
        epoch_us("ts").alias("purchase_ts_us"),
        "view_event_id",
        (epoch_us("right_ts") - epoch_us("ts")).alias("gap_us"),
        "matched_direction",
    ).orderBy("purchase_id")


@query(
    "bootstrap_mean_ci",
    oracle="""
    WITH base AS (
      SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL AND value >= 0
    ),
    reps AS (SELECT unnest(generate_series(0, 31)) AS r),
    sampled AS (
      SELECT reps.r, base.cents
      FROM base CROSS JOIN reps
      WHERE CAST('0x' || substring(md5(CAST(reps.r AS VARCHAR) || ':'
                 || CAST(base.event_id AS VARCHAR)), 1, 4) AS BIGINT)
            % 2 = 0
    ),
    stats AS (
      SELECT r, COUNT(*) AS n, SUM(cents) AS s
      FROM sampled GROUP BY r
    ),
    ranked AS (
      SELECT r, n, s,
             ROW_NUMBER() OVER (ORDER BY CAST(s AS DOUBLE) / n, r) AS rk,
             COUNT(*) OVER () AS n_reps
      FROM stats
    ),
    full_s AS (
      SELECT COUNT(*) AS n_all, SUM(cents) AS s_all FROM base
    )
    SELECT CAST(full_s.n_all AS BIGINT) AS n_rows,
           CAST((200 * full_s.s_all + full_s.n_all)
                // CAST(2 * NULLIF(full_s.n_all, 0) AS HUGEINT)
                AS BIGINT) AS mean_e2,
           CAST(MAX(CASE WHEN rk = 2
                         THEN (200 * s + n) // (2 * n) END)
                AS BIGINT) AS ci_lo_e2,
           CAST(MAX(CASE WHEN rk = (n_reps + 1) // 2
                         THEN (200 * s + n) // (2 * n) END)
                AS BIGINT) AS boot_median_e2,
           CAST(MAX(CASE WHEN rk = n_reps - 1
                         THEN (200 * s + n) // (2 * n) END)
                AS BIGINT) AS ci_hi_e2,
           CAST(COUNT(*) AS BIGINT) AS n_replicas
    FROM ranked CROSS JOIN full_s
    GROUP BY full_s.n_all, full_s.s_all
    """,
)
def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic resampling confidence interval for the mean
    purchase value: 32 half-sized subsample replicas selected by a
    counter-based hash (md5 of replica:event_id — reproducible on any
    cluster size, no RNG state), each replica's mean ranked, and the
    2nd / median / 31st replica means reported as the CI band. The
    estimator a data pipeline runs to put error bars on a metric
    without a closed-form variance.

    Scale shape: the 32x row expansion collapses immediately into a
    32-key partial aggregate (map-side combine), so the shuffle is 32
    rows per partition regardless of corpus size. Integer-exact
    throughout: cents BIGINT sums, round-half-up (2s+n) div (2n) on
    non-negative operands; replica ordering uses the one-division
    double of exact integer sums, identical on both engines."""
    e = _events(spark, sf_dir)
    base = e.filter(
        (F.col("event_type") == "purchase")
        & F.col("value").isNotNull()
        & (F.col("value") >= 0)
    ).select(
        "event_id",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
    )
    sampled = (
        base.select(
            F.explode(F.expr("sequence(0, 31)")).alias("r"),
            "event_id",
            "cents",
        )
        .filter(
            F.expr(
                "CAST(conv(substring(md5(concat(CAST(r AS STRING), ':',"
                " CAST(event_id AS STRING))), 1, 4), 16, 10) AS BIGINT)"
                " % 2 = 0"
            )
        )
    )
    stats = sampled.groupBy("r").agg(
        F.count("*").alias("n"), F.sum("cents").alias("s")
    )
    # rank the 32 replica means distributively (with_global_rank —
    # no ordered global window, which would be one task by contract
    # even on this parameter-sized relation)
    from local_stream_stack_spark.operators.quantiles import (
        with_global_rank,
    )

    ranked = with_global_rank(
        stats.withColumn("__mean", F.expr("CAST(s AS DOUBLE) / n")),
        "__mean",
        ["r"],
        out_rank="rk",
        total_col="n_reps",
        materialize=True,  # input is a derived aggregate: avoid 3x lineage re-execution (guide §5)
    ).select(
        "r",
        "n",
        "s",
        F.col("rk").cast("int").alias("rk"),
        F.col("n_reps").cast("bigint").alias("n_reps"),
    )
    full_s = base.agg(
        F.count("*").alias("n_all"), F.sum("cents").alias("s_all")
    )
    return (
        ranked.crossJoin(F.broadcast(full_s))
        .groupBy("n_all", "s_all")
        .agg(
            F.max(
                F.when(
                    F.col("rk") == 2,
                    F.expr("(200 * s + n) div (2 * n)"),
                )
            )
            .cast("bigint")
            .alias("ci_lo_e2"),
            F.max(
                F.when(
                    F.expr("rk = (n_reps + 1) div 2"),
                    F.expr("(200 * s + n) div (2 * n)"),
                )
            )
            .cast("bigint")
            .alias("boot_median_e2"),
            F.max(
                F.when(
                    F.expr("rk = n_reps - 1"),
                    F.expr("(200 * s + n) div (2 * n)"),
                )
            )
            .cast("bigint")
            .alias("ci_hi_e2"),
            F.count("*").cast("bigint").alias("n_replicas"),
        )
        .select(
            F.col("n_all").cast("bigint").alias("n_rows"),
            F.expr(
                "CAST((200 * s_all + n_all) div (2 * NULLIF(n_all, 0))"
                " AS BIGINT)"
            ).alias("mean_e2"),
            "ci_lo_e2",
            "boot_median_e2",
            "ci_hi_e2",
            "n_replicas",
        )
    )


@query(
    "autocorr_daily_counts",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS x
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    tot AS (
      SELECT COUNT(*) AS n, SUM(x) AS s, SUM(x * x) AS q FROM daily
    ),
    lags AS (SELECT unnest([1, 2, 3, 4, 5, 6, 7]) AS k),
    pairs AS (
      SELECT lags.k,
             COUNT(*) AS c,
             SUM(a.x * b.x) AS axy,
             SUM(a.x) AS sh,
             SUM(b.x) AS st
      FROM daily a
      CROSS JOIN lags
      JOIN daily b ON b.day = a.day - lags.k
      GROUP BY lags.k
    )
    SELECT CAST(p.k AS INT) AS lag,
           CAST(p.c AS BIGINT) AS n_pairs,
           CAST(t.n * t.n * p.axy - t.n * t.s * p.sh
                - t.n * t.s * p.st + p.c * t.s * t.s
                AS BIGINT) AS acf_num,
           CAST(t.n * t.n * t.q - t.n * t.s * t.s
                AS BIGINT) AS acf_den,
           CAST(t.n * t.n * p.axy - t.n * t.s * p.sh
                - t.n * t.s * p.st + p.c * t.s * t.s AS DOUBLE)
             / NULLIF(CAST(t.n * t.n * t.q - t.n * t.s * t.s
                           AS DOUBLE), 0.0) AS acf
    FROM pairs p CROSS JOIN tot t
    ORDER BY lag
    """,
)
def autocorr_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily event-count series at calendar
    lags 1-7 — the seasonality probe (a weekly cycle shows as a spike
    at lag 7) run before fitting any forecast or anomaly model.

    The estimator is computed EXACTLY from integer moment sums: with
    n days, S = sum(x), Q = sum(x^2), the mean-centered products scale
    by n^2 into pure BIGINT arithmetic — acf_num/acf_den are exact
    integers and acf is their single double division, so summation
    order cannot perturb any of it. Calendar-lag pairs come from an
    equi-join on (day - k), which handles missing days honestly
    (absent days pair with nothing, the estimator sees only observed
    pairs). One groupBy to the day grain (bounded by the calendar, not
    the corpus), then everything is parameter-sized."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("x")
    )
    tot = daily.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
    )
    lags = spark.createDataFrame([(k,) for k in range(1, 8)], "k int")
    a = daily.select(F.col("day").alias("a_day"), F.col("x").alias("a_x"))
    b = daily.select(F.col("day").alias("b_day"), F.col("x").alias("b_x"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.expr("b_day = date_sub(a_day, k)"))
        .groupBy("k")
        .agg(
            F.count("*").alias("c"),
            F.sum(F.col("a_x") * F.col("b_x")).alias("axy"),
            F.sum("a_x").alias("sh"),
            F.sum("b_x").alias("st"),
        )
    )
    return (
        pairs.crossJoin(F.broadcast(tot))
        .select(
            F.col("k").cast("int").alias("lag"),
            F.col("c").cast("bigint").alias("n_pairs"),
            F.expr(
                "CAST(n * n * axy - n * s * sh - n * s * st + c * s * s"
                " AS BIGINT)"
            ).alias("acf_num"),
            F.expr("CAST(n * n * q - n * s * s AS BIGINT)").alias(
                "acf_den"
            ),
            F.expr(
                "CAST(n * n * axy - n * s * sh - n * s * st + c * s * s"
                " AS DOUBLE)"
                " / NULLIF(CAST(n * n * q - n * s * s AS DOUBLE), 0.0)"
            ).alias("acf"),
        )
        .orderBy("lag")
    )


@query(
    "user_adoption_curve",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d0
      FROM events GROUP BY user_id
    ),
    newbies AS (
      SELECT d0 AS day, COUNT(*) AS n_new FROM first_seen GROUP BY d0
    ),
    tot AS (SELECT COUNT(*) AS n_users FROM first_seen)
    SELECT day,
           CAST(n_new AS BIGINT) AS n_new_users,
           CAST(SUM(n_new) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_users,
           CAST(SUM(n_new) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                * 1000000 // tot.n_users AS BIGINT) AS cum_share_e6
    FROM newbies CROSS JOIN tot
    ORDER BY day
    """,
)
def user_adoption_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-adoption curve: running count of DISTINCT users ever
    seen, by day. A naive running count-distinct needs unbounded state;
    collapsing each user to their FIRST day (one groupBy) makes the
    curve an ordinary cumulative sum over per-day new-user counts —
    the standard trick that turns an O(users) window into an
    O(calendar-days) one.

    One shuffle on user_id, then the cumulative sum over the day
    grain via the distributed-rank operator's running sum (never an
    ordered global window — one task even over a calendar-bounded
    relation). cum_share_e6 is a truncating division on non-negative
    counts."""
    from local_stream_stack_spark.operators.quantiles import (
        with_global_rank,
    )

    e = _events(spark, sf_dir)
    first_seen = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0")
    )
    newbies = first_seen.groupBy(F.col("d0").alias("day")).agg(
        F.count("*").alias("n_new")
    )
    tot = first_seen.agg(F.count("*").alias("n_users"))
    cum = with_global_rank(
        newbies,
        "day",
        out_rank="__rn",
        cumsum={"n_new": "__cum"},
        acc_type="BIGINT",
        materialize=True,  # input is a derived aggregate: avoid 3x lineage re-execution (guide §5)
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "day",
            F.col("n_new").cast("bigint").alias("n_new_users"),
            F.col("__cum").cast("bigint").alias("cum_users"),
            F.expr(
                "CAST(__cum * 1000000 div n_users AS BIGINT)"
            ).alias("cum_share_e6"),
        )
        .orderBy("day")
    )


@query(
    "seasonal_naive_backtest",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    scored AS (
      SELECT a.event_type,
             a.n AS actual,
             f.n AS forecast,
             ABS(a.n - f.n) AS abs_err
      FROM daily a
      JOIN daily f
        ON f.event_type = a.event_type AND f.day = a.day - 7
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days_scored,
           CAST(SUM(actual) AS BIGINT) AS total_actual,
           CAST(SUM(abs_err) AS BIGINT) AS total_abs_err,
           CAST((2 * SUM(abs_err) + COUNT(*)) // (2 * COUNT(*))
                AS BIGINT) AS mae_rounded,
           CAST(CAST(SUM(abs_err) AS HUGEINT) * 1000000
                // NULLIF(CAST(SUM(actual + forecast) AS HUGEINT), 0)
                AS BIGINT) AS smape_half_e6
    FROM scored
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the seasonal-naive forecaster (predict today =
    same weekday last week) on daily event counts, per event type —
    the baseline every volume-forecasting model must beat, and the
    ops sanity check that weekly seasonality actually holds.

    Self-join of the day-grain count table on (event_type, day-7) —
    the table is bounded by |types| x calendar days, so the join is
    parameter-sized at any corpus scale; only the one groupBy to the
    day grain touches the data. Integer-exact: MAE uses the
    round-half-up (2s+c) div (2c) idiom, sMAPE/2 is a
    DECIMAL/HUGEINT floor division of non-negative integer sums
    (micro-averaged, so summation order is irrelevant)."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("n"))
    a = daily.select(
        "event_type", "day", F.col("n").alias("actual")
    )
    f = daily.select(
        F.col("event_type").alias("f_type"),
        F.col("day").alias("f_day"),
        F.col("n").alias("forecast"),
    )
    scored = a.join(
        f,
        (F.col("f_type") == F.col("event_type"))
        & (F.col("f_day") == F.expr("date_sub(day, 7)")),
    ).select(
        "event_type",
        "actual",
        "forecast",
        F.abs(F.col("actual") - F.col("forecast")).alias("abs_err"),
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_days_scored"),
            F.sum("actual").cast("bigint").alias("total_actual"),
            F.sum("abs_err").cast("bigint").alias("total_abs_err"),
            F.expr(
                "CAST((2 * SUM(abs_err) + COUNT(*)) div (2 * COUNT(*))"
                " AS BIGINT)"
            ).alias("mae_rounded"),
            F.expr(
                "CAST(CAST(SUM(abs_err) AS DECIMAL(38,0)) * 1000000"
                " div NULLIF(SUM(actual + forecast), 0) AS BIGINT)"
            ).alias("smape_half_e6"),
        )
        .orderBy("event_type")
    )


@query(
    "markov_next_event_accuracy",
    oracle="""
    WITH seq AS (
      SELECT event_id, user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    trans AS (
      SELECT event_id, event_type AS cur, next_type AS nxt,
             CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)),
                  1, 4) AS BIGINT) % 5 AS fold
      FROM seq WHERE next_type IS NOT NULL
    ),
    counts AS (
      SELECT cur, nxt, COUNT(*) AS n
      FROM trans WHERE fold <> 0
      GROUP BY cur, nxt
    ),
    pred AS (
      SELECT cur, nxt AS predicted_next
      FROM (
        SELECT cur, nxt,
               ROW_NUMBER() OVER (PARTITION BY cur
                                  ORDER BY n DESC, nxt) AS rk
        FROM counts
      ) WHERE rk = 1
    )
    SELECT t.cur AS event_type,
           CAST((SELECT COUNT(*) FROM trans x
                 WHERE x.fold <> 0 AND x.cur = t.cur) AS BIGINT)
             AS n_train,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           MAX(p.predicted_next) AS predicted_next,
           CAST(CAST(SUM(CASE WHEN t.nxt = p.predicted_next
                              THEN 1 ELSE 0 END) AS HUGEINT) * 1000000
                // COUNT(*) AS BIGINT) AS hit_rate_e6
    FROM trans t
    JOIN pred p ON p.cur = t.cur
    WHERE t.fold = 0
    GROUP BY t.cur
    ORDER BY event_type
    """,
)
def markov_next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the first-order Markov next-event predictor: train
    the argmax transition table on a deterministic 80% hash split of
    the transition stream, score top-1 accuracy on the held-out 20% —
    the eval that turns event_transition_matrix from a description
    into a validated model (is the next event actually predictable?).

    Transitions come from one lead() window per user (ts, event_id
    ordering — deterministic under duplicate timestamps); the fold is
    md5(event_id) % 5, reproducible on any cluster. The trained table
    and the argmax pick are |types|^2-bounded; the test join
    broadcasts it. hit_rate_e6 is a floor division of non-negative
    counts."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    )
    trans = seq.filter(F.col("next_type").isNotNull()).select(
        F.col("event_type").alias("cur"),
        F.col("next_type").alias("nxt"),
        (
            F.conv(
                F.substring(F.md5(F.col("event_id").cast("string")), 1, 4),
                16,
                10,
            ).cast("bigint")
            % 5
        ).alias("fold"),
    )
    counts = (
        trans.filter(F.col("fold") != 0)
        .groupBy("cur", "nxt")
        .agg(F.count("*").alias("n"))
    )
    rk = Window.partitionBy("cur").orderBy(F.desc("n"), F.asc("nxt"))
    pred = (
        counts.select(
            "cur", "nxt", F.row_number().over(rk).alias("rk")
        )
        .filter(F.col("rk") == 1)
        .select("cur", F.col("nxt").alias("predicted_next"))
    )
    n_train = (
        trans.filter(F.col("fold") != 0)
        .groupBy("cur")
        .agg(F.count("*").alias("n_train"))
    )
    return (
        trans.filter(F.col("fold") == 0)
        .join(F.broadcast(pred), "cur")
        .join(F.broadcast(n_train), "cur")
        .groupBy(F.col("cur").alias("event_type"), "n_train")
        .agg(
            F.count("*").cast("bigint").alias("n_test"),
            F.max("predicted_next").alias("predicted_next"),
            F.expr(
                "CAST(CAST(SUM(CASE WHEN nxt = predicted_next"
                " THEN 1 ELSE 0 END) AS DECIMAL(38,0)) * 1000000"
                " div COUNT(*) AS BIGINT)"
            ).alias("hit_rate_e6"),
        )
        .select(
            "event_type",
            F.col("n_train").cast("bigint").alias("n_train"),
            "n_test",
            "predicted_next",
            "hit_rate_e6",
        )
        .orderBy("event_type")
    )


@query(
    "bounce_rate_by_entry",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS session_id
      FROM flagged
    ),
    positioned AS (
      SELECT user_id, event_type, session_id,
             ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                                ORDER BY ts, event_id) AS pos
      FROM numbered
    ),
    sessions AS (
      SELECT user_id, session_id,
             MAX(CASE WHEN pos = 1 THEN event_type END) AS entry_type,
             COUNT(*) AS depth
      FROM positioned GROUP BY user_id, session_id
    )
    SELECT entry_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN depth = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           CAST(SUM(depth) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN depth = 1 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS bounce_rate_e6,
           CAST((2 * SUM(depth) + COUNT(*)) // (2 * COUNT(*))
                AS BIGINT) AS mean_depth_rounded
    FROM sessions
    GROUP BY entry_type
    ORDER BY entry_type
    """,
)
def bounce_rate_by_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate and session depth by ENTRY event type: sessions
    that end after their first event, grouped by what that first
    event was — the product-analytics cut that tells you which
    doorway loses people (a high-bounce entry type is a landing
    problem, not a journey problem).

    Same gaps-and-islands sessionization as sessionize_events (one
    shuffle on user_id; both windows share the sort), a per-session
    rollup, then a |types|-sized aggregate. bounce_rate_e6 is a floor
    division and mean depth the round-half-up (2s+c) div (2c) idiom,
    both on non-negative counts."""
    e = _events(spark, sf_dir).filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            prev_ts.isNull()
            | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTE")),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    numbered = flagged.select(
        "user_id",
        "event_id",
        "event_type",
        F.sum("new_session").over(run).alias("session_id"),
        "ts",
    )
    pos_w = Window.partitionBy("user_id", "session_id").orderBy(
        "ts", "event_id"
    )
    sessions = (
        numbered.withColumn("pos", F.row_number().over(pos_w))
        .groupBy("user_id", "session_id")
        .agg(
            F.max(
                F.when(F.col("pos") == 1, F.col("event_type"))
            ).alias("entry_type"),
            F.count("*").alias("depth"),
        )
    )
    return (
        sessions.groupBy("entry_type")
        .agg(
            F.count("*").cast("bigint").alias("n_sessions"),
            F.sum(F.when(F.col("depth") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_bounces"),
            F.sum("depth").cast("bigint").alias("n_events"),
            F.expr(
                "CAST(SUM(CASE WHEN depth = 1 THEN 1 ELSE 0 END)"
                " * 1000000 div COUNT(*) AS BIGINT)"
            ).alias("bounce_rate_e6"),
            F.expr(
                "CAST((2 * SUM(depth) + COUNT(*)) div (2 * COUNT(*))"
                " AS BIGINT)"
            ).alias("mean_depth_rounded"),
        )
        .orderBy("entry_type")
    )


@query(
    "right_to_be_forgotten_audit",
    oracle="""
    WITH requests AS (
      SELECT DISTINCT user_id
      FROM events
      WHERE CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 4)
                 AS BIGINT) % 100 = 0
    ),
    ev AS (
      SELECT 'events' AS table_name,
             COUNT(*) AS n_rows,
             SUM(CASE WHEN r.user_id IS NOT NULL THEN 1 ELSE 0 END)
               AS n_purge
      FROM events e LEFT JOIN requests r ON r.user_id = e.user_id
    ),
    docs AS (
      SELECT 'documents' AS table_name,
             COUNT(*) AS n_rows,
             SUM(CASE WHEN r.user_id IS NOT NULL THEN 1 ELSE 0 END)
               AS n_purge
      FROM documents d
      LEFT JOIN requests r ON r.user_id = d.doc_id % 5000
    ),
    unioned AS (SELECT * FROM ev UNION ALL SELECT * FROM docs)
    SELECT table_name,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_purge AS BIGINT) AS n_rows_to_purge,
           CAST(n_purge * 1000000 // NULLIF(n_rows, 0) AS BIGINT)
             AS purge_rate_e6
    FROM unioned
    ORDER BY table_name
    """,
)
def right_to_be_forgotten_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-request impact audit (GDPR/CCPA right to be
    forgotten): given a deterministic deletion list (hash-selected 1%
    of users, standing in for the request queue), how many rows each
    table would purge — the scoping report a data-governance pass runs
    BEFORE executing deletes, because purge cost and downstream
    retraining triggers both follow row counts. Documents attribute to
    users via the synthetic doc_id % 5000 authorship rule (documented
    stand-in for a real authorship column).

    The request list is DISTINCT user ids — broadcast-sized relative
    to any fact table — so each per-table count is one broadcast left
    join + aggregate over a single scan; no shuffle of fact rows at
    all. purge_rate_e6 is a floor division on non-negative counts."""
    e = _events(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    requests = (
        e.select("user_id")
        .filter(
            F.expr(
                "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 4),"
                " 16, 10) AS BIGINT) % 100 = 0"
            )
        )
        .distinct()
    )
    req = F.broadcast(requests.withColumnRenamed("user_id", "req_user"))

    def audit(df, table_name, key_col):
        return (
            df.join(req, F.col(key_col) == F.col("req_user"), "left")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(
                    F.when(F.col("req_user").isNotNull(), 1).otherwise(0)
                ).alias("n_purge"),
            )
            .select(
                F.lit(table_name).alias("table_name"),
                F.col("n_rows").cast("bigint").alias("n_rows"),
                F.col("n_purge").cast("bigint").alias("n_rows_to_purge"),
                F.expr(
                    "CAST(n_purge * 1000000 div NULLIF(n_rows, 0)"
                    " AS BIGINT)"
                ).alias("purge_rate_e6"),
            )
        )

    ev = audit(e.select("user_id"), "events", "user_id")
    docs = audit(
        d.select((F.col("doc_id") % 5000).alias("author_id")),
        "documents",
        "author_id",
    )
    return ev.unionByName(docs).orderBy("table_name")


@query(
    "purchase_hazard_curve",
    oracle="""
    WITH t0 AS (
      SELECT user_id,
             MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS t0_us
      FROM events WHERE event_type = 'signup'
      GROUP BY user_id
    ),
    conv AS (
      SELECT e.user_id,
             MIN(epoch_us(CAST(e.ts AS TIMESTAMP))) AS conv_us
      FROM events e JOIN t0 ON t0.user_id = e.user_id
      WHERE e.event_type = 'purchase'
        AND epoch_us(CAST(e.ts AS TIMESTAMP)) >= t0.t0_us
      GROUP BY e.user_id
    ),
    horizon AS (
      SELECT MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS tmax_us FROM events
    ),
    users AS (
      SELECT t0.user_id,
             (conv.conv_us - t0.t0_us) // 86400000000 AS dstar,
             (horizon.tmax_us - t0.t0_us) // 86400000000 AS dcens
      FROM t0
      LEFT JOIN conv ON conv.user_id = t0.user_id
      CROSS JOIN horizon
    ),
    days AS (SELECT unnest(generate_series(0, 13)) AS k),
    tot AS (SELECT COUNT(*) AS n_users FROM users)
    SELECT CAST(days.k AS INT) AS days_since_signup,
           CAST(SUM(CASE WHEN dcens >= days.k
                          AND (dstar IS NULL OR dstar >= days.k)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_at_risk,
           CAST(SUM(CASE WHEN dstar = days.k THEN 1 ELSE 0 END)
                AS BIGINT) AS n_converted,
           CAST(SUM(CASE WHEN dstar = days.k THEN 1 ELSE 0 END)
                * 1000000
                // NULLIF(SUM(CASE WHEN dcens >= days.k
                               AND (dstar IS NULL OR dstar >= days.k)
                              THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS hazard_e6,
           CAST(SUM(CASE WHEN dstar IS NOT NULL AND dstar <= days.k
                     THEN 1 ELSE 0 END) * 1000000
                // NULLIF(tot.n_users, 0) AS BIGINT)
             AS cum_conversion_e6
    FROM users
    CROSS JOIN days
    CROSS JOIN tot
    GROUP BY days.k, tot.n_users
    ORDER BY days_since_signup
    """,
)
def purchase_hazard_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time survival analysis of signup-to-purchase: for each
    day k since a user's first signup, the conversion HAZARD (share of
    still-unconverted, still-observable users who convert on day k)
    with right-censoring at the observation horizon — the estimator
    product analytics needs because naive conversion rates understate
    late cohorts (their clock hasn't run). n_at_risk shrinks by both
    conversion and censoring, exactly as in the Kaplan-Meier risk set;
    the cumulative conversion column is the uncensored empirical CDF
    for reference.

    One groupBy per anchor/conversion event, a per-user row (bounded
    by |users|), a broadcast 14-day grid that collapses map-side to 14
    rows per partition, and pure-integer day buckets (floor division
    of microsecond deltas). hazard_e6 and cum_conversion_e6 are floor
    divisions on non-negative counts."""
    e = _events(spark, sf_dir)
    t0 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(epoch_us("ts")).alias("t0_us"))
    )
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", epoch_us("ts").alias("p_us"))
        .join(t0, "user_id")
        .filter(F.col("p_us") >= F.col("t0_us"))
        .groupBy("user_id")
        .agg(F.min("p_us").alias("conv_us"))
    )
    horizon = e.agg(F.max(epoch_us("ts")).alias("tmax_us"))
    users = (
        t0.join(conv, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.expr("(conv_us - t0_us) div 86400000000").alias("dstar"),
            F.expr("(tmax_us - t0_us) div 86400000000").alias("dcens"),
        )
    )
    days = spark.createDataFrame([(k,) for k in range(14)], "k int")
    tot = users.agg(F.count("*").alias("n_users"))
    at_risk = F.sum(
        F.when(
            (F.col("dcens") >= F.col("k"))
            & (F.col("dstar").isNull() | (F.col("dstar") >= F.col("k"))),
            1,
        ).otherwise(0)
    )
    converted = F.sum(
        F.when(F.col("dstar") == F.col("k"), 1).otherwise(0)
    )
    return (
        users.crossJoin(F.broadcast(days))
        .crossJoin(F.broadcast(tot))
        .groupBy("k", "n_users")
        .agg(
            at_risk.alias("ar"),
            converted.alias("cv"),
            F.sum(
                F.when(
                    F.col("dstar").isNotNull()
                    & (F.col("dstar") <= F.col("k")),
                    1,
                ).otherwise(0)
            ).alias("cum_cv"),
        )
        .select(
            F.col("k").cast("int").alias("days_since_signup"),
            F.col("ar").cast("bigint").alias("n_at_risk"),
            F.col("cv").cast("bigint").alias("n_converted"),
            F.expr(
                "CAST(cv * 1000000 div NULLIF(ar, 0) AS BIGINT)"
            ).alias("hazard_e6"),
            F.expr(
                "CAST(cum_cv * 1000000 div NULLIF(n_users, 0) AS BIGINT)"
            ).alias("cum_conversion_e6"),
        )
        .orderBy("days_since_signup")
    )


@query(
    "ab_test_analysis",
    oracle="""
    WITH assigned AS (
      SELECT user_id,
             CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 4)
                  AS BIGINT) % 2 AS arm
      FROM events
      GROUP BY user_id
    ),
    outcomes AS (
      SELECT a.user_id, a.arm,
             MAX(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted,
             SUM(CASE WHEN e.event_type = 'purchase'
                 THEN CAST(ROUND(e.value * 100) AS BIGINT) ELSE 0 END)
               AS cents
      FROM assigned a JOIN events e ON e.user_id = a.user_id
      GROUP BY a.user_id, a.arm
    ),
    arms AS (
      SELECT arm, COUNT(*) AS n, SUM(converted) AS c, SUM(cents) AS v
      FROM outcomes GROUP BY arm
    ),
    wide AS (
      SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n_a,
             MAX(CASE WHEN arm = 0 THEN c END) AS c_a,
             MAX(CASE WHEN arm = 0 THEN v END) AS v_a,
             MAX(CASE WHEN arm = 1 THEN n END) AS n_b,
             MAX(CASE WHEN arm = 1 THEN c END) AS c_b,
             MAX(CASE WHEN arm = 1 THEN v END) AS v_b
      FROM arms
    )
    SELECT CAST(n_a AS BIGINT) AS n_users_a,
           CAST(n_b AS BIGINT) AS n_users_b,
           CAST(c_a AS BIGINT) AS n_conv_a,
           CAST(c_b AS BIGINT) AS n_conv_b,
           CAST(c_a * 1000000 // NULLIF(n_a, 0) AS BIGINT)
             AS conv_rate_a_e6,
           CAST(c_b * 1000000 // NULLIF(n_b, 0) AS BIGINT)
             AS conv_rate_b_e6,
           CAST((2 * v_a + c_a) // (2 * NULLIF(c_a, 0)) AS BIGINT)
             AS mean_value_per_conv_a,
           CAST((2 * v_b + c_b) // (2 * NULLIF(c_b, 0)) AS BIGINT)
             AS mean_value_per_conv_b,
           (CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
           / NULLIF(SQRT(
               (CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
               * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
               * (1.0 / n_a + 1.0 / n_b)), 0.0) AS z_conversion
    FROM wide
    """,
)
def ab_test_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with a two-proportion z-test: users
    split into arms by a counter-based hash (reproducible on any
    cluster, no assignment table to store), purchase conversion and
    value-per-converter compared, and the pooled-variance z statistic
    for the conversion delta — the decision metric an experimentation
    pipeline materializes every run. With hash arms on uniform
    traffic, z should hover near 0: the query doubles as the A/A
    sanity check that validates the assignment hash itself.

    One shuffle to the user grain, one to 2 arm rows. Counts and cents
    are exact integers (rates floor-divided, value-per-converter
    round-half-up); z derives from the four arm integers through one
    expression tree written identically on both engines, with NULLIF
    guarding the degenerate all-convert/none-convert pools."""
    e = _events(spark, sf_dir)
    outcomes = (
        e.select(
            "user_id",
            "event_type",
            F.expr(
                "CASE WHEN event_type = 'purchase'"
                " THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END"
            ).alias("cents"),
        )
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted"),
            F.sum("cents").alias("cents"),
        )
        .select(
            F.expr(
                "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 4),"
                " 16, 10) AS BIGINT) % 2"
            ).alias("arm"),
            "converted",
            "cents",
        )
    )
    arms = outcomes.groupBy("arm").agg(
        F.count("*").alias("n"),
        F.sum("converted").alias("c"),
        F.sum("cents").alias("v"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == 0, F.col("c"))).alias("c_a"),
        F.max(F.when(F.col("arm") == 0, F.col("v"))).alias("v_a"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == 1, F.col("c"))).alias("c_b"),
        F.max(F.when(F.col("arm") == 1, F.col("v"))).alias("v_b"),
    )
    return wide.select(
        F.col("n_a").cast("bigint").alias("n_users_a"),
        F.col("n_b").cast("bigint").alias("n_users_b"),
        F.col("c_a").cast("bigint").alias("n_conv_a"),
        F.col("c_b").cast("bigint").alias("n_conv_b"),
        F.expr("CAST(c_a * 1000000 div NULLIF(n_a, 0) AS BIGINT)").alias(
            "conv_rate_a_e6"
        ),
        F.expr("CAST(c_b * 1000000 div NULLIF(n_b, 0) AS BIGINT)").alias(
            "conv_rate_b_e6"
        ),
        F.expr(
            "CAST((2 * v_a + c_a) div (2 * NULLIF(c_a, 0)) AS BIGINT)"
        ).alias("mean_value_per_conv_a"),
        F.expr(
            "CAST((2 * v_b + c_b) div (2 * NULLIF(c_b, 0)) AS BIGINT)"
        ).alias("mean_value_per_conv_b"),
        F.expr(
            "(CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)"
            " / NULLIF(SQRT("
            " (CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))"
            " * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))"
            " * (1.0 / n_a + 1.0 / n_b)), 0.0)"
        ).alias("z_conversion"),
    )


@query(
    "dau_mau_stickiness",
    oracle="""
    WITH daily AS (
      SELECT strftime(CAST(ts AS DATE), '%Y-%m') AS month,
             CAST(ts AS DATE) AS day,
             COUNT(DISTINCT user_id) AS dau
      FROM events GROUP BY 1, 2
    ),
    monthly AS (
      SELECT strftime(CAST(ts AS DATE), '%Y-%m') AS month,
             COUNT(DISTINCT user_id) AS mau
      FROM events GROUP BY 1
    )
    SELECT d.month,
           CAST(COUNT(*) AS BIGINT) AS n_active_days,
           CAST(SUM(d.dau) AS BIGINT) AS sum_dau,
           CAST(m.mau AS BIGINT) AS mau,
           CAST((2 * SUM(d.dau) + COUNT(*)) // (2 * COUNT(*))
                AS BIGINT) AS mean_dau_rounded,
           CAST(SUM(d.dau) * 1000000
                // NULLIF(COUNT(*) * m.mau, 0) AS BIGINT)
             AS stickiness_e6
    FROM daily d JOIN monthly m ON m.month = d.month
    GROUP BY d.month, m.mau
    ORDER BY d.month
    """,
)
def dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per month: mean daily active users over
    monthly active users — the engagement ratio every product
    dashboard tracks (1.0 = everyone active daily, ~0.03 = monthly
    drop-ins). Exact distinct counts at both grains (the KMV sketch
    family covers the approximate path at extreme scale).

    Two distinct aggregates over one scan — day grain and month grain
    — joined on month (both bounded by the calendar x user domain,
    with partial aggregation doing the heavy lift map-side).
    stickiness_e6 = sum(dau) / (days x mau) as a floor division of
    non-negative integers; mean DAU uses the round-half-up idiom."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        F.date_format("ts", "yyyy-MM").alias("month"),
        F.to_date("ts").alias("day"),
    ).agg(F.countDistinct("user_id").alias("dau"))
    monthly = e.groupBy(
        F.date_format("ts", "yyyy-MM").alias("month")
    ).agg(F.countDistinct("user_id").alias("mau"))
    return (
        daily.join(monthly, "month")
        .groupBy("month", "mau")
        .agg(
            F.count("*").cast("bigint").alias("n_active_days"),
            F.sum("dau").cast("bigint").alias("sum_dau"),
            F.expr(
                "CAST((2 * SUM(dau) + COUNT(*)) div (2 * COUNT(*))"
                " AS BIGINT)"
            ).alias("mean_dau_rounded"),
            F.expr(
                "CAST(SUM(dau) * 1000000"
                " div NULLIF(COUNT(*) * mau, 0) AS BIGINT)"
            ).alias("stickiness_e6"),
        )
        .select(
            "month",
            "n_active_days",
            "sum_dau",
            F.col("mau").cast("bigint").alias("mau"),
            "mean_dau_rounded",
            "stickiness_e6",
        )
        .orderBy("month")
    )


@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    c AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ),
    tot AS (SELECT prev_type, SUM(n) AS t FROM c GROUP BY prev_type)
    SELECT c.prev_type, c.next_type,
           CAST(c.n AS BIGINT) AS n_transitions,
           CAST(c.n * 1000000 // tot.t AS BIGINT) AS prob_e6
    FROM c JOIN tot ON c.prev_type = tot.prev_type
    ORDER BY c.prev_type, next_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event streams:
    for each (previous event type, next event type) pair, the count
    and the row-normalized transition probability — the behavioral
    model behind next-action prediction, funnel leak detection, and
    bot fingerprinting (bots have near-deterministic rows).

    The lag window is per-user (scales, no global window); counts
    aggregate with map-side combine; probabilities are truncating
    integer e6 divisions of exact counts (the per-prev_type total is
    >= each cell count, never zero for an emitted row)."""
    ev = _events(spark, sf_dir)
    from pyspark.sql.window import Window

    seq = ev.select(
        "event_type",
        F.lag("event_type")
        .over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        )
        .alias("prev_type"),
    )
    c = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )
    tot = c.groupBy("prev_type").agg(F.sum("n").alias("t"))
    return (
        c.join(tot, "prev_type")
        .select(
            "prev_type",
            "next_type",
            F.col("n").cast("bigint").alias("n_transitions"),
            F.expr("n * 1000000 div t").alias("prob_e6"),
        )
        .orderBy("prev_type", "next_type")
    )


@query(
    "session_entropy_per_user",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type
    ),
    tot AS (SELECT user_id, SUM(n) AS t FROM c GROUP BY user_id),
    terms AS (
      SELECT c.user_id,
             CAST(ROUND(-(CAST(c.n AS DOUBLE) / CAST(tot.t AS DOUBLE))
                        * ln(CAST(c.n AS DOUBLE) / CAST(tot.t AS DOUBLE))
                        * 1000000) AS BIGINT) AS term_e6
      FROM c JOIN tot ON c.user_id = tot.user_id
    ),
    h AS (
      SELECT user_id, SUM(term_e6) AS entropy_nats_e6
      FROM terms GROUP BY user_id
    )
    SELECT CAST(entropy_nats_e6 AS BIGINT) AS entropy_nats_e6,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(MIN(user_id) AS BIGINT) AS sample_user
    FROM h
    GROUP BY entropy_nats_e6
    ORDER BY entropy_nats_e6
    """,
)
def session_entropy_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-diversity score: Shannon entropy (nats) of each
    user's event-type distribution, reported as a distribution over
    users (bots and single-action scripts sit at 0; diverse organic
    users sit near ln(n_types)).

    Engine-stable float discipline: each -p*ln(p) term derives from
    exact integer counts via identical expression trees, is ROUNDed
    ONCE to an e6 BIGINT per (user, type) cell, and the per-user
    entropy is an order-independent INTEGER sum of those cells (the
    per-cell-round-then-integer-sum convention)."""
    ev = _events(spark, sf_dir)
    c = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n")
    )
    tot = c.groupBy("user_id").agg(F.sum("n").alias("t"))
    terms = c.join(tot, "user_id").select(
        "user_id",
        F.expr(
            "CAST(ROUND(-(CAST(n AS DOUBLE) / CAST(t AS DOUBLE))"
            " * ln(CAST(n AS DOUBLE) / CAST(t AS DOUBLE))"
            " * 1000000) AS BIGINT)"
        ).alias("term_e6"),
    )
    h = terms.groupBy("user_id").agg(
        F.sum("term_e6").alias("entropy_nats_e6")
    )
    return (
        h.groupBy(
            F.col("entropy_nats_e6").cast("bigint").alias(
                "entropy_nats_e6"
            )
        )
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.min("user_id").cast("bigint").alias("sample_user"),
        )
        .orderBy("entropy_nats_e6")
    )


@query(
    "weekday_activity_profile",
    oracle="""
    SELECT CAST(isodow(CAST(ts AS DATE)) AS INT) AS iso_weekday,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY 1, 2
    ORDER BY iso_weekday, event_type
    """,
)
def weekday_activity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x event-type activity heatmap (ISO weekday,
    1=Monday) — the seasonality profile behind staffing, anomaly
    baselines, and the day-of-week adjustment of volume monitors.

    Weekday numbering is the classic cross-engine trap (Spark
    dayofweek() is 1=Sunday, DuckDB dayofweek() is 0=Sunday); both
    sides use the ISO convention explicitly — Spark weekday()+1 ==
    DuckDB isodow(). One scan, one partial-agg groupBy of at most
    7 x n_types rows."""
    ev = _events(spark, sf_dir)
    return (
        ev.filter(F.col("ts").isNotNull())
        .groupBy(
            F.expr("CAST(weekday(CAST(ts AS DATE)) + 1 AS INT)").alias(
                "iso_weekday"
            ),
            "event_type",
        )
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.expr(
                "CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))"
                " AS BIGINT)"
            ).alias("sum_cents"),
        )
        .orderBy("iso_weekday", "event_type")
    )


@query(
    "cohort_retention_matrix",
    oracle="""
    WITH act AS (
      SELECT user_id,
             CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000
                  AS BIGINT) AS wk
      FROM events
      GROUP BY 1, 2
    ),
    first AS (
      SELECT user_id, MIN(wk) AS cohort_wk FROM act GROUP BY user_id
    ),
    size AS (
      SELECT cohort_wk, COUNT(*) AS cohort_size FROM first GROUP BY 1
    ),
    cells AS (
      SELECT f.cohort_wk, a.wk - f.cohort_wk AS weeks_since,
             COUNT(*) AS n_active
      FROM act a JOIN first f USING (user_id)
      GROUP BY 1, 2
    )
    SELECT CAST(c.cohort_wk AS BIGINT) AS cohort_week,
           CAST(c.weeks_since AS BIGINT) AS weeks_since,
           CAST(c.n_active AS BIGINT) AS n_active_users,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           CAST(c.n_active * 1000000 // s.cohort_size AS BIGINT)
             AS retention_e6
    FROM cells c JOIN size s USING (cohort_wk)
    ORDER BY cohort_week, weeks_since
    """,
)
def cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention triangle: users grouped by their FIRST
    active week, each cohort's share still active k weeks later — the
    growth-accounting table every product and every data-collection
    pipeline reads (a cohort whose week-1 retention collapses marks a
    bad ingest or a bot wave, not growth).

    Weeks are integer epoch-microsecond divisions (non-negative, so
    Spark div and DuckDB // agree); activity collapses to DISTINCT
    (user, week) scan-side before any join, so the matrix joins
    per-user rows, not events; cohort sizes broadcast. Retention is a
    truncating e6 division (cohort_size >= 1 for emitted rows)."""
    ev = _events(spark, sf_dir)
    act = (
        ev.select(
            "user_id",
            epoch_us("ts").alias("__us"),
        )
        .select(
            "user_id",
            F.expr("CAST(__us div 604800000000 AS BIGINT)").alias("wk"),
        )
        .distinct()
    )
    first = act.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    size = first.groupBy("cohort_wk").agg(
        F.count("*").alias("cohort_size")
    )
    cells = (
        act.join(first, "user_id")
        .groupBy(
            "cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("weeks_since")
        )
        .agg(F.count("*").alias("n_active"))
    )
    return (
        cells.join(F.broadcast(size), "cohort_wk")
        .select(
            F.col("cohort_wk").cast("bigint").alias("cohort_week"),
            F.col("weeks_since").cast("bigint").alias("weeks_since"),
            F.col("n_active").cast("bigint").alias("n_active_users"),
            F.col("cohort_size").cast("bigint").alias("cohort_size"),
            F.expr(
                "CAST(n_active * 1000000 div cohort_size AS BIGINT)"
            ).alias("retention_e6"),
        )
        .orderBy("cohort_week", "weeks_since")
    )


@query(
    "events_anomaly_mad",
    oracle="""
    WITH daily AS (
      SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                  AS BIGINT) AS day_n,
             COUNT(*) AS x
      FROM events GROUP BY 1
    ),
    r AS (
      SELECT day_n, x,
             ROW_NUMBER() OVER (ORDER BY x, day_n) AS rn,
             COUNT(*) OVER () AS n
      FROM daily
    ),
    med AS (SELECT x AS m FROM r WHERE rn = (n - 1) // 2 + 1),
    dev AS (
      SELECT day_n, x, ABS(x - m) AS d, m FROM daily CROSS JOIN med
    ),
    r2 AS (
      SELECT d, ROW_NUMBER() OVER (ORDER BY d, day_n) AS rn,
             COUNT(*) OVER () AS n
      FROM dev
    ),
    mad AS (SELECT d AS md FROM r2 WHERE rn = (n - 1) // 2 + 1)
    SELECT day_n AS day_number,
           CAST(x AS BIGINT) AS n_events,
           CAST(m AS BIGINT) AS median_events,
           CAST(md AS BIGINT) AS mad_events,
           CAST((x - m) * 10000 // NULLIF(md, 0) AS BIGINT)
             AS robust_z_e4
    FROM dev CROSS JOIN mad
    WHERE md > 0 AND ABS((x - m) * 10000 // md) >= 35000
    ORDER BY day_number
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-volume anomaly screen: days whose event count
    deviates from the MEDIAN by more than 3.5 MADs (median absolute
    deviation) — the outlier detector that, unlike the z-score family
    (daily_count_anomalies), is not itself corrupted by the outliers
    it hunts (one 100x bot day inflates a stddev but barely moves a
    median). Completes the anomaly toolkit next to CUSUM (level
    shifts) and the EWMA residual (drifting baseline).

    Both the median and the MAD are EXACT ORDER STATISTICS selected by
    rank (lower-median convention) via the distributed-rank operator —
    never an unpartitioned sort, never interpolation — and the robust
    z is a truncating integer division of exact counts. The day grain
    bounds every relation by the calendar.

    Negative deviations divide fine unshifted: Spark's div and
    DuckDB's // BOTH truncate toward zero on integer operands
    (verified -7//2 = -3 in DuckDB), so the +-3.5 threshold applies
    to the identical truncated value on both engines. (DECIMAL
    operands are the case where DuckDB diverges — not used here.)"""
    from local_stream_stack_spark.operators.quantiles import (
        with_global_rank,
    )

    ev = _events(spark, sf_dir)
    daily = (
        ev.select(epoch_us("ts").alias("__us"))
        .select(
            F.expr("CAST(__us div 86400000000 AS BIGINT)").alias("day_n")
        )
        .groupBy("day_n")
        .agg(F.count("*").alias("x"))
    )

    def rank_select_median(df, val, tie):
        ranked = with_global_rank(
            df, val, [tie], out_rank="__rn", total_col="__n",
            materialize=True,  # derived-aggregate input: avoid 3x lineage re-execution (guide §5)
        )
        return ranked.filter(
            F.expr("__rn = (__n - 1) div 2 + 1")
        ).select(F.col(val).alias("__m"))

    med = rank_select_median(daily, "x", "day_n")
    dev = daily.crossJoin(F.broadcast(med)).select(
        "day_n",
        "x",
        F.col("__m").alias("m"),
        F.abs(F.col("x") - F.col("__m")).alias("d"),
    )
    mad = rank_select_median(dev, "d", "day_n").select(
        F.col("__m").alias("md")
    )
    scored = dev.crossJoin(F.broadcast(mad))
    z = "CAST((x - m) * 10000 div NULLIF(md, 0) AS BIGINT)"
    return (
        scored.filter(
            F.expr(f"md > 0 AND ABS({z}) >= 35000")
        )
        .select(
            F.col("day_n").alias("day_number"),
            F.col("x").cast("bigint").alias("n_events"),
            F.col("m").cast("bigint").alias("median_events"),
            F.col("md").cast("bigint").alias("mad_events"),
            F.expr(z).alias("robust_z_e4"),
        )
        .orderBy("day_number")
    )


@query(
    "bloom_filter_fp_audit",
    oracle="""
    WITH members AS (
      SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    probes AS (
      SELECT c_custkey AS k FROM customer WHERE c_mktsegment <> 'BUILDING'
    ),
    bits AS (
      SELECT DISTINCT
             CAST(('0x' || substr(md5('bloom' || i.i || ':'
                                      || CAST(m.k AS VARCHAR)), 1, 8))
                  AS BIGINT) % 4096 AS pos
      FROM members m, generate_series(0, 2) i(i)
    ),
    probe_pos AS (
      SELECT p.k, i.i,
             CAST(('0x' || substr(md5('bloom' || i.i || ':'
                                      || CAST(p.k AS VARCHAR)), 1, 8))
                  AS BIGINT) % 4096 AS pos
      FROM probes p, generate_series(0, 2) i(i)
    ),
    hits AS (
      SELECT pp.k, CAST(COUNT(*) AS BIGINT) AS n_hit
      FROM probe_pos pp JOIN bits b ON pp.pos = b.pos
      GROUP BY pp.k
    ),
    agg AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM members) AS n_members,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS n_bits_set,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM probes) AS n_probes,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM hits WHERE n_hit = 3)
               AS n_fp
    )
    SELECT n_members, n_bits_set, n_probes, n_fp,
           CASE WHEN n_probes > 0 THEN
             CAST(n_fp * 1000000 // n_probes AS BIGINT)
           END AS fp_rate_e6,
           CAST(FLOOR(POW(n_bits_set / 4096.0, 3) * 1e6 + 0.5) AS BIGINT)
             AS theory_e6
    FROM agg
    """,
)
def bloom_filter_fp_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter false-positive audit — the sketch the 100 TB join
    prefilter actually ships (`join_bloom_prefiltered` uses Spark's
    opaque builtin; this one builds a PORTABLE bloom from first
    principles so the false-positive rate itself is oracle-checkable):
    m=4096 bits, kₕ=3 md5-derived positions per key, membership = all
    three bits set. The BUILDING-segment customers populate the
    filter; every other customer probes it; the measured FP count is
    exact set arithmetic on both engines, and the observed rate is
    compared against the (bits_set/m)^kₕ theoretical rate — the audit
    that tells an engineer whether the filter is sized right before
    it gates a shuffle. Scale: the bit-set relation is bounded by m
    (broadcast); probes are one scan + broadcast hash semi-join; no
    shuffle of the probe side."""
    configure_for_oracle(spark)
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    members = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    probes = c.filter(F.col("c_mktsegment") != "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    ks = spark.range(0, 3).select(F.col("id").cast("int").alias("i"))

    def pos_expr():
        return F.expr(
            "CAST(conv(substring(md5(concat('bloom', i, ':',"
            " CAST(k AS STRING))), 1, 8), 16, 10) AS BIGINT) % 4096"
        ).alias("pos")

    bits = (
        members.crossJoin(F.broadcast(ks)).select(pos_expr()).distinct()
    )
    probe_pos = probes.crossJoin(F.broadcast(ks)).select("k", pos_expr())
    hits = (
        probe_pos.join(F.broadcast(bits), "pos")
        .groupBy("k")
        .agg(F.count("*").cast("bigint").alias("n_hit"))
    )
    agg = (
        members.agg(F.count("*").cast("bigint").alias("n_members"))
        .crossJoin(
            F.broadcast(
                bits.agg(F.count("*").cast("bigint").alias("n_bits_set"))
            )
        )
        .crossJoin(
            F.broadcast(
                probes.agg(F.count("*").cast("bigint").alias("n_probes"))
            )
        )
        .crossJoin(
            F.broadcast(
                hits.filter(F.col("n_hit") == 3).agg(
                    F.count("*").cast("bigint").alias("n_fp")
                )
            )
        )
    )
    return agg.select(
        "n_members",
        "n_bits_set",
        "n_probes",
        "n_fp",
        F.expr(
            """CASE WHEN n_probes > 0 THEN
                 CAST(n_fp * 1000000 div n_probes AS BIGINT)
               END"""
        ).alias("fp_rate_e6"),
        F.expr(
            "CAST(FLOOR(POW(n_bits_set / 4096.0, 3) * 1e6 + 0.5)"
            " AS BIGINT)"
        ).alias("theory_e6"),
    )


@query(
    "markov_entropy_rate",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    c AS (
      SELECT prev_type, event_type AS next_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ),
    rt AS (SELECT prev_type, CAST(SUM(n) AS BIGINT) AS t
           FROM c GROUP BY prev_type),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS big_n,
                   CAST(COUNT(*) AS BIGINT) AS n_cells
            FROM c),
    cells AS (
      SELECT CAST(FLOOR(-c.n * LN(CAST(c.n AS DOUBLE) / rt.t)
                        * 1e9 + 0.5) AS BIGINT) AS h_e9
      FROM c JOIN rt ON rt.prev_type = c.prev_type
    ),
    hs AS (SELECT CAST(SUM(h_e9) AS BIGINT) AS h_sum_e9 FROM cells)
    SELECT t.big_n AS n_transitions,
           t.n_cells,
           CAST((SELECT COUNT(*) FROM rt) AS BIGINT) AS n_states,
           CASE WHEN t.big_n > 0 THEN
             CAST(FLOOR(CAST(h.h_sum_e9 AS DOUBLE) / 1e9 / t.big_n
                        * 1e6 + 0.5) AS BIGINT)
           END AS h_rate_e6
    FROM tot t CROSS JOIN hs h
    """,
)
def markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the first-order event Markov chain — the
    information-theoretic scalar on top of the transition matrix
    already in the family: H(next | current) = −Σ_ij p(i,j)·ln
    p(j|i), the expected per-step surprise of user behavior (bots and
    replayed traffic drive it toward 0; uniform exploration toward
    ln k). Transition counts are exact integers from the per-user lag
    window; each cell's −n·ln(n/t) is floored to an e9 integer BEFORE
    the global sum (order-independent), and the rate is one double
    division rounded to e6."""
    from pyspark.sql.window import Window

    ev = _events(spark, sf_dir)
    seq = ev.select(
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    c = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    rt = c.groupBy("prev_type").agg(F.sum("n").cast("bigint").alias("t"))
    tot = c.agg(
        F.sum("n").cast("bigint").alias("big_n"),
        F.count("*").cast("bigint").alias("n_cells"),
    )
    nstates = rt.agg(F.count("*").cast("bigint").alias("n_states"))
    hs = (
        c.join(F.broadcast(rt), "prev_type")
        .select(
            F.expr(
                "CAST(FLOOR(-n * LN(CAST(n AS DOUBLE) / t)"
                " * 1e9 + 0.5) AS BIGINT)"
            ).alias("h_e9")
        )
        .agg(F.sum("h_e9").cast("bigint").alias("h_sum_e9"))
    )
    return (
        tot.crossJoin(F.broadcast(nstates))
        .crossJoin(F.broadcast(hs))
        .select(
            F.col("big_n").alias("n_transitions"),
            "n_cells",
            "n_states",
            F.expr(
                """CASE WHEN big_n > 0 THEN
                     CAST(FLOOR(CAST(h_sum_e9 AS DOUBLE) / 1e9 / big_n
                                * 1e6 + 0.5) AS BIGINT)
                   END"""
            ).alias("h_rate_e6"),
        )
    )
