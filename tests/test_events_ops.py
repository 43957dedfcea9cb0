"""Composite event operators: latest-per-key (compaction), tombstones,
as-of join, sessionize — golden tests on the reference's own
compaction fixture (README.md:157-176, sample_kafka_process.sh:194-215)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from local_stream_stack_spark.operators.events import (
    asof_join,
    latest_per_key,
    sessionize,
)


def _ts(minute: int, second: int = 0):
    return datetime(2024, 1, 1, 10, minute, second)


def test_latest_per_key_compaction_fixture(spark):
    """Reference walkthrough: user123 gets two updates then a
    tombstone; compacted view keeps only the latest per key."""
    rows = [
        ("user123", '{"name":"Alice","city":"New York"}', 1),
        ("user123", '{"name":"Alice","city":"London","status":"active"}', 2),
        ("user123", None, 3),  # tombstone
        ("user456", '{"name":"Bob"}', 4),
    ]
    df = spark.createDataFrame(rows, "key string, value string, offset long")
    latest = latest_per_key(df, keys=["key"], order_by=["offset"])
    got = {(r.key, r.value) for r in latest.collect()}
    assert got == {("user123", None), ("user456", '{"name":"Bob"}')}

    # tombstone filter: user123's latest is null => key disappears
    compacted = latest.filter(F.col("value").isNotNull())
    assert [r.key for r in compacted.collect()] == ["user456"]


def test_latest_per_key_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [("k", "a", 1, 10), ("k", "b", 1, 11)],
        "key string, value string, ts long, offset long",
    )
    latest = latest_per_key(df, keys=["key"], order_by=["ts", "offset"])
    assert latest.first().value == "b"  # higher offset wins at equal ts


def test_asof_join_golden(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(20), 101), (2, _ts(15), 102)],
        "user_id int, ts timestamp, purchase_id int",
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 900), (1, _ts(10), 901), (1, _ts(18), 902), (2, _ts(16), 903)],
        "user_id int, ts timestamp, view_id int",
    )
    out = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["view_id"],
    )
    got = {(r.purchase_id, r.view_id) for r in out.collect()}
    # purchase@10 matches view@10 (asof inclusive), purchase@20 -> view@18,
    # user2 purchase@15 has no earlier view -> null
    assert got == {(100, 901), (101, 902), (102, None)}


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [(1, _ts(30), 1)], "user_id int, ts timestamp, purchase_id int"
    )
    right = spark.createDataFrame(
        [(1, _ts(0), 9)], "user_id int, ts timestamp, view_id int"
    )
    out = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["view_id"], tolerance="INTERVAL 10 MINUTES",
    )
    assert out.first().view_id is None  # 30 min gap > 10 min tolerance


def test_sessionize_islands(spark):
    rows = [
        (1, _ts(0)), (1, _ts(10)), (1, _ts(50)),  # gap 40min -> new session
        (2, _ts(5)),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = sessionize(df, key="user_id", ts="ts", gap="INTERVAL 30 MINUTE")
    sessions = {(r.user_id, r.ts.minute): r.session_id for r in out.collect()}
    assert sessions[(1, 0)] == 1 and sessions[(1, 10)] == 1
    assert sessions[(1, 50)] == 2
    assert sessions[(2, 5)] == 1


def test_sessionize_chunked_equals_plain(spark):
    """Chunked sessionization must produce BIT-IDENTICAL sessions to
    the plain per-key window, including across chunk boundaries:
    sessions spanning 2+ chunks, boundary gaps exactly at/over the
    threshold, multi-chunk-spanning dense runs, and an idle chunk in
    the middle."""
    from datetime import datetime, timedelta

    from local_stream_stack_spark.operators.events import (
        sessionize,
        sessionize_chunked,
    )
    import pyspark.sql.functions as F
    from local_stream_stack_spark.utils.ts import epoch_us

    base = datetime(2024, 1, 1)
    rows = []
    eid = 0

    def ev(user, minutes):
        nonlocal eid
        eid += 1
        rows.append((user, base + timedelta(minutes=minutes), eid))

    # user 1: dense run crossing the 360-min chunk boundary (10-min
    # steps, gap 30 => ONE session spanning chunks)
    for m in range(300, 420, 10):
        ev(1, m)
    # user 1: later isolated session
    ev(1, 1000)
    # user 2: events ending exactly 30 min before the next (gap == G
    # keeps the session), then 31 min (gap > G splits), straddling a
    # boundary
    ev(2, 330)
    ev(2, 360)
    ev(2, 391)
    # user 3: multi-chunk continuous activity (every 20 min for 20 h)
    for m in range(0, 1200, 20):
        ev(3, m)
    # user 4: single event
    ev(4, 50)
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_id bigint")

    plain = (
        sessionize(df, key="user_id", ts="ts", gap="INTERVAL 30 MINUTE",
                   order_tiebreak="event_id")
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            epoch_us(F.min("ts")).alias("session_start_us"),
            epoch_us(F.max("ts")).alias("session_end_us"),
        )
    )
    chunked = sessionize_chunked(
        df, key="user_id", ts="ts", gap_us=30 * 60 * 1_000_000,
        chunk_us=6 * 3600 * 1_000_000, order_tiebreak="event_id",
    ).select("user_id", "session_id", "n_events",
             "session_start_us", "session_end_us")
    a = sorted(tuple(r) for r in plain.collect())
    b = sorted(tuple(r) for r in chunked.collect())
    assert a == b
    # sanity: user 3's 20-h run is one session in both
    u3 = [r for r in a if r[0] == 3]
    assert len(u3) == 1 and u3[0][2] == 60


def test_lag_gaps_chunked_equals_plain(spark):
    """Carrier-based chunked lag must reproduce the plain per-key lag
    exactly: gaps across chunk boundaries, across an EMPTY middle
    chunk, equal-timestamp runs, and NULL for each key's first event."""
    from datetime import datetime, timedelta

    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from local_stream_stack_spark.operators.events import lag_gaps_chunked
    from local_stream_stack_spark.utils.ts import epoch_us

    base = datetime(2024, 1, 1)
    rows, eid = [], 0

    def ev(user, minutes):
        nonlocal eid
        eid += 1
        rows.append((user, base + timedelta(minutes=minutes), eid))

    for m in (350, 355, 365, 370):   # straddles the 360-min boundary
        ev(1, m)
    ev(1, 1500)                      # skips TWO whole chunks
    ev(2, 10)
    ev(2, 10)                        # equal timestamps, tiebreak path
    ev(2, 800)
    ev(3, 42)                        # single event -> NULL gap
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint"
    ).select("user_id", "event_id", epoch_us("ts").alias("t_us"))

    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    plain = df.withColumn("gap_us", F.col("t_us") - F.lag("t_us").over(w))
    chunked = lag_gaps_chunked(
        df, key="user_id", ts_us="t_us", order_tiebreak="event_id"
    )
    a = sorted(tuple(r) for r in plain.collect())
    b = sorted(
        tuple(r)
        for r in chunked.select("user_id", "event_id", "t_us", "gap_us").collect()
    )
    assert a == b


def test_session_paths_trigrams_respect_session_breaks(spark, tmp_path):
    """Trigram paths never cross a 30-min session boundary, and the
    top-10 ordering breaks count ties on path text."""
    import datetime as dt

    import pandas as pd

    t0 = dt.datetime(2024, 1, 1, 8, 0, 0)

    def mk(i, minutes, etype):
        return (i, t0 + dt.timedelta(minutes=minutes), 1, etype, 1.0, "{}")

    rows = [
        # session 1: view > click > purchase (one trigram)
        mk(1, 0, "view"), mk(2, 1, "click"), mk(3, 2, "purchase"),
        # 31-min gap -> session 2: view > click > error
        mk(4, 33, "view"), mk(5, 34, "click"), mk(6, 35, "error"),
    ]
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    d = tmp_path / "wh"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")

    from local_stream_stack_spark.queries.events_ops import session_paths_top

    got = [(r.path, r.n_sessions_path) for r in
           session_paths_top(spark, str(d)).collect()]
    # without the session break this would include click>purchase>view
    # and purchase>view>click crossing the gap
    assert got == [("view>click>error", 1), ("view>click>purchase", 1)]


def test_attribution_last_touch_window_and_ties(spark, tmp_path):
    """Attribution credits the latest touch within 1h (ties on
    highest event_id), and purchases without a qualifying touch
    report as 'none'."""
    import datetime as dt

    import pandas as pd

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def mk(i, minutes, etype, value=0.0):
        return (i, t0 + dt.timedelta(minutes=minutes), 7, etype, value, "{}")

    rows = [
        mk(1, 0, "click"),
        mk(2, 5, "view"),
        mk(3, 5, "click"),            # same ts as 2, higher event_id
        mk(4, 10, "purchase", 10.0),  # -> click (event 3 wins the tie)
        mk(5, 100, "purchase", 5.0),  # 90 min after last touch -> none
        mk(6, 150, "view"),
        mk(7, 151, "purchase", 2.5),  # -> view
    ]
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    d = tmp_path / "wh"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")

    from local_stream_stack_spark.queries.events_ops import (
        attribution_last_touch,
    )

    got = {r.touch_type: r for r in
           attribution_last_touch(spark, str(d)).collect()}
    assert got["click"].n_purchases == 1
    assert got["click"].revenue_cents == 1000
    assert got["none"].n_purchases == 1
    assert got["none"].revenue_cents == 500
    assert got["view"].n_purchases == 1
    assert got["view"].revenue_cents == 250


def test_conversion_lag_quantiles_golden(spark, tmp_path):
    """Median/p90 lag over known 10/20/60-minute click->purchase
    pairs; touches older than 1h never convert."""
    import datetime as dt

    import pandas as pd

    t0 = dt.datetime(2024, 1, 1, 8, 0, 0)
    rows = []
    eid = 0

    def mk(minutes, etype, uid):
        nonlocal eid
        eid += 1
        return (eid, t0 + dt.timedelta(minutes=minutes), uid, etype, 1.0, "{}")

    for uid, lag in [(1, 10), (2, 20), (3, 60)]:
        rows.append(mk(0, "click", uid))
        rows.append(mk(lag, "purchase", uid))
    rows.append(mk(0, "click", 4))
    rows.append(mk(90, "purchase", 4))  # 90 min > tolerance -> dropped
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    d = tmp_path / "wh"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")

    from local_stream_stack_spark.queries.events_ops import (
        conversion_lag_quantiles,
    )

    rows_out = conversion_lag_quantiles(spark, str(d)).collect()
    assert len(rows_out) == 1
    r = rows_out[0]
    assert r.touch_type == "click" and r.n_conversions == 3
    assert r.p50_lag_us == 20 * 60 * 1_000_000
    # quantile_cont p90 over [10, 20, 60] min: 20 + 0.8*(60-20) = 52
    assert r.p90_lag_us == 52 * 60 * 1_000_000


def test_daily_count_anomalies_flags_spike_day(spark, tmp_path):
    import datetime as dt

    import pandas as pd

    rows = []
    eid = 0
    for day in range(10):
        n = 100 if day != 7 else 300  # the spike
        for k in range(n):
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, 1 + day, 8, 0, k % 60),
                         1, "click", 1.0, "{}"))
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    d = tmp_path / "wh"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")

    from local_stream_stack_spark.queries.events_ops import (
        daily_count_anomalies,
    )

    got = daily_count_anomalies(spark, str(d)).collect()
    assert [(r.day.isoformat(), r.n_events) for r in got] == [
        ("2024-01-08", 300)
    ]
    assert got[0].z_e4 > 20_000  # strongly positive z


def test_hourly_value_quantiles_golden(spark, tmp_path):
    import datetime as dt

    import pandas as pd

    rows = []
    for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 5.0]):
        rows.append((i, dt.datetime(2024, 1, 1, 9, i), 1, "view", v, "{}"))
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    d = tmp_path / "wh"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")

    from local_stream_stack_spark.queries.events_ops import (
        hourly_value_quantiles,
    )

    r = hourly_value_quantiles(spark, str(d)).collect()[0]
    assert r.hour_of_day == 9 and r.n_events == 5
    assert r.p50_value_e4 == 30_000
    # quantile_cont p90 over [1..5]: 1 + 0.9*4 = 4.6
    assert r.p90_value_e4 == 46_000


def test_value_histogram_log2_buckets(spark, tmp_path):
    import datetime as dt

    import pandas as pd

    vals = [0.0, 0.5, 1.0, 1.9, 2.0, 3.99, 4.0, 100.0]
    rows = [(i, dt.datetime(2024, 1, 1, 9, 0, i), 1, "view", v, "{}")
            for i, v in enumerate(vals)]
    pdf = pd.DataFrame(rows, columns=[
        "event_id", "ts", "user_id", "event_type", "value", "props"])
    d = tmp_path / "wh"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")

    from local_stream_stack_spark.queries.events_ops import (
        value_histogram_log2,
    )

    got = {r.bucket_log2: r.n_events for r in
           value_histogram_log2(spark, str(d)).collect()}
    assert got == {-9999: 1, -1: 1, 0: 2, 1: 2, 2: 1, 6: 1}


def test_asof_join_nearest_directions(spark):
    from local_stream_stack_spark.operators.events import asof_join_nearest

    left = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(20), 101), (2, _ts(15), 102),
         (3, _ts(30), 103)],
        "user_id int, ts timestamp, purchase_id int",
    )
    right = spark.createDataFrame(
        [(1, _ts(7), 900), (1, _ts(12), 901), (1, _ts(26), 902),
         (2, _ts(16), 903), (3, _ts(25), 904), (3, _ts(35), 905)],
        "user_id int, ts timestamp, view_id int",
    )
    out = asof_join_nearest(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["view_id"],
    )
    got = {
        (r.purchase_id, r.view_id, r.matched_direction)
        for r in out.collect()
    }
    # p@10: back@7 (3min) vs fwd@12 (2min) -> forward wins
    # p@20: back@12 (8min) vs fwd@26 (6min) -> forward wins
    # p@15 user2: no backward, fwd@16 -> forward
    # p@30 user3: back@25 (5min) vs fwd@35 (5min) -> TIE goes backward
    assert got == {
        (100, 901, "forward"),
        (101, 902, "forward"),
        (102, 903, "forward"),
        (103, 904, "backward"),
    }


def test_asof_join_nearest_tolerance_and_equal_ts(spark):
    from local_stream_stack_spark.operators.events import asof_join_nearest

    left = spark.createDataFrame(
        [(1, _ts(10), 1), (2, _ts(40), 2)],
        "user_id int, ts timestamp, purchase_id int",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 9), (2, _ts(0), 8)],
        "user_id int, ts timestamp, view_id int",
    )
    out = asof_join_nearest(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["view_id"], tolerance="INTERVAL 10 MINUTES",
    )
    by_id = {r.purchase_id: r for r in out.collect()}
    # equal-ts right row matches with gap 0, direction backward
    assert by_id[1].view_id == 9 and by_id[1].matched_direction == "backward"
    # 40-min gap exceeds tolerance: match AND direction are nulled
    assert by_id[2].view_id is None and by_id[2].matched_direction is None
