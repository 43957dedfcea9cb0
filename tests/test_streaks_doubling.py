"""Path-doubling streak histogram (active_streaks_doubling): the
doubling invariant len_k(d) = min(run(d), k) must reproduce the
recursive twin and a plain-Python reference on gappy synthetic
calendars — the sf tables' dense calendar only ever exercises the
one-giant-run case, so these pins cover starts/gaps/cap interactions
the registered data can't."""

from __future__ import annotations

import datetime
import random

import pandas as pd

from local_stream_stack_spark.queries.extensions import (
    active_streaks_doubling,
)


def _write_orders(tmp_path, day_offsets):
    base = datetime.date(1995, 3, 1)
    pdf = pd.DataFrame(
        {
            "o_orderkey": range(len(day_offsets)),
            "o_orderdate": [
                base + datetime.timedelta(days=d) for d in day_offsets
            ],
        }
    )
    d = tmp_path
    pdf.to_parquet(d / "orders.parquet")
    return str(d)


def _reference_hist(day_offsets, cap=12):
    days = sorted(set(day_offsets))
    sdays = set(days)
    hist: dict[int, int] = {}
    for d in days:
        if d - 1 in sdays:
            continue  # not a streak start
        run = 0
        while d + run in sdays:
            run += 1
        ln = min(run, cap)
        hist[ln] = hist.get(ln, 0) + 1
    return hist


def _run(spark, sf_dir):
    return {
        int(r.streak_len): int(r.n_streaks)
        for r in active_streaks_doubling(spark, sf_dir).collect()
    }


def test_doubling_matches_reference_on_crafted_gaps(spark, tmp_path):
    # runs of length 1, 3, 5, 12-exact, 13 (clamps to 12), and a
    # duplicate-date run (distinct collapses it)
    offs = (
        [0]
        + [10, 11, 12]
        + [20, 21, 22, 23, 24]
        + list(range(40, 52))            # 12 exactly
        + list(range(60, 73))            # 13 -> clamped
        + [100, 100, 101, 101]           # duplicates
    )
    sf = _write_orders(tmp_path, offs)
    assert _run(spark, sf) == _reference_hist(offs)
    # expected explicitly: 1->1, 3->1, 5->1, 12->2 (the exact-12 and
    # the clamped-13), 2->1
    assert _reference_hist(offs) == {1: 1, 3: 1, 5: 1, 12: 2, 2: 1}


def test_doubling_matches_reference_on_random_calendars(spark, tmp_path):
    rng = random.Random(13)
    for trial in range(3):
        offs = sorted(rng.sample(range(0, 120), 55))
        sub = tmp_path / f"t{trial}"
        sub.mkdir()
        sf = _write_orders(sub, offs)
        assert _run(spark, sf) == _reference_hist(offs), offs
