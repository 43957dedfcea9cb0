"""Linear interpolation and inverted-index invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from local_stream_stack_spark.queries.events_ops import (
    gap_fill_locf,
    interpolate_linear,
)
from local_stream_stack_spark.queries.llm import inverted_index

SF = "/root/testdata/sf0.001"


def test_interpolation_brackets_and_matches_observations(spark):
    interp_rows = interpolate_linear(spark, SF).collect()
    # a user with no observations in the window stays null end-to-end
    interp = {
        (r.user_id, r.bucket_s): (
            None if r.v_interp_e6 is None else r.v_interp_e6 / 1e6
        )
        for r in interp_rows
    }
    raw = {
        (r.user_id, r.bucket_s): (r.v_raw, r.v_filled)
        for r in gap_fill_locf(spark, SF).collect()
    }
    assert set(interp) == set(raw)
    for key, (v_raw, _) in raw.items():
        if v_raw is not None:
            assert abs(interp[key] - v_raw) < 1e-5, key
    # interpolated values never escape the global observed range
    observed = [v for v, _ in raw.values() if v is not None]
    lo, hi = min(observed), max(observed)
    assert all(
        lo - 1e-6 <= v <= hi + 1e-6 for v in interp.values() if v is not None
    )
    # null interp only where the user never observed anything at all
    users_with_obs = {u for (u, _), (v, _) in raw.items() if v is not None}
    assert all(
        u not in users_with_obs
        for (u, _), v in interp.items()
        if v is None
    )


def test_inverted_index_df_and_postings(spark):
    rows = inverted_index(spark, SF).collect()
    assert rows
    d = spark.read.parquet(f"{SF}/documents.parquet")
    toks = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok"),
        )
        .filter(F.length("tok") > 0)
        .distinct()
    )
    direct = {
        r.tok: r.n for r in toks.groupBy("tok").agg(F.count("*").alias("n")).collect()
    }
    for r in rows:
        assert r.df == direct[r.tok], r.tok
        ids = [int(x) for x in r.postings.split(",")]
        assert ids == sorted(ids)
        assert len(ids) == min(r.df, 10)
