"""Column profiling, KL drift, n-gram decontamination — invariants on
the sf0.001 tables (sf0.01 oracle parity covers exact values)."""

from __future__ import annotations

from pyspark.sql import functions as F

from local_stream_stack_spark.queries.llm import (
    decontaminate_ngram_overlap,
    token_drift_kl,
)
from local_stream_stack_spark.queries.relational_ext import profile_columns

SF = "/root/testdata/sf0.001"


def test_profile_matches_direct_aggregates(spark):
    prof = {r.col_name: r for r in profile_columns(spark, SF).collect()}
    o = spark.read.parquet(f"{SF}/orders.parquet")
    n = o.count()
    assert set(prof) == {
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "o_orderdate",
        "o_orderstatus",
        "o_orderpriority",
    }
    for c, r in prof.items():
        direct_nulls = o.filter(F.col(c).isNull()).count()
        direct_distinct = o.select(c).na.drop().distinct().count()
        assert r.n_nulls == direct_nulls, c
        assert r.n_distinct == direct_distinct, c
        assert r.n_nulls + r.n_distinct <= n + r.n_nulls
    # typed min/max populated on the right side only
    assert prof["o_orderkey"].min_num is not None
    assert prof["o_orderkey"].min_str is None
    assert prof["o_orderstatus"].min_str is not None
    assert prof["o_orderstatus"].min_num is None


def test_kl_nonnegative_and_complete(spark):
    rows = token_drift_kl(spark, SF).collect()
    sources = {
        r.source
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("source")
        .distinct()
        .collect()
    }
    assert {r.source for r in rows} == sources
    # Gibbs' inequality holds up to the 6-dp rounding
    assert all(r.kl_e6 >= -1 for r in rows)


def test_ngram_overlap_is_eval_side_only(spark):
    rows = decontaminate_ngram_overlap(spark, SF).collect()
    d = spark.read.parquet(f"{SF}/documents.parquet")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 100
    )
    eval_ids = {
        r.doc_id for r in d.select("doc_id", bucket.alias("b")).filter("b >= 95").collect()
    }
    assert all(r.eval_doc_id in eval_ids for r in rows)
    assert all(r.n_shared_ngrams >= 1 for r in rows)
