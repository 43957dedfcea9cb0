"""Round-3 training-data operators: behavior and plan-shape pins.

Value parity vs DuckDB is covered by the oracle gate
(tools/check_parity.py); these tests pin the engine-side properties
the oracle can't see — partition pruning in the scan plan, the
distributed global-shuffle position invariants, and determinism across
repartitionings.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from local_stream_stack_spark.queries.training_ops import (
    mad_outliers,
    partitioned_roundtrip_docs,
    perplexity_unigram,
    shuffle_deterministic,
    tfidf_top_terms,
)

SF = "/root/testdata/sf0.001"


def test_shuffle_deterministic_is_a_permutation(spark):
    out = shuffle_deterministic(spark, SF).collect()
    n = len(out)
    assert sorted(r.pos for r in out) == list(range(n))
    # position equals the rank in the md5 global order (spot-check by
    # recomputing with a single-partition window)
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    want = {
        r.doc_id: i
        for i, r in enumerate(
            d.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id").collect()
        )
    }
    got = {r.doc_id: r.pos for r in out}
    assert got == want


def test_shuffle_deterministic_repeatable(spark):
    # two independent plan builds + runs yield the identical permutation
    # (configure_for_oracle pins the session layout, so the md5 order
    # and bucket offsets cannot drift between epochs)
    a = {(r.doc_id, r.pos) for r in shuffle_deterministic(spark, SF).collect()}
    b = {(r.doc_id, r.pos) for r in shuffle_deterministic(spark, SF).collect()}
    assert a == b


def test_partitioned_roundtrip_prunes_partitions(spark):
    df = partitioned_roundtrip_docs(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the lang filter must be a partition-pruning decision, not a row filter
    assert "PartitionFilters: [" in plan
    assert "lang" in plan.split("PartitionFilters", 1)[1][:200]
    langs = {r.lang for r in df.select("lang").distinct().collect()}
    assert langs == {"en"}


def test_tfidf_rare_term_outranks_common(spark):
    rows = tfidf_top_terms(spark, SF).collect()
    assert rows, "expected top terms"
    # every language contributes exactly 10 ranked rows (or fewer only
    # if its vocabulary is smaller), ranks are 1..k without gaps
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.rk)
    for lang, rks in by_lang.items():
        assert rks == list(range(1, len(rks) + 1))
    # tfidf is non-increasing within a language
    for lang in by_lang:
        scores = [r.tfidf_e6 for r in rows if r.lang == lang]
        assert scores == sorted(scores, reverse=True)


def test_mad_outliers_flags_injected_spike(spark):
    # inject an extreme value via a temp view shadowing is not possible
    # through the query API; instead check invariants on real data:
    # every flagged score is > 6 and finite, ordered descending
    rows = mad_outliers(spark, SF).collect()
    scores = [r.mad_score_e4 / 1e4 for r in rows]
    assert all(s > 6.0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_perplexity_scores_are_positive_and_complete(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    rows = perplexity_unigram(spark, SF).collect()
    assert len(rows) == docs
    assert all(r.nll_per_token_e4 > 0 for r in rows)
    assert all(r.n_tokens > 0 for r in rows)


def test_embedding_quantize_error_bounded(spark):
    from local_stream_stack_spark.queries.training_ops import (
        embedding_quantize_int8,
    )

    rows = embedding_quantize_int8(spark, SF).collect()
    n_vecs = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert len(rows) == n_vecs
    # 8-bit quantization error per dim is <= (range/255/2)^2; ranges in
    # the synthetic data are O(1), so mean squared error (x1e6) stays
    # far below the trivial bound of (0.5)^2 * 1e6
    assert all(0 <= r.mse_e12 < 10_000 * 10**6 for r in rows)


def test_unicode_nfc_composes_suffix(spark):
    from local_stream_stack_spark.queries.training_ops import (
        unicode_nfc_normalize,
    )

    rows = unicode_nfc_normalize(spark, SF).collect()
    assert rows
    # every row got the decomposed suffix, so every row changed and
    # shortened by exactly the 3 combining marks it composed away
    assert all(r.changed for r in rows)
    assert all(r.len_before - r.len_after == 3 for r in rows)
    assert all("café" in r.normalized for r in rows)


def test_pagerank_tiny_graph_properties(spark):
    from local_stream_stack_spark.operators.graph import pagerank

    # star: 1->2, 3->2, 4->2; plus 2->1 back-edge. Node 2 must rank
    # highest, nodes 3/4 (no in-links) lowest and equal.
    edges = spark.createDataFrame(
        [(1, 2), (3, 2), (4, 2), (2, 1)], "src long, dst long"
    )
    rows = {r.node: float(r.rank) for r in pagerank(edges, iterations=15).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert abs(sum(rows.values()) - 1.0) < 1e-4  # HALF_UP bias accumulates ~iters*nodes*5e-13 + display rounding
    assert rows[2] == max(rows.values())
    assert rows[3] == rows[4] == min(rows.values())
    # deterministic across a re-run (integer scaled-BIGINT accumulation)
    again = {r.node: float(r.rank) for r in pagerank(edges, iterations=15).collect()}
    assert rows == again


def test_shingle_queries_tolerate_short_docs(spark, tmp_path):
    """Documents with fewer tokens than the shingle width must yield
    ZERO shingles, not crash: sequence(0, n-5) with n<5 is a
    DESCENDING index list in Spark and slice(start=0) throws. The
    oracle side (generate_series) already yields no grams for them."""
    from local_stream_stack_spark.queries.llm import (
        decontaminate_ngram_overlap,
    )
    from local_stream_stack_spark.queries.training_ops import (
        dedup_containment,
    )

    long_a = " ".join(f"tok{i}" for i in range(30))
    rows = [
        (1, "tiny"),                  # 1 token  < any shingle width
        (2, "just four small words"), # 4 tokens < 5-gram width
        (3, long_a),
        (4, long_a + " extra tail of shared words here"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = dedup_containment(spark, str(tmp_path)).collect()
    # the two long docs share all of long_a's 5-grams -> containment 1.0
    assert any(r.doc_a == 3 and r.doc_b == 4 for r in out)
    assert all(r.doc_a not in (1, 2) and r.doc_b not in (1, 2) for r in out)
    # 8-gram decontamination path: must run, short docs contribute nothing
    decontaminate_ngram_overlap(spark, str(tmp_path)).collect()


def test_expectations_single_scan_and_violation_semantics(spark):
    """All row rules must share ONE aggregate (one scan — adding rules
    adds no stages), and violation counts must follow the documented
    semantics on a frame with known defects."""
    from pyspark.sql import functions as F

    from local_stream_stack_spark.operators.quality import (
        expectations_report,
    )

    rows = [(1, 10.0), (2, -5.0), (2, 3.0), (None, 1.0)]
    df = spark.createDataFrame(rows, "k int, v double")
    out = {
        r.rule: r.n_violations
        for r in expectations_report(
            df,
            row_rules={
                "v_positive": ~(F.col("v") > 0),
                "k_not_null": F.col("k").isNull(),
            },
            unique_rules={"k_unique": ["k"]},
        ).collect()
    }
    # count_distinct ignores NULL keys: 4 rows, distinct {1, 2} = 2
    assert out == {"v_positive": 1, "k_not_null": 1, "k_unique": 2}
    # one scan: the row-rule plan contains exactly one FileScan-free
    # aggregate pair over the input (no per-rule re-aggregation)
    plan = (
        expectations_report(
            df, row_rules={"a": F.col("k").isNull(), "b": ~(F.col("v") > 0)}
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan ExistingRDD") == 1, plan


def test_lsh_candidates_bound_and_engine_deterministic(spark):
    """The semantic-dedup SCALE path: candidates are a small fraction
    of all pairs, and the verify stage consumes exactly the candidate
    set (never B(B+1)/2 block pairs)."""
    from local_stream_stack_spark.operators.similarity import (
        lsh_candidate_pairs_deterministic,
    )

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = e.count()
    cand = lsh_candidate_pairs_deterministic(
        e, id_col="vec_id", vec_col="embedding", dim=64,
        n_tables=8, n_planes=8,
    )
    n_cand = cand.count()
    all_pairs = n * (n - 1) // 2
    # candidate stage prunes >= 90% of the quadratic pair space
    assert 0 < n_cand < 0.10 * all_pairs, (n_cand, all_pairs)
    # deterministic: an independent plan build yields the identical set
    again = lsh_candidate_pairs_deterministic(
        e, id_col="vec_id", vec_col="embedding", dim=64,
        n_tables=8, n_planes=8,
    )
    assert {(r.id_a, r.id_b) for r in cand.collect()} == {
        (r.id_a, r.id_b) for r in again.collect()
    }


def test_semantic_dedup_lsh_verify_consumes_candidates_only(spark):
    """Verified edge set == exact-threshold pairs INTERSECT candidates:
    the verify stage is exact cosine on candidate pairs, and no
    quadratic block-pair scorer appears in its plan."""
    from local_stream_stack_spark.operators.similarity import (
        cosine,
        cosine_allpairs_threshold_blocked,
        lsh_candidate_pairs_deterministic,
    )

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    cand = lsh_candidate_pairs_deterministic(
        e, id_col="vec_id", vec_col="embedding", dim=64,
        n_tables=8, n_planes=8,
    )
    ea = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("__va"))
    eb = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("__vb"))
    verified = (
        cand.join(ea, "id_a").join(eb, "id_b")
        .filter(F.round(cosine(F.col("__va"), F.col("__vb")), 6) >= F.lit(0.40))
        .select("id_a", "id_b")
    )
    got = {(r.id_a, r.id_b) for r in verified.collect()}
    exact = {
        (r.id_a, r.id_b)
        for r in cosine_allpairs_threshold_blocked(
            e, id_col="vec_id", vec_col="embedding", threshold=0.40
        ).select("id_a", "id_b").collect()
    }
    cand_set = {(r.id_a, r.id_b) for r in cand.collect()}
    assert got == (exact & cand_set)
    assert len(got) > 0
    # plan shape: the verify stage is candidate-join-shaped - it never
    # routes through the block-pair scorer (FlatMapGroupsInPandas) and
    # the only Python stage is the Arrow bucket udf (ArrowEvalPython)
    plan = verified._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_bfs_hops_path_graph(spark):
    """On the path 1-2-3-4-5 seeded at 1, hops are the path indices
    and node 5 stays unreached at max_hops=3."""
    from local_stream_stack_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    seed = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.hop for r in bfs_hops(edges, seed, max_hops=3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}

    # undirected: seeding at 3 reaches both ends in 2 hops
    seed3 = spark.createDataFrame([(3,)], "node long")
    got3 = {r.node: r.hop for r in bfs_hops(edges, seed3, max_hops=3).collect()}
    assert got3 == {3: 0, 2: 1, 4: 1, 1: 2, 5: 2}
