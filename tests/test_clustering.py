"""Distributed quantized k-means (operators/clustering) invariants:
partition-invariance (the integer-exact contract), member
conservation, improvement over the seed assignment, and query-level
determinism. Cross-engine exactness is covered by the
``kmeans_embeddings`` oracle (unrolled-CTE Lloyd replay)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from local_stream_stack_spark.operators.clustering import (
    kmeans_lloyd_quantized,
    quantize_vectors,
)
from local_stream_stack_spark.queries import QUERIES


@pytest.fixture(scope="module")
def fixture_vecs(spark):
    """12 two-ish-cluster vectors in 4 dims, values in [-1, 1]."""
    rows = []
    for i in range(6):
        rows.append((i, [0.8 + 0.01 * i, 0.7, -0.2, 0.1 * i]))
    for i in range(6, 12):
        rows.append((i, [-0.9, -0.5 - 0.01 * i, 0.6, -0.1]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_kmeans_partition_invariance(spark, fixture_vecs):
    def run(nparts):
        vecs = quantize_vectors(
            fixture_vecs.repartition(nparts), "vec_id", "embedding"
        )
        return sorted(
            tuple(r) for r in kmeans_lloyd_quantized(vecs, k=3, iterations=2).collect()
        )

    assert run(1) == run(7)


def test_kmeans_members_conserved(spark, fixture_vecs):
    vecs = quantize_vectors(fixture_vecs, "vec_id", "embedding")
    out = kmeans_lloyd_quantized(vecs, k=3, iterations=2).collect()
    assert sum(r.n_members for r in out) == 12
    assert len(out) <= 3
    assert all(r.inertia >= 0 for r in out)
    assert all(0 <= r.cluster < 3 for r in out)


def test_kmeans_improves_over_seed_assignment(spark, fixture_vecs):
    """3 Lloyd rounds must not end worse than assigning straight to the
    raw seeds (iterations=0 = final assignment on the seed centroids)."""
    vecs = quantize_vectors(fixture_vecs, "vec_id", "embedding")

    def total_inertia(iterations):
        out = kmeans_lloyd_quantized(vecs, k=3, iterations=iterations)
        return out.agg(F.sum("inertia")).collect()[0][0]

    assert total_inertia(3) <= total_inertia(0)


def test_kmeans_query_deterministic(spark, sf_dir):
    run = lambda: QUERIES["kmeans_embeddings"].fn(spark, sf_dir)  # noqa: E731
    a = [tuple(r) for r in run().collect()]
    b = [tuple(r) for r in run().collect()]
    assert a == b
    assert sum(r[1] for r in a) == 500  # sf0.001 embeddings corpus


def test_kmeans_k_exceeds_corpus(spark):
    """k larger than the corpus: every vector seeds its own cluster,
    extra clusters never materialize, members conserved."""
    vecs = quantize_vectors(
        spark.createDataFrame(
            [(0, [0.5, 0.5]), (1, [-0.5, 0.2]), (2, [0.1, -0.9])],
            "vec_id long, embedding array<double>",
        ),
        "vec_id",
        "embedding",
    )
    out = kmeans_lloyd_quantized(vecs, k=5, iterations=2).collect()
    assert sum(r.n_members for r in out) == 3
    assert len(out) <= 3


def test_split_subspaces_reassembles_to_full_vector(spark, fixture_vecs):
    from local_stream_stack_spark.operators.clustering import (
        split_subspaces,
    )

    vecs = quantize_vectors(fixture_vecs, "vec_id", "embedding")
    full = {r.id: list(r.x) for r in vecs.collect()}
    sub = split_subspaces(vecs, m_sub=2, dim=4).collect()
    seen = {}
    for r in sub:
        assert len(r.x) == 2
        seen.setdefault(r.id, {})[r.g] = list(r.x)
    for rid, parts in seen.items():
        assert sorted(parts) == [0, 1]
        assert parts[0] + parts[1] == full[rid]


def test_kmeans_grouped_partition_invariance(spark, fixture_vecs):
    from local_stream_stack_spark.operators.clustering import (
        kmeans_lloyd_grouped,
        split_subspaces,
    )

    def run(nparts):
        vecs = quantize_vectors(
            fixture_vecs.repartition(nparts), "vec_id", "embedding"
        )
        sub = split_subspaces(vecs, m_sub=2, dim=4)
        cent = kmeans_lloyd_grouped(sub, k=2, iterations=2)
        return sorted(
            (r.g, r.c, tuple(r.m)) for r in cent.collect()
        )

    assert run(1) == run(5)
