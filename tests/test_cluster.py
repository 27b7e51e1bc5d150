"""Near-dup clustering: connected components + representative pick."""

from __future__ import annotations

import pytest

from multi_task_offensive_language_detection_spark.operators import cluster


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "k1 long, k2 long")
    return {
        r["node"]: r["comp"]
        for r in cluster.connected_components(df, **kw).collect()
    }


def test_chain_collapses_to_min_label(spark):
    # 1-2-3-4-5 chain: diameter 4, multi-hop propagation required
    out = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_star_and_disjoint_components(spark):
    out = _cc(spark, [(10, 11), (10, 12), (10, 13), (20, 21), (30, 31)])
    assert out == {10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 20, 30: 30, 31: 30}


def test_edge_direction_is_irrelevant(spark):
    assert _cc(spark, [(5, 1), (3, 5)]) == {1: 1, 3: 1, 5: 1}


def test_nonconvergence_raises_with_bound(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, [(i, i + 1) for i in range(1, 10)], max_iters=2)


def test_keep_best_per_cluster(spark):
    docs = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.7), (4, 0.9), (9, 0.1)],
        "doc_id long, quality double",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (2, 4)], "k1 long, k2 long")
    kept = {
        r["doc_id"]: r["quality"]
        for r in cluster.keep_best_per_cluster(
            docs, pairs, "doc_id", "quality"
        ).collect()
    }
    # component {1,2,3,4}: best quality 0.9 tie between 2 and 4 → min key 2
    assert kept == {2: 0.9, 9: 0.1}
    # quality-less form: min key wins
    kept2 = sorted(
        r["doc_id"]
        for r in cluster.keep_best_per_cluster(docs, pairs, "doc_id").collect()
    )
    assert kept2 == [1, 9]
