"""Connected components / dedup clusters: hand-computed fixtures for the
iterative (non-SQL-expressible) fixpoint."""

from __future__ import annotations

from hadoop_invertedindexer_spark.operators.clusters import (
    connected_components,
    dedup_clusters,
)


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4 (diameter > 1 forces multiple iterations),
    # pair 10-11, singleton 20 appears only via docs
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (10, 11)], ["id_a", "id_b"]
    )
    comps = {r.node: r.comp for r in connected_components(edges).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_dedup_clusters_maps_singletons_to_self(spark):
    edges = spark.createDataFrame([(2, 1), (3, 2)], ["id_a", "id_b"])
    docs = spark.createDataFrame([(i,) for i in range(1, 6)], ["doc_id"])
    out = {r.doc_id: r.keep_id for r in dedup_clusters(edges, docs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5}


def test_components_handle_cycles(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], ["id_a", "id_b"]
    )
    comps = {r.node: r.comp for r in connected_components(edges).collect()}
    assert set(comps.values()) == {1}


def test_fixed_round_schedule_matches_probed(spark):
    # fixed_iters >= diameter must give the identical labelling with zero
    # per-iteration driver probes; the chain 1-2-3-4-5 has diameter 4
    import pytest

    edges = spark.createDataFrame(
        [(2, 1), (3, 2), (4, 3), (5, 4), (10, 11)], ["id_a", "id_b"]
    )
    probed = {r.node: r.comp for r in connected_components(edges).collect()}
    fixed = {
        r.node: r.comp
        for r in connected_components(edges, fixed_iters=4).collect()
    }
    assert fixed == probed
    with pytest.raises(ValueError):
        connected_components(edges, fixed_iters=0)


def test_pagerank_validates_checkpoint_cadence(spark):
    import pytest

    from hadoop_invertedindexer_spark.operators.graph import pagerank

    edges = spark.createDataFrame([(1, 2), (2, 1)], ["src", "dst"])
    with pytest.raises(ValueError):
        pagerank(edges, checkpoint_every=0)


def test_cluster_canonical_keeps_best_scoring_member(spark):
    """Planted cluster {1,2,3} with scores 5/9/9: doc 2 wins (max score,
    tie broken by min id); singleton 4 keeps itself."""
    from hadoop_invertedindexer_spark.operators.clusters import cluster_canonical

    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    docs = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (4, 7)], ["doc_id", "n_chars"]
    )
    out = {
        r.cluster_id: (r.canonical_id, r.n_members, r.canonical_n_chars)
        for r in cluster_canonical(pairs, docs).collect()
    }
    assert out[1] == (2, 3, 9)
    assert out[4] == (4, 1, 7)
    assert len(out) == 2


def test_fixed_round_residual_extend_is_exact_past_schedule(spark):
    """VERDICT r5 item 3: a chain deeper than the fixed schedule used to
    silently return partially-propagated labels; the default residual
    check must extend until every edge's endpoints agree."""
    chain = [(i + 1, i) for i in range(1, 10)]  # 1-...-10, diameter 9
    edges = spark.createDataFrame(chain, ["id_a", "id_b"])
    comps = {
        r.node: r.comp
        for r in connected_components(edges, fixed_iters=2).collect()
    }
    assert comps == {i: 1 for i in range(1, 11)}


def test_fixed_round_residual_raise_detects_shallow_schedule(spark):
    import pytest

    chain = [(i + 1, i) for i in range(1, 10)]
    edges = spark.createDataFrame(chain, ["id_a", "id_b"])
    with pytest.raises(ValueError, match="diameter"):
        connected_components(
            edges, fixed_iters=2, on_residual="raise"
        ).collect()


def test_fixed_round_residual_ignore_reproduces_old_behavior(spark):
    chain = [(i + 1, i) for i in range(1, 10)]
    edges = spark.createDataFrame(chain, ["id_a", "id_b"])
    comps = {
        r.node: r.comp
        for r in connected_components(
            edges, fixed_iters=2, on_residual="ignore"
        ).collect()
    }
    assert len(set(comps.values())) > 1  # not yet converged, as scheduled
