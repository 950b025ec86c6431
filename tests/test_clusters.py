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


# ---------------------------------------------------- alternating-star CC


def _cc_star(spark, edge_list, **kw):
    from hadoop_invertedindexer_spark.operators.clusters import (
        connected_components_star,
    )

    edges = spark.createDataFrame(edge_list, ["id_a", "id_b"])
    return {
        r.node: r.comp for r in connected_components_star(edges, **kw).collect()
    }


def test_star_cc_chain_islands_and_cycles(spark):
    comps = _cc_star(spark, [(2, 1), (2, 3), (4, 3), (10, 11)])
    assert comps == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    comps = _cc_star(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    assert set(comps.values()) == {1}


def test_star_cc_long_chain_in_log_rounds(spark):
    """The algorithm's reason to exist: a 64-node chain (diameter 63,
    where hash-min needs 63 rounds) resolves within the default 6
    alternations — O(log n), verified with on_residual='raise' so a
    silent shortfall cannot pass."""
    chain = [(i, i + 1) for i in range(1, 64)]
    comps = _cc_star(spark, chain, rounds=6, on_residual="raise")
    assert comps == {i: 1 for i in range(1, 65)}


def test_star_cc_extends_past_shallow_schedule(spark):
    chain = [(i, i + 1) for i in range(1, 40)]
    comps = _cc_star(spark, chain, rounds=1)  # extend (default) fixes it
    assert comps == {i: 1 for i in range(1, 41)}


def test_star_cc_matches_hashmin_on_random_graphs(spark):
    """Property: identical labelling to the probed hash-min resolver on
    seeded pseudo-random graphs (several densities)."""
    import random

    for seed, n, m in [(1, 30, 20), (2, 50, 60), (3, 40, 10)]:
        rng = random.Random(seed)
        edge_list = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        edge_list = [(a, b) for a, b in edge_list if a != b] or [(0, 1)]
        edges = spark.createDataFrame(edge_list, ["id_a", "id_b"])
        from hadoop_invertedindexer_spark.operators.clusters import (
            connected_components_star,
        )

        probed = {
            r.node: r.comp for r in connected_components(edges).collect()
        }
        star = {
            r.node: r.comp
            for r in connected_components_star(edges).collect()
        }
        assert star == probed, f"seed={seed}"


def test_dedup_clusters_star_algorithm_matches(spark):
    edges = spark.createDataFrame([(2, 1), (3, 2), (9, 8)], ["id_a", "id_b"])
    docs = spark.createDataFrame([(i,) for i in range(1, 11)], ["doc_id"])
    a = {r.doc_id: r.keep_id for r in dedup_clusters(edges, docs).collect()}
    b = {
        r.doc_id: r.keep_id
        for r in dedup_clusters(edges, docs, algorithm="star").collect()
    }
    assert a == b
