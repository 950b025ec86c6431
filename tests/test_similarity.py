"""Similarity search: brute-force is oracle-checked in the contract; here
the IVF path is validated by recall against brute force on real data."""

from __future__ import annotations

import pyspark.sql.functions as F

from hadoop_invertedindexer_spark.operators import similarity
from hadoop_invertedindexer_spark.sources.tables import read_table


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    cents = similarity.centroids_by_sampling(emb, every=50)
    bf = similarity.cosine_topk_bruteforce(emb, queries, k=10)
    ivf = similarity.cosine_topk_ivf(emb, queries, cents, k=10, nprobe=4)

    bf_sets: dict[int, set[int]] = {}
    for r in bf.collect():
        bf_sets.setdefault(r.qid, set()).add(r.vec_id)
    ivf_sets: dict[int, set[int]] = {}
    for r in ivf.collect():
        ivf_sets.setdefault(r.qid, set()).add(r.vec_id)

    recalls = [
        len(bf_sets[q] & ivf_sets.get(q, set())) / len(bf_sets[q]) for q in bf_sets
    ]
    mean_recall = sum(recalls) / len(recalls)
    # nprobe=4 of ~10 buckets: reasonable recall with a 40% compute budget
    assert mean_recall >= 0.5, f"IVF mean recall {mean_recall:.2f} too low"


def _recall(corpus, cents, nprobe, qmod=37):
    queries = corpus.where(F.col("vec_id") % qmod == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    bf = similarity.cosine_topk_bruteforce(corpus, queries, k=10)
    ivf = similarity.cosine_topk_ivf(corpus, queries, cents, k=10, nprobe=nprobe)
    bf_sets: dict[int, set[int]] = {}
    for r in bf.collect():
        bf_sets.setdefault(r.qid, set()).add(r.vec_id)
    ivf_sets: dict[int, set[int]] = {}
    for r in ivf.collect():
        ivf_sets.setdefault(r.qid, set()).add(r.vec_id)
    recalls = [
        len(bf_sets[q] & ivf_sets.get(q, set())) / len(bf_sets[q]) for q in bf_sets
    ]
    return sum(recalls) / len(recalls)


def test_kmeans_improves_distortion_on_real_embeddings(spark, sf_dir):
    """Lloyd's objective: mean cosine of each vector to its assigned
    centroid must strictly improve over the sampled init (measured
    0.216 -> 0.282 on the synthetic table; asserted with margin)."""
    from hadoop_invertedindexer_spark.operators.dedup import cosine_expr

    emb = read_table(spark, sf_dir, "embeddings")
    sampled = similarity.centroids_by_sampling(emb, every=50)
    refined = similarity.centroids_kmeans(emb, init=sampled, n_iters=3)

    def distortion(cents):
        a = similarity.ivf_assign(emb, cents).join(cents, "cid")
        return a.select(
            F.avg(cosine_expr(F.col("embedding"), F.col("cvec"))).alias("d")
        ).first().d

    d_sampled, d_kmeans = distortion(sampled), distortion(refined)
    assert d_kmeans > d_sampled + 0.01, (d_sampled, d_kmeans)
    # and the refined centroids must not crater recall on well-spread data
    # (floor 0.8: nprobe=4 of ~10 buckets; sampled init scores ~0.86-0.98
    # across sf dirs, refined stays within noise of it)
    assert _recall(emb, refined, nprobe=4, qmod=100) >= 0.8


def test_kmeans_recall_beats_sampling_on_id_correlated_corpus(spark):
    """The case sampling can't survive: ids correlate with content (one
    homogeneous source owns every id the every=50 sampler picks), so all
    sampled centroids are near-identical and bucket assignment for the
    rest of the corpus is noise. Lloyd iterations specialize the
    centroids to the real clusters (measured: nprobe=1 recall
    0.62 -> 0.99, nprobe=2 0.85 -> 1.0)."""
    import random

    rng = random.Random(3)
    dim, rows = 16, []
    base_a = [rng.gauss(0, 1) for _ in range(dim)]
    for i in range(0, 500, 50):
        rows.append((i, [float(b + rng.gauss(0, 0.05)) for b in base_a]))
    other_ids = [i for i in range(500) if i % 50 != 0]
    for c in range(8):
        base = [rng.gauss(0, 1) for _ in range(dim)]
        for _ in range(61):
            if not other_ids:
                break
            rows.append(
                (other_ids.pop(0), [float(b + rng.gauss(0, 0.3)) for b in base])
            )
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    sampled = similarity.centroids_by_sampling(emb, every=50)
    refined = similarity.centroids_kmeans(emb, init=sampled, n_iters=3)
    r_sampled = _recall(emb, sampled, nprobe=2)
    r_kmeans = _recall(emb, refined, nprobe=2)
    assert r_kmeans >= r_sampled + 0.1, (r_sampled, r_kmeans)
    assert r_kmeans >= 0.95, r_kmeans


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    """A centroid that attracts no members must survive the iteration
    unchanged (stable bucket layout), not drop out or go null."""
    # two tight clusters far apart + one centroid placed orthogonally so
    # it never wins an assignment
    rows = [(i, [10.0, 0.0, 0.0]) for i in range(5)]
    rows += [(10 + i, [0.0, 10.0, 0.0]) for i in range(5)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    init = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]), (2, [0.0, 0.0, 1.0])],
        ["cid", "cvec"],
    )
    out = {
        r.cid: list(r.cvec)
        for r in similarity.centroids_kmeans(emb, init=init, n_iters=2).collect()
    }
    assert set(out) == {0, 1, 2}
    assert out[2] == [0.0, 0.0, 1.0]  # untouched
    assert out[0][0] > 9.9 and out[1][1] > 9.9  # moved to cluster means


def test_lsh_recovers_planted_near_duplicates(spark):
    """Planted clusters: 8 base directions, 5 tiny perturbations each.
    Same-cluster vectors have cosine ~1 (angle ~0), so single-probe
    hyperplane buckets keep them together with prob (1 - θ/π)^nbits ≈ 1;
    the LSH top-k must rank same-cluster members first."""
    import random

    rng = random.Random(7)
    dim, rows = 16, []
    for cluster in range(8):
        base = [rng.gauss(0, 1) for _ in range(dim)]
        for member in range(5):
            vec = [b + rng.gauss(0, 0.01) for b in base]
            rows.append((cluster * 10 + member, [float(x) for x in vec]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = emb.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = similarity.cosine_topk_lsh(emb, queries, k=4, nbits=8)
    got: dict[int, set[int]] = {}
    for r in out.collect():
        got.setdefault(r.qid, set()).add(r.vec_id)
    for cluster in range(8):
        qid = cluster * 10
        expected = {qid + m for m in range(1, 5)}
        assert got.get(qid) == expected, f"cluster {cluster}: {got.get(qid)}"


def test_lsh_matches_bruteforce_within_bucket_budget(spark, sf_dir):
    """On the near-orthogonal synthetic table, low-nbits LSH still returns
    k well-formed rows per query and never exceeds cosine bounds."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = similarity.cosine_topk_lsh(emb, queries, k=10, nbits=2)
    per_q = out.groupBy("qid").count().collect()
    assert per_q and all(r["count"] <= 10 for r in per_q)
    assert (
        out.where((F.col("cosine") > 1.000001) | (F.col("cosine") < -1.000001)).count()
        == 0
    )


def test_bruteforce_topk_shape(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = similarity.cosine_topk_bruteforce(emb, queries, k=10)
    per_q = out.groupBy("qid").count().collect()
    assert all(r["count"] == 10 for r in per_q)
    assert out.where((F.col("cosine") > 1.000001) | (F.col("cosine") < -1.000001)).count() == 0


def test_lsh_and_neardup_empty_corpus_returns_empty(spark):
    """Empty input must yield an empty result, not a driver TypeError
    from dimension probing."""
    from pyspark.sql import types as T

    from hadoop_invertedindexer_spark.operators.dedup import embedding_near_dup_pairs

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    empty = spark.createDataFrame([], schema)
    queries = empty.select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    assert similarity.cosine_topk_lsh(empty, queries, k=3, nbits=4).count() == 0
    assert embedding_near_dup_pairs(empty, threshold=0.9).count() == 0


def test_persisted_ivf_index_matches_inmemory_and_prunes(spark, sf_dir, tmp_path):
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    cents = similarity.centroids_by_sampling(emb, every=50)
    path = str(tmp_path / "ivf")
    similarity.build_ivf_index(emb, cents, path)

    direct = similarity.cosine_topk_ivf(emb, queries, cents, k=5, nprobe=3)
    disk = similarity.query_ivf_index(spark, path, queries, k=5, nprobe=3)
    canon = lambda df: sorted(map(tuple, df.toPandas().sort_index(axis=1).values.tolist()))  # noqa: E731
    assert canon(disk) == canon(direct)

    # the probed-bucket join must prune partitions dynamically: only
    # ~nprobe*|Q| bucket dirs are read, not the whole index
    plan = disk._jdf.queryExecution().executedPlan().toString()
    # (the index scan is identified by its _cnorm column — the Location
    # field is truncated at 100 chars, so the path may not be visible)
    scan = next(
        ln for ln in plan.splitlines()
        if "FileScan" in ln and "_cnorm" in ln
    )
    assert "dynamicpruning" in scan.lower()


def test_quantization_roundtrip_error_bounded(spark, sf_dir):
    """Dequantized vectors stay close: per-element error <= scale/2, and
    cosine(original, dequantized) > 0.999 for every vector; the zero
    vector roundtrips exactly."""
    from hadoop_invertedindexer_spark.operators.dedup import cosine_expr
    from hadoop_invertedindexer_spark.operators.similarity import (
        dequantize_embeddings,
        quantize_embeddings,
    )
    from hadoop_invertedindexer_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    zero_dim = emb.select(F.size("embedding").alias("d")).first().d
    zero = spark.createDataFrame(
        [(999_999, [0.0] * zero_dim, 0)], "vec_id long, embedding array<float>, label int"
    )
    emb = emb.unionByName(zero)

    deq = dequantize_embeddings(quantize_embeddings(emb)).join(
        emb.select("vec_id", F.col("embedding").alias("orig")), "vec_id"
    )
    stats = deq.select(
        F.array_max(
            F.zip_with("embedding", "orig", lambda a, b: F.abs(a - b))
        ).alias("max_err"),
        F.col("scale"),
        F.when(
            F.col("scale") > 0, cosine_expr(F.col("embedding"), F.col("orig"))
        ).otherwise(F.lit(1.0)).alias("cos"),
    ).collect()
    for r in stats:
        assert r.max_err <= r.scale / 2 + 1e-6, (r.max_err, r.scale)
        assert r.cos > 0.999, r.cos


def test_quantization_tiny_vector_scale_is_consistent_divisor(spark):
    """For max|x| below the clamp, the emitted scale IS the divisor used
    for q, so dequantization honors the error bound; the zero vector
    stays exactly zero with scale 0."""
    from hadoop_invertedindexer_spark.operators.similarity import (
        dequantize_embeddings,
        quantize_embeddings,
    )

    emb = spark.createDataFrame(
        [(1, [1e-28, 5e-29]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in dequantize_embeddings(quantize_embeddings(emb))
            .collect()}
    assert rows[2].scale == 0.0 and list(rows[2].embedding) == [0.0, 0.0]
    tiny = rows[1]
    assert tiny.scale >= 1e-30
    for orig, deq in zip([1e-28, 5e-29], tiny.embedding):
        assert abs(orig - deq) <= tiny.scale / 2 * 1.01, (orig, deq, tiny.scale)


def test_persisted_lsh_index_matches_inmemory_and_prunes(spark, sf_dir, tmp_path):
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    path = str(tmp_path / "lsh")
    similarity.build_lsh_index(emb, path, nbits=4, ntables=3, dim=64)

    direct = similarity.cosine_topk_lsh(emb, queries, k=5, nbits=4, ntables=3, dim=64)
    disk = similarity.query_lsh_index(spark, path, queries, k=5)
    canon = lambda df: sorted(map(tuple, df.toPandas().sort_index(axis=1).values.tolist()))  # noqa: E731
    assert canon(disk) == canon(direct)

    # the bucket join must prune partitions dynamically: only the bucket
    # dirs the broadcast query side collides with are read
    plan = disk._jdf.queryExecution().executedPlan().toString()
    scan = next(
        ln for ln in plan.splitlines()
        if "FileScan" in ln and "_cnorm" in ln
    )
    assert "dynamicpruning" in scan.lower()


def test_lsh_index_append_matches_rebuild(spark, sf_dir, tmp_path):
    """Daily-ingest path: build from 90% of the corpus, append the other
    10% — queries against the appended index must equal queries against
    an index built from the full corpus in one shot."""
    emb = read_table(spark, sf_dir, "embeddings")
    old = emb.where(F.col("vec_id") % 10 != 0)
    batch = emb.where(F.col("vec_id") % 10 == 0)
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )

    inc_path = str(tmp_path / "lsh_inc")
    similarity.build_lsh_index(old, inc_path, nbits=4, ntables=2, dim=64)
    similarity.append_lsh_index(batch, inc_path)

    full_path = str(tmp_path / "lsh_full")
    similarity.build_lsh_index(emb, full_path, nbits=4, ntables=2, dim=64)

    canon = lambda df: sorted(map(tuple, df.toPandas().sort_index(axis=1).values.tolist()))  # noqa: E731
    inc = similarity.query_lsh_index(spark, inc_path, queries, k=5)
    full = similarity.query_lsh_index(spark, full_path, queries, k=5)
    assert canon(inc) == canon(full)


def test_ivf_index_append_matches_rebuild(spark, sf_dir, tmp_path):
    """IVF daily-ingest: build from 90% of the corpus, append the other
    10% against the frozen centroids — queries must equal an index built
    from the full corpus with the SAME centroid table (assignment is
    per-row against fixed centroids, so append-vs-rebuild is exact)."""
    emb = read_table(spark, sf_dir, "embeddings")
    old = emb.where(F.col("vec_id") % 10 != 0)
    batch = emb.where(F.col("vec_id") % 10 == 0)
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    cents = similarity.centroids_by_sampling(emb, every=50)

    inc_path = str(tmp_path / "ivf_inc")
    similarity.build_ivf_index(old, cents, inc_path)
    similarity.append_ivf_index(batch, inc_path)

    full_path = str(tmp_path / "ivf_full")
    similarity.build_ivf_index(emb, cents, full_path)

    canon = lambda df: sorted(map(tuple, df.toPandas().sort_index(axis=1).values.tolist()))  # noqa: E731
    inc = similarity.query_ivf_index(spark, inc_path, queries, k=5, nprobe=3)
    full = similarity.query_ivf_index(spark, full_path, queries, k=5, nprobe=3)
    assert canon(inc) == canon(full)


def test_pq_codes_shape_and_determinism(spark, sf_dir):
    """Every vector gets exactly m codes, each in [0, ksub); two builds
    of the same codebooks/codes are identical (exact integer pipeline —
    no fp nondeterminism to round away)."""
    emb = read_table(spark, sf_dir, "embeddings")
    cb = similarity.pq_codebooks(emb, m=8, ksub=16, dim=64)
    assert cb.count() == 8 * 16
    enc = similarity.pq_encode(emb, cb, m=8, dim=64)
    rows = enc.collect()
    assert len(rows) == emb.count()
    for r in rows:
        assert len(r.codes) == 8
        assert all(0 <= c < 16 for c in r.codes)
    again = {
        r.vec_id: r.codes
        for r in similarity.pq_encode(
            emb, similarity.pq_codebooks(emb, m=8, ksub=16, dim=64), m=8, dim=64
        ).collect()
    }
    assert {r.vec_id: r.codes for r in rows} == again


def test_pq_adc_recovers_planted_near_duplicates(spark):
    """Planted clusters (as in the LSH test): a vector's tiny
    perturbations share all m subspace codewords, so their ADC distance
    is ~0 and they must fill the top ranks — the lossy compression keeps
    near-duplicate structure."""
    import random

    rng = random.Random(11)
    dim, rows = 16, []
    for cluster in range(8):
        base = [rng.gauss(0, 1) for _ in range(dim)]
        for member in range(5):
            vec = [b + rng.gauss(0, 0.005) for b in base]
            rows.append((cluster * 10 + member, [float(x) for x in vec]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = emb.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    # ksub=16 codewords from the first 16 vectors spans clusters 0-3;
    # perturbed members still snap to the same codeword per subspace
    cb = similarity.pq_codebooks(emb, m=4, ksub=16, dim=16)
    enc = similarity.pq_encode(emb, cb, m=4, dim=16)
    out = similarity.pq_adc_topk(enc, cb, queries, k=4, m=4, dim=16)
    got: dict[int, set[int]] = {}
    for r in out.collect():
        got.setdefault(r.qid, set()).add(r.vec_id)
    for cluster in range(8):
        qid = cluster * 10
        expected = {qid + m for m in range(1, 5)}
        assert got.get(qid) == expected, f"cluster {cluster}: {got.get(qid)}"


def test_pq_adc_recall_vs_bruteforce(spark, sf_dir):
    """On the real near-orthogonal synthetic embeddings, ADC top-10 must
    overlap the exact cosine top-10 meaningfully despite the 32x
    compression (codes are a lossy 8-byte sketch of 256-byte vectors).
    Note ADC ranks by L2 on quantized vectors while brute force ranks by
    cosine — for this unnormalized corpus a loose floor is the honest
    bound; the planted-dup test pins the sharp behavior."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    cb = similarity.pq_codebooks(emb, m=8, ksub=16, dim=64)
    enc = similarity.pq_encode(emb, cb, m=8, dim=64)
    adc = similarity.pq_adc_topk(enc, cb, queries, k=10, m=8, dim=64)
    bf = similarity.cosine_topk_bruteforce(emb, queries, k=10)
    bf_sets: dict[int, set[int]] = {}
    for r in bf.collect():
        bf_sets.setdefault(r.qid, set()).add(r.vec_id)
    adc_sets: dict[int, set[int]] = {}
    for r in adc.collect():
        adc_sets.setdefault(r.qid, set()).add(r.vec_id)
    recalls = [
        len(bf_sets[q] & adc_sets.get(q, set())) / len(bf_sets[q])
        for q in bf_sets
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.1, f"PQ-ADC mean recall {mean_recall:.2f} too low"


def test_knn_classify_planted_clusters_perfect(spark):
    """Tight planted clusters with one label per cluster: majority vote
    over exact top-4 neighbors must recover every cluster label, via
    both the brute-force and the PQ-ADC neighbor backends (the vote
    layer is backend-agnostic)."""
    import random

    rng = random.Random(3)
    dim, rows = 16, []
    for cluster in range(8):
        base = [rng.gauss(0, 1) for _ in range(dim)]
        for member in range(5):
            vec = [b + rng.gauss(0, 0.005) for b in base]
            rows.append((cluster * 10 + member, [float(x) for x in vec], cluster))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    queries = emb.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    labels = emb.select("vec_id", "label")

    nn = similarity.cosine_topk_bruteforce(emb, queries, k=4)
    got = {r.qid: (r.pred_label, r.votes)
           for r in similarity.knn_classify(nn, labels).collect()}
    assert got == {c * 10: (c, 4) for c in range(8)}

    cb = similarity.pq_codebooks(emb, m=4, ksub=16, dim=16)
    enc = similarity.pq_encode(emb, cb, m=4, dim=16)
    adc = similarity.pq_adc_topk(enc, cb, queries, k=4, m=4, dim=16)
    got_pq = {r.qid: (r.pred_label, r.votes)
              for r in similarity.knn_classify(adc, labels).collect()}
    assert got_pq == {c * 10: (c, 4) for c in range(8)}


def test_semantic_dedup_keeps_marginal_member(spark):
    """Single cluster (only id 0 samples as centroid at every=100):
    ids 0/1/2 are mutual near-dups; the SemDeDup keep policy retains the
    member FARTHEST from the centroid (lowest cent_cos) and drops the
    rest; the orthogonal id 3 has no near-dup and survives."""
    rows = [
        (0, [1.0, 0.0]),    # the centroid itself (cent_cos = 1.0)
        (1, [1.0, 0.10]),   # near-dup of 0 and 2, closer to centroid
        (2, [1.0, 0.12]),   # near-dup, most marginal of the three
        (3, [0.0, 1.0]),    # orthogonal: kept
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    out = {
        r.vec_id: r
        for r in similarity.semantic_dedup(
            emb, threshold=0.9, every=100
        ).collect()
    }
    assert {k: v.is_kept for k, v in out.items()} == {
        0: False, 1: False, 2: True, 3: True
    }
    assert all(v.cid == 0 for v in out.values())  # one cluster
    assert out[0].cent_cos == 1.0


def test_semantic_dedup_respects_provided_centroids(spark):
    """Two explicit centroids split the near-dup pair into separate
    clusters, so neither sees the other and both survive — the
    cluster-scoped (not global) semantics, pinned."""
    emb = spark.createDataFrame(
        [(10, [1.0, 0.05]), (11, [1.0, 0.06])], ["vec_id", "embedding"]
    ).select("vec_id", F.col("embedding").cast("array<float>").alias("embedding"))
    cents = spark.createDataFrame(
        [(0, [1.0, 0.05]), (1, [1.0, 0.06])], ["cid", "cvec"]
    ).select("cid", F.col("cvec").cast("array<float>").alias("cvec"))
    out = similarity.semantic_dedup(emb, threshold=0.9, centroids=cents)
    assert all(r.is_kept for r in out.collect())


def test_centroids_bounded_is_fixed_size_and_deterministic(spark):
    """VERDICT r6 item 1: the default centroid count must NOT grow with
    the corpus — min(k, N) rows, stable across calls and partitionings."""
    emb = (
        spark.range(0, 1000)
        .withColumnRenamed("id", "vec_id")
        .withColumn(
            "embedding",
            F.array(
                (F.col("vec_id") % 7).cast("float"),
                (F.col("vec_id") % 11).cast("float"),
            ),
        )
    )
    a = similarity.centroids_bounded(emb, k=16)
    b = similarity.centroids_bounded(emb.repartition(13), k=16)
    ids_a = sorted(r.cid for r in a.collect())
    ids_b = sorted(r.cid for r in b.collect())
    assert len(ids_a) == 16 and ids_a == ids_b
    # a 10x corpus still yields exactly k centroids
    big = (
        spark.range(0, 10_000)
        .withColumnRenamed("id", "vec_id")
        .withColumn(
            "embedding",
            F.array(
                (F.col("vec_id") % 7).cast("float"),
                (F.col("vec_id") % 11).cast("float"),
            ),
        )
    )
    assert similarity.centroids_bounded(big, k=16).count() == 16
    # tiny corpus: min(k, N)
    assert similarity.centroids_bounded(emb.limit(5), k=16).count() == 5


def _clustered_emb(spark, n_clusters=6, per=40):
    """Well-separated clusters on distinct axes of an 8-dim space, tiny
    deterministic jitter — nearest-centroid assignment is unambiguous,
    so flat and two-level agree whenever the probed coarse cells contain
    the true nearest centroid."""
    rows = []
    for c in range(n_clusters):
        for i in range(per):
            v = [0.0] * 8
            v[c] = 1.0
            v[(c + 1) % 8] = 0.01 * (i % 5)
            rows.append((c * per + i, v))
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )


def test_ivf_assign_two_level_matches_flat_on_separated_clusters(spark):
    emb = _clustered_emb(spark)
    cents = spark.createDataFrame(
        [(c, [1.0 if j == c else 0.0 for j in range(8)]) for c in range(6)],
        ["cid", "cvec"],
    ).select("cid", F.col("cvec").cast("array<float>").alias("cvec"))
    flat = {
        r.vec_id: r.cid for r in similarity.ivf_assign(emb, cents).collect()
    }
    # nprobe=6 probes every coarse cell -> exhaustive, must equal flat
    two = {
        r.vec_id: r.cid
        for r in similarity.ivf_assign_two_level(
            emb, cents, coarse_every=2, nprobe=6
        ).collect()
    }
    assert two == flat
    assert len(flat) == 240  # every vector assigned exactly once


def test_ivf_assign_two_level_empty_coarse_falls_back_to_flat(spark):
    emb = _clustered_emb(spark, n_clusters=2, per=5)
    # one centroid whose xxhash64 bucket is (almost surely) nonzero for
    # some coarse_every: force emptiness with a huge modulus — the
    # fallback must still assign every vector
    cents = spark.createDataFrame(
        [(7, [1.0] + [0.0] * 7)], ["cid", "cvec"]
    ).select("cid", F.col("cvec").cast("array<float>").alias("cvec"))
    out = similarity.ivf_assign_two_level(
        emb, cents, coarse_every=10_000_019, nprobe=1
    )
    assert out.count() == 10 and all(r.cid == 7 for r in out.collect())


def test_ivf_assign_two_level_fallback_leaves_no_tracked_persist(spark):
    """ADVICE r7: the fallback path must not leave the centroid frame
    tracked-persisted (callers looping over small centroid sets would
    accumulate dead persisted blocks + one count() job per call)."""
    from hadoop_invertedindexer_spark import caching

    caching.release_persisted()
    emb = _clustered_emb(spark, n_clusters=2, per=5)
    cents = spark.createDataFrame(
        [(7, [1.0] + [0.0] * 7)], ["cid", "cvec"]
    ).select("cid", F.col("cvec").cast("array<float>").alias("cvec"))
    before = caching.tracked_count()
    similarity.ivf_assign_two_level(
        emb, cents, coarse_every=10_000_019, nprobe=1
    ).count()
    assert caching.tracked_count() == before


def test_semantic_dedup_bounded_default_matches_pinned_centroids(spark):
    """The default (bounded-K kmeans) path must agree with an explicit
    centroids= call pinning the SAME refined centroids — proof the
    default is just a centroid policy, not a semantics change."""
    emb = _clustered_emb(spark, n_clusters=4, per=10)
    sample = (
        emb.select(
            "vec_id", "embedding",
            similarity.md5_order_key("vec_id").alias("_mk"),
        )
        .orderBy("_mk", "vec_id")
        .limit(32)
        .drop("_mk")
    )
    init = similarity.centroids_bounded(sample, 8)
    cents = similarity.centroids_kmeans(sample, init=init, n_iters=2)
    via_default = {
        (r.vec_id, r.cid, r.is_kept)
        for r in similarity.semantic_dedup(
            emb, threshold=0.95, k=8, sample_mult=4
        ).collect()
    }
    via_pinned = {
        (r.vec_id, r.cid, r.is_kept)
        for r in similarity.semantic_dedup(
            emb, threshold=0.95, centroids=cents
        ).collect()
    }
    assert via_default == via_pinned and len(via_default) == 40


class TestIvfDriftRebuild:
    """r8: the monitor/remediate pair for frozen-centroid IVF indexes."""

    def _emb_frame(self, spark, rows):
        return spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
            "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
        )

    def _clustered(self, n_clusters, per, dim=8):
        rows = []
        for c in range(n_clusters):
            for j in range(per):
                v = [
                    (1.0 if i == c else 0.0) + 0.01 * ((c * per + j) % 5)
                    for i in range(dim)
                ]
                rows.append((c * per + j, v))
        return rows

    def test_shifted_append_degrades_then_rebuild_recovers(
        self, spark, tmp_path
    ):
        a = self._emb_frame(spark, self._clustered(4, 25))
        path = str(tmp_path / "ivf")
        cents = similarity.bounded_centroids_refined(
            a, k=4, sample_mult=4, refine_iters=2
        )
        similarity.build_ivf_index(a, cents, path)
        before = similarity.ivf_index_drift(spark, path).collect()[0]
        assert before.n_vectors == 100 and before.n_centroids == 4
        # append a batch from a SHIFTED distribution, far from every
        # frozen centroid: quantization error and imbalance must rise
        b = self._emb_frame(
            spark,
            [(100000 + i, [0.5] * 4 + [2.0 + 0.01 * i] * 4) for i in range(100)],
        )
        similarity.append_ivf_index(b, path)
        after = similarity.ivf_index_drift(spark, path).collect()[0]
        assert after.n_vectors == 200
        assert after.avg_qerr > before.avg_qerr
        assert after.imbalance > before.imbalance
        # offline rebuild into a fresh directory: new centroids see the
        # appended mass, error drops back below the drifted level
        dest = str(tmp_path / "ivf2")
        similarity.rebuild_ivf_index(spark, path, dest, k=8, refine_iters=2)
        rebuilt = similarity.ivf_index_drift(spark, dest).collect()[0]
        assert rebuilt.n_vectors == 200 and rebuilt.n_centroids == 8
        assert rebuilt.avg_qerr < after.avg_qerr
        assert rebuilt.imbalance <= after.imbalance

    def test_drift_metrics_shape_on_healthy_index(self, spark, tmp_path):
        a = self._emb_frame(spark, self._clustered(2, 10))
        path = str(tmp_path / "ivf")
        similarity.build_ivf_index(
            a,
            similarity.bounded_centroids_refined(a, k=2, refine_iters=1),
            path,
        )
        r = similarity.ivf_index_drift(spark, path).collect()[0]
        assert r.n_empty_buckets >= 0 and r.max_bucket <= r.n_vectors
        assert 0.0 <= r.avg_qerr <= r.max_qerr <= 2.0
        assert r.imbalance >= 1.0 - 1e-9

    def _drifted_index(self, spark, tmp_path):
        """Build from 4 tight clusters, append a shifted batch the
        frozen centroids never saw — the degraded state the maintainer
        must detect (same construction as the rebuild test above)."""
        a = self._emb_frame(spark, self._clustered(4, 25))
        path = str(tmp_path / "ivf")
        similarity.build_ivf_index(
            a,
            similarity.bounded_centroids_refined(
                a, k=4, sample_mult=4, refine_iters=2
            ),
            path,
        )
        b = self._emb_frame(
            spark,
            [
                (100000 + i, [0.5] * 4 + [2.0 + 0.01 * i] * 4)
                for i in range(100)
            ],
        )
        similarity.append_ivf_index(b, path)
        return path

    def test_maintain_triggers_rebuild_and_reports(self, spark, tmp_path):
        import os

        path = self._drifted_index(spark, tmp_path)
        drifted = similarity.ivf_index_drift(spark, path).collect()[0]
        dest = str(tmp_path / "ivf_rot")
        thresh = int(drifted.avg_qerr * 1000) - 1  # provably exceeded
        r = similarity.maintain_ivf_index(
            spark, path, dest, max_avg_qerr_mils=thresh,
            max_imbalance_mils=10**9, k=8, refine_iters=2,
        ).collect()[0]
        # the report is the PRE-rebuild drift row + the flag
        assert r.rebuilt is True
        assert (r.n_vectors, r.avg_qerr) == (
            drifted.n_vectors, drifted.avg_qerr
        )
        assert os.path.isdir(f"{dest}/assignments")
        rebuilt = similarity.ivf_index_drift(spark, dest).collect()[0]
        assert rebuilt.n_centroids == 8  # caller re-sized
        assert rebuilt.avg_qerr < drifted.avg_qerr  # recentering helped

    def test_maintain_skips_below_threshold(self, spark, tmp_path):
        import os

        path = self._drifted_index(spark, tmp_path)
        dest = str(tmp_path / "ivf_rot")
        r = similarity.maintain_ivf_index(
            spark, path, dest, max_avg_qerr_mils=10**9,
            max_imbalance_mils=10**9,
        ).collect()[0]
        assert r.rebuilt is False
        assert not os.path.exists(dest)  # NOTHING written below threshold

    def test_maintain_k_defaults_to_current_centroid_count(
        self, spark, tmp_path
    ):
        path = self._drifted_index(spark, tmp_path)
        dest = str(tmp_path / "ivf_rot")
        similarity.maintain_ivf_index(
            spark, path, dest, max_avg_qerr_mils=0, refine_iters=1,
        ).collect()
        rebuilt = similarity.ivf_index_drift(spark, dest).collect()[0]
        assert rebuilt.n_centroids == 4  # capacity preserved

    def test_maintain_refuses_in_place(self, spark, tmp_path):
        import pytest

        path = self._drifted_index(spark, tmp_path)
        with pytest.raises(ValueError, match="in place"):
            similarity.maintain_ivf_index(spark, path, path)

    def test_maintain_empty_index_reports_no_rebuild(self, spark, tmp_path):
        """ADVICE r12: an empty assignments table makes the drift
        metrics NULL (nothing to average). No evidence is not evidence
        of drift — the maintainer must report rebuilt=False instead of
        TypeError-ing on None arithmetic."""
        import os

        path = self._drifted_index(spark, tmp_path)
        # truncate assignments in place, preserving the schema
        # (cid rides along as a normal column on the limit(0) frame)
        empty = spark.read.parquet(f"{path}/assignments").limit(0)
        empty.write.mode("overwrite").parquet(f"{path}/assignments")
        dest = str(tmp_path / "ivf_rot")
        r = similarity.maintain_ivf_index(
            spark, path, dest, max_avg_qerr_mils=0, max_imbalance_mils=0,
        ).collect()[0]
        assert r.rebuilt is False
        assert r.n_vectors == 0 and r.avg_qerr is None
        assert not os.path.exists(dest)  # nothing rotated


class TestAnnRecall:
    def _frames(self, spark, truth_rows, cand_rows):
        t = spark.createDataFrame(truth_rows, ["qid", "vec_id"])
        c = (
            spark.createDataFrame(cand_rows, ["qid", "vec_id"])
            if cand_rows
            else spark.createDataFrame([], "qid long, vec_id long")
        )
        return t, c

    def test_perfect_and_partial_and_missed(self, spark):
        truth = [(1, 10), (1, 11), (2, 10), (2, 12), (3, 13), (3, 14)]
        cand = [
            (1, 10), (1, 11),          # q1: both found
            (2, 10), (2, 99),          # q2: one of two + a spurious hit
        ]                               # q3: the ANN path returned nothing
        t, c = self._frames(spark, truth, cand)
        rows = {
            r.qid: r for r in similarity.ann_recall(t, c).collect()
        }
        assert rows[1].recall_mils == 1000 and rows[1].n_hit == 2
        assert rows[2].recall_mils == 500 and rows[2].n_truth == 2
        # a query with zero candidates must still report, at 0
        assert rows[3].recall_mils == 0 and rows[3].n_hit == 0

    def test_spurious_candidates_never_inflate(self, spark):
        t, c = self._frames(
            spark, [(1, 10)], [(1, 20), (1, 30), (1, 40)]
        )
        r = similarity.ann_recall(t, c).first()
        assert (r.n_truth, r.n_hit, r.recall_mils) == (1, 0, 0)

    def test_lsh_recall_beats_zero_on_planted_clusters(self, spark):
        emb = _clustered_emb(spark)
        queries = emb.where(F.col("vec_id") % 10 == 0).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        truth = similarity.cosine_topk_bruteforce(emb, queries, k=5)
        cand = similarity.cosine_topk_lsh(
            emb, queries, k=5, nbits=4, dim=8
        )
        rep = similarity.ann_recall(truth, cand)
        got = rep.agg(F.avg("recall_mils")).first()[0]
        n_q = queries.count()
        assert rep.count() == n_q          # one row per truth query
        assert got > 500                    # planted clusters collide


class TestIvfPq:
    """IVF-PQ composite (r13): the two ANN levers composed — probe
    selection shared with the IVF family, ADC ranking shared with the
    PQ family; the oracle pins values, these pin the structure."""

    def _parts(self, spark, sf_dir):
        emb = read_table(spark, sf_dir, "embeddings")
        queries = emb.where(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        cents = similarity.centroids_by_sampling(emb, every=50)
        cb = similarity.pq_codebooks(emb, m=8, ksub=16, dim=64)
        return emb, queries, cents, cb

    def test_ivfpq_encode_matches_flat_pq_encoder(self, spark, sf_dir):
        """The one-pass (id, cid, codes) encoder is bit-identical to
        pq_encode on codes and to ivf_assign on cids — the composite
        adds no third semantics."""
        emb, _, cents, cb = self._parts(spark, sf_dir)
        assigned = similarity.ivf_assign(emb, cents, dim=64)
        got = {
            r.vec_id: (r.cid, tuple(r.codes))
            for r in similarity.ivfpq_encode(
                assigned, cb, m=8, dim=64
            ).collect()
        }
        codes = {
            r.vec_id: tuple(r.codes)
            for r in similarity.pq_encode(emb, cb, m=8, dim=64).collect()
        }
        cids = {r.vec_id: r.cid for r in assigned.collect()}
        assert got == {v: (cids[v], codes[v]) for v in codes}

    def test_ivfpq_candidates_within_probed_buckets(self, spark, sf_dir):
        """Every reported neighbor's assigned bucket is one of its
        query's nprobe probed buckets — the IVF restriction actually
        restricts."""
        emb, queries, cents, cb = self._parts(spark, sf_dir)
        assigned = similarity.ivf_assign(emb, cents, dim=64)
        codes = similarity.ivfpq_encode(assigned, cb, m=8, dim=64)
        out = similarity.ivfpq_adc_topk(
            codes, cb, cents, queries, k=10, nprobe=2, m=8, dim=64
        )
        probed: dict[int, set[int]] = {}
        for r in similarity._probe_buckets(
            queries, cents, nprobe=2
        ).collect():
            probed.setdefault(r.qid, set()).add(r.cid)
        cid_of = {r.vec_id: r.cid for r in assigned.collect()}
        rows = out.collect()
        assert rows
        for r in rows:
            assert cid_of[r.vec_id] in probed[r.qid], (r.qid, r.vec_id)

    def test_ivfpq_adist_equals_full_pq_on_shared_pairs(self, spark, sf_dir):
        """On every (qid, vec) pair both paths rank, the IVF-PQ adist
        equals the full-scan pq_adc_topk adist — probing changes the
        candidate set, never the distance arithmetic."""
        emb, queries, cents, cb = self._parts(spark, sf_dir)
        assigned = similarity.ivf_assign(emb, cents, dim=64)
        codes = similarity.ivfpq_encode(assigned, cb, m=8, dim=64)
        ivfpq = {
            (r.qid, r.vec_id): r.adist
            for r in similarity.ivfpq_adc_topk(
                codes, cb, cents, queries, k=10, nprobe=4, m=8, dim=64
            ).collect()
        }
        enc = similarity.pq_encode(emb, cb, m=8, dim=64)
        full = {
            (r.qid, r.vec_id): r.adist
            for r in similarity.pq_adc_topk(
                enc, cb, queries, k=1000, m=8, dim=64
            ).collect()
        }
        shared = set(ivfpq) & set(full)
        assert shared
        assert all(ivfpq[p] == full[p] for p in shared)

    def test_persisted_ivfpq_matches_inmemory_and_prunes(
        self, spark, sf_dir, tmp_path
    ):
        """query_ivfpq_index ≡ ivfpq_adc_topk at the stored contract,
        and the probed-bucket join dynamically prunes the codes scan
        (only ~nprobe·|Q| bucket dirs are read off disk)."""
        emb, queries, cents, cb = self._parts(spark, sf_dir)
        path = str(tmp_path / "ivfpq")
        similarity.build_ivfpq_index(emb, cents, cb, path, m=8, dim=64)
        assigned = similarity.ivf_assign(emb, cents, dim=64)
        codes = similarity.ivfpq_encode(assigned, cb, m=8, dim=64)
        direct = similarity.ivfpq_adc_topk(
            codes, cb, cents, queries, k=5, nprobe=3, m=8, dim=64
        )
        disk = similarity.query_ivfpq_index(
            spark, path, queries, k=5, nprobe=3
        )
        canon = lambda df: sorted(  # noqa: E731
            map(tuple, df.toPandas().sort_index(axis=1).values.tolist())
        )
        assert canon(disk) == canon(direct)
        plan = disk._jdf.queryExecution().executedPlan().toString()
        scan = next(
            ln for ln in plan.splitlines()
            if "FileScan" in ln and "codes" in ln and "cid" in ln
        )
        assert "dynamicpruning" in scan.lower()

    def test_ivfpq_index_append_matches_rebuild(self, spark, sf_dir, tmp_path):
        """Ingest posture: append at the STORED centroids/codebooks
        equals a full rebuild with the same contract — assignment and
        encoding are per-row against frozen tables, so append-vs-rebuild
        is exact."""
        emb, queries, cents, cb = self._parts(spark, sf_dir)
        old = emb.where(F.col("vec_id") % 10 != 0)
        batch = emb.where(F.col("vec_id") % 10 == 0)
        inc = str(tmp_path / "ivfpq_inc")
        similarity.build_ivfpq_index(old, cents, cb, inc, m=8, dim=64)
        similarity.append_ivfpq_index(batch, inc)
        full = str(tmp_path / "ivfpq_full")
        similarity.build_ivfpq_index(emb, cents, cb, full, m=8, dim=64)
        canon = lambda df: sorted(  # noqa: E731
            map(tuple, df.toPandas().sort_index(axis=1).values.tolist())
        )
        assert canon(
            similarity.query_ivfpq_index(spark, inc, queries, k=5, nprobe=3)
        ) == canon(
            similarity.query_ivfpq_index(spark, full, queries, k=5, nprobe=3)
        )

    def test_ivfpq_recall_vs_bruteforce(self, spark, sf_dir):
        """The composite's recall stacks bucket-miss loss on
        quantization loss: a loose positive floor is the honest bound on
        the near-orthogonal synthetic corpus (the planted-dup PQ test
        pins the sharp behavior; ann_recall_eval_ivfpq records the
        measured point)."""
        emb, queries, cents, cb = self._parts(spark, sf_dir)
        truth = similarity.cosine_topk_bruteforce(emb, queries, k=10)
        assigned = similarity.ivf_assign(emb, cents, dim=64)
        codes = similarity.ivfpq_encode(assigned, cb, m=8, dim=64)
        cand = similarity.ivfpq_adc_topk(
            codes, cb, cents, queries, k=10, nprobe=4, m=8, dim=64
        )
        rep = similarity.ann_recall(truth, cand)
        assert rep.count() == queries.count()
        assert rep.agg(F.avg("recall_mils")).first()[0] > 0


class TestMaintainIvfPq:
    """The compressed tier's maintenance loop (r13): occupancy-only
    trigger (the codes tier keeps no raw floats), rebuild from the
    caller's corpus; same two-phase shape as every other maintainer."""

    def _emb_frame(self, spark, rows):
        return spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
            "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
        )

    def _clustered(self, n_clusters=4, per=25, dim=8):
        rows = []
        for c in range(n_clusters):
            for j in range(per):
                v = [
                    (1.0 if i == c else 0.0) + 0.01 * ((c * per + j) % 5)
                    for i in range(dim)
                ]
                rows.append((c * per + j, v))
        return rows

    def _built(self, spark, tmp_path, emb):
        path = str(tmp_path / "ivfpq")
        cents = similarity.bounded_centroids_refined(emb, k=4, sample_mult=4)
        cb = similarity.pq_codebooks(emb, m=4, ksub=8, dim=8)
        similarity.build_ivfpq_index(emb, cents, cb, path, m=4, dim=8)
        return path

    def _hub_slab(self, spark, emb, n=300):
        one = emb.where(F.col("vec_id") == 0).select("embedding")
        return (
            spark.range(n)
            .select((F.col("id") + F.lit(10_000_000)).alias("vec_id"))
            .crossJoin(F.broadcast(one))
        )

    def test_trigger_rebuild_and_occupancy_recovers(self, spark, tmp_path):
        emb = self._emb_frame(spark, self._clustered())
        path = self._built(spark, tmp_path, emb)
        slab = self._hub_slab(spark, emb)
        similarity.append_ivfpq_index(slab, path)
        dest = str(tmp_path / "ivfpq_rot")
        corpus = emb.unionByName(slab.select("vec_id", "embedding"))
        r = similarity.maintain_ivfpq_index(
            spark, path, dest, corpus, max_imbalance_mils=2000
        ).head()
        assert r.rebuilt is True
        assert r.imbalance * 1000 > 2000
        post = similarity.ivfpq_index_drift(spark, dest).head()
        # rebuilt centroids have seen the slab: the hub mass spreads
        assert post.imbalance < r.imbalance
        # the rebuilt tier serves queries at its own stored contract
        q = emb.where(F.col("vec_id") % 25 == 0).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        assert similarity.query_ivfpq_index(
            spark, dest, q, k=3, nprobe=2
        ).count() > 0

    def test_skip_below_threshold_writes_nothing(self, spark, tmp_path):
        import os

        emb = self._emb_frame(spark, self._clustered())
        path = self._built(spark, tmp_path, emb)
        dest = str(tmp_path / "ivfpq_rot")
        r = similarity.maintain_ivfpq_index(
            spark, path, dest, emb, max_imbalance_mils=10**9
        ).head()
        assert r.rebuilt is False
        assert not os.path.exists(dest)

    def test_refuses_in_place(self, spark, tmp_path):
        import pytest

        emb = self._emb_frame(spark, self._clustered())
        path = self._built(spark, tmp_path, emb)
        with pytest.raises(ValueError, match="in place"):
            similarity.maintain_ivfpq_index(spark, path, path, emb)

    def test_empty_index_reports_no_rebuild(self, spark, tmp_path):
        import os

        emb = self._emb_frame(spark, self._clustered())
        path = self._built(spark, tmp_path, emb)
        empty = spark.read.parquet(f"{path}/codes").limit(0)
        empty.write.mode("overwrite").parquet(f"{path}/codes")
        dest = str(tmp_path / "ivfpq_rot")
        r = similarity.maintain_ivfpq_index(
            spark, path, dest, emb, max_imbalance_mils=0
        ).head()
        assert r.rebuilt is False
        assert r.n_vectors == 0 and r.imbalance is None
        assert not os.path.exists(dest)


class TestIvfPqStreamIngest:
    """r13 session 2: the ANN tier's streaming maintainers — idempotent
    codes/batch=<id> tiers at the stored models, in-drain occupancy
    rotation rebuilt from the published source directory."""

    def _emb_frame(self, spark, rows):
        return spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
            "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
        )

    def _clustered_rows(self, n_clusters=4, per=25, dim=8, id0=0):
        rows = []
        for c in range(n_clusters):
            for j in range(per):
                v = [
                    (1.0 if i == c else 0.0) + 0.01 * ((c * per + j) % 5)
                    for i in range(dim)
                ]
                rows.append((id0 + c * per + j, v))
        return rows

    def _publish(self, spark, tmp_path, frames):
        import glob
        import os
        import shutil

        stage, src = str(tmp_path / "stage"), str(tmp_path / "src")
        for i, d in enumerate(frames):
            d.coalesce(1).write.mode("overwrite").parquet(f"{stage}/d{i}")
        os.makedirs(src, exist_ok=True)
        for i, f in enumerate(
            sorted(glob.glob(f"{stage}/d*/part-*.parquet"))
        ):
            shutil.copyfile(f, f"{src}/day{i}.parquet")
        return src

    def _schema(self):
        from pyspark.sql import types as T

        return T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        )

    def test_stream_matches_direct_at_stored_models(self, spark, tmp_path):
        from hadoop_invertedindexer_spark.streaming import ann_ingest

        day0 = self._emb_frame(spark, self._clustered_rows())
        day1 = self._emb_frame(
            spark, self._clustered_rows(id0=1000)
        )
        src = self._publish(spark, tmp_path, [day0, day1])
        union = day0.unionByName(day1)
        cents = similarity.bounded_centroids_refined(union, k=4, sample_mult=4)
        cb = similarity.pq_codebooks(union, m=4, ksub=8, dim=8)
        path = str(tmp_path / "ivfpq_stream")
        ann_ingest.init_ivfpq_stream_index(spark, path, cents, cb, m=4, dim=8)
        ann_ingest.maintain_ivfpq_ingest(
            spark, src, self._schema(), path, str(tmp_path / "ck")
        )
        q = union.where(F.col("vec_id") % 25 == 0).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        disk = similarity.query_ivfpq_index(spark, path, q, k=5, nprobe=2)
        direct = similarity.ivfpq_adc_topk(
            similarity.ivfpq_encode(
                similarity.ivf_assign(union, cents, dim=8), cb, m=4, dim=8
            ),
            cb, cents, q, k=5, nprobe=2, m=4, dim=8,
        )
        canon = lambda df: sorted(  # noqa: E731
            map(tuple, df.toPandas().sort_index(axis=1).values.tolist())
        )
        assert canon(disk) == canon(direct)
        assert len(canon(disk)) > 0

    def test_in_drain_rotation_recovers_and_serves(
        self, spark, sf_dir, tmp_path
    ):
        """Day 0 publishes the real embeddings table (healthy imbalance
        ~1.31 at k=16); day 1 publishes the soak's tight
        off-distribution cloud (0.1·v + 2.0 over a third of the
        corpus), which collapses into few frozen buckets (measured
        ~4.73) — the in-drain loop must trigger, fold everything into
        one rebuilt tier, and the rebuild (corpus-derived centroids
        that have finally seen the cloud) must lower the occupancy."""
        import os

        from hadoop_invertedindexer_spark.streaming import ann_ingest

        day0 = read_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        cloud = day0.where(F.col("vec_id") % 3 == 1).select(
            (F.col("vec_id") + F.lit(5000)).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x * F.lit(0.1) + F.lit(2.0)
            ).cast("array<float>").alias("embedding"),
        )
        src = self._publish(spark, tmp_path, [day0, cloud])
        cents = similarity.bounded_centroids_refined(
            day0, k=16, sample_mult=4
        )
        cb = similarity.pq_codebooks(day0, m=8, ksub=16, dim=64)
        path = str(tmp_path / "ivfpq_stream")
        ann_ingest.init_ivfpq_stream_index(
            spark, path, cents, cb, m=8, dim=64
        )
        # threshold sits BETWEEN the drifted value (~4.73) and the
        # post-rebuild plateau (~4.20): the cloud is a genuine tight
        # cluster holding 25% of the mass, so its post-rebuild bucket
        # is irreducible structure — a fleet threshold below that
        # plateau would re-trigger a futile rebuild on every
        # subsequent batch (churn), which is the caller's
        # threshold-setting lesson this fixture encodes
        ann_ingest.maintain_ivfpq_ingest(
            spark, src, self._schema(), path, str(tmp_path / "ck"),
            max_imbalance_mils=4500,
        )
        # the rotation fired in-drain: the folded tier exists, and any
        # other tier dir a later (possibly empty) micro-batch wrote
        # holds nothing — total rows = exactly the published corpus
        assert os.path.isdir(f"{path}/codes/batch=compacted")
        n_total = day0.count() + cloud.count()
        post = similarity.ivfpq_index_drift(spark, path).head()
        assert post.n_vectors == n_total
        # pre-rotation occupancy, recomputed exactly: the union assigned
        # against the ORIGINAL (day0-only) frozen centroids
        union = day0.unionByName(cloud)
        pre_occ = (
            similarity.ivf_assign(union, cents, dim=64)
            .groupBy("cid")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n"))
            .head()[0]
        )
        pre_imbalance = pre_occ * 16 / n_total
        assert pre_imbalance * 1000 > 4500  # the trigger had to fire
        assert post.imbalance * 1000 <= 4500  # and settle below it
        assert post.imbalance < pre_imbalance  # and the rebuild recovered
        # the rotated index serves queries at its own (fresh) models
        q = union.where(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        assert similarity.query_ivfpq_index(
            spark, path, q, k=3, nprobe=4
        ).count() > 0

    def test_replay_after_fold_does_not_duplicate(self, spark, tmp_path):
        """ADVICE r13 (medium): a checkpoint replay of a batch an
        in-drain fold already swallowed must NOT rewrite codes/batch=<id>
        — its rows live inside batch=compacted, and duplicated (id, cid,
        codes) rows double those vectors' summed ADC distances in
        query_ivfpq_index. Replay is simulated the hard way: the whole
        checkpoint is deleted and the SAME source re-drained."""
        import shutil

        from hadoop_invertedindexer_spark.streaming import ann_ingest

        day0 = self._emb_frame(spark, self._clustered_rows())
        # day 1 collapses onto cluster 0's direction: occupancy spikes
        # (125 of 200 rows in one frozen bucket -> imbalance 2.5) and
        # the in-drain fold fires at the 2000-mil threshold
        day1 = self._emb_frame(
            spark,
            [
                (1000 + j, [1.0 + 0.001 * (j % 7)] + [0.0] * 7)
                for j in range(100)
            ],
        )
        src = self._publish(spark, tmp_path, [day0, day1])
        union = day0.unionByName(day1)
        cents = similarity.bounded_centroids_refined(day0, k=4, sample_mult=4)
        cb = similarity.pq_codebooks(day0, m=4, ksub=8, dim=8)
        path = str(tmp_path / "ivfpq_stream")
        ck = str(tmp_path / "ck")
        ann_ingest.init_ivfpq_stream_index(spark, path, cents, cb, m=4, dim=8)
        ann_ingest.maintain_ivfpq_ingest(
            spark, src, self._schema(), path, ck, max_imbalance_mils=2000
        )
        n_total = union.count()
        codes = spark.read.parquet(f"{path}/codes")
        assert codes.count() == n_total  # fold happened, nothing doubled
        folded = {
            str(r.batch)
            for r in spark.read.parquet(f"{path}/folded").collect()
        }
        assert folded  # the fold recorded what it swallowed
        q = union.where(F.col("vec_id") % 50 == 0).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        before = sorted(
            map(
                tuple,
                similarity.query_ivfpq_index(spark, path, q, k=5, nprobe=2)
                .toPandas()
                .sort_index(axis=1)
                .values.tolist(),
            )
        )
        # full replay: fresh checkpoint, same published files, same ids
        shutil.rmtree(ck)
        ann_ingest.maintain_ivfpq_ingest(
            spark, src, self._schema(), path, ck, max_imbalance_mils=2000
        )
        codes = spark.read.parquet(f"{path}/codes")
        assert codes.count() == n_total  # replayed batches were skipped
        assert codes.select("vec_id").distinct().count() == n_total
        after = sorted(
            map(
                tuple,
                similarity.query_ivfpq_index(spark, path, q, k=5, nprobe=2)
                .toPandas()
                .sort_index(axis=1)
                .values.tolist(),
            )
        )
        assert after == before  # rankings survived the replay intact

    def test_empty_first_microbatch_writes_nothing(self, spark, tmp_path):
        """ADVICE r13: an empty first micro-batch must not leave a
        footer-less codes/batch=0 dir that breaks later schema
        inference of the codes tier — it writes nothing at all."""
        import os

        from hadoop_invertedindexer_spark.streaming import ann_ingest

        empty = spark.createDataFrame([], self._schema())
        day1 = self._emb_frame(spark, self._clustered_rows())
        src = self._publish(spark, tmp_path, [empty, day1])
        cents = similarity.bounded_centroids_refined(day1, k=4, sample_mult=4)
        cb = similarity.pq_codebooks(day1, m=4, ksub=8, dim=8)
        path = str(tmp_path / "ivfpq_stream")
        ann_ingest.init_ivfpq_stream_index(spark, path, cents, cb, m=4, dim=8)
        ann_ingest.maintain_ivfpq_ingest(
            spark, src, self._schema(), path, str(tmp_path / "ck"),
            max_imbalance_mils=4000,
        )
        tiers = [
            d
            for d in os.listdir(f"{path}/codes")
            if d.startswith("batch=")
        ]
        # exactly one tier: the data batch; the empty batch left nothing
        assert len(tiers) == 1
        drift = similarity.ivfpq_index_drift(spark, path).head()
        assert drift.n_vectors == day1.count()


class TestIvfPqQerr:
    """r14 (VERDICT r13 ask 4): the quantization-error drift signal
    occupancy cannot see — sampled reconstruction error vs the
    build-time pinned baseline, and the qerr-triggered rebuild."""

    def _build(self, spark, sf_dir, tmp_path):
        emb = read_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        cents = similarity.centroids_by_sampling(emb, every=50)
        cb = similarity.pq_codebooks(emb, m=8, ksub=16, dim=64)
        path = str(tmp_path / "ivfpq")
        similarity.build_ivfpq_index(emb, cents, cb, path, m=8, dim=64)
        return emb, path

    def _slab(self, emb):
        return emb.where(F.col("vec_id") % 4 == 0).select(
            (F.col("vec_id") + F.lit(20_000_000)).alias("vec_id"),
            F.transform("embedding", lambda x: x * F.lit(5.0))
            .cast("array<float>")
            .alias("embedding"),
        )

    def test_healthy_index_ratio_is_exactly_1000(
        self, spark, sf_dir, tmp_path
    ):
        emb, path = self._build(spark, sf_dir, tmp_path)
        r = similarity.ivfpq_index_qerr(spark, path, emb).head()
        assert r.n_sampled > 0
        assert r.avg_recon_sq == r.baseline_recon_sq > 0
        assert r.qerr_ratio_mils == 1000

    def test_scale_drift_fires_qerr_not_occupancy(
        self, spark, sf_dir, tmp_path
    ):
        """The canonical occupancy-blind drift: a 5x-scaled slab —
        cosine assignment is scale-invariant so imbalance stays at the
        healthy level (the occupancy maintainer would never fire),
        while squared-L2 reconstruction error explodes past any sane
        ratio threshold."""
        emb, path = self._build(spark, sf_dir, tmp_path)
        healthy_imb = similarity.ivfpq_index_drift(spark, path).head().imbalance
        slab = self._slab(emb)
        similarity.append_ivfpq_index(slab, path)
        uni = emb.unionByName(slab)
        drift = similarity.ivfpq_index_drift(spark, path).head()
        assert drift.imbalance * 1000 < healthy_imb * 1000 + 1000
        r = similarity.ivfpq_index_qerr(spark, path, uni).head()
        assert r.qerr_ratio_mils > 3000

    def test_maintainer_rebuilds_and_fresh_baseline_resets(
        self, spark, sf_dir, tmp_path
    ):
        import os

        emb, path = self._build(spark, sf_dir, tmp_path)
        slab = self._slab(emb)
        similarity.append_ivfpq_index(slab, path)
        uni = emb.unionByName(slab)
        dest = str(tmp_path / "ivfpq_rot")
        m = similarity.maintain_ivfpq_index_qerr(
            spark, path, dest, uni, max_ratio_mils=3000
        ).head()
        assert m.rebuilt is True and m.qerr_ratio_mils > 3000
        assert os.path.isdir(dest)
        post = similarity.ivfpq_index_qerr(spark, dest, uni).head()
        assert post.qerr_ratio_mils == 1000  # fresh baseline pinned
        # the refined-codebook rebuild genuinely lowers absolute recon
        # error on the mixed-scale corpus
        assert post.avg_recon_sq < m.avg_recon_sq
        # the rotated index serves queries
        q = uni.where(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        assert similarity.query_ivfpq_index(
            spark, dest, q, k=3, nprobe=4
        ).count() > 0

    def test_below_threshold_writes_nothing(self, spark, sf_dir, tmp_path):
        import os

        emb, path = self._build(spark, sf_dir, tmp_path)
        dest = str(tmp_path / "ivfpq_rot")
        m = similarity.maintain_ivfpq_index_qerr(
            spark, path, dest, emb, max_ratio_mils=3000
        ).head()
        assert m.rebuilt is False and m.qerr_ratio_mils == 1000
        assert not os.path.exists(dest)

    def test_missing_baseline_is_no_evidence(self, spark, sf_dir, tmp_path):
        """A pre-r14 index has no qerr_baseline: the probe reports 0
        (no evidence) and the maintainer must NOT rebuild on it."""
        import os
        import shutil

        emb, path = self._build(spark, sf_dir, tmp_path)
        shutil.rmtree(f"{path}/qerr_baseline")
        r = similarity.ivfpq_index_qerr(spark, path, emb).head()
        assert r.baseline_recon_sq == 0 and r.qerr_ratio_mils == 0
        dest = str(tmp_path / "ivfpq_rot")
        m = similarity.maintain_ivfpq_index_qerr(
            spark, path, dest, emb, max_ratio_mils=3000
        ).head()
        assert m.rebuilt is False
        assert not os.path.exists(dest)

    def test_in_place_rotation_guard(self, spark, sf_dir, tmp_path):
        import pytest

        emb, path = self._build(spark, sf_dir, tmp_path)
        with pytest.raises(ValueError, match="cannot run in place"):
            similarity.maintain_ivfpq_index_qerr(spark, path, path, emb)


class TestPqCodebooksRefined:
    """r14 (VERDICT r13 ask 3): bounded per-subspace k-means refinement
    of the PQ codebooks. The oracle pins exact values; these pin the
    contract claims — qerr strictly improves, the two-stage rerank
    recall improves at equal (m, ksub, nprobe, shortlist), and the
    refinement is deterministic."""

    def _qerr(self, emb, cb, m=8, dsub=8):
        subs = emb.select(
            "vec_id",
            F.posexplode(
                similarity._pq_subvectors(
                    similarity._pq_quantized_coords(F.col("embedding")),
                    m,
                    dsub,
                )
            ).alias("s", "sub"),
        )
        return (
            subs.join(F.broadcast(cb), "s")
            .select(
                "vec_id",
                "s",
                F.struct(
                    similarity._pq_sqdist(
                        F.col("sub"), F.col("cq")
                    ).alias("d"),
                    F.col("c"),
                ).alias("dc"),
            )
            .groupBy("vec_id", "s")
            .agg(F.min("dc").alias("b"))
            .agg(F.avg(F.col("b.d")))
            .head()[0]
        )

    def test_refinement_cuts_quantization_error(self, spark, sf_dir):
        emb = read_table(spark, sf_dir, "embeddings")
        boot = similarity.pq_codebooks(emb, m=8, ksub=16, dim=64)
        ref = similarity.pq_codebooks_refined(
            emb, m=8, ksub=16, sample_mult=16, refine_iters=2, dim=64
        )
        assert self._qerr(emb, ref) < self._qerr(emb, boot)

    def test_refined_rerank_recall_not_worse(self, spark, sf_dir):
        """The shortlist-coverage claim: at equal (m, ksub, nprobe,
        shortlist) the refined codebooks put at least as much of the
        true top-10 inside the ADC shortlist, so the exact re-rank's
        recall@10 is >= the bootstrap's (sf0.01: 740 vs 660 mils)."""
        emb = read_table(spark, sf_dir, "embeddings")
        queries = emb.where(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        truth = similarity.cosine_topk_bruteforce(emb, queries, k=10)
        cents = similarity.centroids_by_sampling(emb, every=50)
        assigned = similarity.ivf_assign(emb, cents, dim=64)

        def avg_recall(cb):
            codes = similarity.ivfpq_encode(assigned, cb, m=8, dim=64)
            cand = similarity.ivfpq_rerank_topk(
                codes, cb, cents, emb, queries, k=10, shortlist=40,
                nprobe=4, m=8, dim=64,
            )
            return similarity.ann_recall(truth, cand).agg(
                F.avg("recall_mils")
            ).head()[0]

        boot = avg_recall(similarity.pq_codebooks(emb, m=8, ksub=16, dim=64))
        ref = avg_recall(
            similarity.pq_codebooks_refined(
                emb, m=8, ksub=16, sample_mult=16, refine_iters=2, dim=64
            )
        )
        assert ref >= boot

    def test_refined_schema_and_determinism(self, spark, sf_dir):
        emb = read_table(spark, sf_dir, "embeddings")
        a = similarity.pq_codebooks_refined(
            emb, m=4, ksub=8, sample_mult=8, refine_iters=1, dim=64
        )
        b = similarity.pq_codebooks_refined(
            emb, m=4, ksub=8, sample_mult=8, refine_iters=1, dim=64
        )
        rows_a = sorted((r.s, r.c, tuple(r.cq)) for r in a.collect())
        rows_b = sorted((r.s, r.c, tuple(r.cq)) for r in b.collect())
        assert rows_a == rows_b
        assert len(rows_a) == 4 * 8
        assert all(len(cq) == 16 for _, _, cq in rows_a)  # dsub = 64/4

    def test_zero_iters_is_bootstrap_of_the_sample(self, spark, sf_dir):
        emb = read_table(spark, sf_dir, "embeddings")
        got = similarity.pq_codebooks_refined(
            emb, m=8, ksub=16, sample_mult=16, refine_iters=0, dim=64
        )
        sample = (
            emb.select(
                "vec_id",
                "embedding",
                similarity.md5_order_key("vec_id").alias("_mk"),
            )
            .orderBy("_mk", "vec_id")
            .limit(256)
            .drop("_mk")
        )
        want = similarity.pq_codebooks(sample, m=8, ksub=16, dim=64)
        canon = lambda df: sorted(  # noqa: E731
            (r.s, r.c, tuple(r.cq)) for r in df.collect()
        )
        assert canon(got) == canon(want)


class TestIvfPqRerank:
    """Two-stage IVF-PQ (r13): ADC shortlist -> exact re-rank. The
    oracle pins values; these pin the structure and the recall claim."""

    def _parts(self, spark, sf_dir):
        emb = read_table(spark, sf_dir, "embeddings")
        queries = emb.where(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        cents = similarity.centroids_by_sampling(emb, every=50)
        cb = similarity.pq_codebooks(emb, m=8, ksub=16, dim=64)
        assigned = similarity.ivf_assign(emb, cents, dim=64)
        codes = similarity.ivfpq_encode(assigned, cb, m=8, dim=64)
        return emb, queries, cents, cb, codes

    def test_results_subset_of_adc_shortlist(self, spark, sf_dir):
        emb, queries, cents, cb, codes = self._parts(spark, sf_dir)
        short = {
            (r.qid, r.vec_id)
            for r in similarity.ivfpq_adc_topk(
                codes, cb, cents, queries, k=40, nprobe=4, m=8, dim=64
            ).collect()
        }
        rer = similarity.ivfpq_rerank_topk(
            codes, cb, cents, emb, queries, k=10, shortlist=40,
            nprobe=4, m=8, dim=64,
        ).collect()
        assert rer
        assert all((r.qid, r.vec_id) in short for r in rer)

    def test_rerank_cosines_are_exact(self, spark, sf_dir):
        """Stage 2 is exact: every reported cosine equals the
        brute-force cosine for that (qid, vec) pair."""
        emb, queries, cents, cb, codes = self._parts(spark, sf_dir)
        exact = {
            (r.qid, r.vec_id): r.cosine
            for r in similarity.cosine_topk_bruteforce(
                emb, queries, k=10**6
            ).collect()
        }
        for r in similarity.ivfpq_rerank_topk(
            codes, cb, cents, emb, queries, k=10, shortlist=40,
            nprobe=4, m=8, dim=64,
        ).collect():
            assert exact[(r.qid, r.vec_id)] == r.cosine

    def test_rerank_recall_at_least_plain_ivfpq(self, spark, sf_dir):
        """The refine step can only help: with the shortlist a superset
        of the plain top-k, exact re-ordering recovers truth members
        ADC mis-ranked. Deterministic corpus, so >= is assertable."""
        emb, queries, cents, cb, codes = self._parts(spark, sf_dir)
        truth = similarity.cosine_topk_bruteforce(emb, queries, k=10)
        plain = similarity.ivfpq_adc_topk(
            codes, cb, cents, queries, k=10, nprobe=4, m=8, dim=64
        )
        rer = similarity.ivfpq_rerank_topk(
            codes, cb, cents, emb, queries, k=10, shortlist=40,
            nprobe=4, m=8, dim=64,
        )
        r_plain = (
            similarity.ann_recall(truth, plain)
            .agg(F.avg("recall_mils")).first()[0]
        )
        r_rer = (
            similarity.ann_recall(truth, rer)
            .agg(F.avg("recall_mils")).first()[0]
        )
        assert r_rer >= r_plain
        assert r_rer > 0
