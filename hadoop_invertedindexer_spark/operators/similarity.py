"""Similarity search over embedding columns (EXT, SURVEY §2B).

Two paths, matching how ANN systems are actually deployed:

* brute-force cosine top-k — the exact baseline; a broadcast of the
  (small) query set against the full corpus, dot products fully JVM-side
  (``zip_with`` + ``aggregate`` in double), per-query top-k via window.
* IVF (inverted-file) top-k — the scale path: corpus is bucketed to its
  nearest coarse centroid once (one shuffle); each query probes only the
  ``nprobe`` closest centroid buckets, turning O(N·Q) into
  O(N·Q·nprobe/C). Recall is tested against the brute-force oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hadoop_invertedindexer_spark.caching import tracked_persist
from hadoop_invertedindexer_spark.concurrency import (
    run_overlapped as _run_overlapped,
)
from hadoop_invertedindexer_spark.operators.dedup import (
    _dot,
    cosine_expr,
    lsh_bucket,
    vector_dim,
)
from hadoop_invertedindexer_spark.sources.tables import spread_if_narrow


def _norm(col) -> "F.Column":
    return F.sqrt(_dot(col, col))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k: broadcast queries x corpus, cosine in double, window
    top-k with deterministic (sim desc, id asc) tie-break.

    ``exclude_self`` (default) assumes queries are drawn FROM the corpus
    and share its id space, dropping the qid==vec_id identity match. For
    an independent query set whose ids coincidentally overlap corpus
    ids, pass ``exclude_self=False`` or a valid neighbor is silently
    dropped. Norms are hoisted into the per-side projections (O(N+Q)
    norm computations instead of O(N*Q) — per *pair* only the dot
    product remains). The corpus side spreads when its file provenance
    is narrow (r14, :func:`spread_if_narrow`): the O(N·Q) scoring
    stream otherwise runs inside a one-split scan stage on a single
    core. Output: (qid, vec_id, cosine, rank)."""
    c = spread_if_narrow(corpus, id_col).select(
        id_col, vec_col, _norm(F.col(vec_col)).alias("_cnorm")
    )
    q = queries.select(
        qid_col, qvec_col, _norm(F.col(qvec_col)).alias("_qnorm")
    )
    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.where(F.col(qid_col) != F.col(id_col))
    scored = joined.select(
        qid_col,
        id_col,
        F.round(
            _dot(F.col(qvec_col), F.col(vec_col)) / (F.col("_qnorm") * F.col("_cnorm")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Assign each corpus vector to its nearest centroid (cosine).
    centroids: (cid, cvec) — small, broadcast. One shuffle-free pass.

    r7, after the 30x soak profiled the O(N·C) scoring pass: (1) norms
    are HOISTED per side — `cosine_expr` per pair paid three
    higher-order dots (a·b, a·a, b·b); each side's norm is now computed
    once and only the cross dot remains per pair, measured 21.2 s →
    7.6 s for the 20k×64 scored stream (an UNROLLED 64-term codegen dot
    was also tried and measured WORSE, 34.6 s — the expression falls
    out of whole-stage codegen at that width and interprets
    element-by-element, so the higher-order fold stays); (2) the argmax
    is a ``max(struct(sim, -cid, cid))`` AGGREGATION, not a row_number
    window, so the scored stream combines map-side instead of sorting
    N·C rows (equal locally where scoring dominates; structurally
    better at cluster scale — no N·C-row sort exists at all).
    Selection and every rounded cosine are bit-identical to the r6 form
    (same IEEE operation sequence — ``dot/(sqrt(aa)·sqrt(bb))`` with
    the same fold order — and the same tie-break); the oracles prove
    it. ``dim`` is accepted for signature compatibility with the other
    scoring paths; the fold needs no static width. The corpus side
    spreads when its file provenance is narrow (r14,
    :func:`spread_if_narrow`): the O(N·C) scoring stream otherwise runs
    inside a one-split scan stage on a single core; derived/shuffled
    inputs (the kmeans sample, an exchange output) skip the spread —
    their parallelism is already set."""
    c = spread_if_narrow(corpus, id_col).select(
        id_col,
        vec_col,
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("_vn"),
    )
    cents = centroids.select(
        "cid",
        "cvec",
        F.sqrt(_dot(F.col("cvec"), F.col("cvec"))).alias("_cn"),
    )
    return _argmax_cid(
        c.crossJoin(F.broadcast(cents)).select(
            id_col,
            vec_col,
            "cid",
            (
                _dot(F.col(vec_col), F.col("cvec"))
                / (F.col("_vn") * F.col("_cn"))
            ).alias("sim"),
        ),
        id_col,
        vec_col,
    ).select(id_col, vec_col, "cid")


def _argmax_cid(scored: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, vec, cid, sim) of each vector's best-scoring centroid row:
    max over struct(sim, -cid, cid, vec) grouped by the SCALAR id only
    (partial agg — the N·C scored stream combines map-side, one row per
    vector reaches the exchange; grouping by the array column instead
    was measured SLOWER than the window it replaced, since an
    array-typed group key knocks the aggregate off the hash path). The
    vector rides in the struct payload: lexicographic struct-max never
    reaches it because (sim, -cid) is already a total order within a
    group. Ties on sim break to the LOWEST cid (the window form's
    ORDER BY sim DESC, cid ASC)."""
    return (
        scored.groupBy(id_col)
        .agg(
            F.max(
                F.struct(
                    F.col("sim"),
                    (-F.col("cid")).alias("_nc"),
                    F.col("cid"),
                    F.col(vec_col).alias("_v"),
                )
            ).alias("_best")
        )
        .select(
            id_col,
            F.col("_best._v").alias(vec_col),
            F.col("_best.cid").alias("cid"),
            F.col("_best.sim").alias("sim"),
        )
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    exclude_self: bool = True,
) -> DataFrame:
    """IVF approximate top-k: probe the nprobe nearest centroid buckets per
    query, exact cosine inside the probed buckets only. ``exclude_self``
    as in :func:`cosine_topk_bruteforce` (queries-from-corpus id space).
    Output: (qid, vec_id, cosine, rank)."""
    assigned = ivf_assign(corpus, centroids, id_col, vec_col).withColumn(
        "_cnorm", _norm(F.col(vec_col))
    )
    return _ivf_topk_from_assigned(
        assigned, queries, centroids, k, nprobe, id_col, vec_col, qid_col,
        qvec_col, exclude_self,
    )


def _probe_buckets(
    queries: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Each query's ``nprobe`` nearest centroid buckets (cosine desc,
    ties to the lowest cid — the family's standard tie-break). Output:
    (qid, qvec, cid), nprobe rows per query. Centroids are the bounded
    broadcast every IVF-shaped path shares; the expression tree is the
    one `_ivf_topk_from_assigned` always compiled, factored so the
    IVF-PQ path probes identically (same rounded-free ordering, same
    plan)."""
    qw = Window.partitionBy(qid_col).orderBy(F.desc("qsim"), F.asc("cid"))
    return (
        queries.crossJoin(F.broadcast(centroids))
        .select(
            qid_col,
            qvec_col,
            "cid",
            cosine_expr(F.col(qvec_col), F.col("cvec")).alias("qsim"),
        )
        .withColumn("rn", F.row_number().over(qw))
        .where(F.col("rn") <= nprobe)
        .select(qid_col, qvec_col, "cid")
    )


def _ivf_topk_from_assigned(
    assigned: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int,
    nprobe: int,
    id_col: str,
    vec_col: str,
    qid_col: str,
    qvec_col: str,
    exclude_self: bool,
) -> DataFrame:
    """Probe-and-score over an already-assigned corpus — shared by the
    in-memory path and the persisted-index path."""
    probes = _probe_buckets(
        queries, centroids, nprobe, qid_col, qvec_col
    ).withColumn("_qnorm", _norm(F.col(qvec_col)))
    scored = probes.join(assigned, "cid")
    if exclude_self:
        scored = scored.where(F.col(qid_col) != F.col(id_col))
    scored = scored.select(
        qid_col,
        id_col,
        F.round(
            _dot(F.col(qvec_col), F.col(vec_col)) / (F.col("_qnorm") * F.col("_cnorm")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def build_ivf_index(
    corpus: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index: assignments written *partitioned by
    cid* plus the centroid table. The one expensive pass (assignment)
    runs once at build time; at query time the bucket join hits the
    partition column, so Spark's dynamic partition pruning reads only
    the ~nprobe·|Q| probed bucket directories off disk — the on-disk
    analog of an inverted file. Precomputed norms ride along so queries
    never touch the raw corpus."""
    assigned = ivf_assign(corpus, centroids, id_col, vec_col).withColumn(
        "_cnorm", _norm(F.col(vec_col))
    )
    # one file per bucket directory, not one per write task (§6 — r14):
    # every probed-bucket read downstream opens fewer files; explicit N
    # keeps the writers parallel (a bare repartition("cid") is
    # AQE-coalescible down to one serial writer task)
    width = corpus.sparkSession.sparkContext.defaultParallelism

    def _write_assignments() -> None:
        assigned.repartition(width, "cid").write.mode(
            "overwrite"
        ).partitionBy("cid").parquet(f"{path}/assignments")

    def _write_centroids() -> None:
        centroids.coalesce(1).write.mode("overwrite").parquet(
            f"{path}/centroids"
        )

    # independent sinks overlap (guide §2.6) — see build_ivfpq_index
    _run_overlapped(_write_assignments, _write_centroids)


def append_ivf_index(
    batch: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append a new corpus batch to a persisted IVF index: assign the
    batch against the index's OWN centroid table (broadcast — one
    shuffle-free pass over the batch) and append into the cid-partitioned
    layout. Existing assignments are never read or rewritten, so ingest
    cost is O(batch) like the LSH/MinHash appends; the trade-off unique
    to IVF is that centroids are frozen at build time, so a drifting
    embedding distribution degrades bucket balance until the next
    offline rebuild (centroids_kmeans) — the standard IVF posture."""
    spark = batch.sparkSession
    centroids = spark.read.parquet(f"{path}/centroids")
    assigned = ivf_assign(batch, centroids, id_col, vec_col).withColumn(
        "_cnorm", _norm(F.col(vec_col))
    )
    width = batch.sparkSession.sparkContext.defaultParallelism
    assigned.repartition(width, "cid").write.mode("append").partitionBy(
        "cid"
    ).parquet(f"{path}/assignments")


def query_ivf_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    exclude_self: bool = True,
) -> DataFrame:
    """Query a persisted IVF index without re-assigning the corpus.
    Results are identical to :func:`cosine_topk_ivf` over the same
    corpus/centroids (proven by test); the corpus-side work drops to a
    pruned read of the probed buckets."""
    assigned = spark.read.parquet(f"{path}/assignments")
    centroids = spark.read.parquet(f"{path}/centroids")
    return _ivf_topk_from_assigned(
        assigned, queries, centroids, k, nprobe, id_col, vec_col, qid_col,
        qvec_col, exclude_self,
    )


def _lsh_tables(vec_col: str, dim: int, nbits: int, ntables: int, seed: int):
    """(table_idx, bucket) pairs, one signature per independent table —
    exploded so the bucket join key is (table, signature)."""
    sigs = F.array(
        *[lsh_bucket(vec_col, dim, nbits, seed + 1000 * t) for t in range(ntables)]
    )
    return F.posexplode(sigs)


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nbits: int = 8,
    ntables: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    dim: int | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Multi-table LSH approximate top-k: the second scale path next to
    IVF (SURVEY §2B). Corpus and queries are signed by ntables independent
    sets of nbits random hyperplanes; candidates are rows sharing any
    table's bucket, so per-table the pair count drops from N·Q to
    ~N·Q/2^nbits and the tables union away boundary misses (a vector
    sitting on one table's hyperplane still collides in the others —
    miss prob (1-(1-θ/π)^nbits)^ntables). Unlike IVF there is no centroid
    pass — the signatures are pure projections, so a write-once corpus
    persists them and each incremental query batch is a co-partitioned
    lookup, not a rescan. Pass ``dim`` to skip the first-row probe;
    ``exclude_self`` as in :func:`cosine_topk_bruteforce`.
    Output: (qid, vec_id, cosine, rank)."""
    dim = vector_dim(corpus, vec_col, dim)
    c = corpus.select(
        id_col,
        vec_col,
        _norm(F.col(vec_col)).alias("_cnorm"),
        _lsh_tables(vec_col, dim, nbits, ntables, seed).alias("_table", "_bucket"),
    )
    q = queries.select(
        qid_col,
        qvec_col,
        _norm(F.col(qvec_col)).alias("_qnorm"),
        _lsh_tables(qvec_col, dim, nbits, ntables, seed).alias("_table", "_bucket"),
    )
    return _lsh_topk_from_candidates(
        c.join(F.broadcast(q), ["_table", "_bucket"]),
        k, id_col, vec_col, qid_col, qvec_col, exclude_self,
    )


def _lsh_topk_from_candidates(
    candidates: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    qid_col: str,
    qvec_col: str,
    exclude_self: bool,
) -> DataFrame:
    """Score-and-rank tail shared by the in-memory LSH path and the
    persisted-index path: dedup multi-table collisions, exact cosine from
    the precomputed norms, per-query window top-k."""
    if exclude_self:
        candidates = candidates.where(F.col(qid_col) != F.col(id_col))
    # a pair colliding in several tables must score once, not ntables×
    candidates = candidates.dropDuplicates([qid_col, id_col])
    scored = candidates.select(
        qid_col,
        id_col,
        F.round(
            _dot(F.col(qvec_col), F.col(vec_col))
            / (F.col("_qnorm") * F.col("_cnorm")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def build_lsh_index(
    corpus: DataFrame,
    path: str,
    nbits: int = 8,
    ntables: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> None:
    """Materialize the multi-table LSH index: per-vector signatures written
    *partitioned by (_table, _bucket)* plus a one-row params table pinning
    (dim, nbits, ntables, seed) so queries regenerate the identical
    hyperplane constants. The signature pass runs once at build time; at
    query time the bucket join hits the partition columns, so dynamic
    partition pruning reads only the collided bucket directories —
    ntables·|distinct query buckets| dirs, never the whole corpus. The
    IVF counterpart is :func:`build_ivf_index`; unlike IVF there is no
    centroid model, so incremental corpus batches can append their
    signatures without touching existing buckets.

    The bucket key is stored with a ``b`` prefix: partition directory
    values round-trip through path strings and Spark would otherwise
    infer all-digit sign patterns ('0101') back as integers, corrupting
    the equi-join key.
    """
    dim = vector_dim(corpus, vec_col, dim)
    signed = corpus.select(
        id_col,
        vec_col,
        _norm(F.col(vec_col)).alias("_cnorm"),
        _lsh_tables(vec_col, dim, nbits, ntables, seed).alias("_table", "_bucket"),
    ).withColumn("_bucket", F.concat(F.lit("b"), F.col("_bucket")))
    signed.write.mode("overwrite").partitionBy("_table", "_bucket").parquet(
        f"{path}/signatures"
    )
    params = corpus.sparkSession.createDataFrame(
        [(dim, nbits, ntables, seed)], "dim int, nbits int, ntables int, seed int"
    )
    params.write.mode("overwrite").parquet(f"{path}/params")


def append_lsh_index(
    batch: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append a new corpus batch's signatures to a persisted LSH index —
    the daily-ingest path: sign the batch with the index's pinned params
    and append into the same bucket layout. No existing data is read or
    rewritten (signatures are pure per-row projections, unlike IVF
    centroids), so the cost is O(batch) regardless of index size."""
    spark = batch.sparkSession
    p = spark.read.parquet(f"{path}/params").head()
    signed = batch.select(
        id_col,
        vec_col,
        _norm(F.col(vec_col)).alias("_cnorm"),
        _lsh_tables(vec_col, p.dim, p.nbits, p.ntables, p.seed).alias(
            "_table", "_bucket"
        ),
    ).withColumn("_bucket", F.concat(F.lit("b"), F.col("_bucket")))
    signed.write.mode("append").partitionBy("_table", "_bucket").parquet(
        f"{path}/signatures"
    )


def query_lsh_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    exclude_self: bool = True,
) -> DataFrame:
    """Query a persisted LSH index without re-signing the corpus. Results
    are identical to :func:`cosine_topk_lsh` over the same corpus and
    params (proven by test). The query batch is signed with the same
    literal hyperplanes (params read once — one tiny driver job at query
    setup, index metadata not data), broadcast, and equi-joined on the
    partition columns, so the corpus side is a pruned read of the
    collided bucket directories only."""
    p = spark.read.parquet(f"{path}/params").head()
    signed = spark.read.parquet(f"{path}/signatures")
    q = queries.select(
        qid_col,
        qvec_col,
        _norm(F.col(qvec_col)).alias("_qnorm"),
        _lsh_tables(qvec_col, p.dim, p.nbits, p.ntables, p.seed).alias(
            "_table", "_bucket"
        ),
    ).withColumn("_bucket", F.concat(F.lit("b"), F.col("_bucket")))
    return _lsh_topk_from_candidates(
        signed.join(F.broadcast(q), ["_table", "_bucket"]),
        k, id_col, vec_col, qid_col, qvec_col, exclude_self,
    )


def centroids_by_sampling(
    corpus: DataFrame,
    every: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse centroids: every ``every``-th vector by id —
    the standard IVF bootstrap, and the init for
    :func:`centroids_kmeans`, which lowers their variance.

    SCALE WARNING (VERDICT r6 item 1): C = N/``every`` grows with the
    corpus, so a flat broadcast assignment against these centroids is
    O(N²/every) with a linearly growing broadcast side. Appropriate only
    when the corpus size is known and bounded (the oracle-pinned
    contract queries); for a growing corpus use
    :func:`centroids_bounded` (C fixed at k) — the `semantic_dedup`
    default since r7 — or cap C and route large centroid sets through
    :func:`ivf_assign_two_level`."""
    return corpus.where(F.col(id_col) % every == 0).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
    )


def md5_order_key(col) -> "F.Column":
    """Deterministic, engine-portable pseudo-random order key: the first
    60 bits of md5(string(col)) as a bigint. Spark's ``conv(substr(md5(x
    ),1,15),16,10)`` ≡ DuckDB's ``('0x'||substr(md5(x),1,15))::BIGINT``,
    so a sample defined as ``ORDER BY md5_order_key LIMIT k`` is
    bit-reproducible in the ANSI-SQL oracle — the same portability trick
    as the MinHash md5-60bit twin."""
    return F.conv(
        F.substring(F.md5(F.col(col).cast("string") if isinstance(col, str) else col.cast("string")), 1, 15),
        16,
        10,
    ).cast("bigint")


def centroids_bounded(
    corpus: DataFrame,
    k: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """BOUNDED-cardinality centroid init (VERDICT r6 item 1): exactly
    ``min(k, N)`` corpus vectors, chosen by the portable md5 order — a
    deterministic uniform-without-replacement sample whose size does NOT
    grow with the corpus (unlike :func:`centroids_by_sampling`, whose
    every-``every``-th policy makes C ∝ N and the downstream broadcast
    assignment O(N²/every)). The pick is ``orderBy(key).limit(k)`` =
    TakeOrderedAndProject — the distributed two-phase top-k, no global
    sort, no single-task window. Refine with :func:`centroids_kmeans`
    over a sample for lower variance."""
    return (
        corpus.select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).alias("cvec"),
            md5_order_key(id_col).alias("_mk"),
        )
        .orderBy("_mk", "cid")
        .limit(k)
        .drop("_mk")
    )


def ivf_assign_two_level(
    corpus: DataFrame,
    centroids: DataFrame,
    coarse_every: int = 32,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment for centroid sets too large to
    broadcast whole (VERDICT r6 item 1's large-K route): a COARSE tier —
    every centroid whose hashed id lands in bucket 0 mod ``coarse_every``,
    so ~C/coarse_every rows — is broadcast; each centroid equi-joins into
    its nearest coarse cell once, and each corpus vector probes only its
    ``nprobe`` nearest coarse cells, scoring ~nprobe·coarse_every
    centroids instead of all C. Same output contract as
    :func:`ivf_assign`: (id_col, vec_col, cid).

    Scale shape: broadcast side = C/coarse_every rows (tunable, NOT
    corpus-proportional when C is bounded); the only corpus shuffle is
    the equi-join on the coarse cell id, with fanout exactly nprobe.
    APPROXIMATE in the same sense as IVF probing: exact whenever the
    true nearest centroid lies in one of the nprobe probed cells —
    raise ``nprobe`` to trade cost for exactness (equality with the flat
    pass on separated clusters is pinned by test). Falls back to the
    flat broadcast pass when the coarse tier would be empty (tiny C —
    the emptiness check is one job on the CENTROID frame, metadata
    scale, never the corpus)."""
    cents = centroids.select(
        F.col("cid"),
        F.col("cvec"),
        F.pmod(F.xxhash64("cid"), F.lit(coarse_every)).alias("_cb"),
        F.sqrt(_dot(F.col("cvec"), F.col("cvec"))).alias("_cn"),
    )
    # probe emptiness BEFORE persisting (ADVICE r7: persisting first
    # leaked a held centroid frame + one count() job on every
    # small-C fallback call); persist only on the two-level route,
    # where cents feeds both the cent2cell and coarse consumers
    if cents.where(F.col("_cb") == 0).limit(1).count() == 0:
        return ivf_assign(corpus, centroids, id_col, vec_col)
    cents = cents.transform(tracked_persist)
    coarse = cents.where(F.col("_cb") == 0).select(
        F.col("cid").alias("gid"),
        F.col("cvec").alias("gvec"),
        F.col("_cn").alias("_gn"),
    )
    # every per-pair cosine below pays ONE higher-order dot: norms are
    # hoisted per side (measured 3x off the O(N·C) scoring stream)
    cent2cell = (
        cents.crossJoin(F.broadcast(coarse))
        .select(
            "cid", "cvec", "gid",
            (
                _dot(F.col("cvec"), F.col("gvec"))
                / (F.col("_cn") * F.col("_gn"))
            ).alias("sim"),
        )
        .groupBy("cid", "cvec")
        .agg(
            F.max(
                F.struct(F.col("sim"), (-F.col("gid")).alias("_ng"), F.col("gid"))
            ).alias("_best")
        )
        .select(F.col("_best.gid").alias("gid"), "cid", "cvec")
    )
    corp = corpus.select(
        id_col,
        vec_col,
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("_vn"),
    ).transform(tracked_persist)
    # top-nprobe coarse cells per vector WITHOUT a window: a window
    # would sort/exchange all N·(C/coarse_every) scored rows; instead
    # collect the per-vector cell scores (≤ C/coarse_every structs),
    # sort that small array, slice nprobe — ObjectHashAggregate with
    # map-side partials, no big-stream sort. Ordering matches the
    # window form: (-gsim asc, gid asc) ≡ (gsim desc, gid asc). The
    # vector re-attaches by ONE id join against the persisted corpus
    # projection rather than riding every scored row.
    top_cells = (
        corp.crossJoin(F.broadcast(coarse))
        .select(
            id_col, "gid",
            (
                _dot(F.col(vec_col), F.col("gvec"))
                / (F.col("_vn") * F.col("_gn"))
            ).alias("gsim"),
        )
        .groupBy(id_col)
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct((-F.col("gsim")).alias("ng"), F.col("gid"))
                    )
                ),
                1,
                nprobe,
            ).alias("_cells")
        )
        .select(id_col, F.explode("_cells").alias("_c"))
        .select(id_col, F.col("_c.gid").alias("gid"))
    )
    probed = top_cells.join(corp, id_col).select(id_col, vec_col, "_vn", "gid")
    # the in-cell scoring stream (N·nprobe·cell_size rows) is the big
    # intermediate — argmax by partial-aggregable max(struct), same as
    # the flat pass, so it collapses map-side instead of sorting
    cell_cents = cent2cell.join(
        cents.select("cid", "_cn"), "cid"
    ).select("gid", "cid", "cvec", "_cn")
    return _argmax_cid(
        probed.join(cell_cents, "gid").select(
            id_col, vec_col, "cid",
            (
                _dot(F.col(vec_col), F.col("cvec"))
                / (F.col("_vn") * F.col("_cn"))
            ).alias("sim"),
        ),
        id_col,
        vec_col,
    ).select(id_col, vec_col, "cid")


def centroids_kmeans(
    corpus: DataFrame,
    init: DataFrame | None = None,
    every: int = 100,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    portable: bool = False,
) -> DataFrame:
    """Lloyd-refined IVF centroids, entirely as DataFrame ops (no MLlib,
    no collect — the iterative loop pattern of ``operators/graph.py``).

    Each iteration: (1) assign every vector to its nearest centroid by
    cosine (broadcast centroids, one wide pass); (2) recompute each
    centroid as the element-wise mean of its members — ``posexplode`` →
    partial+final avg per (cid, pos) → re-assemble with
    ``array_sort(collect_list(struct(pos, mean)))``, all JVM-side; (3) a
    centroid that lost every member keeps its previous position (left
    join + coalesce), so the centroid count — and therefore the IVF
    bucket layout — is stable across iterations. The tiny centroid frame
    is localCheckpoint-ed per iteration to truncate lineage, exactly as
    in pagerank.

    At 100 TB: per iteration the corpus-side cost is one broadcast
    nearest-centroid pass plus one shuffle of (cid, pos, x) rows — the
    same order as the single assignment pass IVF pays at build time
    anyway, and the refinement runs only at index-build, never at query
    time. Deterministic for a fixed init (means are order-insensitive up
    to fp addition order; values are rounded by downstream consumers).

    ``portable=True`` is the oracle-checkable twin: since cosine is
    scale-invariant, Lloyd assignment doesn't need the mean DIVISION at
    all — the exact integer SUM vector points the same way. Each member
    coordinate quantizes as ``floor(x * 2^20)`` (float32·2^20 is exact
    in double, floor is exact, bigint sums are exact and re-cast to
    double losslessly below 2^53), so every iteration — and therefore
    the final centroid set — is bit-reproducible in ANSI SQL, which is
    what lets the driver value-check the whole refinement loop. The
    default fp-mean path remains the scale default (float means, no
    quantization step); both produce the same bucket geometry up to the
    2^-20 quantization angle.
    """
    cents = (
        init
        if init is not None
        else centroids_by_sampling(corpus, every, id_col, vec_col)
    )
    if portable:
        # uniform double representation so coalesce types line up and
        # the SQL twin's literal arithmetic matches exactly
        cents = cents.select(
            "cid", F.col("cvec").cast("array<double>").alias("cvec")
        )
    cents = cents.localCheckpoint()
    for _ in range(n_iters):
        assigned = ivf_assign(corpus, cents, id_col, vec_col)
        if portable:
            agg_x = F.sum(
                F.floor(F.col("x").cast("double") * F.lit(1048576.0)).cast(
                    "bigint"
                )
            ).alias("mx")
            recast = lambda s: s["mx"].cast("double")  # noqa: E731
        else:
            agg_x = F.avg("x").alias("mx")
            recast = lambda s: s["mx"].cast("float")  # noqa: E731
        means = (
            assigned.select("cid", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(agg_x)
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mx"))),
                    recast,
                ).alias("_mean")
            )
        )
        cents = (
            cents.join(means, "cid", "left")
            .select("cid", F.coalesce("_mean", "cvec").alias("cvec"))
            .localCheckpoint()
        )
    return cents


def bounded_centroids_refined(
    corpus: DataFrame,
    k: int = 256,
    sample_mult: int = 4,
    refine_iters: int = 2,
    portable: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The engine's standard bounded-K centroid policy (semantic_dedup's
    default, shared with the drift/rebuild helpers): min(k, N)
    md5-ordered seeds Lloyd-refined over a ``k·sample_mult`` md5-ordered
    corpus sample — refinement cost independent of N. The sample is
    persisted because every Lloyd iteration re-assigns it; without the
    persist each iteration re-runs the corpus-wide
    TakeOrderedAndProject selection."""
    sample = (
        corpus.select(id_col, vec_col, md5_order_key(id_col).alias("_mk"))
        .orderBy("_mk", id_col)
        .limit(k * sample_mult)
        .drop("_mk")
        .transform(tracked_persist)
    )
    init = centroids_bounded(sample, k, id_col, vec_col)
    return centroids_kmeans(
        sample,
        init=init,
        n_iters=refine_iters,
        id_col=id_col,
        vec_col=vec_col,
        portable=portable,
    )


def ivf_index_drift(
    spark,
    path: str,
    vec_col: str = "embedding",
) -> DataFrame:
    """Index-health metrics for a persisted IVF index (VERDICT r7 ask
    5): IVF centroids are FROZEN at build time, so a drifting embedding
    distribution degrades the index silently — appended vectors land
    far from every centroid (quantization error up) and pile into few
    buckets (imbalance up), which widens the true-neighbor miss rate at
    fixed nprobe. This is the monitoring half of the standard offline
    posture; :func:`rebuild_ivf_index` is the remediation half.

    Returns ONE row:

    * ``n_vectors``, ``n_centroids``, ``n_empty_buckets``,
      ``max_bucket`` — occupancy shape;
    * ``imbalance`` = max_bucket · n_centroids / n_vectors (1.0 =
      perfectly even; grows as drift concentrates mass), round(6);
    * ``avg_qerr``, ``max_qerr`` = 1 − cos(v, assigned centroid),
      round(6) — the quantization-error distribution.

    Cost: one pruned read of the assignments (the stored ``_cnorm``
    rides along — the raw corpus is never touched) joined against the
    broadcast centroid table; no new assignment pass, no shuffle beyond
    the two metadata-scale aggregates."""
    assigned = spark.read.parquet(f"{path}/assignments")
    cents = spark.read.parquet(f"{path}/centroids").select(
        "cid",
        "cvec",
        F.sqrt(_dot(F.col("cvec"), F.col("cvec"))).alias("_cn"),
    )
    scored = assigned.join(F.broadcast(cents), "cid").select(
        "cid",
        (
            F.lit(1.0)
            - _dot(F.col(vec_col), F.col("cvec"))
            / (F.col("_cnorm") * F.col("_cn"))
        ).alias("qerr"),
    )
    vec_stats = scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.avg("qerr").alias("_avg_qerr"),
        F.max("qerr").alias("_max_qerr"),
    )
    bucket_stats = (
        scored.groupBy("cid")
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(
            F.max("_n").cast("long").alias("max_bucket"),
            F.count(F.lit(1)).cast("long").alias("_n_used"),
        )
    )
    cent_count = cents.agg(F.count(F.lit(1)).cast("long").alias("n_centroids"))
    return (
        vec_stats.crossJoin(F.broadcast(bucket_stats))
        .crossJoin(F.broadcast(cent_count))
        .select(
            "n_vectors",
            "n_centroids",
            (F.col("n_centroids") - F.col("_n_used")).alias(
                "n_empty_buckets"
            ),
            "max_bucket",
            F.round(
                F.col("max_bucket") * F.col("n_centroids") / F.col("n_vectors"),
                6,
            ).alias("imbalance"),
            F.round("_avg_qerr", 6).alias("avg_qerr"),
            F.round("_max_qerr", 6).alias("max_qerr"),
        )
    )


def rebuild_ivf_index(
    spark,
    path: str,
    dest_path: str,
    k: int = 256,
    sample_mult: int = 4,
    refine_iters: int = 2,
    portable: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Offline rebuild for a drifted IVF index (VERDICT r7 ask 5, the
    remediation half of :func:`ivf_index_drift`): derive fresh bounded-K
    centroids from the index's CURRENT contents — the md5-ordered sample
    + Lloyd policy, so appended vectors finally influence the centroid
    layout — and rewrite the cid-partitioned index at ``dest_path``.

    ``dest_path`` is a separate directory by design: Spark cannot safely
    overwrite parquet it is still reading, so rebuilds write fresh and
    the caller rotates the symlink/pointer — the standard offline index
    rotation. Reads only the persisted assignments (id + vector); the
    original corpus is never touched, and ingest can keep appending to
    the old index until the swap. In-place guard (r13): direct callers
    get the same protection as the maintainer wrapper."""
    from hadoop_invertedindexer_spark.fsutil import guard_rotation

    guard_rotation(spark, path, dest_path, "IVF rebuild")
    corpus = spark.read.parquet(f"{path}/assignments").select(
        id_col, vec_col
    )
    cents = bounded_centroids_refined(
        corpus, k, sample_mult, refine_iters, portable, id_col, vec_col
    )
    build_ivf_index(corpus, cents, dest_path, id_col, vec_col)


def maintain_ivf_index(
    spark,
    path: str,
    dest_path: str,
    max_avg_qerr_mils: int = 300,
    max_imbalance_mils: int = 4000,
    k: int | None = None,
    sample_mult: int = 4,
    refine_iters: int = 2,
    portable: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Drift-triggered auto-rebuild — the ANN twin of
    ``dedup.maintain_index_tier`` (r12), closing the IVF maintenance
    loop the same way: :func:`ivf_index_drift` is the trigger,
    :func:`rebuild_ivf_index` the remediation, and this wrapper wires
    them behind fleet thresholds. Reads the index's one-row drift
    report, rotates a freshly-recentered rebuild into ``dest_path``
    ONLY when the quantization error or bucket imbalance crosses its
    threshold (both in mils — ``avg_qerr`` > ``max_avg_qerr_mils``/1000
    OR ``imbalance`` > ``max_imbalance_mils``/1000), and reports what
    happened: the drift row as measured (PRE-rebuild — the evidence the
    decision was made on) plus a ``rebuilt`` flag.

        (n_vectors, n_centroids, n_empty_buckets, max_bucket,
         imbalance, avg_qerr, max_qerr, rebuilt)

    Below threshold NOTHING is written — ``dest_path`` stays absent and
    ingest keeps appending to ``path``; after a triggered rotation the
    caller swaps its pointer to ``dest_path`` (the same rotation
    contract as the compaction tiers), where queries run against
    centroids that have finally seen the appended distribution.
    ``k`` defaults to the index's current centroid count, so a rebuild
    preserves the index's capacity unless the caller re-sizes it.

    Scale shape: the decision reads ONE aggregate row (metadata-scale
    collect — the probe-then-extend pattern); the rebuild itself is the
    bounded-K recenter + one assignment pass over the stored
    assignments (never the raw corpus). In-place guard as in
    ``_compact_key_tier``: realpath for local symlinks PLUS Hadoop
    FileSystem qualification for remote URIs (``fsutil.guard_rotation``,
    r13)."""
    from hadoop_invertedindexer_spark.fsutil import guard_rotation

    guard_rotation(spark, path, dest_path, "IVF rebuild")
    stats = ivf_index_drift(spark, path, vec_col).head()
    # Empty index → drift metrics come back NULL (no assignments to
    # average over). No evidence is not evidence of drift: report
    # rebuilt=False rather than TypeError on None arithmetic — the same
    # policy as maintain_bpe_model's empty-probe branch (ADVICE r12).
    rebuilt = (
        stats.avg_qerr is not None
        and stats.imbalance is not None
        and (
            stats.avg_qerr * 1000 > max_avg_qerr_mils
            or stats.imbalance * 1000 > max_imbalance_mils
        )
    )
    if rebuilt:
        rebuild_ivf_index(
            spark,
            path,
            dest_path,
            k=int(k if k is not None else stats.n_centroids),
            sample_mult=sample_mult,
            refine_iters=refine_iters,
            portable=portable,
            id_col=id_col,
            vec_col=vec_col,
        )
    return spark.createDataFrame(
        [
            (
                stats.n_vectors,
                stats.n_centroids,
                stats.n_empty_buckets,
                stats.max_bucket,
                stats.imbalance,
                stats.avg_qerr,
                stats.max_qerr,
                rebuilt,
            )
        ],
        "n_vectors BIGINT, n_centroids BIGINT, n_empty_buckets BIGINT,"
        " max_bucket BIGINT, imbalance DOUBLE, avg_qerr DOUBLE,"
        " max_qerr DOUBLE, rebuilt BOOLEAN",
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.4,
    every: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    k: int = 256,
    refine_iters: int = 2,
    sample_mult: int = 4,
    portable: bool = False,
    max_broadcast_centroids: int = 8192,
    coarse_every: int = 32,
    nprobe: int = 2,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings coarsely, then WITHIN each
    cluster drop any member that has a semantic near-duplicate (pair
    cosine >= ``threshold``) which sits FARTHER from the centroid — the
    paper's keep-the-marginal-example policy (low centroid-similarity
    survives, redundant central mass is pruned), pinned to a total order
    (centroid-cosine asc, id asc) so the survivor set is deterministic
    across partitionings and engines. Complements the exact/MinHash/
    SimHash families (surface duplication) and
    ``embedding_near_dup_pairs`` (pairwise output): this one makes the
    KEEP decision, at cluster scope.

    Returns every corpus row: (``id_col``, cid, cent_cos, is_kept).

    Centroid policy (VERDICT r6 item 1 — the old default, every-50th
    vector, made C ∝ N and the broadcast assignment O(N²/every), the
    one all-pairs-shaped default left in the engine):

    * default — BOUNDED K: ``min(k, N)`` md5-sampled seeds
      (:func:`centroids_bounded`) Lloyd-refined by
      :func:`centroids_kmeans` over a ``k·sample_mult`` md5-ordered
      corpus SAMPLE (so the refinement cost is O(k²·sample_mult) per
      iteration — independent of N); ``portable=True`` selects the
      integer-exact refinement arithmetic so the whole default path is
      oracle-checkable;
    * ``centroids=`` — caller-pinned frame, used verbatim (the contract
      query pins the r6 sampled centroids this way, keeping its oracle
      hash);
    * ``every=`` — the legacy unbounded policy, EXPLICIT opt-in only.

    Scale shape: the corpus-wide ops are ONE nearest-centroid assignment
    pass — flat broadcast (O(N·k) dot products, no corpus shuffle) while
    the centroid count stays ≤ ``max_broadcast_centroids``, else the
    two-level coarse-quantizer route (:func:`ivf_assign_two_level`,
    broadcast side ~C/coarse_every) — and ONE shuffle on cid for the
    in-cluster self-join; pair expansion is bounded by cluster size
    (~N/k), never corpus². At 100 TB the knob is ``k``: more clusters →
    smaller all-pairs scopes, assignment cost linear in N at fixed k
    (soaked 1×/10×/30× in SCALE.md). Norms are hoisted per side so each
    pair pays only its dot product. The assignment subtree is consumed
    by both self-join sides AND the output join, so it runs through
    ``tracked_persist`` (ADVICE r6) — one pass per action, released by
    session owners via ``caching.release_persisted``."""
    if centroids is not None:
        cents = centroids
        flat = True  # caller-pinned frames are contract-scale; the
        # large-K caller route is ivf_assign_two_level directly
    elif every is not None:
        cents = centroids_by_sampling(corpus, every, id_col, vec_col)
        flat = True
    else:
        cents = bounded_centroids_refined(
            corpus, k, sample_mult, refine_iters, portable, id_col, vec_col
        )
        flat = k <= max_broadcast_centroids
    if flat:
        # one higher-order dot per pair (norms hoisted per side) and
        # argmax via partial-aggregable max(struct) — the N·C scored
        # stream combines map-side instead of sorting (same as
        # ivf_assign; the r7 soak profiled the per-pair 3-dot cosine as
        # the dominant assignment cost)
        corp = corpus.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("_vn"),
        )
        cenn = cents.select(
            "cid",
            "cvec",
            F.sqrt(_dot(F.col("cvec"), F.col("cvec"))).alias("_cn"),
        )
        nearest = _argmax_cid(
            corp.crossJoin(F.broadcast(cenn)).select(
                "id",
                "v",
                "cid",
                (
                    _dot(F.col("v"), F.col("cvec"))
                    / (F.col("_vn") * F.col("_cn"))
                ).alias("sim"),
            ),
            "id",
            "v",
        )
    else:
        two = ivf_assign_two_level(
            corpus, cents, coarse_every, nprobe, id_col, vec_col
        )
        nearest = two.join(F.broadcast(cents), "cid").select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            "cid",
            cosine_expr(F.col(vec_col), F.col("cvec")).alias("sim"),
        )
    assigned = nearest.select(
        "id",
        "v",
        "cid",
        F.round("sim", 6).alias("cent_cos"),
        _norm(F.col("v")).alias("nrm"),
    ).transform(tracked_persist)
    a, b = assigned.alias("a"), assigned.alias("b")
    pair_cos = F.round(
        _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm")),
        6,
    )
    more_marginal = (F.col("b.cent_cos") < F.col("a.cent_cos")) | (
        (F.col("b.cent_cos") == F.col("a.cent_cos"))
        & (F.col("b.id") < F.col("a.id"))
    )
    dropped = (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .where((pair_cos >= threshold) & more_marginal)
        .select(F.col("a.id").alias("id"))
        .distinct()
    )
    return (
        assigned.join(
            dropped.withColumn("_drop", F.lit(True)), "id", "left"
        )
        .select(
            F.col("id").alias(id_col),
            "cid",
            "cent_cos",
            F.col("_drop").isNull().alias("is_kept"),
        )
    )


def knn_classify(
    neighbors: DataFrame,
    labels: DataFrame,
    id_col: str = "vec_id",
    qid_col: str = "qid",
    label_col: str = "label",
) -> DataFrame:
    """k-NN majority-vote classification over ANY neighbor frame — the
    standard label-propagation / weak-labeling step of a training-data
    pipeline (assign a quality/domain/topic label to every unlabeled
    item from its nearest labeled items). ``neighbors`` is the output of
    any of the ANN backends (cosine_topk_bruteforce / _ivf / _lsh /
    pq_adc_topk — all emit (qid, vec_id, ..., rank)), so at 100 TB the
    expensive part is whichever index-backed top-k you already run; the
    vote itself is one shuffle of k rows per query. Ties break to the
    lowest label id for determinism. Output: (qid, pred_label, votes)."""
    # Q*k neighbor rows vs an arbitrarily large label table: broadcast
    # the neighbor side so the labels scan never shuffles
    labeled = F.broadcast(neighbors.select(qid_col, id_col)).join(
        labels.select(id_col, label_col), id_col
    )
    votes = labeled.groupBy(qid_col, label_col).agg(
        F.count("*").alias("votes")
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("votes"), F.asc(label_col))
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            qid_col,
            F.col(label_col).alias("pred_label"),
            F.col("votes").cast("bigint").alias("votes"),
        )
    )


def _pq_quantized_coords(col) -> "F.Column":
    """Integer coordinate grid for PQ: floor(x * 2^10) as bigint.
    float32 * 1024 is exact in double and floor is exact, so every
    downstream squared-distance is exact integer arithmetic — the same
    portability trick as centroids_kmeans(portable=True), which is what
    lets the whole PQ pipeline value-hash against an ANSI-SQL oracle.
    The 2^-10 grid angle is far below the quantization error PQ itself
    introduces, so recall is unaffected."""
    return F.transform(
        col, lambda x: F.floor(x.cast("double") * F.lit(1024.0)).cast("bigint")
    )


def _pq_subvectors(qx_col, m: int, dsub: int) -> "F.Column":
    """array of the m disjoint dsub-wide subvector slices."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.slice(qx_col, s * dsub + 1, dsub),
    )


def _pq_sqdist(a, b) -> "F.Column":
    """Exact integer squared L2 between two quantized subvectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Deterministic product-quantization codebooks: the dim-wide space
    splits into m disjoint dsub=dim/m subspaces; subspace s's codebook is
    the s-th subvector of the first ksub corpus vectors (by id) — the
    same deterministic bootstrap as centroids_by_sampling, refinable
    offline exactly like centroids_kmeans. Output: (s, c, cq) with cq the
    quantized integer subvector. Tiny frame (m*ksub rows) — always
    broadcast by consumers."""
    dim = vector_dim(corpus, vec_col, dim)
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    w = Window.orderBy(id_col)
    train = (
        corpus.orderBy(id_col)
        .limit(ksub)
        .select(id_col, _pq_quantized_coords(F.col(vec_col)).alias("_qx"))
        .withColumn("c", (F.row_number().over(w) - 1).cast("int"))
    )
    return train.select(
        "c", F.posexplode(_pq_subvectors(F.col("_qx"), m, dsub)).alias("s", "cq")
    ).select(F.col("s").cast("int").alias("s"), "c", "cq")


def pq_codebooks_refined(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    sample_mult: int = 4,
    refine_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Bounded k-means refinement of the PQ codebooks, per subspace
    (r14, VERDICT r13 ask 3 — the ``bounded_centroids_refined`` policy
    applied to the m subspaces): a ``ksub·sample_mult`` md5-ordered
    corpus sample seeds with :func:`pq_codebooks`'s first-ksub
    bootstrap and Lloyd-refines each subspace's codebook for
    ``refine_iters`` iterations — refinement cost independent of N,
    determinism preserved end to end (md5 sample, exact-integer
    distances, floor-of-mean codewords, ties to the lowest codeword),
    so the refined codebooks and everything encoded at them still
    value-hash against an ANSI-SQL oracle.

    Codeword update: element-wise ``floor(sum(x)/n)`` over the
    members' quantized coordinates — exact while |sum| < 2^53, which a
    bounded sample on the 2^10 grid cannot approach; empty codewords
    keep their previous vector (the ``centroids_kmeans`` posture).
    Why it matters: the first-ksub bootstrap prices plain ADC recall
    at whatever the first 16 vectors happen to span (155 mils in the
    r13 soak); k-means codewords cut per-subspace quantization error,
    lifting the plain-ADC floor and shrinking the rerank shortlist a
    recall target needs. Output: (s, c, cq) — drop-in for every
    codebook consumer. All m subspaces refine in the SAME plan (one
    sample scan per iteration, subspace id is just a group key)."""
    dim = vector_dim(corpus, vec_col, dim)
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    sample = (
        corpus.select(id_col, vec_col, md5_order_key(id_col).alias("_mk"))
        .orderBy("_mk", id_col)
        .limit(ksub * sample_mult)
        .drop("_mk")
        .transform(tracked_persist)  # init + every Lloyd iteration
    )
    subs = sample.select(
        id_col,
        F.posexplode(
            _pq_subvectors(_pq_quantized_coords(F.col(vec_col)), m, dsub)
        ).alias("s", "sub"),
    )
    cb = pq_codebooks(sample, m, ksub, id_col, vec_col, dim).localCheckpoint()
    for _ in range(refine_iters):
        # the (id, s) group has ONE subvector: min(struct(d, c, sub))
        # never compares sub because (d, c) is already a total order —
        # the _argmax_cid payload trick
        best = (
            subs.join(F.broadcast(cb), "s")
            .select(
                id_col,
                "s",
                F.struct(
                    _pq_sqdist(F.col("sub"), F.col("cq")).alias("d"),
                    F.col("c"),
                    F.col("sub").alias("_sub"),
                ).alias("dc"),
            )
            .groupBy(id_col, "s")
            .agg(F.min("dc").alias("b"))
        )
        newc = (
            best.select(
                "s",
                F.col("b.c").alias("c"),
                F.posexplode("b._sub").alias("pos", "x"),
            )
            .groupBy("s", "c", "pos")
            .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n"))
            .select(
                "s",
                "c",
                "pos",
                F.floor(F.col("sx") / F.col("n")).cast("bigint").alias("v"),
            )
            .groupBy("s", "c")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "v"))),
                    lambda t: t["v"],
                ).alias("_cq")
            )
        )
        cb = (
            cb.join(newc, ["s", "c"], "left")
            .select("s", "c", F.coalesce("_cq", "cq").alias("cq"))
            .localCheckpoint()
        )
    return cb


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Encode each vector as m one-byte-range codes: per subspace, the id
    of the nearest codeword by exact integer squared-L2 (ties → lowest
    c). This is the 100 TB storage lever past int8: a 64-dim float32
    vector is 256 bytes raw, 64 bytes int8-quantized, m=8 bytes
    PQ-encoded — a 32x scan-bandwidth cut, at the cost of distances
    becoming codeword-table lookups (pq_adc_topk).

    Plan shape: corpus explodes to N*m subvector rows, broadcast-joins
    the m*ksub codebook, and the per-(id,s) argmin is a single
    min(struct(dist, c)) aggregate — partial min runs map-side, so the
    one shuffle carries N*m best-so-far rows, never the N*m*ksub
    candidate set. A narrow-provenance corpus (one-split source)
    spreads first (r14, :func:`spread_if_narrow`) so the N·m·ksub
    scoring runs at full width. Output: (id, codes array<int> length
    m)."""
    dim = vector_dim(corpus, vec_col, dim)
    dsub = dim // m
    corpus = spread_if_narrow(corpus, id_col)
    subs = corpus.select(
        id_col,
        F.posexplode(
            _pq_subvectors(_pq_quantized_coords(F.col(vec_col)), m, dsub)
        ).alias("s", "sub"),
    )
    best = (
        subs.join(F.broadcast(codebooks), "s")
        .select(
            id_col,
            "s",
            F.struct(
                _pq_sqdist(F.col("sub"), F.col("cq")).alias("d"), F.col("c")
            ).alias("dc"),
        )
        .groupBy(id_col, "s")
        .agg(F.min("dc").alias("best"))
    )
    return best.groupBy(id_col).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("s", F.col("best.c").alias("c")))
            ),
            lambda x: x["c"],
        ).alias("codes")
    )


def _pq_qtable(
    queries: DataFrame,
    codebooks: DataFrame,
    m: int,
    dim: int,
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Each query's exact integer squared-L2 to every PQ codeword —
    the ADC lookup table, (qid, s, c, qdist), |Q|·m·ksub rows. Query-
    derived and bounded by the query set, so consumers broadcast it;
    factored out of :func:`pq_adc_topk` so the IVF-PQ path builds the
    identical table (same integer grid, same expression tree)."""
    dsub = dim // m
    qsubs = queries.select(
        qid_col,
        F.posexplode(
            _pq_subvectors(_pq_quantized_coords(F.col(qvec_col)), m, dsub)
        ).alias("s", "qsub"),
    )
    return qsubs.join(F.broadcast(codebooks), "s").select(
        qid_col,
        "s",
        "c",
        _pq_sqdist(F.col("qsub"), F.col("cq")).alias("qdist"),
    )


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    id_col: str = "vec_id",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    dim: int | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: each query precomputes
    its exact integer squared-L2 to every codeword (a Q*m*ksub table —
    tiny, broadcast), then a corpus vector's approximate distance is the
    sum of m table lookups on its codes. The corpus-side scan touches
    ONLY the m-byte codes — never the raw floats — which is the entire
    point of PQ at 100 TB: the compressed corpus is ~32x smaller than
    the float32 original, and the per-pair cost is m integer adds
    instead of d float multiplies. At cluster scale this composes with
    the IVF layout (encode within build_ivf_index buckets and ADC-scan
    only the probed partitions); here it is the documented full-scan
    baseline, exact-integer end-to-end so the oracle hash-matches.
    Output: (qid, vec_id, adist, rank), ascending distance, ties by id."""
    dim = vector_dim(queries, qvec_col, dim)
    qtable = _pq_qtable(queries, codebooks, m, dim, qid_col, qvec_col)
    # posexplode_OUTER (r15): the non-outer form of a staged-column
    # explode makes Catalyst infer `size(codes) > 0` into a Filter above
    # the encoding aggregate (cheap here — codes is already a column —
    # but a dead plan node: collect_list output is never empty, and the
    # broadcast join on (s, c) already null-rejects the outer form's
    # extra row, so rows are identical with no explicit guard).
    pcs = encoded.select(
        id_col, F.posexplode_outer("codes").alias("s", "c")
    )
    scored = (
        pcs.join(F.broadcast(qtable), ["s", "c"])
        .groupBy(qid_col, id_col)
        .agg(F.sum("qdist").alias("adist"))
    )
    if exclude_self:
        scored = scored.where(F.col(qid_col) != F.col(id_col))
    w = Window.partitionBy(qid_col).orderBy(F.asc("adist"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def ivfpq_encode(
    assigned: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """PQ codes of an ALREADY-ASSIGNED corpus in one pass: (id, cid,
    codes). The cid rides the per-(id, s) argmin groupBy as an extra key
    (functionally dependent on id, so the group structure is unchanged)
    instead of joining :func:`ivf_assign` output against a separate
    :func:`pq_encode` pass — one corpus scan, one exchange, no
    corpus-to-corpus join. Same integer grid and tie-break as
    :func:`pq_encode`, so codes are bit-identical to the flat encoder's
    (pinned by test)."""
    dim = vector_dim(assigned, vec_col, dim)
    dsub = dim // m
    subs = assigned.select(
        id_col,
        "cid",
        F.posexplode(
            _pq_subvectors(_pq_quantized_coords(F.col(vec_col)), m, dsub)
        ).alias("s", "sub"),
    )
    best = (
        subs.join(F.broadcast(codebooks), "s")
        .select(
            id_col,
            "cid",
            "s",
            F.struct(
                _pq_sqdist(F.col("sub"), F.col("cq")).alias("d"), F.col("c")
            ).alias("dc"),
        )
        .groupBy(id_col, "cid", "s")
        .agg(F.min("dc").alias("best"))
    )
    return best.groupBy(id_col, "cid").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("s", F.col("best.c").alias("c")))
            ),
            lambda x: x["c"],
        ).alias("codes")
    )


def ivfpq_adc_topk(
    codes: DataFrame,
    codebooks: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    m: int = 8,
    id_col: str = "vec_id",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    dim: int | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF-PQ top-k — the composition :func:`pq_adc_topk`'s docstring
    names as the cluster-scale deployment (FAISS's IVFPQ with
    ``by_residual=false``): each query probes its ``nprobe`` nearest
    coarse-centroid buckets (identical probe selection to the IVF
    family, :func:`_probe_buckets`) and ranks ONLY the probed buckets'
    vectors by PQ asymmetric distance — m integer table lookups per
    candidate over the m-byte codes, never the raw floats. The two ANN
    levers compose multiplicatively at 100 TB: IVF cuts candidates to
    ~nprobe/C of the corpus, PQ cuts per-candidate scan bytes ~32x
    below float32. Exact-integer ADC end-to-end (same grid as
    :func:`pq_adc_topk`), so the whole composite value-hashes against
    an ANSI-SQL oracle. Output: (qid, vec_id, adist, rank), ascending
    distance, ties by id.

    Plan shape: the corpus side touches only ``codes`` (id, cid,
    codes); the probe frame (|Q|·nprobe rows) and the ADC table
    (|Q|·m·ksub rows) are query-derived and broadcast — bounded by the
    query set by contract, never by the corpus. One exchange total:
    the (qid, id) distance aggregation (partial map-side)."""
    dim = vector_dim(queries, qvec_col, dim)
    probes = _probe_buckets(
        queries, centroids, nprobe, qid_col, qvec_col
    ).select(qid_col, "cid")
    qtable = _pq_qtable(queries, codebooks, m, dim, qid_col, qvec_col)
    # posexplode_OUTER (r15): see pq_adc_topk — kills the inferred
    # size(codes) > 0 plan node; the (qid, s, c) broadcast join
    # null-rejects the outer form's extra row, rows identical.
    pcs = codes.select(
        id_col, "cid", F.posexplode_outer("codes").alias("s", "c")
    )
    scored = (
        pcs.join(F.broadcast(probes), "cid")
        .join(F.broadcast(qtable), [qid_col, "s", "c"])
        .groupBy(qid_col, id_col)
        .agg(F.sum("qdist").alias("adist"))
    )
    if exclude_self:
        scored = scored.where(F.col(qid_col) != F.col(id_col))
    w = Window.partitionBy(qid_col).orderBy(F.asc("adist"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def ivfpq_rerank_topk(
    codes: DataFrame,
    codebooks: DataFrame,
    centroids: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    shortlist: int = 40,
    nprobe: int = 4,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    dim: int | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Two-stage IVF-PQ serving — the standard production read path
    (FAISS's refine step): stage 1 ADC-ranks the probed buckets' m-byte
    codes down to a ``shortlist`` of candidates per query
    (:func:`ivfpq_adc_topk` unchanged), stage 2 re-ranks ONLY the
    shortlist by exact cosine over the raw vectors. Recall recovers
    toward the raw-vector IVF level (quantization error stops deciding
    the final order, it only decides the shortlist) while the corpus
    scan stays code-sized — the raw floats are touched for
    |Q|·shortlist rows, fetched by a broadcast id join, never scanned.
    Output: (qid, vec_id, cosine, rank) — identical shape to
    ``similarity_ivf``, so the two backends are drop-in swappable and
    ``ann_recall`` prices the difference."""
    cand = ivfpq_adc_topk(
        codes, codebooks, centroids, queries, shortlist, nprobe, m,
        id_col, qid_col, qvec_col, dim, exclude_self,
    ).select(qid_col, id_col)
    c = corpus.select(
        id_col, vec_col, _norm(F.col(vec_col)).alias("_cnorm")
    )
    q = queries.select(
        qid_col, qvec_col, _norm(F.col(qvec_col)).alias("_qnorm")
    )
    scored = (
        c.join(F.broadcast(cand), id_col)
        .join(F.broadcast(q), qid_col)
        .select(
            qid_col,
            id_col,
            F.round(
                _dot(F.col(qvec_col), F.col(vec_col))
                / (F.col("_qnorm") * F.col("_cnorm")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def build_ivfpq_index(
    corpus: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    path: str,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> None:
    """Materialize an IVF-PQ index: codes written *partitioned by cid*
    (the on-disk inverted file — probed-bucket reads prune at the
    directory level exactly like :func:`build_ivf_index`) plus the
    centroid table, the codebook table, and a pinned (m, dim) params
    row, so appends and queries derive every selection from the INDEX
    contract and can never drift from it (the winnow-params lesson).
    Storage is the point: m bytes + one int per vector instead of
    dim·4 — the 100 TB corpus's ANN tier fits in ~1/32 the bytes the
    raw-vector IVF tier scans.

    r14: also pins a one-row ``qerr_baseline`` — the build-time
    sampled reconstruction error (:func:`_ivfpq_sample_recon`) that
    :func:`ivfpq_index_qerr` later divides against to make
    quantization drift observable without the codes tier ever storing
    raw floats.

    r14 build-cost shape: the encoded frame is persisted once and read
    by BOTH the codes write and the baseline probe (the probe no
    longer re-reads the just-written codes tier off disk); codes
    repartition by ``cid`` before the partitioned write so each bucket
    directory holds ONE file instead of one per write task (the §6
    small-files rule — every later probed-bucket read opens fewer
    files); the three model tables and the baseline row are
    metadata-scale and written single-file."""
    spark = corpus.sparkSession
    dim = vector_dim(corpus, vec_col, dim)
    assigned = ivf_assign(corpus, centroids, id_col, vec_col, dim)
    encoded = ivfpq_encode(
        assigned, codebooks, m, id_col, vec_col, dim
    ).transform(tracked_persist)  # codes write + qerr baseline probe
    # EXPLICIT task count (not bare repartition("cid")): the keyless-N
    # form is AQE-coalescible and collapsed the partitioned write to one
    # task creating every bucket file serially; pinning N keeps the
    # writers parallel while each cid still lands in exactly one file
    width = spark.sparkContext.defaultParallelism

    def _write_codes() -> None:
        encoded.repartition(width, "cid").write.mode("overwrite").partitionBy(
            "cid"
        ).parquet(f"{path}/codes")

    def _write_centroids() -> None:
        centroids.coalesce(1).write.mode("overwrite").parquet(
            f"{path}/centroids"
        )

    def _write_codebooks() -> None:
        codebooks.coalesce(1).write.mode("overwrite").parquet(
            f"{path}/codebooks"
        )

    # NOTE: no coalesce(1) on the two one-row writes — a one-row local
    # frame already lands in one file, and coalesce(1) over a local
    # relation measured ~5 s vs 0.5 s plain (r14 A/B)
    def _write_params() -> None:
        spark.createDataFrame([(m, dim)], "m int, dim int").write.mode(
            "overwrite"
        ).parquet(f"{path}/params")

    def _write_baseline() -> None:
        _sample_recon_core(
            encoded.select(id_col, "codes"), codebooks, m, dim, corpus, 256,
            id_col, vec_col,
        ).write.mode("overwrite").parquet(f"{path}/qerr_baseline")

    # The five sinks are independent of each other (different
    # directories, no read-after-write), so they run as overlapping
    # jobs from a small thread pool (guide §2.6): the metadata-scale
    # writes back-fill the scheduler while the codes write's tail
    # drains, instead of each paying its own driver-side planning gap
    # sequentially — the maintain lifecycles' cost is dominated by
    # these gaps, not compute (profiled r15: 77 jobs, wall ≈ 2x the sum
    # of job times). The shared `encoded` persist is safe under
    # concurrent materialization (per-block write locks).
    _run_overlapped(
        _write_codes, _write_baseline, _write_centroids, _write_codebooks,
        _write_params,
    )


def append_ivfpq_index(
    batch: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append a new batch to a persisted IVF-PQ index: assign + encode
    at the index's OWN stored centroids/codebooks/params (broadcast,
    one pass over the batch) and append into the cid-partitioned
    layout. O(batch) — existing codes are never read or rewritten.
    Frozen centroids AND frozen codebooks share the IVF drift posture:
    a shifting embedding distribution degrades bucket balance and
    raises quantization error until an offline rebuild; occupancy
    imbalance is readable from the stored cid column alone
    (metadata-scale), but qerr needs raw vectors, which the codes tier
    deliberately does not keep — rebuilds re-encode from the raw
    corpus (the standard IVFPQ posture)."""
    spark = batch.sparkSession
    p = spark.read.parquet(f"{path}/params").head()
    centroids = spark.read.parquet(f"{path}/centroids")
    codebooks = spark.read.parquet(f"{path}/codebooks")
    assigned = ivf_assign(batch, centroids, id_col, vec_col, int(p.dim))
    width = spark.sparkContext.defaultParallelism
    ivfpq_encode(
        assigned, codebooks, int(p.m), id_col, vec_col, int(p.dim)
    ).repartition(width, "cid").write.mode("append").partitionBy(
        "cid"
    ).parquet(f"{path}/codes")


def query_ivfpq_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    exclude_self: bool = True,
) -> DataFrame:
    """Query a persisted IVF-PQ index without re-assigning or
    re-encoding the corpus: results are identical to
    :func:`ivfpq_adc_topk` over the same corpus/centroids/codebooks
    (pinned by test). The probed-bucket join hits the cid partition
    column, so the scan reads only the probed bucket directories'
    m-byte codes off disk — IVF's pruning times PQ's compression, the
    full 100 TB read-path story in one query."""
    p = spark.read.parquet(f"{path}/params").head()
    codes = spark.read.parquet(f"{path}/codes").select(
        id_col, "cid", "codes"
    )
    centroids = spark.read.parquet(f"{path}/centroids")
    codebooks = spark.read.parquet(f"{path}/codebooks")
    return ivfpq_adc_topk(
        codes, codebooks, centroids, queries, k, nprobe, int(p.m),
        id_col, qid_col, qvec_col, int(p.dim), exclude_self,
    )


def ivfpq_index_drift(spark, path: str) -> DataFrame:
    """Occupancy drift report for a persisted IVF-PQ index — the
    detection half of the tier's maintenance loop. The codes tier
    deliberately stores NO raw vectors (that is its 32x point), so
    quantization error is not measurable from the index alone; bucket
    occupancy IS, off the stored cid column — metadata-scale, one
    pruned scan of (cid) + two tiny aggregates. The r13 shifted-drift
    soak measured cluster-shift drift as BUCKET COLLAPSE (imbalance
    1.5 → 32.5) while avg_qerr moved only 0.67 → 0.71, so imbalance is
    the cheap first-line trigger; for the drift class occupancy CANNOT
    see (scale drift — cosine assignment invariant, L2 quantization
    not), :func:`ivfpq_index_qerr` is the complementary sampled probe
    (r14). One row:

        (n_vectors, n_centroids, n_empty_buckets, max_bucket,
         imbalance)

    with ``imbalance`` = max_bucket · n_centroids / n_vectors,
    round(6) — same definition as :func:`ivf_index_drift`, NULL on an
    empty index (no evidence, handled by the maintainer)."""
    codes = spark.read.parquet(f"{path}/codes").select("cid")
    cents = spark.read.parquet(f"{path}/centroids").select("cid")
    vec_stats = codes.agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors")
    )
    bucket_stats = (
        codes.groupBy("cid")
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(
            F.max("_n").cast("long").alias("max_bucket"),
            F.count(F.lit(1)).cast("long").alias("_n_used"),
        )
    )
    cent_count = cents.agg(F.count(F.lit(1)).cast("long").alias("n_centroids"))
    return (
        vec_stats.crossJoin(F.broadcast(bucket_stats))
        .crossJoin(F.broadcast(cent_count))
        .select(
            "n_vectors",
            "n_centroids",
            (F.col("n_centroids") - F.col("_n_used")).alias(
                "n_empty_buckets"
            ),
            "max_bucket",
            F.round(
                F.col("max_bucket") * F.col("n_centroids") / F.col("n_vectors"),
                6,
            ).alias("imbalance"),
        )
    )


def _ivfpq_sample_recon(
    spark,
    path: str,
    corpus: DataFrame,
    n_sample: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(n_sampled, avg_recon_sq) over an md5-ordered corpus sample:
    the average exact-integer squared RECONSTRUCTION error of the
    sample's STORED codes — Σ_s ‖sub_s − codeword(code_s)‖² on the
    2^10 grid, the quantity PQ training minimizes (FAISS's per-vector
    quantization error). Reads the sampled ids' raw vectors from
    ``corpus`` (the tier's source of truth — the codes keep no
    floats), their m-byte codes via a broadcast id join against the
    codes tier, and the tiny codebook table; ids sampled but not (yet)
    indexed simply don't join. Deterministic (md5 order) and
    integer-exact, so it value-hashes in SQL."""
    p = spark.read.parquet(f"{path}/params").head()
    m, dim = int(p.m), int(p.dim)
    codes = spark.read.parquet(f"{path}/codes").select(id_col, "codes")
    cbdf = spark.read.parquet(f"{path}/codebooks")
    return _sample_recon_core(
        codes, cbdf, m, dim, corpus, n_sample, id_col, vec_col
    )


def _sample_recon_core(
    codes: DataFrame,
    cbdf: DataFrame,
    m: int,
    dim: int,
    corpus: DataFrame,
    n_sample: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The frames-form of :func:`_ivfpq_sample_recon` (r14): build-time
    callers pass the just-encoded in-memory codes frame instead of
    re-reading the tier they are writing — same rows, same integers."""
    dsub = dim // m
    sample = (
        corpus.select(id_col, vec_col, md5_order_key(id_col).alias("_mk"))
        .orderBy("_mk", id_col)
        .limit(n_sample)
        .select(
            id_col, _pq_quantized_coords(F.col(vec_col)).alias("_cx")
        )
    )
    per = (
        codes.join(F.broadcast(sample), id_col)
        # posexplode_OUTER (r15): see pq_adc_topk — the (s, c) join
        # below null-rejects the outer form's extra row, rows identical
        .select(id_col, "_cx", F.posexplode_outer("codes").alias("s", "c"))
        .join(F.broadcast(cbdf), ["s", "c"])
        .select(
            id_col,
            _pq_sqdist(
                F.slice(F.col("_cx"), F.col("s") * dsub + 1, dsub),
                F.col("cq"),
            ).alias("e"),
        )
        .groupBy(id_col)
        .agg(F.sum("e").alias("recon"))
    )
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        F.coalesce(F.sum("recon"), F.lit(0)).cast("long").alias("_rsum"),
    ).select(
        "n_sampled",
        F.expr("_rsum DIV greatest(n_sampled, 1)")
        .cast("long")
        .alias("avg_recon_sq"),
    )


def ivfpq_index_qerr(
    spark,
    path: str,
    corpus: DataFrame,
    n_sample: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sampled QUANTIZATION-ERROR drift signal for a persisted IVF-PQ
    index (r14, VERDICT r13 ask 4): ``ivfpq_index_drift`` sees
    occupancy only — a distribution shift that degrades quantization
    without unbalancing buckets (the canonical case is a SCALE drift:
    cosine assignment is scale-invariant, so occupancy never moves,
    while squared-L2 quantization error grows with the square of the
    scale) is invisible to it. This probe compares the current
    sampled reconstruction error against the BASELINE the index
    pinned at build time (``build_ivfpq_index`` writes a
    ``qerr_baseline`` row — the params pattern applied to index
    health). ONE row:

        (n_sampled, avg_recon_sq, baseline_recon_sq, qerr_ratio_mils)

    ``qerr_ratio_mils = avg_recon_sq · 1000 DIV max(baseline, 1)`` —
    1000 means "as healthy as the day it was built"; a scale-drifted
    ingest pushes it to several thousands while occupancy stays flat
    (pinned by test and the r14 soak). All integers, zero-safe: a
    missing baseline (pre-r14 index) or an empty sample reports 0 —
    no evidence, which the maintainer treats as no drift.

    Design note (measured, r14): two rejected signals — the relative
    ADC-vs-exact gap over a probe shortlist is SCALE-INVARIANT (the
    scale cancels between numerator and denominator: healthy 223 →
    drifted 234 mils on the 5x fixture), and reconstruction error
    relative to the vector's own norm saturates near 1000 mils on
    weak codebooks. Absolute reconstruction error against the pinned
    build-time baseline is the signal that actually moves (223 →
    5800-ish mils on the same fixture). Cost: one corpus sample
    (TakeOrdered), one broadcast-pruned codes read, one codebook
    broadcast — the rerank read pattern's budget."""
    cur = _ivfpq_sample_recon(
        spark, path, corpus, n_sample, id_col, vec_col
    )
    try:
        base = spark.read.parquet(f"{path}/qerr_baseline").select(
            F.col("avg_recon_sq").alias("baseline_recon_sq")
        )
    except Exception:
        base = spark.createDataFrame(
            [(0,)], "baseline_recon_sq BIGINT"
        )
    return cur.crossJoin(F.broadcast(base)).select(
        "n_sampled",
        "avg_recon_sq",
        "baseline_recon_sq",
        F.expr(
            "CASE WHEN baseline_recon_sq <= 0 OR n_sampled = 0"
            " THEN CAST(0 AS BIGINT)"
            " ELSE avg_recon_sq * 1000 DIV baseline_recon_sq END"
        ).alias("qerr_ratio_mils"),
    )


def maintain_ivfpq_index_qerr(
    spark,
    path: str,
    dest_path: str,
    corpus: DataFrame,
    max_ratio_mils: int = 3000,
    n_sample: int = 256,
    k: int | None = None,
    sample_mult: int = 16,
    refine_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Qerr-triggered IVF-PQ rebuild (r14, VERDICT r13 ask 4) — the
    second member of the compressed tier's maintenance pair:
    ``maintain_ivfpq_index`` fires on bucket collapse;
    this one fires on the quantization drift occupancy cannot see
    (:func:`ivfpq_index_qerr` is the trigger — sampled reconstruction
    error vs the build-time baseline). The remediation re-derives
    centroids AND codebooks from ``corpus`` — the codebooks via
    :func:`pq_codebooks_refined`, deliberately: after a scale/shift
    drift the first-ksub-by-id bootstrap would re-pin the codewords
    to the STALE cohort (the earliest ids), while the md5-sampled
    k-means sees the post-drift mixture and spreads codewords across
    it. The rebuild pins a FRESH baseline at ``dest_path`` (build
    always does), so the ratio resets to ~1000 after rotation.
    Returned row is the PRE-rebuild qerr report + the rebuilt flag:

        (n_sampled, avg_recon_sq, baseline_recon_sq, qerr_ratio_mils,
         rebuilt)

    Below threshold — or with no evidence (empty sample / missing
    baseline) — nothing is written; rotation guarded as every
    maintainer."""
    from hadoop_invertedindexer_spark.fsutil import guard_rotation

    guard_rotation(spark, path, dest_path, "IVF-PQ qerr rebuild")
    stats = ivfpq_index_qerr(
        spark, path, corpus, n_sample, id_col, vec_col
    ).head()
    rebuilt = (
        stats.n_sampled > 0
        and stats.baseline_recon_sq > 0
        and stats.qerr_ratio_mils > max_ratio_mils
    )
    if rebuilt:
        # ONE metadata job for params + ksub + centroid count (r15,
        # VERDICT r14 item 4) — see maintain_ivfpq_index: three one-row
        # reads used to be three separate actions.
        p = (
            spark.read.parquet(f"{path}/params")
            .crossJoin(
                F.broadcast(
                    spark.read.parquet(f"{path}/codebooks").agg(
                        (F.max("c") + 1).alias("_ksub")
                    )
                )
            )
            .crossJoin(
                F.broadcast(
                    spark.read.parquet(f"{path}/centroids").agg(
                        F.count(F.lit(1)).alias("_ncents")
                    )
                )
            )
            .head()
        )
        ksub = int(p["_ksub"])
        n_cents = int(p["_ncents"]) if k is None else int(k)
        cents = bounded_centroids_refined(
            corpus, n_cents, 4, 2, False, id_col, vec_col
        )
        cb = pq_codebooks_refined(
            corpus, int(p.m), ksub, sample_mult, refine_iters,
            id_col, vec_col, int(p.dim),
        )
        build_ivfpq_index(
            corpus, cents, cb, dest_path, int(p.m), id_col, vec_col,
            int(p.dim),
        )
    return spark.createDataFrame(
        [
            (
                stats.n_sampled,
                stats.avg_recon_sq,
                stats.baseline_recon_sq,
                stats.qerr_ratio_mils,
                rebuilt,
            )
        ],
        "n_sampled BIGINT, avg_recon_sq BIGINT,"
        " baseline_recon_sq BIGINT, qerr_ratio_mils BIGINT,"
        " rebuilt BOOLEAN",
    )


def maintain_ivfpq_index(
    spark,
    path: str,
    dest_path: str,
    corpus: DataFrame,
    max_imbalance_mils: int = 4000,
    k: int | None = None,
    sample_mult: int = 4,
    refine_iters: int = 2,
    portable: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Drift-triggered IVF-PQ rebuild — the compressed tier's member of
    the family-wide maintenance-loop shape (PLANS.md r12: one
    metadata-scale trigger read → bulk rewrite + rotation swap).
    :func:`ivfpq_index_drift` is the trigger (occupancy only — the
    codes tier keeps no raw floats); the remediation re-derives BOTH
    stored models from the caller's ``corpus`` — fresh bounded-K
    centroids AND fresh codebooks — and rebuilds into ``dest_path``
    (the standard IVFPQ posture: a lossy tier is rebuilt from the
    source of truth, never from itself — the one structural difference
    from ``maintain_ivf_index``, whose raw-vector assignments let it
    recenter in place of the corpus). ``m``/``dim`` come from the
    stored params, ``ksub`` from the stored codebook table, ``k``
    defaults to the current centroid count — a rebuild preserves the
    tier's contract unless the caller re-sizes it. Returned row is the
    PRE-rebuild occupancy report + the rebuilt flag:

        (n_vectors, n_centroids, n_empty_buckets, max_bucket,
         imbalance, rebuilt)

    Below threshold nothing is written (``dest_path`` stays absent);
    empty index → NULL imbalance → no evidence, no rebuild (the
    maintain_bpe_model empty-probe policy). In-place rotation guarded
    through ``fsutil.guard_rotation``."""
    from hadoop_invertedindexer_spark.fsutil import guard_rotation

    guard_rotation(spark, path, dest_path, "IVF-PQ rebuild")
    stats = ivfpq_index_drift(spark, path).head()
    rebuilt = (
        stats.imbalance is not None
        and stats.imbalance * 1000 > max_imbalance_mils
    )
    if rebuilt:
        # ONE metadata job for params + ksub (r15, VERDICT r14 item 4):
        # the two one-row reads used to be separate head() actions, each
        # paying its own planning/collect gap; a crossJoin of the params
        # row with the broadcast ksub aggregate reads both in one job.
        p = (
            spark.read.parquet(f"{path}/params")
            .crossJoin(
                F.broadcast(
                    spark.read.parquet(f"{path}/codebooks").agg(
                        (F.max("c") + 1).alias("_ksub")
                    )
                )
            )
            .head()
        )
        ksub = int(p["_ksub"])
        cents = bounded_centroids_refined(
            corpus,
            int(k if k is not None else stats.n_centroids),
            sample_mult,
            refine_iters,
            portable,
            id_col,
            vec_col,
        )
        cb = pq_codebooks(corpus, int(p.m), ksub, id_col, vec_col, int(p.dim))
        build_ivfpq_index(
            corpus, cents, cb, dest_path, int(p.m), id_col, vec_col,
            int(p.dim),
        )
    return spark.createDataFrame(
        [
            (
                stats.n_vectors,
                stats.n_centroids,
                stats.n_empty_buckets,
                stats.max_bucket,
                stats.imbalance,
                rebuilt,
            )
        ],
        "n_vectors BIGINT, n_centroids BIGINT, n_empty_buckets BIGINT,"
        " max_bucket BIGINT, imbalance DOUBLE, rebuilt BOOLEAN",
    )


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization: scale = max|x|/127,
    q_i = round(x_i / scale) ∈ [-127, 127]. The 4x storage cut (and 4x
    scan-bandwidth cut) that makes a 100 TB embedding corpus scannable;
    cosine on dequantized vectors stays within ~1e-3 of exact for typical
    distributions (bounded in tests). Pure array expressions — codegen,
    no Python. Output: (id, scale, q) with q int8-valued ints.

    The zero vector gets scale 0 and quantizes to zeros; subnormal-tiny
    vectors (max|x| < 1.27e-28) get the clamp value AS their scale, so
    dequantization q * scale always uses the same divisor that produced
    q and the error bound holds for every input.

    The scale is staged as a plain column BEFORE the transform: a
    non-trivial expression referenced inside a higher-order-function
    lambda is re-inlined per element (O(d^2) per vector — the measured
    trap noted on the bigram path), while a column reference is O(1).
    """
    max_abs = F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x)))
    staged = df.select(
        F.col(id_col),
        F.col(vec_col),
        F.when(max_abs == 0.0, F.lit(0.0))
        .otherwise(F.greatest(max_abs / F.lit(127.0), F.lit(1e-30)))
        .alias("scale"),
    )
    q = F.transform(
        F.col(vec_col),
        lambda x: F.round(x / F.greatest(F.col("scale"), F.lit(1e-30))).cast("int"),
    ).alias("q")
    return staged.select(F.col(id_col), F.col("scale"), q)


def dequantize_embeddings(
    df: DataFrame, q_col: str = "q", scale_col: str = "scale"
) -> DataFrame:
    """Reconstruct float vectors from int8 quantization (q * scale)."""
    return df.withColumn(
        "embedding",
        F.transform(
            F.col(q_col), lambda v: (v * F.col(scale_col)).cast("float")
        ),
    )


def ann_recall(
    truth: DataFrame,
    candidates: DataFrame,
    qid_col: str = "qid",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-query recall@k of an ANN result list against exact ground
    truth — the index-quality gate every approximate path (IVF / LSH /
    PQ) must clear before it replaces brute force in a retrieval or
    SemDeDup stage, and the companion metric to ``ivf_index_drift``'s
    geometry report (drift says the index aged; recall says by how much
    it hurts answers).

    Both inputs are (``qid_col``, ``id_col``) neighbor lists (extra
    columns ignored); ``truth`` defines the denominator, so pass the
    exact top-k (``cosine_topk_bruteforce``) there and any approximate
    top-k as ``candidates``. Returns one row per DISTINCT truth query:
    (qid, n_truth, n_hit, recall_mils) — a query the ANN path missed
    entirely still reports, with 0. Integer thousandths, so the report
    value-hashes across engines.

    Scale shape: both sides are queries x k rows — METADATA scale next
    to the corpus that produced them — so the inner join on
    (qid, neighbor id) and the per-qid rollup shuffle only neighbor
    lists, never vectors; the expensive part of recall evaluation is
    producing the lists, which is the operators' own cost. At 100 TB
    the truth side comes from a SAMPLED query set (the contract uses
    every-100th), never all queries."""
    t = truth.select(
        F.col(qid_col).alias("qid"), F.col(id_col).alias("nid")
    )
    c = candidates.select(
        F.col(qid_col).alias("qid"), F.col(id_col).alias("nid")
    )
    hits = (
        t.join(c, ["qid", "nid"])
        .groupBy("qid")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    )
    per_q = t.groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("n_truth")
    )
    return per_q.join(hits, "qid", "left").select(
        "qid",
        "n_truth",
        F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
        F.expr(
            "coalesce(n_hit, 0) * 1000 DIV n_truth"
        ).alias("recall_mils"),
    )
