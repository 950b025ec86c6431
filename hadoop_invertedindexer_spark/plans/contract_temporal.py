"""Contract queries for the temporal join operators (as-of, range) and the
dedup-cluster resolution.

The as-of oracle uses DuckDB's native ASOF JOIN — strong evidence the
union-merge window composition implements the standard semantics. The
range-join oracle is the naive inequality join — proving the bucketed
rewrite changes the plan, not the answer.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_invertedindexer_spark.operators.clusters import dedup_clusters
from hadoop_invertedindexer_spark.operators.dedup import ngram_jaccard_pairs
from hadoop_invertedindexer_spark.plans.contract_llm import _SQL_SHINGLES
from hadoop_invertedindexer_spark.operators.temporal import (
    asof_join,
    range_join_bucketed,
)
from hadoop_invertedindexer_spark.sources.tables import read_table


def _purchases_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase events, unique per (user, ts) (max event_id on the
    astronomically-unlikely collision) — the as-of right side must be
    unique per (key, time). Events-vs-events keeps the timelines truly
    interleaved (orders and events don't overlap in the testdata, which
    would make a cross-table as-of degenerate)."""
    e = read_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    return (
        e.groupBy("user_id", "ts")
        .agg(F.max(F.struct("event_id", "value")).alias("m"))
        .select(
            "user_id",
            F.col("ts").alias("pts"),
            F.col("m.event_id").alias("purchase_id"),
            F.round("m.value", 6).alias("purchase_value"),
        )
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event paired with the same user's most recent purchase at
    event time (ASOF LEFT semantics: events before the first purchase get
    nulls)."""
    e = read_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    p = _purchases_unique(spark, sf_dir)
    out = asof_join(
        e, p, key="user_id", left_ts="ts", right_ts="pts",
        right_cols=["purchase_id", "purchase_value"],
    )
    return out.select("event_id", "user_id", "purchase_id", "purchase_value")


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity in the 7 days after each signup: events of the same user
    with signup_ts <= ts < signup_ts + 7d — via the bucketed range join."""
    e = read_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"), "ts", "value"
    )
    s = read_table(spark, sf_dir, "events").where(
        F.col("event_type") == "signup"
    ).select(
        F.col("user_id").alias("k"),
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("signup_ts"),
    )
    joined = range_join_bucketed(
        e, s, key="k", left_ts="ts", right_start="signup_ts",
        width_seconds=7 * 24 * 3600,
    )
    return joined.groupBy("signup_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative connected components over jaccard near-dup edges; the
    oracle computes the same min-id component labels with a recursive-CTE
    transitive closure over the identical pair set (fixtures additionally
    in tests/test_clusters.py)."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.6, max_df=100)
    return dedup_clusters(pairs, docs)


def q_dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same near-dup cluster resolution through the O(log n)-round
    ALTERNATING-STAR resolver (Kiveris et al. 2014) instead of hash-min
    label propagation — identical output by construction (component =
    min id), so the oracle text is shared verbatim with dedup_clusters;
    the point of the twin is driver-checked proof that the scale
    algorithm (diameter-independent round count) computes the same
    clusters."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.6, max_df=100)
    return dedup_clusters(pairs, docs, algorithm="star")


def q_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-best-copy resolution over the same jaccard near-dup
    clusters: per cluster, the longest member survives (ties -> min id —
    a total order, deterministic in both engines)."""
    from hadoop_invertedindexer_spark.operators.clusters import cluster_canonical

    docs = read_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.6, max_df=100)
    return cluster_canonical(pairs, docs, score_col="n_chars")


TEMPORAL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "dedup_clusters": q_dedup_clusters,
    "dedup_clusters_star": q_dedup_clusters_star,
    "cluster_canonical": q_cluster_canonical,
}

TEMPORAL_ORACLE_SQL: dict[str, str] = {
    "asof_join": """
        WITH p AS (
            SELECT user_id, ts AS pts,
                   max_by(event_id, event_id) AS purchase_id,
                   round(max_by(value, event_id), 6) AS purchase_value
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id, ts
        )
        SELECT e.event_id, e.user_id, p.purchase_id, p.purchase_value
        FROM events e
        ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.pts""",
    "range_join": """
        SELECT s.event_id AS signup_id, count(*) AS n_events,
               round(sum(e.value), 2) AS sum_value
        FROM events e
        JOIN events s
          ON e.user_id = s.user_id
         AND s.event_type = 'signup'
         AND e.ts >= s.ts
         AND e.ts < s.ts + INTERVAL 7 DAYS
        GROUP BY s.event_id""",
    # min-id connected-component labels over the SAME near-dup pair set as
    # the ngram_jaccard oracle (contract_llm), closed transitively with a
    # recursive CTE: symmetric edges -> full reachability -> min reachable
    # id per node; docs with no edge keep themselves.
    "dedup_clusters": None,  # assembled below from the shared CTE prefix
}

# shared between the dedup_clusters oracle and consumers that need the
# cluster labels inside a bigger query (leakage_safe_split in
# contract_pipeline): everything up to and including comp(node, keep)
SQL_CLUSTERS_CTE_PREFIX = f"""
    WITH RECURSIVE {_SQL_SHINGLES},
    sizes AS (SELECT id, count(*) AS sz FROM shingles GROUP BY id),
    kept AS (
        SELECT s.id, s.sh FROM shingles s
        JOIN (SELECT sh FROM shingles GROUP BY sh HAVING count(*) <= 100) c
          ON s.sh = c.sh
    ),
    inter AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
        FROM kept a JOIN kept b ON a.sh = b.sh AND a.id < b.id
        GROUP BY a.id, b.id
    ),
    pairs AS (
        SELECT id_a, id_b FROM inter
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
        WHERE i / (sa.sz + sb.sz - i)::DOUBLE >= 0.6
    ),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ),
    reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (SELECT a AS node, least(a, min(b)) AS keep FROM reach GROUP BY a)
"""

TEMPORAL_ORACLE_SQL["dedup_clusters"] = f"""{SQL_CLUSTERS_CTE_PREFIX}
    SELECT d.doc_id, coalesce(c.keep, d.doc_id) AS keep_id
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.node"""

# the star resolver computes the identical min-id labelling, so its
# oracle is the SAME transitive closure — the twin proves the O(log n)
# algorithm, not a different answer
TEMPORAL_ORACLE_SQL["dedup_clusters_star"] = TEMPORAL_ORACLE_SQL["dedup_clusters"]

# keep-best-copy: same cluster labels, then a deterministic window pick
# (n_chars desc, doc_id asc) — lockstep with clusters.cluster_canonical
TEMPORAL_ORACLE_SQL["cluster_canonical"] = f"""{SQL_CLUSTERS_CTE_PREFIX},
    labels AS (
        SELECT d.doc_id, coalesce(c.keep, d.doc_id) AS cluster_id, d.n_chars
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.node),
    r AS (
        SELECT cluster_id, doc_id, n_chars,
               row_number() OVER (PARTITION BY cluster_id
                                  ORDER BY n_chars DESC, doc_id) AS rn,
               count(*) OVER (PARTITION BY cluster_id) AS n_members
        FROM labels)
    SELECT cluster_id, doc_id AS canonical_id, n_members::BIGINT AS n_members,
           n_chars AS canonical_n_chars
    FROM r WHERE rn = 1"""
