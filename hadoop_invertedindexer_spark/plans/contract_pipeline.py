"""Contract queries for the training-data pipeline surface: deterministic
splits, stratified sampling, n-gram heavy hitters, quality filtering
(EXT, SURVEY §2B north-star rows; no reference analogue — the reference
always consumes its full corpus, src/InvertedIndexer.java:259).

Everything here is hash-deterministic (md5, identical bit-for-bit in
Spark and DuckDB), so every query gets a full value-hash oracle — none
fall back to rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_invertedindexer_spark.functions import textstats
from hadoop_invertedindexer_spark.operators import sampling
from hadoop_invertedindexer_spark.plans.contract_llm import (
    STOPWORDS,
    _S_DE,
    _S_EN,
    _S_ES,
    _S_FR,
    _SQL_NORM,
    _SQL_QUALITY,
)
from hadoop_invertedindexer_spark.sources.tables import read_table, spread_partitions

QUALITY_THRESHOLD = 0.5


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "documents")


def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 75/12.5/12.5 split on md5(doc_id); per-split doc
    count and char mass prove both the fractions and the (hash-pinned)
    assignment."""
    split = sampling.hash_split(_docs(spark, sf_dir))
    return split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-cluster-keyed split: every member of a jaccard near-dup
    cluster shares its canonical id's split, so no near-duplicate pair
    can straddle train/test (eval leakage). Fully oracle-checkable:
    cluster labels via the recursive-CTE closure (dedup_clusters oracle)
    and the same md5-nibble assignment as train_test_split."""
    from hadoop_invertedindexer_spark.operators.dedup import ngram_jaccard_pairs

    docs = _docs(spark, sf_dir)
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.6, max_df=100)
    return sampling.leakage_safe_split(docs, pairs)


def q_split_leakage_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Split-quality eval (r10): the straddle audit for BOTH split
    strategies over the same jaccard near-dup pairs — the per-doc hash
    split leaks (nonzero straddle whenever dup pairs exist), the
    cluster-keyed split is zero BY CONSTRUCTION; two rows, every
    quantity integer or thousandths."""
    from hadoop_invertedindexer_spark.caching import tracked_persist
    from hadoop_invertedindexer_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = _docs(spark, sf_dir)
    pairs = ngram_jaccard_pairs(
        docs, n=3, threshold=0.6, max_df=100
    ).transform(tracked_persist)  # naive report + safe split + safe report
    naive = sampling.hash_split(docs).select("doc_id", "split")
    safe = sampling.leakage_safe_split(docs, pairs).select(
        "doc_id", "split"
    )
    return sampling.split_leakage_report(
        naive, pairs, method="hash_split"
    ).unionByName(
        sampling.split_leakage_report(safe, pairs, method="leakage_safe")
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source deterministic quota: the 5 hash-first docs per source —
    the 'N docs per source' training-mixture primitive."""
    return sampling.stratified_take(
        _docs(spark, sf_dir), strata_col="source", n_per_stratum=5
    ).select("doc_id", "source", "rk")


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted deterministic Bernoulli sample: P(keep) =
    min(1, n_chars/700), decided by exact integer cross-multiplication
    (no double division to drift between engines). Full kept-row list
    pins the assignment."""
    return sampling.weighted_sample(_docs(spark, sf_dir), denom=700).select(
        "doc_id", "n_chars"
    )


def q_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus bigrams (phrase heavy-hitters) with deterministic
    tiebreak. Spread first: a single-file table otherwise explodes its
    bigrams on one core."""
    return sampling.topk_bigrams(
        spread_partitions(_docs(spark, sf_dir), "doc_id"), k=20
    )


def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source next-fit packing of documents into ~2000-char training
    bins; the per-pack rollup (doc count, char mass) pins every
    assignment."""
    packed = sampling.pack_sequences(_docs(spark, sf_dir), budget=2000)
    return packed.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


def q_pack_fill_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency report (r10): per-source fill of the 2000-char
    next-fit bins — underfill = padding waste, max_pack above budget =
    the next-fit overshoot bound in action; every quantity integer or
    thousandths."""
    return sampling.pack_fill_report(_docs(spark, sf_dir), budget=2000)


def q_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-gate validation report: profile + consistency checks
    (duplicate ids, n_chars vs actual text length) riding one scan."""
    d = _docs(spark, sf_dir)
    return sampling.table_profile(
        d,
        ["doc_id", "lang", "source"],
        extra_aggs=[
            (F.count(F.lit(1)) - F.countDistinct("doc_id")).alias("dup_ids"),
            F.sum((F.col("n_chars") != F.length("text")).cast("int"))
            .cast("bigint")
            .alias("bad_nchars"),
        ],
    )


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate retention per source: how much of each source survives
    the quality threshold — the go/no-go dashboard of a filtering run."""
    d = _docs(spark, sf_dir)
    kept = (
        textstats.quality_score(F.col("text"), STOPWORDS) >= QUALITY_THRESHOLD
    ).cast("int")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(kept).cast("bigint").alias("n_kept"),
        F.round(F.sum(kept) / F.count(F.lit(1)), 6).alias("retention"),
    )


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T=0.5 corpus mixing over the skewed ``lang`` strata (en is ~3x any
    other): per-lang quota 3*floor(sqrt(n)), deterministic (md5, id)
    selection order."""
    return sampling.temperature_mix(_docs(spark, sf_dir))


def q_text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-pipeline chunking: 200-char windows with 50-char overlap
    (stride 150); pure sequence+substr fanout, no shuffle."""
    return sampling.chunk_text(_docs(spark, sf_dir), chunk_chars=200, overlap=50)


MIXTURE_WEIGHTS = {"en": 500, "de": 300, "fr": 150, "es": 50}
MIXTURE_BUDGET = 100_000


def q_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture planning (r8): per-lang available vs target tokens and
    the integer-thousandths rate that feeds upsample_corpus — strata
    outside the weight table plan to rate 0 (dropped)."""
    return sampling.mixture_plan(
        _docs(spark, sf_dir), MIXTURE_WEIGHTS, MIXTURE_BUDGET
    )


def q_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus data-card report (r10): per-(source, lang_id,
    quality-bucket) doc/token counts, exact-dup counts and rates, and
    the net post-dedup masses — the composition table that feeds
    mixture_plan (net_tokens == mixture_plan's avail_tokens over the
    deduped corpus, pinned by the e2e test)."""
    return sampling.data_card(_docs(spark, sf_dir), STOPWORDS)


def q_data_card_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """O(batch) data-card maintenance (r10): docs < 250 play the
    published corpus (card already computed, hash set persisted), docs
    >= 250 the ingest batch. merge(card(old), card_incremental(batch vs
    index(old))) must EQUAL data_card over the full corpus — the oracle
    is shared verbatim with data_card, so the equality is value-hashed,
    not approximated."""
    import tempfile

    from hadoop_invertedindexer_spark.operators import dedup

    d = _docs(spark, sf_dir)
    old = d.where(F.col("doc_id") < 250)
    batch = d.where(F.col("doc_id") >= 250)
    path = tempfile.mkdtemp(prefix="cardidx_") + "/exidx"
    dedup.build_exact_index(old, path)
    return sampling.merge_data_cards(
        sampling.data_card(old, STOPWORDS),
        sampling.data_card_incremental(spark, batch, path, STOPWORDS),
    )


def q_dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (r10): v_old drops every 13th doc, v_new drops
    every 11th and revises every 17th — so the per-doc status column
    exercises all four outcomes (added / removed / changed / unchanged)
    with known planted membership, value-checking the fingerprint
    full-outer-join end to end."""
    from hadoop_invertedindexer_spark.operators.maintenance import (
        dataset_diff,
    )

    d = _docs(spark, sf_dir)
    v_old = d.where(F.col("doc_id") % 13 != 0).select("doc_id", "text")
    v_new = d.where(F.col("doc_id") % 11 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 17 == 0, F.concat("text", F.lit(" rev2"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return dataset_diff(v_old, v_new)


def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch global shuffle (r8): md5('ep1|'||id) keys
    both the shard assignment (mod 16) and the within-shard order — the
    reproducible trainer-facing permutation; the full (doc, shard, seq)
    listing pins every position."""
    return sampling.epoch_shuffle(
        _docs(spark, sf_dir), n_shards=16, epoch=1
    ).select("doc_id", "shard", "seq")


def q_curriculum_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-ordered epoch shuffle (r8): shard assignment stays the
    pure hash permutation; WITHIN each shard, rows stream shortest-first
    (n_chars as the curriculum key, hash+id tie-break) — the
    padding-reduction / easy-first layout."""
    return sampling.epoch_shuffle(
        _docs(spark, sf_dir), n_shards=16, epoch=1, order_col="n_chars"
    ).select("doc_id", "n_chars", "shard", "seq")


PIPELINE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "curriculum_shuffle": q_curriculum_shuffle,
    "temperature_mix": q_temperature_mix,
    "epoch_shuffle": q_epoch_shuffle,
    "mixture_plan": q_mixture_plan,
    "data_card": q_data_card,
    "data_card_incremental": q_data_card_incremental,
    "dataset_diff": q_dataset_diff,
    "text_chunks": q_text_chunks,
    "train_test_split": q_train_test_split,
    "leakage_safe_split": q_leakage_safe_split,
    "split_leakage_report": q_split_leakage_report,
    "stratified_sample": q_stratified_sample,
    "weighted_sample": q_weighted_sample,
    "bigram_topk": q_bigram_topk,
    "sequence_pack": q_sequence_pack,
    "pack_fill_report": q_pack_fill_report,
    "data_quality": q_data_quality,
    "quality_filter": q_quality_filter,
}

_SQL_NIB = "substring(md5(doc_id::VARCHAR), 1, 1)"

PIPELINE_ORACLE_SQL: dict[str, str] = {
    "temperature_mix": """
        WITH quotas AS (
            SELECT lang, count(*) AS n_stratum,
                   least(count(*),
                         (floor(sqrt(count(*)::DOUBLE)) * 3)::BIGINT) AS quota
            FROM documents GROUP BY lang),
        ranked AS (
            SELECT doc_id, lang,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY md5(doc_id::VARCHAR),
                                               doc_id)::BIGINT AS rk
            FROM documents)
        SELECT doc_id, ranked.lang, rk, quota
        FROM ranked JOIN quotas ON ranked.lang = quotas.lang
        WHERE rk <= quota""",
    "text_chunks": """
        WITH base AS (SELECT doc_id, text, length(text) AS n FROM documents),
        idx AS (SELECT doc_id, text,
                       unnest(range(0, greatest(ceil((n - 50) / 150.0)::INT, 1)))
                           AS i
                FROM base)
        SELECT doc_id, i::BIGINT AS chunk_id,
               substr(text, i * 150 + 1, 200) AS chunk,
               length(substr(text, i * 150 + 1, 200))::BIGINT AS n_chars
        FROM idx""",
    "mixture_plan": f"""
        WITH t AS (
            SELECT lang,
                   count(*) AS n_docs,
                   sum(len(list_filter(string_split({_SQL_NORM}, ' '),
                                       t -> t <> ''))) AS avail
            FROM documents GROUP BY lang),
        w AS (
            SELECT * FROM (VALUES ('en', 500), ('de', 300),
                                  ('fr', 150), ('es', 50)) AS w(lang, wm))
        SELECT t.lang AS stratum,
               t.n_docs::BIGINT AS n_docs,
               t.avail::BIGINT AS avail_tokens,
               (100000 * coalesce(w.wm, 0) // 1000)::BIGINT
                   AS target_tokens,
               CASE WHEN t.avail > 0
                    THEN (100000 * coalesce(w.wm, 0) // 1000) * 1000
                         // t.avail
                    ELSE 0 END::BIGINT AS rate_mils
        FROM t LEFT JOIN w USING (lang)""",
    # data-card report (r10): lang CASE + quality bucket + normalized
    # token counts + corpus-wide first-occurrence dup flags, one
    # grouped rollup — every quantity integer or thousandths
    "data_card": f"""
        WITH base AS (
            SELECT source,
                   CASE
                     WHEN ({_S_EN}) > 0 AND ({_S_EN}) >= ({_S_DE})
                          AND ({_S_EN}) >= ({_S_ES})
                          AND ({_S_EN}) >= ({_S_FR}) THEN 'en'
                     WHEN ({_S_DE}) > 0 AND ({_S_DE}) >= ({_S_ES})
                          AND ({_S_DE}) >= ({_S_FR}) THEN 'de'
                     WHEN ({_S_ES}) > 0 AND ({_S_ES}) >= ({_S_FR}) THEN 'es'
                     WHEN ({_S_FR}) > 0 THEN 'fr'
                     ELSE 'und'
                   END AS lang,
                   CASE WHEN {_SQL_QUALITY} >= {QUALITY_THRESHOLD}
                        THEN 'hi' ELSE 'lo' END AS quality_bucket,
                   len(list_filter(string_split({_SQL_NORM}, ' '),
                                   t -> t <> ''))::BIGINT AS nt,
                   (row_number() OVER (PARTITION BY {_SQL_NORM}
                                       ORDER BY doc_id) > 1) AS is_dup
            FROM documents)
        SELECT source, lang, quality_bucket,
               count(*)::BIGINT AS n_docs,
               sum(nt)::BIGINT AS n_tokens,
               sum(is_dup::INT)::BIGINT AS n_dup_docs,
               sum(CASE WHEN is_dup THEN nt ELSE 0 END)::BIGINT AS dup_tokens,
               (count(*) - sum(is_dup::INT))::BIGINT AS net_docs,
               (sum(nt) - sum(CASE WHEN is_dup THEN nt ELSE 0 END))::BIGINT
                   AS net_tokens,
               (sum(is_dup::INT) * 1000 // count(*))::BIGINT AS dup_rate_mils
        FROM base GROUP BY source, lang, quality_bucket""",
    # O(batch) card maintenance (r10): the merged old+incremental card
    # must EQUAL the direct full-corpus card — oracle shared verbatim
    "data_card_incremental": None,  # assigned below (= data_card's SQL)
    # snapshot diff (r10): both sides reduce to (id, md5 fingerprint)
    # before ONE full outer join — keep in lockstep with
    # maintenance.dataset_diff and q_dataset_diff's planted versions
    "dataset_diff": """
        WITH o AS (
            SELECT doc_id AS id, md5(text) AS fpo
            FROM documents WHERE doc_id % 13 <> 0),
        n AS (
            SELECT doc_id AS id,
                   md5(CASE WHEN doc_id % 17 = 0 THEN text || ' rev2'
                            ELSE text END) AS fpn
            FROM documents WHERE doc_id % 11 <> 0)
        SELECT coalesce(o.id, n.id) AS doc_id,
               CASE WHEN o.fpo IS NULL THEN 'added'
                    WHEN n.fpn IS NULL THEN 'removed'
                    WHEN o.fpo <> n.fpn THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM o FULL OUTER JOIN n ON o.id = n.id""",
    "curriculum_shuffle": """
        WITH h AS (
            SELECT doc_id, n_chars,
                   ('0x' || substr(md5('ep1|' || doc_id::VARCHAR),
                                   1, 15))::BIGINT AS h
            FROM documents)
        SELECT doc_id, n_chars, (h % 16)::INT AS shard,
               row_number() OVER (PARTITION BY h % 16
                                  ORDER BY n_chars, h, doc_id)::BIGINT AS seq
        FROM h""",
    "epoch_shuffle": """
        WITH h AS (
            SELECT doc_id,
                   ('0x' || substr(md5('ep1|' || doc_id::VARCHAR),
                                   1, 15))::BIGINT AS h
            FROM documents)
        SELECT doc_id, (h % 16)::INT AS shard,
               row_number() OVER (PARTITION BY h % 16
                                  ORDER BY h, doc_id)::BIGINT AS seq
        FROM h""",
    "train_test_split": f"""
        SELECT CASE WHEN {_SQL_NIB} <= 'b' THEN 'train'
                    WHEN {_SQL_NIB} <= 'd' THEN 'val'
                    ELSE 'test' END AS split,
               count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars
        FROM documents GROUP BY 1""",
    "leakage_safe_split": None,  # assembled below (needs the clusters CTE)
    "weighted_sample": """
        SELECT doc_id, n_chars FROM documents
        WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT::HUGEINT
                  * 700
              < 1152921504606846976::HUGEINT * least(n_chars, 700)""",
    "stratified_sample": """
        SELECT doc_id, source, rk FROM (
            SELECT doc_id, source,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY md5(doc_id::VARCHAR), doc_id)::BIGINT
                       AS rk
            FROM documents) t
        WHERE rk <= 5""",
    "bigram_topk": """
        WITH toks AS (SELECT string_split(text, ' ') AS l FROM documents),
        bg AS (SELECT unnest(list_transform(range(1, len(l)),
                                            i -> l[i] || ' ' || l[i + 1]))
                   AS bigram
               FROM toks)
        SELECT bigram, count(*) AS n FROM bg
        GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""",
    "sequence_pack": """
        WITH packed AS (
            SELECT source, n_chars,
                   floor((sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          - n_chars) / 2000)::BIGINT AS pack_id
            FROM documents)
        SELECT source, pack_id, count(*) AS n_docs,
               sum(n_chars)::BIGINT AS sum_chars
        FROM packed GROUP BY source, pack_id""",
    "data_quality": """
        SELECT count(*) AS n_rows,
               sum((doc_id IS NULL)::INT)::BIGINT AS doc_id_nulls,
               count(DISTINCT doc_id) AS doc_id_distinct,
               sum((lang IS NULL)::INT)::BIGINT AS lang_nulls,
               count(DISTINCT lang) AS lang_distinct,
               sum((source IS NULL)::INT)::BIGINT AS source_nulls,
               count(DISTINCT source) AS source_distinct,
               (count(*) - count(DISTINCT doc_id)) AS dup_ids,
               sum((n_chars <> length(text))::INT)::BIGINT AS bad_nchars
        FROM documents""",
    "quality_filter": f"""
        SELECT source, count(*) AS n_total,
               sum(CASE WHEN {_SQL_QUALITY} >= {QUALITY_THRESHOLD}
                        THEN 1 ELSE 0 END)::BIGINT AS n_kept,
               round(sum(CASE WHEN {_SQL_QUALITY} >= {QUALITY_THRESHOLD}
                              THEN 1 ELSE 0 END)
                     / count(*)::DOUBLE, 6) AS retention
        FROM documents GROUP BY source""",
}

# the leakage-safe split oracle composes the dedup_clusters recursive-CTE
# closure with the same md5-nibble assignment, keyed on keep_id
from hadoop_invertedindexer_spark.plans.contract_temporal import (  # noqa: E402
    SQL_CLUSTERS_CTE_PREFIX,
)

_SQL_KEEP_NIB = "substring(md5(keep_id::VARCHAR), 1, 1)"

PIPELINE_ORACLE_SQL["data_card_incremental"] = PIPELINE_ORACLE_SQL[
    "data_card"
]

# packing-efficiency rollup (r10): the sequence_pack oracle wrapped as
# a CTE, folded per source — keep in lockstep with
# sampling.pack_fill_report at budget=2000
PIPELINE_ORACLE_SQL["pack_fill_report"] = f"""
    WITH per_pack AS ({PIPELINE_ORACLE_SQL["sequence_pack"]})
    SELECT source,
           count(*)::BIGINT AS n_packs,
           sum(n_docs)::BIGINT AS n_docs,
           sum(sum_chars)::BIGINT AS total_weight,
           (sum(sum_chars) * 1000 // (count(*) * 2000))::BIGINT
               AS fill_mils,
           min(sum_chars)::BIGINT AS min_pack,
           max(sum_chars)::BIGINT AS max_pack
    FROM per_pack GROUP BY source"""

PIPELINE_ORACLE_SQL["leakage_safe_split"] = f"""{SQL_CLUSTERS_CTE_PREFIX},
    labeled AS (
        SELECT d.doc_id, coalesce(c.keep, d.doc_id) AS keep_id
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.node)
    SELECT doc_id, keep_id,
           CASE WHEN {_SQL_KEEP_NIB} <= 'b' THEN 'train'
                WHEN {_SQL_KEEP_NIB} <= 'd' THEN 'val'
                ELSE 'test' END AS split
    FROM labeled"""


# split-quality eval (r10): the jaccard-pair and leakage-safe-split
# statements composed verbatim as subqueries (statement-level WITH —
# including the recursive clusters CTE — is legal inside a CTE body),
# each split audited against the same pair set
from hadoop_invertedindexer_spark.plans.contract_llm import (  # noqa: E402
    LLM_ORACLE_SQL as _LLM_SQL,
)

PIPELINE_ORACLE_SQL["split_leakage_report"] = f"""
    WITH pairs AS (
        SELECT id_a, id_b FROM ({_LLM_SQL["ngram_jaccard"]}) j),
    naive AS (
        SELECT doc_id,
               CASE WHEN {_SQL_NIB} <= 'b' THEN 'train'
                    WHEN {_SQL_NIB} <= 'd' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents),
    safe AS (
        SELECT doc_id, split
        FROM ({PIPELINE_ORACLE_SQL["leakage_safe_split"]}) s),
    rep AS (
        SELECT 'hash_split' AS method,
               count(*)::BIGINT AS n_pairs,
               coalesce(sum((na.split <> nb.split)::INT), 0)::BIGINT
                   AS n_straddle
        FROM pairs p
        JOIN naive na ON p.id_a = na.doc_id
        JOIN naive nb ON p.id_b = nb.doc_id
        UNION ALL
        SELECT 'leakage_safe',
               count(*)::BIGINT,
               coalesce(sum((sa.split <> sb.split)::INT), 0)::BIGINT
        FROM pairs p
        JOIN safe sa ON p.id_a = sa.doc_id
        JOIN safe sb ON p.id_b = sb.doc_id)
    SELECT method, n_pairs, n_straddle,
           (CASE WHEN n_pairs = 0 THEN NULL
                 ELSE n_straddle * 1000 // n_pairs END)::BIGINT
               AS straddle_mils
    FROM rep"""
