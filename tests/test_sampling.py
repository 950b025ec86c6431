"""Training-pipeline sampling ops: deterministic split, stratified take,
bigram mining. The contract oracle-checks values at sf0.01; here the
invariants that make them safe to run twice on 100 TB: determinism,
disjointness, quota exactness, and a hand-computed bigram fixture."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hadoop_invertedindexer_spark.operators import sampling
from hadoop_invertedindexer_spark.sources.tables import read_table


def test_hash_split_deterministic_and_partitioning_invariant(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents")
    a = sampling.hash_split(d).select("doc_id", "split")
    b = sampling.hash_split(d.repartition(13)).select("doc_id", "split")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_hash_split_covers_all_rows_once(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents")
    s = sampling.hash_split(d)
    assert s.count() == d.count()
    fractions = {r["split"]: r["n"] for r in
                 s.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(fractions) == {"train", "val", "test"}
    # 75/12.5/12.5 within loose binomial slack at 500 rows
    total = sum(fractions.values())
    assert 0.6 < fractions["train"] / total < 0.9


def test_stratified_take_exact_quota_per_stratum(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents")
    took = sampling.stratified_take(d, "source", n_per_stratum=3)
    per = took.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    n_sources = d.select("source").distinct().count()
    assert len(per) == n_sources
    assert all(r["n"] == 3 for r in per)
    # deterministic: same 3 ids under a different partitioning
    again = sampling.stratified_take(d.repartition(7), "source", n_per_stratum=3)
    assert took.select("doc_id").exceptAll(again.select("doc_id")).count() == 0


def test_bigram_counts_fixture(spark):
    df = spark.createDataFrame(
        [("a b a b",), ("a b",), ("x",)], ["text"]
    )
    got = {r["bigram"]: r["n"] for r in sampling.bigram_counts(df).collect()}
    # "a b a b" -> [a b, b a, a b]; "a b" -> [a b]; "x" -> no bigrams
    assert got == {"a b": 3, "b a": 1}


def test_bigram_single_token_and_empty_safe(spark):
    df = spark.createDataFrame([("solo",), ("",)], ["text"])
    assert sampling.bigram_counts(df).count() == 0


def test_topk_bigrams_deterministic_tiebreak(spark):
    df = spark.createDataFrame([("b c",), ("a b",)], ["text"])
    rows = sampling.topk_bigrams(df, k=1).collect()
    # both bigrams have n=1; 'a b' < 'b c' wins the tiebreak
    assert rows[0]["bigram"] == "a b"


def test_pack_sequences_next_fit_bound(spark, sf_dir):
    """Every pack's weight is < budget + its largest member (next-fit
    bound), packs are contiguous in doc_id order, and assignment is
    partitioning-invariant."""
    d = read_table(spark, sf_dir, "documents")
    budget = 2000
    packed = sampling.pack_sequences(d, budget=budget)
    stats = (
        packed.groupBy("source", "pack_id")
        .agg(
            F.sum("n_chars").alias("w"),
            F.max("n_chars").alias("mx"),
            F.min("doc_id").alias("lo"),
            F.max("doc_id").alias("hi"),
        )
        .collect()
    )
    assert stats
    for r in stats:
        assert r["w"] < budget + r["mx"], f"pack over bound: {r}"
    # contiguity: id ranges of consecutive packs in a source never overlap
    by_source: dict[str, list] = {}
    for r in stats:
        by_source.setdefault(r["source"], []).append(r)
    for rows in by_source.values():
        rows.sort(key=lambda r: r["pack_id"])
        for a, b in zip(rows, rows[1:]):
            assert a["hi"] < b["lo"]
    again = sampling.pack_sequences(d.repartition(11), budget=budget).select(
        "doc_id", "pack_id"
    )
    assert packed.select("doc_id", "pack_id").exceptAll(again).count() == 0


def test_chunk_text_windows_and_overlap(spark):
    df = spark.createDataFrame([(1, "a" * 350)], ["doc_id", "text"])
    rows = sorted(
        sampling.chunk_text(df, chunk_chars=200, overlap=50).collect(),
        key=lambda r: r.chunk_id,
    )
    # ceil((350-50)/150) = 2 chunks; second starts at stride 150, runs short
    assert [r.n_chars for r in rows] == [200, 200]
    assert rows[1].chunk_id == 1
    df2 = spark.createDataFrame([(1, "b" * 351)], ["doc_id", "text"])
    rows2 = sampling.chunk_text(df2, chunk_chars=200, overlap=50).collect()
    assert [r.n_chars for r in sorted(rows2, key=lambda r: r.chunk_id)] == [200, 200, 51]


def test_chunk_text_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "short")], ["doc_id", "text"])
    rows = sampling.chunk_text(df, chunk_chars=200, overlap=50).collect()
    assert len(rows) == 1 and rows[0].chunk == "short" and rows[0].n_chars == 5


def test_chunk_text_reassembles_document(spark):
    text = "".join(chr(97 + i % 26) for i in range(487))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        sampling.chunk_text(df, chunk_chars=100, overlap=20).collect(),
        key=lambda r: r.chunk_id,
    )
    # stitching chunk[0] + each subsequent chunk minus its 20-char overlap
    # reproduces the document exactly — no gaps, no repeats
    stitched = rows[0].chunk + "".join(r.chunk[20:] for r in rows[1:])
    assert stitched == text


def test_chunk_text_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    try:
        sampling.chunk_text(df, chunk_chars=50, overlap=50)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_temperature_mix_rebalances_toward_rare_strata(spark):
    rows = [(i, "big" if i < 100 else "small") for i in range(104)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = sampling.temperature_mix(df, docs_per_sqrt=1).collect()
    by = {}
    for r in out:
        by.setdefault(r.lang, []).append(r)
    # quotas: big floor(sqrt(100))=10 of 100 (10%), small sqrt(4)=2 of 4 (50%)
    assert len(by["big"]) == 10 and len(by["small"]) == 2
    assert all(r.quota == 10 for r in by["big"])
    # selection is deterministic: rerun picks the identical ids
    again = {r.doc_id for r in sampling.temperature_mix(df, docs_per_sqrt=1).collect()}
    assert again == {r.doc_id for r in out}


def test_temperature_mix_quota_capped_at_stratum_size(spark):
    df = spark.createDataFrame([(i, "only") for i in range(5)], ["doc_id", "lang"])
    out = sampling.temperature_mix(df, docs_per_sqrt=10).collect()
    # 10*floor(sqrt(5))=20 > 5 -> capped, every row kept exactly once
    assert sorted(r.doc_id for r in out) == [0, 1, 2, 3, 4]


def test_weighted_sample_boundary_weights(spark):
    # weight 0 -> never kept; weight >= denom -> always kept (h < 2^60 strictly)
    rows = [(i, 0) for i in range(50)] + [(i, 700 + i) for i in range(100, 150)]
    df = spark.createDataFrame(rows, ["doc_id", "n_chars"])
    kept = {r.doc_id for r in sampling.weighted_sample(df, denom=700).collect()}
    assert kept == set(range(100, 150))


def test_weighted_sample_rate_tracks_weight_and_is_deterministic(spark):
    # half-weight rows should be kept at ~50%; exact set stable across runs
    df = spark.createDataFrame([(i, 350) for i in range(2000)], ["doc_id", "n_chars"])
    kept = {r.doc_id for r in sampling.weighted_sample(df, denom=700).collect()}
    assert 0.42 <= len(kept) / 2000 <= 0.58
    again = {r.doc_id for r in sampling.weighted_sample(df, denom=700).collect()}
    assert kept == again


def test_weighted_sample_is_scan_level_filter(spark, sf_dir):
    from hadoop_invertedindexer_spark.sources.tables import read_table

    plan = (
        sampling.weighted_sample(read_table(spark, sf_dir, "documents"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure projection+filter, no shuffle


def test_leakage_safe_split_keeps_clusters_together(spark):
    """The property the operator exists for: near-dup cluster members can
    NEVER straddle splits — and the fixture is built so a plain per-doc
    hash split WOULD straddle them (ids 0..3 hash to different nibbles)."""
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], ["doc_id", "text"]
    )
    # one 4-doc cluster (chained pairs) + one 2-doc cluster
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (7, 8)], ["id_a", "id_b"]
    )
    out = {r.doc_id: r for r in sampling.leakage_safe_split(docs, pairs).collect()}
    assert len(out) == 10
    assert {out[i].keep_id for i in (0, 1, 2, 3)} == {0}
    assert {out[i].split for i in (0, 1, 2, 3)} == {out[0].split}
    assert {out[i].keep_id for i in (7, 8)} == {7}
    assert out[7].split == out[8].split
    # singletons keep their own id and the plain hash assignment
    plain = {r.doc_id: r.split for r in sampling.hash_split(docs).collect()}
    for i in (4, 5, 6, 9):
        assert out[i].keep_id == i and out[i].split == plain[i]
    # the fixture is non-trivial: a per-doc split WOULD have straddled
    # the 4-doc cluster
    assert len({plain[i] for i in (0, 1, 2, 3)}) > 1


class TestDataCard:
    """Corpus data-card report (r10): per-(source, lang, quality) cell
    counts on planted inputs — the dup flags are corpus-wide, the
    token counting matches mixture_plan, rates in thousandths."""

    STOP = ["the", "and", "for", "with", "that", "this", "from"]

    def test_hand_computed_cells(self, spark):
        # 'the and with' markers force lang=en; dup = exact normalized
        # copy ACROSS sources (still counts — corpus-wide convention)
        rows = [
            (1, "the quick and brown fox runs with vigor today", "web"),
            (2, "the quick and brown fox runs with vigor today", "books"),
            (3, "der hund und die katze ist mit haus", "web"),
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
        out = {
            (r.source, r.lang): r
            for r in sampling.data_card(docs, self.STOP).collect()
        }
        web_en = out[("web", "en")]
        assert (web_en.n_docs, web_en.n_tokens) == (1, 9)
        assert (web_en.n_dup_docs, web_en.dup_rate_mils) == (0, 0)
        # doc 2 is the corpus-wide duplicate (doc 1 is first), so the
        # books cell reports 1 dup doc and zero net mass
        books = out[("books", "en")]
        assert (books.n_docs, books.n_dup_docs) == (1, 1)
        assert (books.net_docs, books.net_tokens) == (0, 0)
        assert books.dup_rate_mils == 1000
        assert ("web", "de") in out  # the German doc lands in its cell

    def test_net_masses_match_mixture_plan(self, spark):
        from pyspark.sql import Window

        from hadoop_invertedindexer_spark.operators.dedup import (
            normalized_text,
        )

        rows = [
            (i, f"some text number {i % 3} the and with filler words", "s0")
            for i in range(9)
        ] + [(100 + i, "unique doc " + "tok " * i, "s1") for i in range(4)]
        docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
        card = sampling.data_card(docs, self.STOP).collect()
        net = {}
        for r in card:
            net[r.source] = net.get(r.source, 0) + r.net_tokens
        deduped = (
            docs.withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy(normalized_text("text")).orderBy(
                        "doc_id"
                    )
                ),
            )
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        plan = sampling.mixture_plan(
            deduped, {"s0": 500, "s1": 500}, 1000, strata_col="source"
        )
        assert {r.stratum: r.avail_tokens for r in plan.collect()} == net

    def test_quality_bucket_cut(self, spark):
        # a punctuation-soup doc falls in 'lo', clean prose in 'hi'
        rows = [
            (1, "the gentle morning light spread over the hills and the"
                " river ran with calm water that day for everyone", "w"),
            (2, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))", "w"),
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
        out = {r.quality_bucket for r in sampling.data_card(docs, self.STOP).collect()}
        assert out == {"hi", "lo"}


class TestMixturePlan:
    def test_hand_computed_rates(self, spark):
        rows = [
            (1, "one two three four", "a"),       # 4 tokens
            (2, "five six", "a"),                 # 2 tokens -> a avail 6
            (3, "seven eight nine ten", "b"),     # b avail 4
            (4, "lone", "c"),                     # c: not in weights
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
        out = {
            r.stratum: (r.n_docs, r.avail_tokens, r.target_tokens,
                        r.rate_mils)
            for r in sampling.mixture_plan(
                docs, {"a": 600, "b": 250, "zz": 100}, 100
            ).collect()
        }
        # target = floor(100 * w / 1000); rate = floor(target*1000/avail)
        assert out["a"] == (2, 6, 60, 10000)   # 10 epochs of stratum a
        assert out["b"] == (1, 4, 25, 6250)
        assert out["c"] == (1, 1, 0, 0)        # unweighted -> dropped
        assert "zz" not in out                 # absent stratum: no row

    def test_rate_feeds_upsample_contract(self, spark):
        # rate_mils == 1000 exactly when target == avail (identity plan)
        docs = spark.createDataFrame(
            [(i, "tok " * 10, "x") for i in range(5)],
            ["doc_id", "text", "lang"],
        )
        out = sampling.mixture_plan(docs, {"x": 1000}, 50).collect()[0]
        assert out.avail_tokens == 50 and out.target_tokens == 50
        assert out.rate_mils == 1000


class TestEpochShuffle:
    def test_permutation_properties(self, spark, sf_dir):
        d = read_table(spark, sf_dir, "documents")
        s = sampling.epoch_shuffle(d, n_shards=8, epoch=0)
        rows = s.select("doc_id", "shard", "seq").collect()
        assert len(rows) == d.count()  # a permutation: every row, once
        assert len({r.doc_id for r in rows}) == len(rows)
        # within each shard, seq is exactly 1..count (dense, 1-based)
        by_shard: dict[int, list[int]] = {}
        for r in rows:
            by_shard.setdefault(r.shard, []).append(r.seq)
        for seqs in by_shard.values():
            assert sorted(seqs) == list(range(1, len(seqs) + 1))

    def test_reproducible_and_epoch_varies(self, spark, sf_dir):
        d = read_table(spark, sf_dir, "documents")
        a = sorted(
            (r.doc_id, r.shard, r.seq)
            for r in sampling.epoch_shuffle(d, 8, epoch=1).collect()
        )
        b = sorted(
            (r.doc_id, r.shard, r.seq)
            for r in sampling.epoch_shuffle(
                d.repartition(11), 8, epoch=1
            ).collect()
        )
        assert a == b  # rerun + repartition reproduce the permutation
        c = sorted(
            (r.doc_id, r.shard, r.seq)
            for r in sampling.epoch_shuffle(d, 8, epoch=2).collect()
        )
        assert a != c  # a new epoch is a fresh permutation

    def test_curriculum_order_within_unchanged_shards(self, spark, sf_dir):
        d = read_table(spark, sf_dir, "documents")
        plain = {
            r.doc_id: r.shard
            for r in sampling.epoch_shuffle(d, 8, epoch=3).collect()
        }
        curr = sampling.epoch_shuffle(
            d, 8, epoch=3, order_col="n_chars"
        ).collect()
        # shard assignment is untouched by the curriculum key
        assert {r.doc_id: r.shard for r in curr} == plain
        lens = {r.doc_id: r.n_chars for r in d.select(
            "doc_id", "n_chars").collect()}
        by_shard: dict[int, list[tuple[int, int]]] = {}
        for r in curr:
            by_shard.setdefault(r.shard, []).append((r.seq, lens[r.doc_id]))
        for rows in by_shard.values():
            ordered = [n for _, n in sorted(rows)]
            assert ordered == sorted(ordered)  # shortest-first stream

    def test_write_epoch_shards_layout(self, spark, sf_dir, tmp_path):
        d = read_table(spark, sf_dir, "documents").limit(100)
        out = str(tmp_path / "shards")
        sampling.write_epoch_shards(d, out, n_shards=4, epoch=0)
        back = spark.read.parquet(out)
        want = {
            (r.doc_id, r.shard, r.seq)
            for r in sampling.epoch_shuffle(d, 4, epoch=0).collect()
        }
        got = {(r.doc_id, r.shard, r.seq) for r in back.collect()}
        assert got == want
        # within one shard directory, file row order IS seq order
        one = back.where(F.col("shard") == back.select(
            F.min("shard")).collect()[0][0])
        seqs = [r.seq for r in one.collect()]
        assert seqs == sorted(seqs)


class TestUpsampleCorpus:
    def _ups(self, spark, rows, weights, repart=None):
        from hadoop_invertedindexer_spark.operators import sampling

        df = spark.createDataFrame(rows, ["doc_id", "lang"])
        if repart:
            df = df.repartition(repart)
        out = sampling.upsample_corpus(df, weights)
        return [(r.doc_id, r.lang, r.epoch) for r in out.collect()]

    def test_integer_weights_exact_and_zero_drops(self, spark):
        rows = [(i, "de" if i % 2 else "zh") for i in range(20)]
        got = self._ups(spark, rows, {"de": 2000, "zh": 0})
        assert all(lang == "de" for _, lang, _ in got)
        de_ids = [i for i in range(20) if i % 2]
        assert sorted(got) == sorted(
            [(i, "de", e) for i in de_ids for e in (1, 2)]
        )

    def test_fractional_weight_is_deterministic_and_bounded(self, spark):
        rows = [(i, "fr") for i in range(200)]
        a = sorted(self._ups(spark, rows, {"fr": 2500}))
        b = sorted(self._ups(spark, rows, {"fr": 2500}, repart=13))
        assert a == b  # same extra-copy decisions on any partitioning
        total = len(a)
        assert 2 * 200 <= total <= 3 * 200
        # expected 2.5x with hash-uniform extras; 200 trials stay well
        # inside ±4 sigma of Binomial(200, 0.5)
        assert abs(total - 500) < 4 * 7.1
        # epochs are dense 1..copies per doc
        per_doc = {}
        for i, _, e in a:
            per_doc.setdefault(i, []).append(e)
        assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_doc.values())

    def test_unlisted_stratum_passes_through_once(self, spark):
        got = self._ups(spark, [(1, "xx"), (2, "xx")], {"de": 3000})
        assert sorted(got) == [(1, "xx", 1), (2, "xx", 1)]


class TestDsirSelect:
    """Planted-distribution fixtures for DSIR: raw docs sharing the
    target's n-gram distribution must outrank disjoint-vocabulary docs,
    and the Gumbel selection must be reproducible."""

    @pytest.fixture(scope="class")
    def pools(self, spark):
        target = spark.createDataFrame(
            [
                (1000 + i,
                 "solar panels convert sunlight into clean electric power "
                 "for homes and grids")
                for i in range(5)
            ],
            ["doc_id", "text"],
        )
        raw = spark.createDataFrame(
            [
                # target-like docs: share unigrams AND bigrams
                (1, "solar panels convert sunlight into electric power"),
                (2, "clean electric power for homes and solar grids"),
                # off-distribution docs: disjoint vocabulary
                (3, "medieval castles stored grain behind thick stone walls"),
                (4, "jazz quartets improvise over walking bass lines nightly"),
            ],
            ["doc_id", "text"],
        )
        return raw, target

    def test_target_like_docs_outrank(self, spark, pools):
        raw, target = pools
        out = sampling.dsir_select(
            raw, target, k=2, n_buckets=256
        ).collect()
        assert {r.doc_id for r in out} == {1, 2}
        # importance weights: target-like strictly positive-er
        logw = {r.doc_id: r.logw for r in sampling.dsir_select(
            raw, target, k=4, n_buckets=256).collect()}
        assert min(logw[1], logw[2]) > max(logw[3], logw[4])

    def test_deterministic_across_runs_and_seed_sensitivity(self, spark, pools):
        raw, target = pools
        a = sorted(sampling.dsir_select(raw, target, k=3, n_buckets=256)
                   .collect())
        b = sorted(sampling.dsir_select(raw, target, k=3, n_buckets=256)
                   .collect())
        assert a == b  # same seed => identical keys and selection
        c = {r.doc_id: r.sel_key for r in sampling.dsir_select(
            raw, target, k=4, n_buckets=256, seed="other").collect()}
        d = {r.doc_id: r.sel_key for r in sampling.dsir_select(
            raw, target, k=4, n_buckets=256).collect()}
        assert c != d  # Gumbel noise moves with the seed

    def test_gumbel_false_is_plain_topk(self, spark, pools):
        raw, target = pools
        out = sampling.dsir_select(
            raw, target, k=4, n_buckets=256, gumbel=False
        ).collect()
        # sel_key == logw when no noise, ordering by weight
        assert all(abs(r.sel_key - r.logw) < 1e-9 for r in out)
        ordered = [r.doc_id for r in out]
        assert set(ordered[:2]) == {1, 2}


class TestDsirModelIndex:
    """Persisted DSIR model: scoring the model's own raw pool equals the
    direct path; a new batch scores O(batch) against the stored table."""

    def test_incremental_equals_direct_on_raw_pool(self, spark, tmp_path):
        target = spark.createDataFrame(
            [(100 + i, "solar panels convert sunlight into power")
             for i in range(3)],
            ["doc_id", "text"],
        )
        raw = spark.createDataFrame(
            [
                (1, "solar panels convert light"),
                (2, "medieval castles and stone walls"),
                (3, "sunlight into clean power grids"),
            ],
            ["doc_id", "text"],
        )
        path = str(tmp_path / "dsir")
        sampling.build_dsir_model(raw, target, path, n_buckets=128)
        direct = sorted(
            tuple(r)
            for r in sampling.dsir_select(
                raw, target, k=3, n_buckets=128
            ).collect()
        )
        stored = sorted(
            tuple(r)
            for r in sampling.dsir_select_incremental(
                spark, raw, path, k=3
            ).collect()
        )
        assert direct == stored

    def test_new_batch_scores_against_frozen_model(self, spark, tmp_path):
        target = spark.createDataFrame(
            [(100, "solar panels convert sunlight into power")],
            ["doc_id", "text"],
        )
        raw = spark.createDataFrame(
            [(1, "medieval castles and stone walls")], ["doc_id", "text"]
        )
        path = str(tmp_path / "dsir")
        sampling.build_dsir_model(raw, target, path, n_buckets=128)
        batch = spark.createDataFrame(
            [
                (10, "solar panels convert sunlight"),   # target-like
                (11, "jazz quartets improvise nightly"),  # off-distribution
            ],
            ["doc_id", "text"],
        )
        out = sampling.dsir_select_incremental(
            spark, batch, path, k=2, gumbel=False
        ).collect()
        logw = {r.doc_id: r.logw for r in out}
        assert logw[10] > logw[11]
        # repeat scoring: the stored model is frozen => identical result
        again = sampling.dsir_select_incremental(
            spark, batch, path, k=2, gumbel=False
        ).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, again))


class TestDsirModelDivergence:
    """Model-health metrics off the stored counts: coverage is exact on
    a hand-built corpus, KL >= 0 and ~0 for identical distributions, and
    the batch-staleness signal climbs for a drifted ingest and resets
    after a rebuild."""

    def test_identical_distributions_near_zero_kl(self, spark, tmp_path):
        same = [(i, "alpha beta gamma delta") for i in range(4)]
        target = spark.createDataFrame(same, ["doc_id", "text"])
        raw = spark.createDataFrame(
            [(100 + i, t) for i, t in enumerate(x[1] for x in same)],
            ["doc_id", "text"],
        )
        path = str(tmp_path / "m")
        sampling.build_dsir_model(raw, target, path, n_buckets=64)
        r = sampling.dsir_model_divergence(spark, path).head()
        assert r.n_buckets == 64
        # 4 unigrams + 3 bigrams = 7 distinct grams on BOTH sides;
        # coverage counts BUCKETS, so hash collisions may merge some
        assert r.n_target_buckets == r.n_raw_buckets
        assert 1 <= r.n_target_buckets <= 7
        assert abs(r.kl_target_raw) < 1e-6 and abs(r.max_abs_lr) < 1e-6

    def test_batch_drift_climbs_and_rebuild_resets(self, spark, tmp_path):
        target = spark.createDataFrame(
            [(1, "solar panels convert sunlight")], ["doc_id", "text"]
        )
        raw = spark.createDataFrame(
            [(10 + i, "medieval castles and stone walls") for i in range(3)],
            ["doc_id", "text"],
        )
        path = str(tmp_path / "m")
        sampling.build_dsir_model(raw, target, path, n_buckets=64)
        like_raw = spark.createDataFrame(
            [(50, "medieval castles and stone walls")], ["doc_id", "text"]
        )
        drifted = spark.createDataFrame(
            [(60, "quantum chips etch qubits onto wafers")], ["doc_id", "text"]
        )
        kl_like = sampling.dsir_model_divergence(
            spark, path, batch=like_raw
        ).head().kl_batch_raw
        kl_drift = sampling.dsir_model_divergence(
            spark, path, batch=drifted
        ).head().kl_batch_raw
        assert kl_drift > kl_like >= 0
        # rebuild over the shifted raw pool: the drifted batch is now
        # in-distribution and its staleness signal drops
        sampling.build_dsir_model(
            raw.unionByName(drifted), target, path, n_buckets=64
        )
        kl_after = sampling.dsir_model_divergence(
            spark, path, batch=drifted
        ).head().kl_batch_raw
        assert kl_after < kl_drift


class TestMaintainDsirModel:
    """r12: the staleness-triggered rebuild wrapper — divergence probe
    as trigger, build_dsir_model into a rotation dir as remediation."""

    def _model(self, spark, tmp_path):
        target = spark.createDataFrame(
            [(1, "solar panels convert sunlight")], ["doc_id", "text"]
        )
        raw = spark.createDataFrame(
            [(10 + i, "medieval castles and stone walls") for i in range(3)],
            ["doc_id", "text"],
        )
        path = str(tmp_path / "m")
        sampling.build_dsir_model(raw, target, path, n_buckets=64)
        return path, target, raw

    def test_drifted_batch_triggers_rotation(self, spark, tmp_path):
        import os

        path, target, _raw = self._model(spark, tmp_path)
        drifted = spark.createDataFrame(
            [(60, "quantum chips etch qubits onto wafers")],
            ["doc_id", "text"],
        )
        dest = str(tmp_path / "m_rot")
        r = sampling.maintain_dsir_model(
            spark, path, dest, batch=drifted, target=target,
            max_kl_batch_mils=1,
        ).head()
        assert r.rebuilt is True and r.kl_batch_raw * 1000 > 1
        assert os.path.isdir(f"{dest}/model")
        # rebuild kept the stored hash space and re-estimated raw from
        # the batch: the drifted stream is now in-distribution
        p = spark.read.parquet(f"{dest}/params").head()
        assert p.n_buckets == 64
        kl_after = sampling.dsir_model_divergence(
            spark, dest, batch=drifted
        ).head().kl_batch_raw
        assert kl_after < r.kl_batch_raw

    def test_in_distribution_batch_skips(self, spark, tmp_path):
        import os

        path, target, raw = self._model(spark, tmp_path)
        dest = str(tmp_path / "m_rot")
        like_raw = raw.limit(1)
        # the tiny 64-bucket fixture carries ~53 mils of smoothing
        # noise even for an exactly-in-distribution batch; the test
        # threshold sits above it (real deployments size n_buckets so
        # the noise floor is far below any actionable threshold)
        r = sampling.maintain_dsir_model(
            spark, path, dest, batch=like_raw, target=target,
            max_kl_batch_mils=100,
        ).head()
        assert r.rebuilt is False
        assert not os.path.exists(dest)  # NOTHING written below threshold

    def test_explicit_raw_pool_used_for_rebuild(self, spark, tmp_path):
        path, target, raw = self._model(spark, tmp_path)
        drifted = spark.createDataFrame(
            [(60, "quantum chips etch qubits onto wafers")],
            ["doc_id", "text"],
        )
        dest = str(tmp_path / "m_rot")
        sampling.maintain_dsir_model(
            spark, path, dest, batch=drifted, target=target,
            raw=raw.unionByName(drifted), max_kl_batch_mils=1,
        ).collect()
        # dest must equal a direct build over the explicit pool
        direct = str(tmp_path / "m_direct")
        sampling.build_dsir_model(
            raw.unionByName(drifted), target, direct, n_buckets=64
        )
        got = {
            (r.feature, r.ct, r.cr)
            for r in spark.read.parquet(f"{dest}/model").collect()
        }
        want = {
            (r.feature, r.ct, r.cr)
            for r in spark.read.parquet(f"{direct}/model").collect()
        }
        assert got == want

    def test_refuses_in_place(self, spark, tmp_path):
        import pytest

        path, target, _raw = self._model(spark, tmp_path)
        with pytest.raises(ValueError, match="in place"):
            sampling.maintain_dsir_model(
                spark, path, path, batch=target, target=target
            )

    def test_empty_model_reports_no_rebuild(self, spark, tmp_path):
        """ADVICE r12: an empty stored model table makes every
        divergence aggregate NULL; the maintainer must treat NULL
        staleness as 'no evidence, no rebuild' (rebuilt=False), not
        TypeError on None arithmetic."""
        import os

        path, target, _raw = self._model(spark, tmp_path)
        empty = spark.read.parquet(f"{path}/model").limit(0)
        empty.write.mode("overwrite").parquet(f"{path}/model")
        dest = str(tmp_path / "m_rot")
        r = sampling.maintain_dsir_model(
            spark, path, dest, batch=target, target=target,
            max_kl_batch_mils=0,
        ).head()
        assert r.rebuilt is False and r.kl_batch_raw is None
        assert not os.path.exists(dest)  # nothing rotated


class TestDataCardIncremental:
    """O(batch) card maintenance (r10): merged old+incremental must
    equal the direct full-corpus card, including cross-boundary dups,
    in-batch dups, and cells that exist only in the batch."""

    STOP = ["the", "and", "for", "with", "that", "this", "from"]

    def _cards_equal(self, a, b):
        key = lambda r: (r.source, r.lang, r.quality_bucket)  # noqa: E731
        return {key(r): tuple(r) for r in a.collect()} == {
            key(r): tuple(r) for r in b.collect()
        }

    def test_merged_equals_direct(self, spark, tmp_path):
        from hadoop_invertedindexer_spark.operators import dedup

        old_rows = [
            (1, "the quick and brown fox runs with vigor", "web"),
            (2, "der hund und die katze ist mit haus", "web"),
        ]
        batch_rows = [
            # cross-boundary dup of doc 1 (different source — corpus-wide)
            (10, "the quick and brown fox runs with vigor", "books"),
            # in-batch dup pair
            (11, "the fresh and novel words with merit", "web"),
            (12, "the fresh and novel words with merit", "web"),
            # a source that exists only in the batch
            (13, "el perro y el gato para la casa", "crawl"),
        ]
        old = spark.createDataFrame(old_rows, ["doc_id", "text", "source"])
        batch = spark.createDataFrame(
            batch_rows, ["doc_id", "text", "source"]
        )
        path = str(tmp_path / "exidx")
        dedup.build_exact_index(old, path)
        merged = sampling.merge_data_cards(
            sampling.data_card(old, self.STOP),
            sampling.data_card_incremental(spark, batch, path, self.STOP),
        )
        direct = sampling.data_card(old.unionByName(batch), self.STOP)
        assert self._cards_equal(merged, direct)
        # the cross-boundary and in-batch dups actually registered
        inc = {
            (r.source, r.lang): r
            for r in sampling.data_card_incremental(
                spark, batch, path, self.STOP
            ).collect()
        }
        assert inc[("books", "en")].n_dup_docs == 1   # published copy wins
        assert inc[("web", "en")].n_dup_docs == 1     # second in-batch copy

    def test_merge_is_a_pure_fold(self, spark):
        cols = [
            "source", "lang", "quality_bucket", "n_docs", "n_tokens",
            "n_dup_docs", "dup_tokens", "net_docs", "net_tokens",
            "dup_rate_mils",
        ]
        a = spark.createDataFrame(
            [("web", "en", "hi", 4, 40, 1, 10, 3, 30, 250)], cols
        )
        b = spark.createDataFrame(
            [
                ("web", "en", "hi", 2, 20, 1, 8, 1, 12, 500),
                ("crawl", "es", "lo", 3, 33, 0, 0, 3, 33, 0),
            ],
            cols,
        )
        got = {
            (r.source, r.lang, r.quality_bucket): r
            for r in sampling.merge_data_cards(a, b).collect()
        }
        web = got[("web", "en", "hi")]
        assert (web.n_docs, web.n_tokens, web.n_dup_docs) == (6, 60, 2)
        assert (web.net_docs, web.net_tokens) == (4, 42)
        assert web.dup_rate_mils == 333  # floor(2*1000/6), recomputed
        assert got[("crawl", "es", "lo")].n_docs == 3


def test_streaming_data_card_matches_direct(spark, tmp_path):
    """The stream-maintained card tiers must fold into exactly the
    one-shot data_card over everything published (files arrive in id
    order), and a fresh-checkpoint replay must converge to the same
    answer (the batch < batch_id filter + overwrite-own-tier
    idempotency)."""
    import glob
    import os
    import shutil

    from pyspark.sql import types as T

    from hadoop_invertedindexer_spark.streaming import index_maintenance

    STOP = ["the", "and", "for", "with", "that", "this", "from"]
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("source", T.StringType()),
        ]
    )
    day1 = spark.createDataFrame(
        [
            (1, "the quick and brown fox runs with vigor", "web"),
            (2, "der hund und die katze ist mit haus", "web"),
        ],
        schema,
    )
    day2 = spark.createDataFrame(
        [
            # cross-batch dup of doc 1, different source
            (10, "the quick and brown fox runs with vigor", "books"),
            # in-batch dup pair
            (11, "the fresh and novel words with merit", "web"),
            (12, "the fresh and novel words with merit", "web"),
        ],
        schema,
    )
    stage, src = str(tmp_path / "stage"), str(tmp_path / "src")
    day1.coalesce(1).write.mode("overwrite").parquet(f"{stage}/d1")
    day2.coalesce(1).write.mode("overwrite").parquet(f"{stage}/d2")
    os.makedirs(src, exist_ok=True)
    # distinct mtimes: the file source orders by modification time, and
    # equal stamps make day order (which the dup convention depends on)
    # nondeterministic
    import time as _time

    t0 = _time.time() - 1000
    for i, d in enumerate(sorted(glob.glob(f"{stage}/d*/part-*.parquet"))):
        shutil.copyfile(d, f"{src}/day{i}.parquet")
        os.utime(f"{src}/day{i}.parquet", (t0 + 100 * i, t0 + 100 * i))

    card_path = str(tmp_path / "card")
    index_maintenance.maintain_data_card(
        spark, src, schema, card_path, str(tmp_path / "ck1"), STOP
    )

    def as_map(df):
        return {
            (r.source, r.lang, r.quality_bucket): tuple(r)
            for r in df.collect()
        }

    direct = as_map(sampling.data_card(day1.unionByName(day2), STOP))
    got = as_map(index_maintenance.read_data_card(spark, card_path))
    assert got == direct
    # the cross-batch duplicate actually registered in its tier
    tier2 = {
        (r.source, r.lang): r.n_dup_docs
        for r in spark.read.parquet(f"{card_path}/cards/batch=1").collect()
    }
    assert tier2[("books", "en")] == 1
    # replay with a fresh checkpoint: converges, never double-counts
    index_maintenance.maintain_data_card(
        spark, src, schema, card_path, str(tmp_path / "ck2"), STOP
    )
    assert as_map(index_maintenance.read_data_card(spark, card_path)) == direct


class TestPackFillReport:
    def test_hand_computed_fill(self, spark):
        # budget 10, one stratum: weights 6,6,6 -> next-fit packs
        # {6}, {6}, {6}? exclusive cumsums 0,6,12 -> pack_ids 0,0,1:
        # packs {6,6}=12 (overshoot) and {6}=6
        docs = spark.createDataFrame(
            [(1, 6, "a"), (2, 6, "a"), (3, 6, "a")],
            ["doc_id", "n_chars", "source"],
        )
        r = sampling.pack_fill_report(docs, budget=10).first()
        assert (r.n_packs, r.n_docs, r.total_weight) == (2, 3, 18)
        assert r.fill_mils == 900  # 18*1000 // (2*10)
        assert (r.min_pack, r.max_pack) == (6, 12)  # next-fit overshoot

    def test_perfect_fill_is_1000(self, spark):
        docs = spark.createDataFrame(
            [(i, 5, "b") for i in range(1, 5)],
            ["doc_id", "n_chars", "source"],
        )
        r = sampling.pack_fill_report(docs, budget=10).first()
        assert (r.n_packs, r.fill_mils) == (2, 1000)
        assert r.min_pack == r.max_pack == 10


class TestSplitLeakageReport:
    def test_hand_computed_straddle(self, spark):
        split = spark.createDataFrame(
            [(1, "train"), (2, "test"), (3, "train"), (4, "val")],
            ["doc_id", "split"],
        )
        pairs = spark.createDataFrame(
            [(1, 2), (1, 3), (3, 4)], ["id_a", "id_b"]
        )
        r = sampling.split_leakage_report(split, pairs, method="m").first()
        # (1,2) train/test straddles, (1,3) same, (3,4) train/val straddles
        assert (r.method, r.n_pairs, r.n_straddle) == ("m", 3, 2)
        assert r.straddle_mils == 666

    def test_empty_pairs_rate_is_null(self, spark):
        split = spark.createDataFrame([(1, "train")], ["doc_id", "split"])
        pairs = spark.createDataFrame([], "id_a long, id_b long")
        r = sampling.split_leakage_report(split, pairs).first()
        assert (r.n_pairs, r.n_straddle, r.straddle_mils) == (0, 0, None)

    def test_leakage_safe_split_audits_to_zero(self, spark):
        # a 3-doc near-dup cluster: the cluster-keyed split must show 0
        docs = spark.createDataFrame(
            [(i, "near duplicate shared text body here") for i in (1, 2, 3)]
            + [(9, "completely different other words")],
            ["doc_id", "text"],
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3)], ["id_a", "id_b"]
        )
        safe = sampling.leakage_safe_split(docs, pairs).select(
            "doc_id", "split"
        )
        r = sampling.split_leakage_report(safe, pairs).first()
        assert (r.n_pairs, r.n_straddle, r.straddle_mils) == (2, 0, 0)
