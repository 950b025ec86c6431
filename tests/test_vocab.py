"""Vocabulary build + token-id encoding fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_invertedindexer_spark.operators import vocab
from hadoop_invertedindexer_spark.sources.tables import read_table


def test_vocab_rank_order_and_ties(spark):
    docs = spark.createDataFrame(
        [(1, "bb aa bb cc aa bb"), (2, "aa cc dd")], ["doc_id", "text"]
    )
    v = {r.token: (r.token_id, r.n_occurrences) for r in vocab.build_vocab(docs).collect()}
    # bb:3  aa:3  cc:2  dd:1 — tie bb/aa broken by token asc => aa first
    assert v["aa"] == (1, 3) and v["bb"] == (2, 3)
    assert v["cc"] == (3, 2) and v["dd"] == (4, 1)


def test_vocab_max_size_caps(spark):
    docs = spark.createDataFrame([(1, "a b c d e f g h")], ["doc_id", "text"])
    assert vocab.build_vocab(docs, max_size=3).count() == 3


def test_encode_roundtrip_and_oov(spark):
    docs = spark.createDataFrame(
        [(1, "bb aa zz bb"), (2, "")], ["doc_id", "text"]
    )
    train = spark.createDataFrame([(9, "aa bb aa bb bb")], ["doc_id", "text"])
    v = vocab.build_vocab(train)  # bb=1 (3x), aa=2 (2x); zz OOV
    out = {r.doc_id: r for r in vocab.encode_tokens(docs, v).collect()}
    assert out[1].ids_str == "1,2,0,1"
    assert out[1].n_tokens == 4 and out[1].n_oov == 1
    assert 2 not in out  # empty text has no tokens -> no row


def test_encode_deterministic_under_repartition(spark):
    rows = [(i, f"tok{i % 5} tok{i % 3} shared words here") for i in range(40)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    v = vocab.build_vocab(docs, max_size=6)
    a = sorted((r.doc_id, r.ids_str) for r in vocab.encode_tokens(docs, v).collect())
    b = sorted(
        (r.doc_id, r.ids_str)
        for r in vocab.encode_tokens(docs.repartition(13), v).collect()
    )
    assert a == b


def test_incremental_vocab_merge_equals_rebuild(spark):
    """Batch-vs-rebuild equality: merging two batches' counts then
    ranking == building the vocab over the concatenated corpus."""
    a = spark.createDataFrame(
        [(1, "aa bb aa cc"), (2, "bb dd")], ["doc_id", "text"]
    )
    b = spark.createDataFrame(
        [(3, "aa ee bb"), (4, "cc cc ff")], ["doc_id", "text"]
    )
    counts_a = (
        vocab.build_vocab(a, max_size=10 ** 6).select("token", "n_occurrences")
    )
    merged = vocab.rank_vocab(vocab.merge_vocab_counts(counts_a, b), max_size=100)
    rebuilt = vocab.build_vocab(a.unionAll(b), max_size=100)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )


def test_incremental_vocab_merge_idempotent_empty_batch(spark):
    a = spark.createDataFrame([(1, "aa bb aa")], ["doc_id", "text"])
    empty = spark.createDataFrame([], "doc_id long, text string")
    counts = vocab.build_vocab(a, max_size=100).select("token", "n_occurrences")
    merged = vocab.rank_vocab(vocab.merge_vocab_counts(counts, empty), 100)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, vocab.build_vocab(a, max_size=100).collect())
    )


def test_rank_uses_distributed_topk_not_global_window(spark):
    """ADVICE r5: the rank must not be a bare Window.orderBy over the
    full (Heaps-law-growing) count table. The physical plan must show
    TakeOrderedAndProject (per-partition bounded heaps + k-row merge)
    feeding the window, so the single-partition sort touches exactly
    max_size rows."""
    docs = spark.createDataFrame(
        [(i, f"w{i % 7} w{i % 11} common") for i in range(50)],
        ["doc_id", "text"],
    )
    plan = (
        vocab.build_vocab(docs, max_size=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


class TestPackTokens:
    def _pack(self, spark, rows, **kw):
        from hadoop_invertedindexer_spark.operators import vocab as V

        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        v = V.build_vocab(docs, max_size=3)
        return [
            (r.block_id, r.n_tokens, r.ids_str)
            for r in V.pack_tokens(docs, v, **kw).orderBy("block_id").collect()
        ]

    def test_hand_verified_blocks(self, spark):
        # vocab by (count desc, token asc): z=4 -> 1, a=3 -> 2, b=2 -> 3;
        # c/d/e OOV -> 0; streams: [2,3,0,0,0,-1] [-1] [2,2,3,-1] [1,1,1,1,-1]
        got = self._pack(
            spark,
            [(1, "a b c d e"), (2, ""), (3, "a a b"), (5, "z z z z")],
            block_size=4,
            bucket_size=2,
        )
        assert got == [
            (0, 4, "2,3,0,0"),
            (1, 4, "0,-1,-1,2"),
            (2, 4, "2,3,-1,1"),
            (3, 4, "1,1,1,-1"),
        ]

    def test_stream_length_and_block_shapes(self, spark):
        rows = [(i, " ".join(f"w{j % 7}" for j in range(i % 11))) for i in range(40)]
        got = self._pack(spark, rows, block_size=16, bucket_size=8)
        total = sum(n for _, n, _ in got)
        # every doc contributes tokens + 1 EOS
        expected = sum((i % 11) + 1 for i in range(40))
        assert total == expected
        # all blocks full except possibly the last, ids dense from 0
        assert [b for b, _, _ in got] == list(range(len(got)))
        assert all(n == 16 for _, n, _ in got[:-1])

    def test_partitioning_invariant(self, spark):
        from hadoop_invertedindexer_spark.operators import vocab as V

        rows = [(i, " ".join(f"t{j % 5}" for j in range((i * 7) % 13))) for i in range(30)]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        v = V.build_vocab(docs, max_size=4)
        a = sorted(
            (r.block_id, r.ids_str)
            for r in V.pack_tokens(docs, v, block_size=8, bucket_size=4).collect()
        )
        b = sorted(
            (r.block_id, r.ids_str)
            for r in V.pack_tokens(
                docs.repartition(13), v, block_size=8, bucket_size=1000
            ).collect()
        )
        assert a == b  # same blocks on any partitioning or bucket layout


class TestBpe:
    """Distributed BPE merge training + encode (r8)."""

    SENNRICH = (
        "low low low low low lower lower newest newest newest"
        " newest newest newest widest widest widest"
    )

    def test_sennrich_reference_merges(self, spark):
        # the worked example from Sennrich et al. 2016 / the HF docs:
        # es, est, lo, low come out first (freq desc, pair asc ties)
        docs = spark.createDataFrame([(1, self.SENNRICH)], ["doc_id", "text"])
        m = [
            (r.merge_rank, r.lhs, r.rhs, r.merged, r.freq)
            for r in vocab.bpe_train(docs, num_merges=4)
                .orderBy("merge_rank").collect()
        ]
        assert m == [
            (1, "e", "s", "es", 9),
            (2, "es", "t", "est", 9),
            (3, "l", "o", "lo", 7),
            (4, "lo", "w", "low", 7),
        ]

    def test_merge_application_is_greedy_left_to_right(self, spark):
        # 'aaaa' has pair (a,a) x3 overlapping; greedy non-overlapping
        # application yields 'aa aa', and the next merge is (aa, aa)
        docs = spark.createDataFrame(
            [(1, "aaaa aaaa aaaa")], ["doc_id", "text"]
        )
        m = {
            r.merge_rank: (r.lhs, r.rhs, r.freq)
            for r in vocab.bpe_train(docs, num_merges=2).collect()
        }
        assert m[1] == ("a", "a", 9)  # 3 words x 3 adjacent positions
        assert m[2] == ("aa", "aa", 3)

    def test_runs_out_of_pairs_stops_early(self, spark):
        docs = spark.createDataFrame([(1, "ab ab cd")], ["doc_id", "text"])
        m = vocab.bpe_train(docs, num_merges=10).collect()
        # merges: (a,b) then (c,d); afterwards every word is one symbol
        assert len(m) == 2

    def test_min_freq_threshold(self, spark):
        docs = spark.createDataFrame(
            [(1, "ab ab ab cd")], ["doc_id", "text"]
        )
        m = vocab.bpe_train(docs, num_merges=10, min_freq=2).collect()
        assert [(r.lhs, r.rhs) for r in m] == [("a", "b")]

    def test_encode_applies_merges_in_rank_order(self, spark):
        docs = spark.createDataFrame([(1, self.SENNRICH)], ["doc_id", "text"])
        m = vocab.bpe_train(docs, num_merges=6)
        r = vocab.bpe_encode(docs, m).collect()[0]
        assert r.pieces_str.split(" ")[:6] == ["low"] * 5 + ["low"]
        assert "ewest" in r.pieces_str  # e+w, ew+est learned at ranks 5-6

    def test_encode_never_merges_across_word_boundary(self, spark):
        # train on a corpus where (b, c) is the top pair; encoding 'ab ca'
        # must NOT merge the b|c across the word boundary
        lm = spark.createDataFrame([(1, "bc bc bc")], ["doc_id", "text"])
        m = vocab.bpe_train(lm, num_merges=1)
        r = vocab.bpe_encode(
            spark.createDataFrame([(9, "ab ca")], ["doc_id", "text"]), m
        ).collect()[0]
        assert r.pieces_str == "a b c a" and r.n_pieces == 4

    def test_merge_never_fires_across_symbol_boundaries(self, spark):
        # ADVICE r9 (high): with symbols 'xa'+'b' after merge (x,a), an
        # unanchored substring replace would let merge (a,b) fire inside
        # 'xa b' ('xa b' contains the substring 'a b') producing 'xab' —
        # a piece assembled by a merge that was never learned. The
        # boundary-aware application must leave the word as 'xa b'.
        # Corpus: 'xa' dominates so (x,a) is merge 1; 'ab' makes (a,b)
        # merge 2; the probe word 'xab' must end as pieces [xa, b].
        lm = spark.createDataFrame(
            [(1, "xa xa xa xa ab ab ab")], ["doc_id", "text"]
        )
        m = vocab.bpe_train(lm, num_merges=2)
        learned = [(r.lhs, r.rhs) for r in m.orderBy("merge_rank").collect()]
        assert learned == [("x", "a"), ("a", "b")]
        r = vocab.bpe_encode(
            spark.createDataFrame([(9, "xab")], ["doc_id", "text"]), m
        ).collect()[0]
        assert r.pieces_str == "xa b" and r.n_pieces == 2
        # same guarantee on the slow (pandas UDF) path
        r2 = vocab.bpe_encode(
            spark.createDataFrame([(9, "xab")], ["doc_id", "text"]),
            m,
            max_expr_merges=0,
        ).collect()[0]
        assert r2.pieces_str == "xa b" and r2.n_pieces == 2

    def test_training_pair_counts_see_symbol_boundaries(self, spark):
        # the training loop itself must not corrupt the dictionary: in
        # 'xab xab xab ab', after merge (x,a) the word 'xab' is 'xa b';
        # a boundary-blind replace of later merges would rewrite it to
        # 'xab' and the (xa,b) pair would vanish from the counts.
        docs = spark.createDataFrame(
            [(1, "xab xab xab xab ab ab ab")], ["doc_id", "text"]
        )
        m = [
            (r.lhs, r.rhs, r.freq)
            for r in vocab.bpe_train(docs, num_merges=3)
            .orderBy("merge_rank")
            .collect()
        ]
        # (x,a) x4 wins rank 1 (ties with (a,b) broken pair-asc? no:
        # (a,b) appears in xab x4 + ab x3 = 7 > 4, so (a,b) is rank 1,
        # then 'x ab' words leave (x,ab) x4, merged 'xab'
        assert m[0] == ("a", "b", 7)
        assert m[1] == ("x", "ab", 4)

    def test_encode_udf_path_matches_expression_path(self, spark):
        docs = spark.createDataFrame(
            [(i, self.SENNRICH) for i in range(4)], ["doc_id", "text"]
        )
        m = vocab.bpe_train(docs, num_merges=6)
        fast = {
            r.doc_id: (r.n_pieces, r.pieces_str)
            for r in vocab.bpe_encode(docs, m).collect()
        }
        slow = {
            r.doc_id: (r.n_pieces, r.pieces_str)
            for r in vocab.bpe_encode(docs, m, max_expr_merges=2).collect()
        }
        assert fast == slow


def test_pack_tokens_array_output_matches_str(spark, sf_dir):
    """output='array' (r8) returns the same blocks with ids as a real
    array<int> — the loader-facing shape — pinned elementwise to the
    oracled string mode."""
    d = read_table(spark, sf_dir, "documents")
    v = vocab.build_vocab(d, max_size=32)
    s = {
        r.block_id: (r.n_tokens, r.ids_str)
        for r in vocab.pack_tokens(d, v, block_size=128, bucket_size=64).collect()
    }
    a = {
        r.block_id: (r.n_tokens, r.ids)
        for r in vocab.pack_tokens(
            d, v, block_size=128, bucket_size=64, output="array"
        ).collect()
    }
    assert set(s) == set(a)
    for b, (n, ids_str) in s.items():
        an, ids = a[b]
        assert an == n and len(ids) == n
        assert [int(x) for x in ids_str.split(",")] == list(ids)


def test_pack_tokens_array_mode_parquet_roundtrip(spark, sf_dir, tmp_path):
    """The production artifact is an array<int> column in parquet: write
    the array-mode blocks through the parquet sink and read them back
    byte-equal (schema preserved as array<int>, no stringification)."""
    d = read_table(spark, sf_dir, "documents")
    v = vocab.build_vocab(d, max_size=32)
    blocks = vocab.pack_tokens(
        d, v, block_size=128, bucket_size=64, output="array"
    )
    out = str(tmp_path / "blocks")
    blocks.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert dict(back.dtypes)["ids"] == "array<int>"
    want = {r.block_id: (r.n_tokens, list(r.ids)) for r in blocks.collect()}
    got = {r.block_id: (r.n_tokens, list(r.ids)) for r in back.collect()}
    assert got == want


class TestBpeContinue:
    CORPUS = [(1, TestBpe.SENNRICH), (2, "lowest slower newest widest low")]

    def test_continue_equals_from_scratch(self, spark):
        """BPE state = (dictionary, merge list): warm-starting from the
        first 4 merges and learning 4 more must reproduce merges 5-8 of
        a from-scratch 8-merge run exactly (ranks, pairs, freqs)."""
        docs = spark.createDataFrame(self.CORPUS, ["doc_id", "text"])
        full = [
            tuple(r) for r in vocab.bpe_train(docs, num_merges=8)
            .orderBy("merge_rank").collect()
        ]
        head = vocab.bpe_train(docs, num_merges=4)
        cont = [
            tuple(r) for r in vocab.bpe_train_continue(docs, head, num_merges=4)
            .orderBy("merge_rank").collect()
        ]
        assert cont == full[4:]

    def test_continue_from_empty_table_is_plain_train(self, spark):
        docs = spark.createDataFrame(self.CORPUS, ["doc_id", "text"])
        empty = spark.createDataFrame(
            [], "merge_rank long, lhs string, rhs string, merged string, freq long"
        )
        a = [tuple(r) for r in vocab.bpe_train(docs, num_merges=3)
             .orderBy("merge_rank").collect()]
        b = [tuple(r) for r in vocab.bpe_train_continue(docs, empty, num_merges=3)
             .orderBy("merge_rank").collect()]
        assert a == b

    def test_continue_on_grown_corpus_keeps_prior_ranks_frozen(self, spark):
        base = spark.createDataFrame(self.CORPUS, ["doc_id", "text"])
        head = vocab.bpe_train(base, num_merges=3)
        grown = base.unionAll(
            spark.createDataFrame(
                [(9, "zz zz zz zz zz zz zz zz zz zz")], ["doc_id", "text"]
            )
        )
        new = vocab.bpe_train_continue(grown, head, num_merges=2).collect()
        ranks = sorted(r.merge_rank for r in new)
        assert ranks == [4, 5]  # continues the sequence, never rewrites
        assert any(r.lhs == "z" and r.rhs == "z" for r in new)  # sees new data


class TestBpeStoredModel:
    """Persisted BPE model artifact + O(batch) incremental encode
    (r10, VERDICT r9 ask 5 — the DSIR/classifier stored-model pattern
    for the tokenizer)."""

    CORPUS = [(1, TestBpe.SENNRICH), (2, "lowest slower newest widest low")]

    def test_incremental_encode_equals_direct(self, spark, tmp_path):
        docs = spark.createDataFrame(self.CORPUS, ["doc_id", "text"])
        path = str(tmp_path / "bpem")
        vocab.build_bpe_model(docs, path, num_merges=8)
        inc = {
            r.doc_id: (r.n_pieces, r.pieces_str)
            for r in vocab.bpe_encode_incremental(spark, docs, path).collect()
        }
        direct = {
            r.doc_id: (r.n_pieces, r.pieces_str)
            for r in vocab.bpe_encode(
                docs, vocab.bpe_train(docs, num_merges=8)
            ).collect()
        }
        assert inc == direct

    def test_params_persisted(self, spark, tmp_path):
        docs = spark.createDataFrame(self.CORPUS, ["doc_id", "text"])
        path = str(tmp_path / "bpem")
        vocab.build_bpe_model(docs, path, num_merges=6, min_freq=2)
        p = spark.read.parquet(f"{path}/params").head()
        assert (p.num_merges, p.min_freq) == (6, 2)
        m = spark.read.parquet(f"{path}/merges")
        assert m.count() <= 6
        assert min(r.freq for r in m.collect()) >= 2

    def test_extend_equals_longer_train(self, spark, tmp_path):
        """extend(build(k), m) must hold the full-model property the
        continue path pins: stored merges == train(k+m) exactly (same
        corpus), with prior ranks frozen."""
        docs = spark.createDataFrame(self.CORPUS, ["doc_id", "text"])
        path = str(tmp_path / "bpem")
        vocab.build_bpe_model(docs, path, num_merges=4)
        vocab.extend_bpe_model(docs, path, num_merges=4)
        stored = sorted(
            tuple(r) for r in spark.read.parquet(f"{path}/merges").collect()
        )
        full = sorted(
            tuple(r) for r in vocab.bpe_train(docs, num_merges=8).collect()
        )
        assert stored == full
        # and the encode against the extended artifact matches direct
        inc = sorted(
            map(tuple, vocab.bpe_encode_incremental(spark, docs, path).collect())
        )
        direct = sorted(
            map(
                tuple,
                vocab.bpe_encode(
                    docs, vocab.bpe_train(docs, num_merges=8)
                ).collect(),
            )
        )
        assert inc == direct

    def test_maintain_triggers_extension_and_reports(self, spark, tmp_path):
        """r12: fertility over threshold → extend in place; the report
        carries the PRE-extension probe plus both merge counts, the
        stored model equals the longer from-scratch chain, and a
        re-probe measures lower fertility."""
        docs = spark.createDataFrame(self.CORPUS, ["doc_id", "text"])
        path = str(tmp_path / "bpem")
        vocab.build_bpe_model(docs, path, num_merges=4)
        before = vocab.bpe_fertility(
            docs.withColumn("g", F.lit("all")),
            spark.read.parquet(f"{path}/merges"),
            group_col="g",
        ).head().fertility_mils
        r = vocab.maintain_bpe_model(
            docs, path, max_fertility_mils=int(before) - 1, extra_merges=4
        ).head()
        assert r.extended is True and r.fertility_mils == before
        assert (r.merges_before, r.merges_after) == (4, 8)
        stored = sorted(
            tuple(x) for x in spark.read.parquet(f"{path}/merges").collect()
        )
        assert stored == sorted(
            tuple(x) for x in vocab.bpe_train(docs, num_merges=8).collect()
        )
        after = vocab.bpe_fertility(
            docs.withColumn("g", F.lit("all")),
            spark.read.parquet(f"{path}/merges"),
            group_col="g",
        ).head().fertility_mils
        assert after < before  # more merges, fewer pieces per word

    def test_maintain_skips_below_threshold_and_on_empty_probe(
        self, spark, tmp_path
    ):
        docs = spark.createDataFrame(self.CORPUS, ["doc_id", "text"])
        path = str(tmp_path / "bpem")
        vocab.build_bpe_model(docs, path, num_merges=4)
        r = vocab.maintain_bpe_model(
            docs, path, max_fertility_mils=10**6
        ).head()
        assert r.extended is False
        assert (r.merges_before, r.merges_after) == (4, 4)
        # empty probe: NULL fertility is never evidence to train on
        empty = spark.createDataFrame([], "doc_id long, text string")
        r = vocab.maintain_bpe_model(
            empty, path, max_fertility_mils=0
        ).head()
        assert r.extended is False and r.fertility_mils is None
        assert spark.read.parquet(f"{path}/merges").count() == 4

    def test_batch_encode_never_reads_train_corpus(self, spark, tmp_path):
        """The O(batch) claim in plan terms: the incremental encode's
        plan scans only the batch frame — a one-row batch compiles to a
        one-row scan plus the collected model, no other table."""
        docs = spark.createDataFrame(self.CORPUS, ["doc_id", "text"])
        path = str(tmp_path / "bpem")
        vocab.build_bpe_model(docs, path, num_merges=4)
        batch = spark.createDataFrame([(99, "low lower")], ["doc_id", "text"])
        enc = vocab.bpe_encode_incremental(spark, batch, path)
        plan = enc._jdf.queryExecution().executedPlan().toString()
        # the merge table was collected driver-side into literals: the
        # executed plan contains NO scan of the merges parquet
        assert "bpem" not in plan
        assert enc.count() == 1


def test_pack_tokens_consumes_bpe_pieces(spark):
    """The packer accepts the subword vocab (VERDICT r7 ask 3's final
    clause): bpe_encode's piece stream IS a pack_tokens input —
    pieces_str whitespace-tokenizes like any text, the vocab is built
    over pieces, and the packed stream conserves Σ pieces + one
    separator per doc with zero OOV."""
    docs = spark.createDataFrame(
        [(1, "low low lower"), (2, "newest lower low wider")],
        ["doc_id", "text"],
    )
    merges = vocab.bpe_train(docs, num_merges=6)
    enc = vocab.bpe_encode(docs, merges)
    pv = vocab.build_vocab(enc, text_col="pieces_str", max_size=256)
    blocks = vocab.pack_tokens(
        enc, pv, block_size=16, text_col="pieces_str"
    ).collect()
    n_pieces = {r.doc_id: r.n_pieces for r in enc.collect()}
    assert sum(b.n_tokens for b in blocks) == sum(n_pieces.values()) + len(
        n_pieces
    )
    ids = [int(i) for b in blocks for i in b.ids_str.split(",")]
    assert all(i != 0 for i in ids)  # every piece resolves; -1 = separator
    assert ids.count(-1) == len(n_pieces)


class TestBpeFertility:
    def test_zero_merges_is_character_level(self, spark):
        # with an empty merge table every word stays characters:
        # pieces == chars -> pieces_per_kchar == 1000 exactly
        docs = spark.createDataFrame(
            [(0, "abc de", "en"), (1, "fgh", "de")],
            ["doc_id", "text", "lang"],
        )
        empty = spark.createDataFrame(
            [], "merge_rank long, lhs string, rhs string, "
            "merged string, freq long"
        )
        rows = {
            r.lang: r for r in vocab.bpe_fertility(docs, empty).collect()
        }
        en, de = rows["en"], rows["de"]
        assert (en.n_docs, en.n_words, en.n_chars, en.n_pieces) == (
            1, 2, 5, 5,
        )
        assert en.pieces_per_kchar == 1000
        assert en.fertility_mils == 2500  # 5 pieces / 2 words
        assert (de.n_words, de.n_pieces, de.fertility_mils) == (1, 3, 3000)

    def test_merges_lower_fertility(self, spark):
        docs = spark.createDataFrame(
            [(i, "abab abab abab", "en") for i in range(4)],
            ["doc_id", "text", "lang"],
        )
        trained = vocab.bpe_train(docs, num_merges=3)
        empty = spark.createDataFrame(
            [], "merge_rank long, lhs string, rhs string, "
            "merged string, freq long"
        )
        base = vocab.bpe_fertility(docs, empty).first()
        merged = vocab.bpe_fertility(docs, trained).first()
        assert base.fertility_mils == 4000  # character level, 4 chars/word
        # 3 merges on a single repeated word collapse it entirely
        assert merged.fertility_mils == 1000
        assert merged.n_words == base.n_words  # masses are model-free
        assert merged.n_chars == base.n_chars

    def test_encode_carry_cols_passthrough(self, spark):
        docs = spark.createDataFrame(
            [(0, "ab", "en", 7)], ["doc_id", "text", "lang", "extra"]
        )
        empty = spark.createDataFrame(
            [], "merge_rank long, lhs string, rhs string, "
            "merged string, freq long"
        )
        r = vocab.bpe_encode(
            docs, empty, carry_cols=("lang", "extra")
        ).first()
        assert (r.lang, r.extra, r.n_pieces, r.pieces_str) == (
            "en", 7, 2, "a b",
        )


class TestVocabCoverage:
    def test_hand_computed_per_stratum(self, spark):
        docs = spark.createDataFrame(
            [
                (0, "aa aa bb", "en"),   # aa,bb in vocab
                (1, "aa cc dd", "de"),   # cc,dd OOV
            ],
            ["doc_id", "text", "lang"],
        )
        v = spark.createDataFrame(
            [("aa", 1, 3), ("bb", 2, 1)],
            ["token", "token_id", "n_occurrences"],
        )
        got = {
            r.lang: r for r in vocab.vocab_coverage(docs, v).collect()
        }
        en = got["en"]
        assert (en.n_tokens, en.n_oov, en.coverage_mils) == (3, 0, 1000)
        de = got["de"]
        assert (de.n_tokens, de.n_oov, de.oov_mils) == (3, 2, 666)
        assert de.coverage_mils == 333

    def test_full_vocab_is_total_coverage(self, spark):
        docs = spark.createDataFrame(
            [(0, "xx yy zz", "en")], ["doc_id", "text", "lang"]
        )
        v = vocab.build_vocab(docs, max_size=10)
        r = vocab.vocab_coverage(docs, v).first()
        assert (r.n_oov, r.coverage_mils) == (0, 1000)

    def test_duplicate_vocab_rows_do_not_fan_out(self, spark):
        # ADVICE r10: a non-distinct vocab frame fanned out the
        # broadcast join and inflated n_tokens
        docs = spark.createDataFrame(
            [(0, "aa aa bb", "en")], ["doc_id", "text", "lang"]
        )
        v = spark.createDataFrame(
            [("aa", 1, 3), ("aa", 1, 3), ("aa", 2, 3), ("bb", 3, 1)],
            ["token", "token_id", "n_occurrences"],
        )
        r = vocab.vocab_coverage(docs, v).first()
        assert (r.n_tokens, r.n_oov, r.coverage_mils) == (3, 0, 1000)
