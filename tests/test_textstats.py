"""Planted-fixture tests for the PII-redaction and repetition-removal
functions (the contract oracle checks them over the corpus; these pin
the edge cases the word-soup corpus can't reach)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_invertedindexer_spark.functions import textstats as ts


def _one(spark, text: str, col):
    return spark.createDataFrame([(text,)], "t: string").select(
        col.alias("out")
    ).first()["out"]


def _redact(spark, text: str) -> str:
    return _one(spark, text, ts.redact_pii(F.col("t")))


class TestRedactPii:
    def test_email(self, spark):
        assert (
            _redact(spark, "mail a.b+c_d%e@sub.example.co.uk now")
            == "mail <EMAIL> now"
        )

    def test_ipv4(self, spark):
        assert _redact(spark, "host 192.168.0.1 up") == "host <IP> up"

    def test_phone_variants(self, spark):
        assert _redact(spark, "call +1 (555) 010-42") == "call <PHONE>"
        assert _redact(spark, "call 555-010-4242 now") == "call <PHONE> now"

    def test_email_wins_over_ip_and_phone(self, spark):
        # the address contains dotted digits an IP/phone pattern could
        # clip; email must redact first, atomically
        assert _redact(spark, "x 10.0.0.1@example.com y") == "x <EMAIL> y"

    def test_ip_wins_over_phone(self, spark):
        assert _redact(spark, "ip 10.20.30.40 end") == "ip <IP> end"

    def test_clean_text_unchanged(self, spark):
        clean = "no pii here, just words and 42 numbers"
        assert _redact(spark, clean) == clean

    def test_short_digit_runs_kept(self, spark):
        # 6 digits total — below the phone pattern's minimum length
        assert _redact(spark, "year 2024 id 12345") == "year 2024 id 12345"

    def test_counts(self, spark):
        text = "a@b.io and c@d.io from 1.2.3.4"
        n = _one(spark, text, ts.count_pii(F.col("t"), ts.EMAIL_REGEX))
        assert n == 2
        n = _one(spark, text, ts.count_pii(F.col("t"), ts.IPV4_REGEX))
        assert n == 1


class TestDedupRepeatedTokens:
    def test_first_occurrence_order_kept(self, spark):
        assert (
            _one(spark, "b a b c a d", ts.dedup_repeated_tokens(F.col("t")))
            == "b a c d"
        )

    def test_no_dups_is_identity(self, spark):
        assert (
            _one(spark, "x y z", ts.dedup_repeated_tokens(F.col("t"))) == "x y z"
        )

    def test_single_token(self, spark):
        assert _one(spark, "solo", ts.dedup_repeated_tokens(F.col("t"))) == "solo"


class TestRepetitionSignals:
    def _signals(self, spark, rows):
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        return {
            r.doc_id: r for r in ts.repetition_signals(df).collect()
        }

    def test_hand_computed_fractions(self, spark):
        out = self._signals(
            spark,
            [
                # lines: "a b" x2 + "c d" -> dup line frac 2/3, chars 6/9;
                # 2-grams of "a b c d a b": "a b" twice (cov 6 of 11 chars);
                # no 5-gram repeats
                (1, "a b\nc d\na b"),
                # single line, no repetition anywhere; the lone 2-gram
                # "x y" covers the whole normalized text
                (2, "x y"),
            ],
        )
        r1 = out[1]
        assert r1.dup_line_frac == round(2 / 3, 6)
        assert r1.dup_line_char_frac == round(6 / 9, 6)
        assert r1.top_ngram_char_frac == round(6 / 11, 6)
        assert r1.dup_ngram_char_frac == 0.0
        r2 = out[2]
        assert r2.dup_line_frac == 0.0
        assert r2.dup_line_char_frac == 0.0
        assert r2.top_ngram_char_frac == 1.0
        assert r2.dup_ngram_char_frac == 0.0

    def test_top_ngram_frac_capped_at_one_on_self_overlap(self, spark):
        # ADVICE r7: 'a a a a' has bigram 'a a' count 3 (overlapping
        # occurrences), product form 3*3=9 over 7 chars > 1 -> capped
        out = self._signals(spark, [(9, "a a a a")])
        assert out[9].top_ngram_char_frac == 1.0

    def test_heavy_ngram_repetition_detected(self, spark):
        # the classic boilerplate failure mode: one 5-gram repeated
        # end-to-end -> dup 5-gram char fraction near 1
        text = " ".join(["one two three four five"] * 8)
        out = self._signals(spark, [(7, text)])
        assert out[7].dup_ngram_char_frac > 0.9
        assert out[7].dup_line_frac == 0.0  # single line

    def test_blank_and_whitespace_lines_ignored(self, spark):
        out = self._signals(spark, [(3, "same\n\n  \nsame\nother")])
        assert out[3].dup_line_frac == round(2 / 3, 6)

    def test_every_doc_gets_a_row(self, spark):
        out = self._signals(spark, [(1, "plain text here"), (2, "x")])
        assert set(out) == {1, 2}
        assert out[2].dup_ngram_char_frac == 0.0


class TestCorpusFilter:
    STOPS = ["the", "and", "of"]

    def _verdicts(self, spark, rows, **kw):
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = ts.corpus_filter(df, self.STOPS, **kw)
        return {r.doc_id: (r.is_kept, r.drop_reason) for r in out.collect()}

    def test_each_rule_fires_and_attributes_first(self, spark):
        good = (
            "the quick brown fox jumps over the lazy dog and runs far "
            "of the hills and the valleys with steady easy strides here "
            "the end of the story and the moral of it all is patience"
        )
        out = self._verdicts(
            spark,
            [
                (1, good),                          # kept
                (2, "the tiny and short of text"),  # < 25 tokens
                (3, " ".join(["der und die ist mit roman"] * 8)),  # German markers
                (4, good + "\nrepeat me\nrepeat me\nrepeat me\nx y z w v u t s"),
            ],
            min_quality=0.0,  # isolate the other rules
        )
        assert out[1] == (True, None)
        assert out[2] == (False, "too_short")
        assert out[3][1] in ("wrong_lang", "repetitive_ngrams")  # first = wrong_lang
        assert out[3] == (False, "wrong_lang")
        assert out[4] == (False, "repetitive_lines")

    def test_lang_none_disables_language_rule(self, spark):
        # German marker words spread through otherwise-unique text so no
        # 5-gram (or line) repeats — only the language rule could fire
        text = " ".join(
            "der w%da und w%db die w%dc ist w%dd mit w%de" % (i, i, i, i, i)
            for i in range(5)
        )
        strict = self._verdicts(spark, [(1, text)], min_quality=0.0)
        assert strict[1] == (False, "wrong_lang")
        out = self._verdicts(spark, [(1, text)], min_quality=0.0, lang=None)
        assert out[1] == (True, None)

    def test_keep_set_invariant_under_reason_order(self, spark):
        # the CASE chain only attributes; a doc failing ANY rule is
        # dropped regardless of which reason is reported
        text = "short and repetitive " * 2
        out = self._verdicts(spark, [(9, text)], min_quality=0.9)
        assert out[9][0] is False


class TestUnigramNll:
    def test_hand_computed_self_scored(self, spark):
        import math

        docs = spark.createDataFrame([(1, "a a b")], ["doc_id", "text"])
        r = ts.unigram_nll(docs).collect()[0]
        # counts a=2,b=1; N=3,V=2 -> p(a)=3/6, p(b)=2/6
        want = (2 * -math.log(0.5) + -math.log(2 / 6)) / 3
        assert r.n_tokens == 3
        assert r.avg_nll == round(want, 6)

    def test_oov_scores_against_reference_lm(self, spark):
        import math

        lm = spark.createDataFrame([(0, "a a b")], ["doc_id", "text"])
        docs = spark.createDataFrame([(7, "z")], ["doc_id", "text"])
        r = ts.unigram_nll(docs, lm_docs=lm).collect()[0]
        assert r.avg_nll == round(-math.log(1 / 6), 6)  # c=0 Laplace

    def test_rare_tokens_score_higher(self, spark):
        rows = [(i, "common words everywhere in this corpus body") for i in range(20)]
        rows += [(100, "common words everywhere"), (101, "xylophone quixotic zephyr")]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r.doc_id: r.avg_nll for r in ts.unigram_nll(docs).collect()}
        assert out[101] > out[100]


class TestNgramNll:
    def _hand(self, corpus, scored=None, lambdas=(0.2, 0.3, 0.5)):
        import math
        from collections import Counter

        l1, l2, l3 = lambdas
        uni = Counter(t for d in corpus for t in d)
        big = Counter(
            (d[i - 1], d[i]) for d in corpus for i in range(1, len(d))
        )
        tri = Counter(
            (d[i - 2], d[i - 1], d[i])
            for d in corpus
            for i in range(2, len(d))
        )
        N, V = sum(uni.values()), len(uni)
        bctx, tctx = Counter(), Counter()
        for (a, _), c in big.items():
            bctx[a] += c
        for (a, b, _), c in tri.items():
            tctx[(a, b)] += c

        def p(cur, p1, p2):
            x3 = (
                tri[(p2, p1, cur)] / tctx[(p2, p1)]
                if p2 and (p2, p1, cur) in tri
                else 0.0
            )
            x2 = (
                big[(p1, cur)] / bctx[p1]
                if p1 and (p1, cur) in big
                else 0.0
            )
            x1 = (uni.get(cur, 0) + 1.0) / (N + V + 1.0)
            return l3 * x3 + l2 * x2 + l1 * x1

        out = {}
        for di, d in enumerate(scored if scored is not None else corpus):
            nlls = [
                -math.log(
                    p(
                        t,
                        d[i - 1] if i >= 1 else None,
                        d[i - 2] if i >= 2 else None,
                    )
                )
                for i, t in enumerate(d)
            ]
            out[di] = round(sum(nlls) / len(nlls), 6)
        return out

    def test_hand_computed_interpolated(self, spark):
        texts = [
            "the cat sat on the mat",
            "the cat sat on the hat",
            "dog runs fast",
        ]
        docs = spark.createDataFrame(
            list(enumerate(texts)), ["doc_id", "text"]
        )
        got = {
            r.doc_id: (r.n_tokens, r.avg_nll)
            for r in ts.ngram_nll(docs).collect()
        }
        want = self._hand([t.split() for t in texts])
        for i, t in enumerate(texts):
            assert got[i] == (len(t.split()), want[i])

    def test_seen_trigrams_beat_unigram_floor(self, spark):
        # a doc whose trigrams all appear in the LM corpus must score
        # strictly better than unigram_nll gives it — the higher orders
        # only ADD probability mass on top of the (scaled) unigram term
        lm = spark.createDataFrame(
            [(i, "alpha beta gamma delta epsilon zeta") for i in range(5)],
            ["doc_id", "text"],
        )
        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
        )
        inter = ts.ngram_nll(docs, lm_docs=lm).collect()[0].avg_nll
        unigram_only = ts.ngram_nll(
            docs, lm_docs=lm, lambdas=(1.0, 0.0, 0.0)
        ).collect()[0].avg_nll
        assert inter < unigram_only

    def test_oov_context_falls_back_finite(self, spark):
        lm = spark.createDataFrame(
            [(0, "alpha beta gamma delta")], ["doc_id", "text"]
        )
        docs = spark.createDataFrame(
            [(9, "zulu yankee xray")], ["doc_id", "text"]
        )
        r = ts.ngram_nll(docs, lm_docs=lm).collect()[0]
        assert r.n_tokens == 3 and r.avg_nll > 0  # finite, no -inf/NaN

    def test_cap_drops_rare_grams(self, spark):
        # with max_ngrams=1 only the single most frequent bigram/trigram
        # survives; every other gram contributes 0 at its order
        texts = ["a b a b a b c d", "c d e"]
        docs = spark.createDataFrame(
            list(enumerate(texts)), ["doc_id", "text"]
        )
        full = {
            r.doc_id: r.avg_nll for r in ts.ngram_nll(docs).collect()
        }
        capped = {
            r.doc_id: r.avg_nll
            for r in ts.ngram_nll(docs, max_ngrams=1).collect()
        }
        assert capped[1] >= full[1]  # doc 1's grams fell out of the cap


class TestClassifierScore:
    def test_hand_computed_sigmoid(self, spark):
        import hashlib
        import math

        def h60(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

        def w(f):
            return ((h60(f"w|{f}") % 2001) - 1000) / 1000.0

        texts = {1: "hello world", 2: "foo bar baz"}
        docs = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
        got = {
            r.doc_id: (r.n_tokens, r.score)
            for r in ts.classifier_score(docs, n_features=64).collect()
        }
        for did, txt in texts.items():
            toks = txt.split()
            m = sum(w(h60(t) % 64) for t in toks) / len(toks)
            assert got[did] == (len(toks), round(1 / (1 + math.exp(-m)), 6))

    def test_custom_weights_and_bias(self, spark):
        import math

        docs = spark.createDataFrame([(1, "aa aa bb")], ["doc_id", "text"])
        # weight every feature 0 -> score = sigmoid(bias)
        w0 = ts.synthetic_classifier_weights(spark, 16).select(
            "feature", (F.col("weight") * 0).alias("weight")
        )
        r = ts.classifier_score(docs, weights=w0, n_features=16, bias=2.0)
        assert r.collect()[0].score == round(1 / (1 + math.exp(-2.0)), 6)

    def test_score_bounds_and_determinism(self, spark, sf_dir):
        from hadoop_invertedindexer_spark.sources.tables import read_table

        d = read_table(spark, sf_dir, "documents")
        a = sorted(
            (r.doc_id, r.score)
            for r in ts.classifier_score(d, n_features=128).collect()
        )
        b = sorted(
            (r.doc_id, r.score)
            for r in ts.classifier_score(
                d.repartition(7), n_features=128
            ).collect()
        )
        assert a == b
        assert all(0.0 < s < 1.0 for _, s in a)


def _perceptron_model(labeled, n_iters, n_features):
    """Pure-Python mirror of the batch perceptron: labeled =
    [(tokens, y)], returns {feature: weight} (zeros kept)."""
    import hashlib

    def feat(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % n_features

    fvecs = []
    for toks, y in labeled:
        v = {}
        for t in toks:
            v[feat(t)] = v.get(feat(t), 0) + 1
        if v:
            fvecs.append((v, y))
    w = {}
    for _ in range(n_iters):
        mis = [
            (v, y)
            for v, y in fvecs
            if y * sum(c * w.get(f, 0) for f, c in v.items()) <= 0
        ]
        if not mis:
            break
        for v, y in mis:
            for f, c in v.items():
                w[f] = w.get(f, 0) + y * c
    return w


class TestClassifierTrain:
    def test_matches_python_mirror(self, spark):
        labeled = [
            (["good", "good", "nice"], 1),
            (["bad"], -1),
            (["meh", "bad", "bad"], -1),
        ]
        docs = spark.createDataFrame(
            [(i, " ".join(t), y) for i, (t, y) in enumerate(labeled)],
            ["doc_id", "text", "y"],
        )
        got = {
            r.feature: r.weight
            for r in ts.classifier_train(
                docs, n_iters=6, n_features=64
            ).collect()
        }
        want = {
            f: c
            for f, c in _perceptron_model(labeled, 6, 64).items()
            if c != 0
        }
        assert got == want

    def test_trained_weights_separate(self, spark):
        # shared noise vocabulary + a class marker: after training, the
        # inference half must rank every positive above every negative
        rows = [
            (i, f"the common filler text number {i % 3} "
                + ("goodsignal" if i % 2 == 0 else "badsignal"),
             1 if i % 2 == 0 else -1)
            for i in range(10)
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text", "y"])
        w = ts.classifier_train(docs, n_iters=10, n_features=256)
        scored = {
            r.doc_id: r.score
            for r in ts.classifier_score(
                docs, weights=w, n_features=256
            ).collect()
        }
        pos = [scored[i] for i in range(10) if i % 2 == 0]
        neg = [scored[i] for i in range(10) if i % 2 == 1]
        assert min(pos) > max(neg)

    def test_early_stop_idempotent_after_separation(self, spark):
        docs = spark.createDataFrame(
            [(1, "alpha", 1), (2, "omega", -1)], ["doc_id", "text", "y"]
        )
        short = sorted(
            (r.feature, r.weight)
            for r in ts.classifier_train(
                docs, n_iters=3, n_features=32
            ).collect()
        )
        long = sorted(
            (r.feature, r.weight)
            for r in ts.classifier_train(
                docs, n_iters=12, n_features=32
            ).collect()
        )
        assert short == long  # separated -> extra iterations are no-ops

    def test_predict_matches_python_decision(self, spark):
        import hashlib

        labeled = [
            (["good", "good", "nice"], 1),
            (["bad"], -1),
            (["meh", "bad", "bad"], -1),
        ]
        docs = spark.createDataFrame(
            [(i, " ".join(t), y) for i, (t, y) in enumerate(labeled)],
            ["doc_id", "text", "y"],
        )
        w = ts.classifier_train(docs, n_iters=6, n_features=64)
        model = _perceptron_model(labeled, 6, 64)

        def feat(t):
            return int(
                hashlib.md5(t.encode()).hexdigest()[:15], 16
            ) % 64

        got = {
            r.doc_id: (r.n_tokens, r.margin, r.pred)
            for r in ts.classifier_predict(
                docs, w, n_features=64
            ).collect()
        }
        for i, (toks, _) in enumerate(labeled):
            m = sum(model.get(feat(t), 0) for t in toks)
            assert got[i] == (len(toks), m, 1 if m > 0 else -1)

    def test_bigram_predict_matches_python_mirror(self, spark):
        """wordNgrams=2 (r10): grams = tokens + adjacent bigrams, each
        hashed exactly like a token whose text is 'a b' — n_tokens
        counts grams (2T−1), the margin sums weights over all of them.
        Mirrored token-by-token in Python against a hand weight table."""
        import hashlib

        def feat(g):
            return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % 64

        toks = ["red", "green", "blue"]
        grams = toks + ["red green", "green blue"]
        weights = {feat(g): i + 1 for i, g in enumerate(grams)}
        wdf = spark.createDataFrame(
            sorted(weights.items()), "feature int, weight long"
        )
        docs = spark.createDataFrame(
            [(1, " ".join(toks))], ["doc_id", "text"]
        )
        r = ts.classifier_predict(
            docs, wdf, n_features=64, word_ngrams=2
        ).collect()[0]
        want_margin = sum(weights[feat(g)] for g in grams)
        assert (r.n_tokens, r.margin) == (len(grams), want_margin)
        # unigram call over the same weights must NOT see the bigrams
        r1 = ts.classifier_predict(docs, wdf, n_features=64).collect()[0]
        assert r1.n_tokens == 3
        assert r1.margin == sum(weights[feat(t)] for t in toks)

    def test_bigram_training_orders_words(self, spark):
        """The signal bigrams exist for: two classes with IDENTICAL
        bags of words, differing only in word order — a unigram model
        cannot separate them (margins are equal by construction), the
        bigram model must."""
        rows = [
            (i, "sun rises early today" if i % 2 == 0
             else "early today sun rises", 1 if i % 2 == 0 else -1)
            for i in range(8)
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text", "y"])
        w1 = ts.classifier_train(docs, n_iters=8, n_features=256)
        p1 = ts.classifier_predict(docs, w1, n_features=256).collect()
        # identical bags -> identical margins -> one side misclassified
        assert len({r.margin for r in p1}) == 1
        w2 = ts.classifier_train(
            docs, n_iters=8, n_features=256, word_ngrams=2
        )
        p2 = {
            r.doc_id: r.pred
            for r in ts.classifier_predict(
                docs, w2, n_features=256, word_ngrams=2
            ).collect()
        }
        assert all(
            p2[i] == (1 if i % 2 == 0 else -1) for i in range(8)
        )

    def test_single_token_doc_has_no_bigrams(self, spark):
        docs = spark.createDataFrame([(1, "solo")], ["doc_id", "text"])
        w = spark.createDataFrame([], "feature int, weight long")
        r = ts.classifier_predict(
            docs, w, n_features=16, word_ngrams=2
        ).collect()[0]
        assert r.n_tokens == 1  # 2*1 - 1

    def test_word_ngrams_3_rejected(self, spark):
        import pytest

        docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
        with pytest.raises(ValueError, match="word_ngrams=3"):
            ts.classifier_score(docs, n_features=16, word_ngrams=3)

    def test_warm_start_equals_from_scratch(self, spark):
        rows = [
            (i, f"tok{i % 5} tok{i % 7} "
                + ("ham" if i % 2 == 0 else "spam"),
             1 if i % 2 == 0 else -1)
            for i in range(12)
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text", "y"])
        w2 = ts.classifier_train(docs, n_iters=2, n_features=128)
        cont = sorted(
            map(tuple, ts.classifier_train(
                docs, n_iters=3, n_features=128, init_weights=w2
            ).collect())
        )
        scratch = sorted(
            map(tuple, ts.classifier_train(
                docs, n_iters=5, n_features=128
            ).collect())
        )
        assert cont == scratch  # weight table is the loop's whole state

    def test_predict_zero_margin_is_negative(self, spark):
        docs = spark.createDataFrame([(1, "tok tok")], ["doc_id", "text"])
        w = spark.createDataFrame([], "feature int, weight long")
        r = ts.classifier_predict(docs, w, n_features=16).collect()[0]
        assert (r.margin, r.pred) == (0, -1)

    def test_partitioning_invariance_and_empty_docs(self, spark):
        rows = [
            (i, f"tok{i % 5} tok{i % 7} "
                + ("ham" if i % 2 == 0 else "spam"),
             1 if i % 2 == 0 else -1)
            for i in range(12)
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text", "y"])
        base = sorted(
            (r.feature, r.weight)
            for r in ts.classifier_train(
                docs, n_iters=4, n_features=128
            ).collect()
        )
        repart = sorted(
            (r.feature, r.weight)
            for r in ts.classifier_train(
                docs.repartition(9), n_iters=4, n_features=128
            ).collect()
        )
        assert base == repart
        # zero-token docs carry no features and must not perturb training
        noisy = docs.union(
            spark.createDataFrame(
                [(100, "", 1), (101, "...!!!", -1)],
                ["doc_id", "text", "y"],
            )
        )
        with_empty = sorted(
            (r.feature, r.weight)
            for r in ts.classifier_train(
                noisy, n_iters=4, n_features=128
            ).collect()
        )
        assert with_empty == base


class TestClassifierAuc:
    def _auc(self, spark, rows):
        df = spark.createDataFrame(rows, ["doc_id", "margin", "y"])
        return ts.classifier_auc(df).first()

    def test_perfect_separation(self, spark):
        # every positive outranks every negative -> AUC 1.0, acc 1.0
        r = self._auc(
            spark, [(0, 3, 1), (1, 2, 1), (2, -1, -1), (3, -4, -1)]
        )
        assert (r.n_pos, r.n_neg, r.n_docs, r.n_correct) == (2, 2, 4, 4)
        assert r.auc_mils == 1000
        assert r.accuracy_mils == 1000

    def test_inverted_ranking(self, spark):
        r = self._auc(spark, [(0, -3, 1), (1, 5, -1)])
        assert r.auc_mils == 0
        assert r.accuracy_mils == 0

    def test_ties_count_half(self, spark):
        # one positive and one negative at the same margin: U = 0.5,
        # AUC = 0.5; margin 1 > 0 predicts +1 for both -> acc 1/2
        r = self._auc(spark, [(0, 1, 1), (1, 1, -1)])
        assert r.auc_mils == 500
        assert r.accuracy_mils == 500

    def test_textbook_mixed_case(self, spark):
        # margins pos {4, 1}, neg {3, 0}: pairs won = (4>3)+(4>0)
        # +(1>0) = 3 of 4 -> AUC 0.75; decision margin>0 gets
        # pos 4,1 right and neg 3 wrong, neg 0 right -> acc 3/4
        r = self._auc(
            spark, [(0, 4, 1), (1, 1, 1), (2, 3, -1), (3, 0, -1)]
        )
        assert r.auc_mils == 750
        assert r.accuracy_mils == 750

    def test_degenerate_single_class_is_null(self, spark):
        r = self._auc(spark, [(0, 2, 1), (1, 1, 1)])
        assert r.auc_mils is None
        assert r.accuracy_mils == 1000

    def test_zero_margin_predicts_negative(self, spark):
        # classifier_predict's convention: margin 0 -> -1
        r = self._auc(spark, [(0, 0, -1), (1, 1, 1)])
        assert r.n_correct == 2
        assert r.auc_mils == 1000


class TestClassifierCalibration:
    def _cal(self, spark, rows, **kw):
        df = spark.createDataFrame(rows, ["doc_id", "margin", "y"])
        return {
            r.bin: r for r in ts.classifier_calibration(df, **kw).collect()
        }

    def test_well_calibrated_model_has_zero_gap(self, spark):
        # margin -50 -> p=250 planted at 1/4 positive; +50 -> p=750 at
        # 3/4: the linear map matches the empirical rates exactly
        rows = [(i, -50, 1 if i == 0 else -1) for i in range(4)] + [
            (10 + i, 50, 1 if i > 0 else -1) for i in range(4)
        ]
        got = self._cal(spark, rows, n_bins=2, scale=100)
        lo, hi = got[0], got[1]
        assert (lo.n_docs, lo.n_pos, lo.pos_rate_mils) == (4, 1, 250)
        assert (lo.mean_p_mils, lo.gap_mils) == (250, 0)
        assert lo.mean_margin_mils == -50000
        assert (lo.se_sum, lo.brier_micros) == (750000, 187500)
        assert (hi.pos_rate_mils, hi.mean_p_mils, hi.gap_mils) == (
            750, 750, 0,
        )

    def test_planted_overconfident_model_shows_the_miscalibration(
        self, spark
    ):
        # saturated margins (+-1000 at scale=100) map to p=1000/0 while
        # the empirical rates are 700/300: the reliability report must
        # surface gap_mils=300 and brier_micros=300000 in BOTH bins —
        # the known-miscalibrated planted model (VERDICT r10 ask 5)
        rows = [(i, 1000, 1 if i < 7 else -1) for i in range(10)] + [
            (10 + i, -1000, 1 if i < 3 else -1) for i in range(10)
        ]
        got = self._cal(spark, rows, n_bins=2, scale=100)
        hi, lo = got[1], got[0]
        assert (hi.mean_p_mils, hi.pos_rate_mils, hi.gap_mils) == (
            1000, 700, 300,
        )
        assert (hi.se_sum, hi.brier_micros) == (3_000_000, 300_000)
        assert (lo.mean_p_mils, lo.pos_rate_mils, lo.gap_mils) == (
            0, 300, 300,
        )
        assert lo.brier_micros == 300_000

    def test_negative_mean_margin_floors_like_the_oracle(self, spark):
        # msum = -4 over 3 docs: floor(-4000/3) = -1334, not the
        # truncated -1333 (the filter_agreement DIV-vs-// lesson)
        rows = [(0, -1, 1), (1, -1, -1), (2, -2, -1)]
        got = self._cal(spark, rows, n_bins=1, scale=100)
        assert got[0].mean_margin_mils == -1334

    def test_single_margin_degenerates_to_one_bin(self, spark):
        got = self._cal(spark, [(0, 7, 1), (1, 7, -1)], n_bins=10)
        assert set(got) == {0}
        assert got[0].n_docs == 2


class TestClassifierPrSweep:
    def test_textbook_pr_curve(self, spark):
        # margins pos {4, 1}, neg {3, 0} — the classifier_auc textbook
        # case. Sweep rows (keep iff margin > t):
        #   t=4:  nothing kept (degenerate, precision NULL)
        #   t=3:  {4} kept        -> p=1000, r=500
        #   t=1:  {4,3} kept      -> p=500,  r=500
        #   t=0:  {4,3,1} kept    -> p=666,  r=1000
        #   t=-1: everything kept -> the keep-all sentinel (r11 ADVICE)
        df = spark.createDataFrame(
            [(0, 4, 1), (1, 1, 1), (2, 3, -1), (3, 0, -1)],
            ["doc_id", "margin", "y"],
        )
        got = {
            r.threshold: r
            for r in ts.classifier_pr_sweep(df).collect()
        }
        assert set(got) == {-1, 0, 1, 3, 4}
        assert (got[4].n_kept, got[4].precision_mils) == (0, None)
        assert (got[3].n_kept, got[3].kept_mils) == (1, 250)
        assert (got[3].precision_mils, got[3].recall_mils) == (1000, 500)
        assert (got[1].precision_mils, got[1].recall_mils) == (500, 500)
        assert (got[0].n_kept, got[0].precision_mils,
                got[0].recall_mils) == (3, 666, 1000)
        # the full-corpus baseline row: everything kept, corpus
        # precision, total recall
        assert (got[-1].n_kept, got[-1].kept_mils) == (4, 1000)
        assert (got[-1].precision_mils, got[-1].recall_mils) == (500, 1000)

    def test_no_positives_recall_is_null(self, spark):
        df = spark.createDataFrame(
            [(0, 2, -1), (1, 5, -1)], ["doc_id", "margin", "y"]
        )
        for r in ts.classifier_pr_sweep(df).collect():
            assert r.recall_mils is None

    def test_sweep_monotonicity_properties(self, spark):
        # raising the threshold can only shrink the kept set: n_kept,
        # n_pos_kept, and recall are non-increasing in t, kept counts
        # are consistent (pos <= kept), and the bottom threshold keeps
        # everything above it (n_kept = n_docs - |bottom margin group|)
        rows = [
            (i, (i * 7) % 13 - 6, 1 if (i * 3) % 5 < 2 else -1)
            for i in range(200)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "margin", "y"])
        sweep = sorted(
            ts.classifier_pr_sweep(df).collect(),
            key=lambda r: -r.threshold,
        )
        for hi, lo in zip(sweep, sweep[1:]):
            assert hi.n_kept <= lo.n_kept
            assert hi.n_pos_kept <= lo.n_pos_kept
            assert (hi.recall_mils or 0) <= (lo.recall_mils or 0)
        for r in sweep:
            assert 0 <= r.n_pos_kept <= r.n_kept
        n_docs = len(rows)
        bottom = min(m for _, m, _ in rows)
        n_bottom = sum(1 for _, m, _ in rows if m == bottom)
        # second-to-last row = lowest REAL margin threshold; the last
        # row is the keep-everything sentinel at min(margin) - 1
        assert sweep[-2].n_kept == n_docs - n_bottom
        assert sweep[-1].threshold == bottom - 1
        assert (sweep[-1].n_kept, sweep[-1].kept_mils) == (n_docs, 1000)
        assert sweep[0].n_kept == 0


class TestCorpusFilterClassifier:
    def _labeled(self, spark):
        rows = [
            (
                i,
                (
                    "good quality writing marker"
                    if i % 2 == 0
                    else "bad junky noise marker"
                )
                + f" shared filler {i % 5}",
                1 if i % 2 == 0 else -1,
            )
            for i in range(40)
        ]
        return spark.createDataFrame(rows, ["doc_id", "text", "y"])

    def test_gate_matches_the_sweep_choice(self, spark):
        # the operator must pick EXACTLY the smallest sweep threshold
        # meeting the precision floor with a nonempty keep, and gate
        # every doc by margin > t with attributable reasons
        d = self._labeled(spark)
        w = ts.classifier_train(d, n_iters=2, n_features=256)
        preds = ts.classifier_predict(d, w, n_features=256)
        labeled = preds.join(d.select("doc_id", "y"), "doc_id")
        sweep = ts.classifier_pr_sweep(labeled).collect()
        floor = 800
        elig = [
            r.threshold
            for r in sweep
            if r.precision_mils is not None
            and r.precision_mils >= floor
            and r.n_kept > 0
        ]
        t = min(elig) if elig else max(r.threshold for r in sweep)
        got = ts.corpus_filter_classifier(
            d, w, min_precision_mils=floor, n_features=256
        ).collect()
        assert len(got) == 40
        for r in got:
            assert r.threshold == t
            assert r.is_kept == (r.margin > t)
            assert (r.drop_reason is None) == r.is_kept
            if not r.is_kept:
                assert r.drop_reason == "classifier_low_margin"

    def test_zero_floor_keeps_everything(self, spark):
        # precision floor 0 is met by the sweep's keep-everything
        # sentinel row -> the gate keeps the full corpus
        d = self._labeled(spark)
        w = ts.classifier_train(d, n_iters=2, n_features=256)
        got = ts.corpus_filter_classifier(
            d, w, min_precision_mils=0, n_features=256
        ).collect()
        assert all(r.is_kept for r in got)

    def test_impossible_floor_keeps_nothing(self, spark):
        # no operating point reaches 1001 mils: the gate falls back to
        # threshold = max(margin) and keeps nothing - honest, never
        # silently loosened
        d = self._labeled(spark)
        w = ts.classifier_train(d, n_iters=2, n_features=256)
        got = ts.corpus_filter_classifier(
            d, w, min_precision_mils=1001, n_features=256
        ).collect()
        assert all(not r.is_kept for r in got)
        assert all(r.drop_reason == "classifier_low_margin" for r in got)


class TestScoreBuckets:
    def test_exact_terciles_on_distinct_scores(self, spark):
        df = spark.createDataFrame(
            [(i, float(i)) for i in range(9)], ["doc_id", "avg_nll"]
        )
        out = {r.doc_id: r.bucket for r in ts.score_buckets(df).collect()}
        assert [out[i] for i in range(9)] == (
            ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
        )

    def test_cutoff_cell_ties_take_lower_label(self, spark):
        # 5 rows share the score cell that crosses the 1/3 boundary
        # (ceil(12/3) = 4 falls inside it): ALL five get 'head' — every
        # row in a cutoff cell takes the lower label, deterministic at
        # 1/granularity resolution
        rows = (
            [(i, 1.0) for i in range(5)]
            + [(10 + i, 5.0) for i in range(3)]
            + [(20 + i, 9.0) for i in range(4)]
        )
        df = spark.createDataFrame(rows, ["doc_id", "avg_nll"])
        out = {r.doc_id: r.bucket for r in ts.score_buckets(df).collect()}
        assert all(out[i] == "head" for i in range(5))
        assert all(out[10 + i] == "middle" for i in range(3))
        assert all(out[20 + i] == "tail" for i in range(4))

    def test_partitioning_invariant_and_rough_thirds(self, spark, sf_dir):
        from hadoop_invertedindexer_spark.sources.tables import read_table

        scored = ts.unigram_nll(
            read_table(spark, sf_dir, "documents"), max_vocab=64
        )
        a = sorted(
            (r.doc_id, r.bucket) for r in ts.score_buckets(scored).collect()
        )
        b = sorted(
            (r.doc_id, r.bucket)
            for r in ts.score_buckets(scored.repartition(7)).collect()
        )
        assert a == b
        from collections import Counter

        c = Counter(bk for _, bk in a)
        n = sum(c.values())
        # cell-granular boundaries: each tercile within ~15% of n/3
        for k in ("head", "middle", "tail"):
            assert abs(c[k] - n / 3) <= max(2, 0.15 * n), c


class TestLangConfusion:
    def test_hand_computed_matrix(self, spark):
        docs = spark.createDataFrame(
            [
                (0, "the cat and the dog is here with food", "en"),
                (1, "the bird and the fish is fast with fins", "en"),
                (2, "der hund und die katze ist mit haus", "de"),
                (3, "no markers whatsoever", "de"),  # -> 'und'
            ],
            ["doc_id", "text", "lang"],
        )
        got = {
            (r.gold, r.pred): (r.n_docs, r.share_mils)
            for r in ts.lang_confusion(docs).collect()
        }
        assert got[("en", "en")] == (2, 1000)
        assert got[("de", "de")] == (1, 500)
        assert got[("de", "und")] == (1, 500)
        assert ("en", "de") not in got  # empty cells never materialize


class TestPiiReport:
    def test_hand_computed_rollup(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "mail a@b.io and c@d.io from 1.2.3.4", "web"),
                (2, "clean words only", "web"),
                (3, "call +1 (555) 010-42 now", "crawl"),
            ],
            ["doc_id", "text", "source"],
        )
        got = {r.source: r for r in ts.pii_report(docs).collect()}
        web = got["web"]
        assert (web.n_docs, web.n_emails, web.n_ips, web.n_phones) == (
            2, 2, 1, 0,
        )
        assert (web.n_docs_with_pii, web.pii_doc_rate_mils) == (1, 500)
        crawl = got["crawl"]
        assert (crawl.n_phones, crawl.pii_doc_rate_mils) == (1, 1000)


class TestFilterAgreement:
    def _agree(self, spark, rows):
        df = spark.createDataFrame(rows, ["a", "b"])
        return ts.filter_agreement(df).first()

    def test_perfect_agreement(self, spark):
        r = self._agree(
            spark, [(True, True), (False, False), (True, True)]
        )
        assert (r.n_both, r.n_neither) == (2, 1)
        assert (r.agreement_mils, r.kappa_mils) == (1000, 1000)

    def test_chance_level_kappa_zero(self, spark):
        # independent 50/50 signals: po = pe = 0.5 -> kappa 0
        rows = [(True, True), (True, False), (False, True), (False, False)]
        r = self._agree(spark, rows)
        assert r.agreement_mils == 500
        assert r.kappa_mils == 0

    def test_systematic_disagreement_negative_floor(self, spark):
        # perfect anti-correlation at balanced rates: kappa = -1
        rows = [(True, False), (False, True)] * 3
        r = self._agree(spark, rows)
        assert r.agreement_mils == 0
        assert r.kappa_mils == -1000

    def test_negative_kappa_floors_like_oracle(self, spark):
        # n=5: both=1, a_only=2, b_only=1, neither=1 -> agree=2,
        # pe_num = 3*2 + 2*3 = 12, kappa = (10-12)/(25-12) = -2/13
        # -> mils floor(-153.85) = -154; truncation would say -153,
        # which is exactly where Spark DIV and DuckDB // diverge
        rows = [
            (True, True),
            (True, False), (True, False),
            (False, True),
            (False, False),
        ]
        r = self._agree(spark, rows)
        assert r.kappa_mils == -154

    def test_constant_signals_null(self, spark):
        r = self._agree(spark, [(True, True), (True, True)])
        assert r.kappa_mils is None
        assert r.agreement_mils == 1000
