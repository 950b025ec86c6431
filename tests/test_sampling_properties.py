"""Hypothesis property tests for the sampling/packing ops: the
invariants must hold for arbitrary ids and weights, not just the
testdata fixtures."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

import pyspark.sql.functions as F

from hadoop_invertedindexer_spark.operators import sampling

HSETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

ids_strategy = st.lists(
    st.integers(min_value=0, max_value=10**9), min_size=1, max_size=40, unique=True
)


@HSETTINGS
@given(ids=ids_strategy)
def test_hash_split_partitions_any_id_set(spark, ids):
    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    out = sampling.hash_split(df)
    assert out.count() == len(ids)
    assert out.where(~F.col("split").isin(["train", "val", "test"])).count() == 0
    # pure function of the id: a second evaluation agrees row-for-row
    a = out.select("doc_id", "split")
    b = sampling.hash_split(df.repartition(3)).select("doc_id", "split")
    assert a.exceptAll(b).count() == 0


@HSETTINGS
@given(
    weights=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=40),
    budget=st.integers(min_value=1, max_value=300),
)
def test_pack_next_fit_bound_any_weights(spark, weights, budget):
    rows = [(i, "s", w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    packed = sampling.pack_sequences(df, budget=budget)
    stats = (
        packed.groupBy("pack_id")
        .agg(F.sum("n_chars").alias("w"), F.max("n_chars").alias("mx"))
        .collect()
    )
    for r in stats:
        # next-fit: a pack exceeds budget only by (part of) one document
        assert r["w"] < budget + max(r["mx"], 1)


@HSETTINGS
@given(texts=st.lists(st.text(alphabet="ab ", max_size=30), min_size=1, max_size=10))
def test_bigram_total_count_matches_token_arithmetic(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    total = (
        sampling.bigram_counts(df).agg(F.sum("n").alias("s")).collect()[0]["s"] or 0
    )
    # split(' ') semantics: every doc contributes max(len(parts)-1, 0)
    expected = sum(max(len(t.split(" ")) - 1, 0) for t in texts)
    assert total == expected


@HSETTINGS
@given(
    weights=st.lists(st.integers(min_value=0, max_value=2000), min_size=1, max_size=60),
    denom=st.integers(min_value=1, max_value=1500),
)
def test_weighted_sample_monotone_in_weight(spark, weights, denom):
    """Raising a row's weight can only ADD it to the sample, never evict
    it (the hash threshold grows with min(w, denom)); weight >= denom is
    always kept, weight 0 never."""
    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    kept = {r.doc_id for r in sampling.weighted_sample(df, denom=denom).collect()}
    bumped = spark.createDataFrame(
        [(i, w + 50) for i, w in rows], "doc_id long, n_chars long"
    )
    kept_bumped = {
        r.doc_id for r in sampling.weighted_sample(bumped, denom=denom).collect()
    }
    assert kept <= kept_bumped
    assert {i for i, w in rows if w >= denom} <= kept
    weight_of = dict(rows)
    assert all(weight_of[i] > 0 for i in kept)


@HSETTINGS
@given(
    ids=ids_strategy,
    n_shards=st.integers(min_value=1, max_value=9),
    epoch=st.integers(min_value=0, max_value=3),
)
def test_epoch_shuffle_is_a_dense_permutation(spark, ids, n_shards, epoch):
    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    rows = sampling.epoch_shuffle(df, n_shards=n_shards, epoch=epoch).collect()
    assert {r.doc_id for r in rows} == set(ids)  # every row exactly once
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r.shard < n_shards
        by_shard.setdefault(r.shard, []).append(r.seq)
    for seqs in by_shard.values():
        assert sorted(seqs) == list(range(1, len(seqs) + 1))  # dense seq


@HSETTINGS
@given(
    toks=st.lists(
        st.integers(min_value=0, max_value=4), min_size=1, max_size=25
    ),
    weights=st.dictionaries(
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=0, max_value=1000),
        max_size=3,
    ),
    budget=st.integers(min_value=0, max_value=10_000),
)
def test_mixture_plan_matches_python_arithmetic(spark, toks, weights, budget):
    # one doc per entry: stratum = a/b/c round-robin, token count = v+1
    rows = [
        (i, "t " * (v + 1), "abc"[i % 3]) for i, v in enumerate(toks)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = {
        r.stratum: (r.n_docs, r.avail_tokens, r.target_tokens, r.rate_mils)
        for r in sampling.mixture_plan(df, weights, budget).collect()
    }
    want: dict[str, tuple[int, int, int, int]] = {}
    for i, v in enumerate(toks):
        s = "abc"[i % 3]
        n, a = want.get(s, (0, 0))[:2] if s in want else (0, 0)
        want[s] = (n + 1, a + v + 1, 0, 0)
    for s, (n, a, _, _) in want.items():
        t = budget * weights.get(s, 0) // 1000
        want[s] = (n, a, t, (t * 1000 // a) if a > 0 else 0)
    assert got == want
