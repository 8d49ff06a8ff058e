"""Bigram LM perplexity: hand-computed scores, backoff paths, determinism."""

import math

import pytest
from pyspark.sql import Row

from kartothek_spark.operators.lm import (
    perplexity_score,
    train_ngram_lm,
)


def _hand_nll(text, uni, bi, n, alpha=0.4):
    import re

    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    if len(toks) < 2:
        return None
    lps = []
    for prev, cur in zip(toks, toks[1:]):
        if (prev, cur) in bi and prev in uni:
            lp = math.log(bi[(prev, cur)] / uni[prev])
        elif cur in uni:
            lp = math.log(alpha * uni[cur] / n)
        else:
            lp = math.log(alpha / n)
        lps.append(round(lp, 6))
    s = 0.0
    for v in lps:
        s += v
    return round(-s / len(lps), 6)


def test_perplexity_hand_computed_all_backoff_paths(spark):
    train = [
        Row(doc_id=1, text="a b a b a c"),
        Row(doc_id=2, text="a b c"),
        Row(doc_id=3, text="z"),
    ]
    tdf = spark.createDataFrame(train)
    lm = train_ngram_lm(tdf, min_count=1, max_vocab=100)
    # hand tables
    uni = {"a": 4, "b": 3, "c": 2, "z": 1}
    bi = {("a", "b"): 3, ("b", "a"): 2, ("a", "c"): 1, ("b", "c"): 1}
    assert lm.n_tokens == 10
    assert {(r.token, r.c) for r in lm.unigrams.collect()} == set(uni.items())
    assert {((r.prev, r.cur), r.c) for r in lm.bigrams.collect()} == set(bi.items())

    score_docs = [
        Row(doc_id=10, text="a b c"),        # bigram path throughout
        Row(doc_id=11, text="c a"),          # unseen bigram -> unigram backoff
        Row(doc_id=12, text="a qqq zz a"),   # OOV floor positions
        Row(doc_id=13, text="solo"),         # < 2 tokens -> NULL
        Row(doc_id=14, text=""),             # empty -> NULL
    ]
    sdf = spark.createDataFrame(score_docs)
    got = {r.doc_id: (r.n_scored, r.nll) for r in perplexity_score(sdf, lm).collect()}
    for r in score_docs:
        exp = _hand_nll(r.text, uni, bi, 10)
        n_exp = max(len([t for t in r.text.split() if t]) - 1, 0)
        assert got[r.doc_id] == (n_exp, exp), (r.doc_id, got[r.doc_id], exp)

    # fluent text scores lower than gibberish
    assert got[10][1] < got[12][1]

    # determinism under repartitioning
    a = sorted(tuple(r) for r in perplexity_score(sdf, lm).collect())
    b = sorted(
        tuple(r)
        for r in perplexity_score(sdf.repartition(7), train_ngram_lm(tdf.repartition(5), min_count=1, max_vocab=100)).collect()
    )
    assert a == b


def test_lm_caps(spark):
    rows = [Row(doc_id=i, text="common common rare%d" % i) for i in range(20)]
    df = spark.createDataFrame(rows)
    lm = train_ngram_lm(df, min_count=2, max_vocab=5)
    # vocab capped at 5 (common + 4 rares by tie-break), singleton bigrams dropped
    assert lm.unigrams.count() == 5
    assert {(r.prev, r.cur) for r in lm.bigrams.collect()} == {("common", "common")}
    with pytest.raises(ValueError, match="empty"):
        train_ngram_lm(df.where("doc_id < 0"))


def test_perplexity_ranks_in_domain_below_gibberish(spark):
    """Perplexity-ordering check on held-out docs: a regression that
    preserves row counts but breaks the probability arithmetic (wrong
    backoff mass, inverted logs, count corruption) cannot keep every
    UNSEEN in-domain document scoring lower perplexity than every
    gibberish document under a model trained on the in-domain corpus."""
    base = [
        "the cat sat on the mat",
        "the dog sat on the rug",
        "a cat and a dog ran home",
        "the dog ran to the mat",
        "a cat ran on the rug",
    ]
    train_rows = [
        Row(doc_id=i, text=base[i % len(base)]) for i in range(40)
    ]
    held_in = [
        Row(doc_id=1000, text="the cat ran on the mat"),
        Row(doc_id=1001, text="a dog sat on the mat"),
    ]
    gibberish = [
        Row(doc_id=2000, text="qzx glorp wibble snark blort"),
        Row(doc_id=2001, text="frobnitz zyzzyva quux blargh krex"),
    ]
    lm = train_ngram_lm(spark.createDataFrame(train_rows), min_count=1)
    scored = {
        r.doc_id: r.nll
        for r in perplexity_score(
            spark.createDataFrame(held_in + gibberish), lm
        ).collect()
    }
    worst_in = max(scored[r.doc_id] for r in held_in)
    best_gib = min(scored[r.doc_id] for r in gibberish)
    assert worst_in < best_gib, scored
