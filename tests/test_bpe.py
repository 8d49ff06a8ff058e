"""BPE training/encoding vs an independent naive pure-Python oracle."""

import os
import re
from collections import Counter

from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from kartothek_spark.operators.bpe import (
    END_OF_WORD,
    bpe_encode,
    encode_word,
    train_bpe,
    train_bpe_from_frequencies,
    word_frequencies,
)


def _docs(spark, n=150):
    return (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select("doc_id", "text")
        .limit(n)
    )


def _naive_word_freqs(rows):
    c = Counter()
    for text in rows:
        for w in re.split(r"[^a-z0-9]+", (text or "").lower()):
            if w:
                c[w] += 1
    return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))


def _naive_train(word_freqs, num_merges):
    """Quadratic re-scan BPE — deliberately different algorithm from the
    indexed production loop."""
    seqs = {i: (tuple(list(w) + [END_OF_WORD]), c) for i, (w, c) in enumerate(word_freqs)}
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for seq, c in seqs.values():
            for pair in zip(seq, seq[1:]):
                pc[pair] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)

        def apply(seq):
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == best:
                    out.append(seq[i] + seq[i + 1])
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            return tuple(out)

        seqs = {i: (apply(s), c) for i, (s, c) in seqs.items()}
    return merges


def test_train_matches_naive_oracle(spark):
    docs = _docs(spark)
    texts = [r.text for r in docs.collect()]
    want_freqs = _naive_word_freqs(texts)

    got_freqs = word_frequencies(docs, max_words=10**9)
    assert got_freqs == want_freqs

    got = train_bpe_from_frequencies(got_freqs, num_merges=120)
    want = _naive_train(want_freqs, 120)
    assert got == want


def test_train_is_deterministic(spark):
    docs = _docs(spark)
    a = train_bpe(spark, docs, num_merges=60)
    b = train_bpe(spark, docs, num_merges=60)
    assert a == b and len(a) == 60


def test_encode_matches_per_word_oracle(spark):
    docs = _docs(spark, n=80)
    merges = train_bpe(spark, docs, num_merges=100)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    known = set()
    for a, b in ranks:
        known.update(a)
        known.update(b)

    got = {r.doc_id: (r.n_words, r.n_tokens, r.n_unk_chars)
           for r in bpe_encode(docs, merges).collect()}
    for r in docs.collect():
        words = [w for w in re.split(r"[^a-z0-9]+", (r.text or "").lower()) if w]
        nt = sum(len(encode_word(w, ranks)) for w in words)
        nu = sum(1 for w in words for ch in w if ch not in known)
        assert got[r.doc_id] == (len(words), nt, nu)


def test_merges_compress(spark):
    """Sanity: BPE must shorten the corpus — tokens with merges < tokens
    with none (= chars + 1 per word)."""
    docs = _docs(spark)
    merges = train_bpe(spark, docs, num_merges=200)
    enc = bpe_encode(docs, merges).agg(F.sum("n_tokens")).first()[0]
    raw = bpe_encode(docs, []).agg(F.sum("n_tokens")).first()[0]
    assert enc < raw
