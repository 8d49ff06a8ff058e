"""BPE tokenizer training and encoding over a managed corpus.

The missing piece between corpus assembly and model training: learn a
byte-pair-encoding vocabulary FROM the corpus, then encode the corpus
with it. Follows the standard scale split every production tokenizer
trainer uses (HuggingFace tokenizers, SentencePiece): the corpus-sized
work is ONE distributed word-frequency aggregation (the 100 TB part —
a groupBy with map-side combine on lower-cased whitespace words); the
merge loop then runs on the BOUNDED word-frequency table driver-side
(``max_words`` caps it), with incremental pair-count maintenance (only
words containing the just-merged pair are rescanned — the indexed
algorithm, not the quadratic rescan).

Everything is deterministic: word ties in the frequency cut break
lexicographically, merge ties break on (count desc, pair lexicographic
asc), so two runs — or a run and the pure-Python test oracle — produce
identical merge tables. Encoding is a vectorized ``mapInPandas`` with a
per-batch word→tokens cache (Zipf makes the cache hit rate ≈ 1).

No SQL oracle is possible for the merge loop (iterative, stateful —
DuckDB cannot express it); the driver gate records the encode stage
rows-only, and `tests/test_bpe.py` holds the independent naive-BPE
oracle for both training and encoding.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kartothek_spark.functions.hashing import tokens

END_OF_WORD = "▁"  # SentencePiece-style word-end sentinel


def word_frequencies(df: DataFrame, text_col: str = "text", max_words: int = 65536):
    """Distributed word-frequency stage → bounded driver list of
    ``(word, count)``, highest-count first, lexicographic tie-break."""
    wc = (
        df.where(F.col(text_col).isNotNull())
        .select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .count()
    )
    rows = wc.orderBy(F.desc("count"), F.asc("w")).limit(max_words).collect()
    return [(r.w, r["count"]) for r in rows]


def _merge_seq(seq: tuple, pair: tuple) -> tuple:
    out = []
    i, n = 0, len(seq)
    ab = pair[0] + pair[1]
    while i < n:
        if i + 1 < n and seq[i] == pair[0] and seq[i + 1] == pair[1]:
            out.append(ab)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return tuple(out)


def train_bpe_from_frequencies(
    word_freqs: Sequence[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Indexed BPE merge loop (driver-side, bounded input): returns the
    ordered merge table. Tie-break: (count desc, pair lexicographic asc)."""
    from collections import Counter, defaultdict

    seqs: dict[int, tuple] = {}
    freqs: dict[int, int] = {}
    for idx, (w, c) in enumerate(word_freqs):
        seqs[idx] = tuple(list(w) + [END_OF_WORD])
        freqs[idx] = c

    pair_counts: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for idx, seq in seqs.items():
        c = freqs[idx]
        for a, b in zip(seq, seq[1:]):
            pair_counts[(a, b)] += c
            pair_words[(a, b)].add(idx)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        # drop zero/negative residue entries lazily
        best = None
        for pair, cnt in pair_counts.items():
            if cnt <= 0:
                continue
            key = (-cnt, pair)
            if best is None or key < best[0]:
                best = (key, pair)
        if best is None:
            break
        pair = best[1]
        merges.append(pair)
        for idx in list(pair_words[pair]):
            seq = seqs[idx]
            c = freqs[idx]
            new_seq = _merge_seq(seq, pair)
            if new_seq == seq:
                continue
            for a, b in zip(seq, seq[1:]):
                pair_counts[(a, b)] -= c
                if pair_counts[(a, b)] <= 0:
                    pair_words[(a, b)].discard(idx)
            for a, b in zip(new_seq, new_seq[1:]):
                pair_counts[(a, b)] += c
                pair_words[(a, b)].add(idx)
            seqs[idx] = new_seq
        pair_counts[pair] = 0
        pair_words[pair] = set()
    return merges


def train_bpe(
    spark,
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 256,
    max_words: int = 65536,
) -> list[tuple[str, str]]:
    """Corpus-scale BPE training: distributed word counts, bounded
    driver-side merge loop. Returns the ordered merge table."""
    return train_bpe_from_frequencies(
        word_frequencies(df, text_col, max_words), num_merges
    )


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word in rank order (lowest-rank mergeable pair
    first — the canonical BPE encode)."""
    seq = list(word) + [END_OF_WORD]
    while len(seq) > 1:
        best_rank, best_i = None, None
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def bpe_encode(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distributed encode: ``(doc_id, n_words, n_tokens, n_unk_chars)``
    per document. One ``mapInPandas`` pass; each Arrow batch keeps a
    word→encoding cache, so the per-word merge walk runs once per
    DISTINCT word per batch (Zipf: cache hit rate ≈ 1)."""
    spark = df.sparkSession
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    known = set()
    for a, b in ranks:
        known.update(a)
        known.update(b)
    bc = spark.sparkContext.broadcast((ranks, known))

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        b_ranks, b_known = bc.value
        cache: dict[str, tuple[int, int]] = {}

        def stats(word: str) -> tuple[int, int]:
            hit = cache.get(word)
            if hit is None:
                toks = encode_word(word, b_ranks)
                unk = sum(1 for ch in word if ch not in b_known)
                hit = (len(toks), unk)
                cache[word] = hit
            return hit

        import re

        # EXACT twin of functions.hashing.tokens (TOKEN_PATTERN) so the
        # encoder tokenizes identically to the training word counts
        split = re.compile(r"[^a-z0-9]+").split

        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {"doc_id": [], "n_words": [], "n_tokens": [], "n_unk_chars": []}
            for doc_id, text in zip(pdf["id"], pdf["t"]):
                words = [w for w in split((text or "").lower()) if w]
                nt = nu = 0
                for w in words:
                    t, u = stats(w)
                    nt += t
                    nu += u
                out["doc_id"].append(doc_id)
                out["n_words"].append(len(words))
                out["n_tokens"].append(nt)
                out["n_unk_chars"].append(nu)
            yield pd.DataFrame(out)

    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
    return src.mapInPandas(
        gen, "doc_id long, n_words long, n_tokens long, n_unk_chars long"
    )


__all__ = [
    "END_OF_WORD",
    "bpe_encode",
    "encode_word",
    "train_bpe",
    "train_bpe_from_frequencies",
    "word_frequencies",
]
