"""N-gram language-model perplexity scoring — CCNet-style corpus QC.

The standard pretraining-corpus quality signal the heuristic features
(``operators/text.py``) can't give: score each document by how surprising
its token stream is under a bigram language model with stupid backoff
(Brants et al. 2007) trained on a reference corpus (often the corpus
itself, or a held-out "clean" slice). Low-probability documents are
gibberish/boilerplate candidates; CCNet buckets the corpus by this score.

Spark-first shape, 100 TB discipline:

* **Training** is two map-side-combinable aggregations (unigram counts,
  bigram counts). Vocabulary is capped with a distributed
  ``TakeOrdered`` top-``max_vocab`` (count desc, token asc — total
  order, deterministic); bigrams are df-capped by ``min_count`` (the
  same heavy-tail guard the n-gram dedup index uses), so table sizes are
  bounded regardless of corpus size.
* **Scoring** is one pass: per-position (prev, cur) pairs from the
  already-materialized token array, three hash joins against the
  (broadcastable) LM tables, then a per-document ordered fold.
* **Determinism**: counts are exact integers; each position's log-prob
  is rounded to 6 decimals BEFORE the fold, and the fold adds in
  document order (sorted struct array, left-to-right) — identical IEEE
  operations on identical inputs in both engines, so the scores are
  value-exact against the DuckDB twin.

No reference counterpart (no ML surface in the reference); beyond-
reference operator for the LLM-pipeline layer.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kartothek_spark.functions.hashing import tokens, tokens_sql

BACKOFF_ALPHA = 0.4


@dataclass
class NgramLM:
    """Bigram LM tables: ``unigrams`` (token, c), ``bigrams`` (prev, cur,
    c), and the exact total token count ``n_tokens``."""

    unigrams: DataFrame
    bigrams: DataFrame
    n_tokens: int


def train_ngram_lm(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
    max_vocab: int = 65536,
) -> NgramLM:
    """Count-based bigram LM with a capped vocabulary.

    ``max_vocab`` bounds the unigram table (top by count, token-asc
    tie-break); ``min_count`` drops singleton bigrams (the long tail that
    would otherwise dominate table size). ``n_tokens`` counts the FULL
    stream, not just retained vocab, so out-of-vocabulary mass is real."""
    toks = df.select(tokens(F.col(text_col)).alias("__t"))
    # one pre-cap unigram aggregation serves BOTH n_tokens (sum of all
    # counts — the full stream incl. what the cap drops) and the capped
    # vocabulary; persisting the vocab-sized table saves a corpus scan
    wc = (
        toks.select(F.explode("__t").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("c"))
        .persist()
    )
    n_tokens = wc.select(F.sum("c").alias("n")).collect()[0]["n"] or 0
    if n_tokens == 0:
        wc.unpersist()
        raise ValueError("empty corpus")
    uni = wc.orderBy(F.desc("c"), F.asc("token")).limit(max_vocab)
    pairs = toks.where(F.size("__t") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("__t") - 2),
                lambda i: F.struct(
                    F.element_at("__t", i + 1).alias("prev"),
                    F.element_at("__t", i + 2).alias("cur"),
                ),
            )
        ).alias("__p")
    )
    bi = (
        pairs.select(F.col("__p.prev").alias("prev"), F.col("__p.cur").alias("cur"))
        .groupBy("prev", "cur")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= min_count)
    )
    return NgramLM(unigrams=uni, bigrams=bi, n_tokens=int(n_tokens))


def perplexity_score(
    df: DataFrame,
    lm: NgramLM,
    alpha: float = BACKOFF_ALPHA,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document negative average log-probability under stupid backoff:

    ``p(cur|prev) = c(prev,cur)/c(prev)``        if the bigram is retained,
    ``            = alpha * c(cur)/N``           else if ``cur`` in vocab,
    ``            = alpha * 1/N``                else (OOV floor).

    Returns ``(id, n_scored, nll)`` — ``n_scored`` = number of scored
    positions (len-1), ``nll`` = round(-Σ lp / n_scored, 6), NULL for
    documents with fewer than two tokens. Lower is more fluent."""
    base = df.select(
        F.col(id_col).alias("__id"), tokens(F.col(text_col)).alias("__t")
    )
    pos = base.where(F.size("__t") >= 2).select(
        "__id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("__t") - 2),
                lambda i: F.struct(
                    F.element_at("__t", i + 1).alias("prev"),
                    F.element_at("__t", i + 2).alias("cur"),
                ),
            )
        ).alias("__i", "__p"),
    ).select("__id", "__i", F.col("__p.prev").alias("prev"), F.col("__p.cur").alias("cur"))

    uni_prev = lm.unigrams.select(
        F.col("token").alias("prev"), F.col("c").alias("__cp")
    )
    uni_cur = lm.unigrams.select(F.col("token").alias("cur"), F.col("c").alias("__cc"))
    bi = lm.bigrams.select("prev", "cur", F.col("c").alias("__cb"))
    n = float(lm.n_tokens)
    lp = F.round(
        F.when(
            F.col("__cb").isNotNull() & F.col("__cp").isNotNull(),
            F.log(F.col("__cb").cast("double") / F.col("__cp").cast("double")),
        )
        .when(
            F.col("__cc").isNotNull(),
            F.log(F.lit(alpha) * F.col("__cc").cast("double") / F.lit(n)),
        )
        .otherwise(F.log(F.lit(alpha) / F.lit(n))),
        6,
    )
    scored = (
        pos.join(uni_prev, "prev", "left")
        .join(uni_cur, "cur", "left")
        .join(bi, ["prev", "cur"], "left")
        .select("__id", "__i", lp.alias("__lp"))
    )
    folded = (
        scored.groupBy("__id")
        .agg(F.sort_array(F.collect_list(F.struct("__i", "__lp"))).alias("__ps"))
        .select(
            "__id",
            F.size("__ps").cast("long").alias("n_scored"),
            F.round(
                -F.aggregate("__ps", F.lit(0.0), lambda a, x: a + x.getField("__lp"))
                / F.size("__ps"),
                6,
            ).alias("nll"),
        )
    )
    return (
        base.select("__id")
        .join(folded, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("n_scored", F.lit(0)).alias("n_scored"),
            "nll",
        )
    )


def perplexity_self_score_sql(
    table: str,
    min_count: int = 2,
    max_vocab: int = 65536,
    alpha: float = BACKOFF_ALPHA,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of ``perplexity_score(df, train_ngram_lm(df))`` — the
    self-scoring composition the gate runs."""
    toks = tokens_sql(text_col)
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {toks} AS t FROM {table}
), total AS (
  SELECT CAST(sum(len(t)) AS DOUBLE) AS n FROM base
), uni AS (
  SELECT token, c FROM (
    SELECT token, CAST(count(*) AS BIGINT) AS c,
           row_number() OVER (ORDER BY count(*) DESC, token ASC) AS rn
    FROM (SELECT unnest(t) AS token FROM base) GROUP BY token
  ) WHERE rn <= {max_vocab}
), bi AS (
  SELECT prev, cur, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT b.t[i + 1] AS prev, b.t[i + 2] AS cur
    FROM base b, unnest(range(0, len(b.t) - 1)) AS u(i)
    WHERE len(b.t) >= 2
  ) GROUP BY prev, cur HAVING count(*) >= {min_count}
), pos AS (
  SELECT b.id, i, b.t[i + 1] AS prev, b.t[i + 2] AS cur
  FROM base b, unnest(range(0, len(b.t) - 1)) AS u(i)
  WHERE len(b.t) >= 2
), scored AS (
  SELECT p.id, p.i,
         round(CASE
           WHEN bi.c IS NOT NULL AND up.c IS NOT NULL
             THEN ln(CAST(bi.c AS DOUBLE) / CAST(up.c AS DOUBLE))
           WHEN uc.c IS NOT NULL
             THEN ln({alpha} * CAST(uc.c AS DOUBLE) / total.n)
           ELSE ln({alpha} / total.n)
         END, 6) AS lp
  FROM pos p
  LEFT JOIN uni up ON p.prev = up.token
  LEFT JOIN uni uc ON p.cur = uc.token
  LEFT JOIN bi ON p.prev = bi.prev AND p.cur = bi.cur
  CROSS JOIN total
), folded AS (
  SELECT id, CAST(count(*) AS BIGINT) AS n_scored,
         round(-list_reduce(list_prepend(0.0,
                 list_transform(list_sort(list(struct_pack(i := i, lp := lp))), x -> x.lp)),
               (a, b) -> a + b) / count(*), 6) AS nll
  FROM scored GROUP BY id
)
SELECT b.id AS {id_col}, COALESCE(f.n_scored, 0) AS n_scored, f.nll
FROM base b LEFT JOIN folded f ON b.id = f.id
"""


__all__ = [
    "NgramLM",
    "train_ngram_lm",
    "perplexity_score",
    "perplexity_self_score_sql",
]
