"""DSIR-style data selection: hashed-n-gram importance resampling.

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023):
select raw-corpus documents whose hashed n-gram feature distribution
looks like a TARGET corpus (the high-quality domain you want more of) by
(1) fitting bag-of-hashed-n-gram occurrence distributions p (target) and
q (raw), (2) scoring every raw doc with the importance log-weight
log w(x) = Σ_features [ln p(b) − ln q(b)], and (3) sampling without
replacement via the Gumbel-top-k trick on the log-weights.

Spark-first execution shape, sized for a 100 TB raw corpus:

* features are hashed word unigrams + bigrams into ``buckets`` int
  buckets — the distributions are two B-row tables, aggregated with one
  map-side-combined groupBy per corpus;
* the per-doc score joins occurrences against the B-row log-ratio table
  (Spark broadcasts it — B is a few thousand) and sums per doc_id: the
  only shuffle on the raw side is the O(docs) map-side-combined sum;
* log-ratios are fixed to integer MICROS before summing (the engine's
  standard cross-engine float contract, cf. operators/classify.py):
  integer sums are order-free, so the score — and the selected SET — is
  bit-identical in Spark and the DuckDB twin;
* Gumbel keys are derived from the engine's deterministic 60-bit hash of
  (doc_id, seed) — reproducible selection, no RNG state.

The reference has no data-selection layer; the operator follows the
published construction only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kartothek_spark.functions.hashing import (
    H60_MAX,
    bind_once,
    h60,
    h60_sql,
    tokens,
    tokens_sql,
)

DSIR_BUCKETS = 8192
DSIR_ALPHA = 1.0  # Laplace smoothing per bucket


def _micro(c: Column) -> Column:
    """round-to-6-decimals → integer micros, the repo's shared idiom."""
    return F.floor(F.round(c, 6) * 1000000 + F.lit(0.5)).cast("long")


def _micro_sql(expr: str) -> str:
    return f"CAST(floor(round({expr}, 6) * 1000000 + 0.5) AS BIGINT)"


def _occurrences(df: DataFrame, text_col: str, id_col: str, buckets: int) -> DataFrame:
    """(id, bucket) rows, one per hashed unigram/bigram OCCURRENCE
    (counts, not sets — DSIR features are count vectors). The feature
    array builds in one narrow per-row pass (bound token array, no
    re-tokenization per position)."""

    def feats(tk):
        uni = F.transform(tk, lambda t: F.pmod(h60(t), F.lit(buckets)))
        bi_idx = F.sequence(F.lit(0), F.size(tk) - 2)
        bi = F.when(
            F.size(tk) >= 2,
            F.transform(
                bi_idx,
                lambda i: F.pmod(h60(F.concat_ws(" ", F.slice(tk, i + 1, 2))), F.lit(buckets)),
            ),
        ).otherwise(F.array().cast("array<bigint>"))
        return F.concat(uni, bi)

    return df.select(
        F.col(id_col).alias("__id"),
        F.explode(bind_once(tokens(F.col(text_col)), feats)).alias("bucket"),
    )


def _occurrences_sql(table_sql: str, text_col: str, id_col: str) -> str:
    toks = tokens_sql(text_col)
    bigram = "__t[i + 1] || ' ' || __t[i + 2]"
    bi = (
        "CASE WHEN len(__t) >= 2 THEN list_transform(range(0, len(__t) - 1), "
        f"i -> {h60_sql(bigram)} % {{B}}) "
        "ELSE [] END"
    )
    uni = f"list_transform(__t, t -> {h60_sql('t')} % {{B}})"
    return f"""
SELECT {id_col} AS __id, unnest(list_concat({uni}, {bi})) AS bucket
FROM (SELECT {id_col}, {toks} AS __t FROM ({table_sql}))
"""


def _log_ratio(
    target_occ: DataFrame, raw_occ: DataFrame, buckets: int, alpha: float
) -> DataFrame:
    """B-row (bucket, lr_micro) table: ln p̂(b) − ln q̂(b) in integer
    micros, over the buckets the RAW corpus occupies (a raw doc can only
    score on buckets it occupies, and those are raw buckets by
    definition)."""
    # pin the B-row count tables: totals AND the ratio join read them, and
    # without the pin each reference would re-run the full corpus pass
    # (the fit is then exactly one pass per corpus, as in the paper)
    tc = (
        target_occ.groupBy("bucket")
        .agg(F.count("*").alias("tc"))
        .localCheckpoint(eager=True)
    )
    rc = (
        raw_occ.groupBy("bucket")
        .agg(F.count("*").alias("rc"))
        .localCheckpoint(eager=True)
    )
    # one action for both totals (they are tiny aggregates over the
    # checkpointed B-row tables; two separate collects pay the local
    # job-submit floor twice)
    trow = tc.agg(F.sum("tc").alias("t")).crossJoin(rc.agg(F.sum("rc").alias("r"))).collect()[0]
    tt = trow["t"] or 0
    rt = trow["r"] or 0
    return (
        rc.join(tc, "bucket", "left")
        .select(
            "bucket",
            _micro(
                F.log((F.coalesce(F.col("tc"), F.lit(0)) + alpha) / F.lit(tt + alpha * buckets))
                - F.log((F.col("rc") + alpha) / F.lit(rt + alpha * buckets))
            ).alias("lr_micro"),
        )
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = DSIR_BUCKETS,
    alpha: float = DSIR_ALPHA,
) -> DataFrame:
    """Importance log-weight per raw doc: ``(id_col, score_micro)`` with
    ``score_micro = Σ_occurrences micro(ln p̂(bucket) − ln q̂(bucket))``
    — an exact integer, order-free across engines. Token-free docs score
    0. The log-ratio table is B rows and broadcasts into the occurrence
    join; the raw corpus is read once."""
    raw_occ = _occurrences(raw, text_col, id_col, buckets)
    target_occ = _occurrences(target, text_col, id_col, buckets)
    lr = _log_ratio(target_occ, raw_occ, buckets, alpha)
    scores = (
        raw_occ.join(F.broadcast(lr), "bucket")
        .groupBy("__id")
        .agg(F.sum("lr_micro").alias("score_micro"))
    )
    return (
        raw.select(F.col(id_col).alias("__id"))
        .join(scores, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col("score_micro"), F.lit(0)).alias("score_micro"),
        )
    )


def _gumbel_micro(id_col: str, seed: int) -> Column:
    """Deterministic Gumbel(0,1) noise in micros from the engine hash of
    (id, seed): u = (h+1)/(H60_MAX+2) ∈ (0,1), g = −ln(−ln u)."""
    u = (
        h60(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))) + 1
    ).cast("double") / F.lit(float(H60_MAX + 2))
    return _micro(-F.log(-F.log(u)))


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    seed: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = DSIR_BUCKETS,
    alpha: float = DSIR_ALPHA,
) -> DataFrame:
    """Gumbel-top-k importance resampling WITHOUT replacement: the k raw
    docs maximizing ``score_micro + gumbel_micro`` (exactly the paper's
    sampler, temperature 1, on the micro'd log-weights). Deterministic
    given ``seed``; ties break on id. Output ``(id_col, score_micro,
    key_micro)`` — distributed TakeOrdered, never a global sort
    materialization."""
    w = dsir_weights(raw, target, text_col, id_col, buckets, alpha)
    return dsir_resample_from_weights(w, k, seed=seed, id_col=id_col)


def dsir_resample_from_weights(
    weights: DataFrame,
    k: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Gumbel-top-k over PRECOMPUTED ``(id_col, score_micro)`` weights —
    the weights are the expensive fit+score passes and are deterministic,
    so pipelines materialize them once and draw as many (re-seeded)
    samples as needed from the stored table."""
    keyed = weights.select(
        id_col,
        "score_micro",
        (F.col("score_micro") + _gumbel_micro(id_col, seed)).alias("key_micro"),
    )
    return keyed.orderBy(F.desc("key_micro"), F.asc(id_col)).limit(k)


def _ratio_cte(raw_sql: str, target_sql: str, text_col: str, id_col: str,
               buckets: int, alpha: float) -> str:
    raw_occ = _occurrences_sql(raw_sql, text_col, id_col).replace("{B}", str(buckets))
    tgt_occ = _occurrences_sql(target_sql, text_col, id_col).replace("{B}", str(buckets))
    lr = (
        f"ln((coalesce(tc, 0) + {alpha}) / ((SELECT count(*) FROM tocc) + {alpha} * {buckets}))"
        f" - ln((rc + {alpha}) / ((SELECT count(*) FROM rocc) + {alpha} * {buckets}))"
    )
    return f"""
rocc AS ({raw_occ}),
tocc AS ({tgt_occ}),
ratio AS (
  SELECT r.bucket, {_micro_sql(lr)} AS lr_micro
  FROM (SELECT bucket, count(*) AS rc FROM rocc GROUP BY bucket) r
  LEFT JOIN (SELECT bucket, count(*) AS tc FROM tocc GROUP BY bucket) t
  USING (bucket)
),
scores AS (
  SELECT b.{id_col}, coalesce(s.score_micro, 0) AS score_micro
  FROM (SELECT {id_col} FROM ({raw_sql})) b
  LEFT JOIN (
    -- CAST: duckdb SUM(BIGINT) yields HUGEINT, which pandas floats
    SELECT __id, CAST(SUM(lr_micro) AS BIGINT) AS score_micro
    FROM rocc JOIN ratio USING (bucket) GROUP BY __id
  ) s ON s.__id = b.{id_col}
)"""


def dsir_weights_sql(
    raw_sql: str,
    target_sql: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = DSIR_BUCKETS,
    alpha: float = DSIR_ALPHA,
) -> str:
    """DuckDB twin of :func:`dsir_weights` — same hash, same tokenizer,
    same micro contract, so the integer scores match bit-for-bit."""
    ctes = _ratio_cte(raw_sql, target_sql, text_col, id_col, buckets, alpha)
    return f"WITH {ctes}\nSELECT {id_col}, score_micro FROM scores"


def dsir_resample_sql(
    raw_sql: str,
    target_sql: str,
    k: int,
    seed: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = DSIR_BUCKETS,
    alpha: float = DSIR_ALPHA,
) -> str:
    """DuckDB twin of :func:`dsir_resample`."""
    ctes = _ratio_cte(raw_sql, target_sql, text_col, id_col, buckets, alpha)
    h = h60_sql(f"CAST({id_col} AS VARCHAR) || ':' || '{seed}'")
    u = f"CAST({h} + 1 AS DOUBLE) / {float(H60_MAX + 2)!r}"
    g = _micro_sql(f"-ln(-ln({u}))")
    return f"""WITH {ctes}
SELECT {id_col}, score_micro, score_micro + {g} AS key_micro
FROM scores
ORDER BY key_micro DESC, {id_col} ASC
LIMIT {k}
"""


__all__ = [
    "dsir_weights",
    "dsir_resample",
    "dsir_resample_from_weights",
    "dsir_weights_sql",
    "dsir_resample_sql",
]
