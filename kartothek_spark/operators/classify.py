"""Distributed linear text classification over hashed n-gram features.

The quality-filtering stage of a training-data pipeline that heuristics
(``operators/text.py:quality_features``) can't cover: a fastText-style
linear classifier — feature hashing of tokens into a fixed-width vector,
a logistic scorer, and batch-gradient training. Spark-first shape:

* **Scoring** is one explode restricted to the (broadcast) weight table:
  tokens → hashed feature index → broadcast equi-join on the
  ``n_features``-row weight table → per-doc integer sum. Weights are
  quantized to 1e-6 micros so every sum is exact int64 arithmetic —
  order-independent, therefore partitioning-independent and
  cross-engine reproducible (the fixed-point discipline the similarity
  operators use). No Python UDFs anywhere.
* **Training** follows the BPE pattern (``operators/bpe.py``): the
  distributed part per iteration is one feature-keyed aggregation
  (map-side combinable, ``n_features`` keys); the driver holds only the
  weight vector (bounded by ``n_features`` ≤ 2^20 by contract) and does
  the update arithmetic. Per-doc errors are quantized to micros before
  the gradient sum, so training is deterministic under any partitioning.
* 100 TB shape: scoring is a single pass with one narrow shuffle
  (doc-keyed partial sums combine map-side); training cost is
  ``iters`` such passes. Feature hashing bounds state regardless of
  vocabulary size; hot features (stopwords) are mergeable partials, not
  skew hazards.

No reference counterpart (the reference has no ML surface); this is a
beyond-reference operator for the LLM-pipeline layer.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kartothek_spark.functions.hashing import h60, h60_sql, tokens, tokens_sql

MICRO = 1_000_000


def hashed_features(col, n_features: int):
    """Array of hashed feature indices (one per token) for a text column."""
    return F.transform(tokens(col), lambda t: (h60(t) % n_features).cast("long"))


def hashed_features_sql(expr: str, n_features: int) -> str:
    return (
        f"list_transform({tokens_sql(expr)}, t -> {h60_sql('t')} % {n_features})"
    )


def _weights_df(spark, weights_micro: Sequence[int]):
    return spark.createDataFrame(
        list(enumerate(weights_micro)), "__feat long, __w long"
    )


def score_documents(
    df: DataFrame,
    weights_micro: Sequence[int],
    bias_micro: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Linear score per document: ``bias + Σ_tokens w[h(token) % F]`` in
    exact micro units. Returns ``(id, score_micro, predicted)`` where
    ``predicted = score_micro > 0``.

    ``weights_micro`` is the int-micro weight vector (length =
    n_features), broadcast as an ``n_features``-row table — never a plan
    literal, so a 2^20-feature model is still a small broadcast, not a
    megabyte expression tree."""
    n_features = len(weights_micro)
    if n_features == 0:
        raise ValueError("weights_micro must be non-empty")
    spark = df.sparkSession
    feats = df.select(
        F.col(id_col).alias("__id"),
        F.explode_outer(hashed_features(F.col(text_col), n_features)).alias("__feat"),
    )
    scored = (
        feats.join(F.broadcast(_weights_df(spark, weights_micro)), "__feat", "left")
        .groupBy("__id")
        .agg(
            (F.coalesce(F.sum("__w"), F.lit(0)) + F.lit(int(bias_micro))).alias(
                "score_micro"
            )
        )
    )
    return scored.select(
        F.col("__id").alias(id_col),
        "score_micro",
        (F.col("score_micro") > 0).alias("predicted"),
    )


def score_documents_sql(
    table: str,
    weights_micro: Sequence[int],
    bias_micro: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    n_features = len(weights_micro)
    values = ", ".join(f"({i}, {int(w)})" for i, w in enumerate(weights_micro))
    return f"""
WITH w(feat, wm) AS (VALUES {values}),
feats AS (
  SELECT {id_col} AS id, unnest({hashed_features_sql(text_col, n_features)}) AS feat
  FROM {table}
), scored AS (
  SELECT f.id, COALESCE(sum(w.wm), 0) + {int(bias_micro)} AS score_micro
  FROM feats f LEFT JOIN w ON f.feat = w.feat GROUP BY f.id
)
SELECT d.{id_col},
       CAST(COALESCE(s.score_micro, {int(bias_micro)}) AS BIGINT) AS score_micro,
       COALESCE(s.score_micro, {int(bias_micro)}) > 0 AS predicted
FROM {table} d LEFT JOIN scored s ON d.{id_col} = s.id
"""


def train_text_classifier(
    df: DataFrame,
    label_col: str,
    n_features: int = 4096,
    iters: int = 20,
    lr: float = 0.5,
    l2: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[list[int], int]:
    """Batch-gradient logistic regression on hashed token counts.

    Per iteration, ONE distributed pass: per-doc integer logit (broadcast
    weight join), per-doc error ``round((σ(logit) − y)·1e6)`` (micros),
    per-feature gradient = Σ docs ``err_micro · count`` — an exact int64
    feature-keyed aggregation collected as ``n_features`` rows. The
    driver applies ``w −= lr · grad / n_docs`` (plus L2) and re-quantizes
    to micros, so the whole procedure is deterministic for any
    partitioning. Returns ``(weights_micro, bias_micro)`` for
    :func:`score_documents`.

    ``n_features`` is the driver-state bound (reference-free analog of
    BPE's ``max_words``); keep it ≤ 2^20."""
    if n_features <= 0 or n_features > 1 << 20:
        raise ValueError("n_features must be in (0, 2^20]")
    base = (
        df.select(
            F.col(id_col).alias("__id"),
            F.col(label_col).cast("double").alias("__y"),
            hashed_features(F.col(text_col), n_features).alias("__f"),
        )
        .persist()
    )
    n_docs = base.count()
    if n_docs == 0:
        raise ValueError("empty training set")
    # bias rides as pseudo-feature -1 (count 1 per doc). The per-doc logit
    # is a window sum over __id — no logit->counts join-back — and counts
    # are persisted pre-partitioned on __id, so the window reuses the
    # cached partitioning every iteration. Each iteration is then ONE
    # distributed action whose only exchange is the (map-side combined,
    # <= n_features+1 keys) gradient aggregation.
    from pyspark.sql import Window

    counts = (
        base.select("__id", "__y", F.explode("__f").alias("__feat"))
        .groupBy("__id", "__y", "__feat")
        .agg(F.count("*").alias("__c"))
        .unionByName(
            base.select(
                "__id", "__y", F.lit(-1).alias("__feat"), F.lit(1).alias("__c")
            )
        )
        .repartition("__id")
        .persist()
    )
    weights = [0] * n_features
    bias = 0
    spark = df.sparkSession
    win = Window.partitionBy("__id")
    # weight lookup: inline literal array for small models (no broadcast
    # job per iteration), broadcast join above the codegen-friendly size
    inline = n_features <= 8192
    try:
        for _ in range(iters):
            if inline:
                lut = F.lit([bias] + weights)
                weighted = counts.select(
                    "__id",
                    "__y",
                    "__feat",
                    "__c",
                    F.element_at(lut, (F.col("__feat") + 2).cast("int")).alias("__w"),
                )
            else:
                wdf = F.broadcast(
                    spark.createDataFrame(
                        [(-1, bias)] + list(enumerate(weights)),
                        "__feat long, __w long",
                    )
                )
                weighted = counts.join(wdf, "__feat", "left")
            # σ(x) − y in micros; exp stays JVM-side, the rounding makes
            # everything downstream exact integers
            err = F.round(
                (
                    F.lit(1.0)
                    / (
                        F.lit(1.0)
                        + F.exp(
                            -F.sum(F.coalesce(F.col("__w"), F.lit(0)) * F.col("__c"))
                            .over(win)
                            .cast("double")
                            / F.lit(float(MICRO))
                        )
                    )
                    - F.col("__y")
                )
                * MICRO
            ).cast("long")
            grad_rows = (
                weighted.select("__feat", "__c", err.alias("__e"))
                .groupBy("__feat")
                .agg(F.sum(F.col("__e") * F.col("__c")).alias("__g"))
                .collect()
            )
            grads = {r["__feat"]: r["__g"] for r in grad_rows}
            scale = lr / n_docs
            weights = [
                int(round(w - scale * grads.get(i, 0) - lr * l2 * w))
                for i, w in enumerate(weights)
            ]
            bias = int(round(bias - scale * grads.get(-1, 0)))
    finally:
        counts.unpersist()
        base.unpersist()
    return weights, bias


__all__ = [
    "hashed_features",
    "hashed_features_sql",
    "score_documents",
    "score_documents_sql",
    "train_text_classifier",
]
