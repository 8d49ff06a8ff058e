"""Frequency-sketch operators: distributed heavy hitters.

``heavy_hitters`` finds every token occurring more than ``total/k``
times via the two-pass sketch-then-verify pattern this engine uses for
all approximate machinery (LSH → exact Jaccard, banding → exact cosine):

1. per-partition Misra–Gries with capacity ``k`` inside ``mapInPandas``
   — O(k) state per task regardless of vocabulary size. MG's guarantee:
   any item with global frequency > total/k survives in at least one
   partition's summary, so the union of summaries is a SUPERSET of the
   true heavy hitters (never a miss).
2. exact recount of the (≤ k × partitions) candidates — the corpus
   streams once more through a broadcast semi-join, and the exact
   ``count·k > total`` filter drops every false candidate.

The output is therefore EXACTLY the true heavy-hitter set with exact
counts — SQL-oracle-able — while shuffle volume stays O(candidates),
never O(vocabulary). At 100 TB the vocabulary (trillions of distinct
shingles/urls/ids) is the thing you cannot afford to groupBy; k·P
candidates fit in a broadcast.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kartothek_spark.functions.hashing import tokens, tokens_sql


def heavy_hitters(
    df: DataFrame, k: int = 50, text_col: str = "text"
) -> DataFrame:
    """Every token with global frequency > total_tokens/k, with exact
    counts — ``(token, n_occurrences)``."""
    toks = df.select(F.explode(tokens(F.col(text_col))).alias("token"))

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # classic Misra–Gries across the whole partition: ≤ k counters,
        # decrement-all when full; presence guaranteed for freq > n/k
        counters: dict[str, int] = {}
        for pdf in batches:
            for v in pdf["token"]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    dead = [key for key in counters if counters[key] == 1]
                    for key in counters:
                        counters[key] -= 1
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"token": list(counters.keys())})

    candidates = toks.mapInPandas(mg, "token string").distinct()

    # pass 2: exact recount of the candidates only (broadcast semi-join)
    # and the exact global total from the same relation — no
    # vocabulary-wide shuffle anywhere
    counted = (
        toks.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
    )
    total_row = toks.agg(F.count("*").alias("__total"))
    return (
        counted.crossJoin(F.broadcast(total_row))
        .where(F.col("n_occurrences") * k > F.col("__total"))
        .select("token", "n_occurrences")
    )


def heavy_hitters_sql(table: str, k: int = 50, text_col: str = "text") -> str:
    toks = tokens_sql(text_col)
    return f"""
WITH t AS (SELECT unnest({toks}) AS token FROM {table}),
tot AS (SELECT count(*) AS n FROM t)
SELECT token, count(*) AS n_occurrences
FROM t CROSS JOIN tot
GROUP BY token, tot.n
HAVING count(*) * {k} > tot.n
"""
