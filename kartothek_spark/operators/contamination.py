"""Benchmark decontamination: flag (or drop) training documents that
share word n-grams with a held-out evaluation set.

The standard LLM-pipeline guard (GPT-3 appendix C / PaLM / Llama style):
an eval example "contaminates" a training doc when the two share at least
one n-word shingle. At 100 TB the training side is huge but the benchmark
side is tiny (eval sets are thousands of rows), so the scale shape is:

1. distinct shingle hashes of the BENCHMARK side — a small set, collected
   into a broadcast hash relation;
2. one explode over the training side's distinct shingles, semi-joined
   (broadcast) against that set — no shuffle of the corpus, no pairwise
   comparison, cost is one scan of the training text.

Everything is the cross-engine 60-bit md5 shingle hash
(``functions/hashing.py``), so the whole operator has a value-exact
DuckDB oracle. No Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kartothek_spark.functions.hashing import (
    h60,
    h60_sql,
    shingles_from_tokens,
    tokens,
    tokens_sql,
    word_shingles_sql,
)


def _doc_shingle_hashes(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, shingle-hash) pairs, distinct per doc. Tokenization is staged
    into its own projection so the shingle lambda never re-runs the regex
    split per position (see shingles_from_tokens)."""
    return (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .select(F.col(id_col), F.explode(shingles_from_tokens(F.col("_toks"), n)).alias("_sh"))
        .select(F.col(id_col), h60(F.col("_sh")).alias("_h"))
    )


def contamination_hits(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-training-doc contamination report: ``(id, n_hits)`` where
    ``n_hits`` counts the doc's distinct n-gram shingles that also occur
    anywhere in the benchmark. Only contaminated docs (n_hits > 0) are
    returned. Benchmark shingles are deduplicated then broadcast."""
    bench_hashes = (
        _doc_shingle_hashes(benchmark, text_col, id_col, n).select("_h").distinct()
    )
    doc_hashes = _doc_shingle_hashes(train, text_col, id_col, n)
    return (
        doc_hashes.join(F.broadcast(bench_hashes), "_h")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The corpus minus contaminated docs: left-anti join of the training
    side against the hit list. No forced broadcast hint: the hit list is
    normally tiny (bounded by contamination volume) and AQE converts the
    anti join to a broadcast join at runtime when it is — but a
    pathologically contaminated corpus (or "benchmark" pointed at a
    second full corpus) must fall back to a shuffle join, not OOM the
    executors on a forced broadcast. Pinned by
    ``tests/test_plans.py::test_decontaminate_anti_join_broadcasts``."""
    hits = contamination_hits(train, benchmark, n, text_col, id_col).select(id_col)
    return train.join(hits, id_col, "left_anti")


def contamination_hits_sql(
    train_sql: str,
    benchmark_sql: str,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for contamination_hits. ``train_sql``/``benchmark_sql``
    are full SELECTs (or bare table names) producing (id, text)."""
    sh = word_shingles_sql(text_col, n)
    h = h60_sql("_sh")
    return f"""
WITH bench_h AS (
  SELECT DISTINCT {h} AS _h
  FROM (SELECT unnest({sh}) AS _sh FROM ({benchmark_sql}))
), doc_h AS (
  SELECT {id_col}, {h} AS _h
  FROM (SELECT {id_col}, unnest({sh}) AS _sh FROM ({train_sql}))
)
SELECT {id_col}, count(*) AS n_hits
FROM doc_h JOIN bench_h USING (_h)
GROUP BY {id_col}
"""


def decontaminate_sql(
    train_sql: str,
    benchmark_sql: str,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    columns: str = "*",
) -> str:
    hits = contamination_hits_sql(train_sql, benchmark_sql, n, text_col, id_col)
    return f"""
SELECT {columns} FROM ({train_sql})
WHERE {id_col} NOT IN (SELECT {id_col} FROM ({hits}))
"""


# note on tokenization reuse: tokens_sql is imported for callers that
# build custom oracle CTEs around this operator
__all__ = [
    "contamination_hits",
    "decontaminate",
    "contamination_hits_sql",
    "decontaminate_sql",
    "tokens_sql",
]
