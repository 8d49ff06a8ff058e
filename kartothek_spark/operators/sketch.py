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


# ---------------------------------------------------------------------------
# mergeable sketches: Count-Min + HyperLogLog
# ---------------------------------------------------------------------------
#
# Both sketches are DETERMINISTIC integer constructions on the engine's
# cross-engine h60 hash (the same Kirsch–Mitzenmacher double-hashing
# arithmetic the Bloom bitmap uses, verified bit-identical across
# engines there), so the sketch STATE itself has a value-exact DuckDB
# twin — unusual for "approximate" machinery, and exactly why they are
# trustworthy at 100 TB: the approximation error is a property of the
# published formula, not of this implementation.
#
# Both are mergeable (CMS cell-wise SUM, HLL register-wise MAX), which
# is what makes them the scale primitives: per-batch/per-partition
# sketches combine into the corpus sketch without ever re-reading data
# — the streaming forms in streaming/update.py ride exactly that.

_TWO32 = 4294967296

CMS_DEPTH = 4
CMS_WIDTH = 4096
HLL_P = 12  # 4096 registers, relative error ~1.04/sqrt(m) = 1.6%


def _cms_col(h, r):
    """Row-r column of hash h: (h1 + r*h2) mod width arithmetic shared
    with the Bloom bitmap (independent per row, pure int64)."""
    h1 = h % F.lit(_TWO32)
    h2 = (F.shiftright(h, 32).bitwiseOR(F.lit(1))) % F.lit(_TWO32)
    return h1 + r * h2


def cms_sketch(
    df: DataFrame,
    text_col: str = "text",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-Min sketch of the corpus' token OCCURRENCES:
    ``(row, col, cnt)``, at most depth×width cells. One narrow explode
    (depth rows per occurrence) into a map-side-combined count — the
    vocabulary never shuffles, only d·w cells do."""
    from kartothek_spark.functions.hashing import h60

    toks = df.select(F.explode(tokens(F.col(text_col))).alias("__tok"))
    h = toks.select(h60(F.col("__tok")).alias("__h"))
    rows = h.select(
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"), "__h"
    )
    return (
        rows.select("row", F.pmod(_cms_col(F.col("__h"), F.col("row")), F.lit(width)).alias("col"))
        .groupBy("row", "col")
        .agg(F.count("*").alias("cnt"))
    )


def cms_sketch_sql(
    table_sql: str,
    text_col: str = "text",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> str:
    from kartothek_spark.functions.hashing import h60_sql

    toks = tokens_sql(text_col)
    h = h60_sql("__tok")
    return f"""
WITH occ AS (
  SELECT {h} AS __h
  FROM (SELECT unnest({toks}) AS __tok FROM ({table_sql}))
), cells AS (
  SELECT r AS row,
         ((__h % {_TWO32}) + r * (((__h >> 32) | 1) % {_TWO32})) % {width} AS col
  FROM occ, range(0, {depth}) t(r)
)
SELECT row, col, count(*) AS cnt FROM cells GROUP BY row, col
"""


def cms_estimate(
    sketch: DataFrame,
    probe: DataFrame,
    token_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point estimates ``(token, est)`` for a probe token set: min over
    the sketch's depth rows (the classic CMS upper-bound estimate —
    ``est >= true count`` always, pinned by pytest). The sketch is at
    most d·w rows and broadcasts into the probe join."""
    from kartothek_spark.functions.hashing import h60

    cells = probe.select(
        F.col(token_col),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
        h60(F.col(token_col)).alias("__h"),
    ).select(
        token_col,
        "row",
        F.pmod(_cms_col(F.col("__h"), F.col("row")), F.lit(width)).alias("col"),
    )
    return (
        cells.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(token_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def cms_estimate_sql(
    sketch_sql: str,
    probe_sql: str,
    token_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> str:
    from kartothek_spark.functions.hashing import h60_sql

    h = h60_sql(token_col)
    return f"""
WITH sk AS ({sketch_sql}),
cells AS (
  SELECT {token_col}, r AS row,
         ((({h}) % {_TWO32}) + r * (((({h}) >> 32) | 1) % {_TWO32})) % {width} AS col
  FROM ({probe_sql}), range(0, {depth}) t(r)
)
SELECT {token_col}, min(coalesce(cnt, 0)) AS est
FROM cells LEFT JOIN sk USING (row, col)
GROUP BY {token_col}
"""


def merge_cms(*sketches: DataFrame) -> DataFrame:
    """CMS of a union of corpora = cell-wise sum of the sketches."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def hll_registers(
    df: DataFrame,
    text_col: str = "text",
    p: int = HLL_P,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """HyperLogLog registers over the corpus' distinct tokens, per
    group: ``(<group_cols>, bucket, rho)`` with ``rho`` = leading-zero
    rank of the hash remainder (1..61-p; computed via ``length(bin())``
    — exact integer bit-length, identical in Spark and DuckDB). MAX per
    register is idempotent and order-free, so the build is one
    map-side-combined groupBy and merge is trivially exact."""
    from kartothek_spark.functions.hashing import h60

    m = 1 << p
    toks = df.select(
        *group_cols, F.explode(tokens(F.col(text_col))).alias("__tok")
    )
    h = toks.select(*group_cols, h60(F.col("__tok")).alias("__h"))
    rest = F.expr(f"CAST(__h DIV {m} AS BIGINT)")
    bitlen = F.when(rest == 0, F.lit(0)).otherwise(F.length(F.bin(rest)))
    rho = (F.lit(60 - p) - bitlen + F.lit(1)).cast("int")
    return (
        h.select(
            *group_cols,
            F.pmod(F.col("__h"), F.lit(m)).alias("bucket"),
            rho.alias("__rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("__rho").alias("rho"))
    )


def hll_registers_sql(
    table_sql: str,
    text_col: str = "text",
    p: int = HLL_P,
    group_cols: tuple[str, ...] = (),
) -> str:
    from kartothek_spark.functions.hashing import h60_sql

    m = 1 << p
    g = ", ".join(group_cols)
    gsel = f"{g}, " if g else ""
    h = h60_sql("__tok")
    toks = tokens_sql(text_col)
    return f"""
WITH occ AS (
  SELECT {gsel}{h} AS __h
  FROM (SELECT {gsel}unnest({toks}) AS __tok FROM ({table_sql}))
), rr AS (
  SELECT {gsel}__h % {m} AS bucket,
         CAST({60 - p} - (CASE WHEN __h // {m} = 0 THEN 0
                          ELSE length(bin(__h // {m})) END) + 1 AS INT) AS __rho
  FROM occ
)
SELECT {gsel}bucket, max(__rho) AS rho FROM rr GROUP BY {g + ', ' if g else ''}bucket
"""


def hll_estimate(
    registers: DataFrame,
    p: int = HLL_P,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Cardinality estimate per group from the registers (Flajolet et
    al. 2007, with the small-range linear-counting correction). The
    harmonic sum is computed as Σ 2^(61-rho) in EXACT decimal (powers
    of two, order-free), so the estimate is a deterministic function of
    the registers and carries a value-exact SQL twin; ``est`` is
    rounded to 6 decimals (the engine's cross-engine float contract)."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    scaled = F.expr("CAST(power(2.0, 61 - rho) AS DECIMAL(38,0))")
    agg = registers.groupBy(*group_cols).agg(
        F.sum(scaled).alias("__s_present"),
        F.count("*").alias("__n_present"),
    )
    # empty registers (rho = 0) contribute 2^61 each to the scaled sum
    s = (
        F.col("__s_present").cast("double")
        + (F.lit(m) - F.col("__n_present")).cast("double") * F.lit(float(1 << 61))
    )
    raw = F.lit(alpha * m * m * float(1 << 61)) / s
    zeros = F.lit(m) - F.col("__n_present")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(*group_cols, F.round(est, 6).alias("est"))


def hll_estimate_sql(
    registers_sql: str,
    p: int = HLL_P,
    group_cols: tuple[str, ...] = (),
) -> str:
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # single pre-combined float literals (repr keeps them DOUBLE in
    # DuckDB — bare decimal literals there are DECIMAL and overflow)
    num = alpha * m * m * float(1 << 61)
    scale = float(1 << 61)
    g = ", ".join(group_cols)
    gsel = f"{g}, " if g else ""
    gby = f"GROUP BY {g}" if g else ""
    raw = f"({num!r} / (s_present + ({m} - n_present) * {scale!r}))"
    return f"""
WITH agg AS (
  SELECT {gsel}
         CAST(sum(CAST(power(2.0, 61 - rho) AS DECIMAL(38,0))) AS DOUBLE) AS s_present,
         count(*) AS n_present
  FROM ({registers_sql}) {gby}
)
SELECT {gsel}
       round(CASE WHEN {raw} <= {2.5 * m!r} AND ({m} - n_present) > 0
             THEN {float(m)!r} * ln({float(m)!r} / ({m} - n_present))
             ELSE {raw}
             END, 6) AS est
FROM agg
"""


def merge_hll(*register_sets: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """HLL of a union of corpora = register-wise max."""
    out = register_sets[0]
    for s in register_sets[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "bucket").agg(F.max("rho").alias("rho"))
