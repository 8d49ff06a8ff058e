"""Corpus-assembly operators for training-data pipelines: deterministic
sampling, weighted source mixture, quality filtering, and corpus stats.

Everything here is pure DataFrame algebra on the cross-engine 60-bit md5
hash (``functions/hashing.py``), so every operator ships a value-exact
DuckDB oracle and every decision is reproducible run-to-run — the
property a training pipeline needs so that re-running corpus assembly
yields the same corpus (no ``rand()``, which would also break Spark task
retries: a recomputed partition would sample different rows).

Scale design: sampling and mixture are stateless per-row hash
comparisons — no shuffle, no state, trivially parallel at any corpus
size; the filter sits directly on the scan so column pruning and
predicate pushdown still apply to everything downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kartothek_spark.functions.hashing import h60, h60_sql, tokens, tokens_sql
from kartothek_spark.operators.text import quality_features, quality_features_sql

# hash-threshold denominator: rates are quantized to 1e-6, matching the
# integer threshold on both engines exactly
_DENOM = 1_000_000


def _keep(key: Column, rate: float, salt: str) -> Column:
    """Deterministic keep-decision: hash(salt:key) lands under the rate
    threshold. Quantized to 1/1e6 so Spark and SQL agree exactly."""
    thr = int(round(rate * _DENOM))
    return (h60(F.concat(F.lit(salt + ":"), key.cast("string"))) % _DENOM) < thr


def _keep_sql(key_expr: str, rate: float, salt: str) -> str:
    thr = int(round(rate * _DENOM))
    h = h60_sql(f"'{salt}:' || CAST({key_expr} AS VARCHAR)")
    return f"({h} % {_DENOM}) < {thr}"


def sample_corpus(
    df: DataFrame, rate: float, key_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Deterministic Bernoulli sample keyed on a stable id: the same
    (salt, key) always makes the same keep/drop decision, independent of
    partitioning, task retries, or cluster size."""
    return df.where(_keep(F.col(key_col), rate, salt))


def sample_corpus_sql(
    table: str, rate: float, key_col: str = "doc_id", salt: str = "sample", columns: str = "*"
) -> str:
    return f"SELECT {columns} FROM {table} WHERE {_keep_sql(key_col, rate, salt)}"


def mix_corpus(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Weighted source mixture: per-source deterministic sampling rates
    (the "data mixing" step of corpus assembly — e.g. keep 100% of wiki,
    10% of crawl). Sources absent from ``weights`` are dropped; a weight
    of 1.0 keeps a source whole. One stateless hash comparison per row —
    no shuffle, no per-source scans."""
    rate = None
    for src, w in sorted(weights.items()):
        cond = F.col(source_col) == src
        rate = F.when(cond, F.lit(float(w))) if rate is None else rate.when(cond, F.lit(float(w)))
    rate = rate.otherwise(F.lit(0.0))
    thr = F.floor(rate * _DENOM + F.lit(0.5)).cast("long")
    h = h60(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
    return df.where((h % _DENOM) < thr)


def mix_corpus_sql(
    table: str,
    weights: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix",
    columns: str = "*",
) -> str:
    cases = " ".join(
        f"WHEN {source_col} = '{src}' THEN {int(round(float(w) * _DENOM))}"
        for src, w in sorted(weights.items())
    )
    thr = f"CASE {cases} ELSE 0 END"
    h = h60_sql(f"'{salt}:' || CAST({key_col} AS VARCHAR)")
    return f"SELECT {columns} FROM {table} WHERE ({h} % {_DENOM}) < ({thr})"


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_chars: int = 50,
    min_mean_token_len: float = 2.0,
    min_alpha_ratio: float = 0.5,
) -> DataFrame:
    """C4-style heuristic quality gate: drop too-short, too-noisy, or
    non-linguistic rows. Thresholds compare the same rounded features the
    scoring operator emits, so filter and score never disagree."""
    feats = quality_features(text_col)
    return df.where(
        (feats["n_chars"] >= min_chars)
        & (feats["mean_token_len"] >= min_mean_token_len)
        & (feats["alpha_ratio"] >= min_alpha_ratio)
    )


def quality_filter_sql(
    table: str,
    text_col: str = "text",
    min_chars: int = 50,
    min_mean_token_len: float = 2.0,
    min_alpha_ratio: float = 0.5,
    columns: str = "*",
) -> str:
    feats = quality_features_sql(text_col)
    return (
        f"SELECT {columns} FROM {table} "
        f"WHERE {feats['n_chars']} >= {min_chars} "
        f"AND {feats['mean_token_len']} >= {min_mean_token_len} "
        f"AND {feats['alpha_ratio']} >= {min_alpha_ratio}"
    )


def corpus_stats(
    df: DataFrame, text_col: str = "text", lang_col: str = "lang", source_col: str = "source"
) -> DataFrame:
    """Per-language corpus rollup: doc/source counts and exact token/char
    totals — the sanity dashboard run after every assembly step. All-integer
    outputs, map-side combinable."""
    from kartothek_spark.functions.hashing import tokens

    n_tok = F.size(tokens(F.col(text_col))).cast("long")
    return df.groupBy(lang_col).agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(source_col).alias("n_sources"),
        F.sum(n_tok).alias("total_tokens"),
        F.sum(F.length(text_col).cast("long")).alias("total_chars"),
    )


def corpus_stats_sql(
    table: str, text_col: str = "text", lang_col: str = "lang", source_col: str = "source"
) -> str:
    from kartothek_spark.functions.hashing import tokens_sql

    toks = tokens_sql(text_col)
    return f"""
SELECT {lang_col},
       count(*) AS n_docs,
       count(DISTINCT {source_col}) AS n_sources,
       CAST(sum(len({toks})) AS BIGINT) AS total_tokens,
       CAST(sum(length({text_col})) AS BIGINT) AS total_chars
FROM {table} GROUP BY {lang_col}
"""


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    approx_accuracy: int | None = None,
) -> DataFrame:
    """Per-group quantiles of a numeric column — the length/score
    distribution dashboard behind every filter-threshold decision.

    Default (``approx_accuracy=None``) is Spark's EXACT ``percentile``
    (linear interpolation, value-identical to DuckDB's ``quantile_cont``
    — the gate hash-checks it). Exact percentile buffers each group's
    values in the aggregation state, so its contract is bounded per-group
    cardinality (fine for per-source doc stats at any corpus size ONLY
    when sampled/rolled up first). For unbounded groups at corpus scale
    pass ``approx_accuracy`` (e.g. 10000) to switch to
    ``percentile_approx`` — bounded state per group, no SQL twin
    (approximation is engine-specific), pytest-pinned instead."""
    if approx_accuracy is None:
        agg = F.percentile(value_col, F.lit(list(probs)))
    else:
        agg = F.percentile_approx(value_col, F.lit(list(probs)), F.lit(approx_accuracy))
    q = df.groupBy(group_col).agg(agg.alias("__q"))
    return q.select(
        group_col,
        *[
            F.round(F.col("__q")[i], 6).alias(f"p{round(p * 100)}")
            for i, p in enumerate(probs)
        ],
    )


def group_quantiles_sql(
    table: str,
    group_col: str,
    value_col: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
) -> str:
    cols = ", ".join(
        f"round(quantile_cont({value_col}, {p}), 6) AS p{round(p * 100)}" for p in probs
    )
    return f"SELECT {group_col}, {cols} FROM {table} GROUP BY {group_col}"


def upsample_corpus(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "epoch",
) -> DataFrame:
    """Weighted mixture with UPSAMPLING: weights above 1 repeat documents
    (the "epochs per source" knob of LLM training mixes — e.g. wiki x2.5,
    crawl x0.4). A weight w emits floor(w) full copies plus one more copy
    kept with probability frac(w), decided by a deterministic per-(doc,
    copy) hash — so the realized token mix converges to the weights and
    re-runs are identical. Output adds an ``epoch`` column (0-based copy
    index). Zero shuffle: one generate + one hash compare per row."""
    rate = None
    for src, w in sorted(weights.items()):
        if w < 0:
            raise ValueError(f"negative weight for {src}")
        cond = F.col(source_col) == src
        rate = F.when(cond, F.lit(float(w))) if rate is None else rate.when(cond, F.lit(float(w)))
    rate = rate.otherwise(F.lit(0.0))
    thr = F.floor(rate * _DENOM + F.lit(0.5)).cast("long")  # weight in 1e-6 quanta
    df = df.withColumn("_thr", thr).where(F.col("_thr") > 0)
    # copies 0..ceil(w)-1; copy i survives iff i*1e6 + hash-draw < w*1e6
    n_copies = F.ceil(F.col("_thr").cast("double") / _DENOM).cast("int")
    df = df.withColumn("epoch", F.explode(F.sequence(F.lit(0), n_copies - 1)))
    h = h60(
        F.concat(
            F.lit(salt + ":"),
            F.col(key_col).cast("string"),
            F.lit(":"),
            F.col("epoch").cast("string"),
        )
    )
    keep = (F.col("epoch").cast("long") * _DENOM + (h % _DENOM)) < F.col("_thr")
    return df.where(keep).drop("_thr")


def upsample_corpus_sql(
    table: str,
    weights: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "epoch",
    columns: str = "*",
) -> str:
    cases = " ".join(
        f"WHEN {source_col} = '{src}' THEN {int(round(float(w) * _DENOM))}"
        for src, w in sorted(weights.items())
    )
    thr = f"CASE {cases} ELSE 0 END"
    h = h60_sql(f"'{salt}:' || CAST({key_col} AS VARCHAR) || ':' || CAST(epoch AS VARCHAR)")
    return f"""
SELECT {columns}, epoch FROM (
  SELECT *, CAST(unnest(range(0, CAST(ceil(CAST(_thr AS DOUBLE) / {_DENOM}) AS BIGINT))) AS INTEGER) AS epoch
  FROM (SELECT *, {thr} AS _thr FROM {table}) WHERE _thr > 0
)
WHERE CAST(epoch AS BIGINT) * {_DENOM} + ({h} % {_DENOM}) < _thr
"""


def pack_corpus(
    df: DataFrame,
    budget_tokens: int,
    shards: int = 64,
    text_col: str = "text",
    key_col: str = "doc_id",
    salt: str = "pack",
) -> DataFrame:
    """Sequence packing: assign documents to fixed-token-budget bins (the
    step that turns a filtered corpus into training sequences). Contiguous
    greedy packing inside deterministic hash shards:

    * shard = h60(doc) % shards — docs spread evenly, assignment stable
      under reruns/repartitioning/corpus growth within a shard count;
    * inside a shard, docs are laid out in (hash, id) order and the
      running token total is cut every ``budget_tokens`` — a doc belongs
      to the bin its first token lands in;
    * ``bin_id = shard * 2^32 + local bin`` is globally unique.

    Scale shape: ONE shuffle (hash partition by shard) and a per-shard
    window — each shard's window state is a running sum, so 100 TB packs
    with shards sized to executor count, no global sort, no driver state.
    Outputs (id, shard, bin_id, n_tokens, bin_offset).
    """
    from pyspark.sql import Window

    from kartothek_spark.operators.text import bpe_token_count

    h = h60(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
    base = df.select(
        F.col(key_col),
        bpe_token_count(F.col(text_col)).alias("n_tokens"),
        (h % shards).alias("shard"),
        h.alias("_h"),
    )
    w = Window.partitionBy("shard").orderBy("_h", key_col)
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).cast("long")
    local_bin = F.floor(start / F.lit(budget_tokens)).cast("long")
    return base.select(
        key_col,
        "shard",
        (F.col("shard") * F.lit(1 << 32) + local_bin).alias("bin_id"),
        "n_tokens",
        (start - local_bin * budget_tokens).alias("bin_offset"),
    )


def pack_corpus_sql(
    table: str,
    budget_tokens: int,
    shards: int = 64,
    text_col: str = "text",
    key_col: str = "doc_id",
    salt: str = "pack",
) -> str:
    from kartothek_spark.operators.text import bpe_token_count_sql

    h = h60_sql(f"'{salt}:' || CAST({key_col} AS VARCHAR)")
    ntok = bpe_token_count_sql(text_col)
    return f"""
WITH base AS (
  SELECT {key_col}, {ntok} AS n_tokens, ({h}) % {shards} AS shard, {h} AS _h
  FROM {table}
), cum AS (
  SELECT {key_col}, shard, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY _h, {key_col}
                                  ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start
  FROM base
)
SELECT {key_col}, shard,
       shard * {1 << 32} + CAST(floor(CAST(start AS DOUBLE) / {budget_tokens}) AS BIGINT) AS bin_id,
       n_tokens,
       start - CAST(floor(CAST(start AS DOUBLE) / {budget_tokens}) AS BIGINT) * {budget_tokens} AS bin_offset
FROM cum
"""


def split_corpus(
    df: DataFrame,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/valid/test assignment: each row gets exactly
    one split label from contiguous hash ranges (fractions quantized to
    1e-6 and assigned in sorted-name order, so the mapping is stable
    across runs, partitionings, and engines). Fractions must sum to 1
    within quantization. Zero shuffle — one hash comparison chain per
    row — and adding MORE data never moves an existing row's split
    (the hash only depends on the key)."""
    quanta = {name: int(round(f * _DENOM)) for name, f in sorted(fractions.items())}
    total = sum(quanta.values())
    if total != _DENOM:
        raise ValueError(f"fractions must sum to 1 (got {total / _DENOM})")
    h = h60(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))) % _DENOM
    expr = None
    hi = 0
    for name, q in quanta.items():
        hi += q
        cond = h < hi
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn("split", expr)


def split_corpus_sql(
    table: str,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "split",
    columns: str = "*",
) -> str:
    quanta = {name: int(round(f * _DENOM)) for name, f in sorted(fractions.items())}
    h = h60_sql(f"'{salt}:' || CAST({key_col} AS VARCHAR)")
    cases, hi = [], 0
    for name, q in quanta.items():
        hi += q
        cases.append(f"WHEN ({h} % {_DENOM}) < {hi} THEN '{name}'")
    return f"SELECT {columns}, CASE {' '.join(cases)} END AS split FROM {table}"


def chunk_corpus(
    df: DataFrame,
    chunk_tokens: int = 512,
    overlap: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-token-budget chunks with overlap — the
    RAG / long-context preparation step between cleaning and embedding.

    Sliding windows over the whitespace token stream: chunk ``i`` covers
    tokens ``[i·step, i·step + chunk_tokens)`` with ``step = chunk_tokens
    − overlap``; the final chunk may be short, and a document shorter
    than one chunk yields exactly one chunk. Chunk text is whitespace-
    normalized (single-space joined tokens) — deterministic and
    reconstruction-stable, which is what makes the exact DuckDB twin
    possible. Zero shuffle: tokenize → one ``explode`` of the precomputed
    start offsets → ``slice``; the token array is built once per row
    (never per chunk).

    Output: ``(doc_id, chunk_id, n_tokens, chunk_text)`` with ``chunk_id``
    dense from 0 in document order."""
    if overlap >= chunk_tokens:
        raise ValueError(f"overlap {overlap} must be < chunk_tokens {chunk_tokens}")
    step = chunk_tokens - overlap
    base = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__t"))
    )
    # the last start is bounded at size - overlap - 1: a later start would
    # produce a chunk made entirely of tokens the previous chunk already
    # covers (e.g. chunk_tokens=128, overlap=32, n=97 must yield ONE chunk,
    # not a second chunk of pure overlap)
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("__t") - overlap - 1, F.lit(0)), F.lit(step)
    )
    return (
        base.select("doc_id", "__t", F.explode(starts).alias("__s"))
        .select(
            "doc_id",
            (F.col("__s") / step).cast("long").alias("chunk_id"),
            F.slice(F.col("__t"), F.col("__s") + 1, chunk_tokens).alias("__c"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.size("__c").cast("long").alias("n_tokens"),
            F.concat_ws(" ", "__c").alias("chunk_text"),
        )
    )


def chunk_corpus_sql(
    table: str,
    chunk_tokens: int = 512,
    overlap: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`chunk_corpus` (value-exact)."""
    step = chunk_tokens - overlap
    toks = tokens_sql(text_col)
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id, {toks} AS t FROM {table} WHERE {text_col} IS NOT NULL
), starts AS (
  SELECT doc_id, t, unnest(range(0, greatest(len(t) - {overlap} - 1, 0) + 1, {step})) AS s
  FROM base
)
SELECT doc_id, CAST(s // {step} AS BIGINT) AS chunk_id,
       CAST(len(list_slice(t, s + 1, s + {chunk_tokens})) AS BIGINT) AS n_tokens,
       array_to_string(list_slice(t, s + 1, s + {chunk_tokens}), ' ') AS chunk_text
FROM starts
"""


def stratified_sample(
    df: DataFrame,
    group_col: str,
    quota: int,
    id_col: str = "doc_id",
    salt: str = "stratified",
) -> DataFrame:
    """Per-group quota sampling: keep the ``quota`` hash-smallest rows of
    every group — the per-SOURCE counterpart of the semantic
    :func:`~kartothek_spark.operators.similarity.diversity_sample`.
    Deterministic and growth-stable (a new row can only displace the
    current hash-largest survivor of its own group).

    TWO-PHASE plan (mega-group-proof): a single rank window keyed on the
    group would serialize an entire group through one task — with one
    source at 95% of a 100 TB corpus, that task sorts billions of rows to
    keep ``quota``. Instead phase 1 windows over (group, hash-shard),
    keeping the quota hash-smallest per shard (the full-data shuffle is
    the same volume as the naive plan, just on a balanced key), and
    phase 2 runs the final rank window over the ≤ shards×quota surviving
    candidates per group. Every global winner is among its own shard's
    quota smallest, so the output is EXACTLY the single-window selection
    — the SQL twin is unchanged."""
    return _two_phase_quota(
        df,
        group_cols=[group_col],
        quota=quota,
        h=h60(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
        id_col=id_col,
    )


def _two_phase_quota(
    df: DataFrame,
    group_cols: list[str],
    quota: int,
    h,
    id_col: str,
    shards: int = 64,
) -> DataFrame:
    """Keep the ``quota`` (h, id)-smallest rows per group, two-phase."""
    from pyspark.sql import Window

    w1 = Window.partitionBy(*group_cols, "__shard").orderBy(F.asc("__h"), F.asc(id_col))
    w2 = Window.partitionBy(*group_cols).orderBy(F.asc("__h"), F.asc(id_col))
    return (
        df.withColumn("__h", h)
        .withColumn("__shard", F.pmod(F.col("__h"), F.lit(shards)))
        .withColumn("__rn", F.row_number().over(w1))
        .where(F.col("__rn") <= quota)
        .withColumn("__rn", F.row_number().over(w2))
        .where(F.col("__rn") <= quota)
        .drop("__h", "__shard", "__rn")
    )


def stratified_sample_sql(
    table: str,
    group_col: str,
    quota: int,
    id_col: str = "doc_id",
    salt: str = "stratified",
    columns: str = "*",
) -> str:
    h = h60_sql(f"'{salt}:' || CAST({id_col} AS VARCHAR)")
    return f"""
SELECT {columns} FROM (
  SELECT *, row_number() OVER (PARTITION BY {group_col} ORDER BY {h} ASC, {id_col} ASC) AS rn
  FROM {table}
) WHERE rn <= {quota}
"""


def cap_per_group(
    df: DataFrame,
    group_col: str,
    max_n: int,
    score_col: str,
    id_col: str = "doc_id",
    shards: int = 64,
) -> DataFrame:
    """Per-group cap: keep the ``max_n`` best rows of every group by
    (score DESC, id ASC) — the per-domain/per-source quota rule of web
    curation pipelines ("at most N pages per domain, best-quality
    first"). Unlike :func:`stratified_sample` (hash-uniform draw), the
    survivors are the score-ranked TOP of each group.

    TWO-PHASE mega-group-proof plan, same argument as stratified_sample:
    phase 1 windows over (group, id-hash shard), keeping each shard's
    ``max_n`` best; every global winner is among its own shard's best
    ``max_n``, so phase 2's final window ranks ≤ shards×max_n candidates
    per group and produces EXACTLY the single-window selection the SQL
    twin states."""
    from pyspark.sql import Window

    order = [F.desc(score_col), F.asc(id_col)]
    w1 = Window.partitionBy(group_col, "__shard").orderBy(*order)
    w2 = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("__shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards)))
        .withColumn("__rn", F.row_number().over(w1))
        .where(F.col("__rn") <= max_n)
        .withColumn("__rn", F.row_number().over(w2))
        .where(F.col("__rn") <= max_n)
        .drop("__shard", "__rn")
    )


def cap_per_group_sql(
    table: str,
    group_col: str,
    max_n: int,
    score_col: str,
    id_col: str = "doc_id",
    columns: str = "*",
) -> str:
    return f"""
SELECT {columns} FROM (
  SELECT *, row_number() OVER (
    PARTITION BY {group_col} ORDER BY {score_col} DESC, {id_col} ASC) AS rn
  FROM {table}
) WHERE rn <= {max_n}
"""


def mixture_sample(
    df: DataFrame,
    group_col: str,
    total: int,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    salt: str = "mixture",
) -> DataFrame:
    """Temperature-weighted source mixing — the standard LLM data-recipe
    step (multinomial source sampling with temperature, the up/down-
    weighting rule of the GPT/LLaMA data mixes): each group's quota is
    ``total * n_g^alpha / Σ n^alpha`` (``alpha=1`` proportional,
    ``alpha=0`` uniform, between = small sources up-weighted), floored in
    EXACT integer arithmetic over micro-unit weights so engines agree,
    clamped to ``[1, n_g]``; within a group the quota hash-smallest rows
    win (deterministic and growth-stable, as in
    :func:`stratified_sample`).

    Plan: the per-group quota table is tiny (one row per source) and
    broadcast onto the corpus; selection is the same two-phase
    (group, hash-shard) window cascade as ``stratified_sample``, so a
    95%-of-corpus source never serializes through one task. Σ quotas can
    undershoot ``total`` by at most the group count (floor + clamps) —
    the recipe cares about the RATIOS, which the floor preserves."""
    from pyspark.sql import Window

    if total <= 0:
        raise ValueError(f"total must be positive, got {total}")
    # micro-unit integer weights: round(n^alpha * 1e6) — past this one
    # rounding, quota arithmetic is exact BIGINT (cross-engine stable)
    counts = df.groupBy(group_col).agg(F.count("*").alias("__n"))
    weights = counts.select(
        group_col,
        "__n",
        F.round(F.pow(F.col("__n").cast("double"), F.lit(float(alpha))) * 1e6)
        .cast("long")
        .alias("__w"),
    )
    quotas = (
        # NB: the sum's alias must not collide case-insensitively with
        # "__w" — Spark and DuckDB both resolve column names case-
        # insensitively, so withColumn("__W") would silently REPLACE __w
        weights.withColumn("__wsum", F.sum("__w").over(Window.partitionBy()))
        .select(
            group_col,
            F.least(
                F.col("__n"),
                F.greatest(
                    F.lit(1).cast("long"),
                    F.expr(f"(CAST({int(total)} AS BIGINT) * __w) DIV __wsum"),
                ),
            ).alias("__quota"),
        )
    )
    h = h60(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    shards = 64
    w1 = Window.partitionBy(group_col, "__shard").orderBy(F.asc("__h"), F.asc(id_col))
    w2 = Window.partitionBy(group_col).orderBy(F.asc("__h"), F.asc(id_col))
    return (
        df.join(F.broadcast(quotas), group_col)
        .withColumn("__h", h)
        .withColumn("__shard", F.pmod(F.col("__h"), F.lit(shards)))
        .withColumn("__rn", F.row_number().over(w1))
        .where(F.col("__rn") <= F.col("__quota"))
        .withColumn("__rn", F.row_number().over(w2))
        .where(F.col("__rn") <= F.col("__quota"))
        .drop("__h", "__shard", "__rn", "__quota")
    )


def mixture_sample_sql(
    table: str,
    group_col: str,
    total: int,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    salt: str = "mixture",
    columns: str = "*",
) -> str:
    h = h60_sql(f"'{salt}:' || CAST({id_col} AS VARCHAR)")
    return f"""
SELECT {columns} FROM (
  SELECT t.*, row_number() OVER (
           PARTITION BY t.{group_col} ORDER BY {h} ASC, t.{id_col} ASC
         ) AS rn,
         q.quota
  FROM {table} t
  JOIN (
    SELECT {group_col},
           least(n, greatest(1, (CAST({int(total)} AS BIGINT) * w) // wsum)) AS quota
    FROM (
      SELECT {group_col}, n, w, sum(w) OVER () AS wsum
      FROM (
        SELECT {group_col}, count(*) AS n,
               CAST(round(pow(CAST(count(*) AS DOUBLE), {float(alpha)}) * 1e6) AS BIGINT) AS w
        FROM {table} GROUP BY {group_col}
      )
    )
  ) q USING ({group_col})
) WHERE rn <= quota
"""


def token_budget_sample(
    df: DataFrame,
    group_col: str,
    total_tokens: int,
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "tokbudget",
) -> DataFrame:
    """Temperature-weighted source mixing by TOKEN budget — data recipes
    are specified in tokens, not document counts, and doc-count quotas
    (:func:`mixture_sample`) over-weight short-doc sources. Each group's
    token budget is ``total_tokens * T_g^alpha / Σ T^alpha`` (T_g = the
    group's token total; same exact micro-unit integer arithmetic as
    ``mixture_sample``, clamped ≥ 1), and within a group documents are
    taken in deterministic hash order until the budget is reached — a
    doc is kept iff the token sum of the docs BEFORE it is still under
    budget, so the crossing document is included and every non-empty
    group keeps at least one doc. Growth-stable like every hash-ordered
    selection here: new corpus rows only displace from the tail.

    Scale shape: the per-group budget table is tiny and broadcast. The
    prefix sum does NOT run as one per-group ordered window (a
    95%-of-corpus source would serialize through one task): documents
    shard by the TOP bits of the selection hash (shard order == hash
    order), each (group, shard) computes its local running sum, and a
    per-(group, shard) boundary carry — the same tiny-spine pattern as
    the keyless as-of join and the salted window — converts local sums
    to global prefix sums exactly. Value-identical to the single-window
    form (integer token counts; pinned by
    ``tests/test_operators.py::test_token_budget_sample``)."""
    from pyspark.sql import Window

    from kartothek_spark.operators.text import token_count

    if total_tokens <= 0:
        raise ValueError(f"total_tokens must be positive, got {total_tokens}")
    toks = df.withColumn("__tok", token_count(F.col(text_col)))
    weights = toks.groupBy(group_col).agg(
        F.sum("__tok").alias("__T")
    ).select(
        group_col,
        F.round(F.pow(F.col("__T").cast("double"), F.lit(float(alpha))) * 1e6)
        .cast("long")
        .alias("__w"),
    )
    budgets = weights.withColumn(
        "__wsum", F.sum("__w").over(Window.partitionBy())
    ).select(
        group_col,
        F.greatest(
            F.lit(1).cast("long"),
            F.expr(f"(CAST({int(total_tokens)} AS BIGINT) * __w) DIV __wsum"),
        ).alias("__budget"),
    )
    h = h60(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    # 64 shards by the hash's TOP 6 bits (h60 is 60-bit): shard index
    # increases with h, so cross-shard order == global hash order
    base = (
        toks.join(F.broadcast(budgets), group_col)
        .withColumn("__h", h)
        .withColumn("__shard", F.shiftright(F.col("__h"), 54).cast("int"))
    )
    shard_sums = base.groupBy(group_col, "__shard").agg(
        F.sum("__tok").alias("__ss")
    )
    wc = (
        Window.partitionBy(group_col)
        .orderBy(F.asc("__shard"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = shard_sums.select(
        group_col,
        "__shard",
        F.coalesce(F.sum("__ss").over(wc), F.lit(0)).alias("__carry"),
    )
    win = (
        Window.partitionBy(group_col, "__shard")
        .orderBy(F.asc("__h"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        base.join(F.broadcast(carry), [group_col, "__shard"])
        .withColumn(
            "__before", F.col("__carry") + F.coalesce(F.sum("__tok").over(win), F.lit(0))
        )
        .where(F.col("__before") < F.col("__budget"))
        .drop("__tok", "__h", "__shard", "__budget", "__carry", "__before")
    )


def token_budget_sample_sql(
    table: str,
    group_col: str,
    total_tokens: int,
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "tokbudget",
    columns: str = "*",
) -> str:
    """DuckDB twin of :func:`token_budget_sample` — the plain
    single-window prefix sum (the sharded carry promises value
    identity)."""
    from kartothek_spark.operators.text import token_count_sql

    h = h60_sql(f"'{salt}:' || CAST({id_col} AS VARCHAR)")
    tok = token_count_sql(text_col)
    return f"""
SELECT {columns} FROM (
  SELECT t.*, b.budget,
         coalesce(sum({tok}) OVER (
           PARTITION BY t.{group_col} ORDER BY {h} ASC, t.{id_col} ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS before_toks
  FROM {table} t
  JOIN (
    SELECT {group_col},
           greatest(1, (CAST({int(total_tokens)} AS BIGINT) * w) // wsum) AS budget
    FROM (
      SELECT {group_col}, w, sum(w) OVER () AS wsum
      FROM (
        SELECT {group_col},
               CAST(round(pow(CAST(sum({tok}) AS DOUBLE), {float(alpha)}) * 1e6) AS BIGINT) AS w
        FROM {table} GROUP BY {group_col}
      )
    )
  ) b USING ({group_col})
) WHERE before_toks < budget
"""


def shard_corpus(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shard",
    shuffle_within: bool = True,
) -> DataFrame:
    """Deterministic balanced sharding for training export: assign every
    row a ``shard`` in ``[0, n_shards)`` by content-independent id hash,
    and (optionally) a stable pseudo-random ``shard_pos`` order within the
    shard — the "global shuffle" a training run needs, without a global
    sort. Rows land in the same shard on every run, at any parallelism,
    under any partitioning of the input (the hash is the assignment), so
    an export is reproducible and resumable per shard.

    Plan: pure projection + ONE shuffle keyed by the (uniform) hash shard
    — balanced by construction, no skew, no global ordering stage. Write
    the result with ``df.repartition(n_shards, "shard").
    sortWithinPartitions("shard_pos").write...`` for one file per shard at
    any scale.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    h = h60(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    out = df.withColumn("shard", F.pmod(h, F.lit(n_shards)).cast("long"))
    if shuffle_within:
        # an independent hash (different salt) so within-shard order is
        # uncorrelated with the shard assignment
        pos = h60(F.concat(F.lit(salt + "#pos:"), F.col(id_col).cast("string")))
        out = out.withColumn("shard_pos", pos)
    return out


def shard_corpus_sql(
    table: str,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shard",
    columns: str = "*",
) -> str:
    """DuckDB twin of :func:`shard_corpus` (shuffle_within included)."""
    h = h60_sql(f"'{salt}:' || CAST({id_col} AS VARCHAR)")
    pos = h60_sql(f"'{salt}#pos:' || CAST({id_col} AS VARCHAR)")
    return (
        f"SELECT {columns}, CAST(({h}) % {n_shards} AS BIGINT) AS shard, "
        f"{pos} AS shard_pos FROM {table}"
    )


# ---------------------------------------------------------------------------
# sentence-aware chunking
# ---------------------------------------------------------------------------

# sentence boundary = terminator run [.!?…] followed by whitespace; the
# split itself inserts \x01 AFTER the terminator and splits on it, so the
# terminator stays attached to its sentence. A lookbehind would be the
# natural regex, but the DuckDB twin runs RE2 (no lookbehind) — the
# marker-insertion form is expressible identically in both engines.
_SENT_MARK = "\x01"


def _sentences(c: Column) -> Column:
    marked = F.regexp_replace(c, r"([.!?…]+)\s+", "$1" + _SENT_MARK)
    return F.filter(
        F.transform(F.split(marked, _SENT_MARK), lambda s: F.trim(s)),
        lambda s: s != F.lit(""),
    )


def _sentences_sql(expr: str) -> str:
    marked = rf"regexp_replace({expr}, '([.!?…]+)\s+', '\1' || chr(1), 'g')"
    return (
        f"list_filter(list_transform(string_split({marked}, chr(1)), s -> trim(s)), "
        "s -> s <> '')"
    )


def chunk_sentences(
    df: DataFrame,
    budget_tokens: int = 128,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sentence-aware document chunking (the RAG form that never cuts
    mid-sentence): split on sentence boundaries, then assign sentence
    ``i`` to chunk ``floor(pre_cumsum_tokens / budget_tokens)`` — chunk
    boundaries land BETWEEN sentences, a chunk holds ~budget tokens
    (the straddling sentence joins the earlier chunk, so a chunk can
    exceed the budget by at most one sentence; an over-budget single
    sentence gets its own chunk), and chunk ids are dense from 0 in
    document order.

    Execution: sentence split + per-sentence token counts in one narrow
    projection (the sentence array is bound once per row), one explode,
    a cumulative-sum window per doc, and the chunk reassembly groupBy —
    two shuffles on doc_id total, no data-dependent driver work.

    Output: ``(doc_id, chunk_id, n_sentences, n_tokens, chunk_text)``
    with ``chunk_text`` the space-joined sentences (trimmed) in order."""
    from pyspark.sql import Window

    base = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"), _sentences(F.col(text_col)).alias("__s")
    )
    sent = base.select(
        "doc_id",
        F.posexplode("__s").alias("__i", "__sent"),
    ).withColumn("__nt", F.size(tokens(F.col("__sent"))).cast("long"))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("__i")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = sent.withColumn(
        "chunk_id",
        F.floor(F.coalesce(F.sum("__nt").over(w), F.lit(0)) / F.lit(budget_tokens)).cast(
            "long"
        ),
    )
    return (
        marked.groupBy("doc_id", "chunk_id")
        .agg(
            F.count("*").alias("n_sentences"),
            F.sum("__nt").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__i", "__sent"))),
                    lambda x: x["__sent"],
                ),
                " ",
            ).alias("chunk_text"),
        )
        .select("doc_id", "chunk_id", "n_sentences", "n_tokens", "chunk_text")
    )


def chunk_sentences_sql(
    table: str,
    budget_tokens: int = 128,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`chunk_sentences` (value-exact)."""
    sents = _sentences_sql(text_col)
    toks = tokens_sql("s")
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id, {sents} AS ss FROM {table} WHERE {text_col} IS NOT NULL
), sent AS (
  SELECT doc_id, i - 1 AS i, ss[i] AS s
  FROM base, unnest(range(1, len(ss) + 1)) AS u(i)
), counted AS (
  SELECT doc_id, i, s, CAST(len({toks}) AS BIGINT) AS nt FROM sent
), marked AS (
  SELECT doc_id, i, s, nt,
         CAST(floor(coalesce(SUM(nt) OVER (PARTITION BY doc_id ORDER BY i
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              / {budget_tokens}) AS BIGINT) AS chunk_id
  FROM counted
)
SELECT doc_id, chunk_id, count(*) AS n_sentences,
       CAST(SUM(nt) AS BIGINT) AS n_tokens,
       string_agg(s, ' ' ORDER BY i) AS chunk_text
FROM marked
GROUP BY doc_id, chunk_id
"""


def c4_span_dedup(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4's exact span deduplication (Raffel et al. 2020 §2.2: "we
    discarded all but one of any three-sentence span occurring more than
    once in the data set"): hash every consecutive ``n``-sentence window
    corpus-wide, keep each duplicated span's FIRST occurrence (lowest
    (doc_id, start)), and remove every sentence covered by a
    non-canonical duplicate from its document.

    Scale shape: sentence split + span hashing stay narrow per row; the
    only shuffles are the span-hash groupBy (map-side combined — a viral
    span is a combiner group) and the per-doc reassembly. Victim marking
    is an equi-join on the span hash; the corpus text never shuffles,
    only (doc, sentence index) pairs do.

    Output ``(doc_id, text)`` — the cleaned text (surviving sentences
    space-joined in order; a fully-duplicated doc keeps an empty
    string). Docs with fewer than ``n`` sentences pass through verbatim
    (no span can cover them, as in the paper)."""
    from pyspark.sql import Window

    sent = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("doc_id"), _sentences(F.col(text_col)).alias("__s"))
        .select("doc_id", F.posexplode("__s").alias("i", "s"))
    )
    # span hash per start index: h60 over the \x02-joined window
    nspan = F.size(F.col("__s")) - (n - 1)
    spans = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("doc_id"), _sentences(F.col(text_col)).alias("__s"))
        .where(F.size("__s") >= n)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), nspan),
                    lambda st: h60(F.concat_ws("\x02", F.slice("__s", st, n))),
                )
            ).alias("start", "h"),
        )
    )
    dup = spans.groupBy("h").agg(F.count("*").alias("c")).where("c > 1").select("h")
    wc = Window.partitionBy("h").orderBy(F.asc("doc_id"), F.asc("start"))
    victims = (
        spans.join(dup, "h")
        .withColumn("__r", F.row_number().over(wc))
        .where(F.col("__r") > 1)  # every occurrence but the first
        .select("doc_id", "start")
        .distinct()
    )
    # a victim span at 0-based start covers sentence indices start..start+n-1
    dead = victims.select(
        "doc_id", F.explode(F.sequence(F.col("start"), F.col("start") + (n - 1))).alias("i")
    ).distinct()
    kept = sent.join(dead, ["doc_id", "i"], "left_anti")
    cleaned = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "s"))), lambda x: x["s"]
            ),
            " ",
        ).alias(text_col)
    )
    # fully-duplicated docs (all sentences dead) keep an empty string
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(cleaned, "doc_id", "left")
        .select("doc_id", F.coalesce(F.col(text_col), F.lit("")).alias(text_col))
    )


def c4_span_dedup_sql(
    table: str,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`c4_span_dedup` (value-exact)."""
    sents = _sentences_sql(text_col)
    span_h = h60_sql(
        f"array_to_string(list_slice(ss, st, st + {n} - 1), chr(2))"
    )
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id, {sents} AS ss FROM {table} WHERE {text_col} IS NOT NULL
), sent AS (
  SELECT doc_id, i - 1 AS i, ss[i] AS s
  FROM base, unnest(range(1, len(ss) + 1)) AS u(i)
), spans AS (
  SELECT doc_id, st - 1 AS start, {span_h} AS h
  FROM base, unnest(range(1, len(ss) - {n} + 2)) AS u(st)
  WHERE len(ss) >= {n}
), dup AS (
  SELECT h FROM spans GROUP BY h HAVING count(*) > 1
), victims AS (
  SELECT doc_id, start FROM (
    SELECT s.doc_id, s.start,
           row_number() OVER (PARTITION BY s.h ORDER BY s.doc_id, s.start) AS r
    FROM spans s JOIN dup USING (h)
  ) WHERE r > 1
), dead AS (
  SELECT DISTINCT doc_id, start + k AS i
  FROM victims, unnest(range(0, {n})) AS g(k)
), kept AS (
  SELECT sent.* FROM sent
  WHERE NOT EXISTS (
    SELECT 1 FROM dead WHERE dead.doc_id = sent.doc_id AND dead.i = sent.i
  )
), cleaned AS (
  SELECT doc_id, string_agg(s, ' ' ORDER BY i) AS {text_col}
  FROM kept GROUP BY doc_id
)
SELECT b.{id_col} AS doc_id, coalesce(c.{text_col}, '') AS {text_col}
FROM (SELECT {id_col} FROM {table}) b
LEFT JOIN cleaned c ON c.doc_id = b.{id_col}
"""
