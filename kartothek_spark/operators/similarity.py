"""Similarity search over embedding columns (`array<float>`).

Two paths, as a 100 TB design demands:

* **brute force** — exact cosine top-k / all-pairs; the baseline and the
  verifier. Block-broadcast design: one side is broadcast as a dense
  matrix, the other streams through `mapInPandas`, each Arrow batch doing
  ONE numpy matmul instead of millions of per-pair expression evals.
* **LSH-bucketed** — random-hyperplane sign buckets from *deterministic*
  pseudo-random planes (hash-derived constants, no RNG state), so the
  bucketing itself is reproducible in SQL. Candidates = same bucket; at
  scale the cross-join shrinks from N×Q to |bucket|×Q and the bucket id
  is a shuffle-friendly integer key. Recall is tunable via number of
  planes / multi-probe; exactness is NOT claimed.

**Determinism contract — fixed-point cosine.** Float summation order
differs between engines (numpy sums pairwise, SQL folds sequentially), so
float dots can't be compared bit-exact. Instead every component is
quantized to a 24-bit fixed-point integer (exact in any engine:
``floor(v * 2^24 + 0.5)``); dots and squared norms are then INTEGER sums
— associative, so ANY summation order (numpy matmul included) yields the
same number; the final ``int_dot / (sqrt(na) * sqrt(nb))`` is a fixed
sequence of IEEE double ops, bit-identical everywhere. Quantization error
~6e-8 per component is semantically irrelevant for similarity search.
Overflow margin: |v| ≤ 16 keeps a 64-dim dot under 2^62.
"""

from __future__ import annotations

import warnings
from typing import Iterator

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kartothek_spark.operators._util import scale_out

LSH_PLANES = 8  # 2^8 buckets
QUANT_BITS = 24
QUANT = 1 << QUANT_BITS

_PAIR_SCHEMA = "id_a long, id_b long, cos_sim double"
_TOPK_SIM_SCHEMA = "query_id long, neighbor_id long, cos_sim double"


# ---------------------------------------------------------------------------
# fixed-point primitives (Spark + SQL renderings)
# ---------------------------------------------------------------------------

def quantize(vec: Column) -> Column:
    """array<float> → array<long> fixed-point at 2^24.

    Domain contract: components at roughly unit scale (normalized
    embeddings). |v| ≤ 1 keeps the int64 dot within d·2^48 (safe beyond
    d = 30k); components around |v| ≈ 30+ overflow the dot at typical
    dims — the JVM raises (ANSI) where NumPy would wrap silently, so
    normalize first."""
    return F.transform(
        vec, lambda v: F.floor(v.cast("double") * QUANT + F.lit(0.5)).cast("long")
    )


def quantize_sql(vec: str) -> str:
    return (
        f"list_transform({vec}, v -> CAST(floor(CAST(v AS DOUBLE) * {QUANT} + 0.5) AS BIGINT))"
    )


def qdot(a: Column, b: Column) -> Column:
    """Integer dot of two quantized vectors (associative — order-free)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def qdot_sql(a: str, b: str, dim: int) -> str:
    return (
        f"list_aggregate(list_transform(range(1, {dim + 1}), i -> {a}[i] * {b}[i]), 'sum')"
    )


def cos_from_ints(dot_i: Column, na_i: Column, nb_i: Column) -> Column:
    """int dot + int squared norms → double cosine. The op sequence
    (sqrt, sqrt, mul, div, round) is fixed so every engine produces the
    identical double."""
    return F.round(
        dot_i.cast("double")
        / (F.sqrt(na_i.cast("double")) * F.sqrt(nb_i.cast("double"))),
        6,
    )


def cos_from_ints_sql(dot_i: str, na_i: str, nb_i: str) -> str:
    return (
        f"round(CAST({dot_i} AS DOUBLE) / "
        f"(sqrt(CAST({na_i} AS DOUBLE)) * sqrt(CAST({nb_i} AS DOUBLE))), 6)"
    )


# float fold forms (ad-hoc column math; the operators below use the
# fixed-point contract instead — float summation order is engine-specific)
def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _quantized_matrix(df: DataFrame, id_col: str, vec_col: str):
    """(ids int64[N], M int64[N×dim]) collected to the driver for the
    broadcast side of the block design. The broadcast side must fit in
    memory — the block-broadcast contract; when both sides are huge,
    bucket first (:func:`lsh_topk`) and block within buckets."""
    import numpy as np

    pdf = df.select(F.col(id_col).alias("id"), quantize(F.col(vec_col)).alias("q")).toPandas()
    ids = pdf["id"].to_numpy(dtype="int64")
    M = np.array([np.asarray(q, dtype="int64") for q in pdf["q"]], dtype="int64")
    return ids, M


# ---------------------------------------------------------------------------
# all-pairs near-duplicates
# ---------------------------------------------------------------------------

def embedding_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    blocks: int | None = None,
    target_block_rows: int = 1024,
    group_col: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= threshold, id_a < id_b).

    Exact all-pairs semantics, distributed block-matrix execution — the
    corpus is never collected to the driver. The corpus hash-splits into
    ``B`` id-blocks; every unordered block pair ``(x <= y)`` becomes one
    shuffle group whose members arrive tagged side ``a`` (block x) / ``b``
    (block y), and ``applyInPandas`` runs ONE int64 numpy matmul per
    group. Each row is replicated exactly B times (once per block pair it
    participates in), so shuffle volume is N·B while compute stays the
    inherent N²/2 — B ≈ N / ``target_block_rows`` keeps every task's
    matmul at ~1k×1k and the B(B+1)/2 groups spread across the cluster.
    All-pairs is inherently quadratic; beyond ~1e7 rows compose
    :func:`lsh_bucket` first and run this within buckets.

    With ``group_col`` the pair search is scoped to rows sharing that
    column's value (e.g. a k-means cluster id — the SemDeDup candidate
    restriction in ``operators/clustering.py``): the shuffle groups become
    (group, block-pair) and no cross-group pair is ever considered, so the
    quadratic term is per group, not global."""
    import math

    import numpy as np

    if blocks is None:
        blocks = max(1, math.ceil(df.count() / target_block_rows))

    grp = [group_col] if group_col else []
    qdf = scale_out(df).select(
        *grp,
        F.col(id_col).alias("id"),
        quantize(F.col(vec_col)).alias("q"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(blocks)).cast("int").alias("__blk"),
    )
    # side a: block x participates in every pair (x, y>=x); side b: (x<y, y).
    # The self pair (x, x) carries only side-a rows — the kernel takes the
    # strict upper triangle there, so no pair is emitted twice.
    a = qdf.select(
        *grp, "id", "q",
        F.col("__blk").alias("__bx"),
        F.explode(F.sequence(F.col("__blk"), F.lit(blocks - 1))).alias("__by"),
        F.lit("a").alias("side"),
    )
    b = qdf.where(F.col("__blk") > 0).select(
        *grp, "id", "q",
        F.explode(F.sequence(F.lit(0), F.col("__blk") - 1)).alias("__bx"),
        F.col("__blk").alias("__by"),
        F.lit("b").alias("side"),
    )
    tagged = a.unionByName(b)

    def kernel(key, pdf):
        import pandas as pd

        x, y = key[-2], key[-1]

        def mat(part):
            ids = part["id"].to_numpy(dtype="int64")
            M = np.array([np.asarray(q, dtype="int64") for q in part["q"]], dtype="int64")
            return ids, M, np.sqrt((M * M).sum(axis=1).astype("float64"))

        empty = pd.DataFrame({"id_a": np.array([], dtype="int64"),
                              "id_b": np.array([], dtype="int64"),
                              "cos_sim": np.array([], dtype="float64")})
        A = pdf[pdf["side"] == "a"]
        if x == y:
            if len(A) < 2:
                return empty
            ids, M, n = mat(A)
            cos = np.round((M @ M.T).astype("float64") / (n[:, None] * n[None, :]), 6)
            ii, jj = np.where((cos >= threshold) & (ids[:, None] < ids[None, :]))
            left, right = ids[ii], ids[jj]
        else:
            Bp = pdf[pdf["side"] == "b"]
            if len(A) == 0 or len(Bp) == 0:
                return empty
            a_ids, Am, an = mat(A)
            b_ids, Bm, bn = mat(Bp)
            cos = np.round((Am @ Bm.T).astype("float64") / (an[:, None] * bn[None, :]), 6)
            ii, jj = np.where(cos >= threshold)
            # ids are globally unique and blocks are id-disjoint — order only
            left = np.minimum(a_ids[ii], b_ids[jj])
            right = np.maximum(a_ids[ii], b_ids[jj])
        return pd.DataFrame({"id_a": left, "id_b": right, "cos_sim": cos[ii, jj]})

    return tagged.groupBy(*grp, "__bx", "__by").applyInPandas(kernel, _PAIR_SCHEMA)


def embedding_dup_pairs_sql(
    table: str, threshold: float, dim: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    cos = cos_from_ints_sql(qdot_sql("a.q", "b.q", dim), "a.n", "b.n")
    return f"""
WITH q AS (
  SELECT {id_col} AS id, {quantize_sql(vec_col)} AS q FROM {table}
), base AS (
  SELECT id, q, {qdot_sql('q', 'q', dim)} AS n FROM q
)
SELECT a.id AS id_a, b.id AS id_b, {cos} AS cos_sim
FROM base a JOIN base b ON a.id < b.id
WHERE {cos} >= {threshold}
"""


# ---------------------------------------------------------------------------
# exact top-k
# ---------------------------------------------------------------------------

def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k neighbors per query vector.

    The (small) query matrix is broadcast; the corpus streams through one
    numpy matmul per Arrow batch, and only each query's per-batch top-k
    rows leave the kernel (exact: any global top-k row is a batch top-k
    row), so the ranking window shuffles Q·k·batches rows instead of the
    full Q·|C| similarity relation. Rank orders by (cos DESC, neighbor id
    ASC) — fully deterministic under the fixed-point contract.
    Output: (query_id, neighbor_id, rank, cos_sim)."""
    sims = _bf_sims(df, queries, id_col, vec_col, batch_topk=k)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cos_sim")
    )


def _bf_sims(
    df: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    batch_topk: int | None = None,
    slack: dict | None = None,
    cutoffs: dict | None = None,
) -> DataFrame:
    """(query, corpus) fixed-point cosine rows minus self-pairs — the
    shared kernel of :func:`brute_force_topk` and :func:`hard_negatives`
    (broadcast query matrix, one int64 matmul per Arrow batch, corpus
    never shuffles on content).

    ``batch_topk`` bounds the SHUFFLE, not the compute: the matmul is
    inherently O(Q·C) for an exact operator, but only each query's
    per-batch top-``(batch_topk + slack[qid])`` rows — under the exact
    global order (cos DESC, neighbor_id ASC) — need to reach the
    downstream ranking window, because any row in a query's global
    top-k is by definition in that query's top-(k + #excluded-above-it)
    of its own batch, and #excluded-above-it ≤ slack. Emitted volume
    drops from Q·|C| rows to Q·(k+slack)·batches — at a 100 TB corpus
    the difference between a top-k and a full materialization. ``slack``
    carries each query's downstream-exclusion row count (its labeled
    positives for ``hard_negatives``); queries absent from the dict get
    0 (self-pairs are already excluded in-kernel). ``None`` emits every
    pair (the similarity-relation form).

    ``cutoffs`` (requires ``batch_topk``) additionally DROPS, in-kernel,
    every pair whose cos exceeds the query's cutoff — the positive-aware
    margin filter of :func:`hard_negatives`. A value cutoff is monotone
    in the ranking order, so applying it before the per-batch top-k
    keeps the emission exact with the same positive-count slack; queries
    absent from the dict are not cutoff-filtered."""
    import numpy as np

    spark = df.sparkSession
    q_ids, Qm = _quantized_matrix(queries, id_col, vec_col)
    q_norms = (Qm * Qm).sum(axis=1)
    if batch_topk is not None:
        sl = slack or {}
        limits = np.array(
            [batch_topk + int(sl.get(int(q), 0)) for q in q_ids], dtype="int64"
        )
    else:
        assert cutoffs is None, "cutoffs requires the batch_topk emission path"
        limits = None
    if cutoffs is not None:
        cuts = np.array(
            [float(cutoffs.get(int(q), np.inf)) for q in q_ids], dtype="float64"
        )
    else:
        cuts = None
    bc = spark.sparkContext.broadcast((q_ids, Qm, q_norms, limits, cuts))

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        b_qids, b_Q, b_qn, b_lim, b_cut = bc.value
        qn = np.sqrt(b_qn.astype("float64"))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.array([np.asarray(q, dtype="int64") for q in pdf["q"]], dtype="int64")
            c_ids = pdf["id"].to_numpy(dtype="int64")
            G = C @ b_Q.T  # corpus-batch × queries, exact int64
            cn = np.sqrt((C * C).sum(axis=1).astype("float64"))
            cos = np.round(G.astype("float64") / (cn[:, None] * qn[None, :]), 6)
            if b_lim is None:
                ii, jj = np.where(c_ids[:, None] != b_qids[None, :])
                yield pd.DataFrame({
                    "query_id": b_qids[jj],
                    "neighbor_id": c_ids[ii],
                    "cos_sim": cos[ii, jj],
                })
                continue
            jj, ids, vals = _select_batch_topk(cos, c_ids, b_qids, b_lim, b_cut)
            if len(jj):
                yield pd.DataFrame({
                    "query_id": b_qids[jj],
                    "neighbor_id": ids,
                    "cos_sim": vals,
                })

    qdf = scale_out(df).select(F.col(id_col).alias("id"), quantize(F.col(vec_col)).alias("q"))
    return qdf.mapInPandas(gen, _TOPK_SIM_SCHEMA)


def _select_batch_topk(cos, c_ids, b_qids, b_lim, b_cut):
    """Vectorized per-query bounded emission for one Arrow batch — the
    selection half of :func:`_bf_sims`'s ``batch_topk`` path, kept as a
    pure NumPy function so its exactness contract is pinned by a
    Spark-free fuzz test against a literal per-query reference
    (``tests/test_operators.py::test_select_batch_topk_fuzz``).

    Per query column j, with L = ``b_lim[j]``: self-pairs
    (``c_ids == b_qids[j]``) and values above ``b_cut[j]`` are
    excluded, and of the remainder the top-L rows under the exact
    composite order (cos DESC, id ASC) are selected. Implementation
    avoids a Python loop over the query axis (at Q in the thousands and
    small Arrow batches that loop dominates): exclusions are masked to
    ``-inf`` in the full matrix; the L-th-largest value threshold is
    computed per DISTINCT limit value with one axis-0 ``np.partition``
    each (few distinct limits: k and the k+slack variants; the value
    cut keeps boundary TIES — a tied boundary row with a smaller id
    must not be cut before the global ranking window sees it); then one
    flat lexsort + run-rank caps each query at L under the exact
    composite order. ``cos`` is mutated in place (callers pass a
    per-batch scratch matrix). Returns ``(jj, ids, vals)`` — query
    column indices, neighbor ids, cosines — ordered by (jj, order)."""
    import numpy as np

    B = len(c_ids)
    M = cos
    M[c_ids[:, None] == b_qids[None, :]] = -np.inf  # self-pairs
    if b_cut is not None:
        # cut = +inf for non-filtered queries -> never exceeded
        M[M > b_cut[None, :]] = -np.inf  # margin-excluded
    cand_mask = np.zeros(M.shape, dtype=bool)
    for L in np.unique(b_lim):
        L = int(L)
        if L <= 0:
            continue
        cols = np.nonzero(b_lim == L)[0]
        if B > L:
            thr = np.partition(M[:, cols], B - L, axis=0)[B - L]
            cand_mask[:, cols] = M[:, cols] >= thr
        else:
            cand_mask[:, cols] = True
    cand_mask &= M != -np.inf  # drop masked rows everywhere
    rr, jj = np.nonzero(cand_mask)
    if len(rr) == 0:
        empty = np.empty(0, dtype="int64")
        return empty, empty, np.empty(0, dtype="float64")
    vals = M[rr, jj]
    ids = c_ids[rr]
    order = np.lexsort((ids, -vals, jj))
    jj, vals, ids = jj[order], vals[order], ids[order]
    # rank within each query run, keep rank < that query's limit
    starts = np.flatnonzero(np.r_[True, jj[1:] != jj[:-1]])
    run_len = np.diff(np.r_[starts, len(jj)])
    rank = np.arange(len(jj)) - np.repeat(starts, run_len)
    keep = rank < b_lim[jj]
    return jj[keep], ids[keep], vals[keep]


def hard_negatives(
    df: DataFrame,
    queries: DataFrame,
    positives: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_col: str = "query_id",
    pos_col: str = "pos_id",
    margin: float | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: per
    query, the ``k`` most cosine-similar corpus vectors EXCLUDING the
    query itself and its labeled positives (``positives`` is the
    external (query_id, pos_id) label relation) — the near-misses that
    actually move a contrastive loss, instead of the random negatives
    in-batch sampling yields. Ranking happens AFTER the exclusion, so
    every query still receives ``k`` negatives.

    ``margin`` turns on positive-aware filtering (the false-negative
    guard from the contrastive-retrieval training literature): any
    candidate whose cosine exceeds ``max(cos(query, labeled positives))
    - margin`` is ALSO excluded — a corpus vector nearly as close as
    the closest labeled positive is more likely an unlabeled positive
    than a hard negative, and training against it teaches the model to
    push true matches apart. Queries without positives are not
    margin-filtered. The per-query cutoffs are computed from the
    (tiny) label relation and broadcast into the kernel, where the
    value cutoff composes with the per-batch top-k emission exactly
    (a cutoff is monotone in the ranking order).

    Scale shape = :func:`brute_force_topk`'s: the (small) query matrix
    broadcasts, the corpus streams through one int64 matmul per Arrow
    batch and never shuffles on content, and the kernel emits only each
    query's per-batch top-(k + its positive count) rows — the slack
    guarantees k survivors per batch even if every labeled positive
    outranks them, so the post-exclusion result is exactly the
    unbounded form's while the ranking shuffle carries
    Q·(k+slack)·batches rows instead of Q·|C|. The positives exclusion
    is a left-anti join on (query, neighbor) that AQE broadcasts (label
    sets are tiny by nature). For query sides too large to broadcast,
    compose :func:`knn_join` with the same anti-join instead. Output:
    ``(query_id, neighbor_id, rank, cos_sim)``.

    .. note:: Plan construction is EAGER on the label side: building
       the per-query slack (and, with ``margin``, the per-query cutoff)
       runs ONE Spark job whose collected result is one row per
       distinct query with positives — query-scale, never
       positives-scale, and the query matrix is broadcast by contract
       anyway. Callers composing plans without executing them will
       still trigger that job here."""
    pos = positives.select(
        F.col(query_col).alias("query_id"), F.col(pos_col).alias("neighbor_id")
    )
    cutoffs = None
    if margin is None:
        pos_counts = {
            int(r["query_id"]): int(r["n"])
            for r in pos.groupBy("query_id").agg(F.count("*").alias("n")).collect()
        }
    else:
        # cos(query, labeled positive) for the label pairs only: run the
        # shared kernel over the positive SUBSET of the corpus (|P| rows,
        # trivial), keep the labeled pairs, and take count + max per
        # query in ONE aggregated collect — the count doubles as the
        # emission slack (corpus-present non-self positives are exactly
        # the rows the downstream anti-join can remove from the emitted
        # stream, so this tighter count keeps the k-survivor guarantee)
        pos_members = pos.select(F.col("neighbor_id").alias(id_col)).distinct()
        pos_stats = (
            _bf_sims(
                df.join(pos_members, id_col, "left_semi"), queries, id_col, vec_col
            )
            .join(pos, ["query_id", "neighbor_id"])
            .groupBy("query_id")
            .agg(F.count("*").alias("n"), F.max("cos_sim").alias("m"))
            .collect()
        )
        pos_counts = {int(r["query_id"]): int(r["n"]) for r in pos_stats}
        cutoffs = {
            int(r["query_id"]): float(r["m"]) - float(margin) for r in pos_stats
        }
    if len(pos_counts) > 100_000:
        warnings.warn(
            "hard_negatives collected label stats for "
            f"{len(pos_counts):,} distinct queries on the driver; the "
            "broadcast-query contract assumes a small query side — "
            "compose knn_join with an anti-join for query sets this size",
            stacklevel=2,
        )
    spark_sims = _bf_sims(
        df, queries, id_col, vec_col,
        batch_topk=k, slack=pos_counts, cutoffs=cutoffs,
    )
    negs = spark_sims.join(pos, ["query_id", "neighbor_id"], "left_anti")
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        negs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cos_sim")
    )


def hard_negatives_sql(
    table: str,
    query_filter: str,
    positives_sql: str,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    margin: float | None = None,
) -> str:
    """DuckDB twin of :func:`hard_negatives` (``positives_sql`` yields
    (query_id, pos_id)); exact under the fixed-point cosine contract.
    With ``margin``, candidates above ``max labeled-positive cos -
    margin`` are excluded per query (positive-aware filtering) — the
    cutoff arithmetic is float64 over the already-rounded fixed-point
    cosines on both engines, so the comparison decides identically."""
    cos = cos_from_ints_sql(qdot_sql("q.qv", "c.qv", dim), "q.n", "c.n")
    margin_ctes = margin_pred = ""
    if margin is not None:
        pcos = cos_from_ints_sql(qdot_sql("q.qv", "pc.qv", dim), "q.n", "pc.n")
        margin_ctes = f""", cut AS (
  SELECT p.query_id, max({pcos}) - {margin!r} AS cutoff
  FROM pos p
  JOIN q ON q.id = p.query_id
  JOIN base pc ON pc.id = p.pos_id AND pc.id <> q.id
  GROUP BY 1
)"""
        margin_pred = (
            "\n    AND {c} <= COALESCE("
            "(SELECT cutoff FROM cut WHERE cut.query_id = q.id), 1e308)"
        ).format(c=cos)
    return f"""
WITH quant AS (
  SELECT {id_col} AS id, {quantize_sql(vec_col)} AS qv FROM {table}
), base AS (
  SELECT id, qv, {qdot_sql('qv', 'qv', dim)} AS n FROM quant
), q AS (
  SELECT b.* FROM base b JOIN {table} t ON b.id = t.{id_col} WHERE {query_filter}
), c AS (
  SELECT * FROM base
), pos AS (
  SELECT query_id, pos_id FROM ({positives_sql})
){margin_ctes}, sims AS (
  SELECT q.id AS query_id, c.id AS neighbor_id, {cos} AS cos_sim
  FROM c, q
  WHERE q.id <> c.id
    AND NOT EXISTS (
      SELECT 1 FROM pos p WHERE p.query_id = q.id AND p.pos_id = c.id
    ){margin_pred}
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM sims
) WHERE rank <= {k}
"""


def brute_force_topk_sql(
    table: str, query_filter: str, k: int, dim: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    cos = cos_from_ints_sql(qdot_sql("q.qv", "c.qv", dim), "q.n", "c.n")
    return f"""
WITH quant AS (
  SELECT {id_col} AS id, {quantize_sql(vec_col)} AS qv FROM {table}
), base AS (
  SELECT id, qv, {qdot_sql('qv', 'qv', dim)} AS n FROM quant
), q AS (
  SELECT b.* FROM base b JOIN {table} t ON b.id = t.{id_col} WHERE {query_filter}
), c AS (
  SELECT * FROM base
), sims AS (
  SELECT q.id AS query_id, c.id AS neighbor_id, {cos} AS cos_sim
  FROM c, q WHERE q.id <> c.id
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM sims
) WHERE rank <= {k}
"""


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_block_rows: int = 1024,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact distributed KNN join: for EVERY left row, its ``k`` nearest
    right rows by cosine — both sides arbitrarily large, nothing broadcast
    or collected to the driver (unlike :func:`brute_force_topk`, whose
    contract is a small query side).

    Block-matrix execution (same shape as :func:`embedding_dup_pairs`):
    left hash-splits into BL id-blocks, right into BR; every (bl, br) pair
    is one shuffle group whose kernel runs ONE int64 numpy matmul and
    keeps a block-local per-left-row top-k, so the global rank window sees
    at most BR·k candidates per query instead of M. Replication cost is
    N·BR + M·BL rows of shuffle; compute is the inherent N·M. Exact by
    construction: the global top-k is the top-k of the union of
    block-local top-ks. Ties rank deterministically (cos DESC, neighbor
    id ASC) on fixed-point cosine. Output: (query_id, neighbor_id, rank,
    cos_sim). Beyond ~1e7×1e7 compose :func:`lsh_bucket` / IVF cells
    first and run this within buckets."""
    import math

    import numpy as np

    n_l = left.count()
    n_r = right.count()
    bl = max(1, math.ceil(n_l / target_block_rows))
    br = max(1, math.ceil(n_r / target_block_rows))

    lq = scale_out(left).select(
        F.col(id_col).alias("id"),
        quantize(F.col(vec_col)).alias("q"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(bl)).cast("int").alias("__bl"),
    )
    rq = scale_out(right).select(
        F.col(id_col).alias("id"),
        quantize(F.col(vec_col)).alias("q"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(br)).cast("int").alias("__br"),
    )
    a = lq.select(
        "id", "q", F.col("__bl"),
        F.explode(F.sequence(F.lit(0), F.lit(br - 1))).alias("__br"),
        F.lit("a").alias("side"),
    )
    b = rq.select(
        "id", "q",
        F.explode(F.sequence(F.lit(0), F.lit(bl - 1))).alias("__bl"),
        F.col("__br"),
        F.lit("b").alias("side"),
    )
    tagged = a.unionByName(b)

    def kernel(key, pdf):
        import pandas as pd

        empty = pd.DataFrame({"query_id": np.array([], dtype="int64"),
                              "neighbor_id": np.array([], dtype="int64"),
                              "cos_sim": np.array([], dtype="float64")})
        A = pdf[pdf["side"] == "a"]
        B = pdf[pdf["side"] == "b"].sort_values("id")  # id ASC → stable tie-break
        if len(A) == 0 or len(B) == 0:
            return empty

        def mat(part):
            ids = part["id"].to_numpy(dtype="int64")
            M = np.array([np.asarray(q, dtype="int64") for q in part["q"]], dtype="int64")
            return ids, M, np.sqrt((M * M).sum(axis=1).astype("float64"))

        a_ids, Am, an = mat(A)
        b_ids, Bm, bn = mat(B)
        cos = np.round((Am @ Bm.T).astype("float64") / (an[:, None] * bn[None, :]), 6)
        if exclude_self:
            cos[a_ids[:, None] == b_ids[None, :]] = -2.0
        kk = min(k, cos.shape[1])
        # stable argsort of -cos over id-ASC-sorted columns = (cos DESC, id ASC)
        order = np.argsort(-cos, axis=1, kind="stable")[:, :kk]
        rows = np.repeat(np.arange(cos.shape[0]), kk)
        cols = order.ravel()
        keep = cos[rows, cols] > -2.0
        return pd.DataFrame({
            "query_id": a_ids[rows][keep],
            "neighbor_id": b_ids[cols][keep],
            "cos_sim": cos[rows, cols][keep],
        })

    sims = tagged.groupBy("__bl", "__br").applyInPandas(kernel, _TOPK_SIM_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cos_sim")
    )


def knn_join_sql(
    table: str,
    left_filter: str,
    right_filter: str,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Brute-force oracle for :func:`knn_join` restricted to filtered
    left/right sides of one table."""
    cos = cos_from_ints_sql(qdot_sql("l.qv", "r.qv", dim), "l.n", "r.n")
    return f"""
WITH quant AS (
  SELECT {id_col} AS id, {quantize_sql(vec_col)} AS qv FROM {table}
), base AS (
  SELECT id, qv, {qdot_sql('qv', 'qv', dim)} AS n FROM quant
), l AS (
  SELECT b.* FROM base b JOIN {table} t ON b.id = t.{id_col} WHERE {left_filter}
), r AS (
  SELECT b.* FROM base b JOIN {table} t ON b.id = t.{id_col} WHERE {right_filter}
), sims AS (
  SELECT l.id AS query_id, r.id AS neighbor_id, {cos} AS cos_sim
  FROM l, r WHERE l.id <> r.id
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM sims
) WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# LSH bucketing (approximate scale path)
# ---------------------------------------------------------------------------

def knn_classify(
    df: DataFrame,
    labeled: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    exclude_self: bool = True,
) -> DataFrame:
    """k-NN majority-vote label propagation: every ``df`` row gets the
    label most common among its ``k`` nearest ``labeled`` rows (exact
    cosine k-NN via :func:`knn_join`, both sides arbitrarily large).
    The LLM-curation use: propagate a small curated seed set's labels
    (quality tiers, topics, licenses) across the full corpus by embedding
    proximity. Deterministic ties: more votes wins, then the smaller
    label. Output: (id, pred_label, n_votes).

    Id-namespace contract: ``exclude_self=True`` (the default, right for
    the seed-set-within-corpus shape) drops any labeled neighbor whose id
    EQUALS the query id — if ``df`` and ``labeled`` come from DIFFERENT
    tables with overlapping id spaces, that silently disqualifies a
    legitimate nearest neighbor from voting; such callers must pass
    ``exclude_self=False``."""
    nn = knn_join(
        df, labeled, k=k, id_col=id_col, vec_col=vec_col, exclude_self=exclude_self
    )
    lab = labeled.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("__lab")
    )
    votes = nn.join(lab, "neighbor_id").groupBy("query_id", "__lab").agg(
        F.count("*").alias("n_votes")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("n_votes"), F.asc("__lab"))
    return (
        votes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            F.col("query_id").alias(id_col),
            F.col("__lab").alias("pred_label"),
            F.col("n_votes").cast("long").alias("n_votes"),
        )
    )


def knn_classify_sql(
    table: str,
    left_filter: str,
    right_filter: str,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> str:
    knn = knn_join_sql(table, left_filter, right_filter, k, dim, id_col, vec_col)
    return f"""
WITH knn AS ({knn}),
votes AS (
  SELECT n.query_id, t.{label_col} AS lab, count(*) AS n_votes
  FROM knn n JOIN {table} t ON n.neighbor_id = t.{id_col}
  GROUP BY n.query_id, t.{label_col}
)
SELECT query_id AS {id_col}, lab AS pred_label, CAST(n_votes AS BIGINT) AS n_votes
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY n_votes DESC, lab ASC) AS rn
  FROM votes
) WHERE rn = 1
"""


def _plane_weight(p: int, j: int, table: int = 0) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    the Python rendering of ``(h60('<t>,<p>,<j>') / H60_MAX) * 2 - 1``. The
    planes are CONSTANTS — embedded as literals in both engines, never
    per-row hash expressions. ``table`` seeds independent plane sets for
    multi-table (OR-amplified) LSH."""
    import hashlib

    key = f"{p},{j}" if table == 0 else f"{table},{p},{j}"
    h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
    return (h / float((1 << 60) - 1)) * 2.0 - 1.0


_PLANE_BC: dict = {}


def _lsh_planes_broadcast(spark, dim: int, planes: int, tables: int):
    """One broadcast of the (tables, planes, dim) hyperplane tensor per
    SparkContext + shape. The tensor is a pure function of its shape
    (deterministic :func:`_plane_weight` hashes), so every ``lsh_topk``
    call — and BOTH sides within one call — share a single handle instead
    of rebuilding the Python triple loop and leaking a fresh broadcast
    per side per call in a long-lived session."""
    import numpy as np

    sc = spark.sparkContext
    key = (sc.applicationId, dim, planes, tables)
    bc = _PLANE_BC.get(key)
    if bc is None:
        W = np.array(
            [
                [[_plane_weight(p, j, t) for j in range(dim)] for p in range(planes)]
                for t in range(tables)
            ],
            dtype="float64",
        )
        bc = sc.broadcast(W)
        _PLANE_BC[key] = bc
    return bc


def _lsh_index_side(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    planes: int,
    tables: int,
    out_id: str,
    out_q: str,
) -> DataFrame:
    """One Arrow-batched pass producing the LSH index rows of one side:
    ``(out_id, out_q array<long>, __t int, __b long)`` — the fixed-point
    quantized vector plus one (table, bucket) row per table.

    Bit-parity contract: the plane dot accumulates SEQUENTIALLY over the
    dimension index in float64 (``acc = acc + x_j * w_j``), the exact
    IEEE op sequence of the :func:`lsh_bucket` fold expression and its
    SQL twin, so a bucket can never differ between the batched and the
    expression rendering; quantization is the same
    ``floor(x * 2^24 + 0.5)``."""
    spark = df.sparkSession
    bc = _lsh_planes_broadcast(spark, dim, planes, tables)

    def gen(batches):
        # self-contained closure: executors don't need kartothek_spark
        import numpy as np
        import pandas as pd

        Wl = bc.value
        T, P, _D = Wl.shape
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array([np.asarray(v, dtype="float64") for v in pdf["v"]])
            q = np.floor(X * (1 << 24) + 0.5).astype("int64")
            buckets = np.zeros((len(X), T), dtype="int64")
            for t in range(T):
                for p in range(P):
                    acc = np.zeros(len(X), dtype="float64")
                    w = Wl[t, p]
                    for j in range(X.shape[1]):
                        acc = acc + X[:, j] * w[j]
                    buckets[:, t] += np.where(acc >= 0.0, 1 << p, 0)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "q": [row.tolist() for row in q],
                    "bs": [row.tolist() for row in buckets],
                }
            )

    # preserve the caller's id type (string uuids, ints, …) — hardcoding
    # ``long`` would crash or mangle non-bigint ids at Arrow conversion
    id_dt = df.schema[id_col].dataType.simpleString()
    src = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    enc = src.mapInPandas(gen, f"id {id_dt}, q array<long>, bs array<long>")
    return enc.select(
        F.col("id").alias(out_id),
        F.col("q").alias(out_q),
        F.posexplode("bs").alias("__t", "__b"),
    )


def lsh_bucket(vec: Column, dim: int, planes: int = LSH_PLANES, table: int = 0) -> Column:
    """Sign-bucket id: bit p = (vec · plane_p) >= 0. Integer in
    [0, 2^planes); plane weights are literal constant arrays folded with
    ``zip_with``. Only the SIGN of the dot matters, so float summation
    order can flip a bucket only for vectors numerically ON a plane —
    the approximate contract absorbs that. ``table`` selects an
    independent plane set."""
    total = F.lit(0).cast("long")
    for p in range(planes):
        plane = F.array(*[F.lit(_plane_weight(p, j, table)) for j in range(dim)])
        d = F.aggregate(
            F.zip_with(vec, plane, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        total = total + F.when(d >= 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return total


def lsh_bucket_sql(vec: str, dim: int, planes: int = LSH_PLANES, table: int = 0) -> str:
    def plane_dot(p: int) -> str:
        lit = "[" + ", ".join(repr(_plane_weight(p, j, table)) for j in range(dim)) + "]"
        return (
            f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"list_transform(range(1, {dim + 1}), i -> CAST({vec}[i] AS DOUBLE) * ({lit})[i])), "
            f"(x, y) -> x + y)"
        )

    terms = " + ".join(
        f"(CASE WHEN {plane_dot(p)} >= 0 THEN CAST({1 << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for p in range(planes)
    )
    return f"({terms})"


def lsh_topk_sql(
    table: str,
    query_filter: str,
    k: int,
    dim: int,
    planes: int = LSH_PLANES,
    tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Exact SQL value twin of :func:`lsh_topk`: the hyperplanes are
    deterministic constants (:func:`_plane_weight`) and every plane dot
    is a SEQUENTIAL left fold in float64 — the identical IEEE op sequence
    as the batched NumPy pass in ``_lsh_index_side`` — so per-table bucket
    ids, the OR-amplified candidate set, and the fixed-point cosine rank
    are all bit-reproducible cross-engine. This upgrades the approximate
    operator from a rows-only driver check to a full value-hash oracle:
    \"approximate\" refers to recall vs brute force, not to any
    nondeterminism in the computed result."""
    bucket_list = "[" + ", ".join(
        lsh_bucket_sql(vec_col, dim, planes, table=t) for t in range(tables)
    ) + "]"
    return f"""
WITH quant AS (
  SELECT {id_col} AS id, {quantize_sql(vec_col)} AS qv, {bucket_list} AS bs
  FROM {table}
), base AS (
  SELECT id, qv, {qdot_sql('qv', 'qv', dim)} AS n, bs FROM quant
), idx AS (
  SELECT id, qv, n, tt.t AS tbl, bs[tt.t + 1] AS bkt
  FROM base, (SELECT unnest(range(0, {tables})) AS t) tt
), q AS (
  SELECT i.* FROM idx i JOIN {table} t ON i.id = t.{id_col} WHERE {query_filter}
), cand AS (
  SELECT DISTINCT q.id AS query_id, c.id AS neighbor_id,
         {cos_from_ints_sql(qdot_sql('q.qv', 'c.qv', dim), 'q.n', 'c.n')} AS cos_sim
  FROM idx c JOIN q ON c.tbl = q.tbl AND c.bkt = q.bkt
  WHERE q.id <> c.id
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM cand
) WHERE rank <= {k}
"""


def diversity_sample(
    df: DataFrame,
    quota: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    planes: int = LSH_PLANES,
    salt: str = "diversity",
    keep_bucket: bool = False,
) -> DataFrame:
    """Cluster-balanced (diversity) sampling: cap every semantic LSH
    bucket at ``quota`` rows, so over-represented regions of embedding
    space (boilerplate clusters, template families) cannot dominate a
    training mixture the way a uniform sample lets them.

    Deterministic end to end: buckets come from the constant hyperplanes
    of :func:`lsh_bucket`; within a bucket the kept rows are the
    ``quota`` hash-smallest by the cross-engine 60-bit id hash — so the
    selection is partitioning-, retry-, and cluster-size-invariant, and
    stable under corpus growth (a new row only ever displaces the current
    hash-largest survivor of its own bucket). Size ``planes`` so
    2^planes ≈ N/quota: the bucket count bounds output size
    (≤ 2^planes·quota).

    The rank runs as the same TWO-PHASE (bucket, hash-shard) →
    bucket plan as :func:`~kartothek_spark.operators.corpus.
    stratified_sample` — a boilerplate mega-bucket never serializes
    through one window task, and the selection is bit-identical to the
    single-window form (the SQL twin is unchanged)."""
    from kartothek_spark.functions.hashing import h60
    from kartothek_spark.operators.corpus import _two_phase_quota

    h = h60(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    out = _two_phase_quota(
        df.withColumn("__bucket", lsh_bucket(F.col(vec_col), dim, planes)),
        group_cols=["__bucket"],
        quota=quota,
        h=h,
        id_col=id_col,
    )
    if keep_bucket:
        return out.withColumnRenamed("__bucket", "bucket")
    return out.drop("__bucket")


def diversity_sample_sql(
    table: str,
    quota: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = LSH_PLANES,
    salt: str = "diversity",
) -> str:
    """DuckDB twin of :func:`diversity_sample` (keep_bucket=True form),
    selecting (id, bucket)."""
    from kartothek_spark.functions.hashing import h60_sql

    bucket = lsh_bucket_sql(vec_col, dim, planes)
    h = h60_sql(f"'{salt}:' || CAST({id_col} AS VARCHAR)")
    return f"""
SELECT {id_col}, bucket FROM (
  SELECT {id_col}, bucket,
         row_number() OVER (PARTITION BY bucket ORDER BY h ASC, {id_col} ASC) AS rn
  FROM (SELECT {id_col}, {bucket} AS bucket, {h} AS h FROM {table})
) WHERE rn <= {quota}
"""


def lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    planes: int = LSH_PLANES,
    tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via multi-table (OR-amplified) random-hyperplane
    LSH: ``tables`` independent plane sets each bucket the corpus into
    2^``planes`` cells; a candidate is any corpus vector sharing the
    query's bucket in AT LEAST ONE table, and exact fixed-point cosine
    ranks the deduplicated candidates. One table's miss probability for a
    cos-0.95 pair is ~1-(1-θ/π)^planes ≈ 0.57 at 8 planes; eight tables
    drive it to 0.57^8 ≈ 1%. The scale path — the join key is (table,
    bucket), the corpus is scanned once producing ``tables`` index rows
    per vector, and the N×Q cross-join never materializes.

    Buckets + fixed-point quantization are computed in ONE Arrow-batched
    pass (``_lsh_index_side``): tables×planes interpreted HOF folds per
    row would dominate the corpus scan by >10×, while the batched NumPy
    form accumulates each plane dot in the SAME j-sequential IEEE order
    as the :func:`lsh_bucket` expression, so bucket ids stay bit-identical
    to the SQL-twin rendering (pinned by
    ``tests/test_operators.py::test_lsh_batch_matches_expression``)."""
    c = _lsh_index_side(
        scale_out(df), id_col, vec_col, dim, planes, tables, "neighbor_id", "__cq"
    )
    q = _lsh_index_side(
        queries, id_col, vec_col, dim, planes, tables, "query_id", "__qq"
    )
    sims = (
        c.join(F.broadcast(q), ["__t", "__b"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "__qq", "__cq")
        .dropDuplicates(["query_id", "neighbor_id"])  # union over tables
        .select(
            "query_id",
            "neighbor_id",
            cos_from_ints(
                qdot(F.col("__qq"), F.col("__cq")),
                qdot(F.col("__qq"), F.col("__qq")),
                qdot(F.col("__cq"), F.col("__cq")),
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cos_sim")
    )


def ivf_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_centroids: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer.

    The scale path for billion-vector corpora: a KMeans coarse quantizer
    (trained on the corpus, model broadcast) assigns every corpus vector
    to one of ``n_centroids`` cells; each query probes only its ``nprobe``
    nearest cells, so the candidate set is ~``nprobe/n_centroids`` of the
    corpus and the join key is the cell id — the N×Q cross-join never
    materializes, and cells are shuffle-friendly integer partitions. At
    cluster scale the cell assignment is also the natural *storage*
    partition (write the corpus ``partition_on=["cell"]`` and ANN probes
    become manifest-pruned reads). Exact fixed-point cosine ranks within
    the probed cells; with ``nprobe == n_centroids`` the result equals
    :func:`brute_force_topk` (tested).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus = scale_out(df).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__v"),
        quantize(F.col(vec_col)).alias("__cq"),
    )
    # train the coarse quantizer on a bounded deterministic sample — at
    # billion-vector scale KMeans over the full corpus is its own big job,
    # and cell quality only needs ~256 training points per centroid.
    # Correctness never depends on the clustering (every cell is probed at
    # nprobe == n_centroids; fewer probes only trade recall).
    n = corpus.count()
    target = max(4096, 256 * n_centroids)
    train_src = corpus if n <= target else corpus.sample(False, target / n, seed=seed)
    train = train_src.select(array_to_vector(F.col("__v").cast("array<double>")).alias("features"))
    model = KMeans(k=n_centroids, seed=seed, maxIter=8).fit(train)

    c = model.transform(
        corpus.withColumn("features", array_to_vector(F.col("__v").cast("array<double>")))
    ).select("neighbor_id", "__cq", F.col("prediction").alias("__cell"))

    # per-query nprobe nearest cells: centroids are tiny — broadcast both
    # ways; the rank window is over Q×n_centroids rows only
    centroids = [(i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())]
    cdf = df.sparkSession.createDataFrame(centroids, "__cell int, __ctr array<double>")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__v"),
        quantize(F.col(vec_col)).alias("__qq"),
    )
    dist = F.aggregate(
        F.zip_with(F.col("__v").cast("array<double>"), F.col("__ctr"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    wq = Window.partitionBy("query_id").orderBy(F.asc("__d"), F.asc("__cell"))
    probes = (
        q.crossJoin(F.broadcast(cdf))
        .withColumn("__d", dist)
        .withColumn("__r", F.row_number().over(wq))
        .where(F.col("__r") <= nprobe)
        .select("query_id", "__qq", "__cell")
    )

    sims = (
        c.join(F.broadcast(probes), "__cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cos_from_ints(
                qdot(F.col("__qq"), F.col("__cq")),
                qdot(F.col("__qq"), F.col("__qq")),
                qdot(F.col("__cq"), F.col("__cq")),
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cos_sim")
    )


def embedding_group_stats(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-(group, dimension) embedding statistics — the corpus-drift
    monitor: ``(group, dim, n, sum_q)`` where ``sum_q`` is the exact
    fixed-point (2^24) component sum, so centroids are ``sum_q / n /
    2^24`` with zero float-accumulation divergence between engines or
    runs. One posexplode (map-side combined) + a shuffle on the tiny
    (group × dim) key space; comparing two snapshots' outputs (e.g. via
    the changes feed) quantifies embedding drift per group."""
    return (
        df.select(
            F.col(group_col).alias("group"),
            F.posexplode(quantize(F.col(vec_col))).alias("dim", "__q"),
        )
        .groupBy("group", "dim")
        .agg(F.count("*").alias("n"), F.sum("__q").alias("sum_q"))
        .select("group", F.col("dim").cast("long").alias("dim"), "n", "sum_q")
    )


def embedding_group_stats_sql(
    table: str,
    dim: int,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of :func:`embedding_group_stats`."""
    return f"""
SELECT {group_col} AS group, CAST(i - 1 AS BIGINT) AS dim,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum({quantize_sql(vec_col)}[i]) AS BIGINT) AS sum_q
FROM {table} CROSS JOIN generate_series(1, {dim}) AS t(i)
GROUP BY 1, 2
"""
