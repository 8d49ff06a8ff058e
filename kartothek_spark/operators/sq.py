"""Scalar-quantized (SQ8) vector search: int8 codes, exact integer scoring.

The FAISS ``SQ8`` idea re-expressed Spark-first: store one SIGNED BYTE
per dimension instead of a float32 — 4× less index IO per scan — and
rank by the integer dot product of the codes, optionally re-ranking a
per-query shortlist against the full-precision corpus (the standard
two-stage SQ-then-rescore retrieval).

Codes here are SELF-NORMALIZED: ``code_i = round(127 · v_i / ‖v‖)``
computed entirely inside the engine's fixed-point contract
(:mod:`~kartothek_spark.operators.similarity`: 2^24 quantization, int64
squared norm, one IEEE sqrt/div/mul sequence in a pinned order), so

* the code dot product approximates ``127² · cosine`` regardless of the
  corpus' norm distribution — no corpus-level scale to fit, drift, or
  re-estimate on sync (an appended batch encodes identically forever);
* every stage — encode, score, rank — is bit-identical in the DuckDB
  twin: integer sums are order-free and the float steps are single
  fixed-order IEEE ops.

Family surface (mirrors PQ/text/fuzzy/winnow/MinHash):
:func:`sq_topk` inline operator, :func:`build_sq_index` /
:func:`sync_sq_index` (managed dataset, O(new vectors) append) /
:func:`search_sq_index` (+ exact rerank when given the corpus), SQL
twins for the oracle gate.

vs PQ (:mod:`~kartothek_spark.operators.pq`): SQ8 is 4× (not 32×)
compression but needs no trained codebooks, has no ADC float tables (so
the approximate scores themselves are value-oracled, not just
recall-gated), and decodes to a usable vector with one multiply. The
reference has no vector layer; the construction is the public FAISS
scalar-quantizer design.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kartothek_spark.core.manifest import DatasetManifest
from kartothek_spark.operators._util import scale_out
from kartothek_spark.operators.similarity import (
    cos_from_ints,
    cos_from_ints_sql,
    qdot,
    qdot_sql,
    quantize,
    quantize_sql,
)

META_DIM = "sq_dim"
META_LEVELS = "sq_levels"
META_COARSE = "sq_coarse"  # IVF coarse centroids (list of lists), optional
SQ_LEVELS = 127  # int8 code range [-127, 127]


def sq_code(vec: Column, levels: int = SQ_LEVELS) -> Column:
    """array<float> → array<tinyint> self-normalized codes. Both the
    fixed-point vector and its squared norm are bound ONCE per row
    (nested lambda variables — a captured expression would re-run the
    full quantization per element, the O(d²) class bug bind_once
    exists for). Zero vectors encode to all-zero codes."""
    bound = F.transform(
        F.array(quantize(vec)),
        lambda qv: F.transform(
            F.array(qdot(qv, qv)),
            lambda nq: F.when(nq == 0, F.transform(qv, lambda x: F.lit(0).cast("tinyint")))
            .otherwise(
                F.transform(
                    qv,
                    lambda x: F.floor(
                        x.cast("double") / F.sqrt(nq.cast("double")) * levels + F.lit(0.5)
                    ).cast("tinyint"),
                )
            ),
        ),
    )
    return F.element_at(F.element_at(bound, 1), 1)


def sq_code_sql(vec: str, dim: int, levels: int = SQ_LEVELS, id_col: str = "vec_id",
                table_sql: str | None = None) -> str:
    """DuckDB twin of :func:`sq_code` as a full SELECT over ``table_sql``
    (staged projections bind qv/nq once, mirroring the Spark nesting)."""
    code = (
        f"CASE WHEN nq = 0 THEN list_transform(qv, x -> CAST(0 AS TINYINT)) "
        f"ELSE list_transform(qv, x -> CAST(floor(CAST(x AS DOUBLE) / sqrt(CAST(nq AS DOUBLE)) * {levels} + 0.5) AS TINYINT)) END"
    )
    return f"""
SELECT {id_col} AS id, {code} AS codes
FROM (
  SELECT {id_col}, qv, {qdot_sql('qv', 'qv', dim)} AS nq
  FROM (SELECT {id_col}, {quantize_sql(vec)} AS qv FROM ({table_sql}))
)
"""


def _code_dot_sql(a: str, b: str, dim: int) -> str:
    # cast before multiply: TINYINT×TINYINT overflows in both engines
    return (
        f"CAST(list_aggregate(list_transform(range(1, {dim + 1}), "
        f"i -> CAST({a}[i] AS BIGINT) * CAST({b}[i] AS BIGINT)), 'sum') AS BIGINT)"
    )


_SQ_SIM_SCHEMA = "query_id long, neighbor_id long, code_dot long"


def _sq_scores(codes: DataFrame, queries: DataFrame, id_col: str, vec_col: str,
               levels: int, q_cells: dict | None = None) -> DataFrame:
    """(query_id, neighbor_id, code_dot) — the query batch's codes are
    computed by the SAME Spark expression as the index (bit-identity with
    the SQL twin), collected (queries are small by contract, exactly as
    in brute_force_topk) and broadcast; the corpus codes stream through
    one exact int64 numpy matmul per Arrow batch. No cross join ever
    materializes. With ``q_cells`` (IVF probing: query id → allowed cell
    set), candidates outside a query's own probed cells are masked."""
    import numpy as np

    spark = codes.sparkSession
    qrows = queries.select(
        F.col(id_col).alias("query_id"), sq_code(F.col(vec_col), levels).alias("__q")
    ).collect()
    q_ids = np.array([r["query_id"] for r in qrows], dtype="int64")
    Qc = np.array([np.asarray(r["__q"], dtype="int64") for r in qrows], dtype="int64")
    bc = spark.sparkContext.broadcast((q_ids, Qc, q_cells))

    def gen(batches):
        import pandas as pd

        b_qids, b_Q, b_cells = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            first = pdf["codes"].iloc[0]
            if isinstance(first, (bytes, bytearray)):  # packed index form
                C = np.array(
                    [np.frombuffer(c, dtype=np.int8) for c in pdf["codes"]], dtype="int64"
                )
            else:  # inline expression form (array<tinyint>)
                C = np.array(
                    [np.asarray(c, dtype="int64") for c in pdf["codes"]], dtype="int64"
                )
            c_ids = pdf["id"].to_numpy(dtype="int64")
            G = C @ b_Q.T  # exact: |code| <= 127, d*127^2 << 2^63
            mask = c_ids[:, None] != b_qids[None, :]
            if b_cells is not None:
                cells = pdf["cell"].to_numpy(dtype="int64")
                allowed = np.array(
                    [
                        [int(c) in b_cells[int(q)] for q in b_qids]
                        for c in np.unique(cells)
                    ]
                )
                cell_pos = {int(c): i for i, c in enumerate(np.unique(cells))}
                mask &= np.array([allowed[cell_pos[int(c)]] for c in cells])
            ii, jj = np.where(mask)
            yield pd.DataFrame({
                "query_id": b_qids[jj],
                "neighbor_id": c_ids[ii],
                "code_dot": G[ii, jj],
            })

    return codes.mapInPandas(gen, _SQ_SIM_SCHEMA)


def sq_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = SQ_LEVELS,
) -> DataFrame:
    """Approximate cosine top-k over int8 codes, computed inline: rank by
    the exact integer code dot (≈ 127²·cosine), ties by neighbor id.
    Output ``(query_id, neighbor_id, rank, code_dot)`` — the scores are
    exact integers, so the gate value-oracles the APPROXIMATION itself,
    not just its recall."""
    codes = scale_out(df).select(
        F.col(id_col).alias("id"), sq_code(F.col(vec_col), levels).alias("codes")
    )
    sims = _sq_scores(codes, queries, id_col, vec_col, levels)
    w = Window.partitionBy("query_id").orderBy(F.desc("code_dot"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "code_dot")
    )


def sq_topk_sql(
    table: str,
    query_filter: str,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = SQ_LEVELS,
) -> str:
    codes = sq_code_sql(vec_col, dim, levels, id_col, f"SELECT * FROM {table}")
    return f"""
WITH coded AS ({codes}),
q AS (
  SELECT c.* FROM coded c JOIN {table} t ON c.id = t.{id_col} WHERE {query_filter}
), sims AS (
  SELECT q.id AS query_id, c.id AS neighbor_id,
         {_code_dot_sql('q.codes', 'c.codes', dim)} AS code_dot
  FROM coded c, q WHERE q.id <> c.id
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, code_dot FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY code_dot DESC, neighbor_id ASC) AS rank
  FROM sims
) WHERE rank <= {k}
"""


def build_sq_index(
    spark,
    df: DataFrame,
    root: str,
    index_uuid: str,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = SQ_LEVELS,
    n_cells: int | None = None,
    seed: int = 42,
    sample_target: int = 65536,
    overwrite: bool = False,
    extra_metadata: dict | None = None,
) -> DatasetManifest:
    """Persist the int8 codes as a managed dataset ``(id: long, codes:
    binary)`` with the d codes PACKED into d bytes — the dataset layer
    width-normalizes integral columns to int64 (reference type-system
    parity), so an honest 1 byte/dim goes through BinaryType, which
    normalization leaves alone. dim/levels ride in manifest metadata.
    Self-normalized codes need no corpus statistics, so there is nothing
    to re-fit on sync.

    With ``n_cells`` this becomes the FAISS IVF-SQ8 deployment shape: a
    coarse k-means quantizer (trained on a bounded deterministic sample,
    stored in manifest metadata) assigns every vector to a cell, the
    dataset is ``partition_on=["cell"]``, and a search's ``nprobe``
    cells resolve to a manifest-pruned file list — the scan reads
    ``~nprobe/n_cells`` of an already-4×-compressed index. Flat form
    (``n_cells=None``) is the exhaustive-scan baseline."""
    from kartothek_spark.dataset.write import store_dataframe_as_dataset

    coarse = None
    if n_cells is not None:
        from kartothek_spark.operators.pq import _normalize, _np_kmeans

        import numpy as np

        n = df.count()
        sample = df.select(F.col(vec_col).alias("v"))
        if n > sample_target:
            sample = sample.sample(False, sample_target / n, seed=seed)
        X = _normalize([np.asarray(r.v, dtype="float64") for r in sample.collect()])
        coarse = _np_kmeans(X, n_cells, seed=seed)
    meta = {META_DIM: dim, META_LEVELS: levels, **(extra_metadata or {})}
    if coarse is not None:
        meta[META_COARSE] = [[float(x) for x in row] for row in coarse]
    return store_dataframe_as_dataset(
        spark,
        _packed_codes(df, id_col, vec_col, levels, coarse),
        root,
        index_uuid,
        partition_on=["cell"] if coarse is not None else (),
        metadata=meta,
        overwrite=overwrite,
    )


def _packed_codes(
    df: DataFrame, id_col: str, vec_col: str, levels: int, coarse=None
) -> DataFrame:
    """(id[, cell], codes: binary) — the tinyint code array packed to d
    bytes per vector, plus (IVF form) the nearest-coarse-centroid cell of
    the NORMALIZED vector (one Arrow batch pass; build-time only, like
    PQ's encoder)."""
    import numpy as np

    coded = df.select(
        F.col(id_col).alias("id"),
        sq_code(F.col(vec_col), levels).alias("codes"),
        *([F.col(vec_col).alias("__v")] if coarse is not None else []),
    )
    if coarse is None:

        def pack(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                pdf["codes"] = [
                    np.asarray(c, dtype=np.int8).tobytes() for c in pdf["codes"]
                ]
                yield pdf

        return coded.mapInPandas(pack, "id long, codes binary")

    bc = df.sparkSession.sparkContext.broadcast(np.asarray(coarse, dtype="float64"))

    def pack_cells(batches):
        import pandas as pd

        C = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array([np.asarray(v, dtype="float64") for v in pdf["__v"]])
            nrm = np.sqrt((V * V).sum(-1, keepdims=True))
            nrm[nrm == 0] = 1.0
            V = V / nrm
            d = (V * V).sum(1)[:, None] - 2.0 * (V @ C.T) + (C * C).sum(1)[None, :]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "cell": d.argmin(1).astype("int32"),
                    "codes": [
                        np.asarray(c, dtype=np.int8).tobytes() for c in pdf["codes"]
                    ],
                }
            )

    return coded.mapInPandas(pack_cells, "id long, cell int, codes binary")


def sync_sq_index(
    spark,
    new_vectors: DataFrame,
    root: str,
    index_uuid: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_metadata: dict | None = None,
) -> DatasetManifest:
    """O(new vectors) atomic append — encoding parameters read back from
    the manifest, and self-normalization guarantees the appended codes
    are exactly what a full rebuild would produce."""
    from kartothek_spark.dataset.write import update_dataset

    import numpy as np

    manifest = DatasetManifest.load(root, index_uuid)
    levels = int(manifest.metadata[META_LEVELS])
    coarse = manifest.metadata.get(META_COARSE)
    if coarse is not None:
        coarse = np.asarray(coarse, dtype="float64")
    return update_dataset(
        spark,
        _packed_codes(new_vectors, id_col, vec_col, levels, coarse),
        root,
        index_uuid,
        metadata=dict(extra_metadata or {}),
    )


def search_sq_index(
    spark,
    root: str,
    index_uuid: str,
    queries: DataFrame,
    k: int = 5,
    refine: int = 4,
    corpus: DataFrame | None = None,
    nprobe: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k against the persisted codes: queries are encoded on the fly
    at the index's levels, the scan reads 1 byte/dim, and the whole
    query BATCH rides one corpus pass (broadcast query codes). Without
    ``corpus``: ``(query_id, neighbor_id, rank, code_dot)``, ranks in
    exact integer code-dot order. With ``corpus``: the per-query
    ``refine·k`` shortlist is re-ranked by exact fixed-point cosine
    against the full-precision vectors — a semi-join pruned second pass
    — and the output is ``(query_id, neighbor_id, rank, cos_sim)``.

    On an IVF index (built with ``n_cells``), ``nprobe`` limits each
    query to its nprobe nearest coarse cells: the union of probed cells
    becomes ONE ``cell IN (...)`` predicate (manifest-pruned scan) and
    candidates outside a query's own cells are masked batch-side.
    ``nprobe=None`` or ``nprobe >= n_cells`` probes everything and is
    value-identical to the flat index (tested)."""
    import numpy as np

    from kartothek_spark.dataset.read import read_table

    manifest = DatasetManifest.load(root, index_uuid)
    levels = int(manifest.metadata[META_LEVELS])
    coarse = manifest.metadata.get(META_COARSE)
    q_cells = None
    if coarse is not None and nprobe is not None and nprobe < len(coarse):
        C = np.asarray(coarse, dtype="float64")
        qrows = queries.select(
            F.col(id_col).alias("qid"), F.col(vec_col).alias("v")
        ).collect()
        V = np.array([np.asarray(r.v, dtype="float64") for r in qrows])
        nrm = np.sqrt((V * V).sum(-1, keepdims=True))
        nrm[nrm == 0] = 1.0
        V = V / nrm
        d = (V * V).sum(1)[:, None] - 2.0 * (V @ C.T) + (C * C).sum(1)[None, :]
        cells_per_q = np.argsort(d, axis=1, kind="stable")[:, :nprobe]
        q_cells = {int(r.qid): set(map(int, cells_per_q[i])) for i, r in enumerate(qrows)}
        probed = sorted({c for s in q_cells.values() for c in s})
        codes = read_table(
            spark, root, index_uuid, predicates=[[("cell", "in", probed)]]
        ).select("id", F.col("cell").cast("int").alias("cell"), "codes")
    else:
        cols = ["id", "codes"] if coarse is None else ["id", "cell", "codes"]
        codes = read_table(spark, root, index_uuid, columns=cols).select("id", "codes")
    sims = _sq_scores(codes, queries, id_col, vec_col, levels, q_cells=q_cells)
    w = Window.partitionBy("query_id").orderBy(F.desc("code_dot"), F.asc("neighbor_id"))
    ranked = sims.withColumn("rank", F.row_number().over(w))
    if corpus is None:
        return ranked.where(F.col("rank") <= k).select(
            "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "code_dot"
        )

    shortlist = ranked.where(F.col("rank") <= refine * k).select("query_id", "neighbor_id")
    cq = corpus.select(F.col(id_col).alias("neighbor_id"), quantize(F.col(vec_col)).alias("__cv"))
    qq = queries.select(F.col(id_col).alias("query_id"), quantize(F.col(vec_col)).alias("__qv"))
    exact = (
        shortlist.join(cq, "neighbor_id")
        .join(F.broadcast(qq), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cos_from_ints(
                qdot(F.col("__qv"), F.col("__cv")),
                qdot(F.col("__qv"), F.col("__qv")),
                qdot(F.col("__cv"), F.col("__cv")),
            ).alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cos_sim")
    )


def search_sq_rerank_sql(
    table: str,
    query_filter: str,
    k: int,
    refine: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = SQ_LEVELS,
) -> str:
    """DuckDB twin of :func:`search_sq_index` WITH the exact rerank —
    shortlist by integer code dot, re-rank by exact fixed-point cosine."""
    codes = sq_code_sql(vec_col, dim, levels, id_col, f"SELECT * FROM {table}")
    cos = cos_from_ints_sql(qdot_sql("qq.qv", "cc.qv", dim), "qq.n", "cc.n")
    return f"""
WITH coded AS ({codes}),
q AS (
  SELECT c.* FROM coded c JOIN {table} t ON c.id = t.{id_col} WHERE {query_filter}
), sims AS (
  SELECT q.id AS query_id, c.id AS neighbor_id,
         {_code_dot_sql('q.codes', 'c.codes', dim)} AS code_dot
  FROM coded c, q WHERE q.id <> c.id
), shortlist AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY code_dot DESC, neighbor_id ASC) AS r
    FROM sims
  ) WHERE r <= {refine * k}
), quant AS (
  SELECT {id_col} AS id, {quantize_sql(vec_col)} AS qv FROM {table}
), nq AS (
  SELECT id, qv, {qdot_sql('qv', 'qv', dim)} AS n FROM quant
), exact AS (
  SELECT s.query_id, s.neighbor_id, {cos} AS cos_sim
  FROM shortlist s
  JOIN nq cc ON cc.id = s.neighbor_id
  JOIN nq qq ON qq.id = s.query_id
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM exact
) WHERE rank <= {k}
"""


__all__ = [
    "sq_code",
    "sq_topk",
    "build_sq_index",
    "sync_sq_index",
    "search_sq_index",
    "sq_topk_sql",
    "search_sq_rerank_sql",
]
