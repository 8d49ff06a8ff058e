"""Corpus keyword search: TF-IDF/BM25 scoring as pure DataFrame algebra.

The retrieval primitive a training-data pipeline uses for targeted corpus
audits ("show me the docs about X") and quality-weighted source selection.

Scale shape: the query term list is tiny and inlined as a literal filter,
so the corpus-side cost is one tokenize + explode restricted to matching
terms (everything else drops at the scan projection), one combinable
``(doc, term) -> tf`` aggregation that carries the per-document length
along (constant per doc — no corpus-sized doc-length frame is ever
joined, let alone broadcast), one ``term -> df`` aggregation over that
(vocabulary-of-the-query sized, the only broadcast), and a distributed
``TakeOrderedAndProject`` top-k — no global single-partition window ever
sees more than ``k`` rows. No all-terms inverted index is materialized.

Determinism: IDF/TF arithmetic is fixed-order — per-document term scores
are folded LEFT-TO-RIGHT in sorted term order (floating-point addition is
not associative; an unordered SUM would be partitioning-dependent), and
the result is rounded to 6 decimals, the same discipline the cosine
operators use. Ties rank by (score DESC, doc id ASC).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kartothek_spark.functions.hashing import tokens, tokens_sql

BM25_K1 = 1.2
BM25_B = 0.75


def _bm25_scored(tf: DataFrame, n_docs: int, avgdl: float) -> DataFrame:
    """Per-(doc, term) BM25 contributions ``(__id, __term, __s)`` — the
    ONE scoring expression tree every ranking path shares (on-the-fly,
    persisted-index single-query, persisted-index batched): df(term) from
    the distinct postings, rounded idf, rounded per-term score."""
    dfreq = tf.groupBy("__term").agg(F.count("*").cast("double").alias("__df"))
    idf = F.round(
        F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("__df") + 0.5) / (F.col("__df") + 0.5)),
        9,
    )
    return (
        tf.join(F.broadcast(dfreq.select("__term", idf.alias("__idf"))), "__term")
        .select(
            "__id",
            "__term",
            F.round(
                F.col("__idf")
                * (F.col("__tf") * (BM25_K1 + 1))
                / (
                    F.col("__tf")
                    + BM25_K1 * (1 - BM25_B + BM25_B * F.col("__dl") / F.lit(avgdl))
                ),
                9,
            ).alias("__s"),
        )
    )


def _fold_scores(scored: DataFrame, keys: list[str]) -> DataFrame:
    """Fixed-order fold shared by every ranking path: sort each group's
    (term, score) pairs by term and add left-to-right — bit-stable under
    any partitioning."""
    return (
        scored.groupBy(*keys)
        .agg(F.sort_array(F.collect_list(F.struct("__term", "__s"))).alias("__ts"))
        .select(
            *keys,
            F.round(
                F.aggregate(
                    "__ts", F.lit(0.0), lambda acc, x: acc + x.getField("__s")
                ),
                6,
            ).alias("score"),
        )
    )


def _bm25_rank(
    tf: DataFrame, n_docs: int, avgdl: float, k: int, id_col: str
) -> DataFrame:
    """Shared BM25 scorer over a ``(__id, __dl double, __term, __tf
    double)`` frame restricted to the query terms — the SINGLE expression
    tree both :func:`bm25_search` (on-the-fly) and
    :func:`~kartothek_spark.operators.search_index.search_text_index`
    (persisted postings) rank with, so the two paths are value-identical
    by construction (same exact inputs → same IEEE ops → same rounds)."""
    folded = _fold_scores(_bm25_scored(tf, n_docs, avgdl), ["__id"])
    # distributed top-k (TakeOrderedAndProject): per-partition heaps, one
    # driver merge of <= k * n_partitions rows; the rank window only ever
    # sees the <= k survivors, never the corpus
    top = folded.orderBy(F.desc("score"), F.asc("__id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("__id"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select(F.col("__id").alias(id_col), "score", "rank")
    )


def bm25_search(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents for a bag-of-words query under Okapi BM25
    (k1=1.2, b=0.75, idf = ln(1 + (N - df + 0.5) / (df + 0.5))).
    Returns (id, score, rank) for the k best-scoring docs."""
    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        raise ValueError("query_terms must be non-empty")

    base = df.select(F.col(id_col).alias("__id"), tokens(F.col(text_col)).alias("__t"))
    # one small driver-side agg for N and avgdl (two scalars — the only
    # driver values; both are exact integers so cross-engine safe)
    row = base.agg(
        F.count("*").alias("n"), F.sum(F.size("__t")).alias("total")
    ).collect()[0]
    n_docs, total_len = int(row["n"]), float(row["total"] or 0.0)
    if n_docs == 0:
        raise ValueError("empty corpus")
    avgdl = total_len / n_docs

    # __dl rides along through the explode + tf aggregation: it is
    # functionally dependent on __id, so adding it to the grouping keys
    # costs nothing and saves the per-document length join entirely
    tf = (
        base.select(
            "__id",
            F.size("__t").cast("double").alias("__dl"),
            F.explode("__t").alias("__term"),
        )
        .where(F.col("__term").isin(terms))
        .groupBy("__id", "__dl", "__term")
        .agg(F.count("*").cast("double").alias("__tf"))
    )
    return _bm25_rank(tf, n_docs, avgdl, k, id_col)


def _bm25_rank_grouped(
    tf: DataFrame,
    queries: DataFrame,
    n_docs: int,
    avgdl: float,
    k: int,
    id_col: str,
    qid_col: str = "query_id",
) -> DataFrame:
    """Batched BM25: rank MANY queries in one plan. ``tf`` is the
    distinct ``(__id, __dl, __term, __tf)`` postings frame restricted to
    the UNION of all queries' terms; ``queries`` the exploded
    ``(__qid, __term)`` pairs. Per-query results are value-identical to
    :func:`_bm25_rank` run per query, by construction: ``df(term)`` is a
    corpus property computed on the distinct postings BEFORE the
    per-query fan-out (the SHARED :func:`_bm25_scored` tree — identity is
    structural, not maintained by hand), and each (query, doc) fold
    collects exactly the term set the single-query plan would. The top-k
    is a window PARTITIONED BY query — each partition holds only that
    query's candidate docs (bounded by the postings of its terms), never
    the corpus, and never global."""
    # per-query fan-out AFTER scoring: a term shared by q queries
    # replicates only its (id, term, score) rows, never the raw tf
    scored = _bm25_scored(tf, n_docs, avgdl).join(F.broadcast(queries), "__term")
    folded = _fold_scores(scored, ["__qid", "__id"])
    w = Window.partitionBy("__qid").orderBy(F.desc("score"), F.asc("__id"))
    return (
        folded.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(qid_col), F.col("__id").alias(id_col),
            "score", "rank",
        )
    )


def bm25_search_sql(
    table: str,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    terms = sorted({t.lower() for t in query_terms})
    lst = ", ".join(f"'{t}'" for t in terms)
    toks = tokens_sql(text_col)
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {toks} AS t FROM {table}
), lens AS (
  SELECT id, CAST(len(t) AS DOUBLE) AS dl FROM base
), corpus AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, sum(dl) / count(*) AS avgdl FROM lens
), tf AS (
  SELECT id, term, CAST(count(*) AS DOUBLE) AS tf
  FROM (SELECT id, unnest(t) AS term FROM base)
  WHERE term IN ({lst})
  GROUP BY id, term
), dfreq AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.id, tf.term,
         round(round(ln(1.0 + (corpus.n - df + 0.5) / (df + 0.5)), 9)
               * (tf.tf * ({BM25_K1} + 1))
               / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * lens.dl / corpus.avgdl)), 9) AS s
  FROM tf JOIN dfreq USING (term) JOIN lens ON tf.id = lens.id CROSS JOIN corpus
), folded AS (
  SELECT id,
         round(list_reduce(list_prepend(0.0,
                 list_transform(list_sort(list(struct_pack(term := term, s := s))), x -> x.s)),
               (a, b) -> a + b), 6) AS score
  FROM scored GROUP BY id
)
SELECT id AS {id_col}, score, rank FROM (
  SELECT id, score, CAST(row_number() OVER (ORDER BY score DESC, id ASC) AS BIGINT) AS rank
  FROM folded
) WHERE rank <= {k}
"""


def rrf_fuse(
    ranked: list[DataFrame],
    k: int = 10,
    rrf_k: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion of ranked candidate lists (Cormack et al.):
    ``score(d) = Σ_lists 1 / (rrf_k + rank_list(d))``, lists where ``d``
    is absent contributing 0. Returns ``(id, rrf_score, rank)`` for the
    top k.

    Scale shape: every input list is already top-depth truncated by its
    retriever, so the fusion operates on ≤ Σ depth_i rows — the final
    global rank window is bounded by construction, never by corpus size.
    Determinism: contributions are added left-to-right in list order
    (fixed expression tree), score rounded to 6 decimals, ties rank by
    id ascending."""
    if not ranked:
        raise ValueError("ranked must contain at least one list")
    fused: DataFrame | None = None
    for i, r in enumerate(ranked):
        contrib = r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("rank").cast("double"))).alias(
                f"__c{i}"
            ),
        )
        fused = contrib if fused is None else fused.join(contrib, id_col, "full_outer")
    total = F.coalesce(F.col("__c0"), F.lit(0.0))
    for i in range(1, len(ranked)):
        total = total + F.coalesce(F.col(f"__c{i}"), F.lit(0.0))
    w = Window.orderBy(F.desc("rrf_score"), F.asc(id_col))
    return (
        fused.select(id_col, F.round(total, 6).alias("rrf_score"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def hybrid_search(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    k: int = 10,
    depth: int = 50,
    rrf_k: int = 60,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    dense: str = "brute",
    index_root: str | None = None,
    index_uuid: str | None = None,
    nprobe: int = 4,
) -> DataFrame:
    """Hybrid retrieval — the standard RAG pattern: a lexical BM25 pass
    and a dense cosine top-k pass each retrieve ``depth`` candidates,
    fused by reciprocal-rank fusion into the final top ``k``.

    ``query_vec_id`` names the query's dense representation in
    ``embeddings`` (joinable to ``docs`` on id); both retrievers are the
    scale-validated operators (:func:`bm25_search` — query-term-restricted
    explode, no inverted index; the dense leg per ``dense``). The fusion
    contract is just ``(id, rank)`` lists.

    ``dense`` selects the dense retriever: ``"brute"`` (exact — broadcast
    query row, one matmul pass; the small/medium-corpus default),
    ``"lsh"`` (multi-table random-hyperplane LSH — the billion-vector
    scale path; candidates are bucket-joined, never a full scan per
    query), ``"ivf"`` (inverted-file coarse quantizer — probe-pruned
    cells), or ``"pq"`` (the PERSISTED IVF-PQ index built by
    :func:`~kartothek_spark.operators.pq.build_pq_index` — pass its
    ``index_root``/``index_uuid``; the dense leg becomes a cell-pruned
    read of 32x-compressed codes with an exact cosine re-rank over
    ``embeddings``, the billion-vector path when the index already
    exists). The ANN compositions' fused-recall floors are pinned by the
    ``corpus_hybrid_ann`` / ``corpus_hybrid_pq`` gates."""
    from kartothek_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_topk,
    )

    bm = bm25_search(docs, query_terms, k=depth, text_col=text_col, id_col=id_col)
    qdf = embeddings.where(F.col(vec_id_col) == query_vec_id)
    if dense == "brute":
        vec = brute_force_topk(
            embeddings, qdf, k=depth, id_col=vec_id_col, vec_col=vec_col, dim=dim
        )
    elif dense == "lsh":
        if dim is None:
            # brute/ivf tolerate dim=None (inferred / unused); the LSH leg
            # sizes its constant hyperplane tensor from it — fail clearly
            # instead of a TypeError deep inside the plane generator
            raise ValueError("dim is required when dense='lsh'")
        vec = lsh_topk(
            embeddings, qdf, k=depth, dim=dim, id_col=vec_id_col, vec_col=vec_col
        )
    elif dense == "ivf":
        vec = ivf_topk(
            embeddings, qdf, k=depth, dim=dim, id_col=vec_id_col, vec_col=vec_col
        )
    elif dense == "pq":
        if not index_root or not index_uuid:
            raise ValueError(
                "dense='pq' searches a persisted IVF-PQ index — pass "
                "index_root and index_uuid (build_pq_index creates one)"
            )
        from kartothek_spark.operators.pq import search_pq_index

        vec = search_pq_index(
            docs.sparkSession, index_root, index_uuid, qdf,
            k=depth, nprobe=nprobe, corpus=embeddings,
            id_col=vec_id_col, vec_col=vec_col,
        )
    else:
        raise ValueError(f"dense must be brute|lsh|ivf|pq, got {dense!r}")
    return rrf_fuse(
        [
            bm.select(F.col(id_col), "rank"),
            vec.select(F.col("neighbor_id").alias(id_col), "rank"),
        ],
        k=k,
        rrf_k=rrf_k,
        id_col=id_col,
    )


def hybrid_search_sql(
    docs_table: str,
    emb_table: str,
    query_terms: list[str],
    query_vec_id: int,
    k: int,
    dim: int,
    depth: int = 50,
    rrf_k: int = 60,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    from kartothek_spark.operators.similarity import brute_force_topk_sql

    bm = bm25_search_sql(docs_table, query_terms, k=depth, text_col=text_col, id_col=id_col)
    vec = brute_force_topk_sql(
        emb_table,
        f"{vec_id_col} = {query_vec_id}",
        k=depth,
        dim=dim,
        id_col=vec_id_col,
        vec_col=vec_col,
    )
    return f"""
WITH bm AS ({bm}), vec AS ({vec}),
bmc AS (SELECT {id_col} AS id, 1.0 / ({rrf_k} + CAST(rank AS DOUBLE)) AS c0 FROM bm),
vc AS (SELECT neighbor_id AS id, 1.0 / ({rrf_k} + CAST(rank AS DOUBLE)) AS c1 FROM vec),
fused AS (
  SELECT COALESCE(bmc.id, vc.id) AS id,
         round(COALESCE(c0, 0.0) + COALESCE(c1, 0.0), 6) AS rrf_score
  FROM bmc FULL OUTER JOIN vc ON bmc.id = vc.id
)
SELECT id AS {id_col}, rrf_score, rank FROM (
  SELECT id, rrf_score,
         CAST(row_number() OVER (ORDER BY rrf_score DESC, id ASC) AS BIGINT) AS rank
  FROM fused
) WHERE rank <= {k}
"""


__all__ = [
    "bm25_search",
    "bm25_search_sql",
    "hybrid_search",
    "hybrid_search_sql",
    "rrf_fuse",
]
