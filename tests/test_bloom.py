"""Bloom membership-index family (operators/bloom.py): value parity
with the exact contamination operators, no-false-negative guarantee,
probe-path parity, and persisted-index lifecycle."""

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def _bench(docs):
    return docs.where(F.col("doc_id") % 11 == 0).select(
        "doc_id", F.expr("substring(text, 12)").alias("text")
    )


M = 1 << 16


def test_bloom_hits_equal_exact(spark):
    """Bloom prefilter + exact verification must reproduce the
    broadcast-join operator exactly — Bloom filters have no false
    negatives and verification kills the false positives."""
    from kartothek_spark.operators.bloom import bloom_contamination_hits
    from kartothek_spark.operators.contamination import contamination_hits

    docs = _docs(spark)
    bench = _bench(docs)
    exact = {(r.doc_id, r.n_hits) for r in contamination_hits(docs, bench, n=8).collect()}
    bloom = {
        (r.doc_id, r.n_hits)
        for r in bloom_contamination_hits(docs, bench, n=8, m_bits=M).collect()
    }
    assert exact and bloom == exact


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    """Every inserted key passes the membership expression (structural
    no-false-negative guarantee); a disjoint probe set passes only at
    the designed false-positive rate."""
    import random

    from kartothek_spark.operators.bloom import (
        DEFAULT_BLOOM_K,
        bloom_member_expr,
        bloom_words,
        dense_words,
    )

    rng = random.Random(42)
    members = sorted(rng.sample(range(1, 1 << 60), 500))
    others = sorted(rng.sample(range(1, 1 << 60), 2000))
    others = [x for x in others if x not in set(members)]

    keys = spark.createDataFrame([(k,) for k in members], "kh long")
    m_bits = 1 << 14  # ~32 bits/key -> FP well under 1%
    words = dense_words(bloom_words(keys, m_bits).collect(), m_bits)

    probe = spark.createDataFrame(
        [(k, True) for k in members] + [(k, False) for k in others],
        "kh long, is_member boolean",
    )
    got = probe.select(
        "kh",
        "is_member",
        bloom_member_expr(F.col("kh"), words, m_bits, DEFAULT_BLOOM_K).alias("hit"),
    ).collect()
    false_negatives = [r.kh for r in got if r.is_member and not r.hit]
    assert false_negatives == []
    fp = sum(1 for r in got if not r.is_member and r.hit)
    assert fp / len(others) < 0.01


def test_bloom_expr_vs_numpy_path_parity(spark):
    """The inline-literal codegen path and the vectorized NumPy
    mapInPandas path (bitmaps past EXPR_MAX_WORDS) must keep the exact
    same candidate shingle set — the codegen-limit seam can never
    diverge."""
    import kartothek_spark.operators.bloom as B

    docs = _docs(spark)
    bench = _bench(docs)
    keys = B._bench_shingle_keys(bench, 8, "text")
    words = B.dense_words(B.bloom_words(keys, M).collect(), M)

    def cand():
        return {
            (r.doc_id, r.kh)
            for r in B._candidate_shingles(
                docs, words, M, B.DEFAULT_BLOOM_K, "text", "doc_id", 8
            ).collect()
        }

    expr_rows = cand()
    old = B.EXPR_MAX_WORDS
    B.EXPR_MAX_WORDS = 1  # force the NumPy path
    try:
        np_rows = cand()
    finally:
        B.EXPR_MAX_WORDS = old
    assert expr_rows and expr_rows == np_rows


def test_bloom_scalar_expr_vs_numpy_parity(spark):
    """The scalar-column membership filter (the streaming pipeline's
    seen-fingerprint path) keeps the same rows through the codegen and
    NumPy paths."""
    import random

    import kartothek_spark.operators.bloom as B

    rng = random.Random(7)
    members = rng.sample(range(1, 1 << 60), 300)
    probe_vals = members[:150] + rng.sample(range(1, 1 << 60), 500)
    keys = spark.createDataFrame([(x,) for x in members], "kh long")
    m_bits = 1 << 14
    words = B.dense_words(B.bloom_words(keys, m_bits).collect(), m_bits)
    probe = spark.createDataFrame([(x,) for x in probe_vals], "fp long")

    expr_hits = {
        r.fp for r in B.bloom_member_scalar(probe, "fp", words, m_bits, 6).collect()
    }
    old = B.EXPR_MAX_WORDS
    B.EXPR_MAX_WORDS = 1
    try:
        np_hits = {
            r.fp for r in B.bloom_member_scalar(probe, "fp", words, m_bits, 6).collect()
        }
    finally:
        B.EXPR_MAX_WORDS = old
    assert set(members[:150]) <= expr_hits  # no false negatives
    assert expr_hits == np_hits


def test_bloom_index_sync_equals_build(spark, tmp_root):
    """build(half) + sync(half) == build(full): identical bitmap words
    AND identical key sets — the bitmap is rebuilt from the persisted
    key set, so sync is history-independent by construction."""
    from kartothek_spark.dataset.read import read_table
    from kartothek_spark.operators.bloom import build_bloom_index, sync_bloom_index

    docs = _docs(spark)
    bench = _bench(docs)
    b1 = bench.where(F.col("doc_id") % 22 == 0)
    b2 = bench.where(F.col("doc_id") % 22 != 0)

    build_bloom_index(spark, b1, tmp_root, "inc", n=8, m_bits=M)
    sync_bloom_index(spark, b2, tmp_root, "inc")
    build_bloom_index(spark, bench, tmp_root, "full", n=8, m_bits=M)

    w_inc = {(r.word_idx, r.word) for r in read_table(spark, tmp_root, "inc").collect()}
    w_full = {(r.word_idx, r.word) for r in read_table(spark, tmp_root, "full").collect()}
    assert w_inc == w_full
    k_inc = {r.kh for r in read_table(spark, tmp_root, "inc__keys").collect()}
    k_full = {r.kh for r in read_table(spark, tmp_root, "full__keys").collect()}
    assert k_inc == k_full


def test_bloom_sync_redelivery_and_torn_state_heal(spark, tmp_root):
    """Re-shipping an already-indexed suite appends nothing (content-
    hash idempotency), and a torn two-dataset state (keys appended,
    bitmap stale — the crash window between sync's two commits) is
    repaired by the replayed sync because the rebuild reads the
    persisted key set, not the incoming batch."""
    from kartothek_spark.dataset.read import read_table
    from kartothek_spark.dataset.write import update_dataset
    from kartothek_spark.operators.bloom import (
        _bench_shingle_keys,
        bloom_contamination_hits_indexed,
        build_bloom_index,
        sync_bloom_index,
    )
    from kartothek_spark.operators.contamination import contamination_hits

    docs = _docs(spark)
    bench = _bench(docs)
    b1 = bench.where(F.col("doc_id") % 22 == 0)
    b2 = bench.where(F.col("doc_id") % 22 != 0)

    build_bloom_index(spark, b1, tmp_root, "bx", n=8, m_bits=M)
    # simulate the crash window: b2's keys land but the bitmap rebuild
    # never ran (sync's first commit only)
    known = read_table(spark, tmp_root, "bx__keys")
    update_dataset(
        spark,
        _bench_shingle_keys(b2, 8, "text").join(known, "kh", "left_anti"),
        tmp_root,
        "bx__keys",
        sort_partitions_by=["kh"],
    )
    # the replayed sync appends nothing new but rebuilds the bitmap
    sync_bloom_index(spark, b2, tmp_root, "bx")

    exact = {(r.doc_id, r.n_hits) for r in contamination_hits(docs, bench, n=8).collect()}
    got = {
        (r.doc_id, r.n_hits)
        for r in bloom_contamination_hits_indexed(spark, docs, tmp_root, "bx").collect()
    }
    assert got == exact
    # keys stayed a set: no duplicates from the re-delivery
    keys = read_table(spark, tmp_root, "bx__keys").collect()
    assert len(keys) == len({r.kh for r in keys})


def test_bloom_oversize_raises():
    from kartothek_spark.operators.bloom import MAX_BLOOM_BITS, _size_m

    with pytest.raises(ValueError, match="exact broadcast-join"):
        _size_m(MAX_BLOOM_BITS)  # 16 bits/key would blow the cap


def test_bloom_build_validates_explicit_m_bits(spark, tmp_root):
    """Persisted bitmaps reject a user-supplied m_bits that is not a
    power of two within [MIN, MAX]: the auto-resize doubling loop and
    the driver-collect cap both assume the invariant (ADVICE r8 #4)."""
    from kartothek_spark.operators.bloom import (
        MAX_BLOOM_BITS,
        MIN_BLOOM_BITS,
        build_bloom_index,
    )

    docs = _docs(spark)
    bench = _bench(docs)
    for bad in [(1 << 16) + 1, MIN_BLOOM_BITS // 2, MAX_BLOOM_BITS * 2, 0, -8]:
        with pytest.raises(ValueError, match="power of two"):
            build_bloom_index(spark, bench, tmp_root, "vb", n=8, m_bits=bad)


def test_bloom_hash_version_probe_rejects_sync_heals(spark, tmp_root):
    """A persisted bitmap built under an older hash version must never
    be probed (silent false negatives — ADVICE r8 #2): loads reject on
    the manifest's version stamp; sync rebuilds from the version-free
    key set and re-stamps, after which probes match the exact operator."""
    from kartothek_spark.core.manifest import DatasetManifest
    from kartothek_spark.operators.bloom import (
        BLOOM_HASH_VERSION,
        META_HASH_VERSION,
        bloom_contamination_hits_indexed,
        build_bloom_index,
        sync_bloom_index,
    )
    from kartothek_spark.operators.contamination import contamination_hits

    docs = _docs(spark)
    bench = _bench(docs)
    build_bloom_index(spark, bench, tmp_root, "hv", n=8, m_bits=M)
    m = DatasetManifest.load(tmp_root, "hv")
    assert int(m.metadata[META_HASH_VERSION]) == BLOOM_HASH_VERSION
    # simulate an index persisted under the previous hashing
    m.metadata[META_HASH_VERSION] = BLOOM_HASH_VERSION - 1
    m.commit(check_conflict=False)

    with pytest.raises(ValueError, match="hash version"):
        bloom_contamination_hits_indexed(spark, docs, tmp_root, "hv").collect()

    # sync heals: rebuild from the persisted keys, stamp current version
    with pytest.warns(UserWarning, match="hash version"):
        sync_bloom_index(spark, bench.limit(0), tmp_root, "hv")
    assert (
        int(DatasetManifest.load(tmp_root, "hv").metadata[META_HASH_VERSION])
        == BLOOM_HASH_VERSION
    )
    exact = {(r.doc_id, r.n_hits) for r in contamination_hits(docs, bench, n=8).collect()}
    got = {
        (r.doc_id, r.n_hits)
        for r in bloom_contamination_hits_indexed(spark, docs, tmp_root, "hv").collect()
    }
    assert got == exact


def test_bloom_sync_warns_on_saturation(spark, tmp_root):
    """Growing the key set past ~8 bits/key must surface: since round 8
    a growable bitmap AUTO-RESIZES (warning says so); the
    'cannot grow' message is reserved for the MAX_BLOOM_BITS cap."""
    import warnings as w

    from pyspark.sql import functions as F

    from kartothek_spark.operators.bloom import build_bloom_index, sync_bloom_index

    docs = _docs(spark)
    bench = _bench(docs)
    # tiny bitmap: the benchmark slice carries thousands of shingles
    build_bloom_index(
        spark, bench.where(F.col("doc_id") % 22 == 0), tmp_root, "sat",
        n=8, m_bits=1 << 13,
    )
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        sync_bloom_index(spark, bench.where(F.col("doc_id") % 22 != 0), tmp_root, "sat")
    assert any("auto-resizing" in str(c.message) for c in caught)
    assert not any("cannot grow" in str(c.message) for c in caught)


# --- property test: no false negatives under adversarial m/k ---------------

try:
    from hypothesis import HealthCheck, given, settings, strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

_spark_for_prop = None


@pytest.fixture()
def prop_spark(spark):
    # hypothesis forbids function-scoped fixtures inside @given bodies
    # re-running per example; stash the session module-globally instead
    global _spark_for_prop
    _spark_for_prop = spark
    return spark


def _words_via_spark_and_duckdb(keys, m_bits, k):
    """Build the bitmap in BOTH engines and assert bit-for-bit equality;
    return the dense word list."""
    import duckdb

    from kartothek_spark.operators.bloom import bloom_words, bloom_words_sql, dense_words

    spark = _spark_for_prop
    kdf = spark.createDataFrame([(x,) for x in keys], "kh long")
    rows = bloom_words(kdf, m_bits, k=k).collect()
    values = ", ".join(f"({x})" for x in keys)
    sql = bloom_words_sql(f"SELECT kh FROM (VALUES {values}) t(kh)", m_bits, k=k)
    oracle = duckdb.sql(sql).fetchall()
    assert sorted((int(a), int(b)) for a, b in rows) == sorted(
        (int(a), int(b)) for a, b in oracle
    )
    return dense_words(rows, m_bits)


def _py_member(h, words, m_bits, k):
    h1 = h % (1 << 32)
    h2 = ((h >> 32) | 1) % (1 << 32)
    for i in range(k):
        pos = (h1 + i * h2) % m_bits
        if (words[pos // 63] >> (pos % 63)) & 1 != 1:
            return False
    return True


if HAVE_HYPOTHESIS:

    @settings(
        max_examples=12,
        deadline=None,
        # the shared SparkSession is stateless across examples — reuse is safe
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        keys=st.lists(st.integers(0, (1 << 60) - 1), min_size=1, max_size=60, unique=True),
        m_bits=st.sampled_from([127, 8191, 1 << 13, (1 << 16) + 1, 1 << 16]),
        k=st.integers(1, 8),
    )
    def test_bloom_property_no_false_negative(prop_spark, keys, m_bits, k):
        """For ANY key set and adversarial (m, k) — non-power-of-two and
        tiny bitmaps included — every inserted key must pass the
        membership expression, and the Spark bitmap must equal the
        DuckDB SQL construction word for word (the load-bearing
        contract behind the three Bloom gates and the streaming
        cleaner; false POSITIVES are allowed and killed downstream by
        exact verification)."""
        from kartothek_spark.operators.bloom import bloom_member_expr

        words = _words_via_spark_and_duckdb(keys, m_bits, k)
        # python reference: every true key is a member
        assert all(_py_member(h, words, m_bits, k) for h in keys)
        # spark expression path agrees on every true key
        spark = _spark_for_prop
        kdf = spark.createDataFrame([(x,) for x in keys], "kh long")
        n_member = kdf.where(
            bloom_member_expr(F.col("kh"), words, m_bits, k)
        ).count()
        assert n_member == len(keys)


def test_bloom_no_false_negative_near_cap(spark):
    """At the 2^26-bit cap the inline-expression path is out of contract
    (EXPR_MAX_WORDS) — the deployed path is the vectorized NumPy
    prefilter; its arithmetic must keep the no-false-negative guarantee
    at the cap boundary, and the sparse bitmap must still match DuckDB."""
    global _spark_for_prop
    _spark_for_prop = spark
    import numpy as np
    import pandas as pd

    from kartothek_spark.operators.bloom import (
        MAX_BLOOM_BITS,
        _np_scalar_prefilter_func,
        dense_words,
    )

    keys = [0, 1, (1 << 60) - 1, 123456789123456789 % (1 << 60), 982451653]
    m, k = MAX_BLOOM_BITS, 6
    words = _words_via_spark_and_duckdb(keys, m, k)
    run = _np_scalar_prefilter_func(words, m, k, "kh")
    out = list(run(iter([pd.DataFrame({"kh": np.array(keys, dtype=np.int64)})])))
    kept = pd.concat(out)["kh"].tolist()
    assert sorted(kept) == sorted(keys)


def test_bloom_sync_auto_resizes_saturated_bitmap(spark, tmp_root):
    """A sync that pushes the key set past 8 bits/key must GROW the
    bitmap (full rebuild from the persisted keys, new m_bits in the
    manifest) instead of merely warning, and the grown index must still
    probe exactly like the exact operator."""
    from kartothek_spark.core.manifest import DatasetManifest
    from kartothek_spark.operators.bloom import (
        MIN_BLOOM_BITS,
        bloom_contamination_hits_indexed,
        build_bloom_index,
        sync_bloom_index,
    )
    from kartothek_spark.operators.contamination import contamination_hits

    docs = _docs(spark)
    bench = _bench(docs)
    first = bench.where(F.col("doc_id") % 22 == 0)
    build_bloom_index(spark, first, tmp_root, "bx", n=8, m_bits=MIN_BLOOM_BITS)
    assert int(DatasetManifest.load(tmp_root, "bx").metadata["bloom_m_bits"]) == MIN_BLOOM_BITS

    rest = bench.where(F.col("doc_id") % 22 != 0)
    with pytest.warns(UserWarning, match="auto-resizing"):
        sync_bloom_index(spark, rest, tmp_root, "bx")
    m_after = int(DatasetManifest.load(tmp_root, "bx").metadata["bloom_m_bits"])
    assert m_after > MIN_BLOOM_BITS

    exact = {(r.doc_id, r.n_hits) for r in contamination_hits(docs, bench, n=8).collect()}
    got = {
        (r.doc_id, r.n_hits)
        for r in bloom_contamination_hits_indexed(spark, docs, tmp_root, "bx").collect()
    }
    assert exact and got == exact


def test_novelty_report_indexed_equals_inline(spark, tmp_root):
    """Novelty vs the persisted key set must equal the inline operator
    against the corpus the index was built over, including after a sync
    extends the reference."""
    from kartothek_spark.operators.bloom import (
        build_bloom_index,
        novelty_report_indexed,
        sync_bloom_index,
    )
    from kartothek_spark.operators.contamination import novelty_report

    docs = _docs(spark)
    bench = _bench(docs)
    half = docs.where(F.col("doc_id") % 2 == 0)
    build_bloom_index(spark, half, tmp_root, "nv", n=8)
    inline_half = {tuple(r) for r in novelty_report(bench, half, n=8).collect()}
    got_half = {
        tuple(r)
        for r in novelty_report_indexed(spark, bench, tmp_root, "nv").collect()
    }
    assert got_half == inline_half
    # extend the reference: the report must follow the synced key set
    sync_bloom_index(spark, docs.where(F.col("doc_id") % 2 != 0), tmp_root, "nv")
    inline_full = {tuple(r) for r in novelty_report(bench, docs, n=8).collect()}
    got_full = {
        tuple(r)
        for r in novelty_report_indexed(spark, bench, tmp_root, "nv").collect()
    }
    assert got_full == inline_full and got_full != got_half
