"""Optimistic concurrency control (beyond the reference's documented
last-writer-wins): stale commits are rejected, and update_dataset rebases
its metadata transaction so concurrent appenders all land."""

import os

import pytest
from pyspark.sql import functions as F

from kartothek_spark.core.manifest import CommitConflict, DatasetManifest
from kartothek_spark.dataset.read import read_table
from kartothek_spark.dataset.write import store_dataframe_as_dataset, update_dataset

from tests.conftest import SF_DIR


def _sup(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "supplier.parquet"))


def test_stale_commit_rejected(spark, tmp_root):
    store_dataframe_as_dataset(spark, _sup(spark), tmp_root, "s")
    a = DatasetManifest.load(tmp_root, "s")
    b = DatasetManifest.load(tmp_root, "s")
    a.metadata["x"] = 1
    a.commit()
    b.metadata["y"] = 2
    with pytest.raises(CommitConflict, match="concurrent writer"):
        b.commit()
    # explicit overwrite escape hatch still exists
    b.commit(check_conflict=False)
    assert DatasetManifest.load(tmp_root, "s").metadata == {"y": 2}


def test_concurrent_creation_rejected(spark, tmp_root):
    sup = _sup(spark)
    store_dataframe_as_dataset(spark, sup, tmp_root, "s")
    fresh = DatasetManifest(dataset_uuid="s", root=tmp_root, schema=sup.schema)
    with pytest.raises(CommitConflict, match="created concurrently"):
        fresh.commit()


def test_update_rebases_on_conflict(spark, tmp_root, monkeypatch):
    sup = _sup(spark)
    store_dataframe_as_dataset(
        spark, sup.where("s_nationkey < 10"), tmp_root, "s",
        partition_on=["s_nationkey"], secondary_indices=["s_suppkey"],
    )

    # a competing writer sneaks a commit in between our load and commit —
    # exactly once, before the first commit attempt
    orig_commit = DatasetManifest.commit
    state = {"raced": False}

    def racing_commit(self, *args, **kwargs):
        if not state["raced"] and self.dataset_uuid == "s" and "competitor" not in self.metadata:
            state["raced"] = True
            other = DatasetManifest.load(tmp_root, "s")
            other.metadata["competitor"] = True
            orig_commit(other)
        return orig_commit(self, *args, **kwargs)

    monkeypatch.setattr(DatasetManifest, "commit", racing_commit)
    update_dataset(spark, sup.where("s_nationkey >= 10"), tmp_root, "s",
                   delete_scope=[{"s_nationkey": 3}])
    monkeypatch.undo()

    m = DatasetManifest.load(tmp_root, "s")
    # the competitor's metadata survived the rebase
    assert m.metadata.get("competitor") is True
    # and our append + delete both landed
    got = read_table(spark, tmp_root, "s")
    exp = sup.where("s_nationkey <> 3")
    assert got.count() == exp.count()
    assert got.agg(F.sum("s_suppkey")).first()[0] == exp.agg(F.sum("s_suppkey")).first()[0]
    # index still serves pruned reads after the rebased index maintenance
    one = read_table(spark, tmp_root, "s", predicates=[[("s_suppkey", "==", 5)]])
    assert one.count() == sup.where("s_suppkey = 5 AND s_nationkey <> 3").count()


def test_update_exhausted_retries_raises(spark, tmp_root, monkeypatch):
    sup = _sup(spark)
    store_dataframe_as_dataset(spark, sup, tmp_root, "s")

    orig_commit = DatasetManifest.commit

    def always_racing_commit(self, *args, **kwargs):
        if self.metadata.get("mine"):  # only OUR commits get raced
            other = DatasetManifest.load(tmp_root, "s")
            other.metadata = dict(other.metadata, bump=other.version)
            orig_commit(other)
        return orig_commit(self, *args, **kwargs)

    monkeypatch.setattr(DatasetManifest, "commit", always_racing_commit)
    with pytest.raises(CommitConflict):
        update_dataset(spark, None, tmp_root, "s",
                       metadata={"mine": 1}, max_conflict_retries=1)


def test_callable_metadata_composes_on_conflict(spark, tmp_root, monkeypatch):
    """update_dataset(metadata=callable) must derive counter metadata from
    the manifest each attempt commits against: a racing sync's increment
    survives the rebase. A plain dict of stale absolutes would clobber it
    (the lost-update anomaly) — the text index's corpus scalars rely on
    this."""
    from kartothek_spark.operators.search_index import (
        META_BUCKETS,
        META_N_DOCS,
        META_TOTAL_LEN,
        build_text_index,
        search_text_index,
        sync_text_index,
    )

    docs = spark.createDataFrame(
        [(i, f"spark table join doc {i}") for i in range(30)],
        "doc_id long, text string",
    )
    build_text_index(
        spark, docs.where("doc_id < 10"), tmp_root, "tidx", buckets=4
    )

    # a competing sync lands between our sync's load and commit — once
    orig_commit = DatasetManifest.commit
    state = {"raced": False}

    def racing_commit(self, *args, **kwargs):
        # fire on OUR sync's first commit attempt (its callable computed
        # N=20 against the pre-race manifest); the racing sync's own
        # commit also carries N=20 but raced is already latched by then
        if (
            not state["raced"]
            and self.dataset_uuid == "tidx"
            and int(self.metadata.get(META_N_DOCS, 0)) == 20
        ):
            state["raced"] = True
            sync_text_index(
                spark, docs.where("doc_id >= 20"), tmp_root, "tidx"
            )
        return orig_commit(self, *args, **kwargs)

    monkeypatch.setattr(DatasetManifest, "commit", racing_commit)
    sync_text_index(spark, docs.where("(doc_id >= 10) AND (doc_id < 20)"), tmp_root, "tidx")
    monkeypatch.undo()

    m = DatasetManifest.load(tmp_root, "tidx")
    # BOTH syncs' counter increments composed (10 + 10 + 10 docs)
    assert int(m.metadata[META_N_DOCS]) == 30
    assert int(m.metadata[META_BUCKETS]) == 4
    assert int(m.metadata[META_TOTAL_LEN]) == sum(
        len(f"spark table join doc {i}".split()) for i in range(30)
    )
    # and the searched result equals the on-the-fly operator on the union
    from kartothek_spark.operators.search import bm25_search

    got = [
        tuple(r)
        for r in search_text_index(spark, tmp_root, "tidx", ["spark", "join"], k=30).collect()
    ]
    want = [tuple(r) for r in bm25_search(docs, ["spark", "join"], k=30).collect()]
    assert got == want


class _FakeConditionalStore:
    """In-memory conditional-put store (the S3 If-Match contract): ETag =
    md5 of the object bytes; put_if_match atomically compare-and-swaps,
    rejecting a stale expected ETag with CommitConflict — the SPEC.md §7
    seam exercised without any cloud SDK. Writes through to the local
    path too so DatasetManifest.load() still reads the committed state."""

    def __init__(self):
        self.objects = {}
        self.conditional_puts = 0

    def _etag_of(self, data: bytes) -> str:
        import hashlib

        return hashlib.md5(data).hexdigest()

    def etag(self, path):
        data = self.objects.get(path)
        return None if data is None else self._etag_of(data)

    def put_if_match(self, path, data, expected_etag):
        self.conditional_puts += 1
        current = self.etag(path)
        if current != expected_etag:
            raise CommitConflict(
                f"put-if-match failed for {path}: expected {expected_etag}, "
                f"object is at {current}"
            )
        return self.put(path, data)

    def put(self, path, data):
        self.objects[path] = bytes(data)
        with open(path, "wb") as fh:
            fh.write(data)
        # S3 PUT responses carry the new ETag; commit() adopts it as the
        # next If-Match baseline instead of a racy follow-up etag() read
        return self._etag_of(data)


def test_conditional_put_store_commit(spark, tmp_root):
    """The live swap goes through put_if_match with the load-time ETag;
    a writer holding a stale ETag is rejected exactly (no read-check-swap
    window), reload + reattach rebases, and check_conflict=False maps to
    an unconditional put."""
    store_dataframe_as_dataset(spark, _sup(spark), tmp_root, "s")
    store = _FakeConditionalStore()
    # seed the store with the current on-disk object (migration moment)
    a = DatasetManifest.load(tmp_root, "s")
    with open(a.manifest_path, "rb") as fh:
        store.objects[a.manifest_path] = fh.read()

    a.attach_conditional_store(store)
    b = DatasetManifest.load(tmp_root, "s")
    b.attach_conditional_store(store)

    a.metadata["x"] = 1
    v_before = a.version
    a.commit()
    assert store.conditional_puts == 1
    assert a.version == v_before + 1

    # b holds the pre-commit ETag — its put must be rejected atomically
    b.metadata["y"] = 2
    v_b = b.version
    with pytest.raises(CommitConflict, match="put-if-match failed"):
        b.commit()
    assert b.version == v_b  # version bump rolled back on rejection
    # the winning state is what readers see
    assert DatasetManifest.load(tmp_root, "s").metadata.get("x") == 1

    # rebase: reload, reattach (fresh ETag), reapply
    b2 = DatasetManifest.load(tmp_root, "s")
    b2.attach_conditional_store(store)
    b2.metadata["y"] = 2
    b2.commit()
    assert DatasetManifest.load(tmp_root, "s").metadata == {"x": 1, "y": 2}

    # deliberate overwrite takes the unconditional put
    c = DatasetManifest.load(tmp_root, "s")
    c.attach_conditional_store(store)
    stale = DatasetManifest.load(tmp_root, "s")
    stale.attach_conditional_store(store)
    c.metadata["z"] = 3
    c.commit()
    stale.metadata = {"only": "me"}
    stale.commit(check_conflict=False)
    assert DatasetManifest.load(tmp_root, "s").metadata == {"only": "me"}


def test_conditional_put_store_creation_requires_absent(spark, tmp_root):
    """Creation maps to If-None-Match:* — expected ETag None; a
    concurrently created object rejects the second creator."""
    sup = _sup(spark)
    store = _FakeConditionalStore()
    m1 = DatasetManifest(dataset_uuid="c", root=tmp_root, schema=sup.schema)
    m1.attach_conditional_store(store)
    m2 = DatasetManifest(dataset_uuid="c", root=tmp_root, schema=sup.schema)
    m2.attach_conditional_store(store)
    m1.commit()
    with pytest.raises(CommitConflict, match="put-if-match failed"):
        m2.commit()


def test_conditional_put_baseline_is_put_response_etag(spark, tmp_root):
    """A competitor landing BETWEEN our put and any follow-up read must
    not become our If-Match baseline: commit() adopts the ETag returned
    by put_if_match itself, so our next commit conflicts against the
    competitor instead of silently overwriting it (ADVICE r8 #1)."""

    class _InterleavingStore(_FakeConditionalStore):
        """After every successful conditional put, a competitor
        immediately overwrites the object — the worst-case interleave
        for a follow-up etag() baseline read."""

        def put_if_match(self, path, data, expected_etag):
            ours = super().put_if_match(path, data, expected_etag)
            self.objects[path] = b"competitor wrote this"
            return ours

    store_dataframe_as_dataset(spark, _sup(spark), tmp_root, "ib")
    store = _InterleavingStore()
    a = DatasetManifest.load(tmp_root, "ib")
    with open(a.manifest_path, "rb") as fh:
        store.objects[a.manifest_path] = fh.read()
    a.attach_conditional_store(store)
    a.metadata["x"] = 1
    a.commit()
    # our baseline is OUR object's ETag, not the competitor's
    assert a._loaded_etag != store.etag(a.manifest_path)
    with pytest.raises(CommitConflict, match="put-if-match failed"):
        a.metadata["x"] = 2
        a.commit()


def test_conditional_put_legacy_adapter_none_return(spark, tmp_root):
    """Adapters predating the ETag-return convention (put_if_match
    returns None) still work: commit() falls back to the follow-up
    etag() read and consecutive commits by one writer succeed."""

    class _LegacyStore(_FakeConditionalStore):
        def put_if_match(self, path, data, expected_etag):
            super().put_if_match(path, data, expected_etag)
            return None

        def put(self, path, data):
            super().put(path, data)
            return None

    store_dataframe_as_dataset(spark, _sup(spark), tmp_root, "lg")
    store = _LegacyStore()
    a = DatasetManifest.load(tmp_root, "lg")
    with open(a.manifest_path, "rb") as fh:
        store.objects[a.manifest_path] = fh.read()
    a.attach_conditional_store(store)
    a.metadata["x"] = 1
    a.commit()
    a.metadata["x"] = 2
    a.commit()
    assert DatasetManifest.load(tmp_root, "lg").metadata["x"] == 2
