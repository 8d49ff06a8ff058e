"""Model-based mutation testing: random operation sequences vs a dict model.

The reference's mutation semantics (survey §3.4): a dataset only ever
changes by adding partitions and removing partitions, atomically. We drive
random sequences of [append, delete_scope, replace, gc, rebuild_index]
against the engine and mirror them in a plain Python model keyed by
partition value; after every sequence the engine's full read and a pruned
read must match the model exactly.
"""

import os
import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

KEYS = ["a", "b", "c"]

ops_st = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.sampled_from(KEYS), st.integers(1, 4)),
        st.tuples(st.just("delete"), st.sampled_from(KEYS), st.just(0)),
        st.tuples(st.just("replace"), st.sampled_from(KEYS), st.integers(1, 3)),
        st.tuples(st.just("gc"), st.just(""), st.just(0)),
        st.tuples(st.just("rebuild_index"), st.just(""), st.just(0)),
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=ops_st)
def test_mutation_sequences_match_model(spark, tmp_path_factory, ops):
    from kartothek_spark.dataset.read import read_table
    from kartothek_spark.dataset.write import (
        build_dataset_indices,
        garbage_collect_dataset,
        store_dataframe_as_dataset,
        update_dataset,
    )

    root = str(tmp_path_factory.mktemp("mut"))
    uuid = "m1"
    counter = [0]

    def rows(key, n):
        out = [(counter[0] + i, key, f"v{counter[0] + i}") for i in range(n)]
        counter[0] += n
        return out

    def df_of(data):
        return spark.createDataFrame(data, "id long, k string, payload string")

    # model: {partition_key_value: set of (id, k, payload)} — append adds to
    # the value's pool, delete_scope clears it (atomic with any append)
    model: dict[str, set] = {k: set() for k in KEYS}
    init = rows("a", 2) + rows("b", 2)
    store_dataframe_as_dataset(
        spark, df_of(init), root, uuid, partition_on=["k"], secondary_indices=["payload"]
    )
    for r in init:
        model[r[1]].add(r)

    for op, key, n in ops:
        if op == "append":
            data = rows(key, n)
            update_dataset(spark, df_of(data), root, uuid)
            for r in data:
                model[r[1]].add(r)
        elif op == "delete":
            update_dataset(spark, None, root, uuid, delete_scope=[{"k": key}])
            model[key] = set()
        elif op == "replace":
            data = rows(key, n)
            update_dataset(spark, df_of(data), root, uuid, delete_scope=[{"k": key}])
            model[key] = set(data)
        elif op == "gc":
            garbage_collect_dataset(root, uuid)
        elif op == "rebuild_index":
            build_dataset_indices(spark, root, uuid, ["payload"])

    want = sorted(r for pool in model.values() for r in pool)
    got = sorted(map(tuple, read_table(spark, root, uuid).collect()))
    assert got == want

    # pruned read through partition-key + secondary index also matches
    if want:
        sample = random.Random(0).choice(want)
        pruned = read_table(
            spark, root, uuid,
            predicates=[[("k", "==", sample[1]), ("payload", "==", sample[2])]],
        )
        assert sorted(map(tuple, pruned.collect())) == [sample]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=ops_st)
def test_mutation_sequences_time_travel_matches_model(spark, tmp_path_factory, ops):
    """Snapshot-versioning property: with keep_history, EVERY retained
    version reproduces the model state as of that commit, and
    read_changes(since=v) equals exactly the still-live rows appended
    after v."""
    from kartothek_spark.core.manifest import DatasetManifest
    from kartothek_spark.dataset.read import read_changes, read_table
    from kartothek_spark.dataset.write import (
        build_dataset_indices,
        garbage_collect_dataset,
        store_dataframe_as_dataset,
        update_dataset,
    )

    root = str(tmp_path_factory.mktemp("tt"))
    uuid = "m2"
    counter = [0]

    def rows(key, n):
        out = [(counter[0] + i, key, f"v{counter[0] + i}") for i in range(n)]
        counter[0] += n
        return out

    def df_of(data):
        return spark.createDataFrame(data, "id long, k string, payload string")

    model: dict[str, set] = {k: set() for k in KEYS}
    added_at: dict[tuple, int] = {}
    snapshots: dict[int, list] = {}

    def snap():
        v = DatasetManifest.load(root, uuid).version
        snapshots[v] = sorted(r for pool in model.values() for r in pool)

    init = rows("a", 2) + rows("b", 2)
    store_dataframe_as_dataset(
        spark, df_of(init), root, uuid, partition_on=["k"], keep_history=True
    )
    for r in init:
        model[r[1]].add(r)
        added_at[r] = 1
    snap()

    for op, key, n in ops:
        if op == "append":
            data = rows(key, n)
            update_dataset(spark, df_of(data), root, uuid)
            v = DatasetManifest.load(root, uuid).version
            for r in data:
                model[r[1]].add(r)
                added_at[r] = v
            snap()
        elif op == "delete":
            update_dataset(spark, None, root, uuid, delete_scope=[{"k": key}])
            model[key] = set()
            snap()
        elif op == "replace":
            data = rows(key, n)
            update_dataset(spark, df_of(data), root, uuid, delete_scope=[{"k": key}])
            v = DatasetManifest.load(root, uuid).version
            model[key] = set(data)
            for r in data:
                added_at[r] = v
            snap()
        elif op == "gc":
            # history retained → GC must delete NOTHING
            assert garbage_collect_dataset(root, uuid) == []
        elif op == "rebuild_index":
            build_dataset_indices(spark, root, uuid, ["payload"])

    live = sorted(r for pool in model.values() for r in pool)
    # every retained snapshot reproduces its exact state
    for v, want in snapshots.items():
        got = sorted(map(tuple, read_table(spark, root, uuid, as_of=v).collect()))
        assert got == want, f"as_of={v}"
    # changes-since any version = still-live rows appended after it
    for v in snapshots:
        want_changes = sorted(r for r in live if added_at[r] > v)
        got_changes = sorted(map(tuple, read_changes(spark, root, uuid, since=v).collect()))
        assert got_changes == want_changes, f"since={v}"


agg_ops_st = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.sampled_from(KEYS), st.integers(1, 4)),
        st.tuples(st.just("delete"), st.sampled_from(KEYS), st.just(0)),
        st.tuples(st.just("sync"), st.just(""), st.just(0)),
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=agg_ops_st)
def test_materialized_aggregate_matches_recompute(spark, tmp_path_factory, ops):
    """After ANY mutation sequence (appends, partition drops, interleaved
    syncs), one final sync must leave the materialized view equal to a
    full groupBy recompute of the live source — incremental merge,
    partition-granular rewrite, and drop-refresh all collapse to the same
    fixpoint."""
    from pyspark.sql import functions as F

    from kartothek_spark.dataset.read import read_table
    from kartothek_spark.dataset.sync import sync_aggregate_dataset
    from kartothek_spark.dataset.write import store_dataframe_as_dataset, update_dataset

    root = str(tmp_path_factory.mktemp("aggmut"))
    counter = [0]

    def rows(key, n):
        out = [(counter[0] + i, key, (counter[0] + i) * 7 % 13) for i in range(n)]
        counter[0] += n
        return out

    def df_of(data):
        return spark.createDataFrame(data, "id long, k string, v long")

    store_dataframe_as_dataset(
        spark, df_of(rows("a", 2)), root, "src",
        partition_on=["k"], keep_history=True,
    )
    aggs = [("n", "count", "*"), ("sum_v", "sum", "v"), ("min_id", "min", "id")]

    def sync():
        return sync_aggregate_dataset(
            spark, root, "src", root, "view", group_by=["k"], aggs=aggs
        )

    sync()
    for op, key, n in ops:
        if op == "append":
            update_dataset(spark, df_of(rows(key, n)), root, "src")
        elif op == "delete":
            update_dataset(spark, None, root, "src", delete_scope=[{"k": key}])
        else:
            sync()
    sync()

    live = read_table(spark, root, "src")
    want = {
        (r.k, r.n, r.sum_v, r.min_id)
        for r in live.groupBy("k").agg(
            F.count("*").alias("n"),
            F.sum("v").alias("sum_v"),
            F.min("id").alias("min_id"),
        ).collect()
    }
    got = {
        (r.k, r.n, r.sum_v, r.min_id)
        for r in read_table(spark, root, "view").collect()
    }
    assert got == want
