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
