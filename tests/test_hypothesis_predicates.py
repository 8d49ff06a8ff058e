"""Property-based predicate testing (reference test-strategy parity).

Mirrors the reference's hypothesis suite (`kartothek/io/testing/
query_cube.py:1404` ``test_hypothesis`` + strategies in
`kartothek/core/testing.py:73+` in /root/reference): random DNF
conjunctions over an all-types frame, checked against an INDEPENDENT
pure-Python row-filter oracle — not the engine's own predicate compiler.

The engine path under test is the full read pipeline: manifest label
pruning (partition-key split + falsified-conjunction drop), secondary
index pruning, Catalyst parquet pushdown, and residual filtering.
"""

import datetime as dt
import os
import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_DIR  # noqa: F401  (path side effect)

ROWS = 240

# typed literal domains: in-domain values, boundary values, out-of-domain
_DOMAINS = {
    "b": [True, False],
    "i": [-5, 0, 1, 2, 3, 7, 10, 99, 1000],
    "f": [-1.5, 0.0, 0.25, 1.0, 2.5, 9.75, 1e6],
    "s": ["", "a", "bb", "ccc", "zz", "nope"],
    "d": [dt.date(2020, 1, 1), dt.date(2021, 6, 15), dt.date(2022, 12, 31), dt.date(1999, 1, 1)],
    "t": [
        dt.datetime(2020, 1, 1, 0, 0, 0),
        dt.datetime(2021, 6, 15, 12, 30, 0),
        dt.datetime(2022, 12, 31, 23, 59, 59),
    ],
    "p": ["x", "y", "z", "missing"],
}
_NULLABLE = {"b", "i", "f", "s", "d", "t"}  # partition key p is never null
_ORDERED_OK = {"i", "f", "s", "d", "t", "p"}  # no ordered ops on bool


def _rows():
    rng = random.Random(42)
    rows = []
    for k in range(ROWS):
        rows.append(
            {
                "id": k,
                "b": rng.choice([True, False, None]),
                "i": rng.choice([None, *_DOMAINS["i"][:-1]]),
                "f": rng.choice([None, *_DOMAINS["f"][:-1]]),
                "s": rng.choice([None, *_DOMAINS["s"][:-1]]),
                "d": rng.choice([None, *_DOMAINS["d"][:-1]]),
                "t": rng.choice([None, *_DOMAINS["t"]]),
                "p": rng.choice(["x", "y", "z"]),
            }
        )
    return rows


@pytest.fixture(scope="module")
def alltypes_dataset(spark, tmp_path_factory):
    from kartothek_spark.dataset.write import store_dataframe_as_dataset

    root = str(tmp_path_factory.mktemp("hyp") / "store")
    os.makedirs(root, exist_ok=True)
    schema = (
        "id long, b boolean, i long, f double, s string, d date, t timestamp, p string"
    )
    df = spark.createDataFrame(_rows(), schema)
    store_dataframe_as_dataset(
        spark, df, root, "alltypes", partition_on=["p"], secondary_indices=["i", "s"]
    )
    return root, _rows()


def _literal_strategy():
    def lit_for(col):
        ops = ["==", "!=", "in"] + (["<", "<=", ">", ">="] if col in _ORDERED_OK else [])
        dom = _DOMAINS[col]
        val = st.sampled_from(dom)
        nullable_val = st.one_of(val, st.none()) if col in _NULLABLE else val
        return st.sampled_from(ops).flatmap(
            lambda op: (
                st.lists(nullable_val, min_size=0, max_size=4).map(
                    lambda vs: (col, op, vs)
                )
                if op == "in"
                else (nullable_val if op in ("==", "!=") else val).map(
                    lambda v: (col, op, v)
                )
            )
        )

    return st.sampled_from(sorted(_DOMAINS)).flatmap(lit_for)


predicates_st = st.lists(
    st.lists(_literal_strategy(), min_size=1, max_size=3),
    min_size=1,
    max_size=3,
)


def _eval_lit(row, col, op, value):
    actual = row[col]
    if op == "in":
        vals = list(value)
        if actual is None:
            return None in vals
        return actual in [v for v in vals if v is not None]
    if op == "==":
        return (actual is None) if value is None else (actual is not None and actual == value)
    if op == "!=":
        return (actual is not None) if value is None else (actual is not None and actual != value)
    if actual is None or value is None:
        return False
    return {
        "<": actual < value,
        "<=": actual <= value,
        ">": actual > value,
        ">=": actual >= value,
    }[op]


def _oracle(rows, predicates):
    out = []
    for row in rows:
        if any(all(_eval_lit(row, *lit) for lit in conj) for conj in predicates):
            out.append(row["id"])
    return sorted(out)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(predicates=predicates_st)
def test_read_table_matches_python_oracle(spark, alltypes_dataset, predicates):
    from kartothek_spark.dataset.read import read_table

    root, rows = alltypes_dataset
    got = read_table(spark, root, "alltypes", predicates=predicates, columns=["id"])
    assert sorted(r.id for r in got.collect()) == _oracle(rows, predicates)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(predicates=predicates_st)
def test_label_pruning_is_superset(spark, alltypes_dataset, predicates):
    """dispatch_labels may over-approximate (pruning is a superset of the
    matching files) but must NEVER drop a label containing a matching row."""
    from kartothek_spark.core.manifest import DatasetManifest
    from kartothek_spark.dataset.read import dispatch_labels

    root, rows = alltypes_dataset
    m = DatasetManifest.load(root, "alltypes")
    labels = set(dispatch_labels(spark, m, predicates))
    matching = set(_oracle(rows, predicates))
    by_id = {r["id"]: r["p"] for r in rows}
    needed_values = {by_id[i] for i in matching}
    kept_values = {m.partition_values(lbl)["p"] for lbl in labels}
    assert needed_values <= kept_values


# ---------------------------------------------------------------------------
# string-literal coercion on a DATE partition key (the silent-empty-result
# class: driver-side label eval must coerce ISO strings before comparing)
# ---------------------------------------------------------------------------

def _dated_rows():
    rng = random.Random(7)
    rows = []
    for k in range(ROWS):
        rows.append(
            {
                "id": k,
                "i": rng.choice([None, *_DOMAINS["i"][:-1]]),
                "f": rng.choice([None, *_DOMAINS["f"][:-1]]),
                "d": rng.choice(_DOMAINS["d"][:-1]),  # partition key: never null
            }
        )
    return rows


@pytest.fixture(scope="module")
def datepart_dataset(spark, tmp_path_factory):
    from kartothek_spark.dataset.write import store_dataframe_as_dataset

    root = str(tmp_path_factory.mktemp("hypd") / "store")
    os.makedirs(root, exist_ok=True)
    df = spark.createDataFrame(_dated_rows(), "id long, i long, f double, d date")
    store_dataframe_as_dataset(
        spark, df, root, "dated", partition_on=["d"], secondary_indices=["i"]
    )
    return root, _dated_rows()


def _stringify_datelike(predicates, seed):
    """Render ~70% of date literals as ISO strings — the engine must coerce
    them to typed values for BOTH driver-side label pruning and Catalyst."""
    rng = random.Random(seed)
    out = []
    for conj in predicates:
        nc = []
        for col, op, v in conj:
            if col == "d" and v is not None and rng.random() < 0.7:
                if op == "in":
                    v = [x.isoformat() if x is not None else None for x in v]
                else:
                    v = v.isoformat()
            nc.append((col, op, v))
        out.append(nc)
    return out


def _date_literal_strategy():
    def lit_for(col):
        ops = ["==", "!=", "in", "<", "<=", ">", ">="]
        dom = _DOMAINS[col]
        val = st.sampled_from(dom)
        nullable_val = st.one_of(val, st.none()) if col in ("i", "f") else val
        return st.sampled_from(ops).flatmap(
            lambda op: (
                st.lists(nullable_val, min_size=0, max_size=3).map(lambda vs: (col, op, vs))
                if op == "in"
                else (nullable_val if op in ("==", "!=") else val).map(lambda v: (col, op, v))
            )
        )

    return st.sampled_from(["d", "i", "f"]).flatmap(lit_for)


date_predicates_st = st.lists(
    st.lists(_date_literal_strategy(), min_size=1, max_size=3), min_size=1, max_size=3
)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(predicates=date_predicates_st, seed=st.integers(0, 2**16))
def test_string_date_literals_match_typed_oracle(spark, datepart_dataset, predicates, seed):
    from kartothek_spark.dataset.read import read_table

    root, rows = datepart_dataset
    rendered = _stringify_datelike(predicates, seed)
    got = read_table(spark, root, "dated", predicates=rendered, columns=["id"])
    # oracle evaluates the TYPED form — string rendering must not change results
    assert sorted(r.id for r in got.collect()) == _oracle(rows, predicates)


# ---------------------------------------------------------------------------
# hidden (transform) partitioning: random ts predicates vs the same oracle
# ---------------------------------------------------------------------------

_TS_DOMAIN = [
    dt.datetime(2024, 1, 1, 0, 0, 0),
    dt.datetime(2024, 1, 1, 12, 0, 0),
    dt.datetime(2024, 1, 2, 6, 30, 0),
    dt.datetime(2024, 1, 3, 23, 59, 59),
    dt.datetime(2024, 1, 5, 0, 0, 1),
    dt.datetime(2024, 2, 1, 8, 0, 0),
]


def _hidden_rows():
    rng = random.Random(7)
    return [
        {"id": k, "ts": rng.choice(_TS_DOMAIN[:-1]), "v": rng.randint(0, 9)}
        for k in range(120)
    ]


@pytest.fixture(scope="module")
def hidden_day_dataset(spark, tmp_path_factory):
    from kartothek_spark.dataset.write import store_dataframe_as_dataset

    root = str(tmp_path_factory.mktemp("hypday") / "store")
    os.makedirs(root, exist_ok=True)
    df = spark.createDataFrame(_hidden_rows(), "id long, ts timestamp, v long")
    store_dataframe_as_dataset(
        spark, df, root, "hday", partition_transforms=[("d", "day", "ts")]
    )
    return root, _hidden_rows()


ts_lit_st = st.tuples(
    st.just("ts"),
    st.sampled_from(["==", "!=", "<", "<=", ">", ">=", "in"]),
    st.sampled_from(_TS_DOMAIN),
).map(lambda t: (t[0], t[1], [t[2]] if t[1] == "in" else t[2]))

v_lit_st = st.tuples(
    st.just("v"), st.sampled_from(["==", "<", ">="]), st.integers(0, 9)
)

hidden_preds_st = st.lists(
    st.lists(st.one_of(ts_lit_st, v_lit_st), min_size=1, max_size=2),
    min_size=1,
    max_size=3,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(predicates=hidden_preds_st)
def test_hidden_partition_read_matches_oracle(spark, hidden_day_dataset, predicates):
    """Random raw-ts predicates over a hidden day-partitioned dataset:
    transform widening must never change results (values == oracle) —
    only pruning."""
    from kartothek_spark.dataset.read import read_table

    root, rows = hidden_day_dataset
    got = read_table(spark, root, "hday", predicates=predicates, columns=["id"])
    assert sorted(r.id for r in got.collect()) == _oracle(rows, predicates)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(predicates=hidden_preds_st)
def test_hidden_partition_pruning_is_superset(spark, hidden_day_dataset, predicates):
    from kartothek_spark.core.manifest import DatasetManifest
    from kartothek_spark.dataset.read import dispatch_labels

    root, rows = hidden_day_dataset
    m = DatasetManifest.load(root, "hday")
    labels = set(dispatch_labels(spark, m, predicates))
    matching = set(_oracle(rows, predicates))
    by_id = {r["id"]: r["ts"].date() for r in rows}
    needed_days = {by_id[i] for i in matching}
    kept_days = {m.partition_values(lbl)["d"] for lbl in labels}
    assert needed_days <= kept_days
