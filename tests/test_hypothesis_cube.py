"""Property-based cube query testing (reference parity).

Mirrors the reference's ``test_hypothesis`` (`kartothek/io/testing/
query_cube.py:1404` in /root/reference): random condition conjunctions
over the reference's canonical cube testset shape (seed x,y,z,p,q,v1,i1;
dense enrichment +v2,i2; sparse enrichment y,z,p,q,v3,i3 —
query_cube.py:87-120), checked against an independent pure-Python oracle
that re-implements the semantic contract: per-dataset cell lookup, seed
INNER JOIN restrictive datasets (those with conditions on their payload),
LEFT JOIN the rest, then the full condition applied to the joined row.
"""

import itertools
import os
import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_DIR  # noqa: F401


def _cube_rows():
    rng = random.Random(7)
    xs, ys, zs = range(4), range(3), range(3)
    ps, qs = range(2), range(2)
    seed, dense, sparse = [], [], []
    for x, y, z in itertools.product(xs, ys, zs):
        p, q = x % 2, y % 2
        seed.append({"x": x, "y": y, "z": z, "p": p, "q": q,
                     "v1": rng.randint(0, 100), "i1": f"s{rng.randint(0, 3)}"})
        dense.append({"x": x, "y": y, "z": z, "p": p, "q": q,
                      "v2": rng.randint(0, 100), "i2": f"d{rng.randint(0, 3)}"})
    for y, z in itertools.product(ys, zs):
        if rng.random() < 0.6:
            for p, q in itertools.product(ps, qs):
                sparse.append({"y": y, "z": z, "p": p, "q": q,
                               "v3": rng.randint(0, 100), "i3": f"e{rng.randint(0, 3)}"})
    return seed, dense, sparse


_COL_DOMAIN = {
    "x": list(range(5)), "y": list(range(4)), "z": list(range(4)),
    "p": [0, 1], "q": [0, 1],
    "v1": list(range(0, 110, 10)), "v2": list(range(0, 110, 10)),
    "v3": list(range(0, 110, 10)),
    "i1": ["s0", "s1", "s2", "s3"], "i2": ["d0", "d1", "d2", "d3"],
    "i3": ["e0", "e1", "e2", "e3"],
}
_DATASET_OF = {"v1": "seed", "i1": "seed", "v2": "dense", "i2": "dense",
               "v3": "sparse", "i3": "sparse"}


def _literal():
    def lit_for(col):
        ops = ["==", "!=", "<", "<=", ">", ">=", "in"]
        return st.sampled_from(ops).flatmap(
            lambda op: (
                st.lists(st.sampled_from(_COL_DOMAIN[col]), min_size=0, max_size=3)
                if op == "in"
                else st.sampled_from(_COL_DOMAIN[col])
            ).map(lambda v: (col, op, v))
        )

    return st.sampled_from(sorted(_COL_DOMAIN)).flatmap(lit_for)


conditions_st = st.lists(_literal(), min_size=1, max_size=3).map(lambda c: [c])


@pytest.fixture(scope="module")
def built_cube(spark, tmp_path_factory):
    from kartothek_spark.core.cube import Cube
    from kartothek_spark.cube.build import build_cube

    root = str(tmp_path_factory.mktemp("hypcube") / "store")
    os.makedirs(root, exist_ok=True)
    seed, dense, sparse = _cube_rows()
    cube = Cube(
        dimension_columns=("x", "y", "z"),
        partition_columns=("p", "q"),
        uuid_prefix="hyp",
        index_columns=frozenset({"i1", "i2", "i3"}),
    )
    data = {
        "seed": spark.createDataFrame(seed, "x long, y long, z long, p long, q long, v1 long, i1 string"),
        "dense": spark.createDataFrame(dense, "x long, y long, z long, p long, q long, v2 long, i2 string"),
        "sparse": spark.createDataFrame(sparse, "y long, z long, p long, q long, v3 long, i3 string"),
    }
    build_cube(spark, data, cube, root)
    return root, cube, (seed, dense, sparse)


def _eval_lit(row, col, op, value):
    actual = row.get(col)
    if actual is None:
        return False  # joined-in sparse payload may be absent; no null literals drawn
    if op == "in":
        return actual in value
    return {"==": actual == value, "!=": actual != value,
            "<": actual < value, "<=": actual <= value,
            ">": actual > value, ">=": actual >= value}[op]


def _oracle(seed, dense, sparse, conditions):
    conj = conditions[0]
    cond_cols = {c for c, _o, _v in conj}
    restrictive = {_DATASET_OF[c] for c in cond_cols if c in _DATASET_OF} - {"seed"}
    dense_by = {(r["x"], r["y"], r["z"], r["p"], r["q"]): r for r in dense}
    sparse_by = {(r["y"], r["z"], r["p"], r["q"]): r for r in sparse}
    out = []
    for s in seed:
        row = dict(s)
        d = dense_by.get((s["x"], s["y"], s["z"], s["p"], s["q"]))
        if d is None and "dense" in restrictive:
            continue
        if d:
            row.update(d)
        e = sparse_by.get((s["y"], s["z"], s["p"], s["q"]))
        if e is None and "sparse" in restrictive:
            continue
        if e:
            row.update(e)
        if all(_eval_lit(row, *lit) for lit in conj):
            out.append((row["x"], row["y"], row["z"],
                        row.get("v1"), row.get("v2"), row.get("v3")))
    return sorted(out)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(conditions=conditions_st)
def test_query_cube_matches_python_oracle(spark, built_cube, conditions):
    from kartothek_spark.cube.query import query_cube

    root, cube, (seed, dense, sparse) = built_cube
    got = query_cube(spark, cube, root, conditions=conditions)
    rows = sorted(
        (r["x"], r["y"], r["z"], r["v1"], r["v2"], r["v3"])
        for r in (row.asDict() for row in got.collect())
    )
    assert rows == _oracle(seed, dense, sparse, conditions)
