"""Cube layer tests — fixture mirrors the reference cube testset
(FIXTURES.md F4 / kartothek/io/testing/query_cube.py:87-120)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kartothek_spark.core.cube import Cube
from kartothek_spark.cube.build import (
    append_to_cube,
    build_cube,
    check_datasets,
    cleanup_cube,
    discover_cube,
    remove_partitions,
)
from kartothek_spark.cube.query import query_cube

CUBE = Cube(
    dimension_columns=("x", "y"),
    partition_columns=("p",),
    uuid_prefix="cube",
    seed_dataset="seed",
    index_columns=frozenset({"i1", "i2"}),
)


@pytest.fixture()
def cube_data(spark):
    seed = spark.createDataFrame(
        [Row(x=x, y=y, p=x % 2, v1=10 * x + y, i1=x) for x in range(4) for y in range(3)]
    )
    dense = spark.createDataFrame(
        [Row(x=x, y=y, p=x % 2, v2=100 * x + y, i2=y) for x in range(4) for y in range(3)]
    )
    sparse = spark.createDataFrame([Row(y=y, p=p, v3=7 * y + p) for y in range(3) for p in (0, 1)])
    return {"seed": seed, "enrich_dense": dense, "enrich_sparse": sparse}


def test_build_and_query_full(spark, tmp_root, cube_data):
    build_cube(spark, cube_data, CUBE, tmp_root)
    check_datasets(CUBE, tmp_root)
    got = query_cube(spark, CUBE, tmp_root)
    assert got.count() == 12
    row = got.where("x=1 AND y=2").collect()[0]
    assert (row.v1, row.v2, row.v3) == (12, 102, 15)  # v3: 7*2+1 (p=1)


def test_query_conditions_restrictive(spark, tmp_root, cube_data):
    build_cube(spark, cube_data, CUBE, tmp_root)
    # condition on enrich_dense payload → dense becomes restrictive (inner)
    got = query_cube(spark, CUBE, tmp_root, conditions=[[("v2", ">=", 300)]])
    assert {r.x for r in got.collect()} == {3}
    # condition on seed payload only restricts seed rows
    got2 = query_cube(spark, CUBE, tmp_root, conditions=[[("i1", "==", 2), ("y", "<", 2)]])
    assert {(r.x, r.y) for r in got2.collect()} == {(2, 0), (2, 1)}


def test_query_payload_projection(spark, tmp_root, cube_data):
    build_cube(spark, cube_data, CUBE, tmp_root)
    got = query_cube(spark, CUBE, tmp_root, payload_columns=["v1"])
    assert set(got.columns) == {"x", "y", "p", "v1"}


def test_last_wins_dedup_on_append(spark, tmp_root, cube_data):
    build_cube(spark, cube_data, CUBE, tmp_root)
    # append overlapping seed cells with new v1 — later write must win
    upd = spark.createDataFrame([Row(x=1, y=0, p=1, v1=999, i1=1)])
    append_to_cube(spark, {"seed": upd}, CUBE, tmp_root)
    got = query_cube(spark, CUBE, tmp_root).where("x=1 AND y=0").collect()
    assert len(got) == 1 and got[0].v1 == 999


def test_remove_partitions_and_cleanup(spark, tmp_root, cube_data):
    build_cube(spark, cube_data, CUBE, tmp_root)
    remove_partitions(spark, CUBE, tmp_root, [[("p", "==", 0)]], datasets=["seed"])
    got = query_cube(spark, CUBE, tmp_root)
    assert {r.p for r in got.collect()} == {1}
    deleted = cleanup_cube(CUBE, tmp_root)
    assert any(deleted.values())


def test_discover_cube_roundtrip(spark, tmp_root, cube_data):
    build_cube(spark, cube_data, CUBE, tmp_root)
    got = discover_cube(tmp_root, "cube")
    assert got.dimension_columns == ("x", "y") and got.seed_dataset == "seed"


def test_build_rejects_payload_overlap(spark, tmp_root, cube_data):
    bad = dict(cube_data)
    bad["enrich_dense"] = bad["enrich_dense"].withColumn("v1", F.lit(1))
    with pytest.raises(ValueError, match="payload overlap"):
        build_cube(spark, bad, CUBE, tmp_root)


def test_build_rejects_duplicate_cells(spark, tmp_root, cube_data):
    bad = dict(cube_data)
    bad["seed"] = bad["seed"].unionByName(bad["seed"].limit(1))
    with pytest.raises(ValueError, match="duplicate"):
        build_cube(spark, bad, CUBE, tmp_root)
