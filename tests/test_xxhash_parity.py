"""Property test: the pure-Python XXH64 used for driver-side bucket
planning (``core/xxhash.py``) must be bit-exact against Spark's JVM
``xxhash64`` expression for every supported type — otherwise bucket
pruning would silently read the wrong bucket."""

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kartothek_spark.core.xxhash import spark_pmod_xxhash64, spark_xxhash64

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
I32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)

TYPED_VALUE = st.one_of(
    st.tuples(st.just(T.LongType()), st.one_of(st.none(), I64)),
    st.tuples(st.just(T.IntegerType()), st.one_of(st.none(), I32)),
    st.tuples(st.just(T.BooleanType()), st.one_of(st.none(), st.booleans())),
    st.tuples(
        st.just(T.StringType()),
        st.one_of(st.none(), st.text(max_size=80)),
    ),
    st.tuples(
        st.just(T.DoubleType()),
        st.one_of(
            st.none(),
            st.floats(allow_nan=False, allow_infinity=False, width=64),
        ),
    ),
    st.tuples(
        st.just(T.DateType()),
        st.one_of(
            st.none(),
            st.dates(datetime.date(1900, 1, 1), datetime.date(2200, 1, 1)),
        ),
    ),
    st.tuples(
        st.just(T.TimestampNTZType()),
        st.one_of(
            st.none(),
            st.datetimes(
                datetime.datetime(1900, 1, 1), datetime.datetime(2200, 1, 1)
            ).map(lambda d: d.replace(microsecond=(d.microsecond // 1000) * 1000)),
        ),
    ),
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(TYPED_VALUE, min_size=1, max_size=4))
def test_python_xxhash64_matches_spark(spark, cols):
    dtypes = [dt for dt, _v in cols]
    values = [v for _dt, v in cols]
    lits = [F.lit(v).cast(dt) for dt, v in cols]
    want = spark.range(1).select(F.xxhash64(*lits).alias("h")).first()["h"]
    got = spark_xxhash64(values, dtypes)
    assert got == want


def test_pmod_bucket_in_range(spark):
    for m in (1, 2, 16, 1024):
        b = spark_pmod_xxhash64(["key"], [T.StringType()], m)
        assert 0 <= b < m
