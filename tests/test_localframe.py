"""localframe.local_df must be a drop-in for spark.createDataFrame on
every shape the package uses: identical schema AND values, but planned
as a JVM LocalRelation (LocalTableScan) instead of a Python-RDD scan
wherever the arrow route is semantics-preserving."""

from __future__ import annotations

import datetime
import decimal

import pytest

from docker_neo4j_spark.localframe import local_df


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


ZOO = [
    # (rows, ddl)
    ([{"a": 1, "b": "x"}, {"a": None, "b": None}], "a long, b string"),
    ([(1, ["p", "q"]), (2, None)], "id long, labels array<string>"),
    ([{"t": datetime.datetime(2024, 1, 2, 3, 4, 5)}], "t timestamp"),
    ([{"d": datetime.date(2024, 1, 2)}], "d date"),
    ([{"x": decimal.Decimal("1.23")}], "x decimal(10,2)"),
    ([{"b": b"xyz"}], "b binary"),
    ([{"m": {"k": "v"}}], "m map<string,string>"),
    ([{"s": {"a": 1}}], "s struct<a:long>"),
    ([{"v": [1, None, 3]}], "v array<long>"),
    ([{"f": True}], "f boolean"),
    ([{"x": 2.5}], "x double"),
    ([], "id long, name string"),
]


@pytest.mark.parametrize("rows,ddl", ZOO, ids=[d[:24] for _, d in ZOO])
def test_matches_classic_with_schema(spark, rows, ddl):
    classic = spark.createDataFrame(list(rows), ddl)
    fast = local_df(spark, list(rows), ddl)
    assert fast.schema == classic.schema
    key = lambda t: repr(t)  # noqa: E731 — None-safe ordering
    assert sorted(map(tuple, fast.collect()), key=key) == sorted(
        map(tuple, classic.collect()), key=key
    )


def test_plans_as_local_relation(spark):
    df = local_df(spark, [{"a": 1}], "a long")
    assert "LocalTableScan" in _plan(df)
    assert "ExistingRDD" not in _plan(df)


def test_schema_less_inference_matches(spark):
    rows = [{"a": 1, "b": "x", "c": [1, 2], "f": 1.5, "t": True}]
    classic = spark.createDataFrame(rows)
    fast = local_df(spark, rows)
    assert fast.schema == classic.schema
    assert fast.collect() == classic.collect()


def test_schema_less_divergent_values_fall_back(spark):
    # dict → MapType under classic inference (arrow would say struct):
    # must fall back, preserving classic semantics
    rows = [{"m": {"k": "v"}}]
    fast = local_df(spark, rows)
    assert dict(fast.dtypes)["m"].startswith("map<")


def test_row_objects_and_tuples(spark):
    from pyspark.sql import Row

    rows = [Row(a=1, b="x"), Row(a=2, b="y")]
    fast = local_df(spark, rows, "a long, b string")
    assert [tuple(r) for r in fast.collect()] == [(1, "x"), (2, "y")]
    assert "LocalTableScan" in _plan(fast)


def test_struct_type_schema(spark):
    from pyspark.sql.types import LongType, StructField, StructType

    st = StructType([StructField("k", LongType())])
    fast = local_df(spark, [(7,)], st)
    assert fast.schema == st
    assert fast.collect()[0][0] == 7


def test_timestamp_ntz_falls_back_identically(spark):
    rows = [{"t": datetime.datetime(2024, 1, 2, 3, 4, 5)}]
    classic = spark.createDataFrame(rows, "t timestamp_ntz")
    fast = local_df(spark, rows, "t timestamp_ntz")
    assert fast.schema == classic.schema
    assert fast.collect() == classic.collect()
