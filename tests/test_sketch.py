"""Count-min sketch vs exact counts: the CMS guarantee (est ≥ exact, and
exact when the sketch is wide enough to avoid collisions) on known data.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from docker_neo4j_spark.operators import sketch


def _counts(spark, data, depth, width):
    df = spark.createDataFrame([(k,) for k in data], "k string")
    sk = sketch.countmin_build(df, "k", depth=depth, width=width)
    keys = df.select("k").distinct()
    est = sketch.countmin_query(sk, keys, "k", depth=depth, width=width)
    return {r.key: r.est for r in est.collect()}


def test_never_underestimates_and_exact_when_wide(spark):
    data = ["a"] * 7 + ["b"] * 3 + ["c"] * 5 + list("defghij")
    exact = Counter(data)
    wide = _counts(spark, data, depth=4, width=1024)
    assert wide == dict(exact)  # 10 keys in 4×1024 buckets: no collisions
    narrow = _counts(spark, data, depth=2, width=4)
    assert set(narrow) == set(exact)
    for k, v in narrow.items():
        assert v >= exact[k]
    assert sum(narrow.values()) > sum(exact.values())  # collisions occurred


def test_absent_key_reads_zero_or_collision(spark):
    df = spark.createDataFrame([("x",), ("y",)], "k string")
    sk = sketch.countmin_build(df, "k", depth=4, width=1024)
    probe = spark.createDataFrame([("zz",)], "k string")
    est = sketch.countmin_query(sk, probe, "k", depth=4, width=1024)
    assert est.collect()[0].est == 0


def test_sketch_size_is_bounded(spark):
    df = spark.createDataFrame([(str(i % 50),) for i in range(1000)], "k string")
    sk = sketch.countmin_build(df, "k", depth=4, width=64)
    assert sk.count() <= 4 * 64
    total = sk.groupBy("row").agg(F.sum("count").alias("s")).collect()
    assert all(r.s == 1000 for r in total)  # every row counts every item


def test_windowed_sketch_isolates_windows(spark):
    """Keys in different windows never pollute each other's counters;
    per-window state is bounded at depth×width."""
    import datetime as _dt

    from docker_neo4j_spark.operators import sketch

    t0 = _dt.datetime(2024, 1, 1)
    rows = [(t0, "a")] * 5 + [(t0, "b")] * 2 + [(t0 + _dt.timedelta(days=1), "a")] * 3
    df = spark.createDataFrame(rows, "ts timestamp, k string")
    sk = sketch.countmin_build_windowed(df, "k", window="1 day", depth=4, width=1024)
    assert sk.groupBy("win_start", "row").count().count() <= 2 * 4
    keys = df.select("k").distinct()
    est = sketch.countmin_query_windowed(sk, keys, "k", depth=4, width=1024)
    got = {(r.win_start, r.key): r.est for r in est.collect()}
    assert got[(t0, "a")] == 5 and got[(t0, "b")] == 2
    assert got[(t0 + _dt.timedelta(days=1), "a")] == 3
    assert got[(t0 + _dt.timedelta(days=1), "b")] == 0
