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
