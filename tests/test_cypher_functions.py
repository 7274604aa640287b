"""Semantic-delta tests for functions/cypher: the places where Cypher and
Spark SQL disagree and the mapping layer must own the shift."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from docker_neo4j_spark.functions import cypher as cy


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_substring_is_zero_based(spark):
    s = F.lit("hello world")
    assert _one(spark, cy.substring(s, 0, 5)) == "hello"
    assert _one(spark, cy.substring(s, 6)) == "world"


def test_split_and_replace_are_literal_not_regex(spark):
    s = F.lit("a.b.c")
    assert _one(spark, cy.split(s, ".")) == ["a", "b", "c"]
    assert _one(spark, cy.replace(s, ".", "-")) == "a-b-c"
    # a regex-meta delimiter must not explode into per-char splits
    s2 = F.lit("x|y|z")
    assert _one(spark, cy.split(s2, "|")) == ["x", "y", "z"]


def test_range_is_inclusive_with_step(spark):
    assert _one(spark, cy.range_(1, 5)) == [1, 2, 3, 4, 5]
    assert _one(spark, cy.range_(1, 5, 2)) == [1, 3, 5]


def test_list_accessors(spark):
    lst = F.array(F.lit(10), F.lit(20), F.lit(30))
    assert _one(spark, cy.head(lst)) == 10
    assert _one(spark, cy.last(lst)) == 30
    assert _one(spark, cy.tail(lst)) == [20, 30]
    assert _one(spark, cy.tail(F.array(F.lit(1)))) == []
    assert _one(spark, cy.size_list(lst)) == 3
    assert _one(spark, cy.size(F.lit("abcd"))) == 4


def test_reduce_and_comprehension(spark):
    lst = F.array(F.lit(1), F.lit(2), F.lit(3), F.lit(4))
    total = cy.reduce_(lst, F.lit(0), lambda acc, x: acc + x)
    assert _one(spark, total) == 10
    evens_doubled = cy.list_comprehension(
        lst, predicate=lambda x: x % 2 == 0, extract=lambda x: x * 10
    )
    assert _one(spark, evens_doubled) == [20, 40]


def test_day_of_week_is_iso(spark):
    # 2024-01-01 was a Monday → 1; 2024-01-07 Sunday → 7
    assert _one(spark, cy.dayOfWeek(F.lit(datetime.date(2024, 1, 1)))) == 1
    assert _one(spark, cy.dayOfWeek(F.lit(datetime.date(2024, 1, 7)))) == 7


def test_left_right_reverse(spark):
    s = F.lit("spark")
    assert _one(spark, cy.left(s, 2)) == "sp"
    assert _one(spark, cy.right(s, 3)) == "ark"
    assert _one(spark, cy.reverse(s)) == "kraps"


def test_case_and_coalesce(spark):
    v = cy.case_when([(F.lit(False), F.lit("a")), (F.lit(True), F.lit("b"))], otherwise=F.lit("c"))
    assert _one(spark, v) == "b"
    assert _one(spark, cy.coalesce(F.lit(None), F.lit(None), F.lit(5))) == 5


def test_properties_map_and_json(spark):
    df = spark.createDataFrame([(1, "x", '{"k": 7}')], ["a", "b", "js"])
    m = df.select(cy.properties("a", "b").alias("m")).first()["m"]
    assert m == {"a": "1", "b": "x"}
    assert df.select(cy.json_extract("js", "$.k").alias("v")).first()["v"] == "7"
    got = df.select(cy.map_get(cy.from_json_map("js", "long"), "k").alias("v")).first()["v"]
    assert got == 7


def test_point_and_haversine(spark):
    from docker_neo4j_spark.functions import cypher as cy

    df = spark.createDataFrame([(0.0, 0.0, 3.0, 4.0)], "ax double, ay double, bx double, by double")
    r = df.select(
        cy.point_distance(cy.point("ax", "ay"), cy.point("bx", "by")).alias("d"),
        cy.point_x(cy.point("ax", "ay")).alias("x"),
    ).first()
    assert r["d"] == 5.0 and r["x"] == 0.0

    # Paris (48.8566, 2.3522) — Berlin (52.52, 13.405): ~878 km
    g = spark.createDataFrame([(48.8566, 2.3522, 52.52, 13.405)], "a double, b double, c double, d double")
    km = g.select((cy.haversine_m("a", "b", "c", "d") / 1000.0).alias("km")).first()["km"]
    assert abs(km - 878) < 10


def test_math_trig_family(spark):
    """r9 scalar-library fill: tan/asin/acos/atan/cot/degrees/radians/e/
    haversin — pytest-graded (transcendentals are 1-ulp engine-dependent,
    per the oracle policy)."""
    import math

    from docker_neo4j_spark.functions import cypher as cf

    def one(col):
        return spark.range(1).select(col.alias("v")).first()["v"]

    x = F.lit(0.5)
    assert abs(one(cf.tan(x)) - math.tan(0.5)) < 1e-12
    assert abs(one(cf.asin(x)) - math.asin(0.5)) < 1e-12
    assert abs(one(cf.acos(x)) - math.acos(0.5)) < 1e-12
    assert abs(one(cf.atan(x)) - math.atan(0.5)) < 1e-12
    assert abs(one(cf.cot(x)) - 1 / math.tan(0.5)) < 1e-12
    assert abs(one(cf.degrees(cf.pi())) - 180.0) < 1e-9
    assert abs(one(cf.radians(F.lit(180.0))) - math.pi) < 1e-12
    assert abs(one(cf.e()) - math.e) < 1e-15
    assert abs(one(cf.haversin(x)) - math.sin(0.25) ** 2) < 1e-12


def test_conversion_or_null_and_misc(spark):
    from docker_neo4j_spark.functions import cypher as cf

    def one(col):
        return spark.range(1).select(col.alias("v")).first()["v"]

    assert one(cf.toBoolean(F.lit("TRUE"))) is True
    assert one(cf.toBoolean(F.lit("false"))) is False
    assert one(cf.toBoolean(F.lit("nope"))) is None
    assert one(cf.toIntegerOrNull(F.lit("12"))) == 12
    assert one(cf.toIntegerOrNull(F.lit("x"))) is None
    assert one(cf.toFloatOrNull(F.lit("2.5"))) == 2.5
    assert one(cf.toFloatOrNull(F.lit("x"))) is None
    import re as _re

    assert _re.fullmatch(r"[0-9a-f-]{36}", one(cf.randomUUID()))
    assert one(cf.timestamp()) > 1_500_000_000_000  # epoch millis scale


def test_facade_trig_element_id_isempty(spark):
    from docker_neo4j_spark.cypher.session import Session

    s = Session(spark)
    s.run("CREATE (:T {name: 'x', tags: 'a,b'})")
    r = s.run(
        "MATCH (t:T) RETURN elementId(t) AS eid, isEmpty(t.name) AS e1, "
        "isEmpty('') AS e2, round(degrees(pi()) / 6) AS thirty"
    ).first()
    assert isinstance(r["eid"], str) and r["eid"].isdigit()
    assert r["e1"] is False and r["e2"] is True
    assert r["thirty"] == 30.0
