"""APOC function library (functions/apoc.py) — unit semantics on literal
rows, covering the functions the oracle suites don't surface directly."""

from __future__ import annotations

from pyspark.sql import functions as F

from docker_neo4j_spark.functions import apoc


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_text_functions(spark):
    assert _one(spark, apoc.text_levenshtein_distance(F.lit("kitten"), F.lit("sitting"))) == 3
    assert _one(spark, apoc.text_levenshtein_similarity(F.lit("abc"), F.lit("abc"))) == 1.0
    assert _one(spark, apoc.text_hamming_distance(F.lit("karolin"), F.lit("kathrin"))) == 3
    # length difference counts toward hamming
    assert _one(spark, apoc.text_hamming_distance(F.lit("abc"), F.lit("abcdd"))) == 2
    assert _one(spark, apoc.text_hamming_distance(F.lit(""), F.lit(""))) == 0
    assert _one(spark, apoc.text_capitalize(F.lit("hello World"))) == "Hello World"
    assert _one(spark, apoc.text_clean(F.lit("Hello, World! 42"))) == "helloworld42"
    assert _one(spark, apoc.text_join(F.array(F.lit("a"), F.lit("b")), "|")) == "a|b"
    assert _one(spark, apoc.text_repeat(F.lit("ab"), 3)) == "ababab"
    assert _one(spark, apoc.text_index_of(F.lit("abcd"), "c")) == 2
    assert _one(spark, apoc.text_index_of(F.lit("abcd"), "z")) == -1
    assert _one(spark, apoc.text_char_at(F.lit("abc"), 1)) == ord("b")
    assert _one(spark, apoc.text_swap_case(F.lit("aBc9"))) == "AbC9"


def test_coll_functions(spark):
    l = F.array(*[F.lit(x) for x in (3, 1, 2, 3)])
    assert _one(spark, apoc.coll_sum(l)) == 9
    assert _one(spark, apoc.coll_avg(l)) == 2.25
    assert _one(spark, apoc.coll_min(l)) == 1
    assert _one(spark, apoc.coll_max(l)) == 3
    assert _one(spark, apoc.coll_to_set(l)) == [3, 1, 2]
    assert _one(spark, apoc.coll_sort(l)) == [1, 2, 3, 3]
    assert _one(spark, apoc.coll_contains(l, 2)) is True
    assert _one(spark, apoc.coll_index_of(l, 2)) == 2
    assert _one(spark, apoc.coll_index_of(l, 9)) == -1
    assert _one(spark, apoc.coll_pairs_joined(l)) == "3-1,1-2,2-3"
    assert _one(spark, apoc.coll_pairs_joined(F.array(F.lit(7)))) == ""
    nested = F.array(F.array(F.lit(1), F.lit(2)), F.array(F.lit(3)))
    assert _one(spark, apoc.coll_flatten(nested)) == [1, 2, 3]
    b = F.array(F.lit(2), F.lit(4))
    assert _one(spark, apoc.coll_union(l, b)) == [1, 2, 3, 4]
    assert _one(spark, apoc.coll_intersection(l, b)) == [2]
    assert _one(spark, apoc.coll_subtract(l, b)) == [1, 3]
    assert _one(spark, apoc.coll_zip_joined(l, b)) == "3:2,1:4"
    assert _one(spark, apoc.coll_zip_joined(F.array().cast("array<int>"), b)) == ""
    assert _one(spark, apoc.coll_frequencies_joined(l)) == "1:1,2:1,3:2"


def test_avg_of_empty_list_is_null(spark):
    empty = F.array().cast("array<long>")
    assert _one(spark, apoc.coll_avg(empty)) is None


def test_facade_return_apoc_functions(spark):
    """RETURN-position apoc.* through the Cypher façade's registered
    scalar-function path (same mechanism as RETURN apoc.version())."""
    from docker_neo4j_spark.cypher.session import Session

    s = Session(spark)
    r = s.run("RETURN apoc.text.clean('Hello, World!') AS c").first()
    assert r["c"] == "helloworld"
    r = s.run("RETURN apoc.text.levenshteinDistance('kitten', 'sitting') AS d").first()
    assert r["d"] == 3
    r = s.run("RETURN apoc.coll.sum([1, 2, 3]) AS s").first()
    assert r["s"] == 6
    r = s.run("RETURN apoc.coll.sort([3, 1, 2]) AS l").first()
    assert list(r["l"]) == [1, 2, 3]


def test_gds_similarity_functions(spark):
    from docker_neo4j_spark.functions import gds as G

    a = F.array(F.lit(1.0), F.lit(0.0))
    b = F.array(F.lit(0.0), F.lit(1.0))
    assert abs(_one(spark, G.cosine(a, a)) - 1.0) < 1e-12
    assert abs(_one(spark, G.cosine(a, b))) < 1e-6  # orthogonal
    import math

    assert abs(_one(spark, G.euclidean_distance(a, b)) - math.sqrt(2)) < 1e-12
    assert abs(_one(spark, G.euclidean(a, a)) - 1.0) < 1e-12
    sa = F.array(F.lit(1), F.lit(2), F.lit(3))
    sb = F.array(F.lit(2), F.lit(3), F.lit(4))
    assert abs(_one(spark, G.jaccard(sa, sb)) - 2 / 4) < 1e-12
    assert abs(_one(spark, G.overlap(sa, sb)) - 2 / 3) < 1e-12
    # façade RETURN position
    from docker_neo4j_spark.cypher.session import Session

    s = Session(spark)
    r = s.run("RETURN gds.similarity.jaccard([1, 2], [2, 3]) AS j").first()
    assert abs(r["j"] - 1 / 3) < 1e-12


def test_map_family_merge_setkey_remove_get(spark):
    from docker_neo4j_spark.functions import apoc

    df = spark.createDataFrame([(1, "x")], ["k", "v"])
    m1 = apoc.map_from_pairs(
        F.array(F.lit("a"), F.lit("b")), F.array(F.lit("1"), F.lit("2"))
    )
    m2 = apoc.map_from_pairs(F.array(F.lit("b")), F.array(F.lit("9")))
    row = df.select(
        apoc.map_sorted_join(apoc.map_merge(m1, m2)).alias("merged"),
        apoc.map_sorted_join(apoc.map_set_key(m1, "a", "7")).alias("set_a"),
        apoc.map_sorted_join(apoc.map_set_key(m1, "c", "3")).alias("set_new"),
        apoc.map_sorted_join(apoc.map_remove_key(m1, "a")).alias("removed"),
        apoc.map_get(m1, "a").alias("got"),
        apoc.map_get(m1, "zz", "dflt").alias("got_default"),
        F.array_join(apoc.map_keys_sorted(m1), ",").alias("keys"),
    ).collect()[0]
    assert row["merged"] == "a=1,b=9"  # right side wins on duplicate keys
    assert row["set_a"] == "a=7,b=2" and row["set_new"] == "a=1,b=2,c=3"
    assert row["removed"] == "b=2"
    assert row["got"] == "1" and row["got_default"] == "dflt"
    assert row["keys"] == "a,b"


def test_text_fuzzy_and_case_functions(spark):
    from docker_neo4j_spark.functions import apoc

    df = spark.createDataFrame(
        [("FOO BAR", "foo baz"), ("the", "thx"), ("ab", "ac"), ("night", "night")],
        "a string, b string",
    )
    rows = df.select(
        apoc.text_camel_case("a").alias("cc"),
        apoc.text_upper_camel_case("a").alias("ucc"),
        apoc.text_slug("a").alias("slug"),
        apoc.text_fuzzy_match("a", "b").alias("fz"),
        apoc.text_sorensen_dice_similarity("a", "b").alias("sd"),
    ).collect()
    assert (rows[0]["cc"], rows[0]["ucc"], rows[0]["slug"]) == ("fooBar", "FooBar", "FOO-BAR")
    # 'FOO BAR' vs 'foo baz' bigram multisets share {fo,oo,ba}+space-grams → 5/6
    assert abs(rows[0]["sd"] - 2 * 5 / 12) < 1e-12
    assert rows[1]["fz"] is True      # len 3 → 1 edit allowed, dist 1
    assert rows[2]["fz"] is False     # len 2 → exact only
    assert rows[3]["fz"] is True and rows[3]["sd"] == 1.0


def test_date_functions(spark):
    import pytest

    # 2021-03-04 05:06:07 UTC
    ms = 1614834367000
    assert _one(spark, apoc.date_format(F.lit(ms), "ms", "yyyy-MM-dd HH:mm:ss")) == (
        "2021-03-04 05:06:07"
    )
    assert (
        _one(spark, apoc.date_parse(F.lit("2021-03-04 05:06:07"), "ms", "yyyy-MM-dd HH:mm:ss"))
        == ms
    )
    # parse into coarser units truncates (TimeUnit.convert semantics)
    assert (
        _one(spark, apoc.date_parse(F.lit("2021-03-04 05:06:07"), "d", "yyyy-MM-dd HH:mm:ss"))
        == ms // 86_400_000
    )
    assert _one(spark, apoc.date_add(F.lit(ms), "ms", 2, "h")) == ms + 2 * 3_600_000
    assert _one(spark, apoc.date_add(F.lit(ms // 1000), "s", -1, "d")) == ms // 1000 - 86_400
    assert _one(spark, apoc.date_convert(F.lit(ms), "ms", "h")) == ms // 3_600_000
    assert _one(spark, apoc.date_field(F.lit(ms), "ms", "years")) == 2021
    assert _one(spark, apoc.date_field(F.lit(ms), "ms", "minutes")) == 6
    iso = _one(spark, apoc.date_to_iso8601(F.lit(ms), "ms"))
    assert iso == "2021-03-04T05:06:07.000Z"
    assert _one(spark, apoc.date_from_iso8601(F.lit(iso))) == ms
    # fail-loud on unknown units/fields — a typo'd unit must not silently
    # default (APOC raises too)
    with pytest.raises(ValueError, match="unsupported time unit"):
        apoc.date_convert(F.lit(ms), "ms", "fortnight")
    with pytest.raises(ValueError, match="unsupported field"):
        apoc.date_field(F.lit(ms), "ms", "weekday")


def test_agg_family(spark):
    """apoc.agg.* on a hand-computable group set."""
    df = spark.createDataFrame(
        [
            ("a", 1, 10.0),
            ("a", 2, 30.0),
            ("a", 3, 30.0),
            ("a", 4, 20.0),
            ("b", 7, 5.0),
        ],
        "g string, k int, v double",
    )
    out = (
        df.groupBy("g")
        .agg(
            apoc.agg_statistics(F.col("v")).alias("st"),
            apoc.agg_median(F.col("v")).alias("med"),
            apoc.agg_first(F.col("v"), F.col("k")).alias("first_v"),
            apoc.agg_last(F.col("v"), F.col("k")).alias("last_v"),
            apoc.agg_product(F.col("v")).alias("prod"),
            apoc.agg_max_items(F.col("k"), F.col("v")).alias("mx"),
            apoc.agg_min_items(F.col("k"), F.col("v")).alias("mn"),
            apoc.agg_slice(F.col("k"), F.col("k"), 1, 2).alias("sl"),
        )
        .collect()
    )
    rows = {r.g: r for r in out}
    a = rows["a"]
    assert a.st["count"] == 4 and a.st["min"] == 10.0 and a.st["max"] == 30.0
    assert a.st.sum == 90.0 and a.st.mean == 22.5
    # population stdev of [10,30,30,20]: sqrt(E[x^2]-mean^2) = sqrt(68.75)
    assert abs(a.st.stdev - 68.75**0.5) < 1e-12
    assert a.med == 25.0
    assert a.first_v == 10.0 and a.last_v == 20.0
    assert a.prod == 10.0 * 20.0 * 30.0 * 30.0
    assert a.mx.value == 30.0 and a.mx.items == [2, 3]
    assert a.mn.value == 10.0 and a.mn.items == [1]
    assert a.sl == [2, 3]
    b = rows["b"]
    assert b.st["count"] == 1 and b.st["stdev"] == 0.0
    assert b.mx.items == [7] and b.sl == []


def test_util_number_family(spark):
    """md5/sha256 concatenation, fixed-decimals format, try-cast parses,
    base64 roundtrip."""
    import hashlib

    row = (
        spark.range(1)
        .select(
            apoc.util_md5([F.lit("ab"), F.lit(7)]).alias("m"),
            apoc.util_sha256([F.lit("ab")]).alias("s"),
            apoc.number_format(F.lit(3.14159), 2).alias("f"),
            apoc.number_parse_int(F.lit("42")).alias("i"),
            apoc.number_parse_int(F.lit("nope")).alias("bad"),
            apoc.number_parse_float(F.lit("2.5")).alias("fl"),
            apoc.text_base64_decode(apoc.text_base64_encode(F.lit("hej då"))).alias("rt"),
        )
        .collect()[0]
    )
    assert row.m == hashlib.md5(b"ab7").hexdigest()
    assert row.s == hashlib.sha256(b"ab").hexdigest()
    assert row.f == "3.14"
    assert row.i == 42 and row.bad is None and row.fl == 2.5
    assert row.rt == "hej då"


def test_gds_pearson(spark):
    from docker_neo4j_spark.functions import gds as G

    up = F.array(*[F.lit(float(i)) for i in (1, 2, 3, 4)])
    down = F.array(*[F.lit(float(i)) for i in (8, 6, 4, 2)])
    same = F.array(*[F.lit(float(i)) for i in (2, 4, 6, 8)])
    assert abs(_one(spark, G.pearson(up, same)) - 1.0) < 1e-12
    assert abs(_one(spark, G.pearson(up, down)) + 1.0) < 1e-12
    # a constant vector has zero variance: correlation undefined → NULL
    # (a clamped denominator would fabricate an enormous value)
    const = F.array(*[F.lit(5.0) for _ in range(4)])
    assert _one(spark, G.pearson(up, const)) is None


def test_coll_partition_duplicates_occurrences_reverse(spark):
    l = F.array(*[F.lit(x) for x in (3, 1, 2, 3, 2, 5)])
    assert _one(spark, apoc.coll_partition(l, 2)) == [[3, 1], [2, 3], [2, 5]]
    assert _one(spark, apoc.coll_partition(l, 4)) == [[3, 1, 2, 3], [2, 5]]
    assert _one(spark, apoc.coll_duplicates(l)) == [2, 3]
    assert _one(spark, apoc.coll_occurrences(l, 2)) == 2
    assert _one(spark, apoc.coll_occurrences(l, 9)) == 0
    assert _one(spark, apoc.coll_reverse(l)) == [5, 2, 3, 2, 1, 3]
    empty = F.array().cast("array<int>")
    # APOC yields NO partitions for an empty list, not one empty partition
    assert _one(spark, apoc.coll_partition(empty, 3)) == []
    assert _one(spark, apoc.coll_duplicates(empty)) == []


def test_text_phonetic_soundex(spark):
    cases = {
        "Robert": "R163",
        "Ashcraft": "A261",   # the H/W adjacency rule
        "Tymczak": "T522",
        "Pfister": "P236",
        "Mc Donald": "M235",  # non-letters stripped before coding
        "khaki": "K200",
        "": "",
        "123": "",            # letterless → empty, never echoed back
    }
    cols = [apoc.text_phonetic(F.lit(w)).alias(f"c{i}") for i, w in enumerate(cases)]
    row = spark.range(1).select(cols).collect()[0]
    for i, (w, want) in enumerate(cases.items()):
        assert row[f"c{i}"] == want, w
