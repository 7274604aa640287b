"""GraphQL read surface (graphql.py — the reference's `graphql` plugin
manifest key, neo4j-plugins.json:28-32)."""

import pytest

from docker_neo4j_spark.graphql import tpch_engine
from docker_neo4j_spark.sources.tpch import build_graph

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def engine(spark):
    return tpch_engine(build_graph(spark, SF))


def test_scalar_selection_with_filter_and_limit(engine):
    rows = engine.execute(
        'query { nation(name: "NATION_13") { name } }'
    ).collect()
    assert [r["name"] for r in rows] == ["NATION_13"]
    limited = engine.execute("{ nation(limit: 5) { name } }").collect()
    assert len(limited) == 5
    # deterministic page: sorted by the selected column
    assert [r["name"] for r in limited] == sorted(r["name"] for r in limited)


def test_to_one_relation_flattens(engine):
    rows = engine.execute(
        '{ nation(name: "NATION_13") { name region { name } } }'
    ).collect()
    assert [(r["name"], r["region_name"]) for r in rows] == [("NATION_13", "EUROPE")]


def test_to_many_relation_collects_sorted(engine):
    rows = engine.execute(
        '{ region(name: "EUROPE") { name nations { name } } }'
    ).collect()
    assert len(rows) == 1
    names = rows[0]["nations_name"].split(",")
    assert "NATION_13" in names and names == sorted(names)


def test_unknown_field_and_subset_violations_fail_loudly(engine):
    with pytest.raises(ValueError, match="unknown GraphQL field"):
        engine.execute("{ dragon { name } }")
    with pytest.raises(ValueError, match="unknown selection"):
        engine.execute("{ nation { wingspan } }")
    with pytest.raises(ValueError, match="one nesting level"):
        engine.execute("{ region { nations { region { name } } } }")
    with pytest.raises(ValueError, match="selection set is required"):
        engine.execute("{ nation }")
    with pytest.raises(ValueError, match="parse error"):
        engine.execute("{ nation { name }")  # unbalanced


def test_quoted_braces_in_arguments(engine):
    # a string argument containing '{' '}' must not derail the tokenizer
    rows = engine.execute('{ nation(name: "no{such}nation") { name } }').collect()
    assert rows == []


def test_to_many_multi_prop_rows_stay_aligned(engine, spark):
    """Sibling fields of the same child object must stay row-aligned:
    the struct array is sorted ONCE, not per column (r7 review: per-column
    array_sort decorrelated name[i] from its own mktsegment[i])."""
    rows = engine.execute(
        '{ nation(name: "NATION_13") { name customers { name mktsegment } } }'
    ).collect()
    assert len(rows) == 1
    names = rows[0]["customers_name"].split(",")
    segs = rows[0]["customers_mktsegment"].split(",")
    assert len(names) == len(segs) and len(names) > 1
    # oracle: the true (name, segment) pairs from the raw tables
    from docker_neo4j_spark.sources.tpch import load_tables

    t = load_tables(spark, SF)
    truth = {
        r["c_name"]: r["c_mktsegment"]
        for r in t["customer"].join(
            t["nation"], t["customer"]["c_nationkey"] == t["nation"]["n_nationkey"]
        ).where(t["nation"]["n_name"] == "NATION_13").collect()
    }
    assert dict(zip(names, segs)) == truth
    assert names == sorted(names)
