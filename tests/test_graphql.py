"""GraphQL read surface (graphql.py — the reference's `graphql` plugin
manifest key, neo4j-plugins.json:28-32)."""

import pytest
from pyspark.sql import functions as F

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
    with pytest.raises(ValueError, match="selection set is required"):
        engine.execute("{ nation }")
    with pytest.raises(ValueError, match="no selection set"):
        engine.execute("{ nation { name { x } } }")
    with pytest.raises(ValueError, match="execute_document"):
        engine.execute("{ region { name } nation { name } }")
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


def _split_escaped(s):
    """Split on unescaped commas, then unescape — the documented consumer
    protocol for to-many serialization."""
    out, cur, i = [], [], 0
    while i < len(s):
        ch = s[i]
        if ch == "\\" and i + 1 < len(s):
            cur.append(s[i + 1])
            i += 2
        elif ch == ",":
            out.append("".join(cur))
            cur = []
            i += 1
        else:
            cur.append(ch)
            i += 1
    out.append("".join(cur))
    return out


def test_two_level_nesting_to_one_under_to_many(engine):
    # r8: nesting depth is no longer capped at one
    rows = engine.execute(
        '{ region(name: "EUROPE") { name nations { name region { name } } } }'
    ).collect()
    assert len(rows) == 1
    names = rows[0]["nations_name"].split(",")
    backrefs = rows[0]["nations_region_name"].split(",")
    assert len(names) == len(backrefs) > 1
    assert set(backrefs) == {"EUROPE"}


def test_two_level_nesting_to_many_under_to_many(engine, spark):
    rows = engine.execute(
        '{ region(name: "EUROPE") { name nations { name customers { name } } } }'
    ).collect()
    assert len(rows) == 1
    nations = rows[0]["nations_name"].split(",")
    # the inner lists arrive escaped: their own commas become \,
    inner = _split_escaped(rows[0]["nations_customers_name"])
    assert len(inner) == len(nations)
    from docker_neo4j_spark.sources.tpch import load_tables

    t = load_tables(spark, SF)
    truth = {
        r["n_name"]: r["names"]
        for r in t["customer"]
        .join(t["nation"], t["customer"]["c_nationkey"] == t["nation"]["n_nationkey"])
        .groupBy("n_name")
        .agg(F.sort_array(F.collect_list("c_name")).alias("names"))
        .collect()
    }
    for n, kids in zip(nations, inner):
        assert kids.split(",") == truth.get(n, [])


def test_multi_root_document(engine):
    res = engine.execute_document(
        '{ region(name: "EUROPE") { name } nation(name: "NATION_13") { name } }'
    )
    assert set(res) == {"region", "nation"}
    assert [r["name"] for r in res["region"].collect()] == ["EUROPE"]
    assert [r["name"] for r in res["nation"].collect()] == ["NATION_13"]
    with pytest.raises(ValueError, match="duplicate top-level field"):
        engine.execute_document("{ region { name } region { name } }")


def test_to_many_casts_nonstring(engine):
    """acctbal is a double — it must serialize through cast-to-string
    instead of failing concat_ws analysis (ADVICE r7)."""
    rows = engine.execute(
        '{ nation(name: "NATION_13") { name customers { name acctbal } } }'
    ).collect()
    assert len(rows) == 1
    names = _split_escaped(rows[0]["customers_name"])
    bals = _split_escaped(rows[0]["customers_acctbal"])
    assert len(names) == len(bals) > 1
    for b in bals:
        float(b)  # every serialized acctbal parses back as a number


def test_to_many_escapes_commas_and_backslashes(spark):
    """Values containing the serialization metacharacters round-trip
    unambiguously (ADVICE r7: bare concat_ws(',') decorrelated)."""
    from docker_neo4j_spark.graphql import GraphQLEngine, GraphQLType, Relation

    parents = spark.createDataFrame([(1, "p1")], ["id", "pname"])
    kids = spark.createDataFrame(
        [(10, "a,b"), (11, "c\\d"), (12, "plain")], ["id", "kname"]
    )
    edges = spark.createDataFrame(
        [(100, 1, 10), (101, 1, 11), (102, 1, 12)], ["id", "src", "dst"]
    )
    eng = GraphQLEngine(
        {"P": parents, "K": kids},
        {"HAS": edges},
        {
            "parent": GraphQLType(
                "P", {"name": "pname"}, {"kids": Relation("HAS", "out", "kid", True)}
            ),
            "kid": GraphQLType("K", {"name": "kname"}),
        },
    )
    rows = eng.execute("{ parent { name kids { name } } }").collect()
    assert len(rows) == 1
    assert _split_escaped(rows[0]["kids_name"]) == sorted(["a,b", "c\\d", "plain"])
    # the serialized form itself is escaped
    assert "\\," in rows[0]["kids_name"] and "\\\\" in rows[0]["kids_name"]


@pytest.fixture()
def store_eng(spark):
    from docker_neo4j_spark.graphql import GraphQLType, Relation, store_engine
    from docker_neo4j_spark.storage.store import GraphStore

    store = GraphStore(spark)
    store.create_nodes("Nation", [{"n_name": "NATION_A"}, {"n_name": "NATION_B"}])
    types = {
        "nation": GraphQLType(label="Nation", props={"name": "n_name"}),
    }
    return store_engine(store, types)


def test_mutation_create_and_read_your_writes(store_eng):
    created = store_eng.execute(
        'mutation { createNation(name: "NATION_NEW") { name } }'
    ).collect()
    assert [r["name"] for r in created] == ["NATION_NEW"]
    # the QUERY path reads the live store: the new node is visible
    back = store_eng.execute('{ nation(name: "NATION_NEW") { name } }').collect()
    assert [r["name"] for r in back] == ["NATION_NEW"]


def test_mutation_delete(store_eng):
    deleted = store_eng.execute(
        'mutation { deleteNation(name: "NATION_B") }'
    ).collect()
    assert [r["deleted"] for r in deleted] == [1]
    left = store_eng.execute("{ nation { name } }").collect()
    assert "NATION_B" not in {r["name"] for r in left}


def test_mutation_update_sets_props(spark):
    from docker_neo4j_spark.graphql import GraphQLType, store_engine
    from docker_neo4j_spark.storage.store import GraphStore

    store = GraphStore(spark)
    store.create_nodes("Customer", [{"c_name": "c1", "c_mktsegment": "OLD"}])
    eng = store_engine(
        store,
        {
            "customer": GraphQLType(
                label="Customer",
                props={"name": "c_name", "mktsegment": "c_mktsegment"},
            )
        },
    )
    out = eng.execute(
        'mutation { updateCustomer(name: "c1", mktsegment: "BUILDING") '
        "{ name mktsegment } }"
    ).collect()
    assert [(r["name"], r["mktsegment"]) for r in out] == [("c1", "BUILDING")]


def test_mutation_fail_loud_surface(store_eng, engine):
    with pytest.raises(ValueError, match="unknown mutation"):
        store_eng.execute("mutation { renameNation(name: \"x\") { name } }")
    with pytest.raises(ValueError, match="unknown GraphQL type"):
        store_eng.execute("mutation { createDragon(name: \"x\") { name } }")
    with pytest.raises(ValueError, match="no selection set"):
        store_eng.execute('mutation { deleteNation(name: "x") { name } }')
    with pytest.raises(ValueError, match="require a GraphStore"):
        engine.execute('mutation { createNation(name: "x") { name } }')
    with pytest.raises(ValueError, match="scalar fields only"):
        store_eng.execute('mutation { createNation(name: "x") { name { y } } }')


def test_nested_field_arguments_filter_children(engine):
    """r8: arguments on nested fields filter the child set before the
    join — an empty filtered list serializes as ''."""
    rows = engine.execute(
        '{ region(name: "EUROPE") { name nations(name: "NATION_13") { name } } }'
    ).collect()
    assert len(rows) == 1 and rows[0]["nations_name"] == "NATION_13"
    rows2 = engine.execute(
        '{ region(name: "EUROPE") { name nations(name: "NO_SUCH") { name } } }'
    ).collect()
    assert rows2[0]["nations_name"] == ""
    with pytest.raises(ValueError, match="unknown argument"):
        engine.execute('{ region { name nations(wing: 1) { name } } }')


def test_where_filters_and_aliases(spark):
    """r9: neo4j-graphql `where:` input objects — operator-suffixed
    fields (gt/gte/contains/starts_with/in/not) AND-ed into one filter —
    plus GraphQL field aliases renaming output columns."""
    from docker_neo4j_spark.cypher.session import Session
    from docker_neo4j_spark.graphql import GraphQLType, store_engine

    s = Session(spark)
    for nm, bal, seg in (
        ("a", 100, "RETAIL"), ("ab", 900, "RETAIL"),
        ("abc", 900, "WHOLESALE"), ("zed", 50, "RETAIL"),
    ):
        s.run(f"CREATE (:Cust {{name: '{nm}', bal: {bal}, seg: '{seg}'}}) ")
    eng = store_engine(
        s.store,
        {"cust": GraphQLType(label="Cust", props={
            "name": "name", "bal": "bal", "seg": "seg"})},
    )
    rows = eng.execute(
        '{ cust(where: {name_starts_with: "a", bal_gte: 900}) { name } }'
    ).orderBy("name").collect()
    assert [r["name"] for r in rows] == ["ab", "abc"]
    rows = eng.execute(
        '{ cust(where: {name_in: ["a", "zed"], bal_gt: 60}) { name } }'
    ).collect()
    assert [r["name"] for r in rows] == ["a"]
    rows = eng.execute(
        '{ cust(where: {seg_not: "RETAIL"}) { n: name b: bal } }'
    ).collect()
    assert [(r["n"], r["b"]) for r in rows] == [("abc", 900)]
    rows = eng.execute(
        '{ cust(where: {name_contains: "b", bal_lt: 901}) { name } }'
    ).orderBy("name").collect()
    assert [r["name"] for r in rows] == ["ab", "abc"]
    # unknown where field fails loud
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown where field"):
        eng.execute('{ cust(where: {nope_gt: 1}) { name } }').collect()
