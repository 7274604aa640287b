"""r14 surface pins — the VERDICT r13 findings as regression tests:

1. typed property reads over CARRIED entity structs — [r IN
   relationships(p) | r.w] / collect(n) elements keep the stored Spark
   type (the r10 string-cast contract returned '1.5');
2. the result boundary decodes VariantVal to plain Python values and
   presents carriers in the client entity shape (slim typed-field
   carriers rebuild the properties map);
3. type-correct ``+`` inside HOF lambdas (string accumulators concat,
   empty-list accumulators retype and append);
4. null/empty-collection semantics (1 IN null → null, range(1,0) → [],
   sum() over zero rows → 0);
5. isNaN(), LIMIT/SKIP function expressions, the int64-min literal;
6. CREATE…SET += / label forms; MERGE refuses null key properties;
7. RETURN * serializes entities (Neo4j record shape);
8. all-aggregate CALL{} subqueries keep zero-match outer rows;
   EXISTS{} correlates through a WHERE-only predicate;
9. zero-length path binding; ORDER BY alias.field on projected structs;
10. duration.between components truncate toward zero on negative spans.
"""

from __future__ import annotations

import pytest

from docker_neo4j_spark.cypher.session import Session


@pytest.fixture()
def session(spark):
    return Session(spark)


def _vals(session, q, params=None):
    return [tuple(r) for r in session.run(q, params).collect()]


# ---- 1/2. typed carrier reads + boundary presentation --------------------


@pytest.fixture()
def chain(session):
    session.run(
        "CREATE (:T14 {x: 1, nm: 'a'})-[:TW {w: 1.5}]->"
        "(:T14 {x: 2, nm: 'b'})-[:TW {w: 2.5}]->(:T14 {x: 3, nm: 'c'})"
    )
    return session


def test_rel_list_projection_keeps_types(chain):
    rows = _vals(
        chain,
        "MATCH p=(a:T14 {x:1})-[:TW*2]->(c) "
        "RETURN [r IN relationships(p) | r.w] AS ws",
    )
    assert rows == [([1.5, 2.5],)]
    assert all(isinstance(v, float) for v in rows[0][0])


def test_collect_element_projection_keeps_types(chain):
    rows = _vals(
        chain,
        "MATCH (n:T14) WITH collect(n) AS ns RETURN [x IN ns | x.x] AS xs",
    )
    assert rows == [([1, 2, 3],)]
    assert all(isinstance(v, int) for v in rows[0][0])


def test_boundary_decodes_variants_and_rebuilds_properties(chain):
    r = chain.run("MATCH ()-[r:TW {w: 1.5}]->() RETURN r").collect()[0]["r"]
    assert dict(r["properties"]) == {"w": 1.5}
    assert not any(
        hasattr(v, "toPython") for v in r["properties"].values()
    ), "VariantVal must never reach the client"
    assert [f for f in r.asDict() if f.startswith("__p_")] == []


def test_carrier_keys_properties_and_missing_prop(chain):
    rows = _vals(
        chain,
        "MATCH (n:T14 {x:1}) WITH collect(n) AS ns UNWIND ns AS x "
        "RETURN keys(x) AS ks, x.nope AS missing",
    )
    assert rows == [(["nm", "x"], None)]
    pr = chain.run(
        "MATCH (n:T14 {x:1}) WITH collect(n) AS ns UNWIND ns AS x "
        "RETURN properties(x) AS pr"
    ).collect()[0]["pr"]
    assert dict(pr) == {"x": 1, "nm": "a"}


def test_carrier_map_projection_and_dynamic_key(chain):
    rows = chain.run(
        "MATCH (n:T14 {x:1}) WITH collect(n) AS ns UNWIND ns AS x "
        "RETURN x {.nm, dbl: x.x * 2} AS mp, x['nm'] AS dyn"
    ).collect()
    assert rows[0]["mp"].asDict() == {"nm": "a", "dbl": 2}
    assert rows[0]["dyn"] == "a"


# ---- 3. HOF lambda `+` dispatch ------------------------------------------


def test_reduce_string_concat_and_list_append(session):
    assert _vals(
        session,
        "RETURN reduce(acc = '', w IN ['a','b'] | acc + w) AS j, "
        "reduce(acc = [], x IN [1,2] | acc + x) AS l, "
        "reduce(acc = 0.5, x IN [1,2] | acc + x) AS d",
    ) == [("ab", [1, 2], 3.5)]


def test_comprehension_string_concat(session):
    assert _vals(
        session, "RETURN [w IN ['a','b'] | w + '!'] AS e"
    ) == [(["a!", "b!"],)]


# ---- 4. null/empty collection semantics ----------------------------------


def test_in_null_and_empty_range(session):
    assert _vals(
        session,
        "RETURN 1 IN null AS a, range(1, 0) AS b, range(1, 0, -1) AS c",
    ) == [(None, [], [1, 0])]


def test_sum_over_zero_rows_is_zero(session):
    session.run("CREATE (:S14 {x: 1})")
    assert _vals(
        session,
        "MATCH (z:S14) WHERE z.x > 99 RETURN sum(z.x) AS s, count(z.x) AS c",
    ) == [(0, 0)]


def test_sum_avg_distinct(session):
    assert _vals(
        session,
        "UNWIND [1,1,2] AS x RETURN sum(DISTINCT x) AS s, "
        "avg(DISTINCT x) AS a",
    ) == [(3, 1.5)]


def test_nested_list_in(session):
    assert _vals(
        session, "RETURN [1,2] IN [[1,2],[3]] AS yes, 1 IN [[1,2]] AS no"
    ) == [(True, False)]


# ---- 5. isNaN / LIMIT fn-expr / int64 min --------------------------------


def test_isnan_limit_fn_expr_and_int_min(session):
    assert _vals(
        session, "RETURN isNaN(0.0/0.0) AS a, isNaN(1.5) AS b"
    ) == [(True, False)]
    assert _vals(
        session,
        "UNWIND [1,2,3] AS x RETURN x ORDER BY x "
        "LIMIT toInteger(ceil(1.2))",
    ) == [(1,), (2,)]
    assert _vals(session, "RETURN -9223372036854775808 AS m") == [
        (-(2**63),)
    ]


def test_string_vs_number_ordering_is_null(session):
    assert _vals(session, "RETURN ('9.0' < 5) IS NULL AS a") == [(True,)]


# ---- 6. CREATE…SET forms / MERGE null keys -------------------------------


def test_create_set_map_merge_and_label(session):
    rows = _vals(
        session,
        "CREATE (n:C14 {a: 0}) SET n += {a: 1, b: 'x'}, n:Extra "
        "RETURN n.a AS a, n.b AS b, labels(n) AS ls",
    )
    assert rows[0][:2] == (1, "x")
    assert sorted(rows[0][2]) == ["C14", "Extra"]


def test_merge_refuses_null_key(session):
    with pytest.raises(ValueError, match="null property value"):
        session.run("MERGE (n:M14 {k: null}) RETURN n")
    with pytest.raises(Exception, match="null property value"):
        session.run("WITH null AS v MERGE (n:M14b {k: v}) RETURN n")


# ---- 7. RETURN * record shape --------------------------------------------


def test_return_star_entity_shape(session):
    session.run("CREATE (a:R14 {k: 1})-[:RR {w: 2}]->(b:R14 {k: 2})")
    row = session.run("MATCH (a:R14)-[r:RR]->(b) RETURN *").collect()[0]
    assert sorted(row.asDict()) == ["a", "b", "r"]
    assert row["r"]["type"] == "RR" and dict(row["r"]["properties"]) == {
        "w": 2
    }


# ---- 8. subquery semantics ----------------------------------------------


def test_call_subquery_aggregate_keeps_zero_match_rows(session):
    session.run("CREATE (:Q14 {k: 1}), (:Q14 {k: 2}), (:Q14 {k: 3})")
    assert _vals(
        session,
        "MATCH (n:Q14) CALL { WITH n MATCH (m:Q14) WHERE m.k > n.k "
        "RETURN count(m) AS bigger, sum(m.k) AS ksum } "
        "RETURN n.k AS k, bigger, ksum ORDER BY k",
    ) == [(1, 2, 5), (2, 1, 3), (3, 0, 0)]


def test_exists_where_only_correlation(session):
    session.run("CREATE (:E14q {k: 1}), (:E14q {k: 2}), (:E14q {k: 3})")
    assert _vals(
        session,
        "MATCH (n:E14q) WHERE EXISTS { MATCH (m:E14q) "
        "WHERE m.k = n.k + 1 } RETURN n.k AS k ORDER BY k",
    ) == [(1,), (2,)]
    assert _vals(
        session,
        "MATCH (n:E14q) WHERE NOT EXISTS { MATCH (m:E14q) "
        "WHERE m.k = n.k + 1 } RETURN n.k AS k",
    ) == [(3,)]


# ---- 9. zero-length paths / ORDER BY alias.field / WITH top-k ------------


def test_zero_length_path_binding(session):
    session.run("CREATE (:Z14 {k: 1})")
    assert _vals(
        session,
        "MATCH p=(a:Z14) RETURN length(p) AS l, size(nodes(p)) AS n, "
        "size(relationships(p)) AS r, [x IN nodes(p) | x.k] AS ks",
    ) == [(0, 1, 0, [1])]


def test_order_by_alias_struct_field(session):
    session.run("CREATE (:O14 {nm: 'b'}), (:O14 {nm: 'a'})")
    rows = session.run(
        "MATCH (n:O14) RETURN n {.nm} AS mp ORDER BY mp.nm"
    ).collect()
    assert [r["mp"]["nm"] for r in rows] == ["a", "b"]


def test_standalone_with_order_skip_limit(session):
    # collect() sorts its list (the engine's determinism contract), so
    # the top-k LIMIT is what's under test, not the order inside collect
    assert _vals(
        session,
        "UNWIND [3,1,2] AS x WITH x ORDER BY x DESC LIMIT 2 "
        "RETURN collect(x) AS c",
    ) == [([2, 3],)]


# ---- 10. negative duration decomposition ---------------------------------


def test_negative_duration_between_truncates_toward_zero(session):
    assert _vals(
        session,
        "RETURN duration.between(date('2024-01-15'), date('2024-01-01'))"
        ".days AS d, "
        "duration.between(date('2024-01-15'), date('2024-01-01'))"
        ".months AS m, "
        "duration.inDays(date('2024-02-01'), date('2024-01-01')).days AS t",
    ) == [(-14, 0, -31)]


def test_count_collect_where_only_correlation(session):
    session.run(
        "CREATE (:Wq14 {k: 1, t: 'x'}), (:Wq14 {k: 2, t: 'y'}), "
        "(:Wq14 {k: 3, t: 'x'})"
    )
    assert _vals(
        session,
        "MATCH (n:Wq14) RETURN n.k AS k, "
        "COUNT { MATCH (m:Wq14) WHERE m.t = n.t } AS same_t ORDER BY k",
    ) == [(1, 2), (2, 1), (3, 2)]
    assert _vals(
        session,
        "MATCH (n:Wq14 {k: 1}) RETURN "
        "COLLECT { MATCH (m:Wq14) WHERE m.k > n.k RETURN m.k } AS ks",
    ) == [([2, 3],)]
