"""HTTP serving wrapper: the reference's port surface (Dockerfile-trixie:54
EXPOSE 7474) driven end-to-end over a real socket."""

from __future__ import annotations

import json
import urllib.request

import pytest

from docker_neo4j_spark.cypher.session import Session
from docker_neo4j_spark.server import serve


@pytest.fixture
def server(spark):
    srv = serve(Session(spark), port=0)
    yield srv
    srv.stop()


def _post(srv, statements):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/db/neo4j/tx/commit",
        data=json.dumps({"statements": statements}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


def test_http_create_then_match(server):
    out = _post(
        server,
        [
            {"statement": "CREATE (arne:dog {name:'Arne'})-[:SNIFFS]->(bosse:dog {name:'Bosse'}) RETURN arne.name"},
        ],
    )
    assert out["errors"] == []
    out = _post(server, [{"statement": "MATCH (a:dog)-[:SNIFFS]->(b:dog) RETURN a.name"}])
    assert out["errors"] == []
    assert out["results"][0]["columns"] == ["a.name"]
    assert [d["row"] for d in out["results"][0]["data"]] == [["Arne"]]


def test_http_result_cap_has_more(spark):
    """A huge RETURN never materializes fully driver-side: the server
    fetches limit(cap+1), truncates, and flags hasMore."""
    from docker_neo4j_spark.server import run_statements

    out = run_statements(
        Session(spark),
        [{"statement": "UNWIND range(1, 1000000) AS x RETURN x"}],
        max_rows=50,
    )
    assert out["errors"] == []
    res = out["results"][0]
    assert len(res["data"]) == 50 and res["hasMore"] is True
    assert res["data"][0]["row"] == [1]

    # under the cap: no hasMore key (wire shape unchanged for normal use)
    out = run_statements(
        Session(spark), [{"statement": "UNWIND range(1, 3) AS x RETURN x"}], max_rows=50
    )
    assert "hasMore" not in out["results"][0]
    assert len(out["results"][0]["data"]) == 3


def test_http_multi_statement_and_error(server):
    out = _post(
        server,
        [
            {"statement": "RETURN 1"},
            {"statement": "THIS IS NOT CYPHER"},
            {"statement": "RETURN 2"},  # aborted after the error
        ],
    )
    assert len(out["results"]) == 1
    assert out["results"][0]["data"] == [{"row": [1]}]
    assert len(out["errors"]) == 1
    assert out["errors"][0]["code"].startswith("Neo.ClientError")


def test_http_discovery_and_bad_endpoint(server):
    with urllib.request.urlopen(f"http://127.0.0.1:{server.port}/") as resp:
        doc = json.loads(resp.read())
    assert "neo4j_version" in doc
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/nope", data=b"{}", method="POST"
    )
    try:
        urllib.request.urlopen(req)
        raised = False
    except urllib.error.HTTPError as ex:
        raised = ex.code == 404
    assert raised


def test_http_cluster_available_readiness(spark):
    """GET /db/<db>/cluster/available — the exact path the reference's
    wait strategy polls (WaitStrategies.java:24-28): 200 while online,
    404 after STOP DATABASE, 200 again after START."""
    import json as _json
    import urllib.request

    from docker_neo4j_spark.admin import Dbms
    from docker_neo4j_spark.cypher.session import Session
    from docker_neo4j_spark.server import HttpServer

    s = Session(spark)
    s.dbms = Dbms()
    srv = HttpServer(s).start()
    try:
        url = f"http://127.0.0.1:{srv.port}/db/neo4j/cluster/available"
        with urllib.request.urlopen(url) as r:
            assert r.status == 200
            assert _json.loads(r.read())["available"] is True
        s.dbms.stop_database("neo4j")
        try:
            urllib.request.urlopen(url)
            raise AssertionError("expected 404 while stopped")
        except urllib.error.HTTPError as e:
            assert e.code == 404
        s.dbms.start_database("neo4j")
        with urllib.request.urlopen(url) as r:
            assert r.status == 200
    finally:
        srv.stop()
