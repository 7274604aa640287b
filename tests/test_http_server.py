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


def test_http_return_entity_serializes_as_map(spark):
    """``RETURN n`` over the HTTP API serializes the entity as a JSON
    object {id, labels, properties} — a struct Row is a tuple, so without
    the asDict branch the field names would be lost (r10)."""
    from docker_neo4j_spark.server import run_statements

    s = Session(spark)
    s.run("CREATE (:dog {name:'Arne', age: 7})")
    out = run_statements(s, [{"statement": "MATCH (n:dog) RETURN n"}])
    assert out["errors"] == []
    ent = out["results"][0]["data"][0]["row"][0]
    assert ent["labels"] == ["dog"]
    # typed properties (r11): age arrives as long 7, not '7'
    assert ent["properties"] == {"name": "Arne", "age": 7}
    assert isinstance(ent["id"], int)


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


def test_https_self_signed_tls(spark, tmp_path):
    """TLS façade (the reference's 7473 HTTPS port, docker-entrypoint.sh
    /ssl mount contract): a PEM cert+key wrap the listening socket; a
    client trusting the cert queries the same transaction API over
    https; plain-HTTP clients are refused by the handshake."""
    import shutil
    import ssl
    import subprocess

    if shutil.which("openssl") is None:
        pytest.skip("openssl binary not available to mint a test cert")
    key, crt = tmp_path / "private.key", tmp_path / "public.crt"
    subprocess.run(
        [
            "openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
            "-keyout", str(key), "-out", str(crt), "-days", "1",
            "-subj", "/CN=127.0.0.1",
            "-addext", "subjectAltName=IP:127.0.0.1",
        ],
        check=True,
        capture_output=True,
    )
    srv = serve(Session(spark), port=0, cert_path=str(crt), key_path=str(key))
    try:
        assert srv.scheme == "https"
        ctx = ssl.create_default_context(cafile=str(crt))
        req = urllib.request.Request(
            f"https://127.0.0.1:{srv.port}/db/neo4j/tx/commit",
            data=json.dumps(
                {"statements": [{"statement": "RETURN 42 AS v"}]}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, context=ctx) as resp:
            out = json.loads(resp.read())
        assert out["errors"] == []
        assert out["results"][0]["data"][0]["row"] == [42]
        # a plain-HTTP request against the TLS socket must fail, not serve
        with pytest.raises(Exception):
            urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/", timeout=5
            )
    finally:
        srv.stop()
