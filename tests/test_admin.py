"""Admin-surface parity: NEO4J_AUTH parsing, license gate, password ops,
database lifecycle with query refusal, backup/restore ordering."""

from __future__ import annotations

import pytest

from docker_neo4j_spark.admin import AdminError, Dbms, license_gate, parse_auth


def test_parse_auth_none_disables():
    assert parse_auth("none").enabled is False
    assert parse_auth(None).enabled is True  # auth on, password unset


def test_parse_auth_validations():
    spec = parse_auth("neo4j/mysecretpw")
    assert (spec.user, spec.password, spec.require_password_change) == ("neo4j", "mysecretpw", False)
    assert parse_auth("neo4j/mysecretpw/true").require_password_change is True

    with pytest.raises(AdminError, match="cannot be 'neo4j'"):
        parse_auth("neo4j/neo4j")
    with pytest.raises(AdminError, match="must be neo4j"):
        parse_auth("admin/mysecretpw")
    with pytest.raises(AdminError, match="minimum password length is 8"):
        parse_auth("neo4j/short")
    # conf overrides the minimum, exactly like the entrypoint reads it back
    assert parse_auth("neo4j/short", {"dbms.security.auth_minimum_password_length": "4"}).password == "short"
    with pytest.raises(AdminError, match="Invalid value for NEO4J_AUTH"):
        parse_auth("a/b/c/d")


def test_license_gate():
    license_gate("community", {})
    license_gate("enterprise", {"NEO4J_ACCEPT_LICENSE_AGREEMENT": "yes"})
    license_gate("enterprise", {"NEO4J_ACCEPT_LICENSE_AGREEMENT": "eval"})
    with pytest.raises(AdminError, match="accept the license agreement"):
        license_gate("enterprise", {})
    with pytest.raises(AdminError, match="accept the license agreement"):
        license_gate("enterprise", {"NEO4J_ACCEPT_LICENSE_AGREEMENT": "no"})


def test_auth_flow_and_password_change():
    dbms = Dbms.bootstrap("neo4j/firstsecret")
    dbms.authenticate("neo4j", "firstsecret")
    with pytest.raises(AdminError, match="authentication failure"):
        dbms.authenticate("neo4j", "wrong")

    # ALTER CURRENT USER SET PASSWORD FROM ... TO ...
    with pytest.raises(AdminError, match="Invalid principal"):
        dbms.alter_current_user_password("neo4j", "wrong", "nextsecret")
    with pytest.raises(AdminError, match="cannot be the same"):
        dbms.alter_current_user_password("neo4j", "firstsecret", "firstsecret")
    dbms.alter_current_user_password("neo4j", "firstsecret", "nextsecret")
    dbms.authenticate("neo4j", "nextsecret")
    with pytest.raises(AdminError):
        dbms.authenticate("neo4j", "firstsecret")

    # initial password is one-shot (neo4j-admin dbms set-initial-password)
    with pytest.raises(AdminError, match="already been set"):
        dbms.set_initial_password("another1")


def test_require_password_change_blocks_until_changed():
    dbms = Dbms.bootstrap("neo4j/firstsecret/true")
    with pytest.raises(AdminError, match="must be changed"):
        dbms.authenticate("neo4j", "firstsecret")
    dbms.change_password("neo4j", "firstsecret", "nextsecret")
    dbms.authenticate("neo4j", "nextsecret")


def test_auth_none_accepts_anything():
    dbms = Dbms.bootstrap("none")
    dbms.authenticate("whoever", "whatever")


def test_create_write_stop_drop_lifecycle(spark):
    """r10 database DDL end-to-end: CREATE DATABASE → bind a session to
    it → write → read back → STOP refuses queries → START → DROP →
    queries refused because the db no longer exists; store isolation
    between databases; system db undroppable."""
    from docker_neo4j_spark.cypher.session import Session

    dbms = Dbms.bootstrap("none")
    admin = Session(spark, dbms=dbms)
    admin.run("CREATE DATABASE movies")
    with pytest.raises(AdminError, match="already exists"):
        admin.run("CREATE DATABASE movies")
    admin.run("CREATE DATABASE movies IF NOT EXISTS")  # no-op
    movies = Session(spark, dbms=dbms, database="movies")
    movies.run("CREATE (:Film {title: 'Arrival'})")
    assert movies.run("MATCH (f:Film) RETURN count(*) AS n").collect()[0].n == 1
    # isolation: the default db does not see movies' writes
    assert admin.run("MATCH (f:Film) RETURN count(*) AS n").collect()[0].n == 0
    admin.run("STOP DATABASE movies")
    with pytest.raises(AdminError, match="unavailable"):
        movies.run("MATCH (f:Film) RETURN f.title AS t")
    admin.run("START DATABASE movies")
    assert movies.run("MATCH (f:Film) RETURN count(*) AS n").collect()[0].n == 1
    admin.run("DROP DATABASE movies")
    with pytest.raises(AdminError, match="does not exist"):
        movies.run("MATCH (f:Film) RETURN f.title AS t")
    with pytest.raises(AdminError, match="does not exist"):
        admin.run("DROP DATABASE movies")
    admin.run("DROP DATABASE movies IF EXISTS")  # no-op
    with pytest.raises(AdminError, match="system"):
        admin.run("DROP DATABASE system")
    names = [r.name for r in admin.run("SHOW DATABASES").collect()]
    assert names == ["neo4j", "system"]


def test_database_lifecycle_refuses_queries_when_stopped():
    dbms = Dbms.bootstrap("none")
    dbms.check_queryable("neo4j")
    dbms.stop_database("neo4j")
    with pytest.raises(AdminError, match="unavailable"):
        dbms.check_queryable("neo4j")
    assert ("neo4j", "offline") in dbms.show_databases()
    dbms.start_database("neo4j")
    dbms.check_queryable("neo4j")
    with pytest.raises(AdminError, match="does not exist"):
        dbms.stop_database("nope")


def test_backup_restore_ordering():
    dbms = Dbms.bootstrap("none")
    dbms.backup("neo4j", graph={"snapshot": 1})
    # restore refused while online (reference stops the db first)
    with pytest.raises(AdminError, match="must be stopped"):
        dbms.restore("neo4j")
    dbms.stop_database("neo4j")
    assert dbms.restore("neo4j") == {"snapshot": 1}
    with pytest.raises(AdminError, match="No backup"):
        dbms.stop_database("system") or dbms.restore("system")


def test_server_report(spark):
    dbms = Dbms.bootstrap("neo4j/firstsecret")
    rep = dbms.server_report(spark)
    assert rep["databases"]["neo4j"] == "online"
    assert rep["users"] == ["neo4j"]
    assert "spark_version" in rep and "conf" in rep


def test_backup_is_consistent_while_writes_in_flight(spark):
    """An online backup must be a point-in-time snapshot: writes committed
    after the backup may not leak into it (the reference backs up a live,
    written-to database)."""
    from docker_neo4j_spark.storage.store import GraphStore

    store = GraphStore(spark)
    store.create_nodes("dog", [{"name": "Arne"}])
    dbms = Dbms.bootstrap("none")
    dbms.backup("neo4j", store)

    store.create_nodes("dog", [{"name": "Armstrong"}])
    assert store.graph.nodes.count() == 2  # live store sees the new write

    dbms.stop_database("neo4j")
    snap = dbms.restore("neo4j")
    names = [r["name"] for r in snap.nodes.select("name").collect()]
    assert names == ["Arne"]
