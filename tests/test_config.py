"""Config-engine parity tests — the semantics TestConfSettings.java:99-471
exercises against the container: env-over-file, default-no-overwrite,
append-only keys, name munging, secrets, plugin default merge, semver."""

from __future__ import annotations

import pytest

from docker_neo4j_spark.config import (
    Conf,
    dereference_secrets,
    env_to_setting,
    resolve_plugin_jar,
    semver_match,
)


def test_env_name_munging():
    assert env_to_setting("NEO4J_server_memory_pagecache_size") == "server.memory.pagecache.size"
    # double underscore escapes a literal underscore
    assert env_to_setting("NEO4J_server_memory_heap__size") == "server.memory.heap_size"
    assert env_to_setting("NEO4J_apoc_export_file_enabled") == "apoc.export.file.enabled"


def test_docker_default_does_not_overwrite():
    conf = Conf()
    conf.file("neo4j.conf")["server.directories.logs"] = "/custom/logs"
    conf.add_docker_default("server.directories.logs", "/logs")
    conf.add_docker_default("server.directories.import", "/import")
    assert conf.get("server.directories.logs") == "/custom/logs"
    assert conf.get("server.directories.import") == "/import"


def test_env_setting_overrides_file():
    conf = Conf()
    conf.file("neo4j.conf")["server.memory.heap.max_size"] = "512M"
    conf.add_env_setting("server.memory.heap.max_size", "1G")
    assert conf.get("server.memory.heap.max_size") == "1G"


def test_append_only_keys_accumulate():
    conf = Conf()
    conf.add_env_setting("server.jvm.additional", "-Dfoo=1")
    conf.add_env_setting("server.jvm.additional", "-Dbar=2")
    assert conf.get("server.jvm.additional") == ["-Dfoo=1", "-Dbar=2"]


def test_per_prefix_routing():
    conf = Conf()
    conf.add_env_setting("apoc.export.file.enabled", "true")
    conf.add_env_setting("server.default_listen_address", "0.0.0.0")
    assert "apoc.export.file.enabled" in conf.file("apoc.conf")
    assert "apoc.export.file.enabled" not in conf.file("neo4j.conf")
    assert "server.default_listen_address" in conf.file("neo4j.conf")


def test_apply_env_filters():
    conf = Conf()
    warnings = conf.apply_env(
        {
            "NEO4J_server_memory_pagecache_size": "512M",
            "NEO4J_AUTH": "neo4j/secret",  # not_configs → skipped
            "NEO4J_PASSWORD_FILE": "/run/secret",  # *_FILE → skipped
            "NEO4J_empty_setting": "",  # empty value → skipped
            "NEO4J_5incompatible": "x",  # leading digit → warning
            "UNRELATED_VAR": "y",  # wrong prefix → skipped
        }
    )
    f = conf.file("neo4j.conf")
    assert f == {"server.memory.pagecache.size": "512M"}
    assert any("not permitted" in w for w in warnings)


def test_secret_dereference(tmp_path):
    p = tmp_path / "auth"
    p.write_text("neo4j/supersecret\n")
    env = {"NEO4J_AUTH_FILE": str(p), "NEO4J_other": "1"}
    out = dereference_secrets(env, lambda path: open(path).read())
    assert out["NEO4J_AUTH"] == "neo4j/supersecret"
    with pytest.raises(ValueError, match="not readable"):
        dereference_secrets({"NEO4J_AUTH_FILE": str(tmp_path / "missing")}, lambda path: open(path).read())


def test_plugin_default_merge():
    plugins_json = {
        "apoc": {
            "properties": {
                "dbms.security.procedures.unrestricted": "apoc.*",
                "apoc.import.enabled": "true",
            }
        }
    }
    conf = Conf()
    conf.file("neo4j.conf")["dbms.security.procedures.unrestricted"] = "gds.*"
    msgs = conf.apply_plugin_defaults("apoc", plugins_json, user_conf={})
    # existing value gets the plugin value comma-prepended
    assert conf.get("dbms.security.procedures.unrestricted") == "apoc.*,gds.*"
    # plugin defaults always land in neo4j.conf (entrypoint hardcodes it),
    # even for apoc-prefixed properties
    assert conf.file("neo4j.conf")["apoc.import.enabled"] == "true"
    assert msgs == []

    # user-set properties are never touched
    conf2 = Conf()
    msgs2 = conf2.apply_plugin_defaults(
        "apoc", plugins_json, user_conf={"dbms.security.procedures.unrestricted": "mine"}
    )
    assert conf2.get("dbms.security.procedures.unrestricted") is None
    assert any("already set" in m for m in msgs2)


def test_semver_match():
    # truth table verified against the reference's semver.jq via jq itself:
    #   5.x vs 5.20    → true        5.x vs 5.20.0 → false (wildcard must
    #   5.20.x vs 5.20.0 → true        align with the requested arity)
    assert semver_match("5.x", "5.20")
    assert semver_match("5.20.x", "5.20.0")
    assert semver_match("5.*", "5.1")
    assert semver_match("5.20.0", "5.20.0")
    assert not semver_match("5.x", "5.20.0")
    assert not semver_match("2025.x", "2025.01.0")
    assert not semver_match("4.x", "5.20.0")
    assert not semver_match("5.x", "")
    assert not semver_match("5.x.x", "5")
    assert not semver_match("5", "5.20.0")


def test_resolve_plugin_jar_min_by():
    versions = [
        {"neo4j": "5.19.0", "jar": "old.jar"},
        {"neo4j": "5.20.x", "jar": "wild.jar"},
        {"neo4j": "5.20.0", "jar": "exact.jar"},
        {"neo4j": "6.0.0", "jar": "future.jar"},
    ]
    # both 5.20.x and 5.20.0 match 5.20.0; min_by version-key picks the
    # wildcard (x sorts below numbers, matching jq's min_by on parsed objs)
    assert resolve_plugin_jar(versions, "5.20.0") == "wild.jar"
    assert resolve_plugin_jar(versions, "6.0.0") == "future.jar"
    assert resolve_plugin_jar(versions, "7.1.2") is None


def test_legacy_plugins_name_migration():
    from docker_neo4j_spark.config import migrate_legacy_env

    env, warns = migrate_legacy_env({"NEO4JLABS_PLUGINS": '["apoc"]'})
    assert env["NEO4J_PLUGINS"] == '["apoc"]'
    assert any("renamed to NEO4J_PLUGINS" in w for w in warns)
    # explicit new name wins over the legacy one
    env2, _ = migrate_legacy_env({"NEO4JLABS_PLUGINS": "old", "NEO4J_PLUGINS": "new"})
    assert env2["NEO4J_PLUGINS"] == "new"
    env3, warns3 = migrate_legacy_env({"NEO4J_PLUGINS": "new"})
    assert env3["NEO4J_PLUGINS"] == "new" and warns3 == []


def test_extension_hook(tmp_path):
    from docker_neo4j_spark.config import run_extension_hook

    script = tmp_path / "ext.py"
    script.write_text("x = 1")
    ran = []
    assert run_extension_hook({"EXTENSION_SCRIPT": str(script)}, ran.append) is True
    assert ran == [str(script)]
    assert run_extension_hook({}, ran.append) is False
    assert run_extension_hook({"EXTENSION_SCRIPT": str(tmp_path / "no")}, ran.append) is False
    assert ran == [str(script)]


def test_config_render_dump():
    conf = Conf()
    conf.add_docker_default("server.directories.logs", "/logs")
    conf.add_env_setting("server.jvm.additional", "-Dfoo=1")
    conf.add_env_setting("server.jvm.additional", "-Dbar=2")
    out = conf.render()
    assert out.splitlines() == [
        "server.directories.logs=/logs",
        "server.jvm.additional=-Dfoo=1",
        "server.jvm.additional=-Dbar=2",
    ]


def test_extended_conf_command_expansion():
    """EXTENDED_CONF $(cmd) expansion incl. the invalid-command failure
    path (TestExtendedConf.java:59,68-151): valid command → stdout becomes
    the value; failing command → fail fast with the setting name and the
    command's stderr, first error only."""
    from docker_neo4j_spark.config import Conf

    conf = Conf()
    # ExtendedConf.conf: server.logs.gc.rotation.keep_number=$(expr 2 * 10)
    conf.add_env_setting("server.logs.gc.rotation.keep_number", "$(expr 2 '*' 10)")
    conf.add_env_setting("server.memory.heap.max_size", "512m")  # untouched
    expanded = conf.expand_commands()
    assert expanded == ["server.logs.gc.rotation.keep_number"]
    assert conf.get("server.logs.gc.rotation.keep_number") == "20"
    assert conf.get("server.memory.heap.max_size") == "512m"

    # InvalidExtendedConf.conf: the command prints to stderr and exits 1
    bad = Conf()
    bad.add_env_setting(
        "server.logs.gc.rotation.keep_number",
        "$(bash -c '>&2 echo \"this is an error message from inside neo4j config command expansion\" && exit 1')",
    )
    bad.add_env_setting("server.other", "$(echo never-reached)")
    with pytest.raises(ValueError) as ei:
        bad.expand_commands()
    msg = str(ei.value)
    assert "Error evaluating value for setting 'server.logs.gc.rotation.keep_number'" in msg
    assert "this is an error message from inside neo4j config command expansion" in msg


def test_extended_conf_expansion_with_fake_shell():
    """The run_command seam: deterministic fake shell, no subprocess."""
    from docker_neo4j_spark.config import Conf

    conf = Conf()
    conf.add_env_setting("server.a", "$(get-a)")
    calls = []

    def fake(cmd):
        calls.append(cmd)
        return 0, "forty-two\n", ""

    conf.expand_commands(run_command=fake)
    assert calls == ["get-a"] and conf.get("server.a") == "forty-two"
