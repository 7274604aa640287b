"""Property tests (hypothesis) for the config-layering laws — the
reference's most-tested surface (TestConfSettings.java:99-471 runs a
example matrix; these state the *laws* that matrix samples).

Pure-Python layer, no SparkSession: runs in milliseconds.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from docker_neo4j_spark.config import (
    APPEND_NOT_REPLACE,
    Conf,
    dereference_secrets,
    migrate_legacy_env,
    semver_match,
)
from docker_neo4j_spark.session import ENGINE_DEFAULT_CONF, resolve_conf

# setting names: dotted lowercase words, never starting with a digit,
# never an append-only key
_word = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)
_setting = st.builds(lambda a, b: f"{a}.{b}", _word, _word).filter(
    lambda s: s not in APPEND_NOT_REPLACE
)
_value = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")), min_size=1, max_size=8
)


@given(_setting, st.lists(_value, min_size=1, max_size=5))
@settings(max_examples=200, deadline=None)
def test_defaults_never_overwrite(setting, defaults):
    """A2: however many docker defaults are layered on, the FIRST one wins
    and later ones are ignored."""
    conf = Conf()
    for v in defaults:
        conf.add_docker_default(setting, v)
    assert conf.get(setting) == defaults[0]


@given(_setting, _value, st.lists(_value, min_size=1, max_size=5))
@settings(max_examples=200, deadline=None)
def test_env_overrides_any_default_order(setting, env_val, defaults):
    """A3: an env setting beats file defaults regardless of whether the
    defaults were applied before or after it."""
    before, after = Conf(), Conf()
    for v in defaults:
        before.add_docker_default(setting, v)
    before.add_env_setting(setting, env_val)

    after.add_env_setting(setting, env_val)
    for v in defaults:
        after.add_docker_default(setting, v)

    assert before.get(setting) == after.get(setting) == env_val


@given(_setting, st.lists(_value, min_size=1, max_size=5))
@settings(max_examples=200, deadline=None)
def test_env_upsert_last_wins_and_append_only_accumulates(setting, values):
    """Non-append keys: last env value wins. Append-only keys: every value
    is kept, in order (reference: server.jvm.additional grows, never
    replaces — TestConfSettings 'shouldAppendJvmAdditional')."""
    conf = Conf()
    for v in values:
        conf.add_env_setting(setting, v)
    assert conf.get(setting) == values[-1]

    jvm = Conf()
    for v in values:
        jvm.add_env_setting("server.jvm.additional", v)
    got = jvm.get("server.jvm.additional")
    assert got == (values if len(values) > 1 else values)


@given(_word, _value, st.dictionaries(_word, _value, max_size=3))
@settings(max_examples=200, deadline=None)
def test_secret_dereference_total_and_non_destructive(base, content, extra_env):
    """A9: *_FILE vars materialize the base var from file contents; all
    other vars pass through untouched; the _FILE var itself is kept."""
    env = {f"NEO4J_{base}_FILE": "/run/secrets/x"}
    env.update({f"OTHER_{k}": v for k, v in extra_env.items()})
    out = dereference_secrets(env, lambda path: content + "\n")
    assert out[f"NEO4J_{base}"] == content.strip()
    for k, v in env.items():
        assert out[k] == v


@given(st.integers(0, 99), st.integers(0, 99), st.integers(0, 99))
@settings(max_examples=200, deadline=None)
def test_semver_laws(a, b, c):
    """semver.jq decision table laws: exact match; x/* wildcard positions;
    prefix specs never silently match longer concrete versions."""
    v = f"{a}.{b}.{c}"
    assert semver_match(v, v)
    assert semver_match(f"{a}.{b}.x", v)
    assert semver_match(f"{a}.x.x", v)
    assert not semver_match(f"{a + 1}.{b}.{c}", v)
    assert not semver_match(f"{a}.{b + 1}.x", v)
    assert not semver_match(v, "")


@given(st.dictionaries(st.sampled_from(["NEO4JLABS_PLUGINS", "NEO4J_PLUGINS", "HOME"]), _value, max_size=3))
@settings(max_examples=200, deadline=None)
def test_legacy_migration_explicit_name_wins(env):
    """A17: NEO4JLABS_PLUGINS migrates to NEO4J_PLUGINS, but an explicitly
    set new name is never clobbered."""
    out, warnings = migrate_legacy_env(env)
    if "NEO4JLABS_PLUGINS" in env:
        assert warnings
        expected = env.get("NEO4J_PLUGINS", env["NEO4JLABS_PLUGINS"])
        assert out["NEO4J_PLUGINS"] == expected
    else:
        assert out == env and not warnings


@given(
    st.dictionaries(
        st.sampled_from(sorted(ENGINE_DEFAULT_CONF) + ["user.custom.key"]),
        _value,
        max_size=4,
    )
)
@settings(max_examples=100, deadline=None)
def test_session_conf_layering_a15(extra):
    """A15: caller conf always beats engine defaults; untouched defaults
    all survive; no other keys appear."""
    out = resolve_conf(extra)
    for k, v in extra.items():
        assert out[k] == v
    for k, v in ENGINE_DEFAULT_CONF.items():
        if k not in extra:
            assert out[k] == v
    assert set(out) == set(ENGINE_DEFAULT_CONF) | set(extra)
