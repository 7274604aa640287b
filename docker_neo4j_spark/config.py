"""Configuration-layering engine — the reference's most-tested surface.

Re-expresses the container entrypoint's config semantics (pure logic, no
bash translation) against an in-memory conf model:

- env→setting projection with name munging and exclusion lists
  (docker-entrypoint.sh:595-615: strip prefix, ``_``→``.``, ``__``→``_``,
  skip ``*_FILE``/empty/number-leading, not_configs list)
- docker-default insert that never overwrites user values
  (add_docker_default_to_conf, docker-entrypoint.sh:254-265)
- env upsert that overrides file values except append-only keys
  (add_env_setting_to_conf, docker-entrypoint.sh:268-297)
- per-prefix conf routing (``apoc.*`` → apoc.conf, else neo4j.conf)
- ``*_FILE`` docker-secret dereference (docker-entrypoint.sh:400-427)
- plugin default-config merge: skip if user-set, comma-append if present,
  else insert (apply_plugin_default_configuration, :182-213)
- semver matching + plugin jar resolution
  (docker-image-src/common/semver.jq; load_plugin_from_url:138-180 —
  select matching entries, take min_by(version), return its jar)

The conf model is a dict of files → ordered dict of setting → value,
where append-only keys hold lists.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

ENV_PREFIX = "NEO4J_"

# docker-entrypoint.sh:590-591 — env vars that are control knobs, not settings
NOT_CONFIGS = frozenset(
    {
        "NEO4J_ACCEPT_LICENSE_AGREEMENT",
        "NEO4J_AUTH",
        "NEO4J_AUTH_PATH",
        "NEO4J_DEBUG",
        "NEO4J_EDITION",
        "NEO4J_HOME",
        "NEO4J_PLUGINS",
        "NEO4J_SHA256",
        "NEO4J_TARBALL",
        "NEO4J_DEPRECATION_WARNING",
    }
)

# docker-entrypoint.sh:273 — settings appended, never replaced
APPEND_NOT_REPLACE = frozenset({"server.jvm.additional"})


def env_to_setting(env_name: str) -> str:
    """``NEO4J_server_memory_heap__size`` → ``server.memory.heap_size``.

    The entrypoint's sed pipeline: strip prefix, every ``_`` → ``.``, then
    every ``..`` (which a ``__`` became) → ``_``.
    """
    s = env_name.removeprefix(ENV_PREFIX)
    s = s.replace("_", ".")
    return s.replace("..", "_")


def dereference_secrets(env: dict[str, str], read_file) -> dict[str, str]:
    """``NEO4J_x_FILE=path`` → ``NEO4J_x=<contents of path>`` (A9).

    ``read_file(path)`` returns contents or raises OSError; an unreadable
    secret is a hard error, exactly like the entrypoint's exit 1.
    """
    out = dict(env)
    for name, path in env.items():
        if name.endswith("_FILE") and name.startswith(ENV_PREFIX):
            base = name[: -len("_FILE")]
            try:
                out[base] = read_file(path).strip()
            except OSError as ex:
                raise ValueError(
                    f"The secret file '{path}' does not exist or is not readable."
                ) from ex
    return out


@dataclass
class Conf:
    """In-memory stand-in for the conf directory: file → setting → value
    (append-only settings hold a list)."""

    files: dict[str, dict[str, object]] = field(default_factory=dict)

    def _file_for(self, setting: str) -> str:
        # per-prefix routing (docker-entrypoint.sh:276-284)
        return "apoc.conf" if setting.split(".", 1)[0] == "apoc" else "neo4j.conf"

    def file(self, name: str) -> dict[str, object]:
        return self.files.setdefault(name, {})

    def get(self, setting: str):
        return self.file(self._file_for(setting)).get(setting)

    def add_docker_default(self, setting: str, value: str) -> None:
        """Defaults never overwrite what's already configured (A2)."""
        f = self.file(self._file_for(setting))
        if setting not in f:
            f[setting] = value

    def add_env_setting(self, setting: str, value: str) -> None:
        """Env settings override the file — except append-only keys (A3)."""
        f = self.file(self._file_for(setting))
        if setting in APPEND_NOT_REPLACE:
            cur = f.get(setting)
            f[setting] = ([*cur, value] if isinstance(cur, list) else [cur, value]) if cur else [value]
        else:
            f[setting] = value

    def apply_env(self, env: dict[str, str]) -> list[str]:
        """Project the whole environment (A1); returns warnings."""
        warnings = []
        for name in sorted(env, reverse=True):  # entrypoint iterates sort -rn
            if not name.startswith(ENV_PREFIX) or name in NOT_CONFIGS or name.endswith("_FILE"):
                continue
            value = env[name]
            if not value:
                continue
            setting = env_to_setting(name)
            if re.match(r"^[0-9]", setting):
                warnings.append(
                    f"WARNING: {setting} not written to conf file. Settings that "
                    "start with a number are not permitted."
                )
                continue
            self.add_env_setting(setting, value)
        return warnings

    def apply_plugin_defaults(
        self, plugin_name: str, plugins_json: dict, user_conf: dict[str, str]
    ) -> list[str]:
        """Merge a plugin's required properties (A5): user-set wins
        untouched, existing values get comma-appended, else inserted."""
        messages = []
        props = plugins_json.get(plugin_name, {}).get("properties", {})
        neo4j_conf = self.file("neo4j.conf")
        for prop, value in props.items():
            if prop in user_conf:
                messages.append(
                    f"Skipping {prop} for plugin {plugin_name} because it is already set."
                )
            elif prop in neo4j_conf:
                neo4j_conf[prop] = f"{value},{neo4j_conf[prop]}"
            else:
                neo4j_conf[prop] = value
        return messages


    def expand_commands(self, run_command=None) -> list[str]:
        """EXTENDED_CONF command expansion: a value of the exact form
        ``$(command)`` is replaced by the command's stdout
        (TestExtendedConf.java:59,68-151 — ``--expand-commands`` is passed
        when the EXTENDED_CONF env var is set, docker-entrypoint.sh:344).

        ``run_command(cmd)`` returns (exit_code, stdout, stderr); the
        default runs a real shell. A non-zero exit fails FAST on the first
        error (the reference quits the entrypoint the first time), raising
        a ValueError carrying the reference's message shape — the setting
        name AND the command's own stderr. Returns the list of settings
        that were expanded."""
        if run_command is None:

            def run_command(cmd: str):
                import subprocess

                p = subprocess.run(
                    cmd, shell=True, capture_output=True, text=True
                )
                return p.returncode, p.stdout, p.stderr

        expanded = []
        for fname in self.files:
            for setting, value in self.file(fname).items():
                if not isinstance(value, str):
                    continue
                m = re.fullmatch(r"\$\((?P<cmd>.+)\)", value.strip())
                if not m:
                    continue
                code, out, err = run_command(m.group("cmd"))
                if code != 0:
                    raise ValueError(
                        f"Error evaluating value for setting '{setting}': {err.strip()}"
                    )
                self.file(fname)[setting] = out.strip()
                expanded.append(setting)
        return expanded

    def render(self, file: str = "neo4j.conf") -> str:
        """Config dump (A14): the conf file as ``setting=value`` lines,
        append-only settings emitted once per value — byte-comparable to
        what the entrypoint's file would contain."""
        lines = []
        for setting, value in self.file(file).items():
            if isinstance(value, list):
                lines += [f"{setting}={v}" for v in value]
            else:
                lines.append(f"{setting}={value}")
        return "\n".join(lines)


def migrate_legacy_env(env: dict[str, str]) -> tuple[dict[str, str], list[str]]:
    """Legacy env-var migration (A17): ``NEO4JLABS_PLUGINS`` →
    ``NEO4J_PLUGINS`` (docker-entrypoint.sh:468-472) — old name keeps
    working, a deprecation warning is emitted, an explicit new name wins."""
    out = dict(env)
    warnings = []
    if "NEO4JLABS_PLUGINS" in env:
        warnings.append(
            "NEO4JLABS_PLUGINS has been renamed to NEO4J_PLUGINS since Neo4j 5.0.0.\n"
            "The old name will still work, but is likely to be deprecated in future releases."
        )
        out.setdefault("NEO4J_PLUGINS", env["NEO4JLABS_PLUGINS"])
    return out, warnings


def run_extension_hook(env: dict[str, str], loader, exists=None) -> bool:
    """Extension hook (A16, docker-entrypoint.sh:644): if
    ``EXTENSION_SCRIPT`` points at an existing file, hand it to ``loader``
    (the sourcing mechanism is injected — Python callers pass e.g.
    ``runpy.run_path``). Returns whether the hook ran."""
    import os

    path = env.get("EXTENSION_SCRIPT")
    if not path:
        return False
    exists = exists or os.path.isfile
    if not exists(path):
        return False
    loader(path)
    return True


# ---- semver (docker-image-src/common/semver.jq semantics) ---------------

_VER_RE = re.compile(r"(?P<major>[0-9x*]+)(\.(?P<minor>[0-9x*]+))?(\.?(?P<patch>[0-9x*]+))?")


def _ver_obj(v: str) -> dict | None:
    if v is None or v == "":
        return None
    m = _VER_RE.match(v)
    if not m:
        return None
    return {k: m.group(k) for k in ("major", "minor", "patch")}


def semver_match(spec: str, requested: str) -> bool:
    """True iff version ``spec`` (may contain x/* wildcards) matches the
    concrete ``requested`` version — the semver.jq decision table."""
    if not requested:
        return False
    if spec == requested:
        return True
    s, r = _ver_obj(spec), _ver_obj(requested)
    if s is None or r is None:
        return False
    wild = ("x", "*")
    for part in ("major", "minor", "patch"):
        if s[part] != r[part] and s[part] not in wild:
            return False
        if r[part] is None and s[part] in wild:
            return False
    if r["major"] is None and r["minor"] is None and r["patch"] is None:
        return False
    return True


def _ver_key(v: str) -> tuple:
    obj = _ver_obj(v) or {}

    def num(x):
        return -1 if x in (None, "x", "*") else int(x)

    return (num(obj.get("major")), num(obj.get("minor")), num(obj.get("patch")))


def resolve_plugin_jar(versions_json: list[dict], engine_version: str) -> str | None:
    """load_plugin_from_url:164 — entries whose ``.neo4j`` matches, take
    ``min_by(.neo4j)``, return its jar URL."""
    matching = [e for e in versions_json if semver_match(str(e.get("neo4j", "")), engine_version)]
    if not matching:
        return None
    return min(matching, key=lambda e: _ver_key(str(e["neo4j"])))["jar"]
