"""Admin / DDL / lifecycle surface (SURVEY.md §2.B.12, §2.A).

Mirrors the container's admin semantics as engine API:

- ``NEO4J_AUTH`` parsing + initial-password bootstrap
  (docker-entrypoint.sh:299-360: ``none`` disables auth; ``user/pass[/true]``
  validates user==neo4j, pass!='neo4j', min length 8 — overridable via
  ``dbms.security.auth_minimum_password_length`` — and /true requires a
  password change on first login)
- license gate (docker-entrypoint.sh:430-455: enterprise requires
  ``NEO4J_ACCEPT_LICENSE_AGREEMENT`` in {yes, eval})
- password ops: ``ALTER CURRENT USER SET PASSWORD FROM … TO …`` and the
  legacy ``dbms.changePassword`` (DatabaseIO.java:114,117)
- ``STOP DATABASE x`` / ``START DATABASE x`` with queries refused while
  stopped (TestBackupRestore.java:146,163)
- online backup / restore as store snapshots
  (TestBackupRestore.java:117-124,153-159)
- ``neo4j-admin server report`` — diagnostics bundle (neo4j-admin-report.sh)

State is a driver-side control plane (users, db status); the data plane
stays DataFrames. At scale this is exactly how it should split — admin
metadata is tiny and strongly consistent, data is distributed.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field

DEFAULT_MIN_PASSWORD_LENGTH = 8
_AUTH_RE = re.compile(r"^([^/]+)/([^/]+)/?([tT][rR][uU][eE])?$")


class AdminError(Exception):
    """Invalid admin operation — message text mirrors the entrypoint."""


@dataclass
class AuthSpec:
    enabled: bool
    user: str | None = None
    password: str | None = None
    require_password_change: bool = False


def parse_auth(auth: str | None, conf: dict | None = None) -> AuthSpec:
    """Parse ``NEO4J_AUTH`` exactly like set_initial_password."""
    if auth is None or auth == "":
        return AuthSpec(enabled=True)
    if auth == "none":
        return AuthSpec(enabled=False)
    m = _AUTH_RE.match(auth)
    if not m:
        raise AdminError(f"Invalid value for NEO4J_AUTH: '{auth}'")
    user, password, do_reset = m.group(1), m.group(2), m.group(3)
    if password == "neo4j":
        raise AdminError("Invalid value for password. It cannot be 'neo4j', which is the default.")
    if user != "neo4j":
        raise AdminError("Invalid admin username, it must be neo4j.")
    min_len = int((conf or {}).get("dbms.security.auth_minimum_password_length", DEFAULT_MIN_PASSWORD_LENGTH))
    if len(password) < min_len:
        raise AdminError(
            f"Invalid value for password. The minimum password length is {min_len} characters."
        )
    return AuthSpec(
        enabled=True, user=user, password=password, require_password_change=bool(do_reset)
    )


def license_gate(edition: str, env: dict[str, str]) -> None:
    """Enterprise requires explicit license acceptance (yes|eval)."""
    if edition != "enterprise":
        return
    accept = env.get("NEO4J_ACCEPT_LICENSE_AGREEMENT", "not accepted")
    if accept not in ("yes", "eval"):
        raise AdminError(
            "In order to use Neo4j Enterprise Edition you must accept the license agreement."
        )


def _hash(password: str) -> str:
    return hashlib.sha256(password.encode()).hexdigest()


@dataclass
class Dbms:
    """The control plane: users, database lifecycle, backup/restore."""

    auth_enabled: bool = True
    users: dict[str, str] = field(default_factory=dict)  # user → password hash
    must_change: set[str] = field(default_factory=set)
    databases: dict[str, str] = field(default_factory=lambda: {"neo4j": "online", "system": "online"})
    snapshots: dict[str, object] = field(default_factory=dict)
    stores: dict[str, object] = field(default_factory=dict)  # db → GraphStore
    _initialized: bool = False

    # ---- bootstrap (neo4j-admin dbms set-initial-password) -----------
    @classmethod
    def bootstrap(cls, auth: str | None, conf: dict | None = None, edition: str = "community", env: dict | None = None) -> "Dbms":
        license_gate(edition, env or {})
        spec = parse_auth(auth, conf)
        dbms = cls(auth_enabled=spec.enabled)
        if spec.enabled and spec.user:
            dbms.set_initial_password(spec.password, require_change=spec.require_password_change)
        return dbms

    def set_initial_password(self, password: str, require_change: bool = False) -> None:
        if self._initialized:
            raise AdminError("Initial password has already been set.")
        self.users["neo4j"] = _hash(password)
        if require_change:
            self.must_change.add("neo4j")
        self._initialized = True

    # ---- auth (DatabaseIO.java:150-156; auth none → any creds pass) ---
    def authenticate(self, user: str, password: str) -> None:
        if not self.auth_enabled:
            return
        if self.users.get(user) != _hash(password):
            raise AdminError("The client is unauthorized due to authentication failure.")
        if user in self.must_change:
            raise AdminError("Permission denied. The credentials you provided were valid, but must be changed before you can use this instance.")

    # ---- password ops (DatabaseIO.java:114,117) -----------------------
    def alter_current_user_password(self, user: str, old: str, new: str) -> None:
        """``ALTER CURRENT USER SET PASSWORD FROM $old TO $new``."""
        if self.auth_enabled and self.users.get(user) != _hash(old):
            raise AdminError("Invalid principal or credentials.")
        if new == old:
            raise AdminError("Old password and new password cannot be the same.")
        self.users[user] = _hash(new)
        self.must_change.discard(user)

    def change_password(self, user: str, old: str, new: str) -> None:
        """Legacy ``CALL dbms.changePassword`` — same effect."""
        self.alter_current_user_password(user, old, new)

    # ---- database lifecycle (TestBackupRestore.java:146,163) ----------
    def create_database(self, name: str, if_not_exists: bool = False) -> None:
        """``CREATE DATABASE name [IF NOT EXISTS]`` (r10 — the last admin
        verb on the multi-database surface; the reference drives named
        databases through SessionConfig.forDatabase,
        DatabaseIO.java:137). New databases come up online with an empty
        store (allocated lazily by :meth:`store_for`)."""
        if name in self.databases:
            if if_not_exists:
                return
            raise AdminError(f"Database '{name}' already exists.")
        import re as _re

        if not _re.fullmatch(r"[A-Za-z][A-Za-z0-9.-]*", name):
            raise AdminError(f"Invalid database name '{name}'.")
        self.databases[name] = "online"

    def drop_database(self, name: str, if_exists: bool = False) -> None:
        """``DROP DATABASE name [IF EXISTS]`` — removes the database, its
        store, and any snapshot; the system database is undroppable."""
        if name == "system":
            raise AdminError("Not allowed to drop the system database.")
        if name not in self.databases:
            if if_exists:
                return
            raise AdminError(f"Database '{name}' does not exist.")
        del self.databases[name]
        self.snapshots.pop(name, None)
        self.stores.pop(name, None)

    def store_for(self, name: str, spark):
        """The per-database graph store (lazy; shared by every session
        bound to the same database — read-your-writes across sessions)."""
        self._require_db(name)
        if name not in self.stores:
            from .storage.store import GraphStore

            self.stores[name] = GraphStore(spark)
        return self.stores[name]

    def stop_database(self, name: str) -> None:
        self._require_db(name)
        self.databases[name] = "offline"

    def start_database(self, name: str) -> None:
        self._require_db(name)
        self.databases[name] = "online"

    def check_queryable(self, name: str = "neo4j") -> None:
        self._require_db(name)
        if self.databases[name] != "online":
            raise AdminError(f"Database '{name}' is unavailable.")

    def _require_db(self, name: str) -> None:
        if name not in self.databases:
            raise AdminError(f"Database '{name}' does not exist.")

    def show_databases(self) -> list[tuple[str, str]]:
        return sorted(self.databases.items())

    # ---- backup / restore (TestBackupRestore.java:117-159) ------------
    def backup(self, name: str, graph) -> None:
        """Online snapshot: the store stays queryable (frames are immutable,
        so the snapshot is just a reference — O(1), consistent).

        Passing a mutable ``GraphStore`` captures its *current* immutable
        PropertyGraph, not the store itself — writes that land after the
        backup swap in new frames and must not leak into the snapshot
        (reference takes online backups against a live, written-to db:
        TestBackupRestore.java:117-159)."""
        self.check_queryable(name)
        self.snapshots[name] = getattr(graph, "graph", graph)

    def restore(self, name: str):
        """Restore requires the database stopped, like the reference."""
        self._require_db(name)
        if self.databases[name] == "online":
            raise AdminError(f"Database '{name}' must be stopped before restore.")
        if name not in self.snapshots:
            raise AdminError(f"No backup found for database '{name}'.")
        return self.snapshots[name]

    # ---- neo4j-admin server report (A22) ------------------------------
    def server_report(self, spark=None) -> dict:
        report: dict[str, object] = {
            "databases": dict(self.databases),
            "auth_enabled": self.auth_enabled,
            "users": sorted(self.users),
        }
        if spark is not None:
            report["spark_version"] = spark.version
            report["conf"] = dict(spark.sparkContext.getConf().getAll())
        return report
