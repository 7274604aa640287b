"""Procedure registry: ``CALL name(args) YIELD cols WHERE … RETURN …``.

Reference anchors:
- ``CALL dbms.listConfig() YIELD name, value WHERE name='…' RETURN value``
  (/root/reference/src/test/java/com/neo4j/docker/utils/DatabaseIO.java:92)
- ``SHOW PROCEDURES`` used to assert plugin procs exist
  (src/test/java/com/neo4j/docker/coredb/plugins/StubPluginHelper.java:113)
- the stub plugin's ``defaultValues`` procedure with typed default args
  (generate-stub-plugin/ExampleNeo4jPlugin.java:52-59).

A procedure is a callable ``(spark, **args) -> DataFrame``; ``call``
applies YIELD projection and an optional WHERE predicate on the result —
all lazily, so a procedure's output composes with the rest of a query
plan like any DataFrame.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class Procedure:
    name: str
    fn: Callable[..., DataFrame]
    signature: str = ""
    description: str = ""
    defaults: dict = field(default_factory=dict)


_REGISTRY: dict[str, Procedure] = {}


def procedure(name: str, signature: str = "", description: str = "", defaults: dict | None = None):
    """Register a procedure under its Cypher-callable name."""

    def deco(fn):
        _REGISTRY[name] = Procedure(name, fn, signature, description, defaults or {})
        return fn

    return deco


def call(
    spark: SparkSession,
    name: str,
    args: dict | None = None,
    yield_cols: list[str] | None = None,
    where=None,
) -> DataFrame:
    """``CALL name(args) YIELD cols [WHERE pred]``."""
    if name not in _REGISTRY:
        raise KeyError(f"There is no procedure with the name `{name}` registered")
    proc = _REGISTRY[name]
    merged = {**proc.defaults, **(args or {})}
    df = proc.fn(spark, **merged)
    if yield_cols:
        df = df.select(*yield_cols)
    if where is not None:
        df = df.where(where)
    return df


def show_procedures(spark: SparkSession) -> DataFrame:
    """``SHOW PROCEDURES`` — name, signature, description."""
    rows = [
        (p.name, p.signature, p.description)
        for p in sorted(_REGISTRY.values(), key=lambda p: p.name)
    ]
    return spark.createDataFrame(rows, "name string, signature string, description string")


# ---- built-ins ----------------------------------------------------------


@procedure(
    "dbms.listConfig",
    signature="dbms.listConfig() :: (name :: STRING, value :: STRING)",
    description="List the currently active configuration settings",
)
def _dbms_list_config(spark: SparkSession) -> DataFrame:
    """Engine defaults + live session overrides, like the reference's
    effective-config view (defaults overlaid by runtime settings)."""
    from ..session import ENGINE_DEFAULT_CONF

    conf = dict(ENGINE_DEFAULT_CONF)
    for k, v in spark.sparkContext.getConf().getAll():
        conf[k] = v
    rows = sorted((k, str(v)) for k, v in conf.items())
    return spark.createDataFrame(rows, "name string, value string")


@procedure(
    "example.defaultValues",
    signature=(
        "example.defaultValues(string = a string :: STRING, integer = 42 :: INTEGER, "
        "aFloat = 3.14 :: FLOAT, aBoolean = true :: BOOLEAN) :: "
        "(string :: STRING, integer :: INTEGER, aFloat :: FLOAT, aBoolean :: BOOLEAN)"
    ),
    description="A procedure that always returns fixed values (stub plugin parity)",
    defaults={"string": "a string", "integer": 42, "aFloat": 3.14, "aBoolean": True},
)
def _example_default_values(
    spark: SparkSession, string: str, integer: int, aFloat: float, aBoolean: bool
) -> DataFrame:
    """ExampleNeo4jPlugin.defaultValues (ExampleNeo4jPlugin.java:52-59)."""
    return spark.createDataFrame(
        [(string, integer, aFloat, aBoolean)],
        "string string, integer long, aFloat double, aBoolean boolean",
    )


# ---- scalar plugin functions (RETURN apoc.version() — SURVEY §2.B.9) ----

_FUNCTIONS: dict[str, Callable[..., "F.Column"]] = {}


def scalar_function(name: str):
    """Register a scalar function callable in RETURN position
    (TestConfSettings.java:411 — ``RETURN apoc.version()``)."""

    def deco(fn):
        _FUNCTIONS[name] = fn
        return fn

    return deco


def fn(name: str, *args):
    """Resolve a registered scalar function to a Column expression."""
    if name not in _FUNCTIONS:
        raise KeyError(f"Unknown function '{name}'")
    return _FUNCTIONS[name](*args)


@scalar_function("apoc.version")
def _apoc_version():
    from .. import __version__

    return F.lit(__version__)


# ---- security allowlist (dbms.security.procedures.unrestricted) ---------


def allowed_procedures(conf_value: str | None) -> "Callable[[str], bool]":
    """Allowlist predicate from the comma-separated glob config the plugin
    manifests set (calver/coredb/neo4j-plugins.json:5,12,…): ``apoc.*``
    style patterns; None/empty allows built-ins only (dbms./db. names)."""
    import fnmatch

    globs = [g.strip() for g in (conf_value or "").split(",") if g.strip()]

    def allowed(name: str) -> bool:
        if name.startswith(("dbms.", "db.")):
            return True
        return any(fnmatch.fnmatch(name, g) for g in globs)

    return allowed


@procedure(
    "db.labels",
    signature="db.labels() :: (label :: STRING)",
    description="List all labels in the graph",
)
def _db_labels(spark: SparkSession, graph=None) -> DataFrame:
    if graph is None:
        return spark.createDataFrame([], "label string")
    return (
        graph.nodes.select(F.explode("labels").alias("label")).distinct().orderBy("label")
    )
