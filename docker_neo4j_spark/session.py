"""SparkSession factory tuned for the graph engine.

The reference packages a single-process JVM database whose startup assembles a
declarative configuration before exec'ing the engine
(/root/reference/docker-image-src/calver/coredb/docker-entrypoint.sh:660-681).
Our analog is a SparkSession builder that applies the engine's defaults the
same way the entrypoint applies docker defaults: only when the user has not
already set them (docker-entrypoint.sh:254-265, add_docker_default_to_conf).

Scale posture (100 TB target, tested on local[32]):
- AQE on: runtime coalescing, skew-join splitting, dynamic broadcast.
- shuffle.partitions default kept modest locally; on a real cluster this is
  overridden per deployment (the conf layering in
  docker_neo4j_spark/config.py mirrors the reference's env->conf precedence).
- Arrow enabled so the pandas_udf paths (embeddings, text ops) batch-transfer.

Note: defaults only apply to a *fresh* session — ``getOrCreate`` ignores
builder configs when a SparkSession already exists (same caveat as re-running
the reference entrypoint against a live server).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Docker-default analog: applied only if the caller/user has not set them,
# mirroring add_docker_default_to_conf (docker-entrypoint.sh:254-265).
ENGINE_DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # events.parquet ships TIMESTAMP(NANOS); read as long, truncate in-engine
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.shuffle.partitions": "32",
    # PySpark 4 wraps every DataFrame/Column API call with user-call-site
    # capture for error context: a Python stack walk plus two extra py4j
    # round-trips (PySparkCurrentOrigin.set/clear) per call. That is pure
    # driver overhead in a server context — measured r14 at ~3 ms per
    # wrapped call, ~40% of construction time on the plan-heavy Cypher
    # queries. Costs only the call-site line in error messages; results
    # and plans are identical.
    "spark.python.sql.dataFrameDebugging.enabled": "false",
    # Generated-class cache (static conf, default 100 entries). A server
    # session re-plans structurally identical statements all day; the BSP
    # kernels alone emit ~100+ codegen units per run, so at the default
    # size every multi-statement session evicts and re-compiles (Janino +
    # fresh C2 JIT) the same classes each statement — measured r14 as
    # betweenness reading ~33 s inside a 30-query bench vs 17.7 s solo
    # with pass-2 cache hits. 5000 entries holds a whole session's
    # working set (~tens of MB of bytecode+source); same win on any
    # long-running driver, local or cluster.
    "spark.sql.codegen.cache.maxEntries": "5000",
    # local-mode: the single JVM is driver AND all 32 executor threads.
    # 8g measured BEST here: 32g was tried and its first heavy query paid
    # ~70 s of first-touch page faulting inside the VM (107.8 s vs 33 s
    # pagerank, reproduced twice), never amortized within a bench run. On
    # a real cluster this maps to executor memory sized so a shuffle
    # partition fits comfortably (SURVEY §6).
    "spark.driver.memory": "8g",
    "spark.ui.enabled": "false",
}


def default_master() -> str:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")


def resolve_conf(extra_conf: dict[str, str] | None = None) -> dict[str, str]:
    """The A15 command-synthesis step as a pure function: layer engine
    defaults under caller overrides (default-no-overwrite vs
    explicit-overwrite, the same split the reference entrypoint implements
    for neo4j.conf before exec'ing the engine)."""
    conf = dict(ENGINE_DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    return conf


def get_spark(
    app_name: str = "docker-neo4j-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine session with layered defaults.

    Precedence (lowest to highest): ENGINE_DEFAULT_CONF < extra_conf —
    see ``resolve_conf``.
    """
    builder = SparkSession.builder.appName(app_name).master(master or default_master())
    for k, v in resolve_conf(extra_conf).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
