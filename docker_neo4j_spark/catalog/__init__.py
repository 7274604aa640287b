"""Query catalog — the driver-contract registry.

Every implemented operator from SURVEY.md §2 registers here as a named query
(callable ``(spark, sf_dir) -> DataFrame``) plus, where SQL-expressible, a
DuckDB oracle string over the driver's pre-registered views (region nation
customer supplier part orders lineitem events documents embeddings).
``__spark_entry__.queries()/oracle_sql()`` simply re-export these dicts.

Oracle-exactness conventions (so the driver's row-count + schema +
value-hash gate passes deterministically):
- column names aliased identically on both sides;
- money/quantity sums go through exact DECIMAL aggregation then surface as
  DOUBLE (`CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)`) — double-sum order
  nondeterminism across partitions would otherwise break hash equality;
- averages/stddevs are derived from those exact sums with the same formula
  on both sides (never engine-native AVG/STDDEV over doubles);
- timestamps surface as formatted strings or epoch integers;
- LIMIT queries always carry a total order with a unique tiebreaker.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    """Decorator: add a query (and optional DuckDB oracle) to the catalog."""

    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


_loaded = False


def load_all() -> None:
    """Import every catalog module (idempotent)."""
    global _loaded
    if _loaded:
        return
    # Registration order is driver-sample order (the correctness driver
    # grades a prefix of the registry): riskiest / newest operators first —
    # façade+write, GDS, LLM — then the rows with prior on-record green
    # driver checks (relational + scalar suites, CORRECTNESS_r02.json).
    from . import admin_queries  # noqa: F401
    from . import gds_queries  # noqa: F401
    from . import llm_queries  # noqa: F401
    from . import streaming_queries  # noqa: F401
    from . import relational  # noqa: F401
    from . import scalar_functions  # noqa: F401

    _loaded = True
