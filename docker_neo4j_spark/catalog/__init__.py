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

# The correctness driver grades a PREFIX of the registry, so ordering is
# grading policy. Policy (r6, replacing the r5 hand-curated list after the
# advisor flagged it as grade-optimizing): order by RISK, computed from the
# driver's own history files — no back-filling with rows chosen for their
# pass history.
#   1. rows whose implementation changed this round (the one hand-maintained
#      input, reset each round);
#   2. oracle rows the driver has NEVER graded (new or past every window);
#   3. remaining oracle rows, LEAST-recently-graded first — so the stalest
#      verdicts rotate back into the window every round until everything
#      has a recent grade;
#   4. rows-only rows last (no oracle ⇒ the driver can only record an err
#      for them; their behavior is pytest-graded).
# Registration order breaks ties, so the order is deterministic for a given
# set of CORRECTNESS_r*.json files.
_CHANGED_THIS_ROUND: list[str] = [
    # r11 entries are appended as implementations change; reset at round start.
    # r11: localframe — every driver-side row list now plans as a JVM
    # LocalRelation (103 createDataFrame sites rewritten); the write path
    # additionally got broadcast bound-frames + coalesced write batches
    # (_project_bound CartesianProduct fix) and store.merge_rels grew
    # key_props. Re-grade the rows that lean hardest on those paths.
    "write_create_match_return",
    "cypher_session_smoke",
    "write_merge_rel_batch",
    "write_merge_unwind_batch",
    "write_create_from_match_batch",
    "write_dump_load_counts",
    "cypher_set_delete_readback",
    "cypher_set_expression_readback",
    "cypher_label_set_readback",
    "cypher_expr_props_readback",
    "bolt_roundtrip",
    "proc_apoc_create_merge",
    "graphql_mutation_readback",
    # r11: entity properties are VARIANT-typed (was stringified map) —
    # re-grade the entity-serialization rows
    "cypher_return_entity",
    "cypher_collect_entities",
    "cypher_optional_match",
    "fn_properties_map",
    # r11: nodes(p)/relationships(p) yield entity structs; duration()
    # interval types changed; point grew the map form + withinBBox
    "cypher_path_binding",
    "cypher_shortest_path",
    "cypher_temporal",
    "fn_point_suite",
    "fn_temporal_arith",
    # r11: biconnected root-offset sweep moved onto global_prefix_sum
    "gds_articulation_points",
    "gds_bridges",
    # r11 late: _match dispatch grew consecutive-MATCH splitting and the
    # standalone-UNWIND write dispatch — re-grade the pipeline-heavy rows
    "cypher_multi_match_pipeline",
    "cypher_with_pipeline",
    "cypher_unwind",
    "cypher_call_subquery_correlated",
]

# Rows REGISTERED this round: real never-graded rows, but the r6 verdict
# froze catalog growth until the pre-existing backlog clears, so they sort
# BEHIND the older never-graded rows (sub-bucket 1 within tier 1) and only
# enter the 50-row window once the backlog fits. Reset each round (entries
# migrate out once they receive a first verdict).
_NEW_THIS_ROUND: list[str] = [
    # r11 entries are appended as new rows register; reset at round start.
    # r11: MATCH … MERGE write tail (rel get-or-create, ON CREATE/ON
    # MATCH branches, idempotence)
    "cypher_match_merge_rel",
    # r11: entity paths (RETURN p alternating node/rel entities,
    # nodes(p)/relationships(p) structs, comprehension access)
    "cypher_path_entities",
    # r11: durations collect as client values (dt interval / ISO ym text)
    "cypher_duration_values",
    # r11: write-then-continue pipelines (SET … WITH … RETURN)
    "cypher_set_with_continue",
    # r11: FOREACH over expression lists (range(…) etc.)
    "cypher_foreach_range_readback",
    # r11: unbound-endpoint relationship MERGE (whole-pattern grow)
    "cypher_merge_grow_pattern",
    # r11: GDS CALL execution surface (project → stream) + general
    # YIELD-WHERE expressions
    "proc_gds_wcc_stream",
    "proc_gds_degree_stream",
    "proc_gds_wcc_write",
    # r11 late: consecutive MATCH, standalone-UNWIND write tails,
    # expression-only CALL subqueries
    "cypher_consecutive_match",
    "cypher_unwind_write_tail",
    "cypher_expr_call_subquery",
]


def _last_graded_round() -> dict[str, int]:
    """name -> latest round whose CORRECTNESS_r*.json contains the row."""
    import json
    import re as _re
    from pathlib import Path

    root = Path(__file__).resolve().parents[2]
    last: dict[str, int] = {}
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        m = _re.search(r"_r(\d+)", f.name)
        if not m:
            continue
        try:
            graded = json.loads(f.read_text())
        except (OSError, ValueError):
            continue
        for name in graded:
            last[name] = max(last.get(name, 0), int(m.group(1)))
    return last


def load_all() -> None:
    """Import every catalog module, then apply the risk-order policy."""
    global _loaded
    if _loaded:
        return
    from . import admin_queries  # noqa: F401
    from . import gds_queries  # noqa: F401
    from . import llm_queries  # noqa: F401
    from . import streaming_queries  # noqa: F401
    from . import relational  # noqa: F401
    from . import scalar_functions  # noqa: F401

    last = _last_graded_round()
    reg = {n: i for i, n in enumerate(QUERIES)}
    changed = {n: i for i, n in enumerate(_CHANGED_THIS_ROUND)}
    new = set(_NEW_THIS_ROUND)

    def risk_key(name: str):
        if name not in ORACLES:
            return (3, 0, reg[name])          # rows-only: driver errs on these
        if name in changed:
            return (0, changed[name], 0)      # changed this round
        if name not in last:
            # never driver-graded: pre-existing backlog before rows first
            # registered this round (growth must not displace the backlog)
            return (1, 1 if name in new else 0, reg[name])
        return (2, last[name], reg[name])     # stalest verdict first

    ordered = sorted(QUERIES, key=risk_key)
    for d in (QUERIES, ORACLES):
        snap = dict(d)
        d.clear()
        d.update({n: snap[n] for n in ordered if n in snap})

    _loaded = True
