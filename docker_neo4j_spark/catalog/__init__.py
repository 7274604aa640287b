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
    # r12 entries are appended as implementations change; reset at round start.
    # r12: _apply_where now defaults to the frame-aware resolver (missing-
    # property → null, never AnalysisException) — re-grade WHERE-heavy rows
    "property_lookup",
    "with_pipeline_having",
    "pattern_semi_join",
    "pattern_anti_join",
    "cypher_hostile_expression",
    "theta_join_inequality",
    "cypher_exists_where_subquery",
    # r12: the CALL dispatcher grew config-map unpacking + the
    # ProcedureError hygiene boundary — re-grade the CALL-routed rows
    "proc_gds_wcc_stream",
    "proc_gds_wcc_write",
    "proc_gds_degree_stream",
    "proc_gds_graph_catalog",
    "proc_apoc_cypher_run",
    "proc_apoc_create_merge",
    "proc_vector_index_query",
    "proc_call_default_values",
    "proc_list_config_yield_where",
    # r12: expression values carry a src_fn tag + the postfix accessor
    # rule landed in the Pratt parser — re-grade expression-heavy rows
    "cypher_expression_projection",
    "cypher_temporal",
    "cypher_duration_values",
    "fn_temporal_accessors",
    "fn_point_suite",
    # r12: MATCH…MERGE dispatch grew the multi-relationship chain branch
    "cypher_match_merge_rel",
    "cypher_merge_grow_pattern",
    # r12 late: SHOW PROCEDURES grew the new GDS surface rows
    "proc_show_procedures",
    # r12 late: the consecutive-MATCH shortestPath branch, bound-FOREACH
    # verb, EXISTS{} RETURN rewrite and case-insensitive function lookup
    # are all ADDITIVE branches (exact-name lookup, standalone FOREACH,
    # and the single-MATCH shortestPath path are untouched) — their
    # pre-existing rows carry no new risk and stay on the staleness
    # rotation so the 6 r4-graded rows fit the window (task 7).
    # r12 late (session 3): the slice compiler grew negative-bound
    # normalization, the trim family grew two-arg/ANSI forms, item
    # aliases accept backticks, the UNION clause splitter skips dotted
    # function names, and plugin scalar fns accept Column args —
    # re-grade the rows running through those code paths
    "fn_list_suite",
    "fn_string_suite",
    "union_distinct",
    "fn_apoc_text_suite",
    "fn_apoc_coll_suite",
    # r12 late (session 3): the union executor grew union-wide trailing
    # ORDER BY/SKIP/LIMIT extraction — re-grade the set-op family
    "union_all_counts",
    "intersect_names",
    "except_nations",
]

# Rows REGISTERED this round: real never-graded rows, but the r6 verdict
# froze catalog growth until the pre-existing backlog clears, so they sort
# BEHIND the older never-graded rows (sub-bucket 1 within tier 1) and only
# enter the 50-row window once the backlog fits. Reset each round (entries
# migrate out once they receive a first verdict).
_NEW_THIS_ROUND: list[str] = [
    # r12 entries are appended as new rows register; reset at round start.
    # r12: canonical GDS config-map call shapes (VERDICT r11 tasks 1-2)
    "proc_gds_wcc_write_map",
    "proc_gds_pagerank_stream_map",
    # r12: string/'*' label handling in gds.graph.project (task 2)
    "proc_gds_project_string",
    # r12: missing-property null semantics in WHERE position (task 3)
    "cypher_missing_prop_null",
    # r12: postfix accessors on call expressions (task 4)
    "cypher_postfix_accessors",
    # r12: multi-relationship MERGE chains (task 6)
    "cypher_merge_chain_pattern",
    # r12: orientation projection maps + dijkstra config-map source
    "proc_gds_undirected_degree",
    "proc_gds_dijkstra_stream",
    # r12: probe-corpus fixes — FOREACH write tails over bindings,
    # duration.between component accessors, bound-endpoint shortestPath
    "cypher_foreach_bound_set",
    "cypher_duration_between",
    "cypher_shortest_path_bound",
    # r12: EXISTS{} in RETURN position + probe-corpus function gaps
    "cypher_exists_return",
    "fn_r12_additions",
    # r12: WITH * passthrough
    "cypher_with_star",
    # r12 late (session 3): probe-found canonical shapes — bracketless
    # arrows, leading-WITH/UNWIND-MATCH pipelines, ON…SET += maps,
    # trims/negative slices, the new APOC registrations, the canonical
    # MATCH…CALL weighted-dijkstra invocation, mixed-item implicit
    # grouping keys
    "cypher_anon_arrows",
    "cypher_leading_with",
    "cypher_unwind_match_pipeline",
    "cypher_merge_on_set_map",
    "cypher_trim_slice_suite",
    "fn_apoc_r12c_suite",
    "proc_gds_dijkstra_weighted",
    "cypher_count_expr_group",
    # r12 late (session 3, batch 4): rel DDL, counter SET, duration
    # arithmetic, entity subscripts, knn over projected properties
    "cypher_rel_ddl",
    "cypher_counter_set",
    "fn_duration_arith",
    "cypher_entity_subscript",
    "proc_gds_knn_stream",
    # r12 late (session 3, batch 5): union-wide trailing ORDER BY
    "cypher_union_orderby",
    # r12 late (session 3, batch 6): the shortest-path CALL family
    "proc_gds_yens_stream",
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
