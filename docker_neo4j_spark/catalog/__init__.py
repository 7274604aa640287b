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
    # r14 entries are appended as implementations change; reset at round start.
    # r14: typed __p_<prop> carrier fields on entity structs + the result
    # boundary strip/variant decode touch every carried-entity read and
    # the path kernel — re-grade the struct-carrying rows
    "cypher_path_binding",
    "cypher_varlen_rel_predicate",
    "cypher_shortest_path_bound",
    # r14: the comparison compiler's string-vs-number ordering now yields
    # null (openCypher incomparable types), IN gained the null-rhs guard,
    # unary minus folds the int64-min literal, lambda scopes carry static
    # types — re-grade the expression-heavy rows
    "cypher_hostile_expression",
    "cypher_operator_semantics",
    "cypher_expression_projection",
    # r14: sum() dispatch gained the zero-rows coalesce + sum/avg DISTINCT
    "cypher_nested_aggregates",
    "cypher_count_expr_group",
    # r14: CREATE…SET tail gained +=/label forms; standalone WITH stages
    # gained ORDER BY/SKIP/LIMIT
    "cypher_create_set_tail",
    "cypher_with_distinct_standalone",
    # r14: range() empty-span guard sits on the range/reduce row
    "fn_range_reduce",
    # r14: duration.between component decomposition truncates toward zero
    # (negative spans were floor-rotated a whole month)
    "cypher_duration_between",
    "fn_duration_arith",
    # r14: all-aggregate CALL{} subqueries rebind LEFT (zero-match outer
    # rows kept with count 0); EXISTS{} gained WHERE-only correlation
    "cypher_unwind_call_subquery",
    "pattern_semi_join",
    "pattern_anti_join",
    # r14: stage_indexed went lazy-checkpoint and interactive-small
    # stores broadcast scan/update joins — every write path is touched;
    # re-grade the write-heavy rows
    "cypher_match_merge_rel",
    "cypher_merge_grow_pattern",
    "cypher_merge_chain_pattern",
    "cypher_bulk_import_id_prop",
    "write_dump_load_counts",
    "cypher_load_csv_statement",
]

# Rows REGISTERED this round: real never-graded rows, but the r6 verdict
# froze catalog growth until the pre-existing backlog clears, so they sort
# BEHIND the older never-graded rows (sub-bucket 1 within tier 1) and only
# enter the 50-row window once the backlog fits. Reset each round (entries
# migrate out once they receive a first verdict).
_NEW_THIS_ROUND: list[str] = [
    # r14 entries are appended as new rows register; reset at round start.
    # NOTE: cypher_foreach_collected_set (registered r13, never graded) is
    # deliberately NOT listed — it sorts in the older never-graded
    # sub-bucket, FIRST in the r14 grade order (VERDICT r13 task 5).
    # r14: typed carried-entity property reads (VERDICT r13 task 1)
    "cypher_typed_rel_list_props",
    "cypher_typed_collect_props",
    # r14: HOF lambda `+` type dispatch (task 2)
    "cypher_reduce_hof_types",
    # r14: null/empty collection semantics sweep (task 3)
    "cypher_sum_empty",
    "fn_null_edge_suite",
    # r14: CREATE…SET += / label forms (ADVICE r13)
    "cypher_create_set_forms",
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
