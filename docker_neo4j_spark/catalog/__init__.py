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
    # r13 entries are appended as implementations change; reset at round start.
    # r13: the expression compiler's multiplicative operator grew Cypher
    # division/modulo-by-zero semantics (float→Infinity/NaN, integral→
    # "/ by zero", try_divide/try_mod) — re-grade the expression-heavy rows
    "cypher_hostile_expression",
    "cypher_operator_semantics",
    "cypher_expression_projection",
    # r13: SHOW FUNCTIONS gained the doc-name alias registrations (its
    # oracle enumerates apoc.text.* membership); SHOW PROCEDURES gained
    # apoc.coll.zipToRows
    "proc_show_functions",
    "proc_show_procedures",
    # r13 wave 3: the reserved-property escape touches EVERY write path
    # (store entry points, session write tails, pattern prop filters,
    # resolvers, keys()/properties()/entity structs) — re-grade the
    # write-heavy and scan rows
    "property_lookup",
    "cypher_set_expression_readback",
    "cypher_label_set_readback",
    "write_dump_load_counts",
    "cypher_match_merge_rel",
    "cypher_merge_grow_pattern",
    "cypher_load_csv_statement",
    "proc_apoc_create_merge",
]

# Rows REGISTERED this round: real never-graded rows, but the r6 verdict
# froze catalog growth until the pre-existing backlog clears, so they sort
# BEHIND the older never-graded rows (sub-bucket 1 within tier 1) and only
# enter the 50-row window once the backlog fits. Reset each round (entries
# migrate out once they receive a first verdict).
_NEW_THIS_ROUND: list[str] = [
    # r13 entries are appended as new rows register; reset at round start.
    # r13: correlated UNWIND over computed expressions (VERDICT r12 task 1)
    "cypher_correlated_unwind",
    # r13: Cypher division/modulo-by-zero semantics (task 2)
    "cypher_divzero_semantics",
    # r13: statement-opening WITH DISTINCT (task 3)
    "cypher_with_distinct_standalone",
    # r13: APOC doc-name alias sweep (task 6)
    "fn_apoc_r13_suite",
    # r13 novel-probe finds: MERGE counter idiom, toInteger coercion,
    # COUNT{} WHERE, UNWIND…CALL{}
    "cypher_merge_counter",
    "fn_to_integer_forms",
    "cypher_count_where_subquery",
    "cypher_unwind_call_subquery",
    # r13 novel-probe wave 2: stored temporal accessors, var-length rel
    # list predicates, null propagation
    "cypher_stored_temporal_accessor",
    "cypher_varlen_rel_predicate",
    "fn_null_propagation",
    # r13 wave 3: reserved property names (the {id: row.id} bulk-import
    # idiom), CREATE…SET tails, FOREACH over collected entities
    "cypher_bulk_import_id_prop",
    "cypher_create_set_tail",
    "cypher_foreach_collected_set",
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
