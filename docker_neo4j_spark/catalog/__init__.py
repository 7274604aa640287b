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
    # r8 entries are appended as implementations change; reset at round start.
    # r8: GraphQL engine reworked — recursive nesting, escaped to-many
    # serialization (ADVICE r7), multi-root documents — re-grade the row
    # that exercises the to-many path end-to-end
    "graphql_region_rollup",
    # r8: N-Triples validation made lazy (WHERE-clause raise_error guard,
    # one scan per import) + blank-node subjects/objects under a flag
    "rdf_import_triples",
    # r8: rows-only → oracle-paired conversions (first driver grade with
    # an oracle): serving-shape PageRank's early exit replicated in SQL;
    # simhash token hash switched xxhash64 → md5-64 so the signature and
    # the banded near-dup pairs replay exactly in DuckDB
    "gds_pagerank_serving",
    "llm_simhash",
    "llm_simhash_neardup",
    # r8: façade pattern parsing + clause splitting ported from the
    # _NODE_RE/_REL_RE/_split_top regex scanners to the positional token
    # lexer (cypher/lexer.py) — re-grade representative rows that push
    # the ported path hardest (rel patterns + props, var-length bounds,
    # type alternation, comprehension scan, CREATE/SET props)
    "cypher_shortest_path",
    "cypher_var_length",
    "cypher_rel_alternation",
    "cypher_pattern_comprehension",
    "cypher_set_delete_readback",
    # r8: apoc.load.csv/json registered — SHOW PROCEDURES surface (and
    # its oracle's expected list) grew by two rows
    "proc_show_procedures",
    # r8: MinHash re-keyed to the md5-base + affine family (one md5 per
    # shingle; band keys now verbatim signature slices) — the two rows
    # built on it convert from rows-only to oracle-paired
    "llm_minhash_neardup",
    "llm_neardup_clusters",
    # r8: ANN hyperplanes factored to shared literal values and the row
    # converted rows-only → oracle-paired (_ann_topk_sql)
    "llm_ann_topk",
    # late r8: clause-keyword scanning ported to the lexer (find_keyword /
    # split_keyword / _split_pipeline / _trailing_int_kw) — every façade
    # query re-splits through it; re-grade one row per distinct ported
    # path (WITH stages + mid-pipeline ORDER/LIMIT, trailing SKIP/LIMIT,
    # OPTIONAL MATCH split, MERGE ON CREATE/MATCH, COUNT{} guard,
    # standalone UNWIND, CREATE-tail RETURN, path binding, stage-tail
    # MATCH). Also fixed: _create/_merge found RETURN by raw string
    # containment — a literal containing ' RETURN ' truncated the pattern.
    "cypher_with_pipeline",
    "cypher_skip_limit",
    "cypher_optional_chain",
    "write_merge_unwind_batch",
    "cypher_count_subquery",
    "cypher_unwind",
    "write_create_from_match_batch",
    "cypher_path_binding",
    "cypher_multi_match_pipeline",
    # late r8: the Arrow-batched encoder row converted rows-only →
    # oracle-paired (FNV-1a HUGEINT replay, _FNV_SQL)
    "llm_embed_and_search",
    # late r8: db.index.vector.queryNodes grew the created-index IVF probe
    # branch (indexName resolves against CREATE VECTOR INDEX first) —
    # re-grade the legacy label-path row that shares the procedure
    "proc_vector_query_nodes",
    # late r8: attribution_join user_id now coalesces across sides (the
    # full-outer prerequisite; values identical for inner/left) — re-grade
    # both pre-existing rows on the shared path
    "stream_attribution_join_batch",
    "stream_attribution_left_batch",
    # late r8: scrub_pii extended with IPv4 + international-phone patterns
    # (same lookaround-free dialect) — re-grade the row
    "llm_scrub_pii",
    # late r8: _value_of grew postfix subscription (expr[i], expr[a..b],
    # map['k']) and literal-map compilation — re-grade rows that lean on
    # the shared expression compiler
    "cypher_expression_projection",
    "cypher_map_projection",
    "cypher_list_quantifiers",
    # late r8: Index dataclass grew an options field (vector config) and
    # cluster_columns skips VECTOR entries — re-grade the DDL row
    "cypher_index_ddl",
]

# Rows REGISTERED this round: real never-graded rows, but the r6 verdict
# froze catalog growth until the pre-existing backlog clears, so they sort
# BEHIND the older never-graded rows (sub-bucket 1 within tier 1) and only
# enter the 50-row window once the backlog fits. Reset each round (entries
# migrate out once they receive a first verdict).
_NEW_THIS_ROUND: list[str] = [
    # r8 entries are appended as new rows register; reset at round start.
    "graphql_nested_two_levels",
    "rdf_export_roundtrip",
    "graphql_mutation_readback",
    "stream_static_enrich_batch",
    "llm_bigram_lm",
    "proc_apoc_load_csv_json",
    "llm_gopher_rules",
    "llm_ngram_jaccard_pairs",
    "gds_bellman_ford_negative",
    "gds_dag_longest_path",
    "proc_fulltext_query_nodes",
    "fn_apoc_text_fuzzy_suite",
    "llm_deterministic_shuffle",
    "proc_apoc_path_expand",
    "fn_apoc_date_suite",
    "llm_boilerplate_removal",
    "gds_articulation_points",
    "gds_bridges",
    "fn_apoc_agg_stats_suite",
    "fn_apoc_agg_items_suite",
    "gds_steiner_tree",
    "gds_astar_path",
    "gds_triangle_listing",
    "proc_apoc_cypher_run",
    "llm_token_budget_selection",
    "proc_export_graphml_lines",
    "gds_rwr_sample",
    "proc_vector_index_query",
    "events_countmin_frequencies",
    "stream_attribution_full_batch",
    "proc_apoc_refactor_rename",
    "proc_apoc_create_merge",
    "fn_apoc_util_number_suite",
    "gds_ktruss_copart",
    "llm_temperature_resample",
    "events_countmin_windowed",
    "fn_apoc_coll_suite2",
    "gds_apsp_sampled",
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
