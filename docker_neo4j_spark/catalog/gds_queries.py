"""GDS algorithm queries (SURVEY.md §2.B.10), oracle-checked where exact.

The TPC-H graph's node ids are arithmetic (LABEL_BASE + key), so the DuckDB
oracle reconstructs the edge list straight from the relational tables and
grades BFS/SSSP/WCC with recursive CTEs. The float-iterative algorithms
(PageRank, LPA) are rows-only here and property-tested in pytest on known
graphs.

The projected graph is a DAG (Customer→{Order,Nation}, Order→Part,
Part→Supplier, Supplier→Nation, Nation→Region), so recursive CTEs with a
hop cap terminate and min-dist == BFS depth.
"""

from __future__ import annotations
from ..localframe import local_df

from pyspark.sql import functions as F

from ..operators import gds
from ..sources.tpch import build_graph, load_tables
from . import register

# DuckDB edge-list twin of sources/tpch.build_graph (unit weights for FK
# edges, l_quantity for lineitem-derived edges).
_EDGES = """
  SELECT CAST(2000000000000 + n_nationkey AS BIGINT) AS src,
         CAST(1000000000000 + n_regionkey AS BIGINT) AS dst, CAST(1 AS BIGINT) AS w FROM nation
  UNION ALL SELECT CAST(3000000000000 + c_custkey AS BIGINT),
         CAST(2000000000000 + c_nationkey AS BIGINT), 1 FROM customer
  UNION ALL SELECT CAST(4000000000000 + s_suppkey AS BIGINT),
         CAST(2000000000000 + s_nationkey AS BIGINT), 1 FROM supplier
  UNION ALL SELECT CAST(3000000000000 + o_custkey AS BIGINT),
         CAST(6000000000000 + o_orderkey AS BIGINT), 1 FROM orders
  UNION ALL SELECT CAST(6000000000000 + l_orderkey AS BIGINT),
         CAST(5000000000000 + l_partkey AS BIGINT), CAST(l_quantity AS BIGINT) FROM lineitem
  UNION ALL SELECT CAST(5000000000000 + l_partkey AS BIGINT),
         CAST(4000000000000 + l_suppkey AS BIGINT), CAST(l_quantity AS BIGINT) FROM lineitem
"""


def _seed(g):
    """Lowest-id Customer node as a 1-row DataFrame (no driver collect)."""
    return g.label_frames["Customer"].orderBy("id").limit(1).select("id")


# DuckDB twin of build_graph's node set (all six labels).
_NODES = """
  SELECT CAST(1000000000000 + r_regionkey AS BIGINT) AS id FROM region
  UNION ALL SELECT CAST(2000000000000 + n_nationkey AS BIGINT) FROM nation
  UNION ALL SELECT CAST(3000000000000 + c_custkey AS BIGINT) FROM customer
  UNION ALL SELECT CAST(4000000000000 + s_suppkey AS BIGINT) FROM supplier
  UNION ALL SELECT CAST(5000000000000 + p_partkey AS BIGINT) FROM part
  UNION ALL SELECT CAST(6000000000000 + o_orderkey AS BIGINT) FROM orders
"""


def _pagerank_sql(iterations: int, weighted: bool, out_scale: str) -> str:
    """Unrolled power-iteration PageRank as chained DuckDB CTEs.

    Mirrors ``operators/gds.pagerank`` operation-for-operation (same edge
    multiset, same `(1-d) + d*dangling/N` base computed before the update,
    same `base + d*Σ(pr·w/Σw)` per node, sink-only nodes get exactly the
    base) with every literal written as a float8 (`0.85e0`) so DuckDB's
    IEEE arithmetic matches Spark's. Iterations are UNROLLED rather than
    WITH RECURSIVE because the recursive term would need two references to
    the working table (contribution join + dangling scalar). Both sides
    surface `CAST(ROUND(pr * scale) AS BIGINT)` — the last-ulp float noise
    from cross-engine summation order is orders of magnitude below the
    rounding granularity, and an integer column is canonicalizer-proof.
    """
    w_expr = "CAST(w AS DOUBLE)" if weighted else "1.0e0"
    parts = [
        f"WITH e AS MATERIALIZED ({_EDGES}),",
        f"nodes AS MATERIALIZED ({_NODES}),",
        f"ew AS MATERIALIZED (SELECT src, dst, {w_expr} AS w FROM e),",
        "ed AS MATERIALIZED (SELECT src, dst, w / SUM(w) OVER (PARTITION BY src) AS invdeg FROM ew),",
        "dang AS MATERIALIZED (SELECT id FROM nodes WHERE id NOT IN (SELECT src FROM ew)),",
        "no_in AS MATERIALIZED (SELECT id FROM nodes WHERE id NOT IN (SELECT dst FROM ew)),",
        "nt AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),",
        "pr0 AS MATERIALIZED (SELECT id, 1.0e0 AS pr FROM nodes),",
    ]
    for k in range(1, iterations + 1):
        p = f"pr{k - 1}"
        parts.append(
            f"b{k} AS (SELECT (1.0e0 - 0.85e0) + 0.85e0 * "
            f"COALESCE((SELECT SUM(p.pr) FROM {p} p JOIN dang USING (id)), 0e0) "
            f"/ (SELECT n FROM nt) AS b),"
        )
        parts.append(
            f"pr{k} AS MATERIALIZED ("
            f"SELECT c.id, (SELECT b FROM b{k}) + 0.85e0 * c.c AS pr FROM "
            f"(SELECT ed.dst AS id, SUM(p.pr * ed.invdeg) AS c "
            f"FROM {p} p JOIN ed ON ed.src = p.id GROUP BY ed.dst) c "
            f"UNION ALL SELECT id, (SELECT b FROM b{k}) FROM no_in),"
        )
    last = parts.pop().rstrip(",")
    parts.append(last)
    parts.append(
        f"SELECT id, CAST(ROUND(pr * {out_scale}) AS BIGINT) AS pr_scaled "
        f"FROM pr{iterations}"
    )
    return "\n".join(parts)


def _pagerank_serving_sql(max_iter: int, tol: str, out_scale: str) -> str:
    """Unrolled SERVING-shape PageRank (maxIterations + tolerance early
    exit) as chained DuckDB CTEs — twin of ``operators/gds.pagerank``
    with ``tolerance`` set. The early exit is replicated, not approximated:
    after unrolling all ``max_iter`` rounds, per-round deltas
    ``d_k = Σ|pr_k − pr_{k-1}|`` feed a stop-round pick
    ``k* = min k s.t. d_k < tol·N`` (else ``max_iter``) — the same
    comparison the operator makes after each round — and the output is
    round ``k*``'s frame. Deltas shrink geometrically (×damping), so the
    threshold crossing sits orders of magnitude above cross-engine
    last-ulp summation noise; the comparison agrees on both sides."""
    base = _pagerank_sql(max_iter, weighted=False, out_scale=out_scale)
    # reuse the unrolled chain; replace the final SELECT with the
    # delta/stop/pick tail
    chain = base[: base.rindex("SELECT id, CAST(ROUND")]
    parts = [chain.rstrip().rstrip(",") + ","]
    for k in range(1, max_iter + 1):
        parts.append(
            f"d{k} AS (SELECT SUM(ABS(a.pr - b.pr)) AS d "
            f"FROM pr{k} a JOIN pr{k - 1} b USING (id)),"
        )
    deltas = " UNION ALL ".join(
        f"SELECT {k} AS k, (SELECT d FROM d{k}) AS d" for k in range(1, max_iter + 1)
    )
    parts.append(
        f"stop AS (SELECT COALESCE(MIN(k), {max_iter}) AS k FROM ({deltas}) "
        f"WHERE d < {tol} * (SELECT n FROM nt)),"
    )
    allpr = " UNION ALL ".join(
        f"SELECT {k} AS k, id, pr FROM pr{k}" for k in range(1, max_iter + 1)
    )
    parts.append(f"allpr AS ({allpr})")
    parts.append(
        f"SELECT id, CAST(ROUND(pr * {out_scale}) AS BIGINT) AS pr_scaled "
        f"FROM allpr WHERE k = (SELECT k FROM stop)"
    )
    return "\n".join(parts)


def _ppr_sql(iterations: int, out_scale: str) -> str:
    """Unrolled personalized PageRank (single lowest-customer seed) as
    chained DuckDB CTEs — twin of ``operators/gds.personalized_pagerank``:
    teleport and dangling mass return to the seed, support set = seed ∪
    reached, `pr = Σ(d·contrib) + scale·t` via a 2-element commutative
    (order-proof) group-sum."""
    parts = [
        f"WITH e AS MATERIALIZED ({_EDGES}),",
        f"nodes AS MATERIALIZED ({_NODES}),",
        "ed AS MATERIALIZED (SELECT src, dst, 1.0e0 / (COUNT(*) OVER (PARTITION BY src)) AS invdeg FROM e),",
        "dang AS MATERIALIZED (SELECT id FROM nodes WHERE id NOT IN (SELECT src FROM e)),",
        "seed AS MATERIALIZED (SELECT CAST(3000000000000 + MIN(c_custkey) AS BIGINT) AS id FROM customer),",
        "pr0 AS MATERIALIZED (SELECT id, 1.0e0 AS pr FROM seed),",
    ]
    for k in range(1, iterations + 1):
        p = f"pr{k - 1}"
        parts.append(
            f"s{k} AS (SELECT (1.0e0 - 0.85e0) + 0.85e0 * "
            f"COALESCE((SELECT SUM(p.pr) FROM {p} p JOIN dang USING (id)), 0e0) AS b),"
        )
        parts.append(
            f"pr{k} AS MATERIALIZED (SELECT id, SUM(pr) AS pr FROM ("
            f"SELECT ed.dst AS id, 0.85e0 * SUM(p.pr * ed.invdeg) AS pr "
            f"FROM {p} p JOIN ed ON ed.src = p.id GROUP BY ed.dst "
            f"UNION ALL SELECT id, (SELECT b FROM s{k}) * 1.0e0 FROM seed"
            f") GROUP BY id),"
        )
    last = parts.pop().rstrip(",")
    parts.append(last)
    parts.append(
        f"SELECT id, CAST(ROUND(pr * {out_scale}) AS BIGINT) AS pr_scaled "
        f"FROM pr{iterations}"
    )
    return "\n".join(parts)


def _article_rank_sql(iterations: int, out_scale: str) -> str:
    """Unrolled ArticleRank as chained DuckDB CTEs — twin of
    ``operators/gds.article_rank``: share = 1/(outDeg + |E|/|N|), base =
    (1-d), no dangling redistribution; sink-only nodes surface as the
    bare base via the UNION ALL branch (mirroring the Spark side's
    zero-share self-rows). Same float-exactness conventions as
    ``_pagerank_sql`` (all literals float8, integer-scaled output)."""
    parts = [
        f"WITH e AS MATERIALIZED (SELECT src, dst FROM ({_EDGES})),",
        f"nodes AS MATERIALIZED ({_NODES}),",
        "deg AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM e GROUP BY src),",
        "avgd AS MATERIALIZED (SELECT CAST((SELECT COUNT(*) FROM e) AS DOUBLE)"
        " / (SELECT COUNT(*) FROM nodes) AS a),",
        "ed AS MATERIALIZED (SELECT e.src, e.dst, 1.0e0 /"
        " (CAST(deg.d AS DOUBLE) + (SELECT a FROM avgd)) AS share"
        " FROM e JOIN deg ON deg.src = e.src),",
        "no_in AS MATERIALIZED (SELECT id FROM nodes WHERE id NOT IN (SELECT dst FROM e)),",
        "pr0 AS MATERIALIZED (SELECT id, 1.0e0 AS pr FROM nodes),",
    ]
    for k in range(1, iterations + 1):
        p = f"pr{k - 1}"
        parts.append(
            f"pr{k} AS MATERIALIZED ("
            f"SELECT c.id, (1.0e0 - 0.85e0) + 0.85e0 * c.c AS pr FROM "
            f"(SELECT ed.dst AS id, SUM(p.pr * ed.share) AS c "
            f"FROM {p} p JOIN ed ON ed.src = p.id GROUP BY ed.dst) c "
            f"UNION ALL SELECT id, (1.0e0 - 0.85e0) FROM no_in),"
        )
    last = parts.pop().rstrip(",")
    parts.append(last)
    parts.append(
        f"SELECT id, CAST(ROUND(pr * {out_scale}) AS BIGINT) AS pr_scaled "
        f"FROM pr{iterations}"
    )
    return "\n".join(parts)


def _eigenvector_sql(iterations: int, out_scale: str) -> str:
    """Unrolled L2-normalized power iteration (eigenvector centrality) as
    chained DuckDB CTEs — twin of ``operators/gds.eigenvector`` over the
    UNDIRECTED projection (the directed TPC-H graph is a DAG, whose
    eigenvector limit is the zero vector; the symmetric orientation is
    the GDS default use-case and the odd C-O-P-S-N-C cycle makes the
    iteration aperiodic/convergent): x ← Ax/‖Ax‖₂ from x₀ = 1; nodes
    never receiving mass surface as exactly 0 via the final LEFT JOIN
    (the Spark side's COALESCE)."""
    parts = [
        "WITH e0 AS MATERIALIZED (SELECT src, dst FROM "
        f"({_EDGES})),",
        "e AS MATERIALIZED (SELECT src, dst FROM e0 "
        "UNION ALL SELECT dst AS src, src AS dst FROM e0),",
        f"nodes AS MATERIALIZED ({_NODES}),",
        "x0 AS MATERIALIZED (SELECT id, 1.0e0 AS score FROM nodes),",
    ]
    for k in range(1, iterations + 1):
        p = f"x{k - 1}"
        parts.append(
            f"y{k} AS MATERIALIZED (SELECT e.dst AS id, SUM(p.score) AS s "
            f"FROM {p} p JOIN e ON e.src = p.id GROUP BY e.dst),"
        )
        parts.append(f"n{k} AS (SELECT SQRT(SUM(s * s)) AS nrm FROM y{k}),")
        parts.append(
            f"x{k} AS MATERIALIZED (SELECT id, s / (SELECT nrm FROM n{k}) "
            f"AS score FROM y{k}),"
        )
    last = parts.pop().rstrip(",")
    parts.append(last)
    parts.append(
        f"SELECT n.id, CAST(ROUND(COALESCE(x.score, 0e0) * {out_scale}) AS BIGINT)"
        f" AS score_scaled FROM nodes n LEFT JOIN x{iterations} x ON x.id = n.id"
    )
    return "\n".join(parts)


def _betweenness_sql(depth: int, out_scale: str) -> str:
    """Unrolled Brandes betweenness (supplier-sourced, part↔supplier
    co-supply bipartite graph) as chained DuckDB CTEs — twin of
    ``operators/gds.betweenness``.

    Forward: per level, frontier ⋈ edges with a visited anti-join and a
    grouped σ sum (BIGINT — integer-exact path counts). Backward: per
    level, δ(s,v) = Σ σ(s,v)/σ(s,w)·(1+δ(s,w)) over successors one level
    deeper. Score = Σ_s δ at depth ≥ 1 (endpoints excluded, raw sums).
    Output scaled at 1e4 — δ chains sum ~10⁵ doubles, so the coarser
    granularity keeps cross-engine summation-order noise far below the
    rounding step (pagerank's 1e6 margin doesn't apply to values this
    large)."""
    parts = [
        "WITH ps AS MATERIALIZED (SELECT DISTINCT"
        " CAST(5000000000000 + l_partkey AS BIGINT) AS p,"
        " CAST(4000000000000 + l_suppkey AS BIGINT) AS sp FROM lineitem),",
        "e AS MATERIALIZED (SELECT p AS src, sp AS dst FROM ps"
        " UNION ALL SELECT sp, p FROM ps),",
        "bnodes AS MATERIALIZED (SELECT DISTINCT p AS id FROM ps"
        " UNION SELECT DISTINCT sp FROM ps),",
        # samplingSize=200 (deterministic lowest-id sample): exact at
        # sf0.01 (only 100 suppliers exist), bounds the |sources|×|reached|
        # forward state at larger SFs — the documented gds betweenness
        # sampling contract
        "bsrc AS MATERIALIZED (SELECT DISTINCT sp AS id FROM ps ORDER BY id LIMIT 200),",
        "f0 AS MATERIALIZED (SELECT id AS s, id AS v, CAST(1 AS BIGINT) AS sigma FROM bsrc),",
        "vis0 AS MATERIALIZED (SELECT s, v FROM f0),",
    ]
    for d in range(1, depth + 1):
        parts.append(
            f"f{d} AS MATERIALIZED (SELECT p.s, e.dst AS v, SUM(p.sigma) AS sigma "
            f"FROM f{d - 1} p JOIN e ON e.src = p.v "
            f"LEFT JOIN vis{d - 1} x ON x.s = p.s AND x.v = e.dst "
            f"WHERE x.s IS NULL GROUP BY p.s, e.dst),"
        )
        parts.append(
            f"vis{d} AS MATERIALIZED (SELECT s, v FROM vis{d - 1}"
            f" UNION ALL SELECT s, v FROM f{d}),"
        )
    parts.append(
        f"b{depth} AS MATERIALIZED (SELECT s, v, sigma, 0e0 AS delta FROM f{depth}),"
    )
    for d in range(depth - 1, -1, -1):
        parts.append(
            f"b{d} AS MATERIALIZED (SELECT f.s, f.v, f.sigma, "
            f"COALESCE(SUM(CAST(f.sigma AS DOUBLE) / w.sigma * (1e0 + w.delta)), 0e0) AS delta "
            f"FROM f{d} f LEFT JOIN e ON e.src = f.v "
            f"LEFT JOIN b{d + 1} w ON w.s = f.s AND w.v = e.dst "
            f"GROUP BY f.s, f.v, f.sigma),"
        )
    union = " UNION ALL ".join(
        f"SELECT v, delta FROM b{d}" for d in range(1, depth + 1)
    )
    parts.append(f"sc AS (SELECT v, SUM(delta) AS bc FROM ({union}) GROUP BY v)")
    parts.append(
        f"SELECT n.id, CAST(ROUND(COALESCE(sc.bc, 0e0) * {out_scale}) AS BIGINT)"
        f" AS bc_scaled FROM bnodes n LEFT JOIN sc ON sc.v = n.id"
    )
    return "\n".join(parts)


def _random_walk_sql(steps: int, salt: str) -> str:
    """Unrolled deterministic random walk — twin of
    ``operators/gds.random_walk`` over the undirected projection, nation
    sources: per step one join + ``arg_min(dst, md5(...))`` per walk.
    The draw is a pure hash function of (salt, step, current, neighbor),
    so both engines pick the identical neighbor — no RNG anywhere."""
    parts = [
        f"WITH e0 AS MATERIALIZED (SELECT src, dst FROM ({_EDGES})),",
        "e AS MATERIALIZED (SELECT src, dst FROM e0"
        " UNION ALL SELECT dst, src FROM e0),",
        "w0 AS MATERIALIZED (SELECT CAST(2000000000000 + n_nationkey AS BIGINT)"
        " AS walk_id, CAST(2000000000000 + n_nationkey AS BIGINT) AS id FROM nation),",
    ]
    for k in range(1, steps + 1):
        parts.append(
            f"w{k} AS MATERIALIZED (SELECT c.walk_id, "
            f"arg_min(e.dst, md5('{salt}' || '|' || '{k}' || '|' ||"
            f" CAST(c.id AS VARCHAR) || '|' || CAST(e.dst AS VARCHAR))) AS id "
            f"FROM w{k - 1} c JOIN e ON e.src = c.id GROUP BY c.walk_id),"
        )
    last = parts.pop().rstrip(",")
    parts.append(last)
    union = " UNION ALL ".join(
        f"SELECT walk_id, CAST({k} AS BIGINT) AS step, id FROM w{k}"
        for k in range(0, steps + 1)
    )
    parts.append(f"SELECT walk_id, step, id FROM ({union})")
    return "\n".join(parts)


def _kcore_sql(k: int, rounds: int) -> str:
    """Unrolled k-core peel as chained DuckDB CTEs — twin of
    ``operators/gds.kcore``: symmetric simple projection, then ``rounds``
    rounds of drop-degree-<k. The Spark side early-exits at the fixpoint;
    extra unrolled rounds here are no-ops, so both sides agree as long as
    the peel converges within ``rounds`` (generous: peel depth is the
    cascade count, single digits on this graph). Integer-only — hash-exact."""
    parts = [
        "WITH s0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a,"
        f" greatest(src, dst) AS b FROM ({_EDGES}) WHERE src <> dst),",
        "g0 AS MATERIALIZED (SELECT a AS src, b AS dst FROM s0"
        " UNION ALL SELECT b, a FROM s0),",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"k{r} AS MATERIALIZED (SELECT src FROM g{r - 1}"
            f" GROUP BY src HAVING COUNT(*) >= {k}),"
        )
        parts.append(
            f"g{r} AS MATERIALIZED (SELECT g.src, g.dst FROM g{r - 1} g"
            f" JOIN k{r} x ON x.src = g.src JOIN k{r} y ON y.src = g.dst),"
        )
    last = parts.pop().rstrip(",")
    parts.append(last)
    parts.append(
        f"SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS deg FROM g{rounds} GROUP BY src"
    )
    return "\n".join(parts)


def _lpa_parts(iterations: int) -> list[str]:
    """The unrolled-LPA CTE chain (shared by ``_lpa_sql`` and the
    modularity/conductance oracles that score the resulting labeling);
    the final CTE is ``lab{iterations}`` and the undirected doubled edge
    list is ``e``. Every clause ends with a comma so callers can append
    further CTEs before the final SELECT."""
    parts = [
        "WITH b AS (",
        "  SELECT CAST(3000000000000 + c_custkey AS BIGINT) AS s,",
        "         CAST(2000000000000 + c_nationkey AS BIGINT) AS d FROM customer",
        "  UNION ALL SELECT CAST(4000000000000 + s_suppkey AS BIGINT),",
        "         CAST(2000000000000 + s_nationkey AS BIGINT) FROM supplier",
        "  UNION ALL SELECT CAST(2000000000000 + n_nationkey AS BIGINT),",
        "         CAST(1000000000000 + n_regionkey AS BIGINT) FROM nation),",
        "e AS MATERIALIZED (SELECT s AS src, d AS dst FROM b UNION ALL SELECT d, s FROM b),",
        "lab0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS community FROM e),",
    ]
    for k in range(1, iterations + 1):
        p = f"lab{k - 1}"
        parts.append(
            f"best{k} AS (SELECT id, community AS cand FROM ("
            f"SELECT e.dst AS id, p.community, COUNT(*) AS n, "
            f"ROW_NUMBER() OVER (PARTITION BY e.dst "
            f"ORDER BY COUNT(*) DESC, p.community ASC) AS rn "
            f"FROM {p} p JOIN e ON e.src = p.id GROUP BY e.dst, p.community"
            f") WHERE rn = 1),"
        )
        parts.append(
            f"lab{k} AS MATERIALIZED (SELECT l.id, COALESCE(b.cand, l.community) AS community "
            f"FROM {p} l LEFT JOIN best{k} b USING (id)),"
        )
    return parts


def _lpa_sql(iterations: int) -> str:
    """Unrolled synchronous label propagation as chained DuckDB CTEs — twin
    of ``operators/gds.label_propagation`` on the IN_NATION ∪ IN_REGION
    subgraph: most-frequent neighbor label, ties → smallest label. All
    arithmetic is integer, so equality is exact. Running the full
    ``iterations`` without the operator's early exit is equivalent: the
    update is a deterministic function of the labels, so a converged
    labeling is a fixpoint."""
    parts = _lpa_parts(iterations)
    last = parts.pop().rstrip(",")
    parts.append(last)
    parts.append(f"SELECT id, community FROM lab{iterations}")
    return "\n".join(parts)


def _community_metric_sql(iterations: int, metric: str) -> str:
    """Modularity / conductance oracle over the unrolled-LPA labeling:
    reuse ``_lpa_parts`` verbatim, then score lab{k} against the SAME
    doubled edge list ``e`` with pure integer aggregation (exact across
    engines); the only division is the final single-step scaled ratio."""
    parts = _lpa_parts(iterations)
    parts.append(
        f"asg AS MATERIALIZED (SELECT id, community FROM lab{iterations}),"
    )
    parts.append(
        "lab AS (SELECT s.community AS cs, t.community AS cd "
        "FROM e JOIN asg s ON s.id = e.src JOIN asg t ON t.id = e.dst),"
    )
    if metric == "modularity":
        parts.append(
            "per_c AS (SELECT cs AS community, COUNT(*) AS deg_sum, "
            "SUM(CASE WHEN cs = cd THEN 1 ELSE 0 END) AS inn FROM lab GROUP BY cs)"
        )
        parts.append(
            "SELECT CAST(SUM(deg_sum) AS BIGINT) AS two_m, "
            "CAST(SUM(deg_sum) * SUM(inn) - SUM(deg_sum * deg_sum) AS BIGINT) AS q_num, "
            "CAST(ROUND(CAST(SUM(deg_sum) * SUM(inn) - SUM(deg_sum * deg_sum) AS DOUBLE) "
            "/ (CAST(SUM(deg_sum) AS DOUBLE) * CAST(SUM(deg_sum) AS DOUBLE)) * 1e6) "
            "AS BIGINT) AS q_micro "
            "FROM per_c"
        )
    else:
        parts.append(
            "per_c AS (SELECT cs AS community, COUNT(*) AS vol, "
            "SUM(CASE WHEN cs <> cd THEN 1 ELSE 0 END) AS cut FROM lab GROUP BY cs),"
        )
        parts.append("tm AS (SELECT SUM(vol) AS two_m FROM per_c)")
        parts.append(
            "SELECT community, CAST(cut AS BIGINT) AS cut, CAST(vol AS BIGINT) AS vol, "
            "CASE WHEN LEAST(vol, (SELECT two_m FROM tm) - vol) > 0 "
            "THEN CAST(ROUND(CAST(cut AS DOUBLE) "
            "/ CAST(LEAST(vol, (SELECT two_m FROM tm) - vol) AS DOUBLE) * 1e6) AS BIGINT) "
            "ELSE 0 END AS phi_micro "
            "FROM per_c"
        )
    return "\n".join(parts)


@register(
    "gds_degree",
    f"""
    WITH e AS ({_EDGES})
    SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS degree FROM e GROUP BY src
    """,
)
def gds_degree(spark, sf_dir):
    """gds.degree — per-node out-degree (one groupBy shuffle)."""
    return build_graph(spark, sf_dir).degrees("out")


@register(
    "gds_bfs_from_customer",
    f"""
    WITH RECURSIVE e AS ({_EDGES}),
    seed AS (SELECT CAST(3000000000000 + MIN(c_custkey) AS BIGINT) AS id FROM customer),
    walk AS (
      SELECT id, CAST(0 AS BIGINT) AS dist FROM seed
      UNION
      SELECT e.dst, walk.dist + 1 FROM walk JOIN e ON e.src = walk.id WHERE walk.dist < 10
    )
    SELECT id, MIN(dist) AS dist FROM walk GROUP BY id
    """,
)
def gds_bfs_from_customer(spark, sf_dir):
    """BFS distances from the lowest-keyed customer (frontier BSP)."""
    g = build_graph(spark, sf_dir)
    return gds.bfs(g.rels, _seed(g), max_depth=10)


@register(
    "gds_sssp_weighted",
    f"""
    WITH RECURSIVE e AS ({_EDGES}),
    seed AS (SELECT CAST(3000000000000 + MIN(c_custkey) AS BIGINT) AS id FROM customer),
    walk AS (
      SELECT id, CAST(0 AS BIGINT) AS dist, 0 AS hops FROM seed
      UNION
      SELECT e.dst, walk.dist + e.w, walk.hops + 1
      FROM walk JOIN e ON e.src = walk.id WHERE walk.hops < 6
    )
    SELECT id, MIN(dist) AS dist FROM walk GROUP BY id
    """,
)
def gds_sssp_weighted(spark, sf_dir):
    """Weighted SSSP (Bellman-Ford BSP), integer weights — exact."""
    g = build_graph(spark, sf_dir)
    w = (
        F.when(
            F.col("type").isin("CONTAINS", "SUPPLIED_BY"), F.col("l_quantity").cast("long")
        )
        .otherwise(F.lit(1))
        .alias("weight")
    )
    edges = g.rels.select("src", "dst", w)
    return gds.sssp(edges, _seed(g), max_iter=10)


# _EDGES with the quantity-weighted branches shifted NEGATIVE (w - 10):
# the projected graph is a DAG (customer→order→part→supplier→nation→
# region), so negative weights are safe — no negative cycle exists and
# the detection pass must come back empty.
_EDGES_NEG = """
  SELECT CAST(2000000000000 + n_nationkey AS BIGINT) AS src,
         CAST(1000000000000 + n_regionkey AS BIGINT) AS dst, CAST(1 AS BIGINT) AS w FROM nation
  UNION ALL SELECT CAST(3000000000000 + c_custkey AS BIGINT),
         CAST(2000000000000 + c_nationkey AS BIGINT), 1 FROM customer
  UNION ALL SELECT CAST(4000000000000 + s_suppkey AS BIGINT),
         CAST(2000000000000 + s_nationkey AS BIGINT), 1 FROM supplier
  UNION ALL SELECT CAST(3000000000000 + o_custkey AS BIGINT),
         CAST(6000000000000 + o_orderkey AS BIGINT), 1 FROM orders
  UNION ALL SELECT CAST(6000000000000 + l_orderkey AS BIGINT),
         CAST(5000000000000 + l_partkey AS BIGINT), CAST(l_quantity AS BIGINT) - 10 FROM lineitem
  UNION ALL SELECT CAST(5000000000000 + l_partkey AS BIGINT),
         CAST(4000000000000 + l_suppkey AS BIGINT), CAST(l_quantity AS BIGINT) - 10 FROM lineitem
"""


@register(
    "gds_bellman_ford_negative",
    f"""
    WITH RECURSIVE e AS ({_EDGES_NEG}),
    seed AS (SELECT CAST(3000000000000 + MIN(c_custkey) AS BIGINT) AS id FROM customer),
    walk AS (
      SELECT id, CAST(0 AS BIGINT) AS dist, 0 AS hops FROM seed
      UNION
      SELECT e.dst, walk.dist + e.w, walk.hops + 1
      FROM walk JOIN e ON e.src = walk.id WHERE walk.hops < 6
    )
    SELECT id, MIN(dist) AS dist, FALSE AS on_negative_cycle FROM walk GROUP BY id
    """,
)
def gds_bellman_ford_negative(spark, sf_dir):
    """gds.bellmanFord with genuinely negative edge weights (quantity−10
    on the lineitem-derived edges): exact integer distances plus the
    negative-cycle flag, provably all-false on this DAG projection — the
    detection pass (one extra relaxation round) must find nothing. The
    cycle-positive path is pytest-covered on a crafted graph."""
    g = build_graph(spark, sf_dir)
    w = (
        F.when(
            F.col("type").isin("CONTAINS", "SUPPLIED_BY"),
            F.col("l_quantity").cast("long") - 10,
        )
        .otherwise(F.lit(1))
        .alias("weight")
    )
    edges = g.rels.select("src", "dst", w)
    return gds.bellman_ford(edges, _seed(g), max_iter=10)


@register(
    "gds_dag_longest_path",
    f"""
    WITH RECURSIVE e AS ({_EDGES}),
    seed AS (SELECT CAST(3000000000000 + MIN(c_custkey) AS BIGINT) AS id FROM customer),
    walk AS (
      SELECT id, CAST(0 AS BIGINT) AS dist, 0 AS hops FROM seed
      UNION
      SELECT e.dst, walk.dist + e.w, walk.hops + 1
      FROM walk JOIN e ON e.src = walk.id WHERE walk.hops < 6
    )
    SELECT id, MAX(dist) AS dist FROM walk GROUP BY id
    """,
)
def gds_dag_longest_path(spark, sf_dir):
    """gds.dag.longestPath: longest weighted path from the seed customer
    over the DAG projection — the sssp frontier BSP with max-relaxation
    (critical-path distance, exact integers)."""
    g = build_graph(spark, sf_dir)
    w = (
        F.when(
            F.col("type").isin("CONTAINS", "SUPPLIED_BY"), F.col("l_quantity").cast("long")
        )
        .otherwise(F.lit(1))
        .alias("weight")
    )
    edges = g.rels.select("src", "dst", w)
    return gds.dag_longest_path(edges, _seed(g), max_iter=10)


@register(
    "gds_shortest_path_to_regions",
    f"""
    WITH RECURSIVE e AS ({_EDGES}),
    seed AS (SELECT CAST(3000000000000 + MIN(c_custkey) AS BIGINT) AS id FROM customer),
    walk AS (
      SELECT id, CAST(0 AS BIGINT) AS dist FROM seed
      UNION
      SELECT e.dst, walk.dist + 1 FROM walk JOIN e ON e.src = walk.id WHERE walk.dist < 10
    )
    SELECT id, MIN(dist) AS dist FROM walk
    WHERE id BETWEEN 1000000000000 AND 1999999999999 GROUP BY id
    """,
)
def gds_shortest_path_to_regions(spark, sf_dir):
    """shortestPath (unweighted): hop distance to every reachable Region."""
    g = build_graph(spark, sf_dir)
    lo, hi = 1_000_000_000_000, 1_999_999_999_999
    return gds.bfs(g.rels, _seed(g), max_depth=10).where(F.col("id").between(lo, hi))


@register(
    "gds_wcc_supply_zones",
    f"""
    WITH RECURSIVE e0 AS (
      SELECT CAST(4000000000000 + s_suppkey AS BIGINT) AS src,
             CAST(2000000000000 + s_nationkey AS BIGINT) AS dst FROM supplier
      UNION ALL
      SELECT CAST(2000000000000 + n_nationkey AS BIGINT),
             CAST(1000000000000 + n_regionkey AS BIGINT) FROM nation
    ),
    e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
    n AS (
      SELECT CAST(4000000000000 + s_suppkey AS BIGINT) AS id FROM supplier
      UNION SELECT CAST(2000000000000 + n_nationkey AS BIGINT) FROM nation
      UNION SELECT CAST(1000000000000 + r_regionkey AS BIGINT) FROM region
    ),
    r AS (
      SELECT id, id AS comp FROM n
      UNION
      SELECT e.dst, r.comp FROM r JOIN e ON e.src = r.id
    )
    SELECT id, MIN(comp) AS comp FROM r GROUP BY id
    """,
)
def gds_wcc_supply_zones(spark, sf_dir):
    """WCC over the Supplier–Nation–Region subgraph: one component per
    region, canonically labeled by the (minimum) region node id."""
    g = build_graph(spark, sf_dir)
    sup_lo = 4_000_000_000_000
    edges = g.type_frames["IN_NATION"].where(F.col("src") >= sup_lo).unionByName(
        g.type_frames["IN_REGION"]
    ).select("src", "dst")
    nodes = (
        g.label_frames["Supplier"]
        .select("id")
        .unionByName(g.label_frames["Nation"].select("id"))
        .unionByName(g.label_frames["Region"].select("id"))
    )
    return gds.wcc(edges, nodes)


@register(
    "gds_wcc_star_supply_zones",
    f"""
    WITH RECURSIVE e0 AS (
      SELECT CAST(4000000000000 + s_suppkey AS BIGINT) AS src,
             CAST(2000000000000 + s_nationkey AS BIGINT) AS dst FROM supplier
      UNION ALL
      SELECT CAST(2000000000000 + n_nationkey AS BIGINT),
             CAST(1000000000000 + n_regionkey AS BIGINT) FROM nation
    ),
    e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
    n AS (
      SELECT CAST(4000000000000 + s_suppkey AS BIGINT) AS id FROM supplier
      UNION SELECT CAST(2000000000000 + n_nationkey AS BIGINT) FROM nation
      UNION SELECT CAST(1000000000000 + r_regionkey AS BIGINT) FROM region
    ),
    r AS (
      SELECT id, id AS comp FROM n
      UNION
      SELECT e.dst, r.comp FROM r JOIN e ON e.src = r.id
    )
    SELECT id, MIN(comp) AS comp FROM r GROUP BY id
    """,
)
def gds_wcc_star_supply_zones(spark, sf_dir):
    """Same components as gds_wcc_supply_zones through the O(log n)
    large-star/small-star contraction kernel instead of O(diameter)
    min-label BSP — the high-diameter scale path."""
    g = build_graph(spark, sf_dir)
    sup_lo = 4_000_000_000_000
    edges = g.type_frames["IN_NATION"].where(F.col("src") >= sup_lo).unionByName(
        g.type_frames["IN_REGION"]
    ).select("src", "dst")
    nodes = (
        g.label_frames["Supplier"]
        .select("id")
        .unionByName(g.label_frames["Nation"].select("id"))
        .unionByName(g.label_frames["Region"].select("id"))
    )
    return gds.wcc_star(edges, nodes)


@register(
    "gds_triangle_count_copart",
    """
    WITH e AS (
      SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
    SELECT CAST(COUNT(*) AS BIGINT) AS triangles
    FROM e e1 JOIN e e2 ON e2.p1 = e1.p2 JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2
    """,
)
def gds_triangle_count_copart(spark, sf_dir):
    """Triangle count on the part co-occurrence graph (parts sharing an
    order) — wedge closure via two equi-joins, never all-pairs."""
    li = load_tables(spark, sf_dir)["lineitem"]
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("dst"))
    co = a.join(b, "o").where(F.col("src") < F.col("dst")).select("src", "dst")
    return gds.triangle_count(co)


@register(
    "gds_node_similarity_suppliers",
    """
    WITH sp AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
    sz AS (SELECT s, COUNT(*) AS n FROM sp GROUP BY s),
    i AS (
      SELECT a.s AS sa, b.s AS sb, CAST(COUNT(*) AS DOUBLE) AS i
      FROM sp a JOIN sp b ON a.p = b.p AND a.s < b.s GROUP BY a.s, b.s)
    SELECT CAST(4000000000000 + sa AS BIGINT) AS node_a,
           CAST(4000000000000 + sb AS BIGINT) AS node_b,
           i / (za.n + zb.n - i) AS jaccard
    FROM i JOIN sz za ON za.s = sa JOIN sz zb ON zb.s = sb
    WHERE i / (za.n + zb.n - i) >= 0.15
    """,
)
def gds_node_similarity_suppliers(spark, sf_dir):
    """gds.nodeSimilarity: suppliers by Jaccard of supplied-part sets
    (candidates co-grouped on shared parts — bucket join)."""
    g = build_graph(spark, sf_dir)
    sup_edges = g.type_frames["SUPPLIED_BY"].select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    return gds.node_similarity(sup_edges, min_jaccard=0.15)


@register(
    "gds_knn_embeddings",
    """
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 100),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_reduce(list_prepend(0.0,
               list_transform(range(1, len(q.embedding) + 1),
                 i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)),
               (acc, x) -> acc + x)
             / greatest(
                 sqrt(list_reduce(list_prepend(0.0,
                   list_transform(range(1, len(q.embedding) + 1),
                     i -> q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE)),
                   (acc, x) -> acc + x))
               * sqrt(list_reduce(list_prepend(0.0,
                   list_transform(range(1, len(c.embedding) + 1),
                     i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)),
                   (acc, x) -> acc + x)),
               1e-12) AS sim
      FROM q JOIN embeddings c ON q.vec_id != c.vec_id)
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
      FROM scored) WHERE rank <= 3
    """,
)
def gds_knn_embeddings(spark, sf_dir):
    """gds.knn over the embeddings property (exact cosine top-3)."""
    from ..operators import similarity as sim

    e = load_tables(spark, sf_dir)["embeddings"]
    return sim.brute_force_topk(e, e.where(F.col("vec_id") < 100), k=3)


@register(
    "gds_all_shortest_paths_to_regions",
    f"""
    WITH RECURSIVE e AS ({_EDGES}),
    seed AS (SELECT CAST(3000000000000 + MIN(c_custkey) AS BIGINT) AS id FROM customer),
    walk AS (
      SELECT id AS start_id, id AS end_id, [id] AS path, CAST(0 AS BIGINT) AS hops
      FROM seed
      UNION ALL
      SELECT walk.start_id, e.dst, list_append(walk.path, e.dst), walk.hops + 1
      FROM walk JOIN e ON e.src = walk.end_id
      WHERE walk.hops < 5 AND NOT list_contains(walk.path, e.dst)
    ),
    to_regions AS (
      SELECT DISTINCT start_id, end_id, hops, array_to_string(path, '->') AS path_str
      FROM walk
      WHERE end_id BETWEEN 1000000000000 AND 1999999999999
    ),
    mins AS (SELECT start_id, end_id, MIN(hops) AS hops FROM to_regions GROUP BY 1, 2)
    SELECT t.start_id, t.end_id, t.hops, t.path_str
    FROM to_regions t JOIN mins USING (start_id, end_id, hops)
    """,
)
def gds_all_shortest_paths_to_regions(spark, sf_dir):
    """allShortestPaths: every minimum-length simple path from the lowest
    customer to each reachable Region, as node-id arrays."""
    from ..operators import paths as P

    g = build_graph(spark, sf_dir)
    lo, hi = 1_000_000_000_000, 1_999_999_999_999
    regions = g.label_frames["Region"].select("id")
    out = P.all_shortest_paths(g.rels, _seed(g), max_hops=5, targets=regions)
    return out.select(
        "start_id",
        "end_id",
        "hops",
        F.concat_ws("->", F.transform("path", lambda x: x.cast("string"))).alias("path_str"),
    ).distinct()


@register("gds_pagerank", _pagerank_sql(15, weighted=False, out_scale="1e6"))
def gds_pagerank(spark, sf_dir):
    """gds.pageRank (15 iterations, damping 0.85, dangling-mass aware).

    Oracle: unrolled power iteration in DuckDB (``_pagerank_sql``); both
    sides surface micro-rank `CAST(ROUND(pr*1e6) AS BIGINT)` so the
    cross-engine last-ulp summation noise can't break hash equality."""
    g = build_graph(spark, sf_dir)
    out = gds.pagerank(g.rels, g.nodes, iterations=15)
    return out.select(
        "id", F.round(F.col("pr") * F.lit(1e6)).cast("long").alias("pr_scaled")
    )


@register("gds_betweenness_cosupply", _betweenness_sql(8, out_scale="1e4"))
def gds_betweenness_cosupply(spark, sf_dir):
    """gds.betweenness (Brandes, supplier source set = the gds
    samplingSize contract) over the part↔supplier co-supply bipartite
    graph (distinct lineitem pairs, undirected). Raw (un-halved)
    dependency sums, endpoints excluded.

    Oracle: unrolled forward-σ/backward-δ DP (``_betweenness_sql``) with
    the same depth cap on both sides, so truncation — if any — is
    identical."""
    t = load_tables(spark, sf_dir)
    ps = (
        t["lineitem"]
        .select(
            (F.lit(5000000000000) + F.col("l_partkey")).alias("p"),
            (F.lit(4000000000000) + F.col("l_suppkey")).alias("sp"),
        )
        .distinct()
    )
    edges = ps.select(F.col("p").alias("src"), F.col("sp").alias("dst"))
    nodes = ps.select(F.col("p").alias("id")).union(
        ps.select(F.col("sp").alias("id"))
    ).distinct()
    sources = (
        ps.select(F.col("sp").alias("id")).distinct().orderBy("id").limit(200)
    )
    bc = gds.betweenness(edges, sources, max_depth=8, undirected=True)
    return nodes.join(bc, "id", "left").select(
        "id",
        F.round(F.coalesce(F.col("bc"), F.lit(0.0)) * F.lit(1e4))
        .cast("long")
        .alias("bc_scaled"),
    )


@register("gds_random_walk", _random_walk_sql(6, salt="walk"))
def gds_random_walk(spark, sf_dir):
    """gds.randomWalk (deterministic hash-seeded draws, 6 steps,
    undirected, one walk per nation). No RNG: next hop = argmin
    md5(salt|step|cur|neighbor), so the walk is reproducible across
    runs/engines and carries an exact oracle (``_random_walk_sql``)."""
    g = build_graph(spark, sf_dir)
    nations = g.label_frames["Nation"].select("id")
    return gds.random_walk(g.rels, nations, steps=6, undirected=True)


@register("gds_kcore", _kcore_sql(4, rounds=20))
def gds_kcore(spark, sf_dir):
    """gds.kcore (k=4): members and in-core degrees of the maximal
    subgraph with min degree 4, via iterative peeling over the
    undirected simple projection. Oracle: fixed-round unrolled peel
    (``_kcore_sql``) — integer-only, hash-exact."""
    g = build_graph(spark, sf_dir)
    return gds.kcore(g.rels, k=4, max_rounds=20)


@register("gds_article_rank", _article_rank_sql(15, out_scale="1e6"))
def gds_article_rank(spark, sf_dir):
    """gds.articleRank (15 iterations, damping 0.85): the PageRank
    variant that divides a node's contribution by outDeg + avgOutDeg,
    dampening low-degree hubs (plugin namespace declared at
    reference calver/coredb/neo4j-plugins.json:24-30).

    Oracle: unrolled power iteration (``_article_rank_sql``), integer-
    scaled micro-rank output like ``gds_pagerank``."""
    g = build_graph(spark, sf_dir)
    out = gds.article_rank(g.rels, g.nodes, iterations=15)
    return out.select(
        "id", F.round(F.col("pr") * F.lit(1e6)).cast("long").alias("pr_scaled")
    )


@register("gds_eigenvector", _eigenvector_sql(15, out_scale="1e6"))
def gds_eigenvector(spark, sf_dir):
    """gds.eigenvector (15 L2-normalized power iterations, UNDIRECTED
    orientation — the directed projection is a DAG whose eigenvector
    limit is zero): centrality as the dominant eigenvector of the
    symmetric adjacency; isolated nodes are exactly 0.

    Oracle: unrolled normalize-and-propagate CTE chain
    (``_eigenvector_sql``); both sides surface
    `CAST(ROUND(score*1e6) AS BIGINT)`."""
    g = build_graph(spark, sf_dir)
    out = gds.eigenvector(gds.undirect(g.rels), g.nodes, iterations=15)
    return out.select(
        "id",
        F.round(F.col("score") * F.lit(1e6)).cast("long").alias("score_scaled"),
    )


@register("gds_label_propagation", _lpa_sql(6))
def gds_label_propagation(spark, sf_dir):
    """gds.labelPropagation (synchronous, deterministic tie-break).

    Oracle: unrolled synchronous LPA in DuckDB (``_lpa_sql``) — integer
    labels + integer vote counts, exact equality."""
    g = build_graph(spark, sf_dir)
    edges = g.type_frames["IN_NATION"].unionByName(g.type_frames["IN_REGION"]).select("src", "dst")
    nodes = (
        g.label_frames["Customer"].select("id")
        .unionByName(g.label_frames["Supplier"].select("id"))
        .unionByName(g.label_frames["Nation"].select("id"))
        .unionByName(g.label_frames["Region"].select("id"))
    )
    return gds.label_propagation(edges, nodes, max_iter=6)


@register(
    "gds_local_clustering",
    """
    WITH e AS (
      SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    deg AS (
      SELECT id, COUNT(*) AS d FROM (
        SELECT p1 AS id FROM e UNION ALL SELECT p2 FROM e) GROUP BY id),
    tri AS (
      SELECT e1.p1 AS x, e1.p2 AS y, e2.p2 AS z
      FROM e e1 JOIN e e2 ON e2.p1 = e1.p2 JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2),
    pn AS (
      SELECT id, COUNT(*) AS t FROM (
        SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
      GROUP BY id)
    SELECT deg.id, CAST(COALESCE(pn.t, 0) AS BIGINT) AS triangles,
           CASE WHEN deg.d >= 2
                THEN 2.0 * COALESCE(pn.t, 0) / (deg.d * (deg.d - 1))
                ELSE 0.0 END AS coeff
    FROM deg LEFT JOIN pn ON pn.id = deg.id
    """,
)
def gds_local_clustering(spark, sf_dir):
    """Per-node triangle count + local clustering coefficient on the part
    co-occurrence graph (wedge closure, never all-pairs)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("dst"))
    co = a.join(b, "o").where(F.col("src") < F.col("dst")).select("src", "dst")
    return gds.local_clustering(co)


@register("gds_pagerank_weighted", _pagerank_sql(10, weighted=True, out_scale="1e6"))
def gds_pagerank_weighted(spark, sf_dir):
    """gds.pageRank with relationshipWeightProperty: lineitem-derived
    edges weighted by l_quantity, FK edges weight 1. Oracle: unrolled
    weighted power iteration (``_pagerank_sql`` with w = l_quantity)."""
    g = build_graph(spark, sf_dir)
    w = (
        F.when(F.col("type").isin("CONTAINS", "SUPPLIED_BY"), F.col("l_quantity"))
        .otherwise(F.lit(1.0))
        .alias("weight")
    )
    edges = g.rels.select("src", "dst", w)
    out = gds.pagerank(edges, g.nodes, iterations=10, weight_col="weight")
    return out.select(
        "id", F.round(F.col("pr") * F.lit(1e6)).cast("long").alias("pr_scaled")
    )


@register("gds_personalized_pagerank", _ppr_sql(10, out_scale="1e9"))
def gds_personalized_pagerank(spark, sf_dir):
    """gds.pageRank with sourceNodes: rank personalized on the lowest
    customer; mass stays in its reachable neighborhood. Oracle: unrolled
    teleport-to-seed power iteration (``_ppr_sql``); nano-rank granularity
    because Σpr = 1 spreads over a small support set."""
    g = build_graph(spark, sf_dir)
    out = gds.personalized_pagerank(g.rels, _seed(g), g.nodes, iterations=10)
    return out.select(
        "id", F.round(F.col("pr") * F.lit(1e9)).cast("long").alias("pr_scaled")
    )


@register(
    "gds_pagerank_serving",
    _pagerank_serving_sql(20, tol="1.0e-7", out_scale="1e6"),
)
def gds_pagerank_serving(spark, sf_dir):
    """gds.pageRank in its default SERVING shape — maxIterations=20,
    tolerance=1e-7 (the knob's documented defaults).

    Oracle (r8, was rows-only): ``_pagerank_serving_sql`` unrolls all 20
    rounds AND replicates the early exit — per-round Σ|Δpr| deltas pick
    the same stop round the operator's `delta < tol·N` check does, so
    the surfaced frame is the identical round on both engines (deltas
    shrink geometrically, so the threshold comparison is noise-proof)."""
    g = build_graph(spark, sf_dir)
    out = gds.pagerank(g.rels, g.nodes, iterations=20, tolerance=1e-7)
    return out.select(
        "id", F.round(F.col("pr") * F.lit(1e6)).cast("long").alias("pr_scaled")
    )


def _louvain_sql(iterations: int, tail: str | None = None) -> str:
    """Unrolled synchronous Louvain local-moving as chained DuckDB CTEs —
    twin of ``operators/gds.louvain`` on the IN_NATION ∪ IN_REGION
    subgraph. The move decision is the EXACT integer argmax
    ``G = 2m·k_in − deg·(Σtot − [cand=own]·deg)`` with ties to the
    smallest community id, and the parity gate is plain ``id % 2`` — every
    operation is integer, so equality is bit-exact across engines. Running
    the full ``iterations`` without the operator's early exit is
    equivalent: once an even+odd round pair produces no moves, the update
    is at a fixpoint and further rounds are identity."""
    parts = [
        "WITH b AS (",
        "  SELECT CAST(3000000000000 + c_custkey AS BIGINT) AS s,",
        "         CAST(2000000000000 + c_nationkey AS BIGINT) AS d FROM customer",
        "  UNION ALL SELECT CAST(4000000000000 + s_suppkey AS BIGINT),",
        "         CAST(2000000000000 + s_nationkey AS BIGINT) FROM supplier",
        "  UNION ALL SELECT CAST(2000000000000 + n_nationkey AS BIGINT),",
        "         CAST(1000000000000 + n_regionkey AS BIGINT) FROM nation),",
        # undirect + distinct (UNION dedups), same as gds.undirect().distinct()
        "e AS MATERIALIZED (SELECT s AS src, d AS dst FROM b UNION SELECT d, s FROM b),",
        "nodes AS MATERIALIZED (",
        "  SELECT CAST(3000000000000 + c_custkey AS BIGINT) AS id FROM customer",
        "  UNION ALL SELECT CAST(4000000000000 + s_suppkey AS BIGINT) FROM supplier",
        "  UNION ALL SELECT CAST(2000000000000 + n_nationkey AS BIGINT) FROM nation",
        "  UNION ALL SELECT CAST(1000000000000 + r_regionkey AS BIGINT) FROM region),",
        "deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS dg FROM e GROUP BY src),",
        "tm AS (SELECT COUNT(*) AS two_m FROM e),",
        "c0 AS MATERIALIZED (SELECT id, id AS community FROM nodes),",
    ]
    for k in range(1, iterations + 1):
        p = f"c{k - 1}"
        parts.append(
            f"sig{k} AS (SELECT c.community AS cand, SUM(d.dg) AS sigma "
            f"FROM {p} c JOIN deg d USING (id) GROUP BY c.community),"
        )
        parts.append(
            f"kin{k} AS (SELECT id, cand, MAX(kin) AS kin FROM ("
            f"SELECT e.src AS id, c.community AS cand, COUNT(*) AS kin "
            f"FROM e JOIN {p} c ON c.id = e.dst GROUP BY e.src, c.community "
            f"UNION ALL SELECT id, community, CAST(0 AS BIGINT) FROM {p}"
            f") GROUP BY id, cand),"
        )
        parts.append(
            f"best{k} AS (SELECT id, cand FROM ("
            f"SELECT k.id, k.cand, ROW_NUMBER() OVER (PARTITION BY k.id ORDER BY "
            f"((SELECT two_m FROM tm) * k.kin - d.dg * (s.sigma - "
            f"CASE WHEN k.cand = o.community THEN d.dg ELSE 0 END)) DESC, "
            f"k.cand ASC) AS rn "
            f"FROM kin{k} k JOIN deg d USING (id) "
            f"JOIN sig{k} s ON s.cand = k.cand JOIN {p} o ON o.id = k.id"
            f") WHERE rn = 1),"
        )
        parts.append(
            f"c{k} AS MATERIALIZED (SELECT c.id, "
            f"CASE WHEN c.id % 2 = {(k - 1) % 2} AND b.cand IS NOT NULL "
            f"THEN b.cand ELSE c.community END AS community "
            f"FROM {p} c LEFT JOIN best{k} b USING (id)),"
        )
    if tail is None:
        last = parts.pop().rstrip(",")
        parts.append(last)
        parts.append(f"SELECT id, community FROM c{iterations}")
    else:
        parts.append(tail)
    return "\n".join(parts)


@register("gds_louvain", _louvain_sql(5))
def gds_louvain(spark, sf_dir):
    """gds.louvain (synchronous local-moving, deterministic tie-break) —
    exact-oracled via integer modularity gains (``_louvain_sql``), the
    same unrolled-CTE technique as ``_pagerank_sql``."""
    g = build_graph(spark, sf_dir)
    edges = g.type_frames["IN_NATION"].unionByName(g.type_frames["IN_REGION"]).select("src", "dst")
    nodes = (
        g.label_frames["Customer"].select("id")
        .unionByName(g.label_frames["Supplier"].select("id"))
        .unionByName(g.label_frames["Nation"].select("id"))
        .unionByName(g.label_frames["Region"].select("id"))
    )
    return gds.louvain(edges, nodes, max_iter=5)


@register(
    "gds_graph_project",
    """
    SELECT 'Customer' AS kind, CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n
    UNION ALL SELECT 'Order', CAST((SELECT COUNT(*) FROM orders) AS BIGINT)
    UNION ALL SELECT 'PLACED', CAST((SELECT COUNT(*) FROM orders) AS BIGINT)
    """,
)
def gds_graph_project(spark, sf_dir):
    """gds.graph.project: label/type-filtered subgraph + size summary."""
    g = build_graph(spark, sf_dir)
    c = g.label_frames["Customer"].select(F.lit("Customer").alias("kind"))
    o = g.label_frames["Order"].select(F.lit("Order").alias("kind"))
    p = g.type_frames["PLACED"].select(F.lit("PLACED").alias("kind"))
    return (
        c.unionByName(o).unionByName(p)
        .groupBy("kind")
        .agg(F.count("*").cast("long").alias("n"))
    )


@register(
    "gds_closeness_nations",
    f"""
    WITH RECURSIVE b AS (
      SELECT CAST(3000000000000 + c_custkey AS BIGINT) AS s,
             CAST(2000000000000 + c_nationkey AS BIGINT) AS d FROM customer
      UNION ALL SELECT CAST(4000000000000 + s_suppkey AS BIGINT),
             CAST(2000000000000 + s_nationkey AS BIGINT) FROM supplier
      UNION ALL SELECT CAST(2000000000000 + n_nationkey AS BIGINT),
             CAST(1000000000000 + n_regionkey AS BIGINT) FROM nation),
    e AS (SELECT s AS src, d AS dst FROM b UNION ALL SELECT d, s FROM b),
    srcs AS (
      SELECT CAST(2000000000000 + n_nationkey AS BIGINT) AS id FROM nation
      UNION ALL SELECT CAST(1000000000000 + r_regionkey AS BIGINT) FROM region),
    walk(source, id, dist) AS (
      SELECT id, id, 0 FROM srcs
      UNION
      SELECT w.source, e.dst, w.dist + 1
      FROM walk w JOIN e ON e.src = w.id WHERE w.dist < 8
    ),
    d AS (SELECT source, id, MIN(dist) AS dist FROM walk GROUP BY source, id),
    a AS (SELECT source AS id, CAST(COUNT(*) AS BIGINT) AS n_reached,
                 CAST(SUM(dist) AS BIGINT) AS sum_dist
          FROM d GROUP BY source)
    SELECT id, n_reached, sum_dist,
           CAST(ROUND(CASE WHEN sum_dist > 0
                THEN CAST(n_reached - 1 AS DOUBLE) / CAST(sum_dist AS DOUBLE)
                ELSE 0e0 END * 1e6) AS BIGINT) AS closeness_micro
    FROM a ORDER BY id
    """,
)
def gds_closeness_nations(spark, sf_dir):
    """gds.closeness for the Nation ∪ Region node set over the undirected
    membership subgraph (operators/gds.closeness — multi-source frontier
    BSP; GDS raw formula (reached−1)/Σdist). Source-bounded by design:
    exact for the requested set, landmark sampling is the scale path.
    Oracle: recursive-CTE multi-source BFS with a hop cap above the
    subgraph's diameter; integer counts + one exact division, surfaced as
    micro-scaled integers."""
    g = build_graph(spark, sf_dir)
    edges = g.type_frames["IN_NATION"].unionByName(g.type_frames["IN_REGION"]).select("src", "dst")
    srcs = (
        g.label_frames["Nation"].select("id")
        .unionByName(g.label_frames["Region"].select("id"))
    )
    out = gds.closeness(edges, srcs, max_depth=8)
    return out.select(
        "id",
        "n_reached",
        "sum_dist",
        F.round(F.col("closeness") * F.lit(1e6)).cast("long").alias("closeness_micro"),
    ).orderBy("id")


@register(
    "gds_harmonic_nations",
    f"""
    WITH RECURSIVE b AS (
      SELECT CAST(3000000000000 + c_custkey AS BIGINT) AS s,
             CAST(2000000000000 + c_nationkey AS BIGINT) AS d FROM customer
      UNION ALL SELECT CAST(4000000000000 + s_suppkey AS BIGINT),
             CAST(2000000000000 + s_nationkey AS BIGINT) FROM supplier
      UNION ALL SELECT CAST(2000000000000 + n_nationkey AS BIGINT),
             CAST(1000000000000 + n_regionkey AS BIGINT) FROM nation),
    e AS (SELECT s AS src, d AS dst FROM b UNION ALL SELECT d, s FROM b),
    srcs AS (
      SELECT CAST(2000000000000 + n_nationkey AS BIGINT) AS id FROM nation
      UNION ALL SELECT CAST(1000000000000 + r_regionkey AS BIGINT) FROM region),
    walk(source, id, dist) AS (
      SELECT id, id, 0 FROM srcs
      UNION
      SELECT w.source, e.dst, w.dist + 1
      FROM walk w JOIN e ON e.src = w.id WHERE w.dist < 8
    ),
    d AS (SELECT source, id, MIN(dist) AS dist FROM walk GROUP BY source, id)
    SELECT source AS id,
           CAST(ROUND(SUM(CASE WHEN dist > 0 THEN 1e0 / CAST(dist AS DOUBLE)
                               ELSE 0e0 END) * 1e6) AS BIGINT) AS harmonic_micro
    FROM d GROUP BY source ORDER BY id
    """,
)
def gds_harmonic_nations(spark, sf_dir):
    """gds.closeness.harmonic for the Nation ∪ Region set: Σ_v 1/d(u,v)
    over the same multi-source BSP walk as gds_closeness_nations —
    harmonic handles disconnected graphs gracefully (unreachable terms
    contribute 0 instead of poisoning the mean). Micro-scaled: the 1/d
    terms are exact IEEE divisions of small integers and the cross-engine
    summation-order noise is ~1e-16, far below the 5e-7 boundary."""
    g = build_graph(spark, sf_dir)
    edges = g.type_frames["IN_NATION"].unionByName(g.type_frames["IN_REGION"]).select("src", "dst")
    srcs = (
        g.label_frames["Nation"].select("id")
        .unionByName(g.label_frames["Region"].select("id"))
    )
    walk = gds.closeness_walk(edges, srcs, max_depth=8)
    out = walk.groupBy(F.col("source").alias("id")).agg(
        F.round(
            F.sum(
                F.when(F.col("dist") > 0, F.lit(1.0) / F.col("dist").cast("double"))
                .otherwise(F.lit(0.0))
            )
            * F.lit(1e6)
        )
        .cast("long")
        .alias("harmonic_micro")
    )
    return out.orderBy("id")


def _hits_sql(iterations: int, out_scale: str) -> str:
    """Unrolled HITS (Kleinberg hubs & authorities) as chained DuckDB CTEs
    — twin of ``operators/gds.hits`` over the DIRECTED projection: per
    round a ← normalize(Aᵀh) then h ← normalize(Aa), both L2. Same
    double-sum + round-scale tolerance argument as ``_eigenvector_sql``."""
    parts = [
        f"WITH e AS MATERIALIZED (SELECT src, dst FROM ({_EDGES})),",
        f"nodes AS MATERIALIZED ({_NODES}),",
        "h0 AS MATERIALIZED (SELECT id, 1.0e0 AS hub FROM nodes),",
    ]
    for k in range(1, iterations + 1):
        p = f"h{k - 1}"
        parts.append(
            f"ar{k} AS MATERIALIZED (SELECT e.dst AS id, SUM(p.hub) AS auth "
            f"FROM {p} p JOIN e ON e.src = p.id GROUP BY e.dst),"
        )
        parts.append(f"an{k} AS (SELECT SQRT(SUM(auth * auth)) AS nrm FROM ar{k}),")
        parts.append(
            f"a{k} AS MATERIALIZED (SELECT id, auth / (SELECT nrm FROM an{k}) "
            f"AS auth FROM ar{k}),"
        )
        parts.append(
            f"hr{k} AS MATERIALIZED (SELECT e.src AS id, SUM(a.auth) AS hub "
            f"FROM a{k} a JOIN e ON e.dst = a.id GROUP BY e.src),"
        )
        parts.append(f"hn{k} AS (SELECT SQRT(SUM(hub * hub)) AS nrm FROM hr{k}),")
        parts.append(
            f"h{k} AS MATERIALIZED (SELECT id, hub / (SELECT nrm FROM hn{k}) "
            f"AS hub FROM hr{k}),"
        )
    last = parts.pop().rstrip(",")
    parts.append(last)
    parts.append(
        f"SELECT n.id, "
        f"CAST(ROUND(COALESCE(h.hub, 0e0) * {out_scale}) AS BIGINT) AS hub_scaled, "
        f"CAST(ROUND(COALESCE(a.auth, 0e0) * {out_scale}) AS BIGINT) AS auth_scaled "
        f"FROM nodes n LEFT JOIN h{iterations} h ON h.id = n.id "
        f"LEFT JOIN a{iterations} a ON a.id = n.id"
    )
    return "\n".join(parts)


@register("gds_hits", _hits_sql(8, out_scale="1e6"))
def gds_hits(spark, sf_dir):
    """gds.alpha.hits over the full FK projection — hubs score order-
    placing customers / nations, authorities score parts/suppliers/
    regions (edge heads). Oracle: unrolled alternating power iteration
    (``_hits_sql``), micro-scaled."""
    g = build_graph(spark, sf_dir)
    out = gds.hits(g.rels.select("src", "dst"), g.nodes.select("id"), iterations=8)
    return out.select(
        "id",
        F.round(F.col("hub") * F.lit(1e6)).cast("long").alias("hub_scaled"),
        F.round(F.col("auth") * F.lit(1e6)).cast("long").alias("auth_scaled"),
    )


def _lpa_subgraph(spark, sf_dir):
    """The IN_NATION ∪ IN_REGION subgraph + its 6-round LPA labeling —
    shared input of the community-metric rows (twin of ``_lpa_parts``)."""
    g = build_graph(spark, sf_dir)
    edges = g.type_frames["IN_NATION"].unionByName(g.type_frames["IN_REGION"]).select("src", "dst")
    nodes = (
        g.label_frames["Customer"].select("id")
        .unionByName(g.label_frames["Supplier"].select("id"))
        .unionByName(g.label_frames["Nation"].select("id"))
        .unionByName(g.label_frames["Region"].select("id"))
    )
    asg = gds.label_propagation(edges, nodes, max_iter=6)
    return edges, asg


@register("gds_modularity_lpa", _community_metric_sql(6, "modularity"))
def gds_modularity_lpa(spark, sf_dir):
    """gds.modularity — Newman Q of the 6-round LPA labeling on the
    nation/region subgraph. Exact: the oracle replays the unrolled-LPA
    CTE chain then aggregates with pure integer arithmetic
    (``_community_metric_sql``); q_num = Q·(2m)² is bit-exact, q_micro
    derives from it with one division."""
    edges, asg = _lpa_subgraph(spark, sf_dir)
    return gds.modularity(edges, asg)


@register("gds_conductance_lpa", _community_metric_sql(6, "conductance"))
def gds_conductance_lpa(spark, sf_dir):
    """gds.conductance — per-community cut/volume of the 6-round LPA
    labeling; cut and vol are exact integers, phi_micro is one scaled
    division of them."""
    edges, asg = _lpa_subgraph(spark, sf_dir)
    return gds.conductance(edges, asg)


@register(
    "gds_scale_properties",
    """
    WITH s AS (
      SELECT MIN(c_acctbal) AS mn, MAX(c_acctbal) AS mx, MAX(ABS(c_acctbal)) AS mabs,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sm,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4)) * CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS s2,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM customer)
    SELECT c_custkey AS id,
           CAST(ROUND((c_acctbal - mn) / (mx - mn) * 1e6) AS BIGINT) AS minmax_scaled,
           CAST(ROUND((c_acctbal - sm / n) / (mx - mn) * 1e6) AS BIGINT) AS mean_scaled,
           CAST(ROUND((c_acctbal - sm / n) / SQRT((s2 - sm * sm / n) / (n - 1)) * 1e6) AS BIGINT) AS stdscore_scaled,
           CAST(ROUND(LN(c_acctbal - mn + 1) * 1e6) AS BIGINT) AS log_scaled
    FROM customer, s
    """,
)
def gds_scale_properties(spark, sf_dir):
    """gds.scaleProperties on customer account balances — minMax, mean,
    stdScore and log scalers in one pass. μ/σ derive from exact DECIMAL
    sums (``operators/gds.scale_properties``); the remaining per-row ops
    are single IEEE operations, so micro-rounded values match the oracle
    bit-for-bit (LN is the one libm-ulp surface, absorbed by rounding)."""
    c = load_tables(spark, sf_dir)["customer"].withColumnRenamed("c_custkey", "id")
    return gds.scale_properties(
        c, "c_acctbal", scalers=("minmax", "mean", "stdscore", "log")
    )


@register(
    "gds_topological_layers",
    f"""
    WITH RECURSIVE e AS (SELECT src, dst FROM ({_EDGES})),
    nodes AS ({_NODES}),
    walk(id, d) AS (
      SELECT id, 0 FROM nodes
      UNION
      SELECT e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.id WHERE w.d < 8
    )
    SELECT id, CAST(MAX(d) AS BIGINT) AS layer FROM walk GROUP BY id
    """,
)
def gds_topological_layers(spark, sf_dir):
    """Topological level scheduling over the FK DAG
    (``operators/gds.topological_layers``): layer = longest path ending
    at the node (customer→order→part→supplier→nation→region tops out at
    5). Oracle: recursive-CTE longest-path fold, exact integers."""
    g = build_graph(spark, sf_dir)
    return gds.topological_layers(g.rels.select("src", "dst"), g.nodes.select("id"), max_iter=10)


@register(
    "gds_scc_regions",
    """
    SELECT CAST(3000000000000 + c_custkey AS BIGINT) AS id,
           CAST(3000000000000 + c_custkey AS BIGINT) AS component FROM customer
    UNION ALL
    SELECT CAST(4000000000000 + s_suppkey AS BIGINT),
           CAST(4000000000000 + s_suppkey AS BIGINT) FROM supplier
    UNION ALL
    SELECT CAST(2000000000000 + n_nationkey AS BIGINT),
           CAST(1000000000000 + n_regionkey AS BIGINT) FROM nation
    UNION ALL
    SELECT CAST(1000000000000 + r_regionkey AS BIGINT),
           CAST(1000000000000 + r_regionkey AS BIGINT) FROM region
    """,
)
def gds_scc_regions(spark, sf_dir):
    """gds.scc (FW-BW-MIN peeling) on the membership subgraph with
    region→nation BACK-edges added: nation↔region cycles collapse each
    region with its nations into one SCC anchored at the region id (the
    SCC's min), while the one-way customer/supplier spokes stay
    singletons — the closed-form the oracle states directly. Two peels:
    the cyclic cores retire first, the spokes the round after."""
    g = build_graph(spark, sf_dir)
    fwd = g.type_frames["IN_NATION"].unionByName(g.type_frames["IN_REGION"]).select("src", "dst")
    back = g.type_frames["IN_REGION"].select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    edges = fwd.unionByName(back)
    nodes = (
        g.label_frames["Customer"].select("id")
        .unionByName(g.label_frames["Supplier"].select("id"))
        .unionByName(g.label_frames["Nation"].select("id"))
        .unionByName(g.label_frames["Region"].select("id"))
    )
    return gds.scc(edges, nodes, max_peels=5, max_iter=12)


@register(
    "gds_degree_weighted",
    f"""
    WITH e AS ({_EDGES})
    SELECT src AS id,
           CAST(COUNT(*) AS BIGINT) AS out_degree,
           CAST(SUM(w) AS BIGINT) AS weighted_degree
    FROM e GROUP BY src
    """,
)
def gds_degree_weighted(spark, sf_dir):
    """gds.degree with relationshipWeightProperty — out-degree and
    quantity-weighted degree in one pass (integer weights, exact). One
    groupBy(src) partial-aggregate shuffle; the map side combines before
    the exchange, so the shuffle carries ≤|nodes| rows, not |edges|."""
    g = build_graph(spark, sf_dir)
    w = (
        F.when(
            F.col("type").isin("CONTAINS", "SUPPLIED_BY"), F.col("l_quantity").cast("long")
        )
        .otherwise(F.lit(1))
    )
    return (
        g.rels.select("src", w.alias("_w"))
        .groupBy(F.col("src").alias("id"))
        .agg(
            F.count("*").cast("long").alias("out_degree"),
            F.sum("_w").cast("long").alias("weighted_degree"),
        )
    )


@register(
    "gds_spanning_forest",
    """
    SELECT CAST(3000000000000 + c_custkey AS BIGINT) AS src,
           CAST(2000000000000 + c_nationkey AS BIGINT) AS dst,
           CAST(1 AS BIGINT) AS weight FROM customer
    UNION ALL
    SELECT CAST(4000000000000 + s_suppkey AS BIGINT),
           CAST(2000000000000 + s_nationkey AS BIGINT), 1 FROM supplier
    UNION ALL
    SELECT CAST(2000000000000 + n_nationkey AS BIGINT),
           CAST(1000000000000 + n_regionkey AS BIGINT), 1 FROM nation
    """,
)
def gds_spanning_forest(spark, sf_dir):
    """gds.spanningTree (Borůvka BSP) on the membership forest plus
    redundant weight-10 customer→region shortcut edges: every shortcut is
    the unique heaviest edge in its cycle, so the cycle property excludes
    exactly the shortcuts and the minimum spanning forest is the original
    membership edge set — the closed form the oracle states. Exercises
    component merging across ≥2 Borůvka rounds (stars → region trees)."""
    g = build_graph(spark, sf_dir)
    light = (
        g.type_frames["IN_NATION"].unionByName(g.type_frames["IN_REGION"])
        .select("src", "dst", F.lit(1.0).alias("weight"))
    )
    t = load_tables(spark, sf_dir)
    c = t["customer"].select(
        (F.lit(3000000000000) + F.col("c_custkey")).cast("long").alias("src"),
        F.col("c_nationkey").alias("_nk"),
    )
    n = t["nation"].select(
        F.col("n_nationkey").alias("_nk2"), F.col("n_regionkey").alias("_rk")
    )
    heavy = c.join(n, c["_nk"] == n["_nk2"]).select(
        "src",
        (F.lit(1000000000000) + F.col("_rk")).cast("long").alias("dst"),
        F.lit(10.0).alias("weight"),
    )
    nodes = (
        g.label_frames["Customer"].select("id")
        .unionByName(g.label_frames["Supplier"].select("id"))
        .unionByName(g.label_frames["Nation"].select("id"))
        .unionByName(g.label_frames["Region"].select("id"))
    )
    out = gds.spanning_forest(light.unionByName(heavy), nodes)
    return out.select("src", "dst", F.col("weight").cast("long").alias("weight"))


def _fastrp_sql(dim: int, rounds: int, salt: str) -> str:
    """Unrolled FastRP as chained DuckDB CTEs in the same LONG FORM as
    ``operators/gds.fastrp``: md5-parity ±1 init, per-round in-neighbor
    mean over the doubled membership edge set, unit iteration weights,
    micro-rounded components serialized as an ordered comma string (array
    columns don't hash across engines; strings do)."""
    hexlow = "'0','1','2','3','4','5','6','7'"
    parts = [
        "WITH b AS (",
        "  SELECT CAST(3000000000000 + c_custkey AS BIGINT) AS s,",
        "         CAST(2000000000000 + c_nationkey AS BIGINT) AS d FROM customer",
        "  UNION ALL SELECT CAST(4000000000000 + s_suppkey AS BIGINT),",
        "         CAST(2000000000000 + s_nationkey AS BIGINT) FROM supplier",
        "  UNION ALL SELECT CAST(2000000000000 + n_nationkey AS BIGINT),",
        "         CAST(1000000000000 + n_regionkey AS BIGINT) FROM nation),",
        "e AS MATERIALIZED (SELECT s AS src, d AS dst FROM b UNION ALL SELECT d, s FROM b),",
        "nodes AS MATERIALIZED (",
        "  SELECT CAST(3000000000000 + c_custkey AS BIGINT) AS id FROM customer",
        "  UNION ALL SELECT CAST(4000000000000 + s_suppkey AS BIGINT) FROM supplier",
        "  UNION ALL SELECT CAST(2000000000000 + n_nationkey AS BIGINT) FROM nation",
        "  UNION ALL SELECT CAST(1000000000000 + r_regionkey AS BIGINT) FROM region),",
        "deg AS MATERIALIZED (SELECT dst, COUNT(*) AS dg FROM e GROUP BY dst),",
        f"x0 AS MATERIALIZED (SELECT id, j, CASE WHEN substr(md5("
        f"'{salt}#' || CAST(id AS VARCHAR) || '#' || CAST(j AS VARCHAR)), 1, 1) "
        f"IN ({hexlow}) THEN 1.0e0 ELSE -1.0e0 END AS v "
        f"FROM nodes, range({dim}) t(j)),",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"x{k} AS MATERIALIZED (SELECT e.dst AS id, p.j, SUM(p.v) / d.dg AS v "
            f"FROM x{k - 1} p JOIN e ON e.src = p.id JOIN deg d ON d.dst = e.dst "
            f"GROUP BY e.dst, p.j, d.dg),"
        )
    union = " UNION ALL ".join(
        f"SELECT id, j, v FROM x{k}" for k in range(1, rounds + 1)
    )
    parts.append(f"summ AS (SELECT id, j, SUM(v) AS v FROM ({union}) GROUP BY id, j),")
    parts.append(
        f"grid AS (SELECT n.id, t.j FROM nodes n, range({dim}) t(j))"
    )
    parts.append(
        "SELECT g.id, string_agg(CAST(CAST(ROUND(COALESCE(s.v, 0e0) * 1e6) AS BIGINT) "
        "AS VARCHAR), ',' ORDER BY g.j) AS emb "
        "FROM grid g LEFT JOIN summ s ON s.id = g.id AND s.j = g.j GROUP BY g.id"
    )
    return "\n".join(parts)


@register("gds_fastrp", _fastrp_sql(8, 3, "fastrp"))
def gds_fastrp(spark, sf_dir):
    """gds.fastRP node embeddings on the undirected membership subgraph:
    deterministic md5-parity ±1 projections, three in-neighbor-mean
    rounds, unit iteration weights. The long-form (id, j, v) state keeps
    every round a plain join→groupBy — PageRank's shuffle shape times the
    embedding dimension — and the row serializes micro-rounded components
    as an ordered string for the hash gate."""
    edges, _ = _lpa_subgraph(spark, sf_dir)
    g = build_graph(spark, sf_dir)
    nodes = (
        g.label_frames["Customer"].select("id")
        .unionByName(g.label_frames["Supplier"].select("id"))
        .unionByName(g.label_frames["Nation"].select("id"))
        .unionByName(g.label_frames["Region"].select("id"))
    )
    out = gds.fastrp(gds.undirect(edges), nodes, dim=8, weights=(1.0, 1.0, 1.0))
    emb = out.select(
        "id", "j", F.round(F.col("v") * F.lit(1e6)).cast("long").cast("string").alias("r")
    )
    return emb.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "r"))), lambda s: s["r"]
            ),
            ",",
        ).alias("emb")
    )


def _kmeans_sql(k: int, dim: int, iterations: int, tail: str | None = None) -> str:
    """Unrolled Lloyd's k-means as chained DuckDB CTEs, mirroring
    ``operators/gds.kmeans`` op-for-op: milli-quantized integer points,
    k-lowest-id seeding, exact int64 distances, ROW_NUMBER arg-min with
    ties to the lowest centroid id, re-quantized means with
    empty-cluster COALESCE."""
    parts = [
        "WITH pts AS MATERIALIZED (",
        "  SELECT vec_id AS id, t.j - 1 AS j,",
        "         CAST(ROUND(CAST(embedding[t.j] AS DOUBLE) * 1000e0) AS BIGINT) AS q",
        f"  FROM embeddings, range(1, {dim + 1}) t(j)),",
        f"seeds AS (SELECT DISTINCT id FROM pts ORDER BY id LIMIT {k}),",
        "c0 AS MATERIALIZED (SELECT p.id AS c, p.j, p.q FROM pts p "
        "JOIN seeds s ON s.id = p.id),",
    ]
    for r in range(1, iterations + 1):
        parts.append(
            f"d{r} AS (SELECT p.id, c.c, "
            f"SUM((p.q - c.q) * (p.q - c.q)) AS dist "
            f"FROM pts p JOIN c{r - 1} c ON c.j = p.j GROUP BY p.id, c.c),"
        )
        parts.append(
            f"a{r} AS MATERIALIZED (SELECT id, c AS cluster FROM ("
            f"SELECT id, c, ROW_NUMBER() OVER (PARTITION BY id "
            f"ORDER BY dist, c) AS rn FROM d{r}) WHERE rn = 1),"
        )
        parts.append(
            f"m{r} AS (SELECT a.cluster AS c, p.j, "
            f"CAST(ROUND(AVG(p.q)) AS BIGINT) AS q "
            f"FROM a{r} a JOIN pts p ON p.id = a.id GROUP BY a.cluster, p.j),"
        )
        parts.append(
            f"c{r} AS MATERIALIZED (SELECT o.c, o.j, COALESCE(m.q, o.q) AS q "
            f"FROM c{r - 1} o LEFT JOIN m{r} m ON m.c = o.c AND m.j = o.j),"
        )
    parts.append(
        f"fin AS (SELECT id AS vec_id, cluster FROM a{iterations})"
    )
    parts.append(tail or "SELECT vec_id, cluster FROM fin")
    return "\n".join(parts)


@register("gds_kmeans", _kmeans_sql(10, 64, 3))
def gds_kmeans(spark, sf_dir):
    """gds.kmeans over the embeddings table (64-dim float vectors, k=10,
    3 Lloyd rounds). Quantized-integer arithmetic makes the whole
    iteration engine-exact (see operators/gds.kmeans docstring); the
    assignment step is one broadcast join of the k x d centroid frame —
    the O(N*k*d) cost every k-means pays, with no other shuffle wider
    than groupBy(id)."""
    e = load_tables(spark, sf_dir)["embeddings"]
    pts = e.select(
        F.col("vec_id").alias("id"),
        F.posexplode("embedding").alias("j", "v"),
    ).select("id", "j", F.col("v").cast("double").alias("v"))
    out = gds.kmeans(pts, k=10, max_iter=3)
    return out.select(F.col("id").alias("vec_id"), "cluster")


def _node2vec_sql(steps: int, wr: int, wc: int, wf: int, salt: str) -> str:
    """Unrolled node2vec walk — twin of ``operators/gds.node2vec_walk``
    over the distinct undirected projection, nation sources. Per step:
    candidate join, (prev,cand) adjacency left-join for the distance-1
    class, replica fan-out ``range(1, max_w+1)`` filtered to the class
    weight, ``arg_min`` over the replica hash per walk."""
    maxw = max(wr, wc, wf)
    parts = [
        f"WITH eraw AS (SELECT src, dst FROM ({_EDGES})),",
        "esym AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
        "SELECT src, dst FROM eraw UNION ALL SELECT dst, src FROM eraw)),",
        "w0 AS MATERIALIZED (SELECT CAST(2000000000000 + n_nationkey AS BIGINT)"
        " AS walk_id, CAST(NULL AS BIGINT) AS prev,"
        " CAST(2000000000000 + n_nationkey AS BIGINT) AS id FROM nation),",
    ]
    for k in range(1, steps + 1):
        parts.append(
            f"c{k} AS (SELECT w.walk_id, w.id, e.dst, "
            f"CASE WHEN e.dst = w.prev THEN {wr} "
            f"WHEN t.src IS NOT NULL THEN {wc} ELSE {wf} END AS m "
            f"FROM w{k - 1} w JOIN esym e ON e.src = w.id "
            f"LEFT JOIN esym t ON t.src = w.prev AND t.dst = e.dst),"
        )
        parts.append(
            f"w{k} AS MATERIALIZED (SELECT walk_id, MIN(id) AS prev, "
            f"arg_min(dst, md5('{salt}' || '|' || '{k}' || '|' || "
            f"CAST(walk_id AS VARCHAR) || '|' || CAST(id AS VARCHAR) || '|' || "
            f"CAST(dst AS VARCHAR) || '|' || CAST(r.j AS VARCHAR))) AS id "
            f"FROM c{k}, range(1, {maxw + 1}) r(j) WHERE r.j <= m "
            f"GROUP BY walk_id),"
        )
    last = parts.pop().rstrip(",")
    parts.append(last)
    union = " UNION ALL ".join(
        f"SELECT walk_id, CAST({k} AS BIGINT) AS step, id FROM w{k}"
        for k in range(0, steps + 1)
    )
    parts.append(f"SELECT walk_id, step, id FROM ({union})")
    return "\n".join(parts)


@register("gds_node2vec_walk", _node2vec_sql(6, 4, 2, 1, salt="n2v"))
def gds_node2vec_walk(spark, sf_dir):
    """gds.node2vec biased walks (6 steps, undirected, one walk per
    nation; return:in-between:far = 4:2:1, i.e. p=0.5, q=2). The
    replica-minhash draw makes the weighted choice exact AND
    deterministic — see operators/gds.node2vec_walk; the oracle unrolls
    the identical argmin (``_node2vec_sql``)."""
    g = build_graph(spark, sf_dir)
    nations = g.label_frames["Nation"].select("id")
    return gds.node2vec_walk(
        g.rels, nations, steps=6, w_return=4, w_common=2, w_far=1, undirected=True
    )


@register(
    "gds_yens_ksp",
    f"""
    WITH RECURSIVE emin AS MATERIALIZED (
      SELECT src, dst, MIN(w) AS w FROM ({_EDGES}) GROUP BY src, dst),
    seeds AS (SELECT CAST(3000000000000 + c_custkey AS BIGINT) AS id
              FROM customer ORDER BY id LIMIT 5),
    p AS (
      SELECT s.id AS start_id, s.id AS end_id, [s.id] AS nodes,
             CAST(s.id AS VARCHAR) AS path_str, CAST(0 AS BIGINT) AS cost,
             0 AS hops
      FROM seeds s
      UNION ALL
      SELECT p.start_id, e.dst, list_append(p.nodes, e.dst),
             p.path_str || '->' || CAST(e.dst AS VARCHAR), p.cost + e.w,
             p.hops + 1
      FROM p JOIN emin e ON e.src = p.end_id
      WHERE NOT list_contains(p.nodes, e.dst) AND p.hops < 6),
    hits AS (SELECT start_id, end_id, cost, path_str FROM p
             WHERE hops >= 1
               AND end_id IN (SELECT CAST(1000000000000 + r_regionkey AS BIGINT)
                              FROM region)),
    ranked AS (SELECT start_id, end_id, cost, path_str,
                      CAST(ROW_NUMBER() OVER (PARTITION BY start_id, end_id
                                              ORDER BY cost, path_str) AS BIGINT)
                        AS rank
               FROM hits)
    SELECT start_id, end_id, rank, cost, path_str FROM ranked WHERE rank <= 3
    """,
)
def gds_yens_ksp(spark, sf_dir):
    """gds.shortestPath.yens — 3 cheapest loopless paths from the 5
    lowest customers to every reachable Region, weighted by the
    lineitem-quantity edge weights (exact BIGINT costs, min over
    parallel edges). Set-wise Yen: one shared bounded traversal + one
    per-pair top-k window (see operators/paths.k_shortest_paths);
    oracle: recursive-CTE enumeration with the identical ranking."""
    from ..operators import paths as P

    g = build_graph(spark, sf_dir)
    seeds = g.label_frames["Customer"].select("id").orderBy("id").limit(5)
    regions = g.label_frames["Region"].select("id")
    w = (
        F.when(F.col("type").isin("CONTAINS", "SUPPLIED_BY"), F.col("l_quantity"))
        .otherwise(F.lit(1.0))
        .alias("weight")
    )
    edges = g.rels.select("src", "dst", w)
    return P.k_shortest_paths(
        edges, seeds, k=3, max_hops=6, weight_col="weight", targets=regions
    )


def _leiden_sql(louvain_iters: int, refine_rounds: int) -> str:
    """Unrolled Leiden: the Louvain CTE chain (``_louvain_sql``) plus
    ``refine_rounds`` of min-label propagation restricted to
    intra-community edges — twin of ``operators/gds.leiden``. Extra
    rounds past the fixpoint are identity, so a generous fixed unroll
    matches the Spark side's early exit."""
    parts = [
        f"ce AS MATERIALIZED (SELECT e.src, e.dst FROM e "
        f"JOIN c{louvain_iters} x ON x.id = e.src "
        f"JOIN c{louvain_iters} y ON y.id = e.dst "
        f"WHERE x.community = y.community),",
        "r0 AS (SELECT id, id AS lab FROM nodes),",
    ]
    for t in range(1, refine_rounds + 1):
        parts.append(
            f"r{t} AS MATERIALIZED (SELECT r.id, "
            f"LEAST(r.lab, COALESCE(m.c, r.lab)) AS lab FROM r{t - 1} r "
            f"LEFT JOIN (SELECT ce.dst AS id, MIN(p.lab) AS c FROM r{t - 1} p "
            f"JOIN ce ON ce.src = p.id GROUP BY ce.dst) m ON m.id = r.id),"
        )
    last = parts.pop().rstrip(",")
    parts.append(last)
    parts.append(f"SELECT id, lab AS community FROM r{refine_rounds}")
    return _louvain_sql(louvain_iters, tail="\n".join(parts))


@register("gds_leiden", _leiden_sql(5, 12))
def gds_leiden(spark, sf_dir):
    """gds.leiden — Louvain assignment refined to connected communities
    (the Leiden guarantee). Same subgraph and round count as
    gds_louvain; the refinement WCC is min-label over intra-community
    edges only (``operators/gds.leiden``)."""
    g = build_graph(spark, sf_dir)
    edges = g.type_frames["IN_NATION"].unionByName(g.type_frames["IN_REGION"]).select("src", "dst")
    nodes = (
        g.label_frames["Customer"].select("id")
        .unionByName(g.label_frames["Supplier"].select("id"))
        .unionByName(g.label_frames["Nation"].select("id"))
        .unionByName(g.label_frames["Region"].select("id"))
    )
    return gds.leiden(edges, nodes, max_iter=5, refine_iter=12)


@register(
    "gds_link_prediction",
    """
    WITH ps AS (SELECT DISTINCT CAST(5000000000000 + l_partkey AS BIGINT) AS p,
                       CAST(4000000000000 + l_suppkey AS BIGINT) AS s
                FROM lineitem),
    e AS MATERIALIZED (SELECT p AS src, s AS dst FROM ps
                       UNION SELECT s, p FROM ps),
    deg AS MATERIALIZED (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS deg
                         FROM e GROUP BY src),
    cand AS (SELECT DISTINCT p FROM ps ORDER BY p LIMIT 40),
    pairs AS (SELECT x.p AS a, y.p AS b FROM cand x JOIN cand y ON x.p < y.p),
    com AS (
      SELECT pr.a, pr.b, CAST(COUNT(*) AS BIGINT) AS common_neighbors,
             list(1.0e0 / d.deg ORDER BY az.dst) AS ra_terms,
             list(1.0e0 / ln(CAST(d.deg AS DOUBLE)) ORDER BY az.dst) AS aa_terms
      FROM pairs pr
      JOIN e az ON az.src = pr.a
      JOIN e zb ON zb.src = az.dst AND zb.dst = pr.b
      JOIN deg d ON d.id = az.dst
      GROUP BY pr.a, pr.b)
    SELECT pr.a, pr.b,
           COALESCE(c.common_neighbors, 0) AS common_neighbors,
           COALESCE(da.deg, 0) + COALESCE(db.deg, 0)
             - COALESCE(c.common_neighbors, 0) AS total_neighbors,
           COALESCE(da.deg, 0) * COALESCE(db.deg, 0) AS pref_attachment,
           COALESCE(list_reduce(list_prepend(0.0e0, c.ra_terms),
                                (acc, x) -> acc + x), 0.0e0) AS resource_alloc,
           CAST(ROUND(COALESCE(list_reduce(list_prepend(0.0e0, c.aa_terms),
                                           (acc, x) -> acc + x), 0.0e0) * 1e6)
                AS BIGINT) AS adamic_micro
    FROM pairs pr
    LEFT JOIN deg da ON da.id = pr.a
    LEFT JOIN deg db ON db.id = pr.b
    LEFT JOIN com c ON c.a = pr.a AND c.b = pr.b
    """,
)
def gds_link_prediction(spark, sf_dir):
    """gds.alpha.linkprediction.* (commonNeighbors, totalNeighbors,
    preferentialAttachment, resourceAllocation, adamicAdar) scored for
    the 780 lowest part-id pairs of the co-supply bipartite graph.
    Float sums fold over common neighbors in ascending-z order on both
    engines (bit-stable); Adamic-Adar surfaces micro-rounded because
    libm ln may differ in the last ulp across engines."""
    t = load_tables(spark, sf_dir)
    ps = (
        t["lineitem"]
        .select(
            (F.lit(5000000000000) + F.col("l_partkey")).alias("src"),
            (F.lit(4000000000000) + F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    cand = ps.select(F.col("src").alias("p")).distinct().orderBy("p").limit(40)
    pairs = (
        cand.select(F.col("p").alias("a"))
        .join(cand.select(F.col("p").alias("b")), F.col("a") < F.col("b"))
    )
    out = gds.link_prediction(ps, pairs)
    return out.select(
        "a",
        "b",
        "common_neighbors",
        "total_neighbors",
        "pref_attachment",
        "resource_alloc",
        F.round(F.col("adamic_adar") * F.lit(1e6)).cast("long").alias("adamic_micro"),
    )


@register(
    "gds_split_relationships",
    """
    WITH e AS (SELECT CAST(3000000000000 + o_custkey AS BIGINT) AS src,
                      CAST(6000000000000 + o_orderkey AS BIGINT) AS dst
               FROM orders),
    tagged AS (SELECT src, dst,
                      CASE WHEN substr(md5(CAST(src AS VARCHAR) || '|' ||
                                        CAST(dst AS VARCHAR)), 1, 4) < 'cccc'
                           THEN 'train' ELSE 'test' END AS split
               FROM e)
    SELECT split, CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(SUM(src + dst) AS BIGINT) AS checksum
    FROM tagged GROUP BY split
    """,
)
def gds_split_relationships(spark, sf_dir):
    """gds.alpha.ml.splitRelationships — deterministic train/test edge
    split for link-prediction pipelines: an edge goes to 'train' iff
    the first 16 bits of md5(src|dst) fall under 0xcccc (≈80%). Pure
    map-side tag — no shuffle beyond the audit groupBy, no RNG, stable
    under any partitioning; the summary row is an integer checksum."""
    g = build_graph(spark, sf_dir)
    e = g.type_frames["PLACED"].select("src", "dst")
    tagged = e.select(
        "src",
        "dst",
        F.when(
            F.substring(
                F.md5(F.concat_ws("|", F.col("src").cast("string"), F.col("dst").cast("string"))),
                1,
                4,
            )
            < F.lit("cccc"),
            F.lit("train"),
        )
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    return tagged.groupBy("split").agg(
        F.count("*").cast("long").alias("n_edges"),
        F.sum(F.col("src") + F.col("dst")).cast("long").alias("checksum"),
    )


def _lpa_weighted_sql(iterations: int) -> str:
    """Unrolled WEIGHTED label propagation — twin of
    ``operators/gds.label_propagation(weight_col=...)`` on the co-supply
    bipartite multigraph: votes are Σ l_quantity (exact BIGINT), ties →
    smallest label. Parallel edges stay a multiset on both sides."""
    parts = [
        "WITH b AS (SELECT CAST(5000000000000 + l_partkey AS BIGINT) AS s,",
        "         CAST(4000000000000 + l_suppkey AS BIGINT) AS d,",
        "         CAST(l_quantity AS BIGINT) AS w FROM lineitem),",
        "e AS MATERIALIZED (SELECT s AS src, d AS dst, w FROM b"
        " UNION ALL SELECT d, s, w FROM b),",
        "lab0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS community FROM e),",
    ]
    for k in range(1, iterations + 1):
        p = f"lab{k - 1}"
        parts.append(
            f"best{k} AS (SELECT id, community AS cand FROM ("
            f"SELECT e.dst AS id, p.community, SUM(e.w) AS n, "
            f"ROW_NUMBER() OVER (PARTITION BY e.dst "
            f"ORDER BY SUM(e.w) DESC, p.community ASC) AS rn "
            f"FROM {p} p JOIN e ON e.src = p.id GROUP BY e.dst, p.community"
            f") WHERE rn = 1),"
        )
        parts.append(
            f"lab{k} AS MATERIALIZED (SELECT l.id, COALESCE(b.cand, l.community)"
            f" AS community FROM {p} l LEFT JOIN best{k} b USING (id)),"
        )
    last = parts.pop().rstrip(",")
    parts.append(last)
    parts.append(f"SELECT id, community FROM lab{iterations}")
    return "\n".join(parts)


@register("gds_label_propagation_weighted", _lpa_weighted_sql(4))
def gds_label_propagation_weighted(spark, sf_dir):
    """gds.labelPropagation with relationshipWeightProperty: votes sum
    the incident l_quantity weights (exact BIGINT argmax) over the
    part↔supplier co-supply multigraph, 4 synchronous rounds."""
    t = load_tables(spark, sf_dir)
    b = t["lineitem"].select(
        (F.lit(5000000000000) + F.col("l_partkey")).alias("src"),
        (F.lit(4000000000000) + F.col("l_suppkey")).alias("dst"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    nodes = (
        b.select(F.col("src").alias("id"))
        .unionByName(b.select(F.col("dst").alias("id")))
        .distinct()
    )
    return gds.label_propagation(b, nodes, max_iter=4, weight_col="w")


def _sllpa_sql(rounds: int, thr_num: int, thr_den: int, salt: str) -> str:
    """Unrolled Speaker-Listener LPA — twin of ``operators/gds.sllpa``
    on the distinct undirected membership subgraph: per round the
    speaker draw is arg_min over md5(salt|k|src|dst|label|replica) with
    memory counts as replica counts (exact cnt/Σcnt), the listener takes
    the most-heard label (ties → smallest), and memory increments via a
    FULL JOIN. Every quantity is an integer."""
    maxrep = rounds + 1
    parts = [
        "WITH eraw AS (",
        "  SELECT CAST(3000000000000 + c_custkey AS BIGINT) AS src,",
        "         CAST(2000000000000 + c_nationkey AS BIGINT) AS dst FROM customer",
        "  UNION ALL SELECT CAST(4000000000000 + s_suppkey AS BIGINT),",
        "         CAST(2000000000000 + s_nationkey AS BIGINT) FROM supplier",
        "  UNION ALL SELECT CAST(2000000000000 + n_nationkey AS BIGINT),",
        "         CAST(1000000000000 + n_regionkey AS BIGINT) FROM nation),",
        "esym AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
        "SELECT src, dst FROM eraw UNION ALL SELECT dst, src FROM eraw)),",
        "nodes AS MATERIALIZED ("
        "  SELECT CAST(1000000000000 + r_regionkey AS BIGINT) AS id FROM region"
        "  UNION ALL SELECT CAST(2000000000000 + n_nationkey AS BIGINT) FROM nation"
        "  UNION ALL SELECT CAST(3000000000000 + c_custkey AS BIGINT) FROM customer"
        "  UNION ALL SELECT CAST(4000000000000 + s_suppkey AS BIGINT) FROM supplier),",
        "m0 AS MATERIALIZED (SELECT id AS node, id AS label,"
        " CAST(1 AS BIGINT) AS cnt FROM nodes),",
    ]
    for k in range(1, rounds + 1):
        p = f"m{k - 1}"
        parts.append(
            f"sp{k} AS (SELECT src, dst, arg_min(label, h) AS label FROM ("
            f"SELECT e.src, e.dst, m.label, "
            f"md5('{salt}' || '|' || '{k}' || '|' || CAST(e.src AS VARCHAR)"
            f" || '|' || CAST(e.dst AS VARCHAR) || '|' || CAST(m.label AS VARCHAR)"
            f" || '|' || CAST(r.j AS VARCHAR)) AS h "
            f"FROM esym e JOIN {p} m ON m.node = e.src, "
            f"range(1, {maxrep + 1}) r(j) WHERE r.j <= m.cnt"
            f") GROUP BY src, dst),"
        )
        parts.append(
            f"hd{k} AS (SELECT node, label FROM ("
            f"SELECT dst AS node, label, COUNT(*) AS n, "
            f"ROW_NUMBER() OVER (PARTITION BY dst ORDER BY COUNT(*) DESC,"
            f" label ASC) AS rn FROM sp{k} GROUP BY dst, label"
            f") WHERE rn = 1),"
        )
        parts.append(
            f"m{k} AS MATERIALIZED (SELECT COALESCE(m.node, h.node) AS node, "
            f"COALESCE(m.label, h.label) AS label, "
            f"COALESCE(m.cnt, 0) + CASE WHEN h.node IS NULL THEN 0 ELSE 1 END AS cnt "
            f"FROM {p} m FULL JOIN hd{k} h ON h.node = m.node AND h.label = m.label),"
        )
    parts.append(
        f"tot AS (SELECT node, SUM(cnt) AS t FROM m{rounds} GROUP BY node)"
    )
    parts.append(
        f"SELECT m.node AS id, m.label, m.cnt FROM m{rounds} m JOIN tot ON tot.node = m.node "
        f"WHERE m.cnt * {thr_den} >= tot.t * {thr_num}"
    )
    return "\n".join(parts)


@register("gds_sllpa", _sllpa_sql(5, 1, 4, salt="sllpa"))
def gds_sllpa(spark, sf_dir):
    """gds.alpha.sllpa overlapping communities (5 rounds, keep labels
    holding ≥1/4 of a node's memory) on the membership subgraph — the
    replica-minhash speaker draw makes the stochastic algorithm
    deterministic AND exactly weighted (operators/gds.sllpa)."""
    g = build_graph(spark, sf_dir)
    edges = g.type_frames["IN_NATION"].unionByName(g.type_frames["IN_REGION"]).select("src", "dst")
    nodes = (
        g.label_frames["Customer"].select("id")
        .unionByName(g.label_frames["Supplier"].select("id"))
        .unionByName(g.label_frames["Nation"].select("id"))
        .unionByName(g.label_frames["Region"].select("id"))
    )
    return gds.sllpa(edges, nodes, rounds=5, threshold_num=1, threshold_den=4)


@register(
    "gds_node_similarity_metrics",
    """
    WITH ps AS (SELECT DISTINCT CAST(5000000000000 + l_partkey AS BIGINT) AS src,
                       CAST(4000000000000 + l_suppkey AS BIGINT) AS dst
                FROM lineitem),
    sizes AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS sz FROM ps GROUP BY src),
    inter AS (
      SELECT a.src AS node_a, b.src AS node_b, CAST(COUNT(*) AS BIGINT) AS inter
      FROM ps a JOIN ps b ON a.dst = b.dst AND a.src < b.src
      GROUP BY a.src, b.src)
    SELECT i.node_a, i.node_b, i.inter,
           CAST(ROUND(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) * 1e6)
                AS BIGINT) AS jaccard_micro,
           CAST(ROUND(CAST(i.inter AS DOUBLE) / LEAST(sa.sz, sb.sz) * 1e6)
                AS BIGINT) AS overlap_micro,
           CAST(ROUND(CAST(i.inter AS DOUBLE) / SQRT(CAST(sa.sz * sb.sz AS DOUBLE))
                * 1e6) AS BIGINT) AS cosine_micro
    FROM inter i JOIN sizes sa ON sa.src = i.node_a
                 JOIN sizes sb ON sb.src = i.node_b
    """,
)
def gds_node_similarity_metrics(spark, sf_dir):
    """gds.nodeSimilarity similarityMetric = JACCARD | OVERLAP | COSINE
    in one shared bucket-join pass over the part→supplier out-neighbor
    sets (operators/gds.node_similarity_metrics)."""
    t = load_tables(spark, sf_dir)
    ps = (
        t["lineitem"]
        .select(
            (F.lit(5000000000000) + F.col("l_partkey")).alias("src"),
            (F.lit(4000000000000) + F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    return gds.node_similarity_metrics(ps)


@register(
    "gds_collapse_path",
    """
    WITH collapsed AS (
      SELECT DISTINCT CAST(3000000000000 + o.o_custkey AS BIGINT) AS src,
             CAST(5000000000000 + l.l_partkey AS BIGINT) AS dst
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rels,
           CAST(COUNT(DISTINCT src) AS BIGINT) AS n_src,
           CAST(COUNT(DISTINCT dst) AS BIGINT) AS n_dst,
           CAST(SUM(src % 997 + dst % 997) AS BIGINT) AS checksum
    FROM collapsed
    """,
)
def gds_collapse_path(spark, sf_dir):
    """gds.beta.collapsePath: PLACED ∘ CONTAINS contracts to one
    Customer→Part ORDERED relationship set (distinct endpoint pairs, one
    equi-join per hop — operators/gds.collapse_path); summarized as
    integer counts + a modular checksum."""
    g = build_graph(spark, sf_dir)
    col = gds.collapse_path(g, ["PLACED", "CONTAINS"], "ORDERED")
    return col.agg(
        F.count("*").cast("long").alias("n_rels"),
        F.countDistinct("src").cast("long").alias("n_src"),
        F.countDistinct("dst").cast("long").alias("n_dst"),
        F.sum(F.col("src") % 997 + F.col("dst") % 997).cast("long").alias("checksum"),
    )


@register("gds_influence_celf")  # rows-only: k×sims×depth unroll is impractical SQL; pytest holds the exact oracle
def gds_influence_celf(spark, sf_dir):
    """gds.beta.influenceMaximization.celf — greedy IC seed selection
    with deterministic hash-coin cascades (8 sims, p=0.2, k=3) on the
    membership subgraph. Exactness is pytest-graded against a Python
    reimplementation of the identical cascades
    (test_gds.py::test_influence_maximization_matches_bruteforce)."""
    g = build_graph(spark, sf_dir)
    edges = g.type_frames["IN_NATION"].unionByName(g.type_frames["IN_REGION"]).select("src", "dst")
    nodes = (
        g.label_frames["Nation"].select("id")
        .unionByName(g.label_frames["Region"].select("id"))
    )
    return gds.influence_maximization(
        edges, nodes, k=3, p_num=1, p_den=5, n_sims=8, max_depth=4
    )


def _k1coloring_sql(rounds: int) -> str:
    """Unrolled greedy conflict-resolution coloring — twin of
    ``operators/gds.k1coloring`` on the membership subgraph: per round
    the higher-id endpoint of each monochrome edge takes the smallest
    color absent from its neighborhood. Extra rounds past the conflict-
    free fixpoint are identity, so the fixed unroll matches the
    operator's early exit. Integer-only."""
    parts = [
        "WITH b AS (",
        "  SELECT CAST(3000000000000 + c_custkey AS BIGINT) AS s,",
        "         CAST(2000000000000 + c_nationkey AS BIGINT) AS d FROM customer",
        "  UNION ALL SELECT CAST(4000000000000 + s_suppkey AS BIGINT),",
        "         CAST(2000000000000 + s_nationkey AS BIGINT) FROM supplier",
        "  UNION ALL SELECT CAST(2000000000000 + n_nationkey AS BIGINT),",
        "         CAST(1000000000000 + n_regionkey AS BIGINT) FROM nation),",
        "e AS MATERIALIZED (SELECT DISTINCT s AS src, d AS dst FROM ("
        "SELECT s, d FROM b UNION ALL SELECT d, s FROM b)),",
        "nodes AS MATERIALIZED (",
        "  SELECT CAST(1000000000000 + r_regionkey AS BIGINT) AS id FROM region",
        "  UNION ALL SELECT CAST(2000000000000 + n_nationkey AS BIGINT) FROM nation",
        "  UNION ALL SELECT CAST(3000000000000 + c_custkey AS BIGINT) FROM customer",
        "  UNION ALL SELECT CAST(4000000000000 + s_suppkey AS BIGINT) FROM supplier),",
        "c0 AS MATERIALIZED (SELECT id, CAST(0 AS BIGINT) AS color FROM nodes),",
    ]
    for k in range(1, rounds + 1):
        p = f"c{k - 1}"
        parts.append(
            f"cf{k} AS (SELECT DISTINCT e.dst AS id FROM e "
            f"JOIN {p} a ON a.id = e.src JOIN {p} x ON x.id = e.dst "
            f"WHERE a.color = x.color AND e.src < e.dst),"
        )
        parts.append(
            f"nb{k} AS (SELECT e.src AS id, list(DISTINCT n.color) AS used "
            f"FROM e JOIN cf{k} c ON c.id = e.src "
            f"JOIN {p} n ON n.id = e.dst GROUP BY e.src),"
        )
        parts.append(
            f"rc{k} AS (SELECT id, CAST(list_min(list_filter("
            f"generate_series(0, len(used)), c -> NOT list_contains(used, c)))"
            f" AS BIGINT) AS color FROM nb{k}),"
        )
        parts.append(
            f"c{k} AS MATERIALIZED (SELECT c.id, COALESCE(r.color, c.color) AS color "
            f"FROM {p} c LEFT JOIN rc{k} r USING (id)),"
        )
    last = parts.pop().rstrip(",")
    parts.append(last)
    parts.append(f"SELECT id, color FROM c{rounds}")
    return "\n".join(parts)


@register("gds_k1coloring", _k1coloring_sql(12))
def gds_k1coloring(spark, sf_dir):
    """gds.beta.k1coloring on the membership subgraph — deterministic
    id-priority conflict resolution; exact unrolled-CTE oracle
    (``_k1coloring_sql``); properness pytest on an odd cycle."""
    g = build_graph(spark, sf_dir)
    edges = g.type_frames["IN_NATION"].unionByName(g.type_frames["IN_REGION"]).select("src", "dst")
    nodes = (
        g.label_frames["Customer"].select("id")
        .unionByName(g.label_frames["Supplier"].select("id"))
        .unionByName(g.label_frames["Nation"].select("id"))
        .unionByName(g.label_frames["Region"].select("id"))
    )
    return gds.k1coloring(edges, nodes, max_rounds=12)


@register(
    "gds_degree_orientations",
    f"""
    WITH e AS (SELECT src, dst FROM ({_EDGES})),
    outd AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY src),
    ind AS (SELECT dst AS id, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY dst),
    und AS (SELECT id, CAST(SUM(n) AS BIGINT) AS n FROM (
      SELECT src AS id, COUNT(*) AS n FROM e GROUP BY src
      UNION ALL SELECT dst, COUNT(*) FROM e GROUP BY dst) GROUP BY id)
    SELECT n.id,
           COALESCE(outd.n, 0) AS out_degree,
           COALESCE(ind.n, 0) AS in_degree,
           COALESCE(und.n, 0) AS undirected_degree
    FROM ({_NODES}) n
    LEFT JOIN outd ON outd.id = n.id
    LEFT JOIN ind ON ind.id = n.id
    LEFT JOIN und ON und.id = n.id
    """,
)
def gds_degree_orientations(spark, sf_dir):
    """gds.degree with orientation NATURAL / REVERSE / UNDIRECTED in one
    pass: two map-side-combined groupBys over the edge multiset, joined
    onto the node frame (shuffle rows = node count, never edges)."""
    g = build_graph(spark, sf_dir)
    e = g.rels.select("src", "dst")
    outd = e.groupBy(F.col("src").alias("id")).agg(F.count("*").cast("long").alias("out_degree"))
    ind = e.groupBy(F.col("dst").alias("id")).agg(F.count("*").cast("long").alias("in_degree"))
    und = (
        outd.select("id", F.col("out_degree").alias("n"))
        .unionByName(ind.select("id", F.col("in_degree").alias("n")))
        .groupBy("id")
        .agg(F.sum("n").cast("long").alias("undirected_degree"))
    )
    return (
        g.nodes.select("id")
        .join(outd, "id", "left")
        .join(ind, "id", "left")
        .join(und, "id", "left")
        .select(
            "id",
            F.coalesce("out_degree", F.lit(0)).cast("long").alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).cast("long").alias("in_degree"),
            F.coalesce("undirected_degree", F.lit(0)).cast("long").alias("undirected_degree"),
        )
    )


def _hashgnn_sql(n_features: int, n_slots: int, iterations: int, salt: str) -> str:
    """Unrolled HashGNN — twin of ``operators/gds.hashgnn`` on the
    distinct undirected membership subgraph: md5-parity feature init,
    per-iteration neighbor pooling + per-slot min-hash selection,
    zero-padded sorted string output. Integer/hash arithmetic only."""
    even = "'0','2','4','6','8','a','c','e'"
    parts = [
        "WITH b AS (",
        "  SELECT CAST(3000000000000 + c_custkey AS BIGINT) AS s,",
        "         CAST(2000000000000 + c_nationkey AS BIGINT) AS d FROM customer",
        "  UNION ALL SELECT CAST(4000000000000 + s_suppkey AS BIGINT),",
        "         CAST(2000000000000 + s_nationkey AS BIGINT) FROM supplier",
        "  UNION ALL SELECT CAST(2000000000000 + n_nationkey AS BIGINT),",
        "         CAST(1000000000000 + n_regionkey AS BIGINT) FROM nation),",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
        "SELECT s AS src, d AS dst FROM b UNION ALL SELECT d, s FROM b)),",
        "nodes AS MATERIALIZED (",
        "  SELECT CAST(1000000000000 + r_regionkey AS BIGINT) AS id FROM region",
        "  UNION ALL SELECT CAST(2000000000000 + n_nationkey AS BIGINT) FROM nation",
        "  UNION ALL SELECT CAST(3000000000000 + c_custkey AS BIGINT) FROM customer",
        "  UNION ALL SELECT CAST(4000000000000 + s_suppkey AS BIGINT) FROM supplier),",
        f"s0 AS MATERIALIZED (SELECT id, t.j FROM nodes, range({n_features}) t(j) "
        f"WHERE substr(md5('{salt}' || '|init|' || CAST(id AS VARCHAR) || '|' || "
        f"CAST(t.j AS VARCHAR)), 1, 1) IN ({even})),",
    ]
    for t in range(1, iterations + 1):
        p = f"s{t - 1}"
        parts.append(
            f"pool{t} AS (SELECT DISTINCT id, j FROM ("
            f"SELECT id, j FROM {p} "
            f"UNION ALL SELECT e.dst AS id, p.j FROM {p} p JOIN e ON e.src = p.id)),"
        )
        parts.append(
            f"s{t} AS MATERIALIZED (SELECT DISTINCT id, j FROM ("
            f"SELECT id, arg_min(j, md5('{salt}' || '|' || '{t}' || '|' || "
            f"CAST(sl.s AS VARCHAR) || '|' || CAST(j AS VARCHAR))) AS j "
            f"FROM pool{t}, range({n_slots}) sl(s) GROUP BY id, sl.s)),"
        )
    last = parts.pop().rstrip(",")
    parts.append(last)
    parts.append(
        f"SELECT id, string_agg(printf('%02d', j), ',' ORDER BY printf('%02d', j))"
        f" AS emb FROM s{iterations} GROUP BY id"
    )
    return "\n".join(parts)


@register("gds_hashgnn", _hashgnn_sql(16, 8, 2, salt="hashgnn"))
def gds_hashgnn(spark, sf_dir):
    """gds.beta.hashgnn binary embeddings (16 features, 8 slots, 2
    min-hash message-passing rounds) on the membership subgraph —
    training-free, float-free, engine-exact (operators/gds.hashgnn)."""
    g = build_graph(spark, sf_dir)
    edges = g.type_frames["IN_NATION"].unionByName(g.type_frames["IN_REGION"]).select("src", "dst")
    nodes = (
        g.label_frames["Customer"].select("id")
        .unionByName(g.label_frames["Supplier"].select("id"))
        .unionByName(g.label_frames["Nation"].select("id"))
        .unionByName(g.label_frames["Region"].select("id"))
    )
    return gds.hashgnn(edges, nodes, n_features=16, n_slots=8, iterations=2)


@register(
    "gds_bfs_tree",
    f"""
    WITH RECURSIVE e AS MATERIALIZED (SELECT src, dst FROM ({_EDGES})),
    seed AS (SELECT CAST(3000000000000 + MIN(c_custkey) AS BIGINT) AS id FROM customer),
    walk AS (
      SELECT id, 0 AS dist FROM seed
      UNION ALL
      SELECT e.dst, w.dist + 1 FROM walk w JOIN e ON e.src = w.id WHERE w.dist < 6),
    d AS MATERIALIZED (SELECT id, CAST(MIN(dist) AS BIGINT) AS dist FROM walk GROUP BY id)
    SELECT c.id, c.dist,
           (SELECT MIN(e.src) FROM e JOIN d p ON p.id = e.src
            WHERE e.dst = c.id AND p.dist = c.dist - 1) AS parent
    FROM d c
    """,
)
def gds_bfs_tree(spark, sf_dir):
    """BFS shortest-path tree from the lowest customer: (id, dist,
    parent) with the smallest equal-depth predecessor as the
    deterministic parent (operators/gds.bfs_tree — apoc.path.spanningTree
    / gds.bfs predecessor surface)."""
    g = build_graph(spark, sf_dir)
    seed = g.label_frames["Customer"].orderBy("id").limit(1).select("id")
    return gds.bfs_tree(g.rels, seed, max_depth=6)


@register(
    "gds_subgraph_all",
    f"""
    WITH RECURSIVE e AS MATERIALIZED (SELECT src, dst FROM ({_EDGES})),
    seed AS (SELECT CAST(2000000000000 + n_nationkey AS BIGINT) AS id
             FROM nation WHERE n_nationkey < 2),
    walk AS (
      SELECT id, 0 AS dist FROM seed
      UNION ALL
      SELECT e.dst, w.dist + 1 FROM walk w JOIN e ON e.src = w.id WHERE w.dist < 4),
    reach AS MATERIALIZED (SELECT DISTINCT id FROM walk),
    induced AS (SELECT e.src, e.dst FROM e
                JOIN reach a ON a.id = e.src JOIN reach b ON b.id = e.dst)
    SELECT CAST((SELECT COUNT(*) FROM reach) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM induced) AS BIGINT) AS n_rels
    """,
)
def gds_subgraph_all(spark, sf_dir):
    """apoc.path.subgraphAll: the ≤4-hop reachable closure of two seed
    nations plus every edge INDUCED on it (two semi-joins) — node and
    rel counts. BFS + induced-edge filter, no path materialization."""
    from ..operators import gds as G

    g = build_graph(spark, sf_dir)
    seeds = g.label_frames["Nation"].select("id").orderBy("id").limit(2)
    reach = G.bfs(g.rels, seeds, max_depth=4).select("id")
    e = g.rels.select("src", "dst")
    induced = e.join(
        reach.withColumnRenamed("id", "src"), "src", "left_semi"
    ).join(reach.withColumnRenamed("id", "dst"), "dst", "left_semi")
    n_nodes = reach.count()
    return induced.agg(
        F.lit(n_nodes).cast("long").alias("n_nodes"),
        F.count("*").cast("long").alias("n_rels"),
    )


@register(
    "gds_dyad_census",
    f"""
    WITH e AS (SELECT DISTINCT src, dst FROM ({_EDGES}) WHERE src <> dst),
    und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e),
    mut AS (SELECT COUNT(*) AS m FROM e e1
            JOIN e e2 ON e2.src = e1.dst AND e2.dst = e1.src
            WHERE e1.src < e1.dst),
    n AS (SELECT COUNT(*) AS cnt FROM ({_NODES}))
    SELECT CAST((SELECT m FROM mut) AS BIGINT) AS mutual,
           CAST((SELECT COUNT(*) FROM und) - (SELECT m FROM mut) AS BIGINT)
             AS asymmetric,
           CAST((SELECT cnt * (cnt - 1) / 2 FROM n)
                - (SELECT COUNT(*) FROM und) AS BIGINT) AS null_dyads
    """,
)
def gds_dyad_census(spark, sf_dir):
    """Holland–Leinhardt dyad census (M-A-N): mutual / asymmetric /
    null dyad counts over the directed graph — mutual pairs from one
    self-join on reversed endpoints, asymmetric from the undirected
    collapse minus mutuals, nulls in closed form from |V| — no pair
    enumeration beyond existing edges."""
    g = build_graph(spark, sf_dir)
    e = g.rels.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    und = e.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    e2 = e.select(F.col("src").alias("_s2"), F.col("dst").alias("_d2"))
    mutual = (
        e.where(F.col("src") < F.col("dst"))
        .join(e2, (F.col("_s2") == F.col("dst")) & (F.col("_d2") == F.col("src")))
        .count()
    )
    n_nodes = g.nodes.count()
    n_und = und.count()
    return local_df(spark, 
        [
            (
                mutual,
                n_und - mutual,
                n_nodes * (n_nodes - 1) // 2 - n_und,
            )
        ],
        "mutual long, asymmetric long, null_dyads long",
    )


@register(
    "gds_degree_distribution",
    f"""
    WITH e AS (SELECT src, dst FROM ({_EDGES})),
    deg AS (SELECT src AS id, COUNT(*) AS d FROM e GROUP BY src)
    SELECT CAST(d AS BIGINT) AS degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY d ORDER BY degree DESC LIMIT 30
    """,
)
def gds_degree_distribution(spark, sf_dir):
    """Out-degree distribution (the power-law audit every graph report
    opens with): degree → node count, two chained integer groupBys —
    the second is over the tiny distinct-degree set."""
    g = build_graph(spark, sf_dir)
    deg = g.rels.groupBy("src").agg(F.count("*").alias("d"))
    return (
        deg.groupBy("d")
        .agg(F.count("*").cast("long").alias("n_nodes"))
        .select(F.col("d").cast("long").alias("degree"), "n_nodes")
        .orderBy(F.desc("degree"))
        .limit(30)
    )


# Sparse supply graph for biconnectivity: a dense slice (every ~250th part
# with ALL its suppliers — guarantees cycles through shared nations) plus a
# sparse slice (quantity-1 tax-free lineitems — mostly tree-like tendrils),
# closed through supplier→nation edges. At sf0.01: 384 edges, 2 components,
# 192 independent cycles, 56 articulation points, 73 bridges.
_BICONN_PRED = "(l_partkey % 250 = 0 OR (l_quantity = 1 AND l_tax = 0))"
_BICONN_EDGES = f"""
  SELECT DISTINCT CAST(5000000000000 + l_partkey AS BIGINT) AS u,
         CAST(4000000000000 + l_suppkey AS BIGINT) AS v
  FROM lineitem WHERE {_BICONN_PRED}
  UNION
  SELECT DISTINCT CAST(4000000000000 + s_suppkey AS BIGINT),
         CAST(2000000000000 + s_nationkey AS BIGINT)
  FROM supplier WHERE s_suppkey IN (
    SELECT l_suppkey FROM lineitem WHERE {_BICONN_PRED})
"""


def _biconn_edges(spark, sf_dir):
    cond = (F.col("l_partkey") % 250 == 0) | (
        (F.col("l_quantity") == 1) & (F.col("l_tax") == 0)
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(cond)
    ps = li.select(
        (F.lit(5_000_000_000_000) + F.col("l_partkey")).alias("src"),
        (F.lit(4_000_000_000_000) + F.col("l_suppkey")).alias("dst"),
    ).distinct()
    sn = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .join(li.select(F.col("l_suppkey").alias("s_suppkey")).distinct(), "s_suppkey")
        .select(
            (F.lit(4_000_000_000_000) + F.col("s_suppkey")).alias("src"),
            (F.lit(2_000_000_000_000) + F.col("s_nationkey")).alias("dst"),
        )
    )
    return ps.unionByName(sn)


@register(
    "gds_articulation_points",
    f"""
    WITH RECURSIVE ed AS ({_BICONN_EDGES}),
    e AS (SELECT u AS a, v AS b FROM ed UNION SELECT v, u FROM ed),
    start AS (SELECT a AS r, MIN(b) AS s FROM e GROUP BY a),
    flood AS (
      SELECT r, s AS id FROM start
      UNION
      SELECT f.r, e.b FROM flood f JOIN e ON e.a = f.id WHERE e.b <> f.r
    )
    SELECT e.a AS id FROM e
    LEFT JOIN flood f ON f.r = e.a AND f.id = e.b
    GROUP BY e.a
    HAVING COUNT(*) FILTER (WHERE f.id IS NULL) > 0
    ORDER BY id
    """,
)
def gds_articulation_points(spark, sf_dir):
    """gds.articulationPoints over the sparse supply graph — Tarjan–
    Vishkin biconnectivity on a BFS spanning forest (no DFS anywhere; see
    operators/gds.py:biconnected_components). The oracle is the definition
    itself: for every vertex r, flood-fill its component from r's minimum
    neighbor with r removed; r is an articulation point iff some neighbor
    stays unreached — one recursive CTE parameterized by r."""
    return gds.articulation_points(_biconn_edges(spark, sf_dir))


@register(
    "gds_bridges",
    f"""
    WITH RECURSIVE ed AS ({_BICONN_EDGES}),
    e AS (SELECT u AS a, v AS b FROM ed UNION SELECT v, u FROM ed),
    fl AS (
      SELECT ed.u AS bu, ed.v AS bv, ed.u AS id FROM ed
      UNION
      SELECT f.bu, f.bv, e.b FROM fl f JOIN e ON e.a = f.id
      WHERE NOT (e.a = f.bu AND e.b = f.bv) AND NOT (e.a = f.bv AND e.b = f.bu)
    )
    SELECT LEAST(u, v) AS src, GREATEST(u, v) AS dst FROM ed
    WHERE NOT EXISTS (
      SELECT 1 FROM fl WHERE fl.bu = ed.u AND fl.bv = ed.v AND fl.id = ed.v)
    ORDER BY src, dst
    """,
)
def gds_bridges(spark, sf_dir):
    """gds.bridges over the same graph — single-edge biconnected
    components of the Tarjan–Vishkin labeling. Oracle: per-edge
    flood-fill from u avoiding only that edge; bridge iff v unreached."""
    return gds.bridges(_biconn_edges(spark, sf_dir))


@register("gds_steiner_tree")  # rows-only: a Borůvka MST inside a recursive
# CTE is not SQL-expressible; tests/test_steiner.py replays an exact Python
# twin of all five stages and checks the 2·OPT bound against brute force.
def gds_steiner_tree(spark, sf_dir):
    """gds.steinerTree (Mehlhorn 2-approx) over the sparse supply graph
    used by the biconnectivity rows, weight = 1 + (suppkey+partkey) % 7
    (deterministic, arithmetic from the ids). Terminals: every nation
    vertex in the graph. Returns the tree edges (src, dst, weight)."""
    e = _biconn_edges(spark, sf_dir)
    w = (F.lit(1) + (F.col("src") + F.col("dst")) % 7).cast("double").alias("weight")
    edges = e.select("src", "dst", w)
    lo, hi = 2_000_000_000_000, 2_999_999_999_999
    terms = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .where(F.col("id").between(lo, hi))
        .distinct()
    )
    return gds.steiner_tree(edges, terms)


@register(
    "gds_astar_path",
    f"""
    WITH RECURSIVE ed AS ({_BICONN_EDGES}),
    e0 AS (SELECT u AS a, v AS b FROM ed UNION SELECT v, u FROM ed),
    e AS (
      SELECT a, b,
             CAST(CEIL(SQRT(CAST((a % 23 - b % 23) * (a % 23 - b % 23)
                           + (a % 19 - b % 19) * (a % 19 - b % 19) AS DOUBLE)))
                  + 1 + (a + b) % 5 AS DOUBLE) AS wt
      FROM e0
    ),
    src AS (SELECT MIN(a) AS s FROM e0),
    flood AS (
      SELECT s AS id FROM src
      UNION
      SELECT e0.b FROM flood JOIN e0 ON e0.a = flood.id
    ),
    tgt AS (SELECT MAX(id) AS t FROM flood),
    w1 AS (
      SELECT s AS id, CAST(0 AS DOUBLE) AS dist FROM src
      UNION
      SELECT e.b, w1.dist + e.wt FROM w1 JOIN e ON e.a = w1.id
      WHERE w1.dist + e.wt <= 120
    ),
    d AS (SELECT id, MIN(dist) AS dist FROM w1 GROUP BY id),
    par AS (
      SELECT e.b AS id, MIN(e.a) AS parent
      FROM e JOIN d du ON du.id = e.a JOIN d dv ON dv.id = e.b
      WHERE du.dist + e.wt = dv.dist
      GROUP BY e.b
    ),
    pw AS (
      SELECT t AS id, 0 AS k FROM tgt
      UNION ALL
      SELECT par.parent, pw.k + 1 FROM pw
      JOIN par ON par.id = pw.id
      WHERE pw.id <> (SELECT s FROM src)
    )
    SELECT (SELECT dist FROM d WHERE id = (SELECT t FROM tgt)) AS total_cost,
           STRING_AGG(CAST(id AS VARCHAR), ',' ORDER BY k DESC) AS path
    FROM pw
    """,
)
def gds_astar_path(spark, sf_dir):
    """gds.shortestPath.astar over the sparse supply graph with grid
    coordinates derived from the node id (x = id mod 23, y = id mod 19)
    and edge weight ceil(euclid) + 1 + (u+v) mod 5 — by construction
    every weight ≥ the euclidean gap, so the euclidean heuristic is
    admissible and A* is exact. Source = min vertex id, target = max
    reachable id; the oracle replays plain Dijkstra (identical fixpoint:
    A*'s strict pruning provably never drops a label the canonical path
    needs) with the min-parent tie-break and walks the parent table."""
    e0 = _biconn_edges(spark, sf_dir)
    und = e0.select("src", "dst").unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    wt = (
        F.ceil(
            F.sqrt(
                (
                    (F.col("src") % 23 - F.col("dst") % 23)
                    * (F.col("src") % 23 - F.col("dst") % 23)
                    + (F.col("src") % 19 - F.col("dst") % 19)
                    * (F.col("src") % 19 - F.col("dst") % 19)
                ).cast("double")
            )
        )
        + 1
        + (F.col("src") + F.col("dst")) % 5
    ).cast("double")
    edges = und.select("src", "dst", wt.alias("weight"))
    verts = (
        und.select(F.col("src").alias("id")).unionByName(
            und.select(F.col("dst").alias("id"))
        )
    ).distinct()
    coords = verts.select(
        "id",
        (F.col("id") % 23).cast("double").alias("x"),
        (F.col("id") % 19).cast("double").alias("y"),
    )
    source = verts.agg(F.min("id")).first()[0]
    reach = gds.bfs(edges.select("src", "dst"), verts.where(F.col("id") == source))
    target = reach.agg(F.max("id")).first()[0]
    return gds.astar(edges, coords, int(source), int(target))


@register(
    "gds_triangle_listing",
    """
    WITH co AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < b.l_partkey AND a.l_orderkey % 100 = 0
    )
    SELECT ab.u AS a, ab.v AS b, bc.v AS c
    FROM co ab JOIN co bc ON ab.v = bc.u
    JOIN co ac ON ac.u = ab.u AND ac.v = bc.v
    ORDER BY a, b, c
    """,
)
def gds_triangle_listing(spark, sf_dir):
    """gds.alpha.triangles over the sampled part co-occurrence graph
    (orders ≡ 0 mod 100 bound the listing at any sf): every triangle as a
    canonical (a < b < c) row — the enumeration twin of
    gds_triangle_count_copart."""
    li = load_tables(spark, sf_dir)["lineitem"].where(F.col("l_orderkey") % 100 == 0)
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("dst"))
    co = a.join(b, "o").where(F.col("src") < F.col("dst")).select("src", "dst")
    return gds.triangle_list(co).orderBy("a", "b", "c")


def _rwr_sql(walks: int, steps: int, restart: float, salt: str) -> str:
    """Unrolled deterministic RWR sampler — twin of ``gds.rwr_sample``
    over the undirected projection, seed = the minimum customer node.
    Restart when md5(salt|r|k|walk) sorts below the 4-hex-digit bucket
    boundary (string compare, engine-portable); sink walks restart."""
    from ..operators.curation import hex_thr

    thr = hex_thr(restart)
    parts = [
        f"WITH e0 AS MATERIALIZED (SELECT src, dst FROM ({_EDGES})),",
        "e AS MATERIALIZED (SELECT src, dst FROM e0"
        " UNION ALL SELECT dst, src FROM e0),",
        "seed AS (SELECT CAST(3000000000000 + MIN(c_custkey) AS BIGINT) AS s"
        " FROM customer),",
        f"w0 AS MATERIALIZED (SELECT UNNEST(range({walks})) AS walk_id, s AS id"
        " FROM seed),",
    ]
    for k in range(1, steps + 1):
        parts.append(
            f"step{k} AS MATERIALIZED (SELECT c.walk_id, "
            f"arg_min(e.dst, md5('{salt}' || '|' || '{k}' || '|' ||"
            f" CAST(c.id AS VARCHAR) || '|' || CAST(e.dst AS VARCHAR))) AS nxt "
            f"FROM w{k - 1} c JOIN e ON e.src = c.id GROUP BY c.walk_id),"
        )
        parts.append(
            f"w{k} AS MATERIALIZED (SELECT c.walk_id, "
            f"CASE WHEN md5('{salt}|r|{k}|' || CAST(c.walk_id AS VARCHAR))"
            f" < '{thr}' OR s.nxt IS NULL THEN (SELECT s FROM seed)"
            f" ELSE s.nxt END AS id "
            f"FROM w{k - 1} c LEFT JOIN step{k} s USING (walk_id)),"
        )
    last = parts.pop().rstrip(",")
    parts.append(last)
    union = " UNION ALL ".join(
        f"SELECT id FROM w{k}" for k in range(0, steps + 1)
    )
    parts.append(
        f"SELECT id, CAST(COUNT(*) AS BIGINT) AS visits FROM ({union})"
        " GROUP BY id ORDER BY id"
    )
    return "\n".join(parts)


@register("gds_rwr_sample", _rwr_sql(8, 20, 0.15, "rwr"))
def gds_rwr_sample(spark, sf_dir):
    """gds.graph.sample.rwr: 8 deterministic hash-drawn walks of 20 steps
    with 0.15 restart from the minimum customer node — the sampled node
    universe with visit counts."""
    g = build_graph(spark, sf_dir)
    seed = int(_seed(g).agg(F.min("id")).first()[0])
    return gds.rwr_sample(
        g.rels, seed, walks=8, steps=20, restart=0.15, salt="rwr"
    ).orderBy("id")


def _ktruss_sql(k: int, rounds: int) -> str:
    """Unrolled k-truss peel — twin of ``gds.ktruss`` on the sampled
    part co-occurrence graph. The Spark side early-exits at the fixpoint;
    extra unrolled rounds are no-ops once converged (same convention as
    ``_kcore_sql``)."""
    need = k - 2
    parts = [
        "WITH co AS MATERIALIZED (",
        "  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b",
        "  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey",
        "  WHERE a.l_partkey < b.l_partkey AND a.l_orderkey % 100 = 0),",
        "e0 AS MATERIALIZED (SELECT a, b FROM co),",
    ]
    for r in range(1, rounds + 1):
        p = f"e{r - 1}"
        parts.append(
            f"t{r} AS MATERIALIZED (SELECT ab.a AS x, ab.b AS y, bc.b AS z "
            f"FROM {p} ab JOIN {p} bc ON ab.b = bc.a "
            f"JOIN {p} ac ON ac.a = ab.a AND ac.b = bc.b),"
        )
        parts.append(
            f"s{r} AS MATERIALIZED (SELECT a, b FROM ("
            f"SELECT x AS a, y AS b FROM t{r} "
            f"UNION ALL SELECT y, z FROM t{r} "
            f"UNION ALL SELECT x, z FROM t{r}) "
            f"GROUP BY a, b HAVING COUNT(*) >= {need}),"
        )
        parts.append(
            f"e{r} AS MATERIALIZED (SELECT e.a, e.b FROM {p} e "
            f"JOIN s{r} s ON s.a = e.a AND s.b = e.b),"
        )
    last = parts.pop().rstrip(",")
    parts.append(last)
    parts.append(f"SELECT a AS src, b AS dst FROM e{rounds} ORDER BY src, dst")
    return "\n".join(parts)


@register("gds_ktruss_copart", _ktruss_sql(4, 6))
def gds_ktruss_copart(spark, sf_dir):
    """4-truss of the sampled part co-occurrence graph: every surviving
    edge sits in ≥ 2 triangles among surviving edges — the cohesive core
    the plain triangle count can't isolate. Peel fixpoint ≤ 6 rounds
    here (the oracle unrolls 6; converged rounds are no-ops)."""
    li = load_tables(spark, sf_dir)["lineitem"].where(F.col("l_orderkey") % 100 == 0)
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("dst"))
    co = a.join(b, "o").where(F.col("src") < F.col("dst")).select("src", "dst")
    return gds.ktruss(co, k=4, max_rounds=12).orderBy("src", "dst")


@register(
    "gds_apsp_sampled",
    f"""
    WITH RECURSIVE e AS (SELECT src, dst FROM ({_EDGES})),
    seeds AS (SELECT CAST(3000000000000 + c_custkey AS BIGINT) AS s
              FROM customer WHERE c_custkey < 5),
    walk AS (
      SELECT s, s AS id, CAST(0 AS BIGINT) AS dist FROM seeds
      UNION
      SELECT walk.s, e.dst, walk.dist + 1
      FROM walk JOIN e ON e.src = walk.id WHERE walk.dist < 8
    )
    SELECT s AS source, id AS target, MIN(dist) AS dist
    FROM walk GROUP BY s, id ORDER BY source, target
    """,
)
def gds_apsp_sampled(spark, sf_dir):
    """gds.allShortestPaths over a SAMPLED source set (the scale-honest
    APSP contract — full APSP is quadratic output): per-source frontier
    BFS, one (source, target, dist) row per reachable pair. The five
    customer sources run as independent tagged BFS frontiers unioned
    into one result."""
    g = build_graph(spark, sf_dir)
    lo = 3_000_000_000_000
    parts = []
    for k in range(5):
        seed = g.nodes.where(F.col("id") == lo + k).select("id")
        parts.append(
            gds.bfs(g.rels, seed, max_depth=8).select(
                F.lit(lo + k).alias("source"),
                F.col("id").alias("target"),
                "dist",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("source", "target")


@register(
    "gds_dfs_preorder",
    """
    WITH RECURSIVE e AS (
      SELECT CAST(3000000000000 + o_custkey AS BIGINT) AS src,
             CAST(6000000000000 + o_orderkey AS BIGINT) AS dst FROM orders
      UNION ALL SELECT CAST(6000000000000 + l_orderkey AS BIGINT),
             CAST(5000000000000 + l_partkey AS BIGINT) FROM lineitem
    ),
    seed AS (SELECT CAST(3000000000000 + MIN(c_custkey) AS BIGINT) AS id
             FROM customer),
    walk AS (
      SELECT id, [id] AS path FROM seed
      UNION ALL
      SELECT e.dst, list_append(walk.path, e.dst)
      FROM walk JOIN e ON e.src = walk.id
      WHERE NOT list_contains(walk.path, e.dst) AND len(walk.path) < 4
    ),
    best AS (SELECT id, MIN(path) AS path FROM walk GROUP BY id)
    SELECT id,
           array_to_string(path, '->') AS path,
           CAST(ROW_NUMBER() OVER (ORDER BY path) - 1 AS BIGINT) AS pre
    FROM best ORDER BY pre
    """,
)
def gds_dfs_preorder(spark, sf_dir):
    """gds.dfs as a distributed lexicographic-min-path fixpoint
    (operators/gds.py:dfs_preorder): DFS preorder over the
    Customer→Order→Part projection from the lowest customer, ascending
    neighbor order. The oracle enumerates bounded simple paths in a
    recursive CTE and takes the same per-node MIN(path) + rank — path
    multiplicity is real here (two orders sharing a part), so the min
    actually selects."""
    g = build_graph(spark, sf_dir)
    edges = g.rels.where(F.col("type").isin("PLACED", "CONTAINS")).select(
        "src", "dst"
    )
    out = gds.dfs_preorder(edges, _seed(g), max_iter=6)
    return out.select(
        "id",
        F.concat_ws("->", F.transform(F.col("path"), lambda x: x.cast("string"))).alias("path"),
        "pre",
    ).orderBy("pre")
