"""Property tests: the BSP graph algorithms against brute-force Python
oracles on hypothesis-generated small graphs — the guard for the
iterative kernels the SQL oracles exercise on only one fixture shape."""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from docker_neo4j_spark.operators import gds

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _edge_sets(max_nodes=6):
    """Random directed graphs as edge sets over node ids 1..max_nodes."""
    pairs = [(a, b) for a in range(1, max_nodes + 1) for b in range(1, max_nodes + 1) if a != b]
    return st.sets(st.sampled_from(pairs), min_size=1, max_size=10)


def _py_scc(nodes, edges):
    """Brute-force SCC: mutual reachability closure, component = min id."""
    reach = {n: {n} for n in nodes}
    changed = True
    while changed:
        changed = False
        for a, b in edges:
            new = reach[b] - reach[a]
            if new:
                reach[a] |= new
                changed = True
    comp = {}
    for v in nodes:
        members = {u for u in nodes if u in reach[v] and v in reach[u]}
        comp[v] = min(members)
    return comp


@given(edges=_edge_sets())
@settings(**_SETTINGS)
def test_scc_matches_bruteforce(spark, edges):
    nodes = sorted({x for e in edges for x in e})
    e = spark.createDataFrame(sorted(edges), ["src", "dst"])
    n = spark.createDataFrame([(i,) for i in nodes], ["id"])
    got = {r["id"]: r["component"] for r in gds.scc(e, n, max_peels=8).collect()}
    assert got == _py_scc(nodes, edges)


def _py_msf_weight(nodes, wedges):
    """Kruskal under the same (w, src, dst) total order as the operator."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    total = 0.0
    picked = 0
    for w, a, b in sorted((w, a, b) for (a, b), w in wedges.items()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            total += w
            picked += 1
    return total, picked


@given(edges=_edge_sets())
@settings(**_SETTINGS)
def test_spanning_forest_matches_kruskal(spark, edges):
    # unique weights derived from the edge itself -> the MSF is unique,
    # so Boruvka and Kruskal must agree on total weight AND edge count
    nodes = sorted({x for e in edges for x in e})
    wedges = {(a, b): float(a * 10 + b) for a, b in sorted(edges)}
    e = spark.createDataFrame(
        [(a, b, w) for (a, b), w in wedges.items()], ["src", "dst", "weight"]
    )
    n = spark.createDataFrame([(i,) for i in nodes], ["id"])
    rows = gds.spanning_forest(e, n).collect()
    exp_total, exp_count = _py_msf_weight(nodes, wedges)
    # undirected semantics: a Kruskal union over the same edges
    assert len(rows) == exp_count
    assert abs(sum(r["weight"] for r in rows) - exp_total) < 1e-9


@given(edges=_edge_sets(max_nodes=5))
@settings(**_SETTINGS)
def test_topological_layers_matches_longest_path_on_dags(spark, edges):
    # keep only forward edges (a < b) -> guaranteed DAG
    dag = {(a, b) for a, b in edges if a < b}
    if not dag:
        return
    nodes = sorted({x for e in dag for x in e})
    # brute-force longest path ending at v
    best = {v: 0 for v in nodes}
    for _ in nodes:
        for a, b in dag:
            best[b] = max(best[b], best[a] + 1)
    e = spark.createDataFrame(sorted(dag), ["src", "dst"])
    n = spark.createDataFrame([(i,) for i in nodes], ["id"])
    got = {r["id"]: r["layer"] for r in gds.topological_layers(e, n).collect()}
    assert got == best


@given(edges=_edge_sets())
@settings(**_SETTINGS)
def test_k1coloring_always_proper(spark, edges):
    """On any random graph the conflict-resolution coloring terminates
    PROPER: no undirected edge is monochrome."""
    nodes = sorted({x for e in edges for x in e})
    e = spark.createDataFrame(sorted(edges), ["src", "dst"])
    n = spark.createDataFrame([(i,) for i in nodes], ["id"])
    got = {r["id"]: r["color"] for r in gds.k1coloring(e, n, max_rounds=20).collect()}
    assert set(got) == set(nodes)
    for a, b in edges:
        if a != b:
            assert got[a] != got[b], f"monochrome edge {a}-{b} in {edges}"


@given(edges=_edge_sets())
@settings(**_SETTINGS)
def test_leiden_communities_always_connected(spark, edges):
    """The Leiden guarantee holds on any random graph: every returned
    community induces a connected subgraph of the undirected view."""
    from collections import deque

    nodes = sorted({x for e in edges for x in e})
    e = spark.createDataFrame(sorted(edges), ["src", "dst"])
    n = spark.createDataFrame([(i,) for i in nodes], ["id"])
    got = {r["id"]: r["community"] for r in gds.leiden(e, n, max_iter=6).collect()}
    assert set(got) == set(nodes)
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    comms = {}
    for v, c in got.items():
        comms.setdefault(c, set()).add(v)
    for members in comms.values():
        start = next(iter(members))
        seen, q = {start}, deque([start])
        while q:
            u = q.popleft()
            for v in adj.get(u, ()):
                if v in members and v not in seen:
                    seen.add(v)
                    q.append(v)
        assert seen == members, f"disconnected community {members} in {edges}"
