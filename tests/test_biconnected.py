"""Biconnectivity (articulation points / bridges) vs a brute-force twin.

The twin is the definition: remove a vertex (edge) and flood-fill — if a
neighbor (the far endpoint) becomes unreachable, it was an articulation
point (bridge). The Spark side is Tarjan–Vishkin on a BFS forest
(operators/gds.py:biconnected_components), so agreement on cycle-rich,
tree-like, and disconnected graphs exercises every aux-graph rule.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from docker_neo4j_spark.operators import gds


def _brute(edges):
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    aps = set()
    for v, nb in adj.items():
        if len(nb) < 2:
            continue
        start = min(nb)
        vis = {start}
        stack = [start]
        while stack:
            x = stack.pop()
            for y in adj[x]:
                if y != v and y not in vis:
                    vis.add(y)
                    stack.append(y)
        if any(n not in vis for n in nb):
            aps.add(v)
    brs = set()
    for u, v in edges:
        vis = {u}
        stack = [u]
        found = False
        while stack and not found:
            x = stack.pop()
            for y in adj[x]:
                if x == u and y == v:
                    continue
                if y == v:
                    found = True
                    break
                if y not in vis:
                    vis.add(y)
                    stack.append(y)
        if not found:
            brs.add((min(u, v), max(u, v)))
    return aps, brs


CASES = {
    "path": [(1, 2), (2, 3), (3, 4)],
    "cycle": [(1, 2), (2, 3), (3, 4), (4, 1)],
    "barbell": [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4)],
    "star": [(0, i) for i in range(1, 6)],
    "two_components": [(1, 2), (2, 3), (3, 1), (10, 11)],
    "blocks_chained_by_bridges": [
        (1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4), (6, 7),
    ],
    "single_edge": [(5, 9)],
    "theta": [(1, 2), (2, 3), (1, 4), (4, 3), (1, 5), (5, 3)],
    "cut_vertex_between_cycles": [
        (1, 2), (2, 3), (3, 1), (1, 4), (4, 5), (5, 1),
    ],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_handcrafted(spark, name):
    edges = CASES[name]
    df = spark.createDataFrame(
        [(int(u), int(v)) for u, v in edges], "src long, dst long"
    )
    exp_ap, exp_br = _brute(edges)
    got_ap = {r.id for r in gds.articulation_points(df).collect()}
    got_br = {(r.src, r.dst) for r in gds.bridges(df).collect()}
    assert got_ap == exp_ap
    assert got_br == exp_br


def test_random_graphs(spark):
    rng = random.Random(7)
    for _ in range(4):
        n = rng.randint(8, 40)
        m = rng.randint(n // 2, 2 * n)
        es = set()
        while len(es) < m:
            u, v = rng.randint(0, n), rng.randint(0, n)
            if u != v:
                es.add((min(u, v), max(u, v)))
        edges = sorted(es)
        df = spark.createDataFrame(edges, "src long, dst long")
        exp_ap, exp_br = _brute(edges)
        got_ap = {r.id for r in gds.articulation_points(df).collect()}
        got_br = {(r.src, r.dst) for r in gds.bridges(df).collect()}
        assert got_ap == exp_ap, edges
        assert got_br == exp_br, edges


def test_reversed_duplicated_input_edges(spark):
    """Direction and multiplicity must not matter: the operator canonical-
    izes to a simple undirected graph first."""
    edges = [(2, 1), (2, 3), (3, 1), (1, 2), (3, 4), (4, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    assert {r.id for r in gds.articulation_points(df).collect()} == {3}
    assert {(r.src, r.dst) for r in gds.bridges(df).collect()} == {(3, 4)}


def test_bcc_labels_partition_edges(spark):
    """Every input edge gets exactly one block label; blocks with ≥2 edges
    are 2-edge-connected (no bridges inside)."""
    edges = CASES["blocks_chained_by_bridges"]
    df = spark.createDataFrame(edges, "src long, dst long")
    lab = gds.biconnected_components(df)
    rows = lab.collect()
    assert len(rows) == len(edges)
    assert {(r.src, r.dst) for r in rows} == {(min(u, v), max(u, v)) for u, v in edges}
    by_bcc: dict[int, int] = {}
    for r in rows:
        by_bcc[r.bcc] = by_bcc.get(r.bcc, 0) + 1
    # two triangles (3 edges each) + two bridges (1 edge each)
    assert sorted(by_bcc.values()) == [1, 1, 3, 3]
