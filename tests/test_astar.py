"""A* single-pair shortest path vs a plain-Dijkstra twin.

Graphs use grid coordinates with edge weight ceil(euclid)+k (k ≥ 1), so
the euclidean heuristic is admissible and A* must return exactly the
label-correcting Dijkstra fixpoint — same cost AND same canonical path
(min (dist, parent) tie-break).
"""

from __future__ import annotations

import math
import random

from docker_neo4j_spark.operators import gds


def _twin(edges, source, target):
    verts = {x for u, v, _ in edges for x in (u, v)}
    pred: dict[int, list] = {}
    for u, v, w in edges:
        pred.setdefault(v, []).append((u, w))

    def key(c):
        return (c[0], c[1] if c[1] is not None else float("-inf"))

    lab = {source: (0.0, None)}
    changed = True
    while changed:
        changed = False
        for v in verts:
            cands = [(0.0, None)] if v == source else []
            for u, w in pred.get(v, []):
                if u in lab:
                    cands.append((lab[u][0] + w, u))
            if not cands:
                continue
            b = min(cands, key=key)
            if v not in lab or key(b) < key(lab[v]):
                lab[v] = b
                changed = True
    if target not in lab:
        return None
    path = [target]
    cur = target
    while lab[cur][1] is not None:
        cur = lab[cur][1]
        path.append(cur)
    return lab[target][0], ",".join(str(x) for x in reversed(path))


def test_astar_matches_dijkstra_twin(spark):
    rng = random.Random(5)
    for _ in range(3):
        n = rng.randint(8, 20)
        pts = {i: (rng.randint(0, 20), rng.randint(0, 20)) for i in range(n)}
        es = set()
        m = rng.randint(n, 3 * n)
        while len(es) < m:
            u, v = rng.randint(0, n - 1), rng.randint(0, n - 1)
            if u != v:
                es.add((u, v))
        edges = []
        for u, v in sorted(es):
            w = float(math.ceil(math.dist(pts[u], pts[v])) + 1 + (u + v) % 4)
            edges.append((u, v, w))
            edges.append((v, u, w))
        adj: dict[int, set[int]] = {}
        for u, v, _ in edges:
            adj.setdefault(u, set()).add(v)
        reach = {0}
        st = [0]
        while st:
            x = st.pop()
            for y in adj.get(x, ()):
                if y not in reach:
                    reach.add(y)
                    st.append(y)
        tgt = max(reach)
        if tgt == 0:
            continue
        df = spark.createDataFrame(edges, "src long, dst long, weight double")
        cdf = spark.createDataFrame(
            [(i, float(x), float(y)) for i, (x, y) in pts.items()],
            "id long, x double, y double",
        )
        row = gds.astar(df, cdf, 0, tgt).collect()[0]
        assert (row.total_cost, row.path) == _twin(edges, 0, tgt)


def test_astar_unreachable_returns_empty(spark):
    df = spark.createDataFrame([(1, 2, 1.0)], "src long, dst long, weight double")
    cdf = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 1.0, 0.0), (9, 5.0, 5.0)], "id long, x double, y double"
    )
    assert gds.astar(df, cdf, 1, 9).count() == 0
