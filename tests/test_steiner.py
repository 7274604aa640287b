"""gds.steinerTree (Mehlhorn 2-approx) vs an exact Python twin + OPT bound.

The twin replays the five stages with the same deterministic tie-breaks
(Voronoi label = least (dist, term, parent); terminal-edge proposals by
least (tw, src, dst); Kruskal under the (w, src, dst) total order — with a
globally consistent tie-break Borůvka and Kruskal produce the same unique
MST of the perturbed-distinct weights). Optimal Steiner weight for the
bound check is min over Steiner-vertex subsets of MST(G[T ∪ X]) — exact
on the small random graphs used here.
"""

from __future__ import annotations

import itertools
import random

from docker_neo4j_spark.operators import gds

INF = float("inf")


def _twin(edges, terms):
    adj: dict[int, dict[int, float]] = {}
    for u, v, w in edges:
        if u == v:
            continue
        for a, b in ((u, v), (v, u)):
            cur = adj.setdefault(a, {})
            cur[b] = min(cur.get(b, INF), w)
    verts = set(adj) | set(terms)
    tset = set(terms)

    def key(c):
        return (c[0], c[1], c[2] if c[2] is not None else float("-inf"))

    lab: dict[int, tuple | None] = {v: None for v in verts}
    for t in terms:
        lab[t] = (0.0, t, None, 0.0)
    while True:
        new = {}
        for v in verts:
            cands = [(0.0, v, None, 0.0)] if v in tset else []
            for u, w in adj.get(v, {}).items():
                lu = lab.get(u)
                if lu is not None:
                    cands.append((lu[0] + w, lu[1], u, w))
            new[v] = min(cands, key=key) if cands else None
        if new == lab:
            break
        lab = new

    best: dict[tuple, tuple] = {}
    for u in adj:
        for v, w in adj[u].items():
            lu, lv = lab.get(u), lab.get(v)
            if lu is None or lv is None or lu[1] == lv[1]:
                continue
            ta, tb = min(lu[1], lv[1]), max(lu[1], lv[1])
            cand = (lu[0] + w + lv[0], u, v, w)
            if (ta, tb) not in best or cand[:3] < best[(ta, tb)][:3]:
                best[(ta, tb)] = cand

    parent = {t: t for t in terms}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    mst = []
    for (ta, tb), (tw, u, v, w) in sorted(
        best.items(), key=lambda kv: (kv[1][0], kv[0][0], kv[0][1])
    ):
        ra, rb = find(ta), find(tb)
        if ra != rb:
            parent[ra] = rb
            mst.append((tw, u, v, w))

    tree: dict[tuple, float] = {}
    for tw, u, v, w in mst:
        a, b = min(u, v), max(u, v)
        tree[(a, b)] = min(tree.get((a, b), INF), w)
        for x in (u, v):
            cur = x
            while lab[cur][2] is not None:
                p, pw = lab[cur][2], lab[cur][3]
                a, b = min(cur, p), max(cur, p)
                tree[(a, b)] = min(tree.get((a, b), INF), pw)
                cur = p

    while True:
        deg: dict[int, int] = {}
        for a, b in tree:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        drop = {v for v, d in deg.items() if d == 1 and v not in tset}
        if not drop:
            break
        tree = {e: w for e, w in tree.items() if e[0] not in drop and e[1] not in drop}
    return tree


def _optimal(edges, terms):
    verts = sorted({x for u, v, _ in edges for x in (u, v)} | set(terms))
    extra = [v for v in verts if v not in terms]
    bestw = INF
    for r in range(len(extra) + 1):
        for X in itertools.combinations(extra, r):
            S = set(terms) | set(X)
            es = sorted((w, u, v) for u, v, w in edges if u in S and v in S and u != v)
            par = {v: v for v in S}

            def find(x):
                while par[x] != x:
                    par[x] = par[par[x]]
                    x = par[x]
                return x

            tot = 0.0
            for w, u, v in es:
                ru, rv = find(u), find(v)
                if ru != rv:
                    par[ru] = rv
                    tot += w
            if len({find(t) for t in terms}) == 1 and tot < bestw:
                bestw = tot
    return bestw


def _run(spark, edges, terms):
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    tdf = spark.createDataFrame([(t,) for t in terms], "id long")
    return {(r.src, r.dst): r.weight for r in gds.steiner_tree(df, tdf).collect()}


def test_star_beats_pairwise_paths(spark):
    """Classic: cheap hub vertex 0 connecting three terminals — the tree
    must route through the non-terminal hub."""
    edges = [(0, 1, 1.0), (0, 2, 1.0), (0, 3, 1.0), (1, 2, 2.5), (2, 3, 2.5)]
    got = _run(spark, edges, [1, 2, 3])
    assert got == {(0, 1): 1.0, (0, 2): 1.0, (0, 3): 1.0}


def test_two_terminals_is_shortest_path(spark):
    edges = [(1, 2, 1.0), (2, 3, 1.0), (1, 3, 3.0)]
    got = _run(spark, edges, [1, 3])
    assert got == {(1, 2): 1.0, (2, 3): 1.0}


def test_single_terminal_empty_tree(spark):
    edges = [(1, 2, 1.0), (2, 3, 1.0)]
    assert _run(spark, edges, [2]) == {}


def test_random_graphs_match_twin_and_bound(spark):
    rng = random.Random(11)
    for _ in range(3):
        n = rng.randint(6, 12)
        m = rng.randint(n, 2 * n)
        es: dict[tuple, float] = {}
        while len(es) < m:
            u, v = rng.randint(0, n), rng.randint(0, n)
            if u != v:
                es[(min(u, v), max(u, v))] = float(rng.randint(1, 9))
        edges = [(u, v, w) for (u, v), w in sorted(es.items())]
        adj: dict[int, set[int]] = {}
        for u, v, _ in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        s = min(adj)
        comp = {s}
        st = [s]
        while st:
            x = st.pop()
            for y in adj[x]:
                if y not in comp:
                    comp.add(y)
                    st.append(y)
        terms = sorted(comp)[: min(4, len(comp))]
        got = _run(spark, edges, terms)
        assert got == _twin(edges, terms)
        assert sum(got.values()) <= 2 * _optimal(edges, terms) + 1e-9
        # terminals all connected inside the returned tree
        tadj: dict[int, set[int]] = {}
        for a, b in got:
            tadj.setdefault(a, set()).add(b)
            tadj.setdefault(b, set()).add(a)
        if len(terms) > 1:
            seen = {terms[0]}
            st = [terms[0]]
            while st:
                x = st.pop()
                for y in tadj.get(x, ()):
                    if y not in seen:
                        seen.add(y)
                        st.append(y)
            assert set(terms) <= seen
