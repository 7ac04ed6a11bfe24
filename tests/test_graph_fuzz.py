"""Randomized property sweep for the iterative graph operators.

Same idea as the mechanical crash-schedule sweep (test_pipeline.py) and the
extractor-mirror fuzz (test_fuzz_parity.py): enumerate seeded random inputs
that plant every structural hazard — self-loops, parallel edges, cycles,
isolated two-node islands, hub nodes, nodes that only appear as targets —
and require EXACT agreement with an independent pure-Python reference of
each operator's documented contract. Spark-side operators are deterministic
pure functions of the edge set by design (integer arithmetic, total tie
orders), so equality is bit-for-bit, not approximate.

A fixed random.Random seed keeps the sweep deterministic; graphs are kept
small so the whole sweep is a handful of Spark jobs per case, not a
hypothesis shrink loop spinning hundreds.
"""

from __future__ import annotations

import random
from collections import Counter

from docprocai_service_spark.operators.graph import PR_SCALE


def _rand_graph(rng: random.Random) -> list[tuple[str, str]]:
    n = rng.randint(2, 12)
    nodes = [f"n{i}" for i in range(n)]
    m = rng.randint(1, 28)
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(m)]
    # plant hazards deterministically
    edges.append((nodes[0], nodes[0]))  # self-loop
    if len(nodes) >= 4:
        edges.append((nodes[-1], nodes[-2]))  # island-ish tail pair
        edges.append((nodes[0], nodes[1]))
        edges.append((nodes[0], nodes[1]))  # parallel edge
        edges.append((nodes[1], nodes[0]))  # 2-cycle
    return edges


def _py_pagerank(edges, iters, damping=85):
    pairs = sorted(set(edges))
    nodes = sorted({s for s, _ in pairs} | {d for _, d in pairs})
    n = len(nodes)
    outdeg = Counter(s for s, _ in pairs)
    rank = {v: PR_SCALE // n for v in nodes}
    base = ((100 - damping) * PR_SCALE // 100) // n
    for _ in range(iters):
        c = {v: 0 for v in nodes}
        for s, d in pairs:
            c[d] += (rank[s] * damping) // (100 * outdeg[s])
        rank = {v: base + c[v] for v in nodes}
    return rank


def _py_khop_counts(edges, k):
    pairs = {(s, d) for s, d in edges if s != d}
    adj = {}
    for s, d in pairs:
        adj.setdefault(s, set()).add(d)
    out = {}
    for v in adj:
        reach, frontier = set(), {v}
        for _ in range(k):
            frontier = {w for u in frontier for w in adj.get(u, ())} - reach - {v}
            if not frontier:
                break
            reach |= frontier
        if reach:
            out[v] = len(reach)
    return out


def _py_bfs(edges, seeds, max_hops):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    dist = {s: 0 for s in set(seeds)}
    frontier = set(seeds)
    for i in range(1, max_hops + 1):
        nxt = {v for u in frontier for v in adj.get(u, ()) if v not in dist}
        for v in nxt:
            dist[v] = i
        if not nxt:
            break
        frontier = nxt
    return dist


def _py_lpa(edges, iters):
    und = Counter()
    for s, d in edges:
        if s != d:
            und[(min(s, d), max(s, d))] += 1
    adj = {}
    for (x, y), w in und.items():
        adj.setdefault(x, {})[y] = w
        adj.setdefault(y, {})[x] = w
    label = {v: v for v in adj}
    for _ in range(iters):
        nxt = {}
        for v, nbrs in adj.items():
            score = Counter()
            for u, w in nbrs.items():
                score[label[u]] += w
            top = max(score.values())
            nxt[v] = min(l for l, sc in score.items() if sc == top)
        label = nxt
    return label


def test_graph_operators_random_sweep(spark):
    from docprocai_service_spark.operators.graph import (
        bfs_distances,
        khop_reach_counts,
        label_propagation,
        pagerank_fixed,
    )

    rng = random.Random(20260817)
    for case in range(6):
        edges_py = _rand_graph(rng)
        edges = spark.createDataFrame(edges_py, "src string, dst string")
        nodes = sorted({s for s, _ in edges_py} | {d for _, d in edges_py})

        iters = rng.randint(1, 4)
        got_pr = {r.id: r.rank for r in pagerank_fixed(edges, iters=iters).collect()}
        assert got_pr == _py_pagerank(edges_py, iters), (case, "pagerank", iters)

        k = rng.randint(1, 3)
        got_kh = {r.id: r.n_reach for r in khop_reach_counts(edges, k=k).collect()}
        assert got_kh == _py_khop_counts(edges_py, k), (case, "khop", k)

        seeds = rng.sample(nodes, min(2, len(nodes)))
        hops = rng.randint(0, 3)
        got_bf = {r.id: r.dist for r in bfs_distances(edges, seeds, hops).collect()}
        assert got_bf == _py_bfs(edges_py, seeds, hops), (case, "bfs", seeds, hops)

        li = rng.randint(1, 3)
        got_lp = {r.id: r.label for r in label_propagation(edges, iters=li).collect()}
        assert got_lp == _py_lpa(edges_py, li), (case, "lpa", li)
