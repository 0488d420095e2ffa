"""Sequential NumPy test oracles — the reference's own verification
methodology (SURVEY.md §5): the closed-form ``trace(A³)/6`` check every
CPU main prints (``sequential_node_it/seq_node_it_v1.cpp:144-160``),
plus brute-force enumeration for tiny graphs."""

from __future__ import annotations

from itertools import combinations

import numpy as np


def relabel(edges: list[tuple[int, int]]) -> tuple[np.ndarray, int]:
    """Dense 0..n-1 relabeling of arbitrary vertex ids."""
    ids = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(ids)}
    arr = np.array([(idx[u], idx[v]) for u, v in edges], dtype=np.int64)
    return arr, len(ids)


def triangle_count_trace(edges: list[tuple[int, int]]) -> int:
    """trace(A³)/6 on the dense adjacency matrix (oracle ≤ ~5k vertices)."""
    if not edges:
        return 0
    arr, n = relabel(edges)
    a = np.zeros((n, n), dtype=np.int64)
    a[arr[:, 0], arr[:, 1]] = 1
    a[arr[:, 1], arr[:, 0]] = 1
    return int(np.trace(a @ a @ a) // 6)


def triangle_count_brute(edges: list[tuple[int, int]]) -> int:
    """Enumerate vertex triples (oracle ≤ ~60 vertices)."""
    es = {tuple(sorted(e)) for e in edges}
    vs = sorted({v for e in edges for v in e})
    return sum(
        1
        for a, b, c in combinations(vs, 3)
        if (a, b) in es and (b, c) in es and (a, c) in es
    )


def triangles_per_vertex_oracle(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Per-vertex triangle participation: diag(A³)/2."""
    if not edges:
        return {}
    ids = sorted({v for e in edges for v in e})
    arr, n = relabel(edges)
    a = np.zeros((n, n), dtype=np.int64)
    a[arr[:, 0], arr[:, 1]] = 1
    a[arr[:, 1], arr[:, 0]] = 1
    d = np.diag(a @ a @ a) // 2
    return {v: int(d[i]) for i, v in enumerate(ids)}


def pagerank_oracle(
    edges: list[tuple[int, int]],
    damping: float = 0.85,
    iterations: int = 20,
) -> dict[int, float]:
    """Synchronous power iteration on the undirected graph, matching the
    engine's semantics: uniform init 1/n, dangling mass NOT redistributed
    (undirected graphs have no dangling vertices once degree ≥ 1)."""
    ids = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    deg = np.zeros(n)
    for u, v in edges:
        deg[idx[u]] += 1
        deg[idx[v]] += 1
    pr = np.full(n, 1.0 / n)
    for _ in range(iterations):
        contrib = pr / deg
        nxt = np.zeros(n)
        for u, v in edges:
            nxt[idx[u]] += contrib[idx[v]]
            nxt[idx[v]] += contrib[idx[u]]
        pr = (1 - damping) / n + damping * nxt
    return {v: float(pr[idx[v]]) for v in ids}


def weighted_pagerank_oracle(
    wedges: list[tuple[int, int, int]],
    damping: float = 0.85,
    iterations: int = 20,
) -> dict[int, float]:
    """Weighted synchronous power iteration: contributions proportional
    to edge weight over the sender's strength (weighted degree)."""
    ids = sorted({v for (u, v, _) in wedges} | {u for (u, v, _) in wedges})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    strength = np.zeros(n)
    for u, v, w in wedges:
        strength[idx[u]] += w
        strength[idx[v]] += w
    pr = np.full(n, 1.0 / n)
    for _ in range(iterations):
        contrib = pr / strength
        nxt = np.zeros(n)
        for u, v, w in wedges:
            nxt[idx[u]] += contrib[idx[v]] * w
            nxt[idx[v]] += contrib[idx[u]] * w
        pr = (1 - damping) / n + damping * nxt
    return {v: float(pr[idx[v]]) for v in ids}


def label_propagation_oracle(
    edges: list[tuple[int, int]], iterations: int = 5
) -> dict[int, int]:
    """Synchronous LPA, most-frequent neighbor label, ties -> min label."""
    from collections import Counter, defaultdict

    nbrs: dict[int, list[int]] = defaultdict(list)
    for u, v in edges:
        nbrs[u].append(v)
        nbrs[v].append(u)
    labels = {v: v for v in nbrs}
    for _ in range(iterations):
        nxt = {}
        for v in nbrs:
            c = Counter(labels[w] for w in nbrs[v])
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[v] = best[0]
        if nxt == labels:
            break
        labels = nxt
    return labels


def components_oracle(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find; component id = min vertex id in the component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {v: find(v) for v in parent}


def personalized_pagerank_oracle(
    edges: list[tuple[int, int]],
    seeds: list[int],
    damping: float = 0.85,
    iterations: int = 20,
) -> dict[int, float]:
    """Seed-biased power iteration matching the engine: reset = 1/|S| on
    seeds (0 elsewhere), init = reset, rank' = (1-d)·reset + d·Σ.
    Seeds absent from the edge set are kept: they hold (1-d)/|S| after
    the first iteration (their damped share leaks — dangling teleport
    vertices), receive nothing, and send nothing."""
    ids = sorted({v for e in edges for v in e} | set(seeds))
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    deg = np.zeros(n)
    for u, v in edges:
        deg[idx[u]] += 1
        deg[idx[v]] += 1
    reset = np.zeros(n)
    for s in seeds:
        reset[idx[s]] = 1.0 / len(seeds)
    pr = reset.copy()
    for _ in range(iterations):
        contrib = np.divide(pr, deg, out=np.zeros(n), where=deg > 0)
        nxt = np.zeros(n)
        for u, v in edges:
            nxt[idx[u]] += contrib[idx[v]]
            nxt[idx[v]] += contrib[idx[u]]
        pr = (1 - damping) * reset + damping * nxt
    return {v: float(pr[idx[v]]) for v in ids}


def k_core_oracle(edges: list[tuple[int, int]], k: int) -> set[int]:
    """Sequential peeling (deletion order is irrelevant — the k-core is
    unique), independent of the engine's synchronous formulation."""
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < k:
                for w in adj.pop(v):
                    adj[w].discard(v)
                changed = True
    return set(adj)


def k4_count_brute(edges: list[tuple[int, int]]) -> int:
    """Per-edge common-neighborhood pair check — independent of the
    engine's rank-ordered generator."""
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    count = 0
    seen = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    for u, v in seen:
        common = sorted(adj[u] & adj[v])
        for i, c in enumerate(common):
            for d in common[i + 1 :]:
                if d in adj[c]:
                    count += 1
    return count // 6  # each K4 has 6 edges, each generating it once


def kclique_count_brute(edges: list[tuple[int, int]], k: int) -> int:
    """Recursive ordered enumeration over id-sorted adjacency —
    independent of the engine's rank-ordered generator."""
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)

    def count(cand: set[int], depth: int) -> int:
        if depth == k:
            return 1
        if len(cand) < k - depth:
            return 0
        return sum(
            count(cand & {w for w in adj[c] if w > c}, depth + 1)
            for c in cand
        )

    return sum(
        count({w for w in adj[v] if w > v}, 1) for v in sorted(adj)
    )
