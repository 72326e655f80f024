"""Pure python/numpy reference implementations mirroring the reference
semantics (SURVEY.md §2.6) — deliberately naive and independent of the engine."""

from __future__ import annotations

import numpy as np


def pagerank_fixed(src, dst, nv, iterations, reset=0.15):
    """Unnormalized GAS PageRank, K synchronous iterations (pagerank.cpp:92-103)."""
    out_deg = np.bincount(src, minlength=nv)
    r = np.ones(nv)
    for _ in range(iterations):
        contrib = r[src] / np.maximum(out_deg[src], 1)
        total = np.bincount(dst, weights=contrib, minlength=nv)
        r = (1 - reset) * total + reset
    return r


def pagerank_dynamic(src, dst, nv, tol, reset=0.15, max_iter=500):
    """Frontier/tolerance mode (pagerank.cpp:107-133): active vertices apply;
    |Δ|>tol sources signal out-targets → next active set."""
    out_deg = np.bincount(src, minlength=nv)
    r = np.ones(nv)
    active = np.ones(nv, bool)
    for _ in range(max_iter):
        contrib = r[src] / np.maximum(out_deg[src], 1)
        total = np.bincount(dst, weights=contrib, minlength=nv)
        newval = np.where(active, (1 - reset) * total + reset, r)
        delta = newval - r
        r = newval
        sig = np.abs(delta) > tol
        if not sig.any():
            break
        active = np.zeros(nv, bool)
        active[dst[sig[src]]] = True
    return r


def connected_components(src, dst, nv):
    """Min-id to fixed point over the undirected structure
    (connected_component.cpp:51-134). Returns dense labels (min dense id)."""
    label = np.arange(nv, dtype=np.int64)
    while True:
        msg = label.copy()
        np.minimum.at(msg, dst, label[src])
        np.minimum.at(msg, src, label[dst])
        if (msg == label).all():
            return label
        label = msg


def lpa(src, dst, init_codes, num_labels, max_iter, frontier=True):
    """Synchronous community LPA with (count DESC, label ASC) winner
    (label_propagation.cpp:101-125) and changed→neighbors frontier."""
    nv = len(init_codes)
    labels = init_codes.astype(np.int64).copy()
    changed = np.ones(nv, bool)
    for it in range(max_iter):
        if it == 0 or not frontier:
            act = np.ones(nv, bool)
        else:
            act = np.zeros(nv, bool)
            act[dst[changed[src]]] = True
            act[src[changed[dst]]] = True
        new = labels.copy()
        for v in np.nonzero(act)[0]:
            nbrs = np.concatenate([dst[src == v], src[dst == v]])
            if len(nbrs) == 0:
                continue
            counts = {}
            for u in nbrs:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            best, best_c = labels[v], 0
            for lab in sorted(counts):
                if counts[lab] > best_c:
                    best, best_c = lab, counts[lab]
            new[v] = best
        changed = new != labels
        labels = new
        if not changed.any():
            break
    return labels


def triangle_total(src, dst, nv):
    """Exact undirected triangle count via networkx (dedup + no self edges
    assumed, undirected_triangle_count.cpp contract)."""
    import networkx as nx

    g = nx.Graph()
    g.add_nodes_from(range(nv))
    g.add_edges_from(zip(src.tolist(), dst.tolist()))
    return sum(nx.triangles(g).values()) // 3


def triangles_per_vertex(src, dst, nv):
    import networkx as nx

    g = nx.Graph()
    g.add_nodes_from(range(nv))
    g.add_edges_from(zip(src.tolist(), dst.tolist()))
    t = nx.triangles(g)
    return np.array([t[v] for v in range(nv)], dtype=np.int64)


def sssp(src, dst, nv, source, directed=False):
    import networkx as nx

    g = nx.DiGraph() if directed else nx.Graph()
    g.add_nodes_from(range(nv))
    g.add_edges_from(zip(src.tolist(), dst.tolist()))
    dist = nx.single_source_shortest_path_length(g, source)
    out = np.full(nv, np.inf)
    for v, d in dist.items():
        out[v] = d
    return out


def sssp_weighted(src, dst, w, nv, source, directed=False):
    """Dijkstra with per-edge weights (networkx) — the weighted SSSP oracle."""
    import networkx as nx

    g = nx.DiGraph() if directed else nx.Graph()
    g.add_nodes_from(range(nv))
    g.add_weighted_edges_from(zip(src.tolist(), dst.tolist(), w.tolist()))
    dist = nx.single_source_dijkstra_path_length(g, source)
    out = np.full(nv, np.inf)
    for v, d in dist.items():
        out[v] = d
    return out


# the reference's own 5-vertex conformance graph (tests/data/test_tsv/test.tsv)
TINY_SRC = np.array([0, 1, 1, 2, 2, 3, 3])
TINY_DST = np.array([5, 0, 5, 0, 5, 0, 5])


def kcore(src, dst, nv, k):
    """Iterative peeling (kcore.cpp:55-120): drop vertices with undirected
    remaining degree < k until fixed point. → (alive mask, remaining degree)."""
    alive = np.ones(nv, bool)
    while True:
        m = alive[src] & alive[dst]
        deg = np.bincount(src[m], minlength=nv) + np.bincount(dst[m], minlength=nv)
        dead = alive & (deg < k)
        if not dead.any():
            return alive, np.where(alive, deg, 0)
        alive &= ~dead


def jones_plassmann_coloring(src, dst, nv, prio):
    """Sequential re-implementation of the parallel JP schedule: repeatedly
    color every uncolored vertex that beats all its uncolored neighbors'
    priorities with its min free color."""
    color = np.full(nv, -1, np.int64)
    adj = [[] for _ in range(nv)]
    for s, d in zip(src.tolist(), dst.tolist()):
        adj[s].append(d)
        adj[d].append(s)
    while (color < 0).any():
        winners = [v for v in range(nv) if color[v] < 0
                   and all(color[n] >= 0 or prio[n] < prio[v] for n in adj[v])]
        for v in winners:
            used = {int(color[n]) for n in adj[v] if color[n] >= 0}
            c = 0
            while c in used:
                c += 1
            color[v] = c
    return color


def fm_diameter(src, dst, nv, init_masks, eps=1e-4, max_iter=100):
    """Independent FM-sketch hop loop (approximate_diameter.cpp:48-77):
    OR-merge neighbor masks per hop; stop when the neighborhood estimate
    stops growing by more than (1+eps) or masks are stable."""
    def estimate(masks):
        out = 0.0
        for row in masks:
            bs = []
            for m in row:
                b = 0
                while (int(m) >> b) & 1:
                    b += 1
                bs.append(b)
            out += 2.0 ** (sum(bs) / len(bs)) / 0.77351
        return out

    masks = init_masks.copy()
    prev = None
    hops = 0
    ests = []
    for it in range(max_iter):
        new = masks.copy()
        for s, d in zip(src.tolist(), dst.tolist()):
            new[d] |= masks[s]
            new[s] |= masks[d]
        cur = estimate(new)
        ests.append(cur)
        stable = (new == masks).all()
        masks = new
        if prev is not None and (cur < prev * (1 + eps) or stable):
            hops = it
            break
        prev = cur
        hops = it
    return hops, ests


def brandes_betweenness(src, dst, nv, directed=False):
    """Textbook Brandes'01 betweenness (unit weights), all sources."""
    adj = [[] for _ in range(nv)]
    for s, d in zip(src.tolist(), dst.tolist()):
        adj[s].append(d)
        if not directed:
            adj[d].append(s)
    bc = np.zeros(nv)
    for s in range(nv):
        stack, preds = [], [[] for _ in range(nv)]
        sigma = np.zeros(nv)
        dist = np.full(nv, -1.0)
        sigma[s], dist[s] = 1.0, 0.0
        from collections import deque

        q = deque([s])
        while q:
            v = q.popleft()
            stack.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = np.zeros(nv)
        for w in reversed(stack):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc / (1.0 if directed else 2.0)


def bfs_closeness(src, dst, nv, directed=False):
    from collections import deque

    adj = [[] for _ in range(nv)]
    for s, d in zip(src.tolist(), dst.tolist()):
        adj[s].append(d)
        if not directed:
            adj[d].append(s)
    out = np.zeros(nv)
    for s in range(nv):
        dist = np.full(nv, -1.0)
        dist[s] = 0
        q = deque([s])
        while q:
            v = q.popleft()
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
        reach = (dist >= 0).sum() - 1
        tot = dist[dist > 0].sum()
        out[s] = reach / tot if tot > 0 else 0.0
    return out
