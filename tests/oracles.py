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


# the reference's own 5-vertex conformance graph (tests/data/test_tsv/test.tsv)
TINY_SRC = np.array([0, 1, 1, 2, 2, 3, 3])
TINY_DST = np.array([5, 0, 5, 0, 5, 0, 5])
