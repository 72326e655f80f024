"""SCC tests (graph/scc.py): the BSP coloring algorithm vs an independent
iterative Kosaraju oracle on planted and random directed graphs, plus the
driver-shaped doc graph and determinism under different partition counts."""

import numpy as np
import pytest

from powergraph_ray.graph.gas import build_graph_from_arrays
from powergraph_ray.graph.scc import run_scc
from powergraph_ray.sources.repo_table import doc_edge_ground_truth


def kosaraju(src, dst, n):
    """Independent sequential oracle: iterative Kosaraju; returns the
    canonical (min-vertex) SCC id per vertex 0..n-1."""
    fwd = [[] for _ in range(n)]
    bwd = [[] for _ in range(n)]
    for u, v in zip(src, dst):
        fwd[int(u)].append(int(v))
        bwd[int(v)].append(int(u))
    seen = np.zeros(n, bool)
    order = []
    for s in range(n):           # first pass: finish order (iterative DFS)
        if seen[s]:
            continue
        stack = [(s, 0)]
        seen[s] = True
        while stack:
            v, i = stack.pop()
            if i < len(fwd[v]):
                stack.append((v, i + 1))
                w = fwd[v][i]
                if not seen[w]:
                    seen[w] = True
                    stack.append((w, 0))
            else:
                order.append(v)
    comp = np.full(n, -1, np.int64)
    for s in reversed(order):     # second pass on the reverse graph
        if comp[s] >= 0:
            continue
        members, stack = [], [s]
        comp[s] = s
        while stack:
            v = stack.pop()
            members.append(v)
            for w in bwd[v]:
                if comp[w] < 0:
                    comp[w] = s
                    stack.append(w)
        m = min(members)
        for v in members:
            comp[v] = m
    return comp


def _check(src, dst, n, P=4):
    src = np.asarray(src, np.uint64)
    dst = np.asarray(dst, np.uint64)
    g = build_graph_from_arrays(src, dst, P)
    vids, scc = run_scc(g)
    want = kosaraju(src, dst, n)
    got = dict(zip(vids.astype(int), scc.astype(int)))
    for v in np.unique(np.concatenate([src, dst])).astype(int):
        assert got[v] == want[v], (v, got[v], want[v])


def test_two_cycles_and_bridge():
    # 0→1→2→0 (SCC {0,1,2}), 3→4→3 (SCC {3,4}), bridge 2→3, tail 4→5
    src = [0, 1, 2, 3, 4, 2, 4]
    dst = [1, 2, 0, 4, 3, 3, 5]
    _check(src, dst, 6)


def test_dag_is_all_singletons():
    src = [0, 0, 1, 2, 3]
    dst = [1, 2, 3, 3, 4]
    g = build_graph_from_arrays(np.asarray(src, np.uint64),
                                np.asarray(dst, np.uint64), 3)
    vids, scc = run_scc(g)
    assert (vids == scc).all()   # every vertex is its own component


def test_one_big_cycle():
    n = 50
    src = np.arange(n)
    dst = (np.arange(n) + 1) % n
    g = build_graph_from_arrays(src.astype(np.uint64),
                                dst.astype(np.uint64), 4)
    vids, scc = run_scc(g)
    assert (scc == scc.min()).all() and scc.min() == vids.min()


@pytest.mark.parametrize("seed,n,m", [(1, 60, 150), (2, 120, 260), (3, 40, 40)])
def test_random_directed_vs_kosaraju(seed, n, m):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    keep = src != dst             # the loaders drop self-edges
    _check(src[keep], dst[keep], n)


def test_partition_count_invariance():
    rng = np.random.RandomState(9)
    src = rng.randint(0, 80, 200).astype(np.uint64)
    dst = rng.randint(0, 80, 200).astype(np.uint64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    outs = []
    for P in (2, 7):
        g = build_graph_from_arrays(src, dst, P)
        vids, scc = run_scc(g)
        outs.append(dict(zip(vids.astype(int), scc.astype(int))))
    assert outs[0] == outs[1]


def test_condensation_matches_oracle():
    """Condensation DAG = distinct cross-SCC (scc_src, scc_dst) pairs with
    multiplicity, recomputed in pandas from the Kosaraju labels; the result
    is acyclic by construction."""
    import pandas as pd

    from powergraph_ray.graph.scc import scc_condensation

    rng = np.random.RandomState(4)
    src = rng.randint(0, 70, 220).astype(np.uint64)
    dst = rng.randint(0, 70, 220).astype(np.uint64)
    keep = src != dst
    # pre-dedup the input: multiplicity semantics follow the stored edge
    # multiset (a dedup=False graph keeps duplicates), so feed a distinct
    # edge set and count those
    e_in = np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)
    src, dst = e_in[:, 0], e_in[:, 1]
    g = build_graph_from_arrays(src, dst, 4)
    got = (scc_condensation(g).to_pandas()
           .astype({"scc_src": "int64", "scc_dst": "int64"})
           .sort_values(["scc_src", "scc_dst"]).reset_index(drop=True))
    comp = kosaraju(src, dst, 70)
    e = pd.DataFrame({"src": src.astype(int), "dst": dst.astype(int)})
    e["scc_src"] = comp[e["src"]]
    e["scc_dst"] = comp[e["dst"]]
    want = (e[e["scc_src"] != e["scc_dst"]]
            .groupby(["scc_src", "scc_dst"]).size().rename("n_edges")
            .reset_index().sort_values(["scc_src", "scc_dst"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want.astype("int64"))
    # acyclicity: no pair appears in both directions
    fwd = set(zip(got["scc_src"], got["scc_dst"]))
    assert not any((b, a) in fwd for a, b in fwd)


def test_doc_graph_vs_kosaraju():
    e = doc_edge_ground_truth(500)
    src = e[:, 0].astype(np.uint64)
    dst = e[:, 1].astype(np.uint64)
    g = build_graph_from_arrays(src, dst, 8)
    vids, scc = run_scc(g)
    want = kosaraju(src, dst, int(max(src.max(), dst.max())) + 1)
    got = dict(zip(vids.astype(int), scc.astype(int)))
    for v, s in got.items():
        assert s == want[v]


def _longest_path_oracle(sccs, pairs):
    depth = {v: 0 for v in sccs}
    changed = True
    while changed:
        changed = False
        for a, b in pairs:
            if depth[a] + 1 > depth[b]:
                depth[b] = depth[a] + 1
                changed = True
    return depth


def test_dag_depth_matches_oracle():
    from powergraph_ray.graph.scc import dag_depth

    rng = np.random.RandomState(11)
    src = rng.randint(0, 60, 180).astype(np.uint64)
    dst = rng.randint(0, 60, 180).astype(np.uint64)
    keep = src != dst
    e_in = np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)
    src, dst = e_in[:, 0], e_in[:, 1]
    g = build_graph_from_arrays(src, dst, 4)
    got = dag_depth(g).sort_values("scc_id").reset_index(drop=True)
    comp = kosaraju(src, dst, 60)
    verts = np.unique(np.concatenate([src, dst])).astype(int)
    sccs = sorted({int(comp[v]) for v in verts})
    pairs = sorted({(int(comp[a]), int(comp[b]))
                    for a, b in zip(src.astype(int), dst.astype(int))
                    if comp[a] != comp[b]})
    want = _longest_path_oracle(sccs, pairs)
    assert len(got) == len(sccs)
    gm = dict(zip(got["scc_id"].astype(int), got["depth"].astype(int)))
    for v in sccs:
        assert gm[v] == want[v], v


def test_dag_depth_chain_and_cycle():
    # chain 0→1→2→3 (depths 0,1,2,3) + separate 2-cycle 7↔8 (one SCC, depth 0)
    src = np.array([0, 1, 2, 7, 8], np.uint64)
    dst = np.array([1, 2, 3, 8, 7], np.uint64)
    g = build_graph_from_arrays(src, dst, 2)
    from powergraph_ray.graph.scc import dag_depth

    got = dag_depth(g)
    gm = dict(zip(got["scc_id"].astype(int), got["depth"].astype(int)))
    assert gm == {0: 0, 1: 1, 2: 2, 3: 3, 7: 0}
