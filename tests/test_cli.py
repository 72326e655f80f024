"""CLI apps (reference toolkit command-line parity)."""

import numpy as np
import pytest

from powergraph_ray.cli import main

from . import oracles


@pytest.fixture()
def tsv_graph(tmp_path):
    p = tmp_path / "g.tsv"
    p.write_text("".join(f"{s}\t{d}\n" for s, d in
                         zip(oracles.TINY_SRC, oracles.TINY_DST)))
    return str(p)


def test_cli_pagerank_writes_ranks(tsv_graph, tmp_path, capsys):
    out = str(tmp_path / "pr")
    assert main(["pagerank", "--graph", tsv_graph, "--format", "tsv",
                 "--iterations", "10", "--partitions", "4",
                 "--saveprefix", out]) == 0
    lines = open(out + "_1_of_1.tsv").read().strip().splitlines()
    got = {int(l.split("\t")[0]): float(l.split("\t")[1]) for l in lines}
    want = oracles.pagerank_fixed(
        np.searchsorted(sorted(got), oracles.TINY_SRC),
        np.searchsorted(sorted(got), oracles.TINY_DST), 5, 10)
    vids = sorted(got)
    np.testing.assert_allclose([got[v] for v in vids], want, rtol=1e-9)
    assert "converged in 10 supersteps" in capsys.readouterr().out


def test_cli_cc_triangles_kcore(tsv_graph, tmp_path, capsys):
    assert main(["connected_component", "--graph", tsv_graph,
                 "--partitions", "2",
                 "--saveprefix", str(tmp_path / "cc")]) == 0
    assert "1 components" in capsys.readouterr().out
    assert main(["triangle_count", "--graph", tsv_graph,
                 "--partitions", "2"]) == 0
    assert "triangles" in capsys.readouterr().out
    assert main(["kcore", "--graph", tsv_graph, "--kmin", "1",
                 "--partitions", "2",
                 "--saveprefix", str(tmp_path / "kc")]) == 0
    lines = open(str(tmp_path / "kc") + "_1_of_1.tsv").read().strip().splitlines()
    assert len(lines) == 5


def test_cli_format_convert(tsv_graph, tmp_path):
    out = str(tmp_path / "conv")
    assert main(["format_convert", "--graph", tsv_graph, "--format", "tsv",
                 "--out-format", "bintsv4", "--saveprefix", out]) == 0
    import os

    assert any(f.endswith(".bintsv4") for f in os.listdir(out))


def test_cli_spectral_and_centrality_apps(tsv_graph, tmp_path, capsys):
    """New toolkit apps: tsc / graph_laplacian / spectral_partition /
    prestige / coloring orderings all run end-to-end on the conformance graph."""
    assert main(["tsc", "--graph", tsv_graph, "--partitions", "4",
                 "--saveprefix", str(tmp_path / "tsc")]) == 0
    lines = open(str(tmp_path / "tsc") + "_1_of_1.tsv").read().strip().splitlines()
    got = {int(l.split("\t")[0]): float(l.split("\t")[1]) for l in lines}
    # dense expm oracle on the 5-vertex graph
    vids = sorted(got)
    vm = {v: i for i, v in enumerate(vids)}
    A = np.zeros((5, 5))
    for s, d in zip(oracles.TINY_SRC, oracles.TINY_DST):
        A[vm[s], vm[d]] += 1
        A[vm[d], vm[s]] += 1
    lam, U = np.linalg.eigh(A)
    want = U @ (np.exp(lam) * (U.T @ np.ones(5)))
    np.testing.assert_allclose([got[v] for v in vids], want, rtol=1e-8)

    assert main(["graph_laplacian", "--graph", tsv_graph, "--partitions", "2",
                 "--saveprefix", str(tmp_path / "lap")]) == 0
    # round 5: edge-sized sinks stream as parallel shards (the reference's
    # parallel save()) — glob-read prefix_*_of_*.tsv
    import glob as _glob

    shards = sorted(_glob.glob(str(tmp_path / "lap") + "_*_of_*.tsv"))
    assert shards, "no laplacian shards written"
    lines = [l for f in shards for l in open(f).read().strip().splitlines() if l]
    assert len(lines) == 5 + 2 * 7  # diag + both directions of 7 und edges

    assert main(["spectral_partition", "--graph", tsv_graph, "--nparts", "2",
                 "--partitions", "2",
                 "--saveprefix", str(tmp_path / "sp")]) == 0
    assert "part sizes" in capsys.readouterr().out

    assert main(["prestige", "--graph", tsv_graph, "--partitions", "2",
                 "--saveprefix", str(tmp_path / "pp")]) == 0
    lines = open(str(tmp_path / "pp") + "_1_of_1.tsv").read().strip().splitlines()
    assert len(lines) == 5

    for ordering in ("degree", "saturation"):
        assert main(["coloring", "--ordering", ordering, "--graph", tsv_graph,
                     "--partitions", "2",
                     "--saveprefix", str(tmp_path / f"col_{ordering}")]) == 0
        out = capsys.readouterr().out
        assert "colors in" in out


def test_cli_pagerank_grid_bucket(tsv_graph, tmp_path):
    """--ingress grid --vid-order bucket: the range-restricted scale config
    must produce the same ranks as the default random ingress."""
    out = str(tmp_path / "prb")
    assert main(["pagerank", "--graph", tsv_graph, "--format", "tsv",
                 "--iterations", "10", "--partitions", "4",
                 "--ingress", "grid", "--vid-order", "bucket",
                 "--saveprefix", out]) == 0
    lines = open(out + "_1_of_1.tsv").read().strip().splitlines()
    got = {int(l.split("\t")[0]): float(l.split("\t")[1]) for l in lines}
    vids = sorted(got)
    want = oracles.pagerank_fixed(
        np.searchsorted(vids, oracles.TINY_SRC),
        np.searchsorted(vids, oracles.TINY_DST), 5, 10)
    np.testing.assert_allclose([got[v] for v in vids], want, rtol=1e-9)


def test_cli_hits_and_ppr(tsv_graph, tmp_path, capsys):
    out = str(tmp_path / "hits")
    assert main(["hits", "--graph", tsv_graph, "--partitions", "2",
                 "--iterations", "4", "--saveprefix", out]) == 0
    lines = open(out + "_1_of_1.tsv").read().strip().splitlines()
    got = {int(l.split("\t")[0]): (float(l.split("\t")[1]),
                                   float(l.split("\t")[2])) for l in lines}
    # sequential HITS oracle (simultaneous update, final L1 normalization)
    vids = sorted(got)
    dense = {v: i for i, v in enumerate(vids)}
    n = len(vids)
    hub = np.ones(n); auth = np.ones(n)
    for _ in range(4):
        a2 = np.zeros(n); h2 = np.zeros(n)
        for s, d in zip(oracles.TINY_SRC, oracles.TINY_DST):
            a2[dense[d]] += hub[dense[s]]
            h2[dense[s]] += auth[dense[d]]
        hub, auth = h2, a2
    hub /= hub.sum(); auth /= auth.sum()
    np.testing.assert_allclose([got[v][0] for v in vids], hub, rtol=1e-9)
    np.testing.assert_allclose([got[v][1] for v in vids], auth, rtol=1e-9)

    out2 = str(tmp_path / "ppr")
    src = int(oracles.TINY_SRC[0])
    assert main(["ppr", "--graph", tsv_graph, "--partitions", "2",
                 "--source", str(src), "--iterations", "6",
                 "--saveprefix", out2]) == 0
    lines = open(out2 + "_1_of_1.tsv").read().strip().splitlines()
    got2 = {int(l.split("\t")[0]): float(l.split("\t")[1]) for l in lines}
    outd = np.zeros(n)
    for s in oracles.TINY_SRC:
        outd[dense[s]] += 1
    r = np.zeros(n); r[dense[src]] = 1.0
    for _ in range(6):
        nxt = np.zeros(n)
        for s, d in zip(oracles.TINY_SRC, oracles.TINY_DST):
            nxt[dense[d]] += 0.85 * r[dense[s]] / max(outd[dense[s]], 1)
        nxt[dense[src]] += 0.15
        r = nxt
    np.testing.assert_allclose([got2[v] for v in vids], r, rtol=1e-9)


def test_cli_cascades_katz_eigen_node2vec(tsv_graph, tmp_path, capsys):
    st = tmp_path / "status.txt"
    st.write_text("0 I\n1 S\n2 S\n3 S\n5 R\n")
    assert main(["cascades", "--graph", tsv_graph, "--partitions", "2",
                 "--infection", "0.9", "--recovery", "0.1",
                 "--iterations", "5", "--status", str(st),
                 "--saveprefix", str(tmp_path / "sir")]) == 0
    out = capsys.readouterr().out
    assert "supersteps" in out and "recovered" in out
    lines = open(str(tmp_path / "sir") + "_1_of_1.tsv").read().strip().splitlines()
    assert len(lines) == 5
    assert all(l.split("\t")[1] in ("S", "I", "R") for l in lines)

    assert main(["katz", "--graph", tsv_graph, "--partitions", "2",
                 "--saveprefix", str(tmp_path / "kz")]) == 0
    lines = open(str(tmp_path / "kz") + "_1_of_1.tsv").read().strip().splitlines()
    assert len(lines) == 5
    assert all(float(l.split("\t")[1]) >= 1.0 for l in lines)

    # the 5-vertex fixture is walk-shallow: A^5 = 0 zeroes the vector, a
    # legitimate fixed point — use 1 power step (= normalized in-degrees)
    assert main(["eigencentrality", "--graph", tsv_graph,
                 "--partitions", "2", "--iterations", "1",
                 "--saveprefix", str(tmp_path / "ev")]) == 0
    vals = [float(l.split("\t")[1]) for l in
            open(str(tmp_path / "ev") + "_1_of_1.tsv").read().strip().splitlines()]
    assert abs(sum(v * v for v in vals) - 1.0) < 1e-9

    assert main(["node2vec", "--graph", tsv_graph, "--partitions", "2",
                 "--walks", "3", "--length", "4", "--p", "0.5", "--q", "2.0",
                 "--saveprefix", str(tmp_path / "nv")]) == 0
    lines = open(str(tmp_path / "nv") + "_1_of_1.tsv").read().strip().splitlines()
    assert len(lines) == 3 * 5  # 3 walks x (start + 4 hops)


def test_cli_matching_cover_sparsify(tsv_graph, tmp_path, capsys):
    assert main(["maximal_matching", "--graph", tsv_graph,
                 "--partitions", "2",
                 "--saveprefix", str(tmp_path / "mm")]) == 0
    assert "matched edges" in capsys.readouterr().out
    mm = open(str(tmp_path / "mm") + "_1_of_1.tsv").read().strip().splitlines()
    ends = [int(x) for l in mm for x in l.split("\t")[:2]]
    assert len(ends) == len(set(ends))  # matching property

    assert main(["vertex_cover", "--graph", tsv_graph, "--partitions", "2",
                 "--saveprefix", str(tmp_path / "vc")]) == 0
    vc = {int(l.split("\t")[0]) for l in
          open(str(tmp_path / "vc") + "_1_of_1.tsv").read().strip().splitlines()}
    assert vc == set(ends)

    assert main(["sparsify", "--graph", tsv_graph, "--partitions", "2",
                 "--saveprefix", str(tmp_path / "sp")]) == 0
    assert "surviving edges" in capsys.readouterr().out


def test_write_ds_shards_multi_block(tmp_path):
    """Round 5: the sharded sink writes one TSV per block in parallel
    (prefix_i_of_n.tsv) and returns the total row count."""
    import glob as _glob

    import pyarrow as pa
    import ray.data

    from powergraph_ray.cli import _write_ds_shards

    ds = ray.data.from_arrow(pa.table({
        "a": pa.array(list(range(30)), pa.int64()),
        "b": pa.array([x * 2 for x in range(30)], pa.int64()),
    })).repartition(3)
    n = _write_ds_shards(str(tmp_path / "out"), ds, ("a", "b"))
    assert n == 30
    shards = sorted(_glob.glob(str(tmp_path / "out") + "_*_of_*.tsv"))
    assert len(shards) == 3
    rows = sorted(tuple(map(int, l.split("\t")))
                  for f in shards for l in open(f).read().splitlines())
    assert rows == [(x, 2 * x) for x in range(30)]
