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
