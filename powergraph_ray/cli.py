"""Command-line apps mirroring the reference toolkit binaries
(toolkits/graph_analytics/*.cpp command lines):

    python -m powergraph_ray.cli pagerank --graph g.tsv --format tsv \
        --tol 1e-6 --saveprefix /tmp/out
    python -m powergraph_ray.cli connected_component --graph ... --format snap
    python -m powergraph_ray.cli label_propagation --graph ... --labels l.tsv
    python -m powergraph_ray.cli sssp --graph ... --source 0 --directed
    python -m powergraph_ray.cli triangle_count --graph ... [--per-vertex]
    python -m powergraph_ray.cli kcore --graph ... --kmin 1 --kmax 10
    python -m powergraph_ray.cli coloring | approximate_diameter | ...
    python -m powergraph_ray.cli format_convert --graph in.snap --format snap \
        --out-format bintsv4 --saveprefix /tmp/conv

Shared options follow the reference's `--graph --format --saveprefix`
convention (command_line_options; graph_help.txt): `--partitions`,
`--ingress random|grid|oblivious|hdrf`, `--checkpoint DIR`, `--resume`.
Outputs are tab-separated shards matching the reference writers
(`vid\\trank`, `vid\\tlabel`, `vid\\t#tri\\toutdeg\\tindeg`, …).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np


def _expand(pattern: str) -> list[str]:
    if os.path.isdir(pattern):
        return sorted(glob.glob(os.path.join(pattern, "*")))
    hits = sorted(glob.glob(pattern))
    return hits or [pattern]


def _build(args):
    from .graph.gas import build_graph
    from .sources.formats import load_format

    edges = load_format(_expand(args.graph), args.format)
    return build_graph(edges, args.partitions, dedup=args.dedup,
                       ingress=args.ingress,
                       vid_order=getattr(args, "vid_order", "auto"))


def _write_tsv(prefix: str, rows) -> None:
    os.makedirs(os.path.dirname(prefix) or ".", exist_ok=True)
    with open(prefix + "_1_of_1.tsv", "w") as f:
        for r in rows:
            f.write("\t".join(str(x) for x in r) + "\n")


def _shard_writer():
    import ray

    @ray.remote
    def _write_shard_task(path: str, t, columns) -> int:
        if len(t) == 0:  # empty blocks may carry an empty schema
            open(path, "w").close()
            return 0
        import pandas as pd

        df = pd.DataFrame({c: np.asarray(t[c]) for c in columns})
        # C-fast writer; float repr matches str(float) (shortest-roundtrip)
        df.to_csv(path, sep="\t", header=False, index=False)
        return len(t)

    return _write_shard_task


def _write_ds_shards(prefix: str, ds, columns) -> int:
    """Edge-sized Dataset result → parallel TSV shards
    ``prefix_{i}_of_{n}.tsv`` — the reference's parallel ``save()``
    (distributed_graph.hpp:1836+ writes one file per worker); one writer
    task per block, nothing edge-sized ever lands on the driver. → rows."""
    import ray

    os.makedirs(os.path.dirname(prefix) or ".", exist_ok=True)
    refs = ds.materialize().to_arrow_refs()
    n = len(refs)
    if not refs:  # empty result: still emit one (empty) shard
        open(f"{prefix}_1_of_1.tsv", "w").close()
        return 0
    task = _shard_writer()
    counts = ray.get([task.remote(f"{prefix}_{i + 1}_of_{n}.tsv", r, columns)
                      for i, r in enumerate(refs)])
    return int(sum(counts))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="powergraph_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--graph", required=True)
        p.add_argument("--format", default="tsv",
                       choices=["tsv", "snap", "csv", "adj", "bintsv4", "parquet", "graphjrl"])
        p.add_argument("--saveprefix", default=None)
        p.add_argument("--partitions", type=int, default=8)
        p.add_argument("--ingress", default="auto",
                       choices=["auto", "random", "grid", "pds", "oblivious",
                                "hdrf"])
        p.add_argument("--vid-order", dest="vid_order", default="auto",
                       choices=["auto", "sorted", "bucket"],
                       help="bucket: bucket-aligned dense vid ordering "
                            "(grid/pds only) — range-restricted supersteps")
        p.add_argument("--dedup", action="store_true")
        p.add_argument("--checkpoint", default=None)
        p.add_argument("--resume", action="store_true")

    p = sub.add_parser("pagerank")
    common(p)
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--iterations", type=int, default=0)
    p.add_argument("--use-cache", action="store_true")

    for name in ("connected_component", "approximate_diameter", "tsc",
                 "graph_laplacian", "prestige", "closeness", "betweenness"):
        common(sub.add_parser(name))

    p = sub.add_parser("coloring")
    common(p)
    p.add_argument("--ordering", default="simple",
                   choices=["simple", "degree", "saturation"],
                   help="simple_coloring / degree_ordered_coloring / "
                        "saturation_ordered_coloring variants")

    p = sub.add_parser("hits")
    common(p)
    p.add_argument("--iterations", type=int, default=5)

    p = sub.add_parser("ppr")
    common(p)
    p.add_argument("--source", type=int, required=True)
    p.add_argument("--iterations", type=int, default=10)

    p = sub.add_parser("spectral_partition")
    common(p)
    p.add_argument("--nparts", type=int, default=2)

    p = sub.add_parser("label_propagation")
    common(p)
    p.add_argument("--label-mod", type=int, default=29)
    p.add_argument("--iterations", type=int, default=20)
    p.add_argument("--labels", default=None,
                   help="whitespace 'vid label' file (the reference's "
                        "vertex-data loader, label_propagation.cpp:55-74); "
                        "default: synthetic labels vid %% label-mod")

    p = sub.add_parser("sssp")
    common(p)
    p.add_argument("--source", type=int, default=None,
                   help="default: max-degree vertex (sssp.cpp:185-201)")
    p.add_argument("--directed", action="store_true")

    p = sub.add_parser("triangle_count")
    common(p)
    p.add_argument("--per-vertex", action="store_true")

    p = sub.add_parser("kcore")
    common(p)
    p.add_argument("--kmin", type=int, default=1)
    p.add_argument("--kmax", type=int, default=None)

    p = sub.add_parser("ktruss")
    common(p)
    p.add_argument("--k", type=int, default=3)

    p = sub.add_parser("cascades")
    common(p)
    p.add_argument("--infection", type=float, default=0.5,
                   help="per-infected-neighbor infection chance "
                        "(cascades.cpp --infection_chance)")
    p.add_argument("--recovery", type=float, default=0.25)
    p.add_argument("--iterations", type=int, default=10)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--init-frac", type=float, default=0.02,
                   help="hash-seeded initial infected fraction")
    p.add_argument("--status", default=None,
                   help="whitespace 'vid S|I|R' file (the reference's "
                        "line parser, cascades.cpp:61-80); overrides "
                        "--init-frac")

    p = sub.add_parser("katz")
    common(p)
    p.add_argument("--alpha", type=float, default=1 / 16)
    p.add_argument("--beta", type=float, default=1.0)
    p.add_argument("--iterations", type=int, default=5)

    p = sub.add_parser("eigencentrality")
    common(p)
    p.add_argument("--iterations", type=int, default=5)

    p = sub.add_parser("node2vec")
    common(p)
    p.add_argument("--walks", type=int, default=100,
                   help="walkers, started from the first N vids")
    p.add_argument("--length", type=int, default=8)
    p.add_argument("--p", type=float, default=1.0)
    p.add_argument("--q", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=17)

    p = sub.add_parser("maximal_matching")
    common(p)
    p.add_argument("--seed", type=int, default=7)

    p = sub.add_parser("vertex_cover")
    common(p)
    p.add_argument("--seed", type=int, default=7)

    p = sub.add_parser("sparsify")
    common(p)
    p.add_argument("--e", type=float, default=0.5,
                   help="keep top-ceil(deg^e) edges per vertex by Jaccard")

    p = sub.add_parser("format_convert")
    common(p)
    p.add_argument("--out-format", required=True,
                   choices=["tsv", "snap", "csv", "adj", "bintsv4", "parquet", "graphjrl"])

    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")

    if args.cmd == "format_convert":
        from .sources.formats import format_convert

        n = format_convert(_expand(args.graph), args.format,
                           args.saveprefix or "./converted", args.out_format)
        print(f"converted {n} edges")
        return 0

    g = _build(args)
    rows = None
    ds_out = ds_cols = None
    print(f"graph: {g.nv} vertices, {g.num_edges} edges, "
          f"replication {g.replication_factor:.2f}")

    if args.cmd == "pagerank":
        from .graph.algorithms import run_pagerank

        vids, ranks, eng = run_pagerank(
            g, tol=args.tol, iterations=args.iterations,
            checkpoint_path=args.checkpoint, resume=args.resume,
            use_cache=args.use_cache)
        total = float(ranks.sum())
        print(f"converged in {len(eng.metrics)} supersteps; total rank {total:.6f}")
        rows = zip(vids.tolist(), ranks.tolist())
    elif args.cmd == "connected_component":
        from .graph.algorithms import run_connected_components

        vids, labels, eng = run_connected_components(
            g, checkpoint_path=args.checkpoint, resume=args.resume)
        print(f"{len(np.unique(labels))} components in {len(eng.metrics)} supersteps")
        rows = zip(vids.tolist(), labels.tolist())
    elif args.cmd == "label_propagation":
        from .graph.algorithms import run_lpa, run_lpa_vidmod

        if args.labels:
            lut: dict[int, str] = {}
            for path in _expand(args.labels):
                with open(path) as f:
                    for line in f:
                        parts = line.split()
                        if len(parts) >= 2:
                            lut[int(parts[0])] = parts[1]
            init = np.array([lut.get(int(v), f"c{int(v) % args.label_mod}")
                             for v in g.vids])
            vids, labels, _ = run_lpa(g, init, max_iter=args.iterations,
                                      checkpoint_path=args.checkpoint,
                                      resume=args.resume)
        else:
            vids, labels, _ = run_lpa_vidmod(g, args.label_mod,
                                             max_iter=args.iterations,
                                             checkpoint_path=args.checkpoint,
                                             resume=args.resume)
        rows = zip(vids.tolist(), labels.tolist())
    elif args.cmd == "sssp":
        from .graph.algorithms import run_sssp

        if args.source is None:
            deg = g.out_deg + g.in_deg
            args.source = int(g.vids[np.lexsort((g.vids, -deg))[0]])
            print(f"using max-degree source {args.source}")
        vids, dist, _ = run_sssp(g, args.source, directed=args.directed,
                                 checkpoint_path=args.checkpoint, resume=args.resume)
        rows = ((int(v), int(d)) for v, d in zip(vids, dist) if np.isfinite(d))
    elif args.cmd == "triangle_count":
        from .graph.triangles import triangle_per_vertex, triangle_total
        from .graph.transforms import edge_table

        et = edge_table(g)
        if args.per_vertex:
            # vertex-sized result: stream sharded (reference writer emits
            # vid\t#tri\toutdeg\tindeg per line, parallel shards)
            import pyarrow as pa
            import ray as _ray

            sv_ref, perm_ref = g.sorted_view_refs()
            od_ref, id_ref = g.out_deg_ref(), g.in_deg_ref()

            def add_degs(t: "pa.Table") -> "pa.Table":
                sv = _ray.get(sv_ref)
                perm = _ray.get(perm_ref) if perm_ref is not None else None
                od, ind = _ray.get(od_ref), _ray.get(id_ref)
                vid = np.asarray(t["vid"]).astype(np.uint64)
                pos = np.searchsorted(sv, vid)
                dense = pos if perm is None else perm[pos]
                return pa.table({"vid": pa.array(vid.view(np.int64)),
                                 "n_tri": t["n_tri"],
                                 "out_deg": pa.array(od[dense]),
                                 "in_deg": pa.array(ind[dense])})

            ds_out = triangle_per_vertex(et).map_batches(
                add_degs, batch_format="pyarrow")
            ds_cols = ("vid", "n_tri", "out_deg", "in_deg")
        else:
            n = triangle_total(et)
            print(f"{n} triangles")
            rows = [(n,)]
    elif args.cmd == "ktruss":
        from .graph.ktruss import ktruss
        from .graph.transforms import edge_table

        ds_out = ktruss(edge_table(g), args.k).materialize()
        print(f"{ds_out.count()} edges in the {args.k}-truss")
        ds_cols = ("a", "b")
    elif args.cmd == "kcore":
        from .graph.toolkit import run_kcore_decomposition

        vids, core = run_kcore_decomposition(g, args.kmin, args.kmax)
        rows = zip(vids.tolist(), core.tolist())
    elif args.cmd == "coloring":
        from .graph.toolkit import (run_coloring, run_coloring_degree_ordered,
                                    run_coloring_saturation_ordered)

        fn = {"simple": run_coloring, "degree": run_coloring_degree_ordered,
              "saturation": run_coloring_saturation_ordered}[args.ordering]
        vids, colors, eng = fn(g, checkpoint_path=args.checkpoint, resume=args.resume)
        print(f"{int(colors.max()) + 1} colors in {len(eng.metrics)} supersteps")
        rows = zip(vids.tolist(), colors.tolist())
    elif args.cmd == "approximate_diameter":
        from .graph.toolkit import run_approx_diameter

        hops, _ = run_approx_diameter(g)
        print(f"approximate diameter: {hops}")
        rows = [(hops,)]
    elif args.cmd == "tsc":
        from .graph.spectral import total_subgraph_centrality

        ds_out, iters = total_subgraph_centrality(g, result="dataset")
        print(f"TSC converged with {iters} Lanczos mat-vecs")
        # vertex-sized result streams as shards straight from the chunk refs
        import pyarrow as pa

        ds_out = ds_out.map_batches(
            lambda t: pa.table({"vid": pa.array(
                np.asarray(t["vid"], np.uint64).view(np.int64)),
                "tsc": t["tsc"]}),
            batch_format="pyarrow")
        ds_cols = ("vid", "tsc")
    elif args.cmd == "graph_laplacian":
        from .graph.spectral import normalized_laplacian
        from .graph.transforms import edge_table

        ds_out = normalized_laplacian(edge_table(g))
        ds_cols = ("i", "j", "lap")
    elif args.cmd == "hits":
        from .graph.algorithms import run_hits

        vids, hub, auth, eng = run_hits(g, iterations=args.iterations,
                                        checkpoint_path=args.checkpoint,
                                        resume=args.resume)
        print(f"{len(eng.metrics)} supersteps; top auth vid "
              f"{int(vids[int(np.argmax(auth))])}")
        rows = ((int(v), float(h), float(a))
                for v, h, a in zip(vids, hub, auth))
    elif args.cmd == "ppr":
        from .graph.algorithms import run_ppr

        vids, scores, eng = run_ppr(g, args.source,
                                    iterations=args.iterations,
                                    checkpoint_path=args.checkpoint,
                                    resume=args.resume)
        print(f"{len(eng.metrics)} supersteps; mass {float(scores.sum()):.6f}")
        rows = ((int(v), float(x)) for v, x in zip(vids, scores))
    elif args.cmd == "maximal_matching":
        from .graph.toolkit import maximal_matching
        from .graph.transforms import edge_table

        out, rounds = maximal_matching(edge_table(g), seed=args.seed)
        df = out.to_pandas()
        print(f"{len(df)} matched edges in {rounds} rounds")
        rows = ((int(r.a), int(r.b), int(r.round)) for r in df.itertuples())
    elif args.cmd == "vertex_cover":
        from .graph.toolkit import vertex_cover
        from .graph.transforms import edge_table

        df = vertex_cover(edge_table(g), seed=args.seed).to_pandas()
        print(f"{len(df)} cover vertices")
        rows = ((int(v),) for v in df["vid"])
    elif args.cmd == "sparsify":
        from .graph.ktruss import local_sparsify
        from .graph.transforms import edge_table

        ds_out = local_sparsify(edge_table(g), e=args.e).materialize()
        print(f"{ds_out.count()} surviving edges")
        ds_cols = ("a", "b", "jac")
    elif args.cmd == "cascades":
        from .graph.cascades import INFECTED, RECOVERED, run_sir

        init_status = None
        if args.status:
            lut = {}
            for path in _expand(args.status):
                with open(path) as f:
                    for line in f:
                        parts = line.split()
                        if len(parts) >= 2:
                            lut[int(parts[0])] = parts[1].upper()
            code = {"S": 0, "I": 1, "R": 2}
            init_status = np.array(
                [code.get(lut.get(int(v), "S"), 0) for v in g.vids], np.uint8)
        vids, status, eng = run_sir(
            g, args.infection, args.recovery, args.iterations,
            seed=args.seed,
            init_frac=None if args.status else args.init_frac,
            init_status=init_status,
            checkpoint_path=args.checkpoint, resume=args.resume)
        n_i = int((status == INFECTED).sum())
        n_r = int((status == RECOVERED).sum())
        print(f"{len(eng.metrics)} supersteps; {n_i} infected, "
              f"{n_r} recovered")
        letters = np.array(["S", "I", "R"])
        rows = ((int(v), letters[s]) for v, s in zip(vids, status))
    elif args.cmd == "katz":
        from .graph.algorithms import run_katz

        vids, scores, eng = run_katz(g, alpha=args.alpha, beta=args.beta,
                                     iterations=args.iterations,
                                     checkpoint_path=args.checkpoint,
                                     resume=args.resume)
        print(f"{len(eng.metrics)} supersteps; max katz "
              f"{float(scores.max()):.6f}")
        rows = ((int(v), float(x)) for v, x in zip(vids, scores))
    elif args.cmd == "eigencentrality":
        from .graph.algorithms import run_eigencentrality

        vids, scores, eng = run_eigencentrality(
            g, iterations=args.iterations,
            checkpoint_path=args.checkpoint, resume=args.resume)
        print(f"{len(eng.metrics)} supersteps")
        rows = ((int(v), float(x)) for v, x in zip(vids, scores))
    elif args.cmd == "node2vec":
        from .graph.transforms import edge_table
        from .graph.walks import node2vec_walks

        starts = g.vids[:min(args.walks, g.nv)].astype(np.int64).tolist()
        out = node2vec_walks(edge_table(g), starts, args.length,
                             p=args.p, q=args.q, seed=args.seed).to_pandas()
        print(f"{len(out)} (walk_id, step, vid) rows")
        rows = ((int(r.walk_id), int(r.step), int(r.vid))
                for r in out.itertuples())
    elif args.cmd == "spectral_partition":
        from .graph.spectral import spectral_partition

        labels, _ = spectral_partition(g, args.nparts)
        sizes = np.bincount(labels, minlength=args.nparts)
        print("part sizes:", sizes.tolist())
        rows = zip(g.vids.tolist(), labels.tolist())
    elif args.cmd == "prestige":
        from .graph.centrality import proximity_prestige

        pp = proximity_prestige(g)
        rows = ((int(v), float(x)) for v, x in zip(g.vids, pp))
    elif args.cmd == "closeness":
        from .graph.centrality import closeness_centrality

        cc = closeness_centrality(g)
        rows = ((int(v), float(x)) for v, x in zip(g.vids, cc))
    elif args.cmd == "betweenness":
        from .graph.centrality import betweenness_centrality

        bc = betweenness_centrality(g)
        rows = ((int(v), float(x)) for v, x in zip(g.vids, bc))
    else:  # pragma: no cover
        raise SystemExit(f"unknown command {args.cmd}")

    if args.saveprefix:
        if ds_out is not None:
            n = _write_ds_shards(args.saveprefix, ds_out, ds_cols)
            print(f"wrote {n} rows to {args.saveprefix}_*_of_*.tsv shards")
        else:
            _write_tsv(args.saveprefix, rows)
            print(f"wrote {args.saveprefix}_1_of_1.tsv")
    g.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
