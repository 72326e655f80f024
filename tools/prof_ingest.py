"""Ingest-phase profiler for the flagship build (scaling diagnosis).

Runs ONLY the ingest (synthetic repo table → hashed edges → build_graph)
at one pinned parallelism level and prints the driver-side phase profile
PLUS the summed per-actor phase seconds (ing_read / ing_vids / fin_map /
fin_sort / fin_dense) so the negotiate/finalize wall time can be
attributed to parquet IO vs numpy sorts vs mapping.

Usage:  taskset -c 0-7  python tools/prof_ingest.py 8  1000000
        taskset -c 0-31 python tools/prof_ingest.py 32 4000000
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # reuses _init_ray (malloc/hugepage env + object store size)


def main() -> None:
    num_cpus = int(sys.argv[1])
    nv = int(sys.argv[2])
    parts = int(os.environ.get("GRAFT_SCALE_PARTS", "64"))
    bench._init_ray(num_cpus)
    import ray

    from powergraph_ray.graph.gas import build_graph
    from powergraph_ray.sources.synthetic import synthetic_repo_table
    from powergraph_ray.stages.edge_builder import build_hashed_edges

    import ray.data

    repo_dir = synthetic_repo_table(nv, alpha=0.8, truncate=100, seed=7)
    wall0 = time.time()
    t0 = time.perf_counter()
    repo_ds = ray.data.read_parquet(repo_dir)
    cmin = 1 if num_cpus < 8 else 2
    edges = build_hashed_edges(repo_ds, dedup=False, concurrency=(cmin, 64))
    s = int(round(parts ** 0.5))
    # fresh dir per run — rmtree of a previous run's 13k-file tree inside
    # build_graph lands in the timed window (4-20 s under reclaim pressure)
    g = build_graph(edges, dedup=True, num_partitions=s * s, ingress="grid",
                    vid_order="bucket",
                    work_dir=f"/tmp/powergraph_ray/prof_graph_{num_cpus}_{nv}_{os.getpid()}")
    ingest_s = time.perf_counter() - t0
    profs = ray.get([a.profile.remote() for a in g._pool])
    agg: dict[str, float] = {}
    for p in profs:
        for k, v in p.items():
            if k.startswith(("ing_", "fin_")):
                agg[k] = agg.get(k, 0.0) + v
    out = {
        "num_cpus": num_cpus, "n_files": nv, "num_partitions": s * s,
        "ingest_seconds": round(ingest_s, 2),
        "num_edges": int(g.num_edges),
        "driver_phases": g.build_profile,
        "actor_phase_cpu_seconds": {k: round(v, 2) for k, v in sorted(agg.items())},
        "actor_phase_max_seconds": {
            k: round(max(p.get(k, 0.0) for p in profs), 2)
            for k in agg},
        # timeline (seconds after ingest start): [min, median, max] per
        # marker — shows queueing/startup gaps vs compute
        "timeline": {
            k: (lambda xs: [round(xs[0], 2), round(xs[len(xs) // 2], 2),
                            round(xs[-1], 2)])(
                sorted(p[k] - wall0 for p in profs if k in p))
            for k in ("ts_init", "ts_read0", "ts_read1", "ts_vids1",
                      "ts_fin0", "ts_fin1")
            if any(k in p for p in profs)},
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
