"""Driver-RSS probe: evidence that the flagship pipeline's driver memory is
independent of the vertex count.

Runs synthetic-table ingest → graph build → PageRank with
``result="dataset"`` (the scale path: the negotiated vid table, degree
arrays, engine state, and the result all live in plasma as range chunks; the
driver holds ObjectRefs + per-chunk stats only) at two data sizes and
reports the driver process's peak RSS at each. The result Dataset is
consumed by ``write_parquet`` straight from the chunk refs — no O(nv) array
ever touches the driver heap.

Usage (fresh process per size, like bench --scaling):
    python tools/driver_rss_probe.py <nv>         # one measurement, prints JSON
    python tools/driver_rss_probe.py --compare    # nv=1M vs 4M in subprocesses
"""

import json
import os
import resource
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def measure(nv: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)
    import ray.data

    from powergraph_ray.graph.algorithms import run_pagerank
    from powergraph_ray.graph.gas import build_graph
    from powergraph_ray.sources.synthetic import synthetic_repo_table
    from powergraph_ray.stages.edge_builder import build_hashed_edges

    repo_dir = synthetic_repo_table(nv, alpha=0.8, truncate=100, seed=7)
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB on linux

    t0 = time.perf_counter()
    edges = build_hashed_edges(ray.data.read_parquet(repo_dir), dedup=False,
                               concurrency=(2, 64))
    g = build_graph(edges, dedup=True, num_partitions=64, ingress="grid",
                    vid_order="bucket",
                    work_dir=f"/tmp/powergraph_ray/rss_graph_{nv}")
    ds, eng = run_pagerank(g, iterations=10, result="dataset")
    out_dir = f"/tmp/powergraph_ray/rss_out_{nv}"
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)
    ds.write_parquet(out_dir)
    wall = time.perf_counter() - t0

    n_rows = sum(
        __import__("pyarrow.parquet", fromlist=["x"]).read_metadata(
            os.path.join(out_dir, f)).num_rows
        for f in os.listdir(out_dir) if f.endswith(".parquet"))
    peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

    # warm-start leg (the daily-refresh flow): yesterday's (vid, rank)
    # table re-read from Parquet and fed back through
    # load_vertex_value_chunks + GASEngine.init_chunks. ru_maxrss is a
    # high-water mark, so warm_delta_mib is the ADDITIONAL driver RSS the
    # warm path needs beyond the cold run — an O(nv) warm table on the
    # driver would blow past the cold watermark at the larger size.
    t1 = time.perf_counter()
    warm_ds = ray.data.read_parquet(out_dir)
    wds, _ = run_pagerank(g, iterations=10, result="dataset",
                          warm_ranks_ds=warm_ds)
    warm_out = f"/tmp/powergraph_ray/rss_warm_out_{nv}"
    shutil.rmtree(warm_out, ignore_errors=True)
    wds.write_parquet(warm_out)
    warm_wall = time.perf_counter() - t1
    peak_warm = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

    # TSC leg (the spectral/Lanczos family): 8 Krylov steps with
    # result="dataset" — the basis lives as plasma range chunks, the driver
    # sees scalars/(j+1)-vectors per step, and the estimate Dataset is
    # written straight from the chunk refs. An O(nv·m) driver Krylov basis
    # (the pre-round-5 shape) would add ~nv·8·8 bytes of driver RSS here.
    t2 = time.perf_counter()
    from powergraph_ray.graph.spectral import total_subgraph_centrality

    tsc_ds, _ = total_subgraph_centrality(g, max_m=8, result="dataset")
    tsc_out = f"/tmp/powergraph_ray/rss_tsc_out_{nv}"
    shutil.rmtree(tsc_out, ignore_errors=True)
    tsc_ds.write_parquet(tsc_out)
    tsc_wall = time.perf_counter() - t2
    peak_tsc = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

    print(json.dumps({
        "nv": nv, "num_edges": int(g.num_edges), "result_rows": int(n_rows),
        "driver_peak_rss_mib": round(peak / 1024, 1),
        "rss_before_pipeline_mib": round(rss0 / 1024, 1),
        "pipeline_delta_mib": round((peak - rss0) / 1024, 1),
        "warm_delta_mib": round((peak_warm - peak) / 1024, 1),
        "tsc_delta_mib": round((peak_tsc - peak_warm) / 1024, 1),
        "wall_seconds": round(wall, 1),
        "warm_wall_seconds": round(warm_wall, 1),
        "tsc_wall_seconds": round(tsc_wall, 1),
        "vid_table_on_driver": g._vids_cache is not None,
    }))
    g.close()
    ray.shutdown()


def compare(sizes=(1_000_000, 4_000_000)) -> None:
    rows = []
    for nv in sizes:
        out = subprocess.run([sys.executable, os.path.abspath(__file__), str(nv)],
                             capture_output=True, text=True, cwd=REPO,
                             timeout=3600)
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        if not line:
            raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])
        rows.append(json.loads(line[-1]))
    a, b = rows
    print(json.dumps({
        "sizes": rows,
        "nv_ratio": b["nv"] / a["nv"],
        "pipeline_rss_delta_ratio": round(
            b["pipeline_delta_mib"] / max(a["pipeline_delta_mib"], 1e-9), 3),
        "warm_rss_delta_mib": [a["warm_delta_mib"], b["warm_delta_mib"]],
        "tsc_rss_delta_mib": [a["tsc_delta_mib"], b["tsc_delta_mib"]],
    }, indent=2))


if __name__ == "__main__":
    if "--compare" in sys.argv:
        compare()
    else:
        measure(int(sys.argv[1]))
