"""Benchmark: BFM travel-time solve on the reference's benchmark annulus.

Task-matched to the reference benchmark (benchmarks/gpu.jl: init_annulus
with ntheta=180, nr=63, default 20 km secondary spacing, AK135 Vp, single
surface source).  Reference wall-clock per solve on that grid
(benchmarks/GPU_*_star1_NOreorder_new.csv): 6.05 s CPU 1 thread,
2.31 s CPU 4 threads, 1.11 s GTX 1660 Ti.

Note: the reference's mesher duplicates secondary nodes due to an edge
bookkeeping bug (328,510 nodes); this implementation builds the intended
deduplicated graph of the same physical task (~150k nodes, same geometric
coverage and accuracy).

Prints ONE JSON line:
  metric   : single-source BFM solve wall-clock on the 180x63 AK135 annulus
  value    : seconds per solve (median of 3, compiled, device-synced)
  vs_baseline: speedup vs the 4-thread CPU reference (2.31 s / value)
"""
import json
import sys
import time

import numpy as np

BASELINE_4T = 2.31   # s, reference CPU 4 threads (GPU_4_threads_star1_NOreorder_new.csv:4)
BASELINE_1T = 6.05   # s, reference CPU 1 thread
NTHETA, NR, SPACING = 180, 63, 20.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import os

    import jax

    # persistent compile cache: the Pallas kernel compile is minutes-long,
    # cache it across bench runs
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import raytracer_tpu as rt
    from raytracer_tpu.config import R, SolverConfig

    t0 = time.time()
    gr, A, halo = rt.init_annulus(NTHETA, NR, spacing=SPACING)
    log(f"grid build: {time.time()-t0:.1f}s  nodes={gr.nnods} edges={A.nnz}")

    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    Vp = rt.interpolate_velocity(gr.r, interp)

    cfg = SolverConfig(dtype="float32")
    t0 = time.time()
    solver = rt.AnnulusSolver(gr, A, halo, Vp, cfg)
    log(f"solver pack ({solver.method}): {time.time()-t0:.1f}s")

    source = rt.closest_point(gr, 0.0, R, system="polar")

    # warm-up / compile
    t0 = time.time()
    D = solver.solve(source, want_prev=False)
    log(f"first solve (compile+run): {time.time()-t0:.1f}s  iters={solver.last_iterations}")

    times = []
    for _ in range(3):
        t0 = time.time()
        D = solver.solve(source, want_prev=False)
        times.append(time.time() - t0)
    t_single = float(np.median(times))
    log(f"single-source solve: {t_single*1e3:.0f} ms (runs: {[f'{t*1e3:.0f}' for t in times]})")

    # sanity: physical travel time at 60 degrees
    rec = rt.closest_point(gr, np.deg2rad(60.0), R, system="polar")
    t60 = float(D.dist[rec])
    log(f"travel time at 60 deg: {t60:.2f} s (AK135 P ~ 600 s)")
    assert 550.0 < t60 < 750.0, f"unphysical travel time {t60}"

    # batched throughput (8 sources through the Pallas row axis)
    degs = np.linspace(0.0, 175.0, 8)
    sources = [rt.closest_point(gr, np.deg2rad(d), R, system="polar") for d in degs]
    receivers = [rec]
    solver.travel_time_table(sources, receivers)  # warm
    t0 = time.time()
    solver.travel_time_table(sources, receivers)
    t_batch = (time.time() - t0) / len(sources)
    log(f"batched 8-source: {t_batch*1e3:.0f} ms/source")

    edges_per_iter = int(np.isfinite(solver.circulant.w).sum()) * gr.ntheta if solver.circulant is not None else A.nnz
    if solver.last_iterations:
        log(f"edge relaxations/sec: {edges_per_iter * solver.last_iterations / t_single / 1e9:.2f} G")

    print(json.dumps({
        "metric": "BFM single-source solve wall-clock, 180x63 AK135 annulus (ref CPU-4t 2.31s, 1t 6.05s)",
        "value": round(t_single, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_4T / t_single, 2),
    }))


if __name__ == "__main__":
    main()
