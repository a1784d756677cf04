"""Grid-size benchmark sweep, reproducing the reference's benchmark matrix.

Equivalent of benchmarks/gpu.jl + process_benchmark.jl: sweeps the same
(ntheta, nr) configurations, times Dijkstra (host baseline) and the TPU
BFM solves, and writes a CSV shaped like the reference's
`GPU_*_star1_NOreorder_new.csv` result files.

Usage:  python benchmarks/sweep.py [--out benchmarks/results_tpu.csv]
                                   [--configs small|full] [--method auto]
"""
import argparse
import csv
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    # (ntheta, nr) rows of the reference CSVs (benchmarks/gpu.jl:70-71);
    # the degenerate (5, 5) row is omitted by default: at ntheta=5 the
    # seam-spanning edges break the circulant symmetry and the run falls
    # back to the (slow-on-TPU) ELL path - it works, but dominates the
    # sweep wall-clock for a 1,015-node toy grid
    "full": [(90, 32), (180, 63), (180, 90)],
    "small": [(90, 32), (180, 63)],
    "tiny": [(5, 5), (45, 16)],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "results_tpu.csv"))
    ap.add_argument("--configs", default="small", choices=list(CONFIGS))
    ap.add_argument("--method", default="auto")
    ap.add_argument("--skip-dijkstra", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )

    import raytracer_tpu as rt
    from raytracer_tpu.config import R, SolverConfig
    from raytracer_tpu.utils.cache import init_annulus_cached

    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    cfg = SolverConfig(dtype="float32")

    rows = []
    for ntheta, nr in CONFIGS[args.configs]:
        t0 = time.time()
        gr, A, halo = init_annulus_cached(ntheta, nr, spacing=20.0, cache_dir=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache"))
        t_build = time.time() - t0
        Vp = rt.interpolate_velocity(gr.r, interp)
        source = rt.closest_point(gr, 0.0, R, system="polar")

        t_dij = float("nan")
        if not args.skip_dijkstra:
            t0 = time.time()
            rt.dijkstra(A, halo, source, gr, Vp, cfg)
            t_dij = time.time() - t0

        solver = rt.AnnulusSolver(gr, A, halo, Vp, cfg, method=args.method)
        solver.solve(source, want_prev=False)  # compile
        t0 = time.time()
        solver.solve(source, want_prev=False)
        t_bfm = time.time() - t0

        row = {
            "nodes": gr.nnods,
            "ntheta": ntheta,
            "nr": nr,
            "build_s": round(t_build, 3),
            "dijkstra_host_s": round(t_dij, 4),
            "bfm_tpu_s": round(t_bfm, 4),
            "method": solver.method,
            "iters": solver.last_iterations,
        }
        rows.append(row)
        print(row, flush=True)

    with open(args.out, "w", newline="") as f:
        wr = csv.DictWriter(f, fieldnames=list(rows[0]))
        wr.writeheader()
        wr.writerows(rows)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
