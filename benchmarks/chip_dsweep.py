"""On-chip benchmark: directional-sweep engines vs production paths.

Usage: python /tmp/chip_dsweep.py [--fast] [config_index ...]
Configs: 0=180x63sp20 1=1080x300sp20 2=1440x400sp10 3=2160x600sp10
         4=2880x800sp5 5=4320x1200sp5 (~15M nodes, streamed/sweep only)
         6=270x63sp20 7=5760x1600sp5 8=8640x2400sp5 (20.9M, flagship)
--fast: build via the O(M) wedge circulant builder
        (models/fast_annulus.py) instead of materialising the n-node
        graph - identical stencil (tested), seconds instead of minutes
        of host build at 10M+ nodes.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig
from raytracer_tpu.utils.cache import init_annulus_cached

CONFIGS = [(180, 63, 20.0), (1080, 300, 20.0), (1440, 400, 10.0),
           (2160, 600, 10.0), (2880, 800, 5.0), (4320, 1200, 5.0),
           (270, 63, 20.0),   # 6: the reference's 6-thread config
           (5760, 1600, 5.0),  # 7: ~12M nodes (edge stream ~1B, int32-safe)
           (8640, 2400, 5.0),  # 8: 20.9M nodes, lane-blocked sweep
           (11520, 3200, 5.0),  # 9: ~37M nodes (--fast only) - ceiling probe
           (14400, 4000, 5.0)]  # 10: ~58M nodes (--fast only) - ceiling probe
FAST = "--fast" in sys.argv
sel = [int(a) for a in sys.argv[1:] if not a.startswith("-")] or [0, 1, 3]

for ci in sel:
    ntheta, nr, spacing = CONFIGS[ci]
    t0 = time.time()
    if FAST:
        gr, cg, U = rt.init_annulus_circulant(ntheta, nr, spacing=spacing)
        A = halo = None
    else:
        gr, A, halo = init_annulus_cached(ntheta, nr, spacing=spacing,
                                          cache_dir="/root/repo/.cache")
        cg = None
        prof = rt.velocity_profile("ak135")
        interp = rt.LinearInterpolation(prof.r, prof.Vp)
        U = rt.interpolate_velocity(gr.r, interp)
    cfg = SolverConfig(dtype="float32")
    print(f"--- {ntheta}x{nr} sp{spacing:g} nodes={gr.nnods} "
          f"build{' FAST' if FAST else ''} {time.time()-t0:.1f}s", flush=True)
    src = rt.closest_point(gr, 0.0, R, system="polar")

    ref_field = {}

    def run(name, method, **kw):
        try:
            t0 = time.time()
            solver = rt.AnnulusSolver(gr, A, halo, U, cfg, method=method,
                                      cache_dir=(None if FAST
                                                 else "/root/repo/.cache"),
                                      circulant=cg)
            pack_s = time.time() - t0
            t0 = time.time()
            D = solver.solve(src, want_prev=False, **kw)
            compile_s = time.time() - t0
            times = []
            for _ in range(3):
                t0 = time.time()
                D = solver.solve(src, want_prev=False, **kw)
                times.append(time.time() - t0)
            it = solver.last_iterations
            dist = np.asarray(D.dist)
            tag = "dev" if kw.get("device_dist") else "mat"
            print(f"{name:16s} [{tag}] pack {pack_s:5.1f}s  compile+1st "
                  f"{compile_s:6.1f}s  steady {min(times)*1e3:7.1f} ms  "
                  f"iters={it}", flush=True)
            if not kw.get("device_dist"):
                if "ref" not in ref_field:
                    ref_field["ref"] = dist
                else:
                    print(f"   max|diff vs first| = "
                          f"{np.max(np.abs(dist - ref_field['ref'])):.3e}",
                          flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    # auto routes to 'sweep' since r03; request the Jacobi kernels
    # explicitly so the comparison stays a comparison
    jac = "twrapped" if gr.nnods < 350_000 else "stream"
    run(f"{jac} (jacobi)", jac)
    run(f"{jac} (jacobi)", jac, device_dist=True)
    run("sweep (pallas)", "sweep")
    run("sweep (pallas)", "sweep", device_dist=True)
