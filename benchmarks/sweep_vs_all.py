"""Same-session comparison of the directional-sweep solver against the
Jacobi kernel paths (twrapped / stream) across grid sizes, on the real
chip.  Drives the auto-policy crossover and results_tpu.csv updates.

Measurement discipline (PERF_NOTES.md): min-of-N wall clock of
device-resident solves (device_dist=True pulls only the bundled
iteration counts - one tunnel round trip), plus an 8-source x
74-receiver table per method.
"""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig
from raytracer_tpu.utils.cache import init_annulus_cached

CONFIGS = [
    (180, 63, 20.0), (360, 120, 20.0), (720, 200, 20.0),
    (1080, 300, 20.0), (1440, 400, 10.0), (2160, 600, 10.0),
    (2880, 800, 5.0),
]


def run(i):
    ntheta, nr, spacing = CONFIGS[i]
    gr, A, halo = init_annulus_cached(ntheta, nr, spacing=spacing,
                                      cache_dir="/root/repo/.cache")
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = rt.interpolate_velocity(gr.r, interp)
    cfg = SolverConfig(dtype="float32")
    src = rt.closest_point(gr, 0.0, R, system="polar")
    degs = np.linspace(0.0, 175.0, 8)
    sources = [rt.closest_point(gr, np.deg2rad(d), R, system="polar")
               for d in degs]
    recs = [rt.closest_point(gr, np.deg2rad(d), R, system="polar")
            for d in np.linspace(5.0, 178.0, 74)]
    print(f"=== {ntheta}x{nr} sp{spacing:g} nodes={gr.nnods}", flush=True)
    tables = {}
    for method in ("sweep", "stream", "twrapped"):
        if method == "twrapped" and gr.nnods > 900_000:
            continue  # exceeds the monolithic VMEM budget
        try:
            sv = rt.AnnulusSolver(gr, A, halo, U, cfg, method=method,
                                  cache_dir="/root/repo/.cache")
            t0 = time.time()
            sv.solve(src, want_prev=False, device_dist=True)
            c = time.time() - t0
            ts = []
            for _ in range(5):
                t0 = time.time()
                D = sv.solve(src, want_prev=False, device_dist=True)
                ts.append(time.time() - t0)
            t_solve = min(ts)
            t0 = time.time()
            tab = sv.travel_time_table(sources, recs)
            tab = sv.travel_time_table(sources, recs)  # warm
            t0 = time.time()
            tab = sv.travel_time_table(sources, recs)
            t_tab = time.time() - t0
            tables[method] = tab
            print(f"{method:9s}: compile {c:6.1f}s  solve {t_solve*1e3:7.1f} ms "
                  f"iters={sv.last_iterations:4d}  "
                  f"8src-table {t_tab/8*1e3:6.1f} ms/src", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{method:9s}: FAILED {type(e).__name__}: {e}", flush=True)
    ms = list(tables)
    for m in ms[1:]:
        d = float(np.max(np.abs(tables[m] - tables[ms[0]])))
        print(f"  table max|{m}-{ms[0]}| = {d:.3e}", flush=True)


if __name__ == "__main__":
    for a in sys.argv[1:]:
        run(int(a))
