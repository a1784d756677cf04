"""On-chip: banded GS sweeps vs Jacobi banded on the production Delaunay."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig
from raytracer_tpu.models.annulus import node_adjacency
from raytracer_tpu.models.delaunay import add_midpoints, triangle_annulus_2d
from raytracer_tpu.ops.banded import prepare_banded, solve_banded, solve_banded_gs

t0 = time.time()
gr = add_midpoints(triangle_annulus_2d(nr=60, spacing=120.0))
A = node_adjacency(gr, star=0)
halo = np.empty((0, 2), np.int64)
prof = rt.velocity_profile("ak135")
interp = rt.LinearInterpolation(prof.r, prof.Vp)
U = rt.interpolate_velocity(gr.r, interp)
print(f"build {time.time()-t0:.1f}s nodes={gr.nnods} edges={A.nnz}", flush=True)

cfg = SolverConfig(dtype="float32")
bg = prepare_banded(A, halo, gr, U, cfg)
K = int(np.max(np.abs(bg.offsets_np)))
print(f"bandwidth={K} offsets={len(bg.offsets_np)} n_pad={bg.n_pad}", flush=True)
src = rt.closest_point(gr, 0.0, R, system="polar")
srcs8 = [rt.closest_point(gr, np.deg2rad(d), R, system="polar")
         for d in np.linspace(0.0, 175.0, 8)]

d_ref = None
for name, fn in (
    ("jacobi", lambda ss: solve_banded(bg, ss, cfg)),
    ("gs P=2", lambda ss: solve_banded_gs(bg, ss, cfg)),
    ("gs P=1", lambda ss: solve_banded_gs(bg, ss, cfg, passes=1)),
    ("gs P=3", lambda ss: solve_banded_gs(bg, ss, cfg, passes=3)),
    ("gs B=1024", lambda ss: solve_banded_gs(bg, ss, cfg, block=1024)),
):
    try:
        t0 = time.time()
        d, it = fn([src])
        c = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            d, it = fn([src])
            times.append(time.time() - t0)
        t0 = time.time()
        d8, it8 = fn(srcs8)
        t8 = time.time() - t0
        t0 = time.time()
        d8, it8 = fn(srcs8)
        t8 = min(t8, time.time() - t0)
        msg = ""
        if d_ref is None:
            d_ref = d[0]
        else:
            msg = f"  max|diff|={np.max(np.abs(d[0]-d_ref)):.2e}"
        print(f"{name:9s} compile {c:5.1f}s  single {min(times)*1e3:6.0f} ms "
              f"(iters={it})  8-src {t8/8*1e3:6.0f} ms/src (iters={it8}){msg}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
