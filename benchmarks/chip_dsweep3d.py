"""On-chip benchmark: 3-D directional-sweep engine vs pallas Jacobi kernel.

Usage: python /tmp/chip_dsweep3d.py [n0 n1 n2]   (default 128 128 64)
Measures: single-source full-field, single-source receiver-only, and a
64-source x 1024-receiver table, for engine in (pallas, sweep) and (for
sweep) source_batch in (1, 4, 8).
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
from raytracer_tpu.models.grid3d import grid3d
from raytracer_tpu.solvers.solve3d import prepare3d, solve3d

dims = tuple(int(a) for a in sys.argv[1:4]) or (128, 128, 64)
cfg = SolverConfig(dtype="float32")
g3 = grid3d((np.deg2rad(60.0), np.deg2rad(60.0), R - 2500.0),
            (np.deg2rad(120.0), np.deg2rad(120.0), R), dims)
prof = rt.velocity_profile("ak135")
U3 = rt.LinearInterpolation(prof.r, prof.Vp)(g3.r)
packed = prepare3d(g3, U3, cfg)
n = len(g3)
print(f"grid {dims} = {n} nodes", flush=True)

rng = np.random.default_rng(0)
srcs64 = rng.integers(0, n, 64).tolist()
recs = rng.integers(0, n, 1024).tolist()
src = n - n // 2


def run(label, nsrc, **kw):
    try:
        ss = srcs64[:nsrc] if nsrc > 1 else [src]
        t0 = time.time()
        d, it = solve3d(g3, U3, ss, cfg, _packed=packed, **kw)
        compile_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            d, it = solve3d(g3, U3, ss, cfg, _packed=packed, **kw)
            times.append(time.time() - t0)
        per = min(times) / nsrc
        print(f"{label:34s} compile+1st {compile_s:6.1f}s  steady "
              f"{min(times)*1e3:8.1f} ms = {per*1e3:7.1f} ms/src  "
              f"iters={it}", flush=True)
        return d
    except Exception as e:  # noqa: BLE001
        print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)
        return None


d_ref = run("pallas single full-field", 1, engine="pallas")
d_sw = run("sweep  single full-field", 1, engine="sweep")
if d_ref is not None and d_sw is not None:
    print(f"max|pallas-sweep| = {np.max(np.abs(d_ref - d_sw)):.3e}",
          flush=True)
run("pallas 64-src table (auto batch)", 64, engine="pallas",
    receivers=recs)
run("sweep  64-src table (batch 1)", 64, engine="sweep", receivers=recs)
run("sweep  64-src table (batch 4)", 64, engine="sweep", receivers=recs,
    source_batch=4)
run("sweep  64-src table (batch 8)", 64, engine="sweep", receivers=recs,
    source_batch=8)
