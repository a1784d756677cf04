"""On-chip benchmark of the location layer (solvers/locate.py).

Workload: the production 180x63 annulus, 12 surface stations, a
synthetic 64-event catalogue.  Measures (a) the 12 station solves
(one twrapped table dispatch), (b) the batched one-dispatch grid
search, (c) full locate_many including the host Gauss-Newton steps.

Run on the chip: python benchmarks/chip_locate.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import raytracer_tpu as rt
    from raytracer_tpu.config import R, SolverConfig
    from raytracer_tpu.utils.cache import init_annulus_cached

    print("platform:", jax.devices()[0].platform, flush=True)
    t0 = time.time()
    gr, A, halo = init_annulus_cached(180, 63, spacing=20.0,
                                      cache_dir=os.path.join(repo, ".cache"))
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    Vp = rt.interpolate_velocity(gr.r, interp)
    solver = rt.AnnulusSolver(gr, A, halo, Vp, SolverConfig(dtype="float32"),
                              cache_dir=os.path.join(repo, ".cache"))
    print(f"build+pack ({solver.method}): {time.time()-t0:.1f}s", flush=True)

    degs = np.arange(0.0, 360.0, 30.0)
    stations = [rt.closest_point(gr, np.deg2rad(d), R, system="polar")
                for d in degs]
    t0 = time.time()
    fields = rt.station_fields(solver, stations)
    t_fields = time.time() - t0
    t0 = time.time()
    fields = rt.station_fields(solver, stations)
    t_fields_warm = time.time() - t0
    print(f"station fields (12 solves): cold {t_fields:.2f}s, "
          f"warm {t_fields_warm:.2f}s", flush=True)

    rng = np.random.default_rng(0)
    ev = rng.integers(0, gr.nnods, size=64)
    T_obs = fields[:, ev].T + rng.normal(0.0, 0.2, (64, len(stations)))

    # grid searches alone (one dispatch per 64-event block)
    import jax.numpy as jnp
    from raytracer_tpu.solvers.locate import _grid_search_catalogue_jit
    Tdev = jnp.asarray(np.asarray(fields, np.float64))
    w2 = jnp.ones(len(stations))
    j, t0j, m = _grid_search_catalogue_jit(Tdev, jnp.asarray(T_obs), w2)
    np.asarray(j)  # compile+run
    t0 = time.time()
    j, t0j, m = _grid_search_catalogue_jit(Tdev, jnp.asarray(T_obs), w2)
    np.asarray(j)
    t_search = time.time() - t0
    print(f"batched grid search (64 events): {t_search*1e3:.1f} ms "
          f"({t_search/64*1e3:.2f} ms/event)", flush=True)

    t0 = time.time()
    locs = rt.locate_many(solver, stations, T_obs,
                          sigma=[0.2] * len(stations), fields=fields)
    t_loc = time.time() - t0
    hits = sum(int(l.node) == int(e) for l, e in zip(locs, ev))
    print(f"locate_many (64 events, GN refine): {t_loc:.2f}s "
          f"({t_loc/64*1e3:.0f} ms/event); node hits {hits}/64", flush=True)


if __name__ == "__main__":
    main()
