"""Locator accuracy vs grid spacing (VERDICT r03 item 9).

Twin experiment: observations are synthesised on a FINE reference grid
(its SPM bias is the smallest of the set and common to all stations, so
it largely enters the origin time, not the position), then events are
located on progressively coarser grids with and without bending and
with pick noise -- mirroring ACCURACY.md section 2's travel-time
convergence table for the location layer.  Emits a markdown table.

Usage: python benchmarks/locate_convergence.py [--quick]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig
from raytracer_tpu.solvers.locate import locate, station_fields

CFG = SolverConfig(dtype="float32")


def polar(gr, idx):
    return np.array([gr.x[idx], gr.z[idx]])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)

    # fine truth grid: synthesize picks from bent (continuous-functional)
    # station->event times
    fine = (160, 28, 25.0) if not args.quick else (100, 18, 60.0)
    gr_f, A_f, halo_f = rt.init_annulus(*fine[:2], spacing=fine[2])
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U_f = rt.interpolate_velocity(gr_f.r, interp)
    solver_f = rt.AnnulusSolver(gr_f, A_f, halo_f, U_f, CFG, method="auto")

    st_deg = np.array([15.0, 55.0, 95.0, 140.0, 200.0, 290.0])
    stations_f = [rt.closest_point(gr_f, np.deg2rad(d), R, system="polar")
                  for d in st_deg]
    n_ev = 6 if not args.quick else 3
    ev_theta = rng.uniform(np.deg2rad(30.0), np.deg2rad(120.0), n_ev)
    ev_r = rng.uniform(4500.0, 6100.0, n_ev)
    events_f = [rt.closest_point(gr_f, t, r_, system="polar")
                for t, r_ in zip(ev_theta, ev_r)]
    F = station_fields(solver_f, stations_f)
    t_true = np.stack([F[:, e] for e in events_f])     # (n_ev, K) SPM
    ev_xy = np.stack([polar(gr_f, e) for e in events_f])

    rows = []
    spacings = [(120, 20, 60.0), (160, 28, 40.0), (200, 36, 25.0)]
    if args.quick:
        spacings = spacings[:2]
    for (nt, nr, sp) in spacings:
        gr, A, halo = rt.init_annulus(nt, nr, spacing=sp)
        U = rt.interpolate_velocity(gr.r, interp)
        solver = rt.AnnulusSolver(gr, A, halo, U, CFG, method="auto")
        stations = [rt.closest_point(gr, np.deg2rad(d), R, system="polar")
                    for d in st_deg]
        t0 = time.time()
        fields = station_fields(solver, stations)
        t_fields = time.time() - t0
        for noise in (0.0, 0.2):
            for bend in (False, True):
                errs = []
                for i in range(n_ev):
                    t_obs = t_true[i] + rng.normal(0.0, noise, len(st_deg))
                    loc = locate(solver, stations, t_obs, fields=fields,
                                 refine=True, bend=bend,
                                 profile=(prof.r, prof.Vp))
                    pos = np.array([loc.x, loc.z])
                    errs.append(np.linalg.norm(pos - ev_xy[i]))
                errs = np.array(errs)
                rows.append((sp, gr.nnods, noise, bend,
                             float(np.mean(errs)), float(np.median(errs)),
                             float(np.max(errs)), t_fields))
                print(f"| {sp:g} | {gr.nnods} | {noise:g} | "
                      f"{'yes' if bend else 'no'} | {np.mean(errs):.1f} | "
                      f"{np.median(errs):.1f} | {np.max(errs):.1f} |",
                      flush=True)
    print("\nheader: | spacing km | nodes | pick sigma s | bend | "
          "mean err km | median | max |")


if __name__ == "__main__":
    main()
