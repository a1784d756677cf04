"""End-to-end driver: the TPU equivalent of the reference's
main_annulus.jl / README example.

Builds the 180x50 AK135 annulus, solves the travel-time field from a
surface source with the TPU BFM solver, reconstructs ray paths to the
reference's receiver fan (2..150 deg both sides), writes the travel-time
CSV + npz archive, and renders the ray-path figure.
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig
from raytracer_tpu.utils.timing import Timer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ntheta", type=int, default=180)
    ap.add_argument("--nr", type=int, default=50)
    ap.add_argument("--spacing", type=float, default=20.0)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--model", default="ak135")
    ap.add_argument("--wave", default="Vp", choices=["Vp", "Vs"])
    ap.add_argument("--method", default="auto",
                    choices=["auto", "sweep", "stream", "twrapped", "wrapped",
                             "diag", "circulant", "pallas", "fused", "banded",
                             "ell"])
    ap.add_argument("--out-prefix", default="annulus_run")
    ap.add_argument("--plot", action="store_true")
    ap.add_argument("--refine", action="store_true",
                    help="bend the receiver-fan paths to the continuous "
                         "Fermat minimum (solvers/refine.py) and write "
                         "<prefix>_travel_times_refined.csv")
    ap.add_argument("--q", type=float, default=None,
                    help="constant quality factor; writes "
                         "<prefix>_amplitude.csv with per-receiver t*, "
                         "geometrical spreading and relative amplitude "
                         "(models/amplitude.py)")
    ap.add_argument("--freq", type=float, default=1.0,
                    help="frequency (Hz) for the t* spectral decay")
    ap.add_argument("--phases", default=None,
                    help="comma-separated named phases (PcP,ScS,PP,SKS,"
                         "SKP,PKS,PKP,PKIKP,Pdiff,Sdiff,P,S); writes "
                         "<prefix>_phases.csv with one first-arrival "
                         "column per phase over the receiver fan "
                         "(solvers/phases.py; NaN where the phase has "
                         "no arrival)")
    ap.add_argument("--cache-dir", default=None,
                    help="disk cache for built grids and packed stencils "
                         "(e.g. .cache, shared with bench.py)")
    args = ap.parse_args()

    timer = Timer()
    cfg = SolverConfig(dtype=args.dtype)

    with timer.section("init_annulus"):
        if args.cache_dir:
            from raytracer_tpu.utils.cache import init_annulus_cached

            gr, A, halo = init_annulus_cached(args.ntheta, args.nr,
                                              spacing=args.spacing,
                                              cache_dir=args.cache_dir)
        else:
            gr, A, halo = rt.init_annulus(args.ntheta, args.nr, spacing=args.spacing)
    print(f"grid: {gr.nnods} nodes, {gr.nel} elements, {A.nnz} directed edges")

    source = rt.closest_point(gr, 0.0, R, system="polar")

    with timer.section("velocity"):
        prof = rt.velocity_profile(args.model)
        interp = rt.LinearInterpolation(prof.r, getattr(prof, args.wave))
        Vp = rt.interpolate_velocity(gr.r, interp)

    with timer.section("solver pack"):
        solver = rt.AnnulusSolver(gr, A, halo, Vp, cfg, method=args.method,
                                  cache_dir=args.cache_dir)
    print(f"solver method: {solver.method}")

    with timer.section("bfm solve (compile+run)"):
        solver.solve(source, want_prev=False)
    with timer.section("bfm solve (steady)"):
        solver.solve(source, want_prev=False)
    with timer.section("prev recovery"):
        D = solver.solve(source)
    if solver.last_iterations:
        print(f"Converged in {solver.last_iterations} iterations")

    # receiver fan: 2..150 deg on both sides (main_annulus.jl:62-63)
    degs = np.arange(2.0, 152.0, 2.0)
    degs = np.concatenate([degs, 360.0 - degs[::-1]])
    with timer.section("receivers+paths"):
        receivers = [rt.closest_point(gr, np.deg2rad(d), R, system="polar") for d in degs]
        paths = [rt.recontruct_path(D.prev, source, rec) for rec in receivers]

    with timer.section("outputs"):
        tt = rt.travel_times(D, gr, receivers, isave=True, flname=f"{args.out_prefix}_travel_times.csv")
        rt.save_solution_npz(f"{args.out_prefix}.npz", D, gr, source, paths)
        if args.plot:
            rt.plot_paths(gr, paths, source, receivers, fname=f"{args.out_prefix}_ray_paths.png")

    pts_bent = None
    if args.refine:
        with timer.section("bending refinement"):
            pts = [np.stack([gr.x[p], gr.z[p]], axis=1) for p in paths]
            pts_bent, t_ref = rt.refine_paths_batch(pts, prof.r,
                                                    getattr(prof, args.wave))
            np.savetxt(f"{args.out_prefix}_travel_times_refined.csv",
                       np.stack([degs, t_ref], axis=1), delimiter=",",
                       header="deg,refined_s", comments="")

    if args.q is not None:
        with timer.section("amplitude"):
            from raytracer_tpu.models.flatearth import RadialModel, cmb_radius

            v = getattr(prof, args.wave)
            dd = np.minimum(degs, 360.0 - degs)   # mirrored fan side
            # analytic piecewise-linear branch derivative (full-resolution
            # table; no subsample, no argmin quantisation - ADVICE r03 1+3)
            mdl = RadialModel(prof.r, v)
            Rg = mdl.spreading(dd, n_p=8000,
                               diff_radii=(cmb_radius(args.model),))
            # t* along the bent polylines when --refine produced them, so
            # the amplitude CSV and the refined CSV share one geometry
            # (ADVICE r03 item 4); raw SPM backtraces otherwise
            if pts_bent is not None:
                polylines = list(pts_bent)
            else:
                polylines = [np.stack([gr.x[p], gr.z[p]], axis=1)
                             for p in paths]
            ts = np.array([rt.tstar(pl, prof.r, v, args.q)
                           for pl in polylines])
            # interface-diffracted first arrivals (core shadow) have no
            # ray-theory spreading: emit NaN + valid=0 instead of inf/0.0
            # (ADVICE r03 item 2)
            valid = np.isfinite(Rg)
            amp = np.where(valid,
                           rt.attenuation_factor(ts, args.freq)
                           / np.where(valid, Rg, 1.0), np.nan)
            Rg_out = np.where(valid, Rg, np.nan)
            # PcP/P amplitude ratio: spreading ratio x CMB Zoeppritz
            # reflection (PREM densities) x t* ratio (models/zoeppritz.py)
            from raytracer_tpu.models.zoeppritz import pcp_p_amplitude_ratio

            pcp_ratio = pcp_p_amplitude_ratio(dd, model=args.model,
                                              q_factor=args.q,
                                              freq_hz=args.freq)
            np.savetxt(
                f"{args.out_prefix}_amplitude.csv",
                np.stack([degs, ts, Rg_out, amp, pcp_ratio,
                          valid.astype(float)], axis=1), delimiter=",",
                header="deg,tstar_s,spreading_km,rel_amp,pcp_p_ratio,valid\n"
                       "# spreading/rel_amp are NaN with valid=0 where the "
                       "first arrival is interface-diffracted (core shadow); "
                       "pcp_p_ratio is NaN beyond the PcP branch",
                comments="")

    if args.phases:
        with timer.section("named phases"):
            from raytracer_tpu.solvers.phases import phase_travel_times

            interpret = jax.devices()[0].platform != "tpu"
            Vp_tab = rt.interpolate_velocity(
                gr.r, rt.LinearInterpolation(prof.r, prof.Vp))
            Vs_tab = rt.interpolate_velocity(
                gr.r, rt.LinearInterpolation(prof.r, prof.Vs))
            reuse: dict = {}
            cols, names = [degs], ["deg"]
            for name in [s.strip() for s in args.phases.split(",")
                         if s.strip()]:
                p = name.upper()
                Utab = Vs_tab if p in ("S", "SDIFF", "SCS") else Vp_tab
                Ustab = Vs_tab if p in ("SKS", "SKP", "PKS") else None
                t = np.asarray(phase_travel_times(
                    A, halo, source, gr, Utab, name, cfg,
                    receivers=receivers, interpret=interpret, Us=Ustab,
                    _reuse=reuse), dtype=np.float64)
                cols.append(np.where(np.isfinite(t), t, np.nan))
                names.append(name)
            np.savetxt(f"{args.out_prefix}_phases.csv",
                       np.stack(cols, axis=1), delimiter=",",
                       header=",".join(names) + "\n# NaN = phase has no "
                       "arrival at that receiver (outside its region or "
                       "branch)", comments="")

    print(timer.report())
    print(f"travel time at  60 deg: {tt[np.argmin(np.abs(degs - 60.0))]:.2f} s")
    print(f"travel time at 150 deg: {tt[np.argmin(np.abs(degs - 150.0))]:.2f} s")
    if args.refine:
        i60 = np.argmin(np.abs(degs - 60.0))
        print(f"refined     at  60 deg: {t_ref[i60]:.2f} s")


if __name__ == "__main__":
    main()
