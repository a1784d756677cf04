"""3-D locator accuracy vs grid spacing (completes ACCURACY.md 2h).

The 3-D twin experiment mirroring benchmarks/locate_convergence.py:
observations synthesised on a FINE spherical-wedge grid, events located
on progressively coarser wedges (with/without bending, with/without
pick noise).  Position error in km.  Emits a markdown table.

Unlike the 2-D annulus (secondary nodes put the fine grid's SPM bias
well under a second), the 3-D structured grid's 26-point stencil at
~70-110 km node spacing carries SECONDS of direction-dependent SPM
bias even on the finest affordable wedge, and raw-SPM truth picks
would share that exact bias with the raw-SPM test fields — making the
no-bend locator look spuriously perfect (zero error on the shared
grid) and bending look harmful.  Real picks come from the continuous
Earth, so truth times here are the BENT fine-grid times (the same
continuous Fermat functional `bend=True` uses), which is the 3-D
equivalent of the 2-D experiment's premise.

Usage: python benchmarks/locate3d_convergence.py [--quick] [--tpu]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--tpu", action="store_true",
                    help="run the station solves on the default backend "
                         "(TPU) instead of forcing CPU")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    import raytracer_tpu as rt
    from raytracer_tpu.config import R, SolverConfig
    from raytracer_tpu.models.grid3d import grid3d, velocity3d
    from raytracer_tpu.solvers.locate import locate_many3d, station_fields3d

    CFG = SolverConfig(dtype="float32")
    rng = np.random.default_rng(args.seed)

    # wedge: 40 x 30 deg, surface down into the lower mantle
    c0 = (0.0, 0.0, 4000.0)
    c1 = (np.deg2rad(40.0), np.deg2rad(30.0), R)
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)

    def build(nn):
        gr = grid3d(c0, c1, nn)
        return gr, velocity3d(gr, interp)

    def node_at(gr, th, ph, r_):
        n0, n1, n2 = gr.nnods
        i = int(round((th - c0[0]) / (c1[0] - c0[0]) * (n0 - 1)))
        j = int(round((ph - c0[1]) / (c1[1] - c0[1]) * (n1 - 1)))
        k = int(round((r_ - c0[2]) / (c1[2] - c0[2]) * (n2 - 1)))
        return i + j * n0 + k * n0 * n1

    # fine truth wedge
    fine_nn = (64, 48, 40) if not args.quick else (32, 24, 20)
    gr_f, U_f = build(fine_nn)

    # 8 surface stations spread over the wedge face
    st_th = np.deg2rad([5.0, 5.0, 20.0, 20.0, 35.0, 35.0, 12.0, 28.0])
    st_ph = np.deg2rad([5.0, 25.0, 10.0, 20.0, 5.0, 25.0, 15.0, 15.0])
    stations_f = [node_at(gr_f, t, p, R) for t, p in zip(st_th, st_ph)]

    n_ev = 6 if not args.quick else 3
    ev_th = rng.uniform(np.deg2rad(8.0), np.deg2rad(32.0), n_ev)
    ev_ph = rng.uniform(np.deg2rad(6.0), np.deg2rad(24.0), n_ev)
    ev_r = rng.uniform(4600.0, 6100.0, n_ev)
    events_f = [node_at(gr_f, t, p, r_)
                for t, p, r_ in zip(ev_th, ev_ph, ev_r)]

    engine = "auto" if args.tpu else "sweep"   # sweep: ~3 rounds on CPU
    t0 = time.time()
    F = station_fields3d(gr_f, U_f, stations_f, CFG, engine=engine)
    print(f"# fine fields {gr_f.nnods_total} nodes: {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    # truth picks: bent (continuous-functional) fine-grid times — see
    # module docstring.  Station prev trees cached across events.
    from raytracer_tpu.solvers.locate import _bent_times_and_dirs3d
    t0 = time.time()
    cache = {}
    t_true = np.stack([
        _bent_times_and_dirs3d(gr_f, U_f, stations_f, F, e,
                               (prof.r, prof.Vp), config=CFG,
                               _prev_cache=cache)[0]
        for e in events_f])
    spm_bias = np.stack([F[:, e] for e in events_f]) - t_true
    print(f"# bent truth picks: {time.time()-t0:.1f}s; fine-grid SPM "
          f"bias mean {spm_bias.mean():+.2f}s spread "
          f"{spm_bias.std():.2f}s", file=sys.stderr, flush=True)
    ev_xyz = np.stack([[gr_f.x[e], gr_f.y[e], gr_f.z[e]] for e in events_f])

    configs = [(32, 24, 20), (48, 36, 30), (64, 48, 40)]
    if args.quick:
        configs = configs[:2]
    for nn in configs:
        gr, U = build(nn)
        # nominal spacings (km) along theta at the surface and along r
        sp_th = R * (c1[0] - c0[0]) / (nn[0] - 1)
        sp_r = (R - c0[2]) / (nn[2] - 1)
        stations = [node_at(gr, t, p, R) for t, p in zip(st_th, st_ph)]
        t0 = time.time()
        fields = station_fields3d(gr, U, stations, CFG, engine=engine)
        t_fields = time.time() - t0
        for noise in (0.0, 0.2):
            for bend in (False, True):
                T_obs = t_true + rng.normal(0.0, noise, t_true.shape)
                locs = locate_many3d(gr, U, stations, T_obs, refine=True,
                                     fields=fields, bend=bend,
                                     profile=(prof.r, prof.Vp), config=CFG)
                errs = np.array([
                    np.linalg.norm([lc.x, lc.y, lc.z] - ev_xyz[i])
                    for i, lc in enumerate(locs)])
                print(f"| {sp_th:.0f}x{sp_r:.0f} | {gr.nnods_total} | "
                      f"{noise:g} | {'yes' if bend else 'no'} | "
                      f"{np.mean(errs):.1f} | {np.median(errs):.1f} | "
                      f"{np.max(errs):.1f} |", flush=True)
        print(f"# fields {gr.nnods_total} nodes: {t_fields:.1f}s",
              file=sys.stderr, flush=True)
    print("\nheader: | spacing th x r km | nodes | pick sigma s | bend | "
          "mean err km | median | max |")


if __name__ == "__main__":
    main()
