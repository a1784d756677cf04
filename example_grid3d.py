"""3-D spherical-shell demo: the reference's example3Dgrid.jl equivalent,
extended with an actual multi-source AK135 solve (BASELINE config #5).

Builds a (theta, phi, r) wedge grid and solves first-arrival travel
times from a few surface sources, printing a small travel-time table.
Default engine is the production stencil path (`solve3d` + the
ops/sweep3d.py Pallas kernel, source-batched); --engine ell runs the
same solve on the generic ELL BFM (the star>0 fallback) instead.
"""
import argparse
import time

import numpy as np

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig
from raytracer_tpu.utils.coords import spherical2cart


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, nargs=3, default=[24, 24, 16], metavar=("NT", "NP", "NR"))
    ap.add_argument("--depth", type=float, default=2000.0)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--engine", default="stencil", choices=["stencil", "ell"],
                    help="stencil = solve3d fast path; ell = generic ELL BFM")
    args = ap.parse_args()

    c0 = (np.deg2rad(70.0), np.deg2rad(70.0), R - args.depth)
    c1 = (np.deg2rad(110.0), np.deg2rad(110.0), R)
    t0 = time.time()
    g = rt.grid3d(c0, c1, args.n)
    print(f"grid: {g.nnods_total} nodes, {g.nel_total} hexa elements "
          f"({time.time()-t0:.1f}s)")

    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = interp(g.r)

    cfg = SolverConfig(dtype=args.dtype)

    # surface sources along the wedge diagonal
    degs = [(75.0, 75.0), (90.0, 90.0), (105.0, 105.0)]
    sources = [rt.closest_point3d(g, *spherical2cart(np.deg2rad(a), np.deg2rad(b), R)) for a, b in degs]
    receivers = [rt.closest_point3d(g, *spherical2cart(np.deg2rad(a), np.deg2rad(b), R))
                 for a, b in [(80.0, 80.0), (90.0, 75.0), (105.0, 95.0)]]

    if args.engine == "stencil":
        from raytracer_tpu.solvers.solve3d import prepare3d, solve3d

        packed = prepare3d(g, U, cfg)
        t0 = time.time()
        table, iters = solve3d(g, U, sources, cfg, receivers=receivers,
                               _packed=packed)
        print(f"multi-source solve (stencil): {time.time()-t0:.2f}s "
              f"({iters} iterations)")
    else:
        A = rt.nodal_incidence3d(g)
        print(f"graph: {A.nnz} edges")
        empty_halo = np.empty((0, 2), np.int64)
        gdev = rt.prepare(A, empty_halo, g, U, cfg)
        t0 = time.time()
        D = rt.solve_many(gdev, sources, cfg)
        print(f"multi-source solve (ell): {time.time()-t0:.2f}s")
        table = D.dist[:, receivers]
    print("travel-time table (s):")
    for (a, b), row in zip(degs, table):
        print(f"  src ({a:.0f},{b:.0f}) deg: " + "  ".join(f"{t:8.2f}" for t in row))


if __name__ == "__main__":
    main()
