"""Linearized travel-time tomography on the annulus, end to end.

The reference computes first arrivals and ray paths and stops there
(main_annulus.jl:80-98) - its users assemble tomography by hand.  This
driver closes the loop natively:

  1. forward-solve a perturbed Earth (checkerboard velocity anomaly) for
     "observed" first-arrival times over a source/receiver fan,
  2. trace rays in the AK135 background and assemble the exact
     sensitivity matrix G[ray, node] = dt/dU (solvers/sensitivity.py),
  3. invert the travel-time residuals with damped normal equations
     solved by jax.scipy CG - dense matmuls, the MXU-friendly shape.

Linearized (single-iteration) tomography: rays are traced in the
background model, exact to first order by Fermat's principle.

Usage: python example_tomography.py [--ntheta 64 --nr 16 --spacing 100]
"""
from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

import raytracer_tpu as rt
from raytracer_tpu.config import R, DISCONTINUITY_RADII, SolverConfig

R_CMB = DISCONTINUITY_RADII[-1]        # 2891.5 km depth


def checkerboard(gr, amplitude=0.03, k_theta=6, n_r=4):
    """Multiplicative +-amplitude cells over the mantle (r > R_CMB);
    zero in the core where this fan has no coverage."""
    theta = np.asarray(gr.theta)
    r = np.asarray(gr.r)
    band = (r - R_CMB) / (R - R_CMB)
    cell = np.sign(np.sin(k_theta * theta) * np.sin(np.pi * n_r * band))
    return np.where(r > R_CMB, amplitude * cell, 0.0)


def forward(gr, A, halo, U, cfg, sources, receivers):
    """(n_src, n_rec) first-arrival times + per-source prev trees."""
    solver = rt.AnnulusSolver(gr, A, halo, U, cfg)
    T = np.empty((len(sources), len(receivers)))
    prevs = []
    for i, s in enumerate(sources):
        D = solver.solve(s)
        T[i] = D.dist[receivers]
        prevs.append(D.prev)
    return T, prevs


def assemble_G(gr, halo, U, prevs, sources, receivers, max_len):
    """Stack per-source device sensitivity matrices: (n_rays, n)."""
    blocks = [rt.sensitivity_matrix(gr, U, prev, s, receivers, max_len,
                                    halo)
              for s, prev in zip(sources, prevs)]
    return jnp.concatenate(blocks, axis=0)


@jax.jit
def invert(G, residual, damping):
    """Damped least squares dU = argmin ||G dU - r||^2 + damp^2||dU||^2
    via CG on the normal equations (all dense matmuls)."""
    GtG = G.T @ G
    rhs = G.T @ residual
    n = GtG.shape[0]
    Areg = GtG + (damping ** 2) * jnp.eye(n, dtype=G.dtype)
    x, _ = jax.scipy.sparse.linalg.cg(lambda v: Areg @ v, rhs, maxiter=200)
    return x


def run(ntheta=64, nr=16, spacing=100.0, amplitude=0.03, verbose=True,
        n_src=12, n_rec=36):
    cfg = SolverConfig(dtype="float64")
    t0 = time.time()
    gr, A, halo = rt.init_annulus(ntheta, nr, spacing=spacing)
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U0 = rt.interpolate_velocity(gr.r, interp)        # background
    anomaly = checkerboard(gr, amplitude)
    U_true = U0 * (1.0 + anomaly)

    degs_src = np.linspace(0.0, 330.0, n_src)
    degs_rec = np.linspace(5.0, 355.0, n_rec)
    sources = [rt.closest_point(gr, np.deg2rad(d), R, system="polar")
               for d in degs_src]
    receivers = [rt.closest_point(gr, np.deg2rad(d), R, system="polar")
                 for d in degs_rec]
    if verbose:
        print(f"grid {gr.nnods} nodes, {len(sources)} sources x "
              f"{len(receivers)} receivers  (build {time.time()-t0:.1f}s)")

    T_obs, _ = forward(gr, A, halo, U_true, cfg, sources, receivers)
    T_bg, prevs = forward(gr, A, halo, U0, cfg, sources, receivers)
    residual = jnp.asarray((T_obs - T_bg).ravel())

    max_len = 4 * (ntheta + nr)
    G = assemble_G(gr, halo, U0, prevs, sources, receivers, max_len)

    # scale damping to the problem: a few percent of the typical
    # diagonal keeps the checkerboard while suppressing null-space noise
    damping = 0.05 * float(jnp.sqrt(jnp.mean(jnp.sum(G * G, axis=0))))
    dU = invert(G, residual, damping)

    pred = G @ dU
    mis0 = float(jnp.linalg.norm(residual))
    mis1 = float(jnp.linalg.norm(residual - pred))
    rec_frac = np.asarray(dU) / U0                    # recovered dU/U
    covered = np.asarray(jnp.sum(G != 0, axis=0)) >= 3
    corr = np.corrcoef(rec_frac[covered], anomaly[covered])[0, 1]
    if verbose:
        print(f"rays {G.shape[0]}, covered nodes {covered.sum()}/{gr.nnods}")
        print(f"misfit {mis0:.2f} -> {mis1:.2f} s "
              f"({100 * (1 - mis1 / mis0):.0f}% reduction)")
        print(f"checkerboard correlation (covered nodes): {corr:.2f}")
    return {"misfit0": mis0, "misfit1": mis1, "corr": corr,
            "covered": covered, "rec_frac": rec_frac, "anomaly": anomaly}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--ntheta", type=int, default=64)
    ap.add_argument("--nr", type=int, default=16)
    ap.add_argument("--spacing", type=float, default=100.0)
    ap.add_argument("--amplitude", type=float, default=0.03)
    args = ap.parse_args()
    run(args.ntheta, args.nr, args.spacing, args.amplitude)
