"""Regenerate docs/error.png: SPM minus ray theory, raw and bent.

The reference repo commits error.png (its SPM-vs-TauP curve); this is
the equivalent for this build, now with the bending-refined curve
(solvers/refine.py) on the same axis - the discretisation bias and its
cure in one figure.  CPU-safe: exact Dijkstra + vmapped Adam bending.

Run: python benchmarks/error_figure.py   (forces the CPU platform)
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import scipy.sparse.csgraph as csgraph

from accuracy import build, weight_matrix  # noqa: E402  (benchmarks dir)

# validated default palette (dataviz reference instance): categorical
# slots 1-2 on the light surface
C_SPM, C_REF = "#2a78d6", "#eb6834"
SURFACE, INK, INK2 = "#fcfcfb", "#0b0b0b", "#52514e"


def main(ntheta=180, nr=63, spacing=20.0, out="docs/error.png"):
    import raytracer_tpu as rt
    from raytracer_tpu.config import R
    from raytracer_tpu.models.raytheory import ak135_first_arrivals

    gr, A, halo, Vp = build(ntheta, nr, spacing)
    src = rt.closest_point(gr, 0.0, R, system="polar")
    W = weight_matrix(gr, A, halo, Vp)
    dist, prev = csgraph.dijkstra(W.T, directed=True, indices=src,
                                  return_predecessors=True)
    degs = np.arange(4.0, 96.0, 2.0)
    paths, snap, spm = [], [], []
    for d in degs:
        rec = rt.closest_point(gr, np.deg2rad(d), R, system="polar")
        ids = [rec]
        while prev[ids[-1]] >= 0:
            ids.append(int(prev[ids[-1]]))
        ids = np.asarray(ids)
        paths.append(np.stack([gr.x[ids], gr.z[ids]], axis=1))
        snap.append(float(np.rad2deg(gr.theta[rec])))
        spm.append(float(dist[rec]))
    prof = rt.velocity_profile("ak135")
    _, t_ref = rt.refine_paths_batch(paths, prof.r, prof.Vp,
                                     m=192, iters=1200)
    anchors = ak135_first_arrivals(snap)
    e_spm = np.asarray(spm) - anchors
    e_ref = np.asarray(t_ref) - anchors

    fig, ax = plt.subplots(figsize=(7.2, 4.2), dpi=160)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)
    ax.axhline(0.0, color=INK2, lw=0.8, alpha=0.5)
    ax.plot(degs, e_spm, color=C_SPM, lw=2.0, label="SPM (graph path)")
    ax.plot(degs, e_ref, color=C_REF, lw=2.0,
            label="bending-refined (solvers/refine.py)")
    ax.set_xlabel("epicentral distance (deg)", color=INK)
    ax.set_ylabel("first arrival − ray theory (s)", color=INK)
    ax.set_title(f"AK135 {ntheta}x{nr} annulus, spacing {spacing:g} km: "
                 "discretisation bias and its cure", color=INK, fontsize=11)
    ax.grid(True, color=INK2, alpha=0.15, lw=0.6)
    for s in ax.spines.values():
        s.set_color(INK2)
        s.set_alpha(0.4)
    ax.tick_params(colors=INK2)
    ax.legend(frameon=False, labelcolor=INK)
    fig.tight_layout()
    fig.savefig(out, facecolor=SURFACE)
    print(f"wrote {out}: SPM bias {e_spm.mean():+.2f} s mean "
          f"(max {np.abs(e_spm).max():.2f}), refined {e_ref.mean():+.2f} s "
          f"(max {np.abs(e_ref).max():.2f})")


if __name__ == "__main__":
    main()
