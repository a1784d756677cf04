"""Alternative Delaunay-triangulated annulus mesher.

Equivalent of the reference's orphaned Triangulate.jl mesher
(src/SSSP/annulus/mesh.jl: triangle_annulus_2D, structured_convex_hull,
layered_domain, add_midpoints — never included by the module,
src/RayTracer.jl:12-22).  Built on scipy.spatial.Delaunay instead of the
C Triangle library: ring point sets (optionally aligned to the velocity
discontinuities), Delaunay triangulation with hole removal, and midpoint
insertion on triangle edges.

Produces a Grid2D so the generic ELL solver runs on it directly (the
unstructured mesh is NOT circulant; AnnulusSolver falls back to 'ell').
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import scipy.spatial

from ..config import DISCONTINUITY_RADII, R, R_INNER
from ..utils.coords import cartesian2polar, polar2cartesian
from .annulus import Grid2D, element_neighbours


def ring_points(radii: Sequence[float], spacing: float) -> np.ndarray:
    """Points on concentric rings, ~`spacing` km apart along each ring."""
    pts = []
    for r in radii:
        n = max(int(2 * np.pi * r // spacing), 6)
        t = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
        pts.append(np.stack(polar2cartesian(t, np.full(n, float(r))), axis=1))
    return np.concatenate(pts)


def triangle_annulus_2d(
    nr: int = 20,
    spacing: float = 400.0,
    r_out: float = R,
    r_in: float = R_INNER,
    layered: bool = True,
) -> Grid2D:
    """Delaunay-triangulated annulus (mesh.jl:14-53 / layered_domain
    equivalent).

    Radial rings are a linspace from r_in to r_out; with layered=True the
    7 discontinuity radii are forced in (layered_domain, mesh.jl:113-183).
    """
    radii = np.linspace(r_in, r_out, nr)
    if layered:
        radii = np.unique(np.concatenate([radii, np.asarray(DISCONTINUITY_RADII)]))
    pts = ring_points(radii, spacing)
    # core centre point closes the inner hole like the structured mesher
    pts = np.concatenate([pts, [[0.0, 0.0]]])

    tri = scipy.spatial.Delaunay(pts)
    simplices = tri.simplices

    theta, r = cartesian2polar(pts[:, 0], pts[:, 1])
    e2n = [s.astype(np.int64) for s in simplices]
    neighbours = element_neighbours(e2n, nnods_shared=len(pts) - 1)
    return Grid2D(
        x=pts[:, 0].copy(), z=pts[:, 1].copy(), theta=theta, r=r,
        e2n=e2n, ntheta=0, nr=len(radii), nel=len(e2n), nnods=len(pts),
        neighbours=neighbours, is_quad=np.zeros(len(e2n), bool),
    )


def add_midpoints(gr: Grid2D) -> Grid2D:
    """Insert the midpoint of every triangle edge as a secondary node
    (mesh.jl:310-383 equivalent); midpoints join both adjacent elements."""
    pairs = []
    owners = []
    local = np.array([[0, 1], [1, 2], [2, 0]])
    for e, nodes in enumerate(gr.e2n):
        p = np.sort(nodes[local], axis=1)
        pairs.append(p)
        owners.append(np.full(3, e))
    pairs = np.concatenate(pairs)
    owners = np.concatenate(owners)
    edges, inverse = np.unique(pairs, axis=0, return_inverse=True)

    mid_x = 0.5 * (gr.x[edges[:, 0]] + gr.x[edges[:, 1]])
    mid_z = 0.5 * (gr.z[edges[:, 0]] + gr.z[edges[:, 1]])
    new_ids = gr.nnods + np.arange(len(edges))

    e2n = [list(nodes) for nodes in gr.e2n]
    for k in range(len(pairs)):
        e2n[owners[k]].append(int(new_ids[inverse[k]]))
    e2n = [np.asarray(n, dtype=np.int64) for n in e2n]

    theta, r = cartesian2polar(mid_x, mid_z)
    return Grid2D(
        x=np.concatenate([gr.x, mid_x]),
        z=np.concatenate([gr.z, mid_z]),
        theta=np.concatenate([gr.theta, theta]),
        r=np.concatenate([gr.r, r]),
        e2n=e2n, ntheta=gr.ntheta, nr=gr.nr, nel=gr.nel,
        nnods=gr.nnods + len(edges),
        neighbours=gr.neighbours, is_quad=gr.is_quad,
    )
