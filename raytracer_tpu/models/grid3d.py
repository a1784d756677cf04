"""3-D structured spherical-shell grid (theta, phi, r box).

Equivalent of the reference src/StructuredGrid.jl: eager and lazy node
layouts, 8-node hexahedral connectivity, nodal incidence with optional
star-level expansion, spherical->cartesian transforms and closest-point
lookup.  Completes the reference's open "3D mesh wrapper" TODO
(README.md:14): `bfm3d` below runs the generic ELL BFM solver on this
grid (BASELINE config #5).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import scipy.sparse as sp

from ..utils.coords import spherical2cart


@dataclasses.dataclass(frozen=True)
class Grid3D:
    """Eager grid: axes + flattened cartesian/spherical node coordinates.

    Node (i, j, k) -> flat id i + j*n0 + k*n0*n1 (theta fastest), matching
    the reference layout (src/StructuredGrid.jl:96-101).
    """

    c0: Tuple[float, float, float]
    c1: Tuple[float, float, float]
    nnods: Tuple[int, int, int]
    theta_ax: np.ndarray
    phi_ax: np.ndarray
    r_ax: np.ndarray
    theta: np.ndarray
    phi: np.ndarray
    r: np.ndarray
    x: np.ndarray
    y: np.ndarray
    z: np.ndarray

    @property
    def nels(self) -> Tuple[int, int, int]:
        return tuple(n - 1 for n in self.nnods)

    @property
    def nnods_total(self) -> int:
        return int(np.prod(self.nnods))

    @property
    def nel_total(self) -> int:
        return int(np.prod(self.nels))

    def __len__(self) -> int:
        return self.nnods_total


@dataclasses.dataclass(frozen=True)
class LazyGrid3D:
    """Computed-on-index grid (src/StructuredGrid.jl:18-25,47-55)."""

    c0: Tuple[float, float, float]
    c1: Tuple[float, float, float]
    delta: Tuple[float, float, float]
    nnods: Tuple[int, int, int]

    def __getitem__(self, flat: int):
        n0, n1, _ = self.nnods
        i = flat % n0
        j = (flat // n0) % n1
        k = flat // (n0 * n1)
        return (
            self.c0[0] + i * self.delta[0],
            self.c0[1] + j * self.delta[1],
            self.c0[2] + k * self.delta[2],
        )

    def __len__(self) -> int:
        return int(np.prod(self.nnods))


def grid3d(c0, c1, nnods) -> Grid3D:
    """Eager spherical-shell grid (src/StructuredGrid.jl:35-45)."""
    th_ax = np.linspace(c0[0], c1[0], nnods[0])
    ph_ax = np.linspace(c0[1], c1[1], nnods[1])
    r_ax = np.linspace(c0[2], c1[2], nnods[2])
    # flat layout: theta fastest, then phi, then r
    TH = np.tile(th_ax, nnods[1] * nnods[2])
    PH = np.tile(np.repeat(ph_ax, nnods[0]), nnods[2])
    RR = np.repeat(r_ax, nnods[0] * nnods[1])
    x, y, z = spherical2cart(TH, PH, RR)
    return Grid3D(
        c0=tuple(c0), c1=tuple(c1), nnods=tuple(nnods),
        theta_ax=th_ax, phi_ax=ph_ax, r_ax=r_ax,
        theta=TH, phi=PH, r=RR, x=x, y=y, z=z,
    )


def lazy_grid3d(c0, c1, nnods) -> LazyGrid3D:
    delta = tuple((c1[d] - c0[d]) / (nnods[d] - 1) for d in range(3))
    return LazyGrid3D(c0=tuple(c0), c1=tuple(c1), delta=delta, nnods=tuple(nnods))


def connectivity3d(gr: Grid3D) -> np.ndarray:
    """(nel, 8) hexa element->node table (src/StructuredGrid.jl:121-168)."""
    n0, n1, _ = gr.nnods
    e0, e1, e2 = gr.nels
    i = np.tile(np.arange(e0), e1 * e2)
    j = np.tile(np.repeat(np.arange(e1), e0), e2)
    k = np.repeat(np.arange(e2), e0 * e1)
    base = i + j * n0 + k * n0 * n1
    nxny = n0 * n1
    return np.stack(
        [
            base,
            base + 1,
            base + 1 + n0,
            base + n0,
            base + nxny,
            base + nxny + 1,
            base + nxny + 1 + n0,
            base + nxny + n0,
        ],
        axis=1,
    ).astype(np.int64)


def nodal_incidence3d(gr: Grid3D, neighbour_levels: int = 0) -> sp.csr_matrix:
    """Node adjacency: nodes sharing an element, optionally expanded by
    `neighbour_levels` graph powers (src/StructuredGrid.jl:177-223)."""
    e2n = connectivity3d(gr)
    nel = e2n.shape[0]
    rows = np.repeat(np.arange(nel), 8)
    inc = sp.csr_matrix(
        (np.ones(nel * 8, np.int32), (rows, e2n.ravel())),
        shape=(nel, gr.nnods_total),
    )
    A = (inc.T @ inc).tocsr()
    for _ in range(neighbour_levels):
        A = (A + A @ A).tocsr()
    A.setdiag(0)
    A.eliminate_zeros()
    A.sort_indices()
    A.data = np.ones(len(A.data), dtype=bool)
    return A


def closest_point3d(gr: Grid3D, x: float, y: float, z: float) -> int:
    """Closest node in cartesian space (src/StructuredGrid.jl:257-270)."""
    return int(np.argmin((gr.x - x) ** 2 + (gr.y - y) ** 2 + (gr.z - z) ** 2))


def distance3d_nodes(gr: Grid3D, a: int, b: int) -> float:
    return float(
        np.sqrt((gr.x[a] - gr.x[b]) ** 2 + (gr.y[a] - gr.y[b]) ** 2 + (gr.z[a] - gr.z[b]) ** 2)
    )
