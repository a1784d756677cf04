"""Edge travel-time weights.

The reference computes edge weights on the fly inside every relaxation
(src/SSSP/bfm.jl:137-146): t = 2*|xi-xj| / (Ui + Uj), i.e. segment length
times the harmonic-mean slowness of the two endpoint velocities.  On TPU
the velocities are static per solve, so the full (n_pad, K) weight matrix
is precomputed once - the inner loop then only gathers distances and adds.

Two velocity conventions, matching the reference dispatch:
  * scalar U (n,): plain harmonic mean (src/SSSP/bfm.jl:161-210) - the
    path used by the README driver.
  * dual U (n, 2) = (below, above): branch-free head/tail pick by relative
    radius (src/SSSP/bfm.jl:113-159) - a ray from Gi up to i leaves Gi
    with its *above* velocity and enters i with its *below* velocity.
"""
from __future__ import annotations

import numpy as np

from .graph import ELLGraph

INF = np.float64(np.inf)


def _coords(gr):
    """Cartesian coordinate tuple of a grid: (x, z) for the 2-D annulus,
    (x, y, z) for 3-D structured grids."""
    if hasattr(gr, "y") and getattr(gr, "y") is not None:
        return (gr.x, gr.y, gr.z)
    return (gr.x, gr.z)


def _segment_lengths(coords, ell: ELLGraph) -> np.ndarray:
    n_pad, _ = ell.nbr.shape
    n = ell.n
    total = np.zeros((n_pad, ell.k))
    for axis in coords:
        a = np.zeros(n_pad)
        a[:n] = axis
        d = a[:, None] - a[ell.nbr]
        total += d * d
    return np.sqrt(total)


def edge_weights_scalar(gr, ell: ELLGraph, U: np.ndarray, dtype=np.float32) -> np.ndarray:
    """(n_pad, K) weights, +inf on padding slots. U is (n,) velocity."""
    n_pad = ell.n_pad
    Upad = np.full(n_pad, 1.0)
    Upad[: ell.n] = U
    L = _segment_lengths(_coords(gr), ell)
    usum = Upad[:, None] + Upad[ell.nbr]
    w = _safe_weight(L, usum)
    return np.where(ell.mask, w, INF).astype(dtype)


def _safe_weight(L, usum):
    """2L/usum with impassable (usum <= 0) media mapped to +inf, avoiding
    0/0 NaN on zero-length twin edges in zero-velocity regions (e.g. S
    waves in the liquid outer core)."""
    return np.where(usum > 0, 2.0 * L / np.where(usum > 0, usum, 1.0), INF)


def edge_weights_dual(gr, ell: ELLGraph, U: np.ndarray, dtype=np.float32) -> np.ndarray:
    """(n_pad, K) weights from dual (below, above) velocities U (n, 2).

    Matches src/SSSP/bfm.jl:134-146: with i the tail (node being updated)
    and j = nbr[i, k] the head, head velocity = above if r_i > r_j else
    below, tail velocity the opposite column.
    """
    n_pad = ell.n_pad
    Upad = np.ones((n_pad, 2))
    Upad[: ell.n] = U
    rpad = np.zeros(n_pad)
    rpad[: ell.n] = gr.r

    r_i = rpad[:, None]
    r_j = rpad[ell.nbr]
    head_above = r_i > r_j             # ray travels upward from j to i
    U_head = np.where(head_above, Upad[:, 1][ell.nbr], Upad[:, 0][ell.nbr])
    U_tail = np.where(head_above, Upad[:, 0][:, None], Upad[:, 1][:, None])

    L = _segment_lengths(_coords(gr), ell)
    w = _safe_weight(L, U_tail + U_head)
    return np.where(ell.mask, w, INF).astype(dtype)
