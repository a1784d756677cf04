"""High-level solver API: pick the best layout for the graph at hand.

`AnnulusSolver` packs the graph once (circulant layout when the mesh's
rotational symmetry verifies, padded ELL otherwise) and then serves
repeated solves - the pattern the reference encourages with its
(init_annulus once, bfm per source) split, but with the packing cost made
explicit and amortised.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import scipy.sparse as sp

from ..config import DEFAULT_SOLVER_CONFIG, SolverConfig
from ..ops.circulant import (
    CirculantError,
    CirculantGraph,
    build_circulant,
    recover_prev,
    solve_circulant,
)
from . import bfm as _bfm
from .types import BellmanFordMoore


class AnnulusSolver:
    """One-time graph packing + repeated SSSP solves.

    method: 'auto' (circulant with ELL fallback), 'circulant', or 'ell'.
    """

    def __init__(
        self,
        gr,
        A: sp.csr_matrix,
        halo: np.ndarray,
        U: np.ndarray,
        config: SolverConfig = DEFAULT_SOLVER_CONFIG,
        method: str = "auto",
    ):
        self.gr = gr
        self.A = A
        self.halo = np.asarray(halo)
        self.U = np.asarray(U)
        self.config = config
        self.circulant: Optional[CirculantGraph] = None
        self.ell = None
        self.last_iterations: Optional[int] = None

        dtype = np.dtype(config.dtype)
        if method in ("auto", "circulant"):
            try:
                self.circulant = build_circulant(gr, A, halo, U, dtype=dtype)
            except CirculantError:
                if method == "circulant":
                    raise
        if self.circulant is None:
            self.ell = _bfm.prepare(A, halo, gr, U, config)

    @property
    def method(self) -> str:
        return "circulant" if self.circulant is not None else "ell"

    def solve(self, source: int, want_prev: bool = True) -> BellmanFordMoore:
        if self.circulant is not None:
            dist, iters = solve_circulant(self.circulant, source, self.config)
            self.last_iterations = iters
            if want_prev:
                prev = recover_prev(self.gr, self.A, self.halo, self.U, np.asarray(dist, np.float64))
                prev[source] = source
            else:
                prev = np.arange(len(dist))
            return BellmanFordMoore(prev=prev, dist=dist)
        return _bfm.solve(self.ell, source, self.config)

    def travel_time_table(self, sources: Sequence[int], receivers: Sequence[int]) -> np.ndarray:
        """(n_sources, n_receivers) first-arrival table (no predecessors)."""
        receivers = np.asarray(receivers)
        out = np.empty((len(sources), len(receivers)))
        for i, s in enumerate(sources):
            out[i] = self.solve(int(s), want_prev=False).dist[receivers]
        return out
