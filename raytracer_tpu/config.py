"""Global configuration for the TPU ray tracer.

The reference hardcodes these constants in >6 places (see
/root/reference/src/ShortestPath.jl:38, src/GridAnnulus.jl:73,262,297,324,
src/topology/topology.jl:184-192).  Here they live in one dataclass.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

# Earth radius in km (reference: src/ShortestPath.jl:38 `const R = 6371.0`)
R = 6371.0

# Depths (km) of the seismic velocity discontinuities of the AK135 model.
# Reference: src/GridAnnulus.jl:73 `rl = R .- [20, 35, 210, 410, 660, 2740, 2891.5]`.
DISCONTINUITY_DEPTHS: Tuple[float, ...] = (20.0, 35.0, 210.0, 410.0, 660.0, 2740.0, 2891.5)

# Radii of the discontinuities (outermost first), exact in float64.
DISCONTINUITY_RADII: Tuple[float, ...] = tuple(R - d for d in DISCONTINUITY_DEPTHS)

# Layer boundary radii including surface and CMB-side sentinel used by
# `constrain2layers` (reference: src/GridAnnulus.jl:297).
LAYER_RADII: Tuple[float, ...] = (R,) + DISCONTINUITY_RADII

# Radial offset applied to duplicated (twin) nodes at discontinuities
# (reference: src/GridAnnulus.jl:938 `gr.r[idx] .- 0.05`).
TWIN_OFFSET = 0.05

# +-1 km buffer used when sampling velocity right at a discontinuity
# (reference: src/ShortestPath.jl:84, :105-106).
VELOCITY_BUFFER = 1.0

# Inner cut-off radius of the annulus grid; keeps the nodal degree of the
# core fan bounded (reference: src/GridAnnulus.jl:84 `r_in = 0.1`).
R_INNER = 0.1


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Runtime knobs for the SSSP solvers.

    Dual (above/below) velocities are selected by passing a (n, 2) U
    array; solver method selection lives on AnnulusSolver(method=...).
    """

    dtype: str = "float32"        # device dtype for distances/weights
    max_iters: int = 100_000      # hard cap on the while_loop
    # pad node count to a multiple of this (TPU tile alignment: 8*128)
    node_pad: int = 1024
    # pad neighbour count (ELL width) to a multiple of this
    degree_pad: int = 8
    # termination slack for the scan-accelerated circulant solvers: stop
    # once no distance improves by more than `tol` seconds.  The min-plus
    # ring/chain scans re-round every iteration, so an exact no-change
    # test (tol=0) can chase 1-ULP wiggle for thousands of iterations;
    # the slack must exceed one f32 ULP of the LARGEST travel times
    # (~2.4e-4 s at 2000 s), hence 1e-3 s for f32 - still two orders of
    # magnitude inside the 0.1 s accuracy target.  None (default) picks
    # 1e-3 for float32 and exact 0.0 for float64.  The exact solvers
    # (ELL, Dijkstra, jnp circulant without scans) ignore it.
    tol: float = None
    # min-plus band-closure levels for the theta-major kernel: each level
    # squares the truncated (|dm|, |dc|) stencil band at pack time so one
    # sweep composes up to 2**levels original hops (exact; see
    # ops/wrapped_t.py::_compose_band).  Denser weights are free per sweep
    # in that kernel; one level costs ~0.3 s of host pack time at 180x63
    # and cuts iterations ~30% (108 -> 76).
    band_closure: int = 1
    # coarse-to-fine warm-start levels for the streamed theta-major path:
    # level l solves a theta-coarsened (ntheta / 2**l columns) circulant
    # first and initialises the finer level with its field (any upper
    # bound preserves the label-correcting fixpoint, so the result is
    # unchanged - tested).  Cuts the iteration-vs-size scaling at large
    # grids; 0 = off, None = auto (measured policy in
    # ops/stream_t.py::auto_warm_levels).  Levels stop automatically
    # when ntheta goes odd.
    warm_levels: int = None

    def tol_value(self) -> float:
        if self.tol is not None:
            return self.tol
        import numpy as np

        return 1e-3 if np.dtype(self.dtype) == np.float32 else 0.0


DEFAULT_SOLVER_CONFIG = SolverConfig()


def discontinuity_mask(r: np.ndarray) -> np.ndarray:
    """Boolean mask of nodes lying exactly on one of the 7 discontinuities.

    Exact float equality is intentional: grid construction places boundary
    nodes at exactly these radii (the reference relies on the same equality,
    e.g. src/ShortestPath.jl:81 `r[i] in rlayer`).
    """
    mask = np.zeros(r.shape, dtype=bool)
    for rad in DISCONTINUITY_RADII:
        mask |= r == rad
    return mask
