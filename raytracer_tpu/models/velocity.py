"""Radial Earth velocity models (AK135 / IASP91).

Equivalent of the reference velocity layer:
  - `velocity_profile`       (src/ShortestPath.jl:59-66)
  - `interpolate_velocity`   (src/ShortestPath.jl:74-90, src/utils.jl:38-44)
  - `dual_velocity`          (src/ShortestPath.jl:97-112)
  - `LinearInterpolation`    (re-export of Interpolations.jl in the reference;
                              here a thin callable built on np.interp /
                              jnp.interp so the velocity evaluation is a pure
                              function that can be traced by XLA).

The 1-km-sampled `depth Vp Vs` tables are vendored under raytracer_tpu/data/
(these are standard published Earth-model tables, identical to the ones the
reference loads from VelocityProfiles/).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Callable

import numpy as np

from ..config import DISCONTINUITY_RADII, VELOCITY_BUFFER

_DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")

_PROFILE_FILES = {
    # NOTE the reference's own two tables are BOTH IASP91-generated
    # (identity proof in models/iasp91.py); they are vendored unmodified
    # for bit-parity with the reference (src/ShortestPath.jl:59-66).
    "ak135": "R_Vp_Vs_AK135.txt",
    "iasp91": "R_Vp_Vs_IASP91.txt",
    # the GENUINE AK135 model (Kennett, Engdahl & Buland 1995 .tvel
    # knots, 49.5 km spacing in the lower mantle/core) - what the
    # reference's "AK135" table should have been; see the data file
    # header and tests/test_ak135_true.py for provenance checks
    "ak135-true": "AK135_tvel_Kennett1995.txt",
}


@dataclasses.dataclass(frozen=True)
class VelProfile:
    """Radial profile: radius (km, ascending), Vp and Vs (km/s).

    Mirrors the reference `VelProfile` struct (src/ShortestPath.jl:53-57).
    """

    r: np.ndarray
    Vp: np.ndarray
    Vs: np.ndarray


def velocity_profile(model: str = "ak135") -> VelProfile:
    """Load a radial Earth model table and convert depth -> radius.

    Reference: src/ShortestPath.jl:59-66.  The table is `depth Vp Vs` with
    1-km sampling; radius = max(depth) - depth, rows reversed so radius is
    ascending.
    """
    try:
        fname = _PROFILE_FILES[model.lower()]
    except KeyError:
        raise ValueError(f"unknown velocity model {model!r}; expected one of {sorted(_PROFILE_FILES)}")
    table = np.loadtxt(os.path.join(_DATA_DIR, fname))
    depth = table[:, 0]
    r = depth.max() - depth
    return VelProfile(r=r[::-1].copy(), Vp=table[::-1, 1].copy(), Vs=table[::-1, 2].copy())


def table_interface_radii(model: str = "ak135", min_jump: float = 0.3,
                          wave: str = "Vp") -> tuple:
    """Radii (km) where the vendored 1-km table actually jumps: the
    midpoints of adjacent-row velocity steps larger than `min_jump`
    km/s.  NOTE these differ from config.DISCONTINUITY_RADII (the
    reference's hardcoded list, kept for 2-D mesh parity): the tables
    are IASP91 (models/iasp91.py), whose CMB sits at depth 2889 -- the
    reference's 2891.5 constant places its CMB node doubling 2.5 km
    BELOW the table's transition, so both twin velocities there sample
    the core side.  The discontinuity-aware 3-D grid (grid3d
    force_radii) should use THESE radii."""
    prof = velocity_profile(model)
    v = getattr(prof, wave if wave in ("Vp", "Vs") else "Vp")
    jump = np.abs(np.diff(v)) > min_jump
    mids = 0.5 * (prof.r[:-1] + prof.r[1:])[jump]
    return tuple(float(m) for m in mids[::-1])   # outermost first


class LinearInterpolation:
    """1-D linear interpolant over (x, y) with clamped extrapolation.

    Drop-in stand-in for the `LinearInterpolation` the reference re-exports
    from Interpolations.jl (src/RayTracer.jl:33).  Works on scalars and
    arrays, NumPy or JAX.
    """

    def __init__(self, x, y):
        self.x = np.asarray(x, dtype=np.float64)
        self.y = np.asarray(y, dtype=np.float64)
        if self.x.ndim != 1 or self.x.shape != self.y.shape:
            raise ValueError("LinearInterpolation expects 1-D x and y of equal length")

    def __call__(self, r):
        # np.interp works for jnp arrays too via __jax_array__? keep it
        # NumPy-only here; device-side sampling goes through jnp.interp in
        # ops/weights.py.  Grid-build-time evaluation is host NumPy.
        return np.interp(r, self.x, self.y)


def interpolate_velocity(r: np.ndarray, interpolant: Callable, buffer: float = VELOCITY_BUFFER) -> np.ndarray:
    """Sample a radial velocity interpolant onto grid nodes (scalar variant).

    Nodes lying exactly on a discontinuity take the velocity just *above*
    (r + buffer), matching src/ShortestPath.jl:74-90.
    """
    r = np.asarray(r)
    V = interpolant(r)
    on_disc = np.zeros(r.shape, dtype=bool)
    for rad in DISCONTINUITY_RADII:
        on_disc |= r == rad
    if on_disc.any():
        V = np.where(on_disc, interpolant(r + buffer), V)
    return V


def dual_velocity(r: np.ndarray, interpolant: Callable, buffer: float = VELOCITY_BUFFER) -> np.ndarray:
    """(n, 2) velocity: column 0 = below (r - buffer), column 1 = above.

    Away from discontinuities both columns are equal (src/ShortestPath.jl:97-112).
    """
    r = np.asarray(r)
    V = interpolant(r)
    below = V.copy()
    above = V.copy()
    on_disc = np.zeros(r.shape, dtype=bool)
    for rad in DISCONTINUITY_RADII:
        on_disc |= r == rad
    if on_disc.any():
        below = np.where(on_disc, interpolant(r - buffer), below)
        above = np.where(on_disc, interpolant(r + buffer), above)
    return np.stack([below, above], axis=1)
