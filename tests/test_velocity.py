"""Earth-model loading and sampling tests (reference semantics:
src/ShortestPath.jl:59-112)."""
import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.config import DISCONTINUITY_RADII, R


def test_profile_loads_and_is_ascending():
    prof = rt.velocity_profile("ak135")
    assert prof.r[0] == 0.0
    assert prof.r[-1] == R
    assert np.all(np.diff(prof.r) > 0)
    assert prof.Vp.shape == prof.r.shape == prof.Vs.shape
    # surface crust values of AK135
    assert prof.Vp[-1] == pytest.approx(5.8)
    assert prof.Vs[-1] == pytest.approx(3.36)


def test_iasp91_loads():
    # The reference ships byte-identical tables for AK135 and IASP91 --
    # and round 4 established BOTH are IASP91-polynomial-generated (the
    # "AK135" label is the reference's data bug; see models/iasp91.py).
    # data/R_Vp_Vs_IASP91.txt is now regenerated from the published
    # polynomials; numerical equality of the two models is asserted in
    # tests/test_iasp91.py.
    b = rt.velocity_profile("iasp91")
    assert b.r[-1] == rt.R
    assert np.all(b.Vp > 0)


def test_unknown_model_raises():
    with pytest.raises(ValueError):
        rt.velocity_profile("prem")


def test_interpolate_velocity_buffer_at_discontinuity():
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    rl = DISCONTINUITY_RADII[3]  # 410-km discontinuity
    r = np.array([rl, rl - 5.0, rl + 5.0])
    V = rt.interpolate_velocity(r, interp)
    # on the discontinuity: take the value 1 km above (src/ShortestPath.jl:84)
    assert V[0] == pytest.approx(interp(rl + 1.0))
    assert V[1] == pytest.approx(interp(rl - 5.0))


def test_dual_velocity_columns():
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    rl = DISCONTINUITY_RADII[0]
    V = rt.dual_velocity(np.array([rl, 1000.0]), interp)
    assert V.shape == (2, 2)
    assert V[0, 0] == pytest.approx(interp(rl - 1.0))  # below
    assert V[0, 1] == pytest.approx(interp(rl + 1.0))  # above
    assert V[1, 0] == V[1, 1]
    # velocity jumps across the Moho-ish boundary
    assert V[0, 0] != V[0, 1]
