"""Genuine IASP91 model tests (VERDICT r03 item 6).

Key finding verified here: BOTH of the reference's vendored velocity
tables (VelocityProfiles/R_Vp_Vs_{AK135,IASP91}.txt, byte-identical) are
IASP91-polynomial-generated -- the "AK135" label is a reference data bug.
See models/iasp91.py module docstring.
"""
import numpy as np
import pytest

from raytracer_tpu.config import R
from raytracer_tpu.models.iasp91 import (DISCONTINUITY_DEPTHS, _SEGMENTS,
                                         generate_iasp91_table,
                                         iasp91_velocity)
from raytracer_tpu.models.velocity import velocity_profile

# Standard tabulated IASP91 boundary velocities (Kennett & Engdahl 1991).
# (radius, wave, expected km/s); +eps/-eps pick the shallow/deep side.
SPOT_VALUES = [
    (R, "Vp", 5.80), (R, "Vs", 3.36),
    (6351.0 - 1e-6, "Vp", 6.50), (6351.0 - 1e-6, "Vs", 3.75),
    (6336.0 - 1e-6, "Vp", 8.04), (6336.0 - 1e-6, "Vs", 4.47),   # Pn / Sn
    (6161.0, "Vp", 8.30),                                        # 210 km
    (5961.0, "Vp", 9.03), (5961.0 - 1e-6, "Vp", 9.36),           # 410 km
    (5961.0, "Vs", 4.87), (5961.0 - 1e-6, "Vs", 5.07),
    (5711.0, "Vp", 10.20), (5711.0 - 1e-6, "Vp", 10.79),         # 660 km
    (5711.0, "Vs", 5.60), (5711.0 - 1e-6, "Vs", 5.95),
    (3482.0, "Vp", 13.6908), (3482.0, "Vs", 7.3015),             # CMB-
    (3482.0 - 1e-6, "Vp", 8.0088), (3482.0 - 1e-6, "Vs", 0.0),   # CMB+
    (1217.1, "Vp", 10.2578),                                     # ICB-
    (1217.1 - 1e-6, "Vp", 11.0914), (1217.1 - 1e-6, "Vs", 3.4385),
    (1e-9, "Vp", 11.24094), (1e-9, "Vs", 3.56454),               # centre
]


@pytest.mark.parametrize("r,wave,want", SPOT_VALUES)
def test_published_boundary_velocities(r, wave, want):
    got = float(iasp91_velocity(np.array([r]), wave)[0])
    assert abs(got - want) < 2e-3, (r, wave, got, want)


def test_segment_continuity_at_slope_knots():
    """Adjacent published polynomials are continuous at the knots that are
    NOT discontinuities (120, 210*, 760, 2740 km) -- internal consistency
    of the coefficient set.  (*210 km has a ~4e-3 km/s Vs offset in the
    published model itself: 4.5180 below vs 4.5220 above.)"""
    for depth in (120.0, 210.0, 760.0, 2740.0):
        r = R - depth
        for wave, tol in (("Vp", 1e-3), ("Vs", 5e-3)):
            above = float(iasp91_velocity(np.array([r + 1e-7]), wave)[0])
            below = float(iasp91_velocity(np.array([r - 1e-7]), wave)[0])
            # shallow-side at the knot itself
            at = float(iasp91_velocity(np.array([r]), wave)[0])
            assert abs(above - below) < tol, (depth, wave, above, below)
            assert abs(at - above) < tol


def test_vendored_tables_are_iasp91():
    """The reference's vendored 'AK135' table is IASP91: the polynomials
    reproduce every one of its 6372 rows to < 3e-4 km/s (shallow side at
    integer-depth discontinuity rows).  True AK135 differs at the 0.01-1
    km/s level in the core (centre Vp 11.2622 vs IASP91's 11.24094)."""
    prof = velocity_profile("ak135")
    vp = iasp91_velocity(prof.r, "Vp")
    vs = iasp91_velocity(prof.r, "Vs")
    assert np.abs(prof.Vp - vp).max() < 3e-4
    assert np.abs(prof.Vs - vs).max() < 3e-4
    # and it is NOT ak135: the published AK135 centre Vp is 11.2622
    assert abs(prof.Vp[0] - 11.2622) > 0.015
    assert abs(prof.Vp[0] - 11.24094) < 1e-3


def test_regenerated_table_matches_vendored_numerically():
    """data/R_Vp_Vs_IASP91.txt is regenerated from the polynomials; it
    must stay numerically equal to the (IASP91-in-disguise) AK135 table
    so both model names keep producing identical physics, as in the
    reference."""
    tab = generate_iasp91_table()
    prof_i = velocity_profile("iasp91")
    prof_a = velocity_profile("ak135")
    assert np.abs(prof_i.Vp - tab[::-1, 1]).max() < 1e-6
    assert np.abs(prof_i.Vp - prof_a.Vp).max() < 3e-4
    assert np.abs(prof_i.Vs - prof_a.Vs).max() < 3e-4


def test_iasp91_p_travel_times():
    """P travel times through the genuine IASP91 table match the
    published IASP91 table values (IASPEI 1991 Seismological Tables,
    rounded) within the 1-km-sampling tolerance."""
    from raytracer_tpu.models.raytheory import ak135_first_arrivals

    degs = np.array([10.0, 30.0, 60.0, 90.0])
    t = ak135_first_arrivals(degs, model="iasp91")
    published = np.array([144.9, 370.2, 608.4, 781.6])
    assert np.max(np.abs(t - published)) < 3.0, t


def test_discontinuity_depths_exported():
    assert DISCONTINUITY_DEPTHS == (20.0, 35.0, 410.0, 660.0, 2889.0,
                                    5153.9)
    # segments tile [0, 6371] without gaps
    lo = [s[0] for s in _SEGMENTS]
    hi = [s[1] for s in _SEGMENTS]
    assert lo[0] == 0.0 and hi[-1] == 6371.0
    assert all(hi[i] == lo[i + 1] for i in range(len(_SEGMENTS) - 1))
