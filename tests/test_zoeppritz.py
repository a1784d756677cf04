"""Interface-coefficient (Zoeppritz) and PREM-density tests.

Verification is physics, not literature tables: energy-flux conservation
at machine precision across interface types and angles, impedance
closed forms at normal incidence, the exact factor 2 free surface, and
PREM's textbook discontinuity densities.
"""
import numpy as np
import pytest

from raytracer_tpu.models.flatearth import cmb_radius
from raytracer_tpu.models.zoeppritz import (Medium, energy_coefficients,
                                            free_surface_receiver,
                                            interface_media,
                                            pcp_p_amplitude_ratio,
                                            prem_density, scattering)

# Textbook PREM densities at the discontinuities (Dziewonski & Anderson
# 1981): centre, ICB-/+, CMB-/+ (radius side convention: - = below).
PREM_ANCHORS = [
    (1e-6, 13.0885), (1221.4, 12.7637), (1221.6, 12.1663),
    (3479.9, 9.9035), (3480.1, 5.5665), (5700.9, 4.3807),
    (5701.1, 3.9921), (5970.9, 3.7237), (5971.1, 3.5432),
    (6371.0, 1.020),
]


@pytest.mark.parametrize("r,want", PREM_ANCHORS)
def test_prem_density_anchors(r, want):
    got = float(prem_density(np.array([r]))[0])
    assert abs(got - want) < 2e-3, (r, got, want)


M660_A = Medium(10.20, 5.60, 3.992)
M660_B = Medium(10.79, 5.95, 4.380)


@pytest.mark.parametrize("ang", [0.0, 10.0, 25.0, 40.0, 55.0, 70.0])
def test_energy_conservation_solid_solid(ang):
    p = np.sin(np.deg2rad(ang)) / M660_A.alpha
    e = energy_coefficients(M660_A, M660_B, p)
    assert abs(sum(e.values()) - 1.0) < 1e-9, e


@pytest.mark.parametrize("ang", [0.0, 15.0, 30.0, 45.0, 60.0, 80.0])
def test_energy_conservation_solid_fluid_cmb(ang):
    ma, mb = interface_media(cmb_radius("ak135"), "ak135")
    assert not ma.fluid and mb.fluid
    p = np.sin(np.deg2rad(ang)) / ma.alpha
    e = energy_coefficients(ma, mb, p)
    assert abs(sum(e.values()) - 1.0) < 1e-9, e


@pytest.mark.parametrize("ang", [0.0, 20.0, 45.0])
def test_energy_conservation_fluid_solid_icb(ang):
    ma, mb = interface_media(1217.1, "ak135")
    assert ma.fluid and not mb.fluid
    p = np.sin(np.deg2rad(ang)) / ma.alpha
    e = energy_coefficients(ma, mb, p)
    assert abs(sum(e.values()) - 1.0) < 1e-9, e


def test_normal_incidence_impedance_forms():
    sc = scattering(M660_A, M660_B, 1e-12)
    Z1 = M660_A.rho * M660_A.alpha
    Z2 = M660_B.rho * M660_B.alpha
    assert abs(sc["PP_r"] - (Z2 - Z1) / (Z2 + Z1)) < 1e-9
    assert abs(sc["PP_t"] - 2.0 * Z1 / (Z1 + Z2)) < 1e-9
    assert abs(sc["PS_r"]) < 1e-9          # no conversion head-on
    # CMB: the famous near-impedance match (R ~ 0.02 with PREM rho)
    ma, mb = interface_media(cmb_radius("ak135"), "ak135")
    sc0 = scattering(ma, mb, 1e-12)
    assert abs(sc0["PP_r"]) < 0.05
    Z1 = ma.rho * ma.alpha
    Z2 = mb.rho * mb.alpha
    assert abs(sc0["PP_r"] - (Z2 - Z1) / (Z2 + Z1)) < 1e-9


def test_free_surface_factor():
    ms = Medium(5.8, 3.36, 2.6)
    assert abs(free_surface_receiver(1e-12, ms) - 2.0) < 1e-9
    # grows mildly off-vertical, stays O(2)
    p = np.sin(np.deg2rad(30.0)) / ms.alpha
    f = free_surface_receiver(p, ms)
    assert 1.5 < f < 3.0


def test_pcp_p_ratio_band():
    """PcP/P amplitude ratio over 10-60 deg sits in the observed band
    (a few percent to a few tens of percent; e.g. the classical PcP/P
    observations used for CMB studies), rising away from the
    near-vertical minimum."""
    dd = np.array([10.0, 30.0, 50.0])
    r = pcp_p_amplitude_ratio(dd)
    assert np.all(np.isfinite(r))
    assert np.all((r > 0.005) & (r < 0.5)), r
    assert r[2] > r[0]          # grazing-ward growth


def test_pcp_p_ratio_attenuation_reduces():
    dd = np.array([40.0])
    r0 = pcp_p_amplitude_ratio(dd)[0]
    rq = pcp_p_amplitude_ratio(dd, q_factor=600.0, freq_hz=1.0)[0]
    assert rq < r0              # PcP travels longer through the mantle
