"""Amplitude layer: t* attenuation + geometrical spreading.

Anchors are analytic: constant-velocity spreading must equal the chord
length (straight-ray geometry), and vertical-path t* must match a dense
trapezoid integral of 1/(v Q) dr computed independently here.
"""
import numpy as np

import raytracer_tpu as rt
from raytracer_tpu.config import R


def test_spreading_constant_velocity_is_chord():
    r = np.linspace(100.0, R, 400)
    v = np.full_like(r, 10.0)
    deltas = np.array([20.0, 60.0, 100.0, 150.0])
    Rg = rt.geometrical_spreading(deltas, r, v)
    chord = 2.0 * R * np.sin(np.deg2rad(deltas) / 2.0)
    assert np.allclose(Rg, chord, rtol=1e-2)


def test_spreading_ak135_sane():
    deltas = np.arange(10.0, 95.0, 10.0)
    Rg = rt.ak135_spreading(deltas, shell_km=8, n_p=20000)
    assert np.all(np.isfinite(Rg)) and np.all(Rg > 0)
    # velocity increasing with depth defocuses: R exceeds the straight-ray
    # chord, but stays within a small factor away from the triplications
    # and the core shadow (e.g. R(60 deg) ~ 20,000 km)
    for dd, rg in zip(deltas, Rg):
        chord = 2.0 * R * np.sin(np.deg2rad(dd) / 2.0)
        assert rg > chord
        if 40.0 <= dd <= 80.0:
            assert rg < 6.0 * chord


def test_tstar_constant_model_vertical_path():
    # straight radial path, constant v and Q: t* = depth / (v Q) exactly
    depth, v, q = 1000.0, 8.0, 500.0
    rr = np.linspace(R - depth, R, 200)
    pts = np.stack([np.zeros_like(rr), rr], axis=1)
    prof_r = np.linspace(1000.0, R, 50)
    ts = rt.tstar(pts, prof_r, np.full(50, v), q)
    assert np.isclose(ts, depth / (v * q), rtol=1e-12)


def test_tstar_matches_independent_quadrature():
    # radially varying v and Q on a vertical path vs dense trapezoid of
    # dr / (v(r) Q(r)) -- independent integration rule
    prof_r = np.linspace(1000.0, R, 300)
    prof_v = 13.0 - 5.0 * (prof_r / R)            # v decreasing outward
    q_r = prof_r
    q = 200.0 + 400.0 * (prof_r / R)
    depth = 2000.0
    rr = np.linspace(R - depth, R, 4000)
    pts = np.stack([np.zeros_like(rr), rr], axis=1)
    ts = rt.tstar(pts, prof_r, prof_v, q, profile_q_r=q_r)
    integ = np.trapezoid(
        1.0 / (np.interp(rr, prof_r, prof_v) * np.interp(rr, q_r, q)), rr)
    assert np.isclose(ts, integ, rtol=1e-5)


def test_tstar_scales_inversely_with_q():
    rr = np.linspace(R - 500.0, R, 50)
    pts = np.stack([np.zeros_like(rr), rr], axis=1)
    prof_r = np.linspace(1000.0, R, 50)
    prof_v = np.full(50, 9.0)
    assert np.isclose(rt.tstar(pts, prof_r, prof_v, 100.0),
                      5.0 * rt.tstar(pts, prof_r, prof_v, 500.0))


def test_amplitude_factor_composition():
    prof_r = np.linspace(100.0, R, 300)
    prof_v = np.full(300, 10.0)
    rr = np.linspace(R - 800.0, R, 100)
    pts = np.stack([np.zeros_like(rr), rr], axis=1)
    f, q, dd = 1.5, 300.0, 60.0
    ts = rt.tstar(pts, prof_r, prof_v, q)
    Rg = rt.geometrical_spreading(dd, prof_r, prof_v)
    amp = rt.amplitude_factor(dd, pts, prof_r, prof_v, q, freq_hz=f)
    assert np.allclose(amp, np.exp(-np.pi * f * ts) / Rg)
    assert rt.attenuation_factor(ts, f) == np.exp(-np.pi * f * ts)


def test_tstar_on_spm_path(tiny_annulus, tiny_velocity):
    # end to end: t* along a backtraced SPM ray is positive, finite, and
    # about (travel time)/Q for a constant-Q earth (the path-time midpoint
    # rule differs from the solver's harmonic-mean edge rule only at the
    # grid discretisation level)
    gr, A, halo = tiny_annulus
    U = tiny_velocity
    prof = rt.velocity_profile("ak135")
    D = rt.bfm(A, halo, 0, gr, U)
    rec = rt.closest_point(gr, np.deg2rad(120.0), R, system="polar")
    path = rt.recontruct_path(D.prev, 0, rec)
    pts = np.stack([np.asarray(gr.x)[path], np.asarray(gr.z)[path]], axis=1)
    q = 600.0
    ts = rt.tstar(pts, prof.r, prof.Vp, q)
    t_path = float(np.asarray(D.dist)[rec])
    assert 0.0 < ts < t_path          # Q >> 1
    assert np.isclose(ts, t_path / q, rtol=0.05)
