"""Provenance checks for the GENUINE AK135 model ("ak135-true").

The reference's own AK135 table is IASP91-generated (identity proof in
models/iasp91.py / tests/test_iasp91.py); it stays vendored for parity.
This file pins the real Kennett-Engdahl-Buland 1995 knot table against
everything checkable without network access:

  * the model's defining discontinuity structure (depths, jump sizes,
    two-sided knot values straight from the published table),
  * zero shear velocity throughout the outer core,
  * point-wise agreement with the INDEPENDENT IASP91-derived table
    within the published AK135-IASP91 model difference envelope
    (shell means within 0.05 km/s; the two models genuinely differ by
    up to ~0.35 km/s point-wise in the cores / near interfaces),
  * tau-p first arrivals within 0.3 s of the IASP91-table anchor at
    teleseismic ranges (the two models' P times are nearly identical).
"""
import numpy as np
import pytest

import raytracer_tpu as rt


@pytest.fixture(scope="module")
def prof():
    return rt.velocity_profile("ak135-true")


def test_discontinuity_structure(prof):
    """Every AK135 discontinuity at its published depth with its
    published two-sided values (Kennett et al. 1995, Table 2)."""
    R = prof.r.max()
    assert R == 6371.0
    # (depth, Vp_above, Vp_below, Vs_above, Vs_below)
    expected = [
        (20.0, 5.80, 6.50, 3.46, 3.85),        # upper/lower crust
        (35.0, 6.50, 8.04, 3.85, 4.48),        # Moho
        (410.0, 9.03, 9.36, 4.87, 5.08),       # olivine->wadsleyite
        (660.0, 10.20, 10.79, 5.61, 5.96),     # ringwoodite->perovskite
        (2891.5, 13.6602, 8.0, 7.2811, 0.0),   # CMB
        (5153.5, 10.289, 11.0427, 0.0, 3.5043),  # ICB
    ]
    for depth, vpa, vpb, vsa, vsb in expected:
        r = R - depth
        i = np.where(prof.r == r)[0]
        assert len(i) == 2, f"discontinuity at depth {depth} not doubled"
        lo, hi = sorted(i)
        # ascending radius: lo = deeper side (below), hi = shallow side
        np.testing.assert_allclose(prof.Vp[hi], vpa, atol=1e-4)
        np.testing.assert_allclose(prof.Vp[lo], vpb, atol=1e-4)
        np.testing.assert_allclose(prof.Vs[hi], vsa, atol=1e-4)
        np.testing.assert_allclose(prof.Vs[lo], vsb, atol=1e-4)


def test_outer_core_fluid(prof):
    oc = (prof.r > 6371.0 - 5153.5 + 1e-9) & (prof.r < 6371.0 - 2891.5)
    assert oc.sum() > 40
    assert np.all(prof.Vs[oc] == 0.0)
    # Vp monotonically decreasing with radius through the outer core
    assert np.all(np.diff(prof.Vp[oc]) <= 1e-9)


def test_surface_and_centre_values(prof):
    np.testing.assert_allclose(prof.Vp[-1], 5.80, atol=1e-9)
    np.testing.assert_allclose(prof.Vs[-1], 3.46, atol=1e-9)
    np.testing.assert_allclose(prof.Vp[0], 11.2622, atol=1e-4)
    np.testing.assert_allclose(prof.Vs[0], 3.6678, atol=1e-4)


def test_agreement_with_independent_iasp91_table(prof):
    """Shell-mean agreement with the (independent) IASP91-derived
    vendored table within the published model-difference envelope: a
    transcription error of even one digit in the second decimal place
    at one knot moves the local mean by more than this."""
    p = rt.velocity_profile("ak135")
    rr = np.linspace(1.0, 6370.0, 20000)
    vt = np.interp(rr, prof.r, prof.Vp)
    vp = np.interp(rr, p.r, p.Vp)
    d = vt - vp
    shells = [
        (6352.0, 6370.0, 0.05),   # upper crust
        (5962.0, 6335.0, 0.20),   # upper mantle (210-km disc differs)
        (5712.0, 5960.0, 0.05),   # transition zone
        (3483.0, 5709.0, 0.05),   # lower mantle
        (1219.0, 3478.0, 0.06),   # outer core
        (1.0, 1216.0, 0.05),      # inner core
    ]
    for lo, hi, tol in shells:
        m = (rr > lo) & (rr < hi)
        assert abs(d[m].mean()) < tol, (lo, hi, d[m].mean())
        # point-wise stays inside the known envelope away from interfaces
        assert np.abs(d[m]).max() < 0.5, (lo, hi, np.abs(d[m]).max())


def test_first_arrival_anchor_agreement():
    """tau-p first arrivals of the two tables agree to < 0.3 s at
    teleseismic ranges (AK135 and IASP91 P times are nearly equal)."""
    from raytracer_tpu.models.flatearth import table_model

    m_par = table_model("ak135")
    m_tru = table_model("ak135-true")
    for deg in (30.0, 60.0, 90.0):
        tp = m_par.first_arrival([deg], n_p=2000)[0]
        tt = m_tru.first_arrival([deg], n_p=2000)[0]
        assert abs(tt - tp) < 0.3, (deg, tt, tp)


def test_solver_runs_on_true_ak135():
    """End-to-end: the annulus SPM solve accepts the true model.  On a
    coarse grid the true table lands CLOSER to the tau-p anchor than
    the parity table: the true AK135's CMB sits exactly at the mesh's
    2891.5 km discontinuity constant, while the parity (IASP91-
    generated) table transitions at depth ~2889, so the parity mesh's
    CMB twin nodes sample the core side twice (the reference quirk
    documented in models/velocity.py::table_interface_radii)."""
    from raytracer_tpu.config import R, SolverConfig
    from raytracer_tpu.models.raytheory import ak135_first_arrivals

    gr, A, halo = rt.init_annulus(24, 12, spacing=120.0)
    src = rt.closest_point(gr, 0.0, R, system="polar")
    rec = rt.closest_point(gr, np.deg2rad(60.0), R, system="polar")
    anchor = float(ak135_first_arrivals(np.asarray([60.0]))[0])
    ts = {}
    for name in ("ak135", "ak135-true"):
        prof = rt.velocity_profile(name)
        U = rt.interpolate_velocity(gr.r, rt.LinearInterpolation(prof.r, prof.Vp))
        solver = rt.AnnulusSolver(gr, A, halo, U, SolverConfig(dtype="float64"))
        ts[name] = float(solver.solve(src, want_prev=False).dist[rec])
    # both overshoot the anchor (SPM discretisation bias, positive)
    assert anchor - 1.0 < ts["ak135-true"] < anchor + 30.0, (ts, anchor)
    assert anchor - 1.0 < ts["ak135"] < anchor + 30.0, (ts, anchor)
    # the aligned-CMB model is strictly the better-meshed one here
    assert abs(ts["ak135-true"] - anchor) <= abs(ts["ak135"] - anchor), \
        (ts, anchor)
