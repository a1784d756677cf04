"""Tests for the piecewise-linear flattened-model anchor (VERDICT r03 #5).

Three layers of evidence, mirroring how TauP itself is validated:
  1. closed-form checks (constant-velocity sphere: chords, exactly),
  2. anchor SELF-error via knot-halving convergence (< 0.1 s target),
  3. a battery of published AK135 travel-time constants as literal
     anchors (Kennett, Engdahl & Buland 1995 tables, rounded to ~1 s;
     tolerance covers the 1-km table's smearing of discontinuities,
     which costs ~0.5 s on core-grazing phases).
"""
import numpy as np
import pytest

from raytracer_tpu.config import R
from raytracer_tpu.models.flatearth import RadialModel, cmb_radius, table_model


def test_constant_velocity_chords():
    r = np.linspace(1.0, R, 500)
    m = RadialModel(r, np.full_like(r, 10.0))
    degs = np.array([5.0, 30.0, 90.0, 150.0, 175.0])
    t = m.first_arrival(degs, n_p=20000)
    exact = 2.0 * R * np.sin(np.deg2rad(degs) / 2.0) / 10.0
    np.testing.assert_allclose(t, exact, atol=0.02)


def test_constant_velocity_reflection():
    """Topside reflection in a constant sphere at Delta=0 is the exact
    two-way vertical time."""
    r = np.linspace(1.0, R, 400)
    m = RadialModel(r, np.full_like(r, 8.0))
    t0 = m.reflected([0.0], 3479.5, n_p=4000)[0]
    assert abs(t0 - 2.0 * (R - 3479.5) / 8.0) < 0.02


def test_linear_gradient_layer_analytic():
    """Single linear-gradient flat layer: X and T against independent
    dense numerical quadrature of the ray integrals."""
    # thin spherical shell so the flat transform's layer is near-linear
    r = np.linspace(R - 50.0, R, 51)
    v = 5.0 + 0.04 * (R - r)          # linear in depth
    m = RadialModel(r, v)
    p_sph = np.array([0.7 * R / v.max()])
    X, T, _ = m.down_leg(p_sph, r_stop=R - 50.0)
    # quadrature in the flattened domain on the same PL model
    z = np.linspace(0.0, R * np.log(R / (R - 50.0)), 200001)
    rq = R * np.exp(-z / R)
    vq = np.interp(rq[::-1], r, v)[::-1] * R / rq
    pf = p_sph[0] / R
    c = np.sqrt(np.maximum(1.0 - (pf * vq) ** 2, 0.0))
    Xq = np.trapezoid(pf * vq / c, z) / R
    Tq = np.trapezoid(1.0 / (vq * c), z)
    assert abs(X[0] - Xq) < 1e-6
    assert abs(T[0] - Tq) < 1e-6


def test_anchor_self_error_knot_halving():
    """Anchor self-error < 0.1 s: decimating the 1-km AK135 table to 2 km
    moves first arrivals by < 0.1 s everywhere on the fan, so the 1-km
    anchor (finer still) is converged well inside the target."""
    from raytracer_tpu.models.velocity import velocity_profile

    prof = velocity_profile("ak135")
    degs = np.array([10.0, 30.0, 60.0, 90.0, 120.0, 150.0])
    cmb = cmb_radius("ak135")

    def arrivals(step):
        idx = np.arange(len(prof.r) - 1, -1, -step)[::-1]
        m = RadialModel(prof.r[idx], prof.Vp[idx])
        return m.first_arrival(degs, n_p=4000, diff_radii=(cmb,))

    t1, t2 = arrivals(1), arrivals(2)
    # the integrals converge ~quadratically in knot spacing, so the
    # Richardson bound on the 1-km anchor's own error is ~diff/3; the
    # largest 1-vs-2 km difference (0.13 s, at the 150-deg CMB-grazing
    # geometry) bounds the anchor's self-error below 0.05 s
    assert np.max(np.abs(t1 - t2)) < 0.15, t1 - t2
    assert np.max(np.abs(t1 - t2)) / 3.0 < 0.05


# Published AK135 P-wave times (surface focus), from the ak135 travel-time
# tables of Kennett, Engdahl & Buland (1995, GJI 122, 108-124), as literal
# constants rounded to ~1 s.  Tolerance 3 s covers (a) the rounding of the
# recalled table values and (b) the vendored table's 1-km smearing of the
# CMB/ICB (worth ~0.5 s on core-grazing phases).  VERDICT r03 item 5.
AK135_PUBLISHED = [
    # (phase, delta_deg, seconds)
    ("P", 10.0, 144.5),
    ("P", 30.0, 370.0),
    ("P", 60.0, 609.0),
    ("P", 90.0, 780.0),
    ("Pdiff", 110.0, 872.0),
    ("Pdiff", 130.0, 961.0),
    ("Pdiff", 150.0, 1050.0),
    ("PcP", 0.0, 510.9),
    ("PcP", 30.0, 552.0),
    ("PcP", 60.0, 653.7),
]


@pytest.mark.parametrize("phase,delta,published", AK135_PUBLISHED)
def test_ak135_published_battery(phase, delta, published):
    m = table_model("ak135")
    cmb = cmb_radius("ak135")
    if phase in ("P", "Pdiff"):
        t = m.first_arrival([delta], n_p=8000, diff_radii=(cmb,))[0]
    elif phase == "PcP":
        t = m.reflected([delta], cmb, n_p=8000)[0]
    assert abs(t - published) < 3.0, (phase, delta, t, published)


def test_pdiff_slope():
    """The CMB-diffracted branch slides at the grazing slowness
    ~4.44 s/deg (the published AK135/IASP91 Pdiff slope)."""
    m = table_model("ak135")
    cmb = cmb_radius("ak135")
    t = m.first_arrival([130.0, 150.0], n_p=6000, diff_radii=(cmb,))
    slope = (t[1] - t[0]) / 20.0
    assert abs(slope - 4.44) < 0.05, slope


def test_pkikp_antipode():
    """PKIKP (turning below the ICB) at 180 deg: published 1212 s
    (20m12s); the engine integrates the 1-km table to 1212.05 s.  The
    turn_below filter is required because the smeared CMB lets
    near-grazing rays turn inside the 1-km transition and arrive
    earlier -- kinematically correct for the table model."""
    m = table_model("ak135")
    t = m.first_arrival([180.0], n_p=20000, turn_below=1217.0)[0]
    assert abs(t - 1212.0) < 2.0, t


def test_pkikp_turning_radius_monotone():
    m = table_model("ak135")
    tr = m.turning_radius(np.array([10.0, 100.0, 254.0, 440.0]))
    assert np.all(np.diff(tr) > 0)
    assert tr[0] < 1217.0          # deep inner core
    assert 5100.0 < tr[3] < 5300.0  # upper mantle


def test_spreading_constant_velocity_is_chord():
    r = np.linspace(1.0, R, 600)
    m = RadialModel(r, np.full_like(r, 10.0))
    degs = np.array([20.0, 60.0, 100.0])
    Rg = m.spreading(degs, n_p=12000)
    chord = 2.0 * R * np.sin(np.deg2rad(degs) / 2.0)
    np.testing.assert_allclose(Rg, chord, rtol=0.02)


def test_spreading_shadow_is_inf():
    """Where the first arrival is CMB-diffracted, ray-theory spreading is
    undefined and must come back inf (driver converts to NaN+valid=0)."""
    m = table_model("ak135")
    Rg = m.spreading(np.array([60.0, 120.0]), n_p=6000,
                     diff_radii=(cmb_radius("ak135"),))
    assert np.isfinite(Rg[0])
    assert np.isinf(Rg[1])


def test_wrappers_route_to_flat_engine():
    """ak135_first_arrivals / ak135_reflected / ak135_spreading default to
    the PL engine and match it exactly."""
    from raytracer_tpu.models.amplitude import ak135_spreading
    from raytracer_tpu.models.raytheory import (ak135_first_arrivals,
                                                ak135_reflected)

    degs = np.array([40.0, 60.0])
    m = table_model("ak135")
    cmb = cmb_radius("ak135")
    np.testing.assert_allclose(
        ak135_first_arrivals(degs),
        m.first_arrival(degs, n_p=6000, diff_radii=(cmb,)))
    np.testing.assert_allclose(ak135_reflected(degs, cmb),
                               m.reflected(degs, cmb, n_p=8000))
    np.testing.assert_allclose(
        ak135_spreading(degs),
        m.spreading(degs, n_p=8000, diff_radii=(cmb,)))
    # legacy engine still reachable and close (its documented ~1 s error)
    legacy = ak135_first_arrivals(degs, shell_km=4, n_p=4000)
    assert np.max(np.abs(legacy - ak135_first_arrivals(degs))) < 2.5


# -- buried sources -----------------------------------------------------------


def test_buried_surface_degeneracy():
    m = table_model("ak135")
    d = np.array([30.0, 60.0, 90.0])
    np.testing.assert_array_equal(m.first_arrival(d),
                                  m.first_arrival(d, source_radius=R))


def test_buried_vertical_time_matches_quadrature():
    """Delta -> 0 from 600 km depth is the vertical upgoing ray; its
    time must match an independent trapezoid quadrature of 1/v over the
    vendored table (the envelope operator is INVALID for the upgoing
    family -- delta grows with p, tau is concave -- so this pins the
    interpolation path that replaces it)."""
    from raytracer_tpu.models.velocity import velocity_profile

    m = table_model("ak135")
    rs = R - 600.0
    t_up = m.first_arrival([1e-4], source_radius=rs)[0]
    prof = velocity_profile("ak135")
    rr = np.asarray(prof.r)
    sel = (rr >= rs) & (rr <= R)
    t_quad = np.trapezoid(1.0 / np.asarray(prof.Vp)[sel], rr[sel])
    assert abs(t_up - t_quad) < 0.01, (t_up, t_quad)


def test_buried_first_arrivals_vs_dijkstra():
    """SPM solve from a 600-km-deep node vs the buried-source anchor:
    the graph overshoots by its usual small bias, never undershoots."""
    import raytracer_tpu as rt

    m = table_model("ak135")
    prof = rt.velocity_profile("ak135")
    gr, A, halo = rt.init_annulus(36, 12, spacing=100.0)
    Up = rt.interpolate_velocity(
        gr.r, rt.LinearInterpolation(prof.r, prof.Vp))
    src = rt.closest_point(gr, 0.0, R - 600.0, system="polar")
    D = rt.dijkstra(A, halo, src, gr, Up)
    for deg in (30.0, 60.0, 90.0):
        rcv = rt.closest_point(gr, np.deg2rad(deg), R, system="polar")
        anc = m.first_arrival([deg], source_radius=float(gr.r[src]),
                              diff_radii=(cmb_radius(),))[0]
        spm = float(D.dist[rcv])
        assert spm > anc - 0.5, (deg, spm, anc)
        assert spm < anc * 1.05, (deg, spm, anc)


def test_buried_reflected_branch():
    m = table_model("ak135")
    cmb = cmb_radius("ak135")
    pc0 = m.reflected([40.0], cmb)[0]
    pcd = m.reflected([40.0], cmb, source_radius=R - 600.0)[0]
    # one mantle leg 600 km shorter: earlier, by less than the
    # two-way vertical time of the removed segment
    assert pcd < pc0
    assert pc0 - pcd < 80.0
    # outside the branch: NaN, not extrapolation
    assert np.isnan(m.reflected([170.0], cmb, source_radius=R - 600.0)[0])
