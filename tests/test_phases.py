"""Named-phase solver (solvers/phases.py) + reflected-branch ray theory.

The reference scaffolds a phase library (src/multiphase/library.jl) but
never delivers one; these tests pin the working PcP/ScS/PP API against
(a) the independent classical reflected-branch ray theory and (b) a
reciprocity composition of single-leg fields that exercises the staged
boundary restart through a different code path.
"""
import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig
from raytracer_tpu.models.partition import partition_grid
from raytracer_tpu.models.raytheory import (
    ak135_first_arrivals,
    ak135_reflected,
)
from raytracer_tpu.solvers.phases import (
    phase_travel_times,
    pp_travel_times,
    reflected_travel_times,
    region_travel_times,
)

F32 = SolverConfig(dtype="float32")
CMB_R = R - 2891.5


def test_reflected_ray_theory_anchors():
    # AK135 PcP published values: ~510 s vertical, monotone with distance,
    # always later than direct P
    d = np.array([0.1, 10.0, 30.0, 50.0, 70.0])
    pcp = ak135_reflected(d, CMB_R)
    assert 505.0 < pcp[0] < 516.0
    assert np.all(np.diff(pcp) > 0)
    p = ak135_first_arrivals(d[1:])
    assert np.all(pcp[1:] > p)


@pytest.fixture(scope="module")
def annulus_mid():
    gr, A, halo = rt.init_annulus(24, 8, spacing=150.0)
    prof = rt.velocity_profile()
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = rt.interpolate_velocity(gr.r, interp)
    return gr, A, halo, U


def test_pcp_matches_reciprocity_composition(annulus_mid):
    # staged down-leg + boundary restart must equal the min-plus
    # composition of two independent single-leg fields through the CMB
    gr, A, halo, U = annulus_mid
    src = rt.closest_point(gr, 0.0, R, system="polar")
    degs = (20.0, 45.0, 80.0)
    rcvs = [rt.closest_point(gr, np.deg2rad(d), R, system="polar")
            for d in degs]
    pcp = reflected_travel_times(A, halo, src, gr, U, "cmb", F32,
                                 interpret=True)
    leg_s = region_travel_times(A, halo, src, gr, U, "cmb", F32,
                                interpret=True)
    p = partition_grid(gr)
    cmb = np.flatnonzero(p.boundary_of == 7)
    for r_ in rcvs:
        leg_r = region_travel_times(A, halo, int(r_), gr, U, "cmb", F32,
                                    interpret=True)
        composed = float(np.min(leg_s[cmb] + leg_r[cmb]))
        assert pcp[r_] == pytest.approx(composed, abs=2e-2)


def test_pcp_region_restriction(annulus_mid):
    # the reflected field never enters the core (below the CMB)
    gr, A, halo, U = annulus_mid
    src = rt.closest_point(gr, 0.0, R, system="polar")
    pcp = reflected_travel_times(A, halo, src, gr, U, "cmb", F32,
                                 interpret=True)
    deep = gr.r < CMB_R - 1.0
    assert not np.isfinite(pcp[deep]).any()
    surf = gr.r == gr.r.max()
    assert np.isfinite(pcp[surf]).all()


def test_pcp_vs_ray_theory(annulus_mid):
    # SPM reflected times are upper bounds on the ray-theory branch and
    # converge from above; at this coarse test grid the overshoot stays
    # within the same relative envelope as the direct-P overshoot
    gr, A, halo, U = annulus_mid
    src = rt.closest_point(gr, 0.0, R, system="polar")
    pcp = reflected_travel_times(A, halo, src, gr, U, "cmb", F32,
                                 interpret=True)
    degs = np.array([20.0, 40.0, 60.0])
    rcvs = [rt.closest_point(gr, np.deg2rad(d), R, system="polar")
            for d in degs]
    spm = pcp[rcvs]
    ray = ak135_reflected(degs, CMB_R)
    assert np.all(spm > ray - 1.0)          # upper bound (f32 slack)
    assert np.all(spm < ray * 1.10)         # within 10% at spacing 150
    # and the phase dispatcher agrees
    via_api = phase_travel_times(A, halo, src, gr, U, phase="PcP",
                                 config=F32, receivers=rcvs,
                                 interpret=True)
    np.testing.assert_allclose(via_api, spm, rtol=1e-6)


def test_pp_composition(annulus_mid):
    gr, A, halo, U = annulus_mid
    src = rt.closest_point(gr, 0.0, R, system="polar")
    degs = np.array([60.0, 90.0])
    rcvs = [rt.closest_point(gr, np.deg2rad(d), R, system="polar")
            for d in degs]
    pp = phase_travel_times(A, halo, src, gr, U, phase="PP", config=F32,
                            receivers=rcvs, interpret=True)
    p_direct = phase_travel_times(A, halo, src, gr, U, phase="P",
                                  config=F32, receivers=rcvs,
                                  interpret=True)
    assert np.all(pp > p_direct)            # PP always later than P
    # surface reflection of direct P: PP(d) ~ 2 * P(d/2); SPM overshoots
    ray_pp = 2.0 * ak135_first_arrivals(degs / 2.0)
    assert np.all(pp > ray_pp - 1.0)
    assert np.all(pp < ray_pp * 1.10)


def test_unknown_phase_raises(annulus_mid):
    gr, A, halo, U = annulus_mid
    # PKIKP used to be the unknown-phase probe; it dispatches now
    # (tests/test_converted.py), so probe with a genuinely absent name
    with pytest.raises(ValueError):
        phase_travel_times(A, halo, 0, gr, U, phase="PKJKP", config=F32,
                           interpret=True)


def test_pdiff_alias_matches_direct_and_ak135(annulus_mid):
    # the SPM first-arrival field IS Pdiff beyond the direct-P shadow:
    # 'Pdiff' aliases the plain solve, and the 150-deg surface arrival
    # sits in the AK135 Pdiff window (~1050 s; see ACCURACY.md)
    gr, A, halo, U = annulus_mid
    src = rt.closest_point(gr, 0.0, R, system="polar")
    r150 = rt.closest_point(gr, np.deg2rad(150.0), R, system="polar")
    t_p = phase_travel_times(A, halo, src, gr, U, "P", F32,
                             interpret=True)
    t_pd = phase_travel_times(A, halo, src, gr, U, "Pdiff", F32,
                              interpret=True)
    np.testing.assert_array_equal(t_pd, t_p)
    assert 1000.0 < t_pd[r150] < 1150.0


def test_pcp_sweep_engine_matches_stream(annulus_mid):
    # the directional-sweep staged engine must reproduce the streamed
    # staged engine's reflected field (finite sets AND distances)
    gr, A, halo, U = annulus_mid
    src = rt.closest_point(gr, 0.0, R, system="polar")
    d_st = reflected_travel_times(A, halo, src, gr, U, "cmb", F32,
                                  interpret=True)
    d_sw = reflected_travel_times(A, halo, src, gr, U, "cmb", F32,
                                  interpret=True, engine="sweep")
    ok = np.isfinite(d_st)
    np.testing.assert_array_equal(ok, np.isfinite(d_sw))
    np.testing.assert_allclose(d_sw[ok], d_st[ok], rtol=1e-6, atol=5e-3)
    # single-leg primitive too
    l_st = region_travel_times(A, halo, src, gr, U, "cmb", F32,
                               interpret=True)
    l_sw = region_travel_times(A, halo, src, gr, U, "cmb", F32,
                               interpret=True, engine="sweep")
    ok = np.isfinite(l_st)
    np.testing.assert_array_equal(ok, np.isfinite(l_sw))
    np.testing.assert_allclose(l_sw[ok], l_st[ok], rtol=1e-6, atol=5e-3)
