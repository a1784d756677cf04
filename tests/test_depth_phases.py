"""Free-surface depth phases (pP / sP / sS / pS).

The reference has no depth-phase capability (its phase library
src/multiphase/library.jl:9-31 is dead code).  These tests pin

  (a) the independent flat-earth anchor branch
      (models/flatearth.py::depth_phase_{branch,first_arrival}) against
      near-vertical reflection physics and its own buried direct branch,
  (b) the classical depth inversion from a picked delay
      (depth_from_depth_phase) as a round trip through the anchor,
  (c) the SPM graph composition (solvers/phases.py::
      depth_phase_travel_times) against the anchor, the direct field,
      and the phase-class ordering pP < sP < sS.
"""
import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig
from raytracer_tpu.models.flatearth import (
    depth_from_depth_phase,
    depth_phase_branch,
    depth_phase_first_arrival,
    table_model,
)
from raytracer_tpu.solvers.phases import (
    depth_phase_travel_times,
    phase_travel_times,
)

F32 = SolverConfig(dtype="float32")


# -- anchor (pure host, no solver) -------------------------------------------


def test_anchor_delay_physics():
    # pP-P delay at near-vertical incidence is 2h/v_bar (two vertical
    # passes of the source layer stack); at any incidence it is
    # 2h*cos(i)/v_bar < 2h/v_bar, monotone decreasing in distance along
    # the prograde branch and monotone increasing in depth
    mp = table_model("ak135", "Vp")
    d = np.array([30.0, 50.0, 70.0, 90.0])
    prev = None
    for h in (50.0, 200.0, 500.0):
        delay = (depth_phase_first_arrival(d, h, "pP")
                 - mp.first_arrival(d, source_radius=mp.R0 - h))
        # two vertical passes: integrate the table's 1/v over the stack
        ri = np.linspace(mp.R0 - h, mp.R0, 512)
        v = np.interp(ri, mp.v_of_r_r, mp.v_of_r_v)
        t_vert = np.trapezoid(1.0 / v, ri)
        assert np.all(delay < 2.0 * t_vert + 1e-6)
        assert np.all(delay > 0.5 * 2.0 * t_vert)   # cos(i) > 0.5 here
        assert np.all(np.diff(delay) > 0)           # later = steeper? no:
        # delay grows with distance on this branch (cos i grows as the
        # takeoff steepens toward vertical? the opposite: i shrinks with
        # distance, cos i grows), so increasing is the physical sign
        if prev is not None:
            assert np.all(delay > prev)             # deeper = longer delay
        prev = delay


def test_anchor_phase_ordering_and_zero_depth_limit():
    mp = table_model("ak135", "Vp")
    ms = table_model("ak135", "Vs")
    d = [45.0, 75.0]
    h = 300.0
    pP = depth_phase_first_arrival(d, h, "pP")
    sP = depth_phase_first_arrival(d, h, "sP")
    sS = depth_phase_first_arrival(d, h, "sS")
    pS = depth_phase_first_arrival(d, h, "pS")
    assert np.all(pP < sP) and np.all(sP < sS)
    assert np.all(pS < sS)
    # S-main phases later than the direct-S buried branch
    S = ms.first_arrival(d, source_radius=ms.R0 - h)
    assert np.all(sS > S) and np.all(pS > S)
    # h -> 0: pP merges into the surface direct branch
    t0 = depth_phase_first_arrival([60.0], 0.5, "pP")[0]
    assert t0 == pytest.approx(mp.first_arrival([60.0])[0], abs=0.3)


def test_anchor_branch_snell_consistency():
    # the branch is the p-wise sum of its two legs: re-derive one
    # sample from the leg integrals directly
    h = 250.0
    mp = table_model("ak135", "Vp")
    r_src = mp.R0 - h
    p, delta, T, tau = depth_phase_branch(r_src, "pP")
    k = p.size // 2
    ps, ds, Ts, _ = mp.direct_branch(6000)
    j = int(np.nanargmin(np.abs(ps - p[k])))
    Xu, Tu, reach = mp.down_leg(np.array([p[k]]), r_stop=r_src)
    assert reach[0]
    assert T[k] == pytest.approx(Ts[j] + Tu[0], rel=1e-6)
    assert delta[k] == pytest.approx(ds[j] + Xu[0], rel=1e-6)
    assert tau[k] == pytest.approx(T[k] - p[k] * delta[k], rel=1e-12)


def test_anchor_rejects_unknown_and_uncovered():
    with pytest.raises(ValueError, match="unknown depth phase"):
        depth_phase_first_arrival([60.0], 100.0, "Pp")
    # pP covers the antipode (the full-table P branch includes
    # core-turning pPKP-class rays)...
    assert np.isfinite(depth_phase_first_arrival([180.0], 100.0, "pP")[0])
    # ...but no depth phase exists at very short distance from a deep
    # source: the up-leg alone already spans more epicentral angle
    assert np.isnan(depth_phase_first_arrival([2.0], 500.0, "pP")[0])


def test_depth_inversion_round_trip():
    mp = table_model("ak135", "Vp")
    for h_true, d0, phase in ((120.0, 40.0, "pP"), (450.0, 65.0, "sP")):
        t_dp = depth_phase_first_arrival([d0], h_true, phase)[0]
        t_p = mp.first_arrival([d0], source_radius=mp.R0 - h_true)[0]
        h = depth_from_depth_phase(t_dp - t_p, d0, phase)
        assert h == pytest.approx(h_true, abs=0.5)
    with pytest.raises(ValueError, match="outside the bracket"):
        depth_from_depth_phase(1e4, 40.0, "pP")


# -- SPM graph composition ----------------------------------------------------


@pytest.fixture(scope="module")
def annulus_deep():
    gr, A, halo = rt.init_annulus(36, 12, spacing=100.0)
    prof = rt.velocity_profile()
    Up = rt.interpolate_velocity(
        gr.r, rt.LinearInterpolation(prof.r, prof.Vp))
    Us = rt.interpolate_velocity(
        gr.r, rt.LinearInterpolation(prof.r, prof.Vs))
    depth = 400.0
    src = rt.closest_point(gr, 0.0, R - depth, system="polar")
    h_eff = R - float(gr.r[src])     # snap to the actual node radius
    degs = np.array([40.0, 60.0, 80.0])
    rcvs = [rt.closest_point(gr, np.deg2rad(d), R, system="polar")
            for d in degs]
    return gr, A, halo, Up, Us, src, h_eff, degs, rcvs


def test_graph_pp_depth_phase_vs_anchor(annulus_deep):
    gr, A, halo, Up, Us, src, h_eff, degs, rcvs = annulus_deep
    mp = table_model("ak135", "Vp")
    pP = phase_travel_times(A, halo, src, gr, Up, "pP", F32,
                            receivers=rcvs, interpret=True, Us=Us)
    anchor = depth_phase_first_arrival(degs, h_eff, "pP")
    P = phase_travel_times(A, halo, src, gr, Up, "P", F32,
                           receivers=rcvs, interpret=True)
    # SPM converges from above: never undershoots the continuous
    # minimum (f32 slack), overshoots within the same relative envelope
    # as direct P on this coarse 36x12/sp100 grid
    assert np.all(pP > anchor - 0.5)
    assert np.all(pP < anchor * 1.05)
    # always later than the direct buried-source arrival
    assert np.all(pP > np.asarray(P))
    # and the delay itself is the physical observable: compare the
    # graph's pP-P against the anchor's within the coarse-grid budget
    d_graph = pP - np.asarray(P)
    d_anchor = anchor - mp.first_arrival(degs, source_radius=mp.R0 - h_eff)
    assert np.all(np.abs(d_graph - d_anchor) < 0.12 * d_anchor + 2.0)


def test_graph_phase_ordering_and_s_leg_guard(annulus_deep):
    gr, A, halo, Up, Us, src, h_eff, degs, rcvs = annulus_deep
    pP = phase_travel_times(A, halo, src, gr, Up, "pP", F32,
                            receivers=rcvs, interpret=True, Us=Us)
    sP = phase_travel_times(A, halo, src, gr, Up, "sP", F32,
                            receivers=rcvs, interpret=True, Us=Us)
    assert np.all(np.asarray(sP) > np.asarray(pP))
    with pytest.raises(ValueError, match="S leg"):
        phase_travel_times(A, halo, src, gr, Up, "sP", F32,
                           receivers=rcvs, interpret=True)
    with pytest.raises(ValueError, match="receivers"):
        phase_travel_times(A, halo, src, gr, Up, "pP", F32,
                           interpret=True, Us=Us)


def test_graph_direct_call_matches_dispatch(annulus_deep):
    gr, A, halo, Up, Us, src, h_eff, degs, rcvs = annulus_deep
    via_api = phase_travel_times(A, halo, src, gr, Up, "pP", F32,
                                 receivers=rcvs, interpret=True, Us=Us)
    direct = depth_phase_travel_times(A, halo, src, gr, Up, Up, rcvs,
                                      config=F32, interpret=True)
    np.testing.assert_allclose(direct, np.asarray(via_api), rtol=1e-6)


def test_graph_ss_alias(annulus_deep):
    # SS dispatches through the PP machinery with the S table
    gr, A, halo, Up, Us, src, h_eff, degs, rcvs = annulus_deep
    surf_src = rt.closest_point(gr, 0.0, R, system="polar")
    ss = phase_travel_times(A, halo, surf_src, gr, Us, "SS", F32,
                            receivers=rcvs[:2], interpret=True)
    s = phase_travel_times(A, halo, surf_src, gr, Us, "S", F32,
                           receivers=rcvs[:2], interpret=True)
    assert np.all(np.asarray(ss) > np.asarray(s))
    ms = table_model("ak135", "Vs")
    ray_ss = 2.0 * ms.first_arrival(degs[:2] / 2.0)
    assert np.all(ss > ray_ss - 1.0)
    assert np.all(ss < ray_ss * 1.10)


def test_pipeline_depth_recovery_from_graph_picks(annulus_deep):
    # the classical workflow end to end: synthesize pP and P picks on
    # the SPM graph from a buried source, then invert the pP-P delay
    # with the independent anchor.  Coarse-grid delay bias (both fields
    # overshoot, imperfectly cancelling) bounds the depth error at the
    # few-grid-cell scale
    gr, A, halo, Up, Us, src, h_eff, degs, rcvs = annulus_deep
    pP = phase_travel_times(A, halo, src, gr, Up, "pP", F32,
                            receivers=rcvs, interpret=True, Us=Us)
    P = phase_travel_times(A, halo, src, gr, Up, "P", F32,
                           receivers=rcvs, interpret=True)
    h_est = [depth_from_depth_phase(float(pP[i] - P[i]), float(degs[i]))
             for i in range(len(degs))]
    assert abs(np.mean(h_est) - h_eff) < 80.0   # < one radial cell (100)
