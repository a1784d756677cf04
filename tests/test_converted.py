"""Converted core phases (solvers/phases.py::converted_travel_times).

The reference has no converted-phase capability (its phase library
src/multiphase/library.jl:9-31 is dead code); these tests pin the new
three-stage per-leg-velocity solve against (a) the independent
flat-earth converted-branch anchor (models/flatearth.py), (b) the
plain and reflected solves' class semantics, and (c) the directional-
sweep staged engine.
"""
import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig
from raytracer_tpu.models.flatearth import (
    cmb_radius,
    converted_first_arrival,
    table_model,
)
from raytracer_tpu.models.partition import partition_grid
from raytracer_tpu.solvers.phases import (
    converted_travel_times,
    phase_travel_times,
    reflected_travel_times,
)

F32 = SolverConfig(dtype="float32")


# -- anchor self-consistency (pure host, no solver) -------------------------


def test_anchor_pkp_class_hits_published_pkikp():
    # the all-P converted branch through the core stack must reproduce
    # the published AK135 PKIKP antipodal time (1212 s; Kennett et al.
    # 1995 table) -- the same constant the main anchor battery pins
    t = converted_first_arrival([180.0], legs=("Vp", "Vp", "Vp"))[0]
    assert t == pytest.approx(1212.0, abs=1.0)


def test_anchor_sks_crossover_and_monotonicity():
    # textbook SKS kinematics: overtakes direct S near ~82 deg, then
    # runs ahead; branch is monotone increasing in distance
    d = np.array([85.0, 95.0, 105.0, 115.0, 130.0])
    sks = converted_first_arrival(d, legs=("Vs", "Vp", "Vs"))
    assert np.all(np.isfinite(sks))
    assert np.all(np.diff(sks) > 0)
    ms = table_model("ak135", "Vs")
    s85 = ms.first_arrival([85.0], diff_radii=(cmb_radius(),))[0]
    assert sks[0] < s85  # SKS already leads S at 85 deg
    # and out-of-branch distances return NaN, not an extrapolation
    assert np.isnan(converted_first_arrival([5.0],
                                            legs=("Vs", "Vp", "Vs"))[0])


def test_anchor_skp_between_sks_and_pkp():
    # one S leg is slower than none and faster than two
    d = [140.0]
    pkp = converted_first_arrival(d, legs=("Vp", "Vp", "Vp"))[0]
    skp = converted_first_arrival(d, legs=("Vs", "Vp", "Vp"))[0]
    sks = converted_first_arrival(d, legs=("Vs", "Vp", "Vs"))[0]
    assert pkp < skp < sks
    # and PKS == SKP by reciprocity of the leg sum
    pks = converted_first_arrival(d, legs=("Vp", "Vp", "Vs"))[0]
    assert pks == pytest.approx(skp, abs=1e-9)


# -- SPM staged solve --------------------------------------------------------


@pytest.fixture(scope="module")
def annulus_conv():
    gr, A, halo = rt.init_annulus(36, 12, spacing=100.0)
    prof = rt.velocity_profile()
    Up = rt.interpolate_velocity(
        gr.r, rt.LinearInterpolation(prof.r, prof.Vp))
    Us = rt.interpolate_velocity(
        gr.r, rt.LinearInterpolation(prof.r, prof.Vs))
    src = rt.closest_point(gr, 0.0, R, system="polar")
    reuse = {}
    sks = converted_travel_times(A, halo, src, gr, Us, Up, config=F32,
                                 interpret=True, _reuse=reuse)
    return gr, A, halo, Up, Us, src, sks, reuse


def test_sks_matches_anchor_and_beats_topside_s(annulus_conv):
    gr, A, halo, Up, Us, src, sks, _ = annulus_conv
    ms = table_model("ak135", "Vs")
    for deg in (100.0, 110.0, 120.0):
        rcv = rt.closest_point(gr, np.deg2rad(deg), R, system="polar")
        anchor = converted_first_arrival([deg], legs=("Vs", "Vp", "Vs"))[0]
        # coarse 36x12/sp100 grid: SPM overshoots a few percent, never
        # undershoots the continuous minimum by more than f32 noise
        assert sks[rcv] > anchor - 0.5
        assert sks[rcv] < anchor * 1.05
        # the K leg genuinely contributes: the best all-topside-S path
        # (grazing + CMB creep, the Sdiff kinematic) is slower
        s_creep = ms.first_arrival([deg], diff_radii=(cmb_radius(),))[0]
        assert sks[rcv] < s_creep


def test_sks_region_and_class_floor(annulus_conv):
    gr, A, halo, Up, Us, src, sks, reuse = annulus_conv
    part = partition_grid(gr)
    # final field lives on the up-leg region: core interior is +inf
    deep = (part.layer_of == 8) & (gr.r < cmb_radius() - 1.0)
    assert not np.isfinite(sks[deep]).any()
    surf = gr.r == gr.r.max()
    assert np.isfinite(sks[surf]).all()
    # class floor: everywhere at/below the ScS-class field built from
    # the same S pack (degenerate core leg is inside the class)
    scs = reflected_travel_times(A, halo, src, gr, Us, "cmb", F32,
                                 interpret=True)
    ok = np.isfinite(scs)
    assert np.all(sks[ok] <= scs[ok] + 5e-2)


def test_pkp_class_equals_direct_p_first_arrival(annulus_conv):
    # all-P legs: the class min is the topside creep / direct branch --
    # the staged field must never beat the plain solve's first arrival
    # at the surface (same class, same model).  At the antipode the
    # direct graph minimum creeps ONE RING ABOVE the CMB without ever
    # touching a boundary node (empirically: path min radius 3555 km vs
    # CMB 3481 km on this grid), so the boundary-touching class pays at
    # most one dip down to the boundary and back:
    # 2 x (radial ring gap near the CMB, <= spacing) / v_cmb ~ 15 s.
    gr, A, halo, Up, Us, src, _, reuse = annulus_conv
    pkp = converted_travel_times(A, halo, src, gr, Up, Up, config=F32,
                                 interpret=True, _reuse=reuse)
    solver = rt.AnnulusSolver(gr, A, halo, Up, F32, method="circulant")
    direct = np.asarray(solver.solve(src, want_prev=False).dist)
    surf = np.flatnonzero(gr.r == gr.r.max())
    assert np.all(pkp[surf] >= direct[surf] - 5e-3)
    r180 = rt.closest_point(gr, np.pi, R, system="polar")
    dip = 2 * 100.0 / 13.6
    assert direct[r180] - 5e-3 <= pkp[r180] <= direct[r180] + dip


def test_phase_api_dispatch(annulus_conv):
    gr, A, halo, Up, Us, src, sks, _ = annulus_conv
    rcv = rt.closest_point(gr, np.deg2rad(110.0), R, system="polar")
    t = phase_travel_times(A, halo, src, gr, Up, "SKS", F32,
                           receivers=[rcv], interpret=True, Us=Us)
    assert t[0] == pytest.approx(sks[rcv], abs=5e-3)
    with pytest.raises(ValueError, match="S leg"):
        phase_travel_times(A, halo, src, gr, Up, "SKS", F32,
                           interpret=True)


def test_driver_phases_csv(tmp_path):
    # end-to-end --phases surface: one CSV, one column per phase, PcP
    # and SKS finite at their receivers, ordered sanely
    import os
    import runpy
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prefix = str(tmp_path / "run")
    argv_old = sys.argv
    sys.argv = ["main_annulus.py", "--ntheta", "16", "--nr", "6",
                "--spacing", "300", "--out-prefix", prefix,
                "--phases", "PcP,SKS"]
    try:
        runpy.run_path(os.path.join(root, "main_annulus.py"),
                       run_name="__main__")
    finally:
        sys.argv = argv_old
    rows = np.genfromtxt(prefix + "_phases.csv", delimiter=",",
                         skip_header=2)
    assert rows.shape[1] == 3
    deg, pcp, sks = rows[:, 0], rows[:, 1], rows[:, 2]
    near = deg <= 60
    assert np.isfinite(pcp[near]).all()
    mid = (deg >= 90) & (deg <= 150)
    assert np.isfinite(sks[mid]).all()
    assert np.all(sks[mid] > pcp[mid])    # S legs are slower than all-P


def test_sweep_engine_matches_stream(annulus_conv):
    gr, A, halo, Up, Us, src, sks, reuse = annulus_conv
    d_sw = converted_travel_times(A, halo, src, gr, Us, Up, config=F32,
                                  interpret=True, _reuse=reuse,
                                  engine="sweep")
    ok = np.isfinite(sks)
    np.testing.assert_array_equal(ok, np.isfinite(d_sw))
    np.testing.assert_allclose(d_sw[ok], sks[ok], rtol=1e-6, atol=5e-3)
