"""Earthquake location (solvers/locate.py): reciprocity of the station
fields, exact recovery of on-grid events, robustness to pick noise, and
sub-grid Gauss-Newton refinement against a finer forward grid."""
import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.config import SolverConfig
from raytracer_tpu.solvers.locate import (Location, locate, locate_many,
                                          station_fields)

STATION_DEGS = [0.0, 45.0, 90.0, 135.0, 180.0, 225.0, 315.0]


@pytest.fixture(scope="module")
def coarse():
    gr, A, halo = rt.init_annulus(32, 8, spacing=250.0)
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = rt.interpolate_velocity(gr.r, interp)
    solver = rt.AnnulusSolver(gr, A, halo, U, SolverConfig(dtype="float64"))
    stations = [rt.closest_point(gr, np.deg2rad(d), rt.R, system="polar")
                for d in STATION_DEGS]
    fields = station_fields(solver, stations)
    return gr, solver, stations, fields


def _xy(gr, node):
    return np.array([np.asarray(gr.x)[node], np.asarray(gr.z)[node]])


def test_station_field_reciprocity(coarse):
    """t(source -> station) must equal the station field at the source:
    the weights are symmetric, so solving from the station is solving
    to it."""
    gr, solver, stations, fields = coarse
    src = rt.closest_point(gr, np.deg2rad(70.0), rt.R - 900.0,
                           system="polar")
    D = solver.solve(src, want_prev=False)
    for k, s in enumerate(stations):
        assert np.isclose(float(D.dist[s]), fields[k, src], atol=1e-6), (
            k, float(D.dist[s]), fields[k, src])


def test_on_grid_event_recovered_exactly(coarse):
    gr, solver, stations, fields = coarse
    true = rt.closest_point(gr, np.deg2rad(123.0), rt.R - 600.0,
                            system="polar")
    t_obs = fields[:, true] + 7.5
    loc = locate(solver, stations, t_obs, refine=False, fields=fields)
    assert np.linalg.norm(_xy(gr, loc.node) - _xy(gr, true)) < 1.0
    assert abs(loc.t0 - 7.5) < 1e-6
    assert loc.node_rms < 1e-8
    # refinement must not move an exact solution
    loc_r = locate(solver, stations, t_obs, refine=True, fields=fields)
    assert np.linalg.norm([loc_r.x, loc_r.z] - _xy(gr, true)) < 5.0
    assert loc_r.rms <= loc.node_rms + 1e-9


def test_noisy_picks_stay_near_truth(coarse):
    gr, solver, stations, fields = coarse
    true = rt.closest_point(gr, np.deg2rad(200.0), rt.R - 1200.0,
                            system="polar")
    rng = np.random.default_rng(7)
    t_obs = fields[:, true] + 3.0 + rng.normal(0.0, 0.3, len(stations))
    loc = locate(solver, stations, t_obs, sigma=[0.3] * len(stations),
                 fields=fields)
    err = np.linalg.norm(np.array([loc.x, loc.z]) - _xy(gr, true))
    # 0.3 s picks x ~10 km/s velocities -> a few node spacings at worst
    assert err < 500.0, err
    assert abs(loc.t0 - 3.0) < 2.0, loc.t0


def test_subgrid_refinement_beats_grid_search(coarse):
    """Observed times from a 2x finer forward grid, event OFF the coarse
    lattice: the Gauss-Newton step must land closer to the truth than
    the best coarse node."""
    gr, solver, stations, fields = coarse
    grf, Af, halof = rt.init_annulus(64, 16, spacing=120.0)
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    Uf = rt.interpolate_velocity(grf.r, interp)
    fine = rt.AnnulusSolver(grf, Af, halof, Uf,
                            SolverConfig(dtype="float64"))
    st_fine = [rt.closest_point(grf, np.deg2rad(d), rt.R, system="polar")
               for d in STATION_DEGS]
    true = rt.closest_point(grf, np.deg2rad(73.1), rt.R - 400.0,
                            system="polar")
    t_true = _xy(grf, true)
    t_obs = station_fields(fine, st_fine)[:, true]

    loc = locate(solver, stations, t_obs, refine=True)
    node_err = np.linalg.norm(_xy(gr, loc.node) - t_true)
    ref_err = np.linalg.norm(np.array([loc.x, loc.z]) - t_true)
    assert ref_err < node_err, (ref_err, node_err)
    assert ref_err < 250.0, ref_err      # inside one coarse spacing


def test_bend_mode_beats_plain_gauss_newton(coarse):
    """bend=True replaces the node's SPM model times with bending-
    refined ones: the coarse grid's directional bias drops out of the
    residuals and the position error shrinks (mean over events)."""
    gr, solver, stations, fields = coarse
    grf, Af, halof = rt.init_annulus(64, 16, spacing=120.0)
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    fine = rt.AnnulusSolver(grf, Af, halof,
                            rt.interpolate_velocity(grf.r, interp),
                            SolverConfig(dtype="float64"))
    st_fine = [rt.closest_point(grf, np.deg2rad(d), rt.R, system="polar")
               for d in STATION_DEGS]
    ffine = station_fields(fine, st_fine)
    errs_gn, errs_bent = [], []
    for deg, dep in [(73.1, 400.0), (141.7, 150.0), (222.3, 1000.0)]:
        true = rt.closest_point(grf, np.deg2rad(deg), rt.R - dep,
                                system="polar")
        txy = _xy(grf, true)
        t_obs = ffine[:, true]
        l0 = locate(solver, stations, t_obs, fields=fields)
        lb = locate(solver, stations, t_obs, fields=fields, bend=True,
                    profile=(prof.r, prof.Vp))
        errs_gn.append(np.linalg.norm(np.array([l0.x, l0.z]) - txy))
        errs_bent.append(np.linalg.norm(np.array([lb.x, lb.z]) - txy))
        # the bent residual rms must be small: the SPM bias is gone
        assert lb.rms < 5.0, lb.rms
    assert np.mean(errs_bent) < 0.8 * np.mean(errs_gn), (errs_bent,
                                                         errs_gn)


def test_locate3d_wedge():
    """3-D wedge: reciprocity of the station fields, exact on-grid
    recovery, and a stable Gauss-Newton step on exact data."""
    import raytracer_tpu.solvers.solve3d as s3
    from raytracer_tpu.solvers.locate import (Location3D, locate3d,
                                              station_fields3d)

    g = rt.grid3d((0.0, 0.0, rt.R - 1500.0),
                  (np.deg2rad(40.0), np.deg2rad(40.0), rt.R),
                  (20, 16, 12))
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = rt.interpolate_velocity(g.r, interp)
    cfg = SolverConfig(dtype="float64")
    n0, n1, n2 = g.nnods
    top = n0 * n1 * (n2 - 1)
    stations = [top, top + (n0 - 1), top + n0 * (n1 - 1),
                top + n0 * n1 - 1, top + n0 * (n1 // 2) + n0 // 2]
    fields = station_fields3d(g, U, stations, cfg)

    # reciprocity: a direct solve from the source matches the fields
    src = (n0 // 3) + n0 * (n1 // 3) + n0 * n1 * (n2 // 2)
    d, _ = s3.solve3d(g, U, [src], cfg)
    for k, s in enumerate(stations):
        assert np.isclose(d[0, s], fields[k, src], atol=1e-6)

    t_obs = fields[:, src] + 4.0
    loc = locate3d(g, U, stations, t_obs, fields=fields, refine=False)
    assert isinstance(loc, Location3D)
    assert loc.node == src
    assert abs(loc.t0 - 4.0) < 1e-6 and loc.node_rms < 1e-8
    loc_r = locate3d(g, U, stations, t_obs, fields=fields, refine=True)
    truth = np.array([g.x[src], g.y[src], g.z[src]])
    assert np.linalg.norm(np.array([loc_r.x, loc_r.y, loc_r.z]) - truth) \
        < 60.0
    assert loc_r.rms <= loc.node_rms + 1e-9


def test_locate3d_off_grid_event():
    """Event between lattice points of a coarse 3-D locator, observed on
    a 2x finer forward grid: the refined position must beat the node."""
    from raytracer_tpu.solvers.locate import locate3d, station_fields3d

    lo, hi = (0.0, 0.0, rt.R - 1500.0), (np.deg2rad(40.0),
                                         np.deg2rad(40.0), rt.R)
    g = rt.grid3d(lo, hi, (16, 12, 10))
    gf = rt.grid3d(lo, hi, (31, 23, 19))
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U, Uf = (rt.interpolate_velocity(x.r, interp) for x in (g, gf))
    cfg = SolverConfig(dtype="float64")

    def surface_nodes(grid, fracs):
        n0, n1, n2 = grid.nnods
        top = n0 * n1 * (n2 - 1)
        return [top + int(f0 * (n0 - 1)) + n0 * int(f1 * (n1 - 1))
                for f0, f1 in fracs]

    fracs = [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0), (0.5, 0.5),
             (0.25, 0.75)]
    stations = surface_nodes(g, fracs)
    st_fine = surface_nodes(gf, fracs)
    # fine node at odd indices -> between every coarse lattice plane
    n0f, n1f, _ = gf.nnods
    src_f = 9 + n0f * 7 + n0f * n1f * 9
    t_obs = station_fields3d(gf, Uf, st_fine, cfg)[:, src_f]
    truth = np.array([gf.x[src_f], gf.y[src_f], gf.z[src_f]])

    loc = locate3d(g, U, stations, t_obs, refine=True, config=cfg)
    node_err = np.linalg.norm(
        np.array([g.x[loc.node], g.y[loc.node], g.z[loc.node]]) - truth)
    ref_err = np.linalg.norm(np.array([loc.x, loc.y, loc.z]) - truth)
    assert ref_err < node_err, (ref_err, node_err)

    # bend mode: prev3d backtraces bent to the Fermat limit strip the
    # SPM bias from the residuals
    prof = rt.velocity_profile("ak135")
    lb = locate3d(g, U, stations, t_obs, refine=True, bend=True,
                  profile=(prof.r, prof.Vp), config=cfg)
    bent_err = np.linalg.norm(np.array([lb.x, lb.y, lb.z]) - truth)
    assert lb.rms < loc.rms, (lb.rms, loc.rms)
    assert bent_err < node_err, (bent_err, node_err)


def test_locate_on_unstructured_delaunay_mesh():
    """The locator is layout-agnostic: on a Delaunay annulus (banded/ELL
    solver path, no circulant structure) an on-grid event is recovered
    exactly, including the host PrevRecovery-based bend machinery."""
    from raytracer_tpu.models.annulus import node_adjacency
    from raytracer_tpu.models.delaunay import (add_midpoints,
                                               triangle_annulus_2d)

    gr = add_midpoints(triangle_annulus_2d(nr=12, spacing=500.0))
    A = node_adjacency(gr, star=0)
    halo = np.empty((0, 2), np.int64)
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = rt.interpolate_velocity(gr.r, interp)
    solver = rt.AnnulusSolver(gr, A, halo, U, SolverConfig(dtype="float64"))
    assert solver.circulant is None      # really the non-circulant path
    stations = [rt.closest_point(gr, np.deg2rad(d), rt.R, system="polar")
                for d in (0.0, 60.0, 140.0, 220.0, 300.0)]
    fields = station_fields(solver, stations)
    true = rt.closest_point(gr, np.deg2rad(100.0), rt.R - 800.0,
                            system="polar")
    t_obs = fields[:, true] + 2.0
    loc = locate(solver, stations, t_obs, refine=False, fields=fields)
    assert np.linalg.norm(_xy(gr, loc.node) - _xy(gr, true)) < 1.0
    assert abs(loc.t0 - 2.0) < 1e-6
    lb = locate(solver, stations, t_obs, fields=fields, bend=True,
                profile=(prof.r, prof.Vp))
    assert np.linalg.norm(np.array([lb.x, lb.z]) - _xy(gr, true)) < 600.0


def test_locate_many3d_matches_per_event():
    """3-D catalogue path: batched searches + shared prev trees must
    reproduce per-event locate3d (incl. bend mode) exactly."""
    from raytracer_tpu.solvers.locate import (locate3d, locate_many3d,
                                              station_fields3d)

    g = rt.grid3d((0.0, 0.0, rt.R - 1500.0),
                  (np.deg2rad(40.0), np.deg2rad(40.0), rt.R),
                  (16, 12, 10))
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = rt.interpolate_velocity(g.r, interp)
    cfg = SolverConfig(dtype="float64")
    n0, n1, n2 = g.nnods
    top = n0 * n1 * (n2 - 1)
    stations = [top, top + (n0 - 1), top + n0 * (n1 - 1),
                top + n0 * n1 - 1, top + n0 * (n1 // 2) + n0 // 2]
    fields = station_fields3d(g, U, stations, cfg)
    rng = np.random.default_rng(2)
    ev = rng.integers(0, g.nnods_total, size=5)
    T_obs = fields[:, ev].T + rng.normal(0.0, 0.5, (5, len(stations)))
    batched = locate_many3d(g, U, stations, T_obs, fields=fields,
                            bend=True, profile=(prof.r, prof.Vp),
                            config=cfg)
    for row, lb in zip(T_obs, batched):
        l1 = locate3d(g, U, stations, row, fields=fields, bend=True,
                      profile=(prof.r, prof.Vp), config=cfg)
        assert l1.node == lb.node
        assert np.allclose([l1.x, l1.y, l1.z], [lb.x, lb.y, lb.z],
                           atol=1e-8)
        assert np.isclose(l1.t0, lb.t0, atol=1e-8)


def test_locate_many_catalogue(coarse):
    gr, solver, stations, fields = coarse
    nodes = [rt.closest_point(gr, np.deg2rad(d), rt.R - 800.0,
                              system="polar") for d in (30.0, 260.0)]
    T_obs = np.stack([fields[:, n] + 1.0 for n in nodes])
    locs = locate_many(solver, stations, T_obs, fields=fields)
    assert len(locs) == 2 and all(isinstance(l, Location) for l in locs)
    for l, n in zip(locs, nodes):
        assert np.linalg.norm(_xy(gr, l.node) - _xy(gr, n)) < 1.0


def test_double_difference_improves_relative_geometry(coarse):
    """Two nearby events with station-systematic model errors: the
    errors cancel in the differenced residuals, so the dd inter-event
    vector beats the independently-located one."""
    from raytracer_tpu.solvers.locate import locate_dd

    gr, solver, stations, fields = coarse
    grf, Af, halof = rt.init_annulus(64, 16, spacing=120.0)
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    fine = rt.AnnulusSolver(grf, Af, halof,
                            rt.interpolate_velocity(grf.r, interp),
                            SolverConfig(dtype="float64"))
    st_fine = [rt.closest_point(grf, np.deg2rad(d), rt.R, system="polar")
               for d in STATION_DEGS]
    ffine = station_fields(fine, st_fine)
    ev = [rt.closest_point(grf, np.deg2rad(d), rt.R - h, system="polar")
          for d, h in ((80.0, 500.0), (82.5, 650.0))]
    true_rel = _xy(grf, ev[0]) - _xy(grf, ev[1])
    rng = np.random.default_rng(5)
    syst = rng.normal(0.0, 1.5, len(stations))      # per-station, shared
    T_obs = np.stack([ffine[:, e] + syst for e in ev])

    indep = locate_many(solver, stations, T_obs, fields=fields)
    dd = locate_dd(solver, stations, T_obs, fields=fields)
    rel_i = np.array([indep[0].x - indep[1].x, indep[0].z - indep[1].z])
    rel_d = np.array([dd[0].x - dd[1].x, dd[0].z - dd[1].z])
    err_i = np.linalg.norm(rel_i - true_rel)
    err_d = np.linalg.norm(rel_d - true_rel)
    assert err_d < err_i, (err_d, err_i)
    assert err_d < 120.0, err_d


def test_batched_search_matches_per_event(coarse):
    """The catalogue's one-dispatch matmul search must reproduce the
    per-event grid search (node, t0, misfit) on noisy off-node picks."""
    gr, solver, stations, fields = coarse
    rng = np.random.default_rng(3)
    nodes = rng.integers(0, gr.nnods, size=9)
    T_obs = fields[:, nodes].T + rng.normal(0.0, 1.0,
                                            (9, len(stations))) + 2.0
    sigma = [0.5] * len(stations)
    batched = locate_many(solver, stations, T_obs, sigma=sigma,
                          refine=False, fields=fields)
    for row, lb in zip(T_obs, batched):
        l1 = locate(solver, stations, row, sigma=sigma, refine=False,
                    fields=fields)
        assert l1.node == lb.node
        assert np.isclose(l1.t0, lb.t0, atol=1e-9)
        assert np.isclose(l1.node_rms, lb.node_rms, atol=1e-9)


def test_locate_phases_on_grid_exact(coarse):
    """Joint P+S picks for an on-grid event: exact node recovery, exact
    origin time, and the refined solution does not wander."""
    from raytracer_tpu.solvers.locate import locate_phases

    gr, solver, stations, fields = coarse
    prof = rt.velocity_profile("ak135")
    Us = rt.interpolate_velocity(
        gr.r, rt.LinearInterpolation(prof.r, prof.Vs))
    solver_s = rt.AnnulusSolver(gr, solver.A, solver.halo, Us,
                                SolverConfig(dtype="float64"))
    st_s = stations[:4]                  # sparser S network
    f_s = station_fields(solver_s, st_s)
    true = rt.closest_point(gr, np.deg2rad(123.0), rt.R - 600.0,
                            system="polar")
    loc = locate_phases([solver, solver_s], [stations, st_s],
                        [fields[:, true] + 7.5, f_s[:, true] + 7.5],
                        refine=False, fields=[fields, f_s])
    assert np.linalg.norm(_xy(gr, loc.node) - _xy(gr, true)) < 1.0
    assert abs(loc.t0 - 7.5) < 1e-6
    assert loc.node_rms < 1e-8
    loc_r = locate_phases([solver, solver_s], [stations, st_s],
                          [fields[:, true] + 7.5, f_s[:, true] + 7.5],
                          refine=True, fields=[fields, f_s])
    assert np.linalg.norm([loc_r.x, loc_r.z] - _xy(gr, true)) < 5.0


def test_locate_phases_sparse_network_beats_p_only(coarse):
    """Two one-sided stations: P-only picks leave the distance/origin-
    time trade-off open; adding S picks at the SAME stations (the S-P
    time fixes source distance independently of t0) must cut the mean
    position error."""
    from raytracer_tpu.solvers.locate import locate_phases

    gr, solver, stations, fields = coarse
    prof = rt.velocity_profile("ak135")
    Us = rt.interpolate_velocity(
        gr.r, rt.LinearInterpolation(prof.r, prof.Vs))
    solver_s = rt.AnnulusSolver(gr, solver.A, solver.halo, Us,
                                SolverConfig(dtype="float64"))
    # fine forward grids for truth picks, both waves
    grf, Af, halof = rt.init_annulus(64, 16, spacing=120.0)
    Upf = rt.interpolate_velocity(
        grf.r, rt.LinearInterpolation(prof.r, prof.Vp))
    Usf = rt.interpolate_velocity(
        grf.r, rt.LinearInterpolation(prof.r, prof.Vs))
    cfgf = SolverConfig(dtype="float64")
    fine_p = rt.AnnulusSolver(grf, Af, halof, Upf, cfgf)
    fine_s = rt.AnnulusSolver(grf, Af, halof, Usf, cfgf)
    sub = [0, 1]                         # stations at 0 and 45 deg only
    st_c = [stations[i] for i in sub]
    st_f = [rt.closest_point(grf, np.deg2rad(STATION_DEGS[i]), rt.R,
                             system="polar") for i in sub]
    ffp = station_fields(fine_p, st_f)
    ffs = station_fields(fine_s, st_f)
    f_cp = fields[sub]
    f_cs = station_fields(solver_s, st_c)
    errs_p, errs_ps = [], []
    for deg, dep in [(25.3, 500.0), (60.7, 300.0), (80.2, 800.0)]:
        true = rt.closest_point(grf, np.deg2rad(deg), rt.R - dep,
                                system="polar")
        txy = _xy(grf, true)
        lp = locate(solver, st_c, ffp[:, true], fields=f_cp)
        lps = locate_phases([solver, solver_s], [st_c, st_c],
                            [ffp[:, true], ffs[:, true]],
                            fields=[f_cp, f_cs])
        errs_p.append(np.linalg.norm(np.array([lp.x, lp.z]) - txy))
        errs_ps.append(np.linalg.norm(np.array([lps.x, lps.z]) - txy))
    assert np.mean(errs_ps) < np.mean(errs_p), (errs_ps, errs_p)
    assert np.mean(errs_ps) < 300.0, errs_ps


def test_locate3d_phases_exact_and_sparse():
    """3-D joint P+S: exact on-grid recovery, and with only TWO corner
    stations the S picks must pull the solution closer to the truth
    than P alone (same degeneracy argument as the 2-D test)."""
    from raytracer_tpu.solvers.locate import (locate3d, locate3d_phases,
                                              station_fields3d)

    g = rt.grid3d((0.0, 0.0, rt.R - 1500.0),
                  (np.deg2rad(40.0), np.deg2rad(40.0), rt.R),
                  (20, 16, 12))
    prof = rt.velocity_profile("ak135")
    Up = rt.interpolate_velocity(
        g.r, rt.LinearInterpolation(prof.r, prof.Vp))
    Us = rt.interpolate_velocity(
        g.r, rt.LinearInterpolation(prof.r, prof.Vs))
    cfg = SolverConfig(dtype="float64")
    n0, n1, n2 = g.nnods
    top = n0 * n1 * (n2 - 1)
    st_p = [top, top + (n0 - 1), top + n0 * (n1 - 1),
            top + n0 * n1 - 1, top + n0 * (n1 // 2) + n0 // 2]
    st_s = st_p[:3]
    f_p = station_fields3d(g, Up, st_p, cfg)
    f_s = station_fields3d(g, Us, st_s, cfg)

    src = (n0 // 3) + n0 * (n1 // 3) + n0 * n1 * (n2 // 2)
    loc = locate3d_phases(g, [Up, Us], [st_p, st_s],
                          [f_p[:, src] + 4.0, f_s[:, src] + 4.0],
                          refine=False, fields=[f_p, f_s], config=cfg)
    assert loc.node == src
    assert abs(loc.t0 - 4.0) < 1e-6 and loc.node_rms < 1e-8

    # degenerate 2-station network + pick noise: with K=2 and free t0
    # the P-only misfit is zero on a whole surface of nodes, so noise
    # throws the argmin far from the truth; S picks collapse the
    # surface (measured means 376 km -> 7 km over these three events)
    st2 = st_p[:2]
    rng = np.random.default_rng(7)
    errs_p, errs_ps = [], []
    for ev in [(n0 // 3) + n0 * (n1 // 3) + n0 * n1 * (n2 // 2),
               (2 * n0 // 3) + n0 * (n1 // 2) + n0 * n1 * (n2 // 3),
               (n0 // 2) + n0 * (2 * n1 // 3) + n0 * n1 * (2 * n2 // 3)]:
        truth = np.array([g.x[ev], g.y[ev], g.z[ev]])
        tp = f_p[:2, ev] + rng.normal(0, 0.3, 2)
        ts = f_s[:2, ev] + rng.normal(0, 0.3, 2)
        lp = locate3d(g, Up, st2, tp, fields=f_p[:2], config=cfg)
        lps = locate3d_phases(g, [Up, Us], [st2, st2], [tp, ts],
                              fields=[f_p[:2], f_s[:2]], config=cfg)
        errs_p.append(np.linalg.norm(
            np.array([lp.x, lp.y, lp.z]) - truth))
        errs_ps.append(np.linalg.norm(
            np.array([lps.x, lps.y, lps.z]) - truth))
    assert np.mean(errs_ps) < np.mean(errs_p), (errs_ps, errs_p)
    assert np.mean(errs_ps) < 50.0, errs_ps    # measured ~7 km
