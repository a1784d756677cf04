"""Theta-sharded (domain-decomposed) solve equality on the virtual mesh.

VERDICT r03 item 3: grid-axis sharding with a +-2-column ppermute halo
per Gauss-Seidel round -- the distributed capability class the reference
lacks.  Runs on the 8-device CPU mesh from conftest.
"""
import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig
from raytracer_tpu.ops.circulant import build_circulant, solve_circulant
from raytracer_tpu.parallel.theta_shard import (make_theta_mesh,
                                                solve_sweep_theta_sharded)

CFG = SolverConfig(dtype="float32")
TOL = 2e-3


@pytest.fixture(scope="module")
def problem():
    gr, A, halo = rt.init_annulus(48, 12, spacing=150.0)
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = rt.interpolate_velocity(gr.r, interp)
    return gr, build_circulant(gr, A, halo, U)


def test_matches_single_device_fixpoint(problem):
    gr, cg = problem
    mesh = make_theta_mesh()
    assert mesh.devices.size == 8
    srcs = [rt.closest_point(gr, 0.0, R, system="polar"),
            rt.closest_point(gr, np.deg2rad(113.0), 4000.0, system="polar"),
            cg.cmap.center]
    vals, rounds = solve_sweep_theta_sharded(cg, srcs, CFG, mesh=mesh)
    assert rounds < 30
    for i, src in enumerate(srcs):
        d_ref, _ = solve_circulant(cg, src, CFG)
        np.testing.assert_allclose(vals[i], d_ref, atol=TOL, rtol=0,
                                   err_msg=f"source {src}")


def test_receiver_subset_and_small_mesh(problem):
    gr, cg = problem
    import jax

    mesh = make_theta_mesh(jax.devices()[:4])
    src = rt.closest_point(gr, 0.0, R, system="polar")
    recs = [rt.closest_point(gr, np.deg2rad(d), R, system="polar")
            for d in (30.0, 90.0, 150.0)]
    vals, _ = solve_sweep_theta_sharded(cg, [src], CFG, mesh=mesh,
                                        receivers=recs)
    d_ref, _ = solve_circulant(cg, src, CFG)
    np.testing.assert_allclose(vals[0], d_ref[recs], atol=TOL, rtol=0)


def test_indivisible_mesh_raises(problem):
    gr, cg = problem
    import jax

    mesh = make_theta_mesh(jax.devices()[:5])   # 48 % 5 != 0
    with pytest.raises(ValueError, match="not divisible"):
        solve_sweep_theta_sharded(cg, [0], CFG, mesh=mesh)


def test_2d_mesh_matches_single_device(problem):
    # composed scaling mode: sources DP over mesh rows x theta domain
    # decomposition inside each row; S=3 exercises the pad-and-drop path
    # (3 % 2 != 0) and the centre source rides a sharded row
    from raytracer_tpu.parallel.theta_shard import (make_grid_mesh,
                                                    solve_sweep_mesh_sharded)

    gr, cg = problem
    mesh = make_grid_mesh(2)            # 2 source rows x 4 theta columns
    assert mesh.shape == {"src": 2, "theta": 4}
    srcs = [rt.closest_point(gr, 0.0, R, system="polar"),
            rt.closest_point(gr, np.deg2rad(113.0), 4000.0, system="polar"),
            cg.cmap.center]
    vals, rounds = solve_sweep_mesh_sharded(cg, srcs, CFG, mesh=mesh)
    assert vals.shape[0] == 3 and rounds < 30
    for i, src in enumerate(srcs):
        d_ref, _ = solve_circulant(cg, src, CFG)
        np.testing.assert_allclose(vals[i], d_ref, atol=TOL, rtol=0,
                                   err_msg=f"source {src}")


def test_2d_mesh_receivers_and_tall_shape(problem):
    from raytracer_tpu.parallel.theta_shard import (make_grid_mesh,
                                                    solve_sweep_mesh_sharded)

    gr, cg = problem
    mesh = make_grid_mesh(4, 2)         # tall: 4 source rows x 2 columns
    srcs = [rt.closest_point(gr, 0.0, R, system="polar"),
            rt.closest_point(gr, np.deg2rad(60.0), R, system="polar")]
    recs = [rt.closest_point(gr, np.deg2rad(d), R, system="polar")
            for d in (30.0, 90.0, 150.0)]
    vals, _ = solve_sweep_mesh_sharded(cg, srcs, CFG, mesh=mesh,
                                       receivers=recs)
    assert vals.shape == (2, 3)
    for i, src in enumerate(srcs):
        d_ref, _ = solve_circulant(cg, src, CFG)
        np.testing.assert_allclose(vals[i], d_ref[recs], atol=TOL, rtol=0)


def test_staged_phase_sharded_matches_single_device():
    """VERDICT r04 item 4: the region-masked staged solve (phases.py's
    PcP engine) on top of the theta domain decomposition equals the
    single-device staged sweep engine."""
    import jax

    from raytracer_tpu.ops.sweep_theta import solve_sweep_staged
    from raytracer_tpu.parallel.theta_shard import (
        solve_sweep_staged_theta_sharded)
    from raytracer_tpu.solvers import phases as ph

    gr, A, halo = rt.init_annulus(16, 6, spacing=200.0)
    prof = rt.velocity_profile("ak135")
    U = rt.interpolate_velocity(gr.r, rt.LinearInterpolation(prof.r,
                                                             prof.Vp))
    src = rt.closest_point(gr, 0.0, R, system="polar")
    k = ph.REFLECTORS["cmb"]
    cg, ws, static, tables, lane, keep, halo_map = ph._phase_setup(
        A, halo, gr, U, k, CFG, engine="sweep")
    for reflected in (False, True):
        stages = ph._phase_stages(static, tables, lane, keep, halo_map,
                                  "sweep", reflected=reflected)
        d_ref, _ = solve_sweep_staged(cg, ws, stages, [src], CFG,
                                      interpret=True)
        mesh = make_theta_mesh(jax.devices()[:4])
        d_sh, _ = solve_sweep_staged_theta_sharded(cg, ws, stages, [src],
                                                   CFG, mesh=mesh)
        fin = np.isfinite(d_ref[0])
        assert np.array_equal(fin, np.isfinite(d_sh[0]))
        np.testing.assert_allclose(d_sh[0][fin], d_ref[0][fin], atol=TOL,
                                   rtol=0,
                                   err_msg=f"reflected={reflected}")


def test_station_fields_sharded_matches_locator_fields():
    """VERDICT r04 item 4: locate.station_fields sharded over devices
    (station-axis DP x optional theta decomposition) equals the
    single-device reciprocity fields the locator consumes."""
    import jax

    from raytracer_tpu.parallel.theta_shard import (make_grid_mesh,
                                                    station_fields_sharded)
    from raytracer_tpu.solvers.locate import station_fields

    gr, A, halo = rt.init_annulus(24, 8, spacing=200.0)
    prof = rt.velocity_profile("ak135")
    U = rt.interpolate_velocity(gr.r, rt.LinearInterpolation(prof.r,
                                                             prof.Vp))
    cg = build_circulant(gr, A, halo, U)
    stations = [rt.closest_point(gr, np.deg2rad(d), R, system="polar")
                for d in (20.0, 75.0, 130.0)]
    solver = rt.AnnulusSolver(gr, A, halo, U, CFG, method="circulant")
    F_ref = station_fields(solver, stations)
    F_sh = station_fields_sharded(cg, stations, CFG,
                                  mesh=make_grid_mesh(2, 2,
                                                      jax.devices()[:4]))
    np.testing.assert_allclose(F_sh, F_ref, atol=TOL, rtol=0)
