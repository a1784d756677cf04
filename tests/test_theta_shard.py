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
