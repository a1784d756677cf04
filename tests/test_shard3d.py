"""3-D slab-sharded (domain-decomposed) solve equality on the virtual
mesh: the 3-D counterpart of test_theta_shard.py.  Runs on the 8-device
CPU mesh from conftest."""
import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig
from raytracer_tpu.models.grid3d import grid3d, velocity3d
from raytracer_tpu.parallel.shard3d import make_shard3d_mesh, solve3d_sharded
from raytracer_tpu.solvers.solve3d import solve3d

CFG = SolverConfig(dtype="float32")
TOL = 2e-3


@pytest.fixture(scope="module")
def problem():
    # (theta, phi, r) wedge spanning upper mantle into the outer core
    gr = grid3d((0.0, 0.0, 3000.0), (np.deg2rad(40.0), np.deg2rad(30.0), R),
                (10, 16, 12))
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = velocity3d(gr, interp)
    srcs = [0, gr.nnods_total // 2, gr.nnods_total - 1]
    ref, _ = solve3d(gr, U, srcs, CFG, engine="xla")
    return gr, U, srcs, ref


def test_matches_single_device_fixpoint(problem):
    gr, U, srcs, ref = problem
    mesh = make_shard3d_mesh()
    assert mesh.devices.size == 8
    vals, rounds = solve3d_sharded(gr, U, srcs, CFG, mesh=mesh, shard_axis=1)
    assert rounds < 30
    np.testing.assert_allclose(vals, ref, atol=TOL, rtol=0)


@pytest.mark.parametrize("shard_axis,dsize", [(0, 4), (1, 8), (2, 2)])
def test_every_shard_axis(problem, shard_axis, dsize):
    import jax

    gr, U, srcs, ref = problem
    mesh = make_shard3d_mesh(jax.devices()[:dsize])
    vals, _ = solve3d_sharded(gr, U, [srcs[0]], CFG, mesh=mesh,
                              shard_axis=shard_axis)
    np.testing.assert_allclose(vals[0], ref[0], atol=TOL, rtol=0)


def test_receiver_subset(problem):
    import jax

    gr, U, srcs, ref = problem
    mesh = make_shard3d_mesh(jax.devices()[:4])
    recs = [1, gr.nnods_total // 3, gr.nnods_total - 2]
    vals, _ = solve3d_sharded(gr, U, [srcs[1]], CFG, mesh=mesh,
                              receivers=recs)
    np.testing.assert_allclose(vals[0], ref[1][recs], atol=TOL, rtol=0)


def test_indivisible_mesh_raises(problem):
    import jax

    gr, U, srcs, _ = problem
    mesh = make_shard3d_mesh(jax.devices()[:7])
    with pytest.raises(ValueError):
        solve3d_sharded(gr, U, [srcs[0]], CFG, mesh=mesh, shard_axis=1)
