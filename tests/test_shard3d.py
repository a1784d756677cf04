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


# -- staged (multi-region) sharded solves -------------------------------------

@pytest.fixture(scope="module")
def disc_wedge():
    """CMB-spanning wedge with table-true forced interfaces, extents
    chosen divisible for the virtual mesh (theta 24, phi 4)."""
    from raytracer_tpu.models.velocity import table_interface_radii

    radii = table_interface_radii("ak135")
    gr = grid3d((0.0, np.deg2rad(88.0), 1400.0),
                (np.deg2rad(120.0), np.deg2rad(92.0), R),
                (24, 4, 24), force_radii=radii)
    prof = rt.velocity_profile("ak135")
    Up = velocity3d(gr, rt.LinearInterpolation(prof.r, prof.Vp))
    Us = velocity3d(gr, rt.LinearInterpolation(prof.r, prof.Vs))
    return gr, Up, Us


def test_reflection_sharded_matches(disc_wedge):
    """Slab-sharded staged PcP == single-device solve3d_reflection
    (field equality incl. the +inf region pattern)."""
    import jax

    from raytracer_tpu.parallel.shard3d import solve3d_reflection_sharded
    from raytracer_tpu.solvers.solve3d import solve3d_reflection

    gr, Up, _ = disc_wedge
    src = [0, gr.nnods_total - 1]
    ref, _ = solve3d_reflection(gr, Up, src, 3481.5, CFG)
    mesh = make_shard3d_mesh(jax.devices()[:4])
    vals, rounds = solve3d_reflection_sharded(gr, Up, src, 3481.5, CFG,
                                              mesh=mesh, shard_axis=1)
    assert rounds < 60
    fin = np.isfinite(ref)
    assert np.array_equal(fin, np.isfinite(vals))
    np.testing.assert_allclose(vals[fin], ref[fin], atol=TOL, rtol=0)


def test_converted_sharded_matches(disc_wedge):
    """Slab-sharded staged SKS-class (3 stages, per-leg velocities) ==
    single-device solve3d_converted, sharded along theta this time."""
    import jax

    from raytracer_tpu.parallel.shard3d import solve3d_converted_sharded
    from raytracer_tpu.solvers.solve3d import solve3d_converted

    gr, Up, Us = disc_wedge
    src = [gr.nnods_total - 2]
    ref, _ = solve3d_converted(gr, Us, Up, src, 3481.5, config=CFG)
    mesh = make_shard3d_mesh(jax.devices()[:3])   # theta extent 24 % 3 == 0
    vals, _ = solve3d_converted_sharded(gr, Us, Up, src, 3481.5,
                                        config=CFG, mesh=mesh,
                                        shard_axis=2)
    fin = np.isfinite(ref)
    assert np.array_equal(fin, np.isfinite(vals))
    np.testing.assert_allclose(vals[fin], ref[fin], atol=TOL, rtol=0)


def test_staged_sharded_rejects_radial_axis(disc_wedge):
    """Seed planes are radial: sharding the radial axis is refused."""
    import jax

    from raytracer_tpu.parallel.shard3d import solve3d_reflection_sharded

    gr, Up, _ = disc_wedge
    mesh = make_shard3d_mesh(jax.devices()[:2])
    with pytest.raises(ValueError, match="radial"):
        solve3d_reflection_sharded(gr, Up, [0], 3481.5, CFG, mesh=mesh,
                                   shard_axis=0)
