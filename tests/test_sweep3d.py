"""Pallas 3-D multi-sweep kernel (ops/sweep3d.py), interpret mode.

Exact-parity against the XLA roll sweep of solvers/solve3d.py on small
wedges, incl. row/lane padding regimes and the full solve loop.
"""
import numpy as np
import pytest

import jax.numpy as jnp

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig
from raytracer_tpu.models.grid3d import grid3d
from raytracer_tpu.solvers.solve3d import (
    _shifted_weights,
    _sweep,
    prepare3d,
    solve3d,
)
from raytracer_tpu.ops.sweep3d import (
    pack_field,
    plan_sweep3d,
    sweep3d_T,
    sweep3d_T_batched,
    unpack_field,
)

F32 = SolverConfig(dtype="float32")


def _wedge(dims=(7, 5, 4)):
    c0 = (np.deg2rad(80.0), np.deg2rad(80.0), R - 600.0)
    c1 = (np.deg2rad(100.0), np.deg2rad(100.0), R)
    g = grid3d(c0, c1, dims)
    prof = rt.velocity_profile()
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    return g, interp(g.r)


@pytest.mark.parametrize("dims", [(7, 5, 4), (8, 8, 3), (130, 6, 3)])
def test_sweep3d_matches_xla_sweep(dims):
    # dims exercise: unpadded-ish, tiny, and lane counts >128 (n0=130)
    g, U = _wedge(dims)
    W = _shifted_weights(g, U, np.float32)
    plan = plan_sweep3d(W, block_rows=32)
    shp = plan.shape
    rng = np.random.default_rng(0)
    d0 = rng.uniform(0.0, 50.0, size=shp).astype(np.float32)

    ref = jnp.asarray(d0)
    for _ in range(3):
        ref = _sweep(ref, jnp.asarray(W))

    flat = pack_field(jnp.asarray(d0), plan)
    got = sweep3d_T(flat, jnp.asarray(plan.W4), plan.n1, plan.BR, plan.NB,
                    plan.L0, plan.H8, 3, interpret=True)
    got3 = unpack_field(got, plan)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(ref),
                               rtol=1e-6, atol=1e-5)


def test_sweep3d_batched_matches_single():
    # S fields through the shared-weight-stream kernel == S independent
    # single-field dispatches
    g, U = _wedge((8, 8, 3))
    W = _shifted_weights(g, U, np.float32)
    plan = plan_sweep3d(W, block_rows=32)
    rng = np.random.default_rng(1)
    fields = rng.uniform(0.0, 50.0, size=(3,) + plan.shape).astype(np.float32)

    flat = jnp.stack([pack_field(jnp.asarray(f), plan) for f in fields])
    got = sweep3d_T_batched(flat, jnp.asarray(plan.W4), plan.n1, plan.BR,
                            plan.NB, plan.L0, plan.H8, 3, interpret=True)
    for s in range(3):
        ref = sweep3d_T(flat[s], jnp.asarray(plan.W4), plan.n1, plan.BR,
                        plan.NB, plan.L0, plan.H8, 3, interpret=True)
        np.testing.assert_array_equal(np.asarray(got[s]), np.asarray(ref))


@pytest.mark.parametrize("scan_every", [0, 8])
def test_solve3d_source_batched_matches_single(scan_every):
    # groups (incl. a padded tail group: 3 sources at batch 2) must
    # reproduce the per-source solves exactly, full-field and receivers
    g, U = _wedge((9, 6, 5))
    packed = prepare3d(g, U, F32)
    srcs = [len(g) // 2, 3, len(g) - 2]
    d_one, it1 = solve3d(g, U, srcs, F32, scan_every=scan_every,
                         engine="pallas", interpret=True,
                         source_batch=1, _packed=packed)
    d_bat, itb = solve3d(g, U, srcs, F32, scan_every=scan_every,
                         engine="pallas", interpret=True,
                         source_batch=2, _packed=packed)
    assert itb >= it1 > 0  # group runs to the slowest member
    np.testing.assert_allclose(d_bat, d_one, rtol=1e-6, atol=5e-3)
    recs = [0, len(g) // 3, len(g) - 1]
    tab, _ = solve3d(g, U, srcs, F32, scan_every=scan_every,
                     engine="pallas", interpret=True, source_batch=2,
                     receivers=recs, _packed=packed)
    np.testing.assert_array_equal(tab, d_bat[:, recs])


@pytest.mark.parametrize("scan_every", [0, 8])
def test_solve3d_pallas_engine_matches_xla(scan_every):
    g, U = _wedge((9, 6, 5))
    packed = prepare3d(g, U, F32)
    src = len(g) // 2
    d_xla, it_x = solve3d(g, U, [src], F32, scan_every=scan_every,
                          engine="xla", _packed=packed)
    d_pal, it_p = solve3d(g, U, [src], F32, scan_every=scan_every,
                          engine="pallas", interpret=True, _packed=packed)
    assert it_p > 0
    np.testing.assert_allclose(d_pal, d_xla, rtol=1e-6, atol=5e-3)
    # receiver gather on the kernel path
    recs = [0, len(g) // 3, len(g) - 1]
    tab, _ = solve3d(g, U, [src], F32, scan_every=scan_every,
                     engine="pallas", interpret=True, receivers=recs,
                     _packed=packed)
    np.testing.assert_array_equal(tab[0], d_pal[0][recs])


def test_solve3d_sweep_engine_matches_xla():
    # directional plane sweeps: same fixpoint as the Jacobi engine in
    # far fewer rounds; single + batched (incl. padded tail group) +
    # receiver gather
    g, U = _wedge((9, 6, 5))
    packed = prepare3d(g, U, F32)
    srcs = [len(g) // 2, 3, len(g) - 2]
    d_xla, it_x = solve3d(g, U, srcs, F32, engine="xla", _packed=packed)
    d_sw, it_s = solve3d(g, U, srcs, F32, engine="sweep", _packed=packed)
    assert 0 < it_s <= it_x  # rounds, not Jacobi iterations
    np.testing.assert_allclose(d_sw, d_xla, rtol=1e-6, atol=5e-3)
    d_bat, _ = solve3d(g, U, srcs, F32, engine="sweep", source_batch=2,
                       _packed=packed)
    np.testing.assert_allclose(d_bat, d_sw, rtol=1e-6, atol=5e-3)
    recs = [0, len(g) // 3, len(g) - 1]
    tab, _ = solve3d(g, U, srcs, F32, engine="sweep", source_batch=2,
                     receivers=recs, _packed=packed)
    np.testing.assert_allclose(tab, d_bat[:, recs], rtol=0, atol=0)
