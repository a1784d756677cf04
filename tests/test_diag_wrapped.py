"""Wrapped-lane multi-sweep kernel (ops/diag_wrapped.py), interpret mode.

Exact-parity checks against the jnp circulant solver on grids chosen to
exercise every wrap regime of the lane layout:
  * dup > nt   (ntheta=16  -> NTL=128, 8 copies of each theta)
  * 0 < dup < nt (ntheta=180 -> NTL=256, 76 duplicated thetas) [slow build,
    covered on the real chip by tests/test_tpu_parity.py and bench.py]
  * dup == 0   (ntheta=128 -> NTL=128, lane rolls wrap exactly)
Real-TPU parity for the compiled kernel lives in tests/test_tpu_parity.py.
"""
import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig
from raytracer_tpu.ops.circulant import build_circulant, solve_circulant
from raytracer_tpu.ops.diag_wrapped import (
    pack_wrapped_stencil,
    solve_circulant_wrapped,
    supports_wrapped,
)

F32 = SolverConfig(dtype="float32")


def _setup(ntheta, nr, spacing):
    gr, A, halo = rt.init_annulus(ntheta, nr, spacing=spacing)
    prof = rt.velocity_profile()
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = rt.interpolate_velocity(gr.r, interp)
    cg = build_circulant(gr, A, halo, U, dtype=np.float32)
    return gr, cg


@pytest.mark.parametrize("sweeps", [1, 2, 4])
def test_wrapped_matches_circulant_dup_gt_nt(sweeps):
    gr, cg = _setup(16, 4, 400.0)
    assert supports_wrapped(cg)
    src = rt.closest_point(gr, 0.0, R, system="polar")
    d_ref, _ = solve_circulant(cg, src, F32)
    ok = np.isfinite(d_ref)
    d_w, it = solve_circulant_wrapped(cg, [src], F32, sweeps_per_call=sweeps,
                                      interpret=True)
    assert it > 0
    np.testing.assert_allclose(d_w[0][ok], d_ref[ok], rtol=1e-6, atol=5e-3)
    assert np.isfinite(d_w[0]).sum() == ok.sum()


def test_wrapped_exact_wrap_no_defects():
    # ntheta=128: NTL == nt, lane rolls are exact ring rolls, no merge
    gr, cg = _setup(128, 4, 400.0)
    assert supports_wrapped(cg)
    src = rt.closest_point(gr, np.deg2rad(45.0), R, system="polar")
    d_ref, _ = solve_circulant(cg, src, F32)
    ok = np.isfinite(d_ref)
    d_w, _ = solve_circulant_wrapped(cg, [src], F32, sweeps_per_call=2,
                                     interpret=True)
    np.testing.assert_allclose(d_w[0][ok], d_ref[ok], rtol=1e-6, atol=5e-3)


def test_wrapped_source_batching_exact_wrap():
    # ntheta=128 -> dup == 0: cross-block page rolls must wrap in-block
    # (regression: the full-array roll read the neighbouring source block)
    gr, cg = _setup(128, 4, 400.0)
    degs = (0.0, 100.0, 250.0)
    srcs = [rt.closest_point(gr, np.deg2rad(d), R, system="polar") for d in degs]
    d_b, _ = solve_circulant_wrapped(cg, srcs, F32, sweeps_per_call=2,
                                     interpret=True, batch=3)
    for i, s in enumerate(srcs):
        d_ref, _ = solve_circulant(cg, s, F32)
        ok = np.isfinite(d_ref)
        np.testing.assert_allclose(d_b[i][ok], d_ref[ok], rtol=1e-6, atol=5e-3)


def test_wrapped_source_batching():
    # batch=3 over 5 sources (uneven last chunk, repeat-fill) incl. centre
    gr, cg = _setup(16, 4, 400.0)
    degs = (0.0, 45.0, 120.0, 290.0)
    srcs = [rt.closest_point(gr, np.deg2rad(d), R, system="polar") for d in degs]
    srcs.append(cg.cmap.center)
    d_b, _ = solve_circulant_wrapped(cg, srcs, F32, sweeps_per_call=2,
                                     interpret=True, batch=3)
    assert d_b.shape[0] == len(srcs)
    for i, s in enumerate(srcs):
        d_ref, _ = solve_circulant(cg, s, F32)
        ok = np.isfinite(d_ref)
        np.testing.assert_allclose(d_b[i][ok], d_ref[ok], rtol=1e-6, atol=5e-3)


# variant matrix shrunk by the round-4 ADR (PERF_NOTES.md): one
# representative per axis instead of the cross product -- diag_wrapped
# is retained infrastructure, not a production solver
@pytest.mark.parametrize("weight_mode,pre_roll",
                         [("transpose", False), ("reduce", True)])
def test_wrapped_kernel_variants(weight_mode, pre_roll):
    # the weight-relayout and pre-rolled-rho-page variants are exact
    # reformulations; all must match the jnp circulant fixpoint
    gr, cg = _setup(16, 4, 400.0)
    src = rt.closest_point(gr, 0.0, R, system="polar")
    d_ref, _ = solve_circulant(cg, src, F32)
    ok = np.isfinite(d_ref)
    d_w, _ = solve_circulant_wrapped(cg, [src], F32, sweeps_per_call=2,
                                     interpret=True, weight_mode=weight_mode,
                                     pre_roll=pre_roll)
    np.testing.assert_allclose(d_w[0][ok], d_ref[ok], rtol=1e-6, atol=5e-3)
    # batched variant too
    d_b, _ = solve_circulant_wrapped(cg, [src, src], F32, sweeps_per_call=2,
                                     interpret=True, batch=2,
                                     weight_mode=weight_mode, pre_roll=pre_roll)
    np.testing.assert_allclose(d_b[1][ok], d_ref[ok], rtol=1e-6, atol=5e-3)


def test_wrapped_receiver_extraction():
    # device-side receiver gather == full-field extraction at those nodes,
    # incl. the centre node as a receiver and an uneven batch
    gr, cg = _setup(16, 4, 400.0)
    degs = (0.0, 45.0, 120.0)
    srcs = [rt.closest_point(gr, np.deg2rad(d), R, system="polar") for d in degs]
    recs = [rt.closest_point(gr, np.deg2rad(d), R, system="polar")
            for d in (30.0, 90.0, 260.0)]
    recs.append(cg.cmap.center)
    d_full, _ = solve_circulant_wrapped(cg, srcs, F32, sweeps_per_call=2,
                                        interpret=True, batch=2)
    d_rec, _ = solve_circulant_wrapped(cg, srcs, F32, sweeps_per_call=2,
                                       interpret=True, batch=2, receivers=recs)
    assert d_rec.shape == (len(srcs), len(recs))
    np.testing.assert_array_equal(d_rec, d_full[:, recs])


def test_wrapped_vertical_closure_exact():
    gr, cg = _setup(16, 4, 400.0)
    src = rt.closest_point(gr, 0.0, R, system="polar")
    d_ref, _ = solve_circulant(cg, src, F32)
    ok = np.isfinite(d_ref)
    d_v, it_v = solve_circulant_wrapped(cg, [src], F32, sweeps_per_call=2,
                                        interpret=True, vertical_closure=2)
    d_0, it_0 = solve_circulant_wrapped(cg, [src], F32, sweeps_per_call=2,
                                        interpret=True)
    np.testing.assert_allclose(d_v[0][ok], d_ref[ok], rtol=1e-6, atol=5e-3)
    assert it_v <= it_0  # composed vertical diagonals only help


def test_wrapped_center_source_and_batch():
    gr, cg = _setup(16, 4, 400.0)
    cen = cg.cmap.center
    src = rt.closest_point(gr, 0.0, R, system="polar")
    assert cen >= 0
    d_w, _ = solve_circulant_wrapped(cg, [cen, src], F32, sweeps_per_call=2,
                                     interpret=True)
    for s, row in zip((cen, src), d_w):
        d_ref, _ = solve_circulant(cg, s, F32)
        ok = np.isfinite(d_ref)
        np.testing.assert_allclose(row[ok], d_ref[ok], rtol=1e-6, atol=5e-3)


def test_wrapped_matches_dijkstra_f64_weights():
    # end-to-end sanity on the physical result, not just kernel parity
    gr, A, halo = rt.init_annulus(16, 4, spacing=400.0)
    prof = rt.velocity_profile()
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = rt.interpolate_velocity(gr.r, interp)
    cg = build_circulant(gr, A, halo, U, dtype=np.float32)
    src = rt.closest_point(gr, 0.0, R, system="polar")
    Dd = rt.dijkstra(A, halo, src, gr, U, SolverConfig(dtype="float64"))
    d_w, _ = solve_circulant_wrapped(cg, [src], F32, sweeps_per_call=4,
                                     interpret=True)
    ok = np.isfinite(Dd.dist)
    np.testing.assert_allclose(d_w[0][ok], Dd.dist[ok], rtol=1e-4, atol=1e-2)


def test_pack_wrapped_invariants():
    gr, cg = _setup(16, 4, 400.0)
    ws = pack_wrapped_stencil(cg)
    assert ws.offs.min() >= 0 and (ws.offs % 8 == 0).all()
    assert ws.rho_starts[0] == 0 and ws.rho_starts[-1] == ws.D
    assert (np.diff(ws.rho_starts) >= 0).all()
    # grouped weight pages cover exactly D diagonals
    G = ws.wp.shape[0]
    assert G == -(-ws.D // 128)
