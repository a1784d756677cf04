"""Streamed theta-major solver (ops/stream_t.py), interpret mode.

The streamed path holds the field in HBM at (S, ntheta, ML) and streams
the band sweep block-by-block, so there are no wrap-duplicate rows and
no VMEM ceiling; these tests pin exact parity with the jnp circulant
fixpoint (and Dijkstra on f64 weights) across theta counts - including
ones the monolithic theta-major kernel refuses - plus batching,
receiver extraction and the blocked-grid edge cases.
"""
import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig
from raytracer_tpu.ops.circulant import build_circulant, solve_circulant
from raytracer_tpu.ops.stream_t import (
    _pick_block,
    _pow_spans,
    solve_circulant_stream,
)
from raytracer_tpu.ops.wrapped_t import pack_twrapped_stencil

F32 = SolverConfig(dtype="float32")


def _setup(ntheta, nr, spacing):
    gr, A, halo = rt.init_annulus(ntheta, nr, spacing=spacing)
    prof = rt.velocity_profile()
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = rt.interpolate_velocity(gr.r, interp)
    cg = build_circulant(gr, A, halo, U, dtype=np.float32)
    return gr, cg


def test_pow_spans_cover():
    for n in (1, 2, 3, 7, 8, 9, 100, 1277):
        spans = _pow_spans(n)
        assert 1 + sum(spans) >= n
        assert all(b == 2 * a for a, b in zip(spans, spans[1:]))


@pytest.mark.parametrize("ntheta", [9, 15, 16, 20, 30])
def test_stream_matches_circulant(ntheta):
    # includes ntheta=15 (dup=1), which supports_twrapped REFUSES - the
    # streamed path has no wrap cover and works for any theta count
    gr, cg = _setup(ntheta, 3, 500.0)
    src = rt.closest_point(gr, np.deg2rad(25.0), R, system="polar")
    d_ref, _ = solve_circulant(cg, src, F32)
    ok = np.isfinite(d_ref)
    d_s, it = solve_circulant_stream(cg, [src], F32, interpret=True)
    assert it > 0
    np.testing.assert_allclose(d_s[0][ok], d_ref[ok], rtol=1e-6, atol=5e-3)
    assert np.isfinite(d_s[0]).sum() == ok.sum()


def test_stream_source_batching_and_center():
    gr, cg = _setup(16, 4, 400.0)
    degs = (0.0, 45.0, 120.0, 290.0)
    srcs = [rt.closest_point(gr, np.deg2rad(d), R, system="polar") for d in degs]
    srcs.append(cg.cmap.center)
    d_b, _ = solve_circulant_stream(cg, srcs, F32, interpret=True, batch=3)
    assert d_b.shape[0] == len(srcs)
    for i, s in enumerate(srcs):
        d_ref, _ = solve_circulant(cg, s, F32)
        ok = np.isfinite(d_ref)
        np.testing.assert_allclose(d_b[i][ok], d_ref[ok], rtol=1e-6, atol=5e-3)


def test_stream_receiver_extraction():
    gr, cg = _setup(16, 4, 400.0)
    degs = (0.0, 45.0, 120.0)
    srcs = [rt.closest_point(gr, np.deg2rad(d), R, system="polar") for d in degs]
    recs = [rt.closest_point(gr, np.deg2rad(d), R, system="polar")
            for d in (30.0, 90.0, 260.0)]
    recs.append(cg.cmap.center)
    d_full, _ = solve_circulant_stream(cg, srcs, F32, interpret=True, batch=2)
    d_rec, _ = solve_circulant_stream(cg, srcs, F32, interpret=True, batch=2,
                                      receivers=recs)
    assert d_rec.shape == (len(srcs), len(recs))
    np.testing.assert_array_equal(d_rec, d_full[:, recs])


@pytest.mark.parametrize("levels", [1, 2])
def test_stream_band_closure_exact(levels):
    gr, cg = _setup(20, 4, 400.0)
    src = rt.closest_point(gr, 0.0, R, system="polar")
    d_ref, _ = solve_circulant(cg, src, F32)
    ok = np.isfinite(d_ref)
    d_c, it_c = solve_circulant_stream(cg, [src], F32, interpret=True,
                                       band_closure=levels)
    d_0, it_0 = solve_circulant_stream(cg, [src], F32, interpret=True)
    np.testing.assert_allclose(d_c[0][ok], d_ref[ok], rtol=1e-6, atol=5e-3)
    assert it_c <= it_0


def test_stream_matches_dijkstra_f64_weights():
    gr, A, halo = rt.init_annulus(16, 4, spacing=400.0)
    prof = rt.velocity_profile()
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = rt.interpolate_velocity(gr.r, interp)
    cg = build_circulant(gr, A, halo, U, dtype=np.float32)
    src = rt.closest_point(gr, 0.0, R, system="polar")
    Dd = rt.dijkstra(A, halo, src, gr, U, SolverConfig(dtype="float64"))
    d_s, _ = solve_circulant_stream(cg, [src], F32, interpret=True)
    ok = np.isfinite(Dd.dist)
    np.testing.assert_allclose(d_s[0][ok], Dd.dist[ok], rtol=1e-4, atol=1e-2)


def test_stream_s_wave_zero_velocity_core():
    gr, A, halo = rt.init_annulus(16, 6, spacing=200.0)
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vs)
    U = rt.interpolate_velocity(gr.r, interp)
    assert (U <= 0).sum() > 0
    cg = build_circulant(gr, A, halo, U, dtype=np.float32)
    src = rt.closest_point(gr, 0.0, R, system="polar")
    d_ref, _ = solve_circulant(cg, src, F32)
    d_s, _ = solve_circulant_stream(cg, [src], F32, interpret=True,
                                    band_closure=1)
    assert not np.isnan(d_s[0]).any()
    ok = np.isfinite(d_ref)
    np.testing.assert_array_equal(np.isfinite(d_s[0]), ok)
    np.testing.assert_allclose(d_s[0][ok], d_ref[ok], rtol=1e-6, atol=5e-3)


def test_stream_same_fixpoint_as_twrapped_packed_stencil():
    # both paths must agree when handed the SAME packed stencil (shared
    # weight tables, shared band closure)
    from raytracer_tpu.ops.wrapped_t import solve_circulant_twrapped

    gr, cg = _setup(16, 4, 400.0)
    ws = pack_twrapped_stencil(cg, dtype=np.float32, band_closure=1)
    src = rt.closest_point(gr, np.deg2rad(100.0), R, system="polar")
    d_t, _ = solve_circulant_twrapped(cg, [src], F32, interpret=True,
                                      _packed=ws)
    d_s, _ = solve_circulant_stream(cg, [src], F32, interpret=True,
                                    _packed=ws)
    ok = np.isfinite(d_t[0])
    np.testing.assert_allclose(d_s[0][ok], d_t[0][ok], rtol=1e-6, atol=5e-3)


@pytest.mark.parametrize("levels", [1, 2])
def test_stream_warm_start_exact(levels):
    # coarse-to-fine init must not change the fixpoint (label-correcting
    # solvers accept any upper-bound initialisation)
    gr, cg = _setup(16, 4, 400.0)
    src = rt.closest_point(gr, np.deg2rad(70.0), R, system="polar")
    d_cold, _ = solve_circulant_stream(cg, [src], F32, interpret=True)
    d_warm, _ = solve_circulant_stream(cg, [src], F32, interpret=True,
                                       warm_levels=levels)
    ok = np.isfinite(d_cold[0])
    np.testing.assert_array_equal(np.isfinite(d_warm[0]), ok)
    np.testing.assert_allclose(d_warm[0][ok], d_cold[0][ok],
                               rtol=1e-6, atol=5e-3)


def test_stream_warm_start_odd_source_columns_and_center():
    # odd-parity source columns coarsen onto the odd column set (the
    # circulant stencil is offset-invariant); centre sources seed via cen
    gr, cg = _setup(20, 4, 400.0)
    degs = (9.0, 27.0, 45.0, 63.0, 81.0)   # mix of column parities
    srcs = [rt.closest_point(gr, np.deg2rad(d), R, system="polar")
            for d in degs]
    srcs.append(cg.cmap.center)
    d_cold, _ = solve_circulant_stream(cg, srcs, F32, interpret=True,
                                       batch=3)
    d_warm, _ = solve_circulant_stream(cg, srcs, F32, interpret=True,
                                       batch=3, warm_levels=1)
    for i in range(len(srcs)):
        ok = np.isfinite(d_cold[i])
        np.testing.assert_allclose(d_warm[i][ok], d_cold[i][ok],
                                   rtol=1e-6, atol=5e-3)


def test_stream_warm_start_with_band_closure():
    gr, cg = _setup(16, 6, 200.0)
    src = rt.closest_point(gr, 0.0, R, system="polar")
    from raytracer_tpu.ops.circulant import solve_circulant as _sc

    d_ref, _ = _sc(cg, src, F32)
    d_w, _ = solve_circulant_stream(cg, [src], F32, interpret=True,
                                    band_closure=1, warm_levels=2)
    ok = np.isfinite(d_ref)
    np.testing.assert_allclose(d_w[0][ok], d_ref[ok], rtol=1e-6, atol=5e-3)


def test_stream_warm_levels_stop_at_odd_nt():
    # nt=9: no coarsening possible; warm_levels must degrade gracefully
    gr, cg = _setup(9, 3, 500.0)
    src = rt.closest_point(gr, np.deg2rad(40.0), R, system="polar")
    d_cold, _ = solve_circulant_stream(cg, [src], F32, interpret=True)
    d_warm, _ = solve_circulant_stream(cg, [src], F32, interpret=True,
                                       warm_levels=3)
    ok = np.isfinite(d_cold[0])
    np.testing.assert_allclose(d_warm[0][ok], d_cold[0][ok],
                               rtol=1e-6, atol=5e-3)


def test_coarsen_theta_weights_are_real_path_costs():
    # spot-check the composition rule on a hand-built 2-diagonal stencil
    from raytracer_tpu.ops.stream_t import _coarsen_theta

    Mp = 4
    dms = np.array([0, 1])
    dcs = np.array([1, -1])
    w0 = np.array([1.0, 2.0, 3.0, 4.0])
    w1 = np.array([10.0, 20.0, 30.0, np.inf])
    dms2, dcs2, rows = _coarsen_theta(dms, dcs, np.stack([w0, w1]), pad_dm=2)
    # pair (0,+1)+(0,+1): dm=0, fine dc=2 -> coarse dc=1, w[m] = w0[m]*2
    i = [k for k in range(len(dms2)) if dms2[k] == 0 and dcs2[k] == 1]
    assert len(i) == 1
    np.testing.assert_allclose(rows[i[0]], w0 + w0)
    # pair (1,-1)+(1,-1): dm=2, fine dc=-2 -> coarse -1, w[m]=w1[m]+w1[m+1]
    j = [k for k in range(len(dms2)) if dms2[k] == 2 and dcs2[k] == -1]
    assert len(j) == 1
    np.testing.assert_allclose(rows[j[0]][:2], w1[:2] + w1[1:3])
    assert np.isinf(rows[j[0]][2:]).all()
    # cross pair (0,+1)+(1,-1) and (1,-1)+(0,+1): dm=1, dc=0 -> coarse 0
    k = [k for k in range(len(dms2)) if dms2[k] == 1 and dcs2[k] == 0]
    assert len(k) == 1
    np.testing.assert_allclose(rows[k[0]][:3],
                               np.minimum(w0[:3] + w1[:3],
                                          w1[:3] + w0[1:4]))


def test_max_twrapped_batch_clamp():
    # the monolithic kernel's VMEM estimate: generous at the reference
    # mesh, zero (-> stream routing) at the 3.2M-node mesh
    from raytracer_tpu.ops.wrapped_t import max_twrapped_batch

    class _T:  # minimal TWStencil stand-in
        def __init__(self, NTT, ML, rows):
            self.NTT, self.ML = NTT, ML
            self.wrows = np.zeros((rows, ML), np.float32)

    assert max_twrapped_batch(_T(184, 896, 440)) >= 8      # 180x63
    assert max_twrapped_batch(_T(2160, 1664, 560)) == 0    # 2160x600


def test_auto_warm_levels_window():
    from raytracer_tpu.ops.stream_t import auto_warm_levels

    assert auto_warm_levels(180) == 0
    assert auto_warm_levels(1080) == 1
    assert auto_warm_levels(1440) == 0
    assert auto_warm_levels(2160) == 0


def test_pick_block_bounded():
    # block choice obeys the VMEM budget at production-scale dims
    for nt, ML in ((180, 896), (1440, 1408), (2880, 2944)):
        tb = _pick_block(nt, ML, 512, 4)
        need = (2 * 5 * tb * ML + 3 * tb * ML + 512 * ML) * 4
        assert need <= 64 * 1024 * 1024


def test_stream_device_out_matches_materialised():
    import jax

    gr, cg = _setup(16, 4, 400.0)
    degs = (0.0, 95.0, 200.0)
    srcs = [rt.closest_point(gr, np.deg2rad(d), R, system="polar") for d in degs]
    d_np, it_np = solve_circulant_stream(cg, srcs, F32, interpret=True, batch=2)
    d_dev, it_dev = solve_circulant_stream(cg, srcs, F32, interpret=True,
                                           batch=2, device_out=True)
    assert isinstance(d_dev, jax.Array)
    assert it_dev == it_np
    np.testing.assert_array_equal(np.asarray(d_dev), d_np)
