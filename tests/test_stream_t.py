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


def test_pick_block_bounded():
    # block choice obeys the VMEM budget at production-scale dims
    for nt, ML in ((180, 896), (1440, 1408), (2880, 2944)):
        tb = _pick_block(nt, ML, 512, 4)
        need = (2 * 5 * tb * ML + 3 * tb * ML + 512 * ML) * 4
        assert need <= 64 * 1024 * 1024
