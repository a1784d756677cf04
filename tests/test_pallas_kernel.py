"""Quarantined kernel generations (contrib/): slim equality smoke only.

Full parity matrices for these superseded kernels were dropped by the
round-4 ADR (PERF_NOTES.md): production is ops/sweep_theta.py, the
load-bearing fallbacks are ops/wrapped_t.py and ops/stream_t.py.
"""
import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig
from raytracer_tpu.ops.circulant import build_circulant, solve_circulant
from raytracer_tpu.contrib.pallas_circulant import pack_tiled_stencil, solve_circulant_pallas

F32 = SolverConfig(dtype="float32")


@pytest.fixture(scope="module")
def small():
    gr, A, halo = rt.init_annulus(16, 4, spacing=400.0)
    prof = rt.velocity_profile()
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = rt.interpolate_velocity(gr.r, interp)
    cg = build_circulant(gr, A, halo, U, dtype=np.float32)
    return gr, cg


def test_pack_tiled_stencil_covers_all_edges(small):
    _, cg = small
    ts = pack_tiled_stencil(cg)
    # every finite stencil entry appears exactly once in the packed form
    assert np.isfinite(ts.w).sum() == np.isfinite(cg.w).sum()
    assert ts.idx.shape == ts.w.shape
    assert ts.idx.max() < 128
    # group offsets tile the packed rows
    rows = sorted((off, off + cnt) for g in ts.groups for (_, off, cnt) in g)
    assert rows[0][0] == 0 and rows[-1][1] == ts.idx.shape[0]
    for (a, b), (c, d) in zip(rows, rows[1:]):
        assert b == c


def test_pallas_kernel_matches_jnp_interpret(small):
    gr, cg = small
    src = rt.closest_point(gr, 0.0, R, system="polar")
    d_ref, _ = solve_circulant(cg, src, F32)
    d_pal, it = solve_circulant_pallas(cg, [src], F32, interpret=True)
    ok = np.isfinite(d_ref)
    assert it > 0
    # the closed-form ring scan (cummin over d - j*c) loses ~1e-3 s to f32
    # cancellation on ~1e3 s travel times; physically negligible (target
    # accuracy is 0.1 s)
    np.testing.assert_allclose(d_pal[0][ok], d_ref[ok], rtol=1e-6, atol=5e-3)


def test_fused_kernel_matches_jnp_interpret(small):
    from raytracer_tpu.contrib.fused_circulant import solve_circulant_fused

    gr, cg = small
    src = rt.closest_point(gr, 0.0, R, system="polar")
    d_ref, _ = solve_circulant(cg, src, F32)
    d, _ = solve_circulant_fused(cg, [src], F32, interpret=True)
    ok = np.isfinite(d_ref)
    np.testing.assert_allclose(d[0][ok], d_ref[ok], rtol=1e-6, atol=5e-3)
