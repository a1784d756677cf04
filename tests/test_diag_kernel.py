"""Diagonal-band circulant kernel tests (interpreter mode on CPU).

Real-TPU exact-parity coverage lives in tests/test_tpu_parity.py (platform
gated); these tests validate the decomposition and the solver loop.
"""
import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig
from raytracer_tpu.ops.circulant import build_circulant, solve_circulant, _DC_RANGE
from raytracer_tpu.ops.diag_circulant import pack_diag_stencil, solve_circulant_diag

F32 = SolverConfig(dtype="float32")


@pytest.fixture(scope="module")
def small():
    gr, A, halo = rt.init_annulus(16, 4, spacing=400.0)
    prof = rt.velocity_profile()
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = rt.interpolate_velocity(gr.r, interp)
    cg = build_circulant(gr, A, halo, U, dtype=np.float32)
    return gr, cg


def test_pack_diag_covers_all_edges(small):
    _, cg = small
    ds = pack_diag_stencil(cg)
    assert np.isfinite(ds.wp).sum() == np.isfinite(cg.w).sum()
    # flat offsets are 8-aligned and in range
    rows_r = ds.Mp + 2 * ds.pad - 8
    assert np.all(ds.offs % 8 == 0)
    assert ds.offs.min() >= 0
    assert ds.offs.max() + ds.Mp <= 5 * 8 * rows_r
    # reconstruct every edge from the diagonal form and match the ELL form
    M, K = cg.src_flat.shape
    want = {}
    for m in range(M):
        for k in range(K):
            if np.isfinite(cg.w[m, k]):
                flat = int(cg.src_flat[m, k])
                dc = flat // M - _DC_RANGE
                ms = flat % M
                want[(m, ms - m, dc)] = float(cg.w[m, k])
    got = {}
    G, Mp, _ = ds.wp.shape
    u_all = ds.u_idx
    dm_all = (ds.offs - u_all.astype(np.int64) * rows_r) - ds.pad
    for d in range(ds.D):
        u = int(u_all[d])
        dc = u // 8 - _DC_RANGE
        dm = int(dm_all[d]) + (u % 8)
        col = ds.wp[d // 128, :, d % 128]
        for m in np.flatnonzero(np.isfinite(col)):
            got[(int(m), dm, dc)] = float(col[m])
    assert got == want


def test_diag_solver_matches_jnp_interpret(small):
    gr, cg = small
    src = rt.closest_point(gr, 0.0, R, system="polar")
    d_ref, _ = solve_circulant(cg, src, F32)
    d_diag, it = solve_circulant_diag(cg, [src], F32, interpret=True)
    ok = np.isfinite(d_ref)
    assert it > 0
    np.testing.assert_allclose(d_diag[0][ok], d_ref[ok], rtol=1e-6, atol=5e-3)


def test_diag_solver_center_source_interpret(small):
    gr, cg = small
    center = cg.cmap.center
    d_ref, _ = solve_circulant(cg, center, F32)
    d_diag, _ = solve_circulant_diag(cg, [center], F32, interpret=True)
    ok = np.isfinite(d_ref)
    np.testing.assert_allclose(d_diag[0][ok], d_ref[ok], rtol=1e-6, atol=5e-3)


def test_diag_scan_every_matches_interpret(small):
    gr, cg = small
    src = rt.closest_point(gr, np.deg2rad(90.0), R, system="polar")
    d_ref, _ = solve_circulant(cg, src, F32)
    d_diag, _ = solve_circulant_diag(cg, [src], F32, scan_every=3, interpret=True)
    ok = np.isfinite(d_ref)
    np.testing.assert_allclose(d_diag[0][ok], d_ref[ok], rtol=1e-6, atol=5e-3)
