"""Theta-major full-iteration kernel (ops/wrapped_t.py), interpret mode.

Exact-parity checks against the jnp circulant solver across the wrap
regimes of the 8-row theta cover:
  * dup == 0 (ntheta=16: 16 % 8 == 0, row rolls wrap exactly)
  * dup >= 2 (ntheta=20 -> NTT=24, 4 duplicated theta rows)
Real-TPU parity lives in tests/test_tpu_parity.py.
"""
import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig
from raytracer_tpu.ops.circulant import build_circulant, solve_circulant
from raytracer_tpu.ops.wrapped_t import (
    pack_twrapped_stencil,
    solve_circulant_twrapped,
    supports_twrapped,
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
def test_twrapped_matches_circulant_exact_wrap(sweeps):
    gr, cg = _setup(16, 4, 400.0)
    assert supports_twrapped(cg)
    src = rt.closest_point(gr, 0.0, R, system="polar")
    d_ref, _ = solve_circulant(cg, src, F32)
    ok = np.isfinite(d_ref)
    d_w, it = solve_circulant_twrapped(cg, [src], F32, sweeps_per_call=sweeps,
                                       interpret=True)
    assert it > 0
    np.testing.assert_allclose(d_w[0][ok], d_ref[ok], rtol=1e-6, atol=5e-3)
    assert np.isfinite(d_w[0]).sum() == ok.sum()


def test_twrapped_with_dup_rows():
    # ntheta=20 -> NTT=24, dup=4 >= _DC_RANGE: defect rows + merge path
    gr, cg = _setup(20, 4, 400.0)
    assert supports_twrapped(cg)
    src = rt.closest_point(gr, np.deg2rad(45.0), R, system="polar")
    d_ref, _ = solve_circulant(cg, src, F32)
    ok = np.isfinite(d_ref)
    d_w, _ = solve_circulant_twrapped(cg, [src], F32, sweeps_per_call=2,
                                      interpret=True)
    np.testing.assert_allclose(d_w[0][ok], d_ref[ok], rtol=1e-6, atol=5e-3)


def test_twrapped_source_batching_and_center():
    gr, cg = _setup(16, 4, 400.0)
    degs = (0.0, 45.0, 120.0, 290.0)
    srcs = [rt.closest_point(gr, np.deg2rad(d), R, system="polar") for d in degs]
    srcs.append(cg.cmap.center)
    d_b, _ = solve_circulant_twrapped(cg, srcs, F32, sweeps_per_call=2,
                                      interpret=True, batch=3)
    assert d_b.shape[0] == len(srcs)
    for i, s in enumerate(srcs):
        d_ref, _ = solve_circulant(cg, s, F32)
        ok = np.isfinite(d_ref)
        np.testing.assert_allclose(d_b[i][ok], d_ref[ok], rtol=1e-6, atol=5e-3)


def test_twrapped_batching_with_dup_rows():
    # the PRODUCTION wrap regime: dup > 0 (ntheta=20 -> NTT=24, 4 defect
    # rows, like nt=180 -> dup=4) combined with S > 1 source blocks -
    # exercises masked full-array page rolls + cross-block merge_dup
    gr, cg = _setup(20, 4, 400.0)
    degs = (0.0, 95.0, 200.0, 310.0, 170.0)
    srcs = [rt.closest_point(gr, np.deg2rad(d), R, system="polar") for d in degs]
    d_b, _ = solve_circulant_twrapped(cg, srcs, F32, sweeps_per_call=2,
                                      interpret=True, batch=2)
    for i, s in enumerate(srcs):
        d_ref, _ = solve_circulant(cg, s, F32)
        ok = np.isfinite(d_ref)
        np.testing.assert_allclose(d_b[i][ok], d_ref[ok], rtol=1e-6, atol=5e-3)


def test_twrapped_receiver_extraction():
    gr, cg = _setup(16, 4, 400.0)
    degs = (0.0, 45.0, 120.0)
    srcs = [rt.closest_point(gr, np.deg2rad(d), R, system="polar") for d in degs]
    recs = [rt.closest_point(gr, np.deg2rad(d), R, system="polar")
            for d in (30.0, 90.0, 260.0)]
    recs.append(cg.cmap.center)
    d_full, _ = solve_circulant_twrapped(cg, srcs, F32, sweeps_per_call=2,
                                         interpret=True, batch=2)
    d_rec, _ = solve_circulant_twrapped(cg, srcs, F32, sweeps_per_call=2,
                                        interpret=True, batch=2, receivers=recs)
    assert d_rec.shape == (len(srcs), len(recs))
    np.testing.assert_array_equal(d_rec, d_full[:, recs])


def test_twrapped_vertical_closure_exact():
    gr, cg = _setup(16, 4, 400.0)
    src = rt.closest_point(gr, 0.0, R, system="polar")
    d_ref, _ = solve_circulant(cg, src, F32)
    ok = np.isfinite(d_ref)
    d_v, it_v = solve_circulant_twrapped(cg, [src], F32, sweeps_per_call=2,
                                         interpret=True, vertical_closure=2)
    d_0, it_0 = solve_circulant_twrapped(cg, [src], F32, sweeps_per_call=2,
                                         interpret=True)
    np.testing.assert_allclose(d_v[0][ok], d_ref[ok], rtol=1e-6, atol=5e-3)
    assert it_v <= it_0


@pytest.mark.parametrize("levels", [1, 2])
def test_twrapped_band_closure_exact(levels):
    # min-plus squaring of the truncated band is a real-path relaxation:
    # same fixpoint, no more iterations than the raw band
    gr, cg = _setup(20, 4, 400.0)
    src = rt.closest_point(gr, 0.0, R, system="polar")
    d_ref, _ = solve_circulant(cg, src, F32)
    ok = np.isfinite(d_ref)
    d_c, it_c = solve_circulant_twrapped(cg, [src], F32, sweeps_per_call=1,
                                         interpret=True, band_closure=levels)
    d_0, it_0 = solve_circulant_twrapped(cg, [src], F32, sweeps_per_call=1,
                                         interpret=True)
    np.testing.assert_allclose(d_c[0][ok], d_ref[ok], rtol=1e-6, atol=5e-3)
    assert it_c <= it_0


def test_twrapped_matches_dijkstra_f64_weights():
    gr, A, halo = rt.init_annulus(16, 4, spacing=400.0)
    prof = rt.velocity_profile()
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = rt.interpolate_velocity(gr.r, interp)
    cg = build_circulant(gr, A, halo, U, dtype=np.float32)
    src = rt.closest_point(gr, 0.0, R, system="polar")
    Dd = rt.dijkstra(A, halo, src, gr, U, SolverConfig(dtype="float64"))
    d_w, _ = solve_circulant_twrapped(cg, [src], F32, sweeps_per_call=4,
                                      interpret=True)
    ok = np.isfinite(Dd.dist)
    np.testing.assert_allclose(d_w[0][ok], Dd.dist[ok], rtol=1e-4, atol=1e-2)


def test_twrapped_s_wave_zero_velocity_core():
    # Vs = 0 outer core: +inf impassable weights survive the band
    # closure and the moving-frame pack; unreachable set matches exactly
    gr, A, halo = rt.init_annulus(16, 6, spacing=200.0)
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vs)
    U = rt.interpolate_velocity(gr.r, interp)
    assert (U <= 0).sum() > 0
    cg = build_circulant(gr, A, halo, U, dtype=np.float32)
    src = rt.closest_point(gr, 0.0, R, system="polar")
    d_ref, _ = solve_circulant(cg, src, F32)
    d_w, _ = solve_circulant_twrapped(cg, [src], F32, sweeps_per_call=2,
                                      interpret=True, band_closure=1)
    assert not np.isnan(d_w[0]).any()
    ok = np.isfinite(d_ref)
    np.testing.assert_array_equal(np.isfinite(d_w[0]), ok)
    np.testing.assert_allclose(d_w[0][ok], d_ref[ok], rtol=1e-6, atol=5e-3)


@pytest.mark.parametrize("ntheta", [9, 12, 24, 30])
def test_twrapped_wrap_regimes(ntheta):
    # unusual theta counts across the 8-row cover regimes: dup = 7, 4,
    # 0, 2 (the _DC_RANGE boundary) - all must match the jnp fixpoint
    gr, cg = _setup(ntheta, 3, 500.0)
    assert supports_twrapped(cg)
    src = rt.closest_point(gr, np.deg2rad(25.0), R, system="polar")
    d_ref, _ = solve_circulant(cg, src, F32)
    ok = np.isfinite(d_ref)
    d_w, _ = solve_circulant_twrapped(cg, [src], F32, sweeps_per_call=2,
                                      interpret=True)
    np.testing.assert_allclose(d_w[0][ok], d_ref[ok], rtol=1e-6, atol=5e-3)


def test_twrapped_unsupported_falls_back():
    # ntheta=15 -> NTT=16, dup=1 < _DC_RANGE: the theta-major kernel must
    # refuse and AnnulusSolver must fall through to the slot-major kernel
    from raytracer_tpu.config import SolverConfig

    gr, A, halo = rt.init_annulus(15, 3, spacing=500.0)
    prof = rt.velocity_profile()
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = rt.interpolate_velocity(gr.r, interp)
    cg = build_circulant(gr, A, halo, U, dtype=np.float32)
    assert not supports_twrapped(cg)
    with pytest.raises(ValueError):
        solve_circulant_twrapped(cg, [0], F32, interpret=True)
    solver = rt.AnnulusSolver(gr, A, halo, U, SolverConfig(dtype="float32"),
                              method="twrapped")
    assert solver.method == "wrapped"


def test_twrapped_faithful_mesh():
    # the bug-faithful replication of the reference mesher (duplicated
    # secondary nodes incl. the el2edge slot bug) is still perfectly
    # circulant - reference-exact meshes get the fast path too
    gr, A, halo = rt.init_annulus(16, 6, spacing=200.0, faithful=True)
    prof = rt.velocity_profile()
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = rt.interpolate_velocity(gr.r, interp)
    cg = build_circulant(gr, A, halo, U, dtype=np.float32)
    assert supports_twrapped(cg)
    src = rt.closest_point(gr, 0.0, R, system="polar")
    Dd = rt.dijkstra(A, halo, src, gr, U, SolverConfig(dtype="float64"))
    d_w, _ = solve_circulant_twrapped(cg, [src], F32, sweeps_per_call=2,
                                      interpret=True)
    ok = np.isfinite(Dd.dist)
    np.testing.assert_allclose(d_w[0][ok], Dd.dist[ok], rtol=1e-4, atol=1e-2)


def test_pack_twrapped_invariants():
    gr, cg = _setup(16, 4, 400.0)
    ws = pack_twrapped_stencil(cg)
    assert ws.ML % 128 == 0 and ws.ML >= ws.Mp + ws.maxdm + 1
    assert ws.NTT % 8 == 0 and ws.NTT >= ws.nt
    # pad lanes are +inf in every cost table (the self-masking invariant)
    for arr in (ws.wrows, ws.ring_f, ws.ring_b, ws.fan_w):
        assert np.isinf(arr[..., ws.Mp:]).all()
    assert np.isinf(ws.cfl[:, :, ws.Mp:]).all()
    assert np.isinf(ws.cbl[:, :, ws.Mp:]).all()


def test_twrapped_device_out_matches_materialised():
    # device_out leaves rows on device (multi-chunk: batch=2 over 5
    # sources) with only the iteration counts pulled; materialising the
    # returned array must equal the host-materialised path bit-for-bit
    import jax

    gr, cg = _setup(20, 4, 400.0)
    degs = (0.0, 95.0, 200.0, 310.0, 170.0)
    srcs = [rt.closest_point(gr, np.deg2rad(d), R, system="polar") for d in degs]
    d_np, it_np = solve_circulant_twrapped(cg, srcs, F32, sweeps_per_call=2,
                                           interpret=True, batch=2)
    d_dev, it_dev = solve_circulant_twrapped(cg, srcs, F32, sweeps_per_call=2,
                                             interpret=True, batch=2,
                                             device_out=True)
    assert isinstance(d_dev, jax.Array)
    assert it_dev == it_np
    np.testing.assert_array_equal(np.asarray(d_dev), d_np)


def test_solver_device_dist_api():
    import jax

    from raytracer_tpu.solvers.api import AnnulusSolver

    gr, A, halo = rt.init_annulus(16, 4, spacing=400.0)
    prof = rt.velocity_profile()
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = rt.interpolate_velocity(gr.r, interp)
    solver = rt.AnnulusSolver(gr, A, halo, U, F32, method="circulant")
    src = rt.closest_point(gr, 0.0, R, system="polar")
    # jnp path ignores device_dist gracefully (np result)
    D = solver.solve(src, want_prev=False, device_dist=True)
    assert isinstance(D.dist, np.ndarray)
