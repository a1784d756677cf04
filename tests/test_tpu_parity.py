"""Real-TPU parity tests for the Pallas kernels (VERDICT r1 item 7).

These run the compiled Mosaic kernels on the actual chip and compare
against the jnp circulant solver; they are skipped on CPU (where the
interpret-mode tests in test_diag_kernel.py / test_pallas_kernel.py
cover the same logic).  The test-suite conftest forces the CPU platform,
so this module must be run separately with the TPU visible:

    python -m pytest tests/test_tpu_parity.py -q -p no:cacheprovider \
        --override-ini= -o addopts= --co  # collection works anywhere
    JAX_ALLOW_TPU=1 python tests/test_tpu_parity.py   # on-chip run

Running the module as a SCRIPT (not under the cpu-forcing conftest) is
the supported on-chip entry; bench.py's probe path exercises the same
kernels on every driver run as well.
"""
import os
import sys

import numpy as np

# script-mode entry runs with sys.path[0] == tests/; make the package visible
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _tpu_available():
    import jax

    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False


def _setup():
    import raytracer_tpu as rt
    from raytracer_tpu.ops.circulant import build_circulant

    gr, A, halo = rt.init_annulus(16, 4, spacing=400.0)
    prof = rt.velocity_profile()
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = rt.interpolate_velocity(gr.r, interp)
    cg = build_circulant(gr, A, halo, U, dtype=np.float32)
    return rt, gr, cg


def run_on_chip(fast: bool = False):
    """Execute the parity checks on the real TPU; raises on mismatch.

    fast=True ("--fast", the bench.py probe mode) checks only the two
    engines the benchmark ships (directional sweep + twrapped) against
    the jnp circulant fixpoint - a ~4-program budget so the parity line
    always lands inside the driver's bench wall-clock; the full battery
    (9 engines + staged + banded) remains the default for standalone
    runs."""
    import raytracer_tpu as rt
    from raytracer_tpu.config import R, SolverConfig
    from raytracer_tpu.ops.circulant import solve_circulant

    from raytracer_tpu.ops.wrapped_t import solve_circulant_twrapped

    rt_, gr, cg = _setup()
    F32 = SolverConfig(dtype="float32")
    src = rt.closest_point(gr, 0.0, R, system="polar")
    d_ref, _ = solve_circulant(cg, src, F32)
    ok = np.isfinite(d_ref)

    d_tw, it_t = solve_circulant_twrapped(cg, [src], F32, band_closure=1)
    np.testing.assert_allclose(d_tw[0][ok], d_ref[ok], rtol=1e-6, atol=5e-3,
                               err_msg="theta-major kernel vs jnp circulant on TPU")

    # directional-sweep solver (radial Pallas sweeps + closure scans)
    from raytracer_tpu.ops.sweep_theta import solve_circulant_sweep

    d_dsw, it_dsw = solve_circulant_sweep(cg, [src], F32, engine="pallas")
    np.testing.assert_allclose(d_dsw[0][ok], d_ref[ok], rtol=1e-6, atol=5e-3,
                               err_msg="directional-sweep solver vs jnp circulant on TPU")

    if fast:
        print(f"TPU parity OK (fast): twrapped iters={it_t}, "
              f"dir-sweep rounds={it_dsw}, n={ok.sum()} nodes compared")
        return

    from raytracer_tpu.ops.diag_circulant import solve_circulant_diag
    from raytracer_tpu.contrib.pallas_circulant import solve_circulant_pallas
    from raytracer_tpu.ops.diag_wrapped import solve_circulant_wrapped

    d_wr, it_w = solve_circulant_wrapped(cg, [src], F32)
    np.testing.assert_allclose(d_wr[0][ok], d_ref[ok], rtol=1e-6, atol=5e-3,
                               err_msg="wrapped kernel vs jnp circulant on TPU")

    d_diag, it_d = solve_circulant_diag(cg, [src], F32)
    np.testing.assert_allclose(d_diag[0][ok], d_ref[ok], rtol=1e-6, atol=5e-3,
                               err_msg="diag kernel vs jnp circulant on TPU")

    d_pal, it_p = solve_circulant_pallas(cg, [src], F32)
    np.testing.assert_allclose(d_pal[0][ok], d_ref[ok], rtol=1e-6, atol=5e-3,
                               err_msg="lane-gather kernel vs jnp circulant on TPU")

    from raytracer_tpu.ops.stream_t import solve_circulant_stream

    d_st, it_s = solve_circulant_stream(cg, [src], F32, band_closure=1)
    np.testing.assert_allclose(d_st[0][ok], d_ref[ok], rtol=1e-6, atol=5e-3,
                               err_msg="streamed path vs jnp circulant on TPU")
    d_sw, it_sw = solve_circulant_stream(cg, [src], F32, band_closure=1,
                                         warm_levels=2)
    np.testing.assert_allclose(d_sw[0][ok], d_ref[ok], rtol=1e-6, atol=5e-3,
                               err_msg="warm-started streamed path on TPU")

    # staged masked solve (the ms/multiphase/phases engine)
    prof = rt.velocity_profile()
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    from raytracer_tpu.solvers.multiphase import bfm_ms

    gr2, A2, halo2 = rt.init_annulus(16, 6, spacing=200.0)
    U2 = rt.interpolate_velocity(gr2.r, interp)
    src2 = rt.closest_point(gr2, 0.0, R, system="polar")
    D_ell = bfm_ms(A2, halo2, src2, gr2, U2, F32)
    D_str = bfm_ms(A2, halo2, src2, gr2, U2, F32, method="stream")
    ok2 = np.isfinite(D_ell.dist)
    np.testing.assert_array_equal(np.isfinite(D_str.dist), ok2)
    np.testing.assert_allclose(D_str.dist[ok2], D_ell.dist[ok2],
                               rtol=1e-5, atol=5e-3,
                               err_msg="staged masked solve vs ELL ms on TPU")

    # banded sweep (the unstructured-mesh fast path) vs the ELL solver
    from raytracer_tpu.models.annulus import node_adjacency
    from raytracer_tpu.models.delaunay import add_midpoints, triangle_annulus_2d
    from raytracer_tpu.ops.banded import prepare_banded, solve_banded
    from raytracer_tpu.solvers import bfm as _bfm

    gr3 = add_midpoints(triangle_annulus_2d(nr=12, spacing=500.0))
    A3 = node_adjacency(gr3, star=0)
    halo3 = np.empty((0, 2), np.int64)
    U3 = rt.interpolate_velocity(gr3.r, interp)
    src3 = rt.closest_point(gr3, 0.0, R, system="polar")
    bg = prepare_banded(A3, halo3, gr3, U3, F32)
    d_bnd, it_b = solve_banded(bg, [src3], F32)
    D3 = _bfm.solve(_bfm.prepare(A3, halo3, gr3, U3, F32), src3, F32)
    np.testing.assert_allclose(d_bnd[0], D3.dist, rtol=1e-6, atol=5e-3,
                               err_msg="banded sweep vs ELL on TPU")

    print(f"TPU parity OK: twrapped iters={it_t}, wrapped iters={it_w}, "
          f"diag iters={it_d}, pallas iters={it_p}, stream iters={it_s}, "
          f"stream-warm iters={it_sw}, dir-sweep rounds={it_dsw}, "
          f"staged-ms nodes={ok2.sum()}, "
          f"banded iters={it_b}, n={ok.sum()} nodes compared")


def test_tpu_kernel_parity():
    import pytest

    if not _tpu_available():
        pytest.skip("real TPU not visible (conftest forces CPU); "
                    "run `python tests/test_tpu_parity.py` on the chip")
    run_on_chip()


if __name__ == "__main__":
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    # cache even the tiny parity programs: under the axon tunnel each
    # remote compile costs ~0.4 s-minutes (erratic), and this script's
    # wall-clock budget inside bench.py depends on warm hits
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.25)
    if not _tpu_available():
        print("SKIP: no TPU visible")
        sys.exit(0)
    run_on_chip(fast="--fast" in sys.argv)
