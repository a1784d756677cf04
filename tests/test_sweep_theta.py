"""Directional-sweep solver (ops/sweep_theta.py) equality tests.

The sweep solver must reach the exact Jacobi fixpoint of
ops/circulant.py::solve_circulant (same weights, same tol semantics) in
a handful of rounds, on every mode and engine, for surface / interior /
centre sources, batched chunks, receiver extraction and device_out.
"""
import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig
from raytracer_tpu.ops.circulant import build_circulant, solve_circulant
from raytracer_tpu.ops.sweep_theta import solve_circulant_sweep

CFG = SolverConfig(dtype="float32")
TOL = 2e-3  # two tol units of f32 termination slack


@pytest.fixture(scope="module")
def problem():
    gr, A, halo = rt.init_annulus(48, 12, spacing=150.0)
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = rt.interpolate_velocity(gr.r, interp)
    cg = build_circulant(gr, A, halo, U)
    return gr, cg


def _sources(gr, cg):
    return {
        "surface": rt.closest_point(gr, 0.0, R, system="polar"),
        "mid": rt.closest_point(gr, np.deg2rad(113.0), 4000.0,
                                system="polar"),
        "center": cg.cmap.center,
    }


@pytest.mark.parametrize("mode", ["theta", "r", "both", "kernel",
                                  "hclosure"])
def test_modes_match_jacobi(problem, mode):
    gr, cg = problem
    for name, src in _sources(gr, cg).items():
        d_ref, _ = solve_circulant(cg, src, CFG)
        d, rounds = solve_circulant_sweep(cg, src, CFG, mode=mode)
        assert rounds < 30, f"{mode}/{name}: {rounds} rounds"
        np.testing.assert_allclose(d[0], d_ref, atol=TOL, rtol=0,
                                   err_msg=f"{mode}/{name}")


def test_pallas_engine_matches_jacobi(problem):
    gr, cg = problem
    for name, src in _sources(gr, cg).items():
        d_ref, _ = solve_circulant(cg, src, CFG)
        d, rounds = solve_circulant_sweep(cg, src, CFG, engine="pallas",
                                          interpret=True)
        assert rounds < 10, f"{name}: {rounds} rounds"
        np.testing.assert_allclose(d[0], d_ref, atol=TOL, rtol=0,
                                   err_msg=name)


def test_pallas_engine_exact_wrap_grid():
    """nt % 128 == 0: the kernel's lane rolls wrap EXACTLY (no pad
    lanes), the opposite regime from the 48-column seam-blind case."""
    gr, A, halo = rt.init_annulus(128, 8, spacing=300.0)
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = rt.interpolate_velocity(gr.r, interp)
    cg = build_circulant(gr, A, halo, U)
    src = rt.closest_point(gr, np.deg2rad(7.0), R, system="polar")
    d_ref, _ = solve_circulant(cg, src, CFG)
    d, rounds = solve_circulant_sweep(cg, src, CFG, engine="pallas",
                                      interpret=True)
    # coarse shallow grids exceed the closure windows' slope reach
    # (drift <= h_cap over 2**k columns), costing extra cheap rounds -
    # the fine production grids converge in 3-4 (see PERF_NOTES.md)
    assert rounds < 40
    np.testing.assert_allclose(d[0], d_ref, atol=TOL, rtol=0)


@pytest.mark.parametrize("engine,interp_flag", [("xla", False),
                                                ("pallas", True)])
def test_batched_and_receivers(problem, engine, interp_flag):
    gr, cg = problem
    degs = [0.0, 40.0, 95.0, 150.0, 200.0]
    sources = [rt.closest_point(gr, np.deg2rad(d), R, system="polar")
               for d in degs]
    receivers = [rt.closest_point(gr, np.deg2rad(d), R, system="polar")
                 for d in (30.0, 90.0, 170.0)] + [cg.cmap.center]
    # batch=2 forces multi-chunk dispatch with a padded tail
    d, _ = solve_circulant_sweep(cg, sources, CFG, batch=2,
                                 receivers=receivers, engine=engine,
                                 interpret=interp_flag)
    assert d.shape == (len(sources), len(receivers))
    for i, src in enumerate(sources):
        d_ref, _ = solve_circulant(cg, src, CFG)
        np.testing.assert_allclose(d[i], d_ref[receivers], atol=TOL,
                                   rtol=0)


def test_device_out_matches(problem):
    gr, cg = problem
    src = rt.closest_point(gr, np.deg2rad(20.0), R, system="polar")
    d_host, it_h = solve_circulant_sweep(cg, src, CFG)
    d_dev, it_d = solve_circulant_sweep(cg, src, CFG, device_out=True)
    assert it_h == it_d
    np.testing.assert_array_equal(np.asarray(d_dev), d_host)


def test_api_sweep_solver_with_prev():
    """AnnulusSolver(method='sweep') end to end — the path the TPU
    `auto` routing now takes: distances match the jnp circulant solver
    and the predecessor tree recovered from the sweep-converged field
    backtraces to paths whose times agree with the field."""
    gr, A, halo = rt.init_annulus(48, 12, spacing=150.0)
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = rt.interpolate_velocity(gr.r, interp)
    src = rt.closest_point(gr, 0.0, R, system="polar")
    sw = rt.AnnulusSolver(gr, A, halo, U, CFG, method="sweep")
    assert sw.method == "sweep"
    ref = rt.AnnulusSolver(gr, A, halo, U, CFG, method="circulant")
    D = sw.solve(src, want_prev=True)
    D_ref = ref.solve(src, want_prev=False)
    np.testing.assert_allclose(D.dist, D_ref.dist, atol=TOL, rtol=0)
    # prev validity: every finite receiver's backtrace ends at the
    # source and is monotone in the distance field
    for deg in (30.0, 90.0, 170.0):
        rec = rt.closest_point(gr, np.deg2rad(deg), R, system="polar")
        path = rt.recontruct_path(D.prev, src, rec)
        assert path[-1] == src
        d_along = np.asarray(D.dist)[path]
        assert np.all(np.diff(d_along) <= TOL)  # receiver -> source
    # table entry agrees with the single solve
    tab = sw.travel_time_table([src], [rec])
    np.testing.assert_allclose(tab[0, 0], np.asarray(D.dist)[rec],
                               atol=TOL, rtol=0)


def test_sweep_odd_ntheta():
    """nt=45: odd column count, NTT pad 3 (>= dc range) — the wrap
    regime between the 48-column seam-blind and 128-column exact cases.
    Explicit method='sweep' must still hit the Jacobi fixpoint."""
    gr, A, halo = rt.init_annulus(45, 8, spacing=300.0)
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = rt.interpolate_velocity(gr.r, interp)
    cg = build_circulant(gr, A, halo, U)
    from raytracer_tpu.ops.wrapped_t import supports_twrapped
    assert supports_twrapped(cg)
    for deg in (0.0, 181.0):
        src = rt.closest_point(gr, np.deg2rad(deg), R, system="polar")
        d_ref, _ = solve_circulant(cg, src, CFG)
        d, rounds = solve_circulant_sweep(cg, src, CFG)
        assert rounds < 40
        np.testing.assert_allclose(d[0], d_ref, atol=TOL, rtol=0)


def test_unsupported_wrap_reroutes():
    """nt=47 pads to 48 with dup=1 < dc range: the theta-major family
    cannot cover the seam, supports_twrapped must say so, and the auto
    route (which prefers sweep on TPU) must fall back to a correct
    solver rather than a wrong kernel."""
    gr, A, halo = rt.init_annulus(47, 8, spacing=300.0)
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = rt.interpolate_velocity(gr.r, interp)
    cg = build_circulant(gr, A, halo, U)
    from raytracer_tpu.ops.wrapped_t import supports_twrapped
    assert not supports_twrapped(cg)
    src = rt.closest_point(gr, 0.0, R, system="polar")
    d_ref, _ = solve_circulant(cg, src, CFG)
    # explicit twrapped re-routes (wrapped/diag chain) and stays exact
    s = rt.AnnulusSolver(gr, A, halo, U, CFG, method="twrapped")
    assert s.method != "twrapped"
    D = s.solve(src, want_prev=False)
    np.testing.assert_allclose(D.dist, d_ref, atol=TOL, rtol=0)


def test_pallas_engine_lane_blocked(monkeypatch):
    """Force NTB < NTL (production hits this only at ~13M+ nodes, where
    the un-blocked kernel's two field windows blow the VMEM ceiling) so
    the lane-blocked kernel + generalized per-boundary seamfix path is
    exercised: blocks are seam-blind at BOTH edges and every block
    boundary's band edges must be re-applied exactly."""
    import raytracer_tpu.ops.sweep_theta as swt
    from raytracer_tpu.ops.wrapped_t import pack_twrapped_stencil

    gr, A, halo = rt.init_annulus(256, 6, spacing=400.0)
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = rt.interpolate_velocity(gr.r, interp)
    cg = build_circulant(gr, A, halo, U)
    ws = pack_twrapped_stencil(cg, dtype=np.float32, band_closure=0)
    monkeypatch.setattr(swt, "_RSWEEP_SINGLE_BYTES", 1)  # force blocking
    monkeypatch.setattr(swt, "_RSWEEP_WINDOW_BYTES", 1)  # ... maximal
    # one source suffices: the SSSP field reaches every column, so a
    # single solve exercises the theta wrap AND every block boundary;
    # deg=179 additionally puts the source right next to the NTB=128
    # internal boundary (interpret-mode solves cost ~70 s each here)
    for deg in (179.0,):
        src = rt.closest_point(gr, np.deg2rad(deg), R, system="polar")
        d_ref, _ = solve_circulant(cg, src, CFG)
        d, rounds = solve_circulant_sweep(cg, src, CFG, engine="pallas",
                                          interpret=True, _packed=ws)
        assert rounds < 40
        np.testing.assert_allclose(d[0], d_ref, atol=TOL, rtol=0,
                                   err_msg=f"deg={deg}")
    _, rst = swt.pack_rsweep_tables(ws, cg, np.float32)
    assert rst.NTB == 128 and rst.NTL == 256  # blocking really engaged
