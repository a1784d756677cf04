"""RCM-banded diagonal solver (ops/banded.py).

Equality against scipy Dijkstra / the ELL BFM on every graph family it
serves: unstructured Delaunay meshes (its raison d'etre), the structured
annulus incl. halo twin merges, dual velocities, S-wave zero-velocity
regions, source batches, and the AnnulusSolver method='banded' route.
"""
import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig
from raytracer_tpu.models.annulus import node_adjacency
from raytracer_tpu.models.delaunay import add_midpoints, triangle_annulus_2d
from raytracer_tpu.ops.banded import prepare_banded, solve_banded

F64 = SolverConfig(dtype="float64")


@pytest.fixture(scope="module")
def delaunay():
    gr = add_midpoints(triangle_annulus_2d(nr=12, spacing=500.0))
    A = node_adjacency(gr, star=0)
    halo = np.empty((0, 2), np.int64)
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = rt.interpolate_velocity(gr.r, interp)
    return gr, A, halo, U


@pytest.fixture(scope="module")
def annulus():
    gr, A, halo = rt.init_annulus(16, 6, spacing=200.0)
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = rt.interpolate_velocity(gr.r, interp)
    return gr, A, halo, U


def test_banded_matches_dijkstra_delaunay(delaunay):
    gr, A, halo, U = delaunay
    src = rt.closest_point(gr, 0.0, R, system="polar")
    bg = prepare_banded(A, halo, gr, U, F64)
    d_b, it = solve_banded(bg, [src], F64)
    assert it > 0
    Dd = rt.dijkstra(A, halo, src, gr, U, F64)
    np.testing.assert_allclose(d_b[0], Dd.dist, rtol=0, atol=1e-9)


def test_banded_matches_ell_with_halo(annulus):
    gr, A, halo, U = annulus
    assert halo.size > 0
    src = rt.closest_point(gr, 0.0, R, system="polar")
    bg = prepare_banded(A, halo, gr, U, F64)
    d_b, _ = solve_banded(bg, [src], F64)
    D = rt.bfm(A, halo, src, gr, U, F64)
    np.testing.assert_allclose(d_b[0], D.dist, rtol=0, atol=1e-9)


def test_banded_dual_velocity(annulus):
    gr, A, halo, _ = annulus
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U2 = rt.dual_velocity(gr.r, interp)
    assert U2.ndim == 2
    src = rt.closest_point(gr, np.deg2rad(45.0), R, system="polar")
    bg = prepare_banded(A, halo, gr, U2, F64)
    d_b, _ = solve_banded(bg, [src], F64)
    D = rt.bfm(A, halo, src, gr, U2, F64)
    np.testing.assert_allclose(d_b[0], D.dist, rtol=0, atol=1e-9)


def test_banded_s_wave_zero_velocity_core(annulus):
    gr, A, halo, _ = annulus
    prof = rt.velocity_profile("ak135")
    Us = rt.interpolate_velocity(gr.r, rt.LinearInterpolation(prof.r, prof.Vs))
    assert (Us <= 0).sum() > 0
    src = rt.closest_point(gr, 0.0, R, system="polar")
    bg = prepare_banded(A, halo, gr, Us, F64)
    d_b, _ = solve_banded(bg, [src], F64)
    assert not np.isnan(d_b[0]).any()
    D = rt.bfm(A, halo, src, gr, Us, F64)
    ok = np.isfinite(D.dist)
    np.testing.assert_array_equal(np.isfinite(d_b[0]), ok)
    np.testing.assert_allclose(d_b[0][ok], D.dist[ok], rtol=0, atol=1e-9)


def test_banded_source_batch(annulus):
    gr, A, halo, U = annulus
    degs = (0.0, 90.0, 210.0)
    srcs = [rt.closest_point(gr, np.deg2rad(d), R, system="polar") for d in degs]
    bg = prepare_banded(A, halo, gr, U, F64)
    d_b, _ = solve_banded(bg, srcs, F64)
    assert d_b.shape[0] == len(srcs)
    for i, s in enumerate(srcs):
        D = rt.bfm(A, halo, s, gr, U, F64)
        np.testing.assert_allclose(d_b[i], D.dist, rtol=0, atol=1e-9)


def test_banded_natural_order_equals_rcm(delaunay):
    gr, A, halo, U = delaunay
    src = rt.closest_point(gr, np.deg2rad(120.0), R, system="polar")
    d_rcm, _ = solve_banded(prepare_banded(A, halo, gr, U, F64), [src], F64)
    d_nat, _ = solve_banded(
        prepare_banded(A, halo, gr, U, F64, order="natural"), [src], F64)
    np.testing.assert_allclose(d_nat[0], d_rcm[0], rtol=0, atol=1e-9)


def test_banded_rcm_shrinks_diagonal_count(delaunay):
    gr, A, halo, U = delaunay
    bg_rcm = prepare_banded(A, halo, gr, U, F64)
    bg_nat = prepare_banded(A, halo, gr, U, F64, order="natural")
    assert bg_rcm.offs.size < bg_nat.offs.size


def test_annulus_solver_banded_route(delaunay):
    gr, A, halo, U = delaunay
    solver = rt.AnnulusSolver(gr, A, halo, U, F64, method="banded")
    assert solver.method == "banded"
    src = rt.closest_point(gr, 0.0, R, system="polar")
    D = solver.solve(src)
    assert solver.last_iterations > 0
    Dd = rt.dijkstra(A, halo, src, gr, U, F64)
    np.testing.assert_allclose(D.dist, Dd.dist, rtol=0, atol=1e-9)
    # prev encodes a valid shortest-path tree: walk every finite node
    # back to the source with monotonically decreasing distance
    prev = np.asarray(D.prev)
    dist = np.asarray(D.dist)
    rec = rt.closest_point(gr, np.deg2rad(90.0), R, system="polar")
    path = rt.recontruct_path(prev, src, rec)
    assert path[0] == rec and path[-1] == src
    dvals = dist[np.asarray(path)]
    assert (np.diff(dvals) <= 1e-9).all()
    # table path (banded _dist_batch_full route)
    recs = [rec, src]
    tab = solver.travel_time_table([src], recs)
    np.testing.assert_allclose(tab[0], dist[np.asarray(recs)], rtol=1e-6,
                               atol=1e-6)


def test_banded_gs_matches_jacobi_delaunay(delaunay):
    # directional block sweeps: same fixpoint as the Jacobi banded
    # solve in far fewer rounds; exercises B > n_pad safety clamp too
    from raytracer_tpu.ops.banded import solve_banded_gs

    gr, A, halo, U = delaunay
    src = rt.closest_point(gr, 0.0, R, system="polar")
    bg = prepare_banded(A, halo, gr, U, F64)
    d_j, it_j = solve_banded(bg, [src], F64)
    d_g, it_g = solve_banded_gs(bg, [src], F64)
    assert 0 < it_g <= it_j
    np.testing.assert_allclose(d_g, d_j, rtol=0, atol=1e-9)
    # batched + halo-carrying annulus
    srcs = [src, 3, len(gr.r) - 2]
    d_gb, _ = solve_banded_gs(bg, srcs, F64)
    np.testing.assert_allclose(d_gb[0], d_g[0], rtol=0, atol=0)
    d_jb, _ = solve_banded(bg, srcs, F64)
    np.testing.assert_allclose(d_gb, d_jb, rtol=0, atol=1e-9)


def test_banded_gs_matches_ell_with_halo(annulus):
    from raytracer_tpu.ops.banded import solve_banded_gs

    gr, A, halo, U = annulus
    assert halo.size > 0
    src = rt.closest_point(gr, 0.0, R, system="polar")
    bg = prepare_banded(A, halo, gr, U, F64)
    d_g, it_g = solve_banded_gs(bg, [src], F64)
    D = rt.bfm(A, halo, src, gr, U, F64)
    assert it_g > 0
    np.testing.assert_allclose(d_g[0], D.dist, rtol=0, atol=1e-9)
