"""Tomographic sensitivity kernels: exactness of dt/dU along recovered
paths - homogeneity identity, finite differences against a re-solve,
dual-velocity column picks, and device COO/dense vs host equality."""
import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig

F64 = SolverConfig(dtype="float64")


@pytest.fixture(scope="module")
def solved(tiny_annulus, tiny_velocity):
    gr, A, halo = tiny_annulus
    source = rt.closest_point(gr, 0.0, R, system="polar")
    D = rt.dijkstra(A, halo, source, gr, tiny_velocity, F64)
    rec = rt.closest_point(gr, np.deg2rad(60.0), R, system="polar")
    path = rt.recontruct_path(D.prev, source, rec)
    return gr, A, halo, source, rec, D, path


def test_homogeneity_identity(solved, tiny_velocity):
    """t_e = 2L/(U_i+U_j) is homogeneous of degree -1 in U, so
    sum_k U_k * dt/dU_k == -t exactly (up to f64 rounding)."""
    gr, _, halo, _, rec, D, path = solved
    g = rt.path_sensitivity(gr, tiny_velocity, path, halo)
    np.testing.assert_allclose(np.dot(tiny_velocity, g), -D.dist[rec],
                               rtol=1e-12)


def test_finite_difference(solved, tiny_velocity):
    """Perturb U at one interior path node and compare the re-solved
    travel-time change against the predicted first-order change."""
    gr, A, halo, source, rec, D, path = solved
    g = rt.path_sensitivity(gr, tiny_velocity, path, halo)
    k = int(path[len(path) // 2])
    eps = 1e-6 * tiny_velocity[k]
    for sgn in (+1.0, -1.0):
        U2 = np.array(tiny_velocity, np.float64)
        U2[k] += sgn * eps
        D2 = rt.dijkstra(A, halo, source, gr, U2, F64)
        dt = D2.dist[rec] - D.dist[rec]
        np.testing.assert_allclose(dt, sgn * eps * g[k], rtol=1e-4)


def test_gradient_descent_direction(solved, tiny_velocity):
    """Raising velocity anywhere on the path cannot lengthen the first
    arrival: every sensitivity entry is <= 0."""
    gr, _, halo, _, _, _, path = solved
    g = rt.path_sensitivity(gr, tiny_velocity, path, halo)
    assert np.all(g <= 0.0)
    # every nonzero entry sits on the path; zero-length twin hops may
    # leave a path node with no contribution
    assert set(np.flatnonzero(g)) <= set(np.unique(path).tolist())
    assert np.count_nonzero(g) > 0.5 * len(np.unique(path))


def test_dual_homogeneity_and_reduction(solved, tiny_velocity):
    """Dual kernel: same homogeneity identity; with both columns equal
    the per-node sum reduces to the scalar kernel."""
    gr, A, halo, source, rec, D, path = solved
    Ud = np.stack([tiny_velocity, tiny_velocity], axis=1)
    Dd = rt.dijkstra(A, halo, source, gr, Ud, F64)
    path_d = rt.recontruct_path(Dd.prev, source, rec)
    gd = rt.path_sensitivity_dual(gr, Ud, path_d, halo)
    np.testing.assert_allclose(np.sum(Ud * gd), -Dd.dist[rec], rtol=1e-12)
    g = rt.path_sensitivity(gr, tiny_velocity, path_d, halo)
    np.testing.assert_allclose(gd.sum(axis=1), g, rtol=1e-12, atol=1e-18)


def test_dual_finite_difference_columns(solved, tiny_velocity):
    """Perturbing only the *below* column of a path node moves the
    travel time by exactly the (k, 0) entry, and similarly above."""
    gr, A, halo, source, rec, _, _ = solved
    Ud = np.stack([tiny_velocity, tiny_velocity * 1.01], axis=1)
    Dd = rt.dijkstra(A, halo, source, gr, Ud, F64)
    path_d = rt.recontruct_path(Dd.prev, source, rec)
    gd = rt.path_sensitivity_dual(gr, Ud, path_d, halo)
    k = int(path_d[len(path_d) // 2])
    for col in (0, 1):
        eps = 1e-6 * Ud[k, col]
        U2 = Ud.copy()
        U2[k, col] += eps
        D2 = rt.dijkstra(A, halo, source, gr, U2, F64)
        dt = D2.dist[rec] - Dd.dist[rec]
        np.testing.assert_allclose(dt, eps * gd[k, col], rtol=1e-4,
                                   atol=1e-13)


def test_device_matches_host(solved, tiny_velocity):
    """COO and dense device kernels reproduce the host path kernel for a
    fan of receivers (incl. an unreachable-free tiny grid)."""
    gr, _, halo, source, _, D, _ = solved
    recs = [rt.closest_point(gr, np.deg2rad(d), R, system="polar")
            for d in (20.0, 60.0, 120.0, 175.0)]
    max_len = gr.nnods
    Gd = np.asarray(rt.sensitivity_matrix(gr, tiny_velocity, D.prev,
                                          source, recs, max_len, halo))
    ids, vals = rt.sensitivity_coo(gr, tiny_velocity, D.prev, source,
                                   recs, max_len, halo)
    ids, vals = np.asarray(ids), np.asarray(vals)
    for r, rec in enumerate(recs):
        path = rt.recontruct_path(D.prev, source, rec)
        g = rt.path_sensitivity(gr, tiny_velocity, path, halo)
        np.testing.assert_allclose(Gd[r], g, rtol=1e-12, atol=1e-18)
        dense = np.zeros(gr.nnods)
        np.add.at(dense, ids[r], vals[r])
        np.testing.assert_allclose(dense, g, rtol=1e-12, atol=1e-18)


def test_annulus_solver_integration(tiny_annulus, tiny_velocity):
    """The production AnnulusSolver's prev feeds the kernels directly."""
    gr, A, halo = tiny_annulus
    solver = rt.AnnulusSolver(gr, A, halo, tiny_velocity, F64,
                              method="circulant")
    source = rt.closest_point(gr, 0.0, R, system="polar")
    D = solver.solve(source)
    rec = rt.closest_point(gr, np.deg2rad(60.0), R, system="polar")
    path = rt.recontruct_path(D.prev, source, rec)
    g = rt.path_sensitivity(gr, tiny_velocity, path, halo)
    np.testing.assert_allclose(np.dot(tiny_velocity, g), -D.dist[rec],
                               rtol=1e-6)
    # the solver's own convenience method produces the same row
    G = np.asarray(solver.sensitivity_matrix(D, source, [rec]))
    np.testing.assert_allclose(G[0], g, rtol=1e-12, atol=1e-18)
