"""3-D spherical-shell grid + solver tests (reference: src/StructuredGrid.jl,
example3Dgrid.jl, benchmarks/cpu.jl)."""
import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig
from raytracer_tpu.models.grid3d import (
    closest_point3d,
    connectivity3d,
    grid3d,
    lazy_grid3d,
    nodal_incidence3d,
)
from raytracer_tpu.solvers.bfm import bfm3d
from raytracer_tpu.utils.coords import spherical2cart

F64 = SolverConfig(dtype="float64")


def _example_grid(n=(6, 6, 5)):
    # the reference benchmark box: 70-110 deg wedge, depth 2000 km
    c0 = (np.deg2rad(70.0), np.deg2rad(70.0), R - 2000.0)
    c1 = (np.deg2rad(110.0), np.deg2rad(110.0), R)
    return grid3d(c0, c1, n)


def test_grid3d_layout():
    g = _example_grid()
    assert g.nnods_total == 6 * 6 * 5
    assert g.nel_total == 5 * 5 * 4
    # node (i, j, k) -> flat i + j*n0 + k*n0*n1
    i, j, k = 2, 3, 1
    flat = i + j * 6 + k * 36
    x, y, z = spherical2cart(g.theta_ax[i], g.phi_ax[j], g.r_ax[k])
    assert g.x[flat] == pytest.approx(x)
    assert g.z[flat] == pytest.approx(z)


def test_lazy_grid_matches_eager():
    g = _example_grid()
    lg = lazy_grid3d(g.c0, g.c1, g.nnods)
    for flat in (0, 7, 63, len(g) - 1):
        th, ph, rr = lg[flat]
        assert th == pytest.approx(g.theta[flat])
        assert ph == pytest.approx(g.phi[flat])
        assert rr == pytest.approx(g.r[flat])


def test_connectivity3d():
    g = _example_grid()
    e2n = connectivity3d(g)
    assert e2n.shape == (g.nel_total, 8)
    assert e2n.min() >= 0 and e2n.max() < g.nnods_total
    # each hexa's 8 nodes are distinct
    assert all(len(set(row)) == 8 for row in e2n[:10])


def test_nodal_incidence3d_symmetric():
    g = _example_grid()
    A = nodal_incidence3d(g)
    assert (A != A.T).nnz == 0
    assert A.diagonal().sum() == 0
    # interior node of a hexa lattice has 26 element-sharing neighbours
    deg = np.diff(A.indptr)
    assert deg.max() == 26
    # star-1 expansion grows the neighbourhood
    A1 = nodal_incidence3d(g, neighbour_levels=1)
    assert A1.nnz > A.nnz


def test_bfm3d_matches_dijkstra():
    g = _example_grid()
    A = nodal_incidence3d(g)
    prof = rt.velocity_profile()
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = interp(g.r)
    src = closest_point3d(g, *spherical2cart(np.deg2rad(90.0), np.deg2rad(90.0), R))
    D = bfm3d(A, src, g, U, F64)
    D_ref = rt.dijkstra(A, np.empty((0, 2), np.int64), src, g, U, F64)
    ok = np.isfinite(D_ref.dist)
    assert ok.all()  # box grid is fully connected
    np.testing.assert_allclose(D.dist[ok], D_ref.dist[ok], rtol=1e-12, atol=1e-9)


def test_bfm3d_constant_velocity_bound():
    g = _example_grid((8, 8, 6))
    A = nodal_incidence3d(g)
    U = np.full(len(g), 10.0)
    src = 0
    D = bfm3d(A, src, g, U, F64)
    chord = np.sqrt((g.x - g.x[src]) ** 2 + (g.y - g.y[src]) ** 2 + (g.z - g.z[src]) ** 2)
    assert np.all(D.dist >= chord / 10.0 - 1e-9)


def test_multisource_3d():
    g = _example_grid()
    A = nodal_incidence3d(g)
    prof = rt.velocity_profile()
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = interp(g.r)
    gdev = rt.prepare(A, np.empty((0, 2), np.int64), g, U, F64)
    sources = [0, 17, len(g) - 1]
    many = rt.solve_many(gdev, sources, F64)
    for i, s in enumerate(sources):
        single = rt.solve(gdev, s, F64)
        np.testing.assert_allclose(many.dist[i], single.dist, rtol=1e-12)


def test_solve3d_matches_bfm3d():
    from raytracer_tpu.solvers.solve3d import solve3d

    g = _example_grid()
    A = nodal_incidence3d(g)
    prof = rt.velocity_profile()
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = interp(g.r)
    src = closest_point3d(g, *spherical2cart(np.deg2rad(90.0), np.deg2rad(90.0), R))
    D_ref = bfm3d(A, src, g, U, F64)
    dist, it = solve3d(g, U, [src], F64)
    assert it > 0
    np.testing.assert_allclose(dist[0], D_ref.dist, rtol=1e-9, atol=1e-6)


def test_solve3d_multi_source_and_scan_every():
    from raytracer_tpu.solvers.solve3d import prepare3d, solve3d

    g = _example_grid((7, 5, 4))
    A = nodal_incidence3d(g)
    U = np.full(len(g), 8.0)
    packed = prepare3d(g, U, F64)
    sources = [0, len(g) // 2]
    dist, _ = solve3d(g, U, sources, F64, _packed=packed)
    dist2, _ = solve3d(g, U, sources, F64, scan_every=2, _packed=packed)
    np.testing.assert_allclose(dist, dist2, rtol=1e-9, atol=1e-6)
    for i, s in enumerate(sources):
        D_ref = bfm3d(A, s, g, U, F64)
        np.testing.assert_allclose(dist[i], D_ref.dist, rtol=1e-9, atol=1e-6)
    # device-side receiver gather == full-field values at those nodes
    recs = [1, len(g) // 3, len(g) - 1]
    tab, _ = solve3d(g, U, sources, F64, receivers=recs, _packed=packed)
    np.testing.assert_array_equal(tab, dist[:, recs])
