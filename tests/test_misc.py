"""Coverage for auxiliary components: graph layouts, RCM/tile ordering,
Delaunay mesher, IO round-trips, timer."""
import os

import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig
from raytracer_tpu.models.delaunay import add_midpoints, triangle_annulus_2d
from raytracer_tpu.ops.graph import (
    adjacency_list,
    csr_to_ell,
    nodal_degree,
    permute_graph,
    rcm_permutation,
    sparse_adjacency_list,
    tile_permutation,
)
from raytracer_tpu.utils.io import load_solution_npz, save_matfile, save_solution_npz
from raytracer_tpu.utils.timing import Timer

F64 = SolverConfig(dtype="float64")


def test_ell_roundtrip(tiny_annulus):
    _, A, _ = tiny_annulus
    ell = csr_to_ell(A)
    deg = np.diff(A.indptr)
    np.testing.assert_array_equal(ell.degrees[: A.shape[0]], deg)
    # every CSR edge appears in the ELL rows
    for i in (0, 5, 100):
        np.testing.assert_array_equal(
            np.sort(ell.nbr[i][ell.mask[i]]), np.sort(A.indices[A.indptr[i]:A.indptr[i + 1]])
        )


def test_adjacency_list_layouts(tiny_annulus):
    _, A, _ = tiny_annulus
    sal = sparse_adjacency_list(A)
    assert sal.list.shape[0] == A.nnz
    np.testing.assert_array_equal(sal.deg, nodal_degree(A))
    al = adjacency_list(A)
    assert al.G.shape[1] == A.shape[0]
    np.testing.assert_array_equal(al.N, nodal_degree(A))


def test_rcm_and_tile_permutations(tiny_annulus, tiny_velocity):
    gr, A, halo = tiny_annulus
    perm = rcm_permutation(A)
    assert sorted(perm) == list(range(A.shape[0]))
    A2 = permute_graph(A, perm)
    assert A2.nnz == A.nnz
    tp = tile_permutation(gr)
    assert sorted(tp) == list(range(gr.nnods))
    # RCM reduces bandwidth
    coo, coo2 = A.tocoo(), A2.tocoo()
    assert np.abs(coo2.row - coo2.col).mean() < np.abs(coo.row - coo.col).mean()


def test_delaunay_mesher_solves():
    gr = triangle_annulus_2d(nr=8, spacing=1500.0, layered=False)
    assert gr.nnods > 10
    gr = add_midpoints(gr)
    from raytracer_tpu.models.annulus import node_adjacency

    A = node_adjacency(gr, star=0)
    assert (A != A.T).nnz == 0
    U = np.full(gr.nnods, 8.0)
    src = rt.closest_point(gr, 0.0, R, system="polar")
    empty = np.empty((0, 2), np.int64)
    D = rt.bfm(A, empty, src, gr, U, F64)
    Dd = rt.dijkstra(A, empty, src, gr, U, F64)
    ok = np.isfinite(Dd.dist)
    assert ok.sum() > 0.9 * gr.nnods
    np.testing.assert_allclose(D.dist[ok], Dd.dist[ok], rtol=1e-12, atol=1e-9)


def test_npz_roundtrip(tmp_path, tiny_annulus, tiny_velocity):
    gr, A, halo = tiny_annulus
    src = rt.closest_point(gr, 0.0, R, system="polar")
    D = rt.bfm(A, halo, src, gr, tiny_velocity, F64)
    rec = rt.closest_point(gr, np.deg2rad(45.0), R, system="polar")
    paths = [rt.recontruct_path(D.prev, src, rec)]
    p = str(tmp_path / "sol.npz")
    save_solution_npz(p, D, gr, src, paths)
    data, prev, dist, source, paths2 = load_solution_npz(p)
    np.testing.assert_allclose(dist, D.dist)
    np.testing.assert_array_equal(paths2[0], paths[0])
    assert source == src


def test_matfile_export(tmp_path, tiny_annulus, tiny_velocity):
    gr, A, halo = tiny_annulus
    src = rt.closest_point(gr, 0.0, R, system="polar")
    D = rt.bfm(A, halo, src, gr, tiny_velocity, F64)
    p = str(tmp_path / "sol.mat")
    save_matfile(p, D, gr, paths=[np.array([src, src])])
    from scipy.io import loadmat

    m = loadmat(p)
    assert "x" in m and "x_path1" in m


def test_timer_report():
    t = Timer()
    with t.section("a"):
        pass
    with t.section("a"):
        pass
    rep = t.report()
    assert "a" in rep and "2" in rep


def test_native_adjacency_matches_scipy():
    from raytracer_tpu.models.annulus import _node_adjacency_scipy, primary_grid, secondary_nodes, constrain2layers, discontinuous_boundaries
    from raytracer_tpu.native import node_adjacency_native

    gr = primary_grid(12, 5)
    gr = secondary_nodes(gr, spacing=300.0)
    constrain2layers(gr)
    gr, halo = discontinuous_boundaries(gr, 300.0)
    for star in (0, 1, 2, 3):
        A_native = node_adjacency_native(gr.e2n, gr.neighbours, gr.nnods, star)
        if A_native is None:
            import pytest

            pytest.skip("native toolchain unavailable")
        A_scipy = _node_adjacency_scipy(gr, star)
        assert (A_native != A_scipy).nnz == 0, f"star={star} mismatch"
