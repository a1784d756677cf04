"""The Delaunay mesher's structured / unstructured entry modes
(reference: src/SSSP/annulus/mesh.jl:55-94, :96-111) and the npoints
knob of add_midpoints (:310-383)."""
import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig
from raytracer_tpu.models.delaunay import (_tri_areas, add_midpoints,
                                           structured_convex_hull,
                                           triangle_annulus_2d,
                                           unstructured_constrained_domain)

F64 = SolverConfig(dtype="float64")


def _solve_and_check(gr):
    """Every mode's mesh must be solvable and BFM == Dijkstra on it."""
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


def test_structured_points():
    pts = structured_convex_hull(nsurf=40, nx=15, nz=15)
    # every point inside (or on) the Earth disc
    assert np.hypot(pts[:, 0], pts[:, 1]).max() <= R * (1 + 1e-12)
    # the 39 surface points all survive the dedupe
    from raytracer_tpu.utils.coords import polar2cartesian

    t = np.linspace(0.0, 2 * np.pi, 40)[:-1]
    surf = np.stack(polar2cartesian(t, np.full(len(t), R)), axis=1)
    d = np.hypot(pts[None, :, 0] - surf[:, 0:1], pts[None, :, 1] - surf[:, 1:2])
    assert (d.min(axis=1) < 1e-6).all()
    # lattice interior points present (point nearest origin is a lattice one)
    assert np.hypot(pts[:, 0], pts[:, 1]).min() < 2 * R / 14


def test_structured_mode_solves():
    gr = triangle_annulus_2d(mesh_type="structured", nsurf=40, nx=15, nz=15)
    assert gr.nnods > 150
    assert not gr.is_quad.any()
    _solve_and_check(add_midpoints(gr))


def test_unstructured_area_constraint():
    max_area = 2.5e6
    pts = unstructured_constrained_domain(nsurf=30, max_area=max_area)
    import scipy.spatial

    tri = scipy.spatial.Delaunay(pts)
    areas = _tri_areas(pts, tri.simplices)
    assert areas.max() <= max_area
    # the surface polygon is preserved verbatim
    from raytracer_tpu.utils.coords import polar2cartesian

    t = np.linspace(0.0, 2 * np.pi, 30)[:-1]
    surf = np.stack(polar2cartesian(t, np.full(len(t), R)), axis=1)
    d = np.hypot(pts[None, :, 0] - surf[:, 0:1], pts[None, :, 1] - surf[:, 1:2])
    assert (d.min(axis=1) < 1e-6).all()


def test_unstructured_mode_solves():
    gr = triangle_annulus_2d(mesh_type="unstructured", nsurf=30, max_area=2.5e6)
    assert gr.nnods >= 29
    _solve_and_check(gr)


def test_unknown_mode_raises():
    with pytest.raises(ValueError):
        triangle_annulus_2d(mesh_type="hexagonal")


def test_add_midpoints_npoints():
    gr = triangle_annulus_2d(mesh_type="structured", nsurf=20, nx=8, nz=8)
    g1 = add_midpoints(gr, npoints=1)
    g2 = add_midpoints(gr, npoints=2)
    n_edges = g1.nnods - gr.nnods
    assert g2.nnods - gr.nnods == 2 * n_edges
    # npoints=2 nodes sit at 1/3 and 2/3 of each edge: every new node is
    # collinear with some original edge and strictly inside the disc hull
    assert np.hypot(g2.x, g2.z).max() <= R * (1 + 1e-12)
    # each element gained npoints nodes per edge (3 edges per triangle)
    for e in range(gr.nel):
        assert len(g2.e2n[e]) == len(gr.e2n[e]) + 6
        assert len(g1.e2n[e]) == len(gr.e2n[e]) + 3
