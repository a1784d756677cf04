"""Grid/graph construction invariants (reference: src/GridAnnulus.jl)."""
import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.config import DISCONTINUITY_RADII, LAYER_RADII, R, R_INNER, TWIN_OFFSET
from raytracer_tpu.models.annulus import (
    edge_connectivity,
    find_boundary,
    primary_grid,
    secondary_nodes,
)


def test_primary_grid_counts():
    nt, nr = 12, 5
    gr = primary_grid(nt, nr)
    nr_tot = nr + 7
    assert gr.nr == nr_tot
    assert gr.nnods == nt * nr_tot + 1
    assert gr.nel == (nr_tot - 1) * nt + nt
    assert gr.is_quad.sum() == (nr_tot - 1) * nt


def test_primary_grid_has_discontinuity_radii():
    gr = primary_grid(8, 4)
    for rad in DISCONTINUITY_RADII:
        assert rad in gr.r, f"discontinuity radius {rad} missing from grid"
    assert gr.r.max() == R
    assert gr.r.min() == 0.0  # core centre point
    assert np.sort(gr.r)[1] == R_INNER


def test_element_wrap_around():
    """Elements in the last theta column reference the first column."""
    gr = primary_grid(8, 4)
    nr = gr.nr
    last_col_quads = [gr.e2n[e] for e in range((8 - 1) * (nr - 1), 8 * (nr - 1))]
    for quad in last_col_quads:
        assert (quad < nr).any(), "seam quad must wrap to first column"


def test_triangle_fan_closes():
    gr = primary_grid(8, 4)
    tris = [gr.e2n[e] for e in range(gr.nel - 8, gr.nel)]
    center = gr.ntheta * gr.nr
    for t in tris:
        assert t[0] == center
    assert tris[-1][2] == 0  # wraps to node 0


def test_neighbours_symmetric_and_exclude_center_link():
    gr = primary_grid(8, 4)
    for e, nbrs in enumerate(gr.neighbours):
        for j in nbrs:
            assert e in gr.neighbours[j]
    # triangles sharing only the core centre point must NOT be neighbours
    tri0, tri4 = gr.nel - 8, gr.nel - 4  # opposite sides of the fan
    assert tri4 not in gr.neighbours[tri0]
    # adjacent triangles share a radial edge -> neighbours
    assert (gr.nel - 7) in gr.neighbours[gr.nel - 8]


def test_edge_connectivity_unique_and_shared():
    gr = primary_grid(8, 4)
    edges, edge2el = edge_connectivity(gr)
    assert len(edges) == len(np.unique(edges, axis=0))
    counts = np.array([len(e) for e in edge2el])
    assert counts.min() >= 1
    assert counts.max() <= 2  # an edge is shared by at most two elements


def test_secondary_nodes_spacing():
    gr0 = primary_grid(8, 4)
    gr = secondary_nodes(gr0, spacing=100.0)
    assert gr.nnods > gr0.nnods
    # secondary nodes lie strictly inside the annulus radius range
    new_r = gr.r[gr0.nnods:]
    assert new_r.max() <= R
    # all elements still reference valid nodes
    for nodes in gr.e2n:
        assert nodes.max() < gr.nnods


def test_find_boundary_layers():
    assert find_boundary(np.array([R - 10.0]))[0] == 2       # crust above R-20
    assert find_boundary(np.array([R - 27.0]))[0] == 3       # between 20 and 35
    assert find_boundary(np.array([1000.0]))[0] == 1         # below deepest boundary
    nlayers = len(LAYER_RADII)
    assert find_boundary(np.array([R - 2800.0]))[0] == nlayers  # deepest interval


def test_init_annulus_halo_invariants(tiny_annulus):
    gr, A, halo = tiny_annulus
    # halo is symmetric: (a, b) and (b, a) both present
    pairs = set(map(tuple, halo))
    for a, b in halo:
        assert (b, a) in pairs
    # twins: same theta, radius offset by TWIN_OFFSET
    half = halo[: len(halo) // 2]
    orig, twin = half[:, 0], half[:, 1]
    assert np.allclose(gr.theta[orig], gr.theta[twin])
    assert np.allclose(gr.r[orig] - gr.r[twin], TWIN_OFFSET)
    # every original sits exactly on a discontinuity radius
    assert all(r in DISCONTINUITY_RADII for r in np.unique(gr.r[orig]))


def test_adjacency_symmetric_no_selfloops(tiny_annulus):
    gr, A, halo = tiny_annulus
    assert (A != A.T).nnz == 0
    assert A.diagonal().sum() == 0
    assert A.shape == (gr.nnods, gr.nnods)


def test_adjacency_does_not_cross_discontinuities(tiny_annulus):
    """No direct edge connects strictly-above to strictly-below a
    discontinuity: crossing happens only through halo twin merges."""
    gr, A, halo = tiny_annulus
    coo = A.tocoo()
    ri, rj = gr.r[coo.row], gr.r[coo.col]
    for rad in DISCONTINUITY_RADII:
        # nodes exactly at `rad` belong to the layer above; twins (rad -
        # TWIN_OFFSET) to the layer below
        above = np.minimum(ri, rj) >= rad
        below = np.maximum(ri, rj) < rad
        assert np.all(above | below), f"edge crosses discontinuity at r={rad}"


def test_closest_point_polar_and_cartesian(tiny_annulus):
    gr, _, _ = tiny_annulus
    src = rt.closest_point(gr, 0.0, R, system="polar")
    assert gr.r[src] == R and gr.theta[src] == 0.0
    src2 = rt.closest_point(gr, gr.x[100], gr.z[100], system="cartesian")
    assert src2 == 100


def test_grid_scales_with_spacing():
    gr1, _, _ = rt.init_annulus(8, 4, spacing=300.0)
    gr2, _, _ = rt.init_annulus(8, 4, spacing=100.0)
    assert gr2.nnods > gr1.nnods
