"""Regression tests for self-review findings (round 1)."""
import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig
from raytracer_tpu.models.partition import level_mask, partition_grid
from raytracer_tpu.ops.circulant import CirculantError, build_circulant
from raytracer_tpu.solvers.multiphase import bfm_ms
from raytracer_tpu.utils.io import load_solution_npz, save_solution_npz

F64 = SolverConfig(dtype="float64")


def test_bfm_ms_preserves_boundary_times(tiny_annulus, tiny_velocity):
    """The upward-leg restart must keep the boundary node's accumulated
    travel time (the reference never zeroes the new source)."""
    gr, A, halo = tiny_annulus
    src = rt.closest_point(gr, 0.0, R, system="polar")
    D1 = bfm_ms(A, halo, src, gr, tiny_velocity, F64, levels=(1,))
    D2 = bfm_ms(A, halo, src, gr, tiny_velocity, F64)
    p = partition_grid(gr)
    b1 = np.flatnonzero(p.boundary_of == 1)
    tmin = np.nanmin(D1.dist[b1])
    assert np.isfinite(tmin) and tmin > 0
    # every finite level-2 distance includes at least the restart time
    finite2 = np.isfinite(D2.dist)
    assert np.all(D2.dist[finite2] >= tmin - 1e-9)


def test_heterogeneous_velocity_rejected_by_circulant(tiny_annulus, tiny_velocity):
    gr, A, halo = tiny_annulus
    U = np.asarray(tiny_velocity).copy()
    # a lateral anomaly confined to one theta column
    dtheta = 2 * np.pi / gr.ntheta
    col = np.floor(np.mod(gr.theta, 2 * np.pi) / dtheta + 1e-6).astype(int) % gr.ntheta
    U[(col == 11) & (gr.r > R - 500)] *= 0.5
    with pytest.raises(CirculantError):
        build_circulant(gr, A, halo, U, dtype=np.float64)
    # AnnulusSolver falls back to the general layout and still matches
    # Dijkstra on the anomalous field
    with pytest.warns(UserWarning):
        solver = rt.AnnulusSolver(gr, A, halo, U, F64)
    assert solver.method == "ell"
    src = rt.closest_point(gr, 0.0, R, system="polar")
    D = solver.solve(src, want_prev=False)
    Dd = rt.dijkstra(A, halo, src, gr, U, F64)
    ok = np.isfinite(Dd.dist)
    np.testing.assert_allclose(D.dist[ok], Dd.dist[ok], rtol=1e-12, atol=1e-9)


def test_delaunay_mesh_falls_back_to_ell():
    gr = rt.triangle_annulus_2d(nr=6, spacing=2000.0, layered=False)
    from raytracer_tpu.models.annulus import node_adjacency

    A = node_adjacency(gr, star=0)
    U = np.full(gr.nnods, 8.0)
    empty = np.empty((0, 2), np.int64)
    with pytest.warns(UserWarning):
        solver = rt.AnnulusSolver(gr, A, empty, U, F64)
    assert solver.method == "ell"
    src = rt.closest_point(gr, 0.0, R, system="polar")
    D = solver.solve(src, want_prev=False)
    assert np.isfinite(D.dist).sum() > 0


def test_unreachable_receiver_path(tiny_annulus):
    """S-wave shadowed receivers yield a length-1 path, not a fake chord."""
    gr, A, halo = tiny_annulus
    prof = rt.velocity_profile()
    interp = rt.LinearInterpolation(prof.r, prof.Vs)
    U = rt.interpolate_velocity(gr.r, interp)
    src = rt.closest_point(gr, 0.0, R, system="polar")
    D = rt.bfm(A, halo, src, gr, U, F64)
    unreach = np.flatnonzero(~np.isfinite(D.dist))
    assert len(unreach) > 0
    path = rt.recontruct_path(D.prev, src, int(unreach[0]))
    assert len(path) == 1 and path[0] == unreach[0]


def test_npz_path_ordering(tmp_path, tiny_annulus, tiny_velocity):
    gr, A, halo = tiny_annulus
    src = rt.closest_point(gr, 0.0, R, system="polar")
    D = rt.bfm(A, halo, src, gr, tiny_velocity, F64)
    paths = [np.array([src, i]) for i in range(12)]  # 12 > 10 forces the issue
    p = str(tmp_path / "many.npz")
    save_solution_npz(p, D, gr, src, paths)
    _, _, _, _, loaded = load_solution_npz(p)
    for i, lp in enumerate(loaded):
        assert lp[1] == i
