"""Solver correctness: BFM == Dijkstra on the same graph/weights, halo
semantics, path backtrace, physical sanity of AK135 travel times."""
import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig

F64 = SolverConfig(dtype="float64")


@pytest.fixture(scope="module")
def solved(tiny_annulus, tiny_velocity):
    gr, A, halo = tiny_annulus
    source = rt.closest_point(gr, 0.0, R, system="polar")
    D_bfm = rt.bfm(A, halo, source, gr, tiny_velocity, F64)
    D_dij = rt.dijkstra(A, halo, source, gr, tiny_velocity, F64)
    return gr, A, halo, source, D_bfm, D_dij


def test_bfm_matches_dijkstra(solved):
    gr, A, halo, source, D_bfm, D_dij = solved
    reachable = np.isfinite(D_dij.dist)
    assert reachable.sum() > 0.95 * gr.nnods
    np.testing.assert_allclose(
        D_bfm.dist[reachable], D_dij.dist[reachable], rtol=1e-12, atol=1e-9
    )
    # unreachable sets agree
    np.testing.assert_array_equal(np.isfinite(D_bfm.dist), reachable)


def test_source_distance_zero(solved):
    _, _, _, source, D_bfm, _ = solved
    assert D_bfm.dist[source] == 0.0


def test_travel_times_physically_sane(solved):
    """AK135 P-wave first arrival at 60 deg is ~600 s; the coarse SPM grid
    overestimates, but must stay in a physical band."""
    gr, _, _, source, D_bfm, _ = solved
    rec = rt.closest_point(gr, np.deg2rad(90.0), R, system="polar")
    t = D_bfm.dist[rec]
    # true AK135 ~780 s at 90 deg; grid overshoot allowed up to ~20%
    assert 700.0 < t < 1000.0, f"unphysical travel time {t}"


def test_halo_couples_twins(solved):
    """Twin nodes must end with identical travel times (zero-cost merge)."""
    gr, A, halo, source, D_bfm, _ = solved
    a, b = halo[:, 0], halo[:, 1]
    ok = np.isfinite(D_bfm.dist[a]) & np.isfinite(D_bfm.dist[b])
    # after convergence both directions merged: dist equal across each pair
    np.testing.assert_allclose(D_bfm.dist[a][ok], D_bfm.dist[b][ok], rtol=1e-12)


def test_path_backtrace(solved):
    gr, _, _, source, D_bfm, _ = solved
    rec = rt.closest_point(gr, np.deg2rad(45.0), R, system="polar")
    path = rt.recontruct_path(D_bfm.prev, source, rec)
    assert path[0] == rec
    assert path[-1] == source
    # distances decrease monotonically walking back to the source
    d = D_bfm.dist[path]
    assert np.all(np.diff(d) <= 1e-9)


def test_device_backtrace_matches_host(solved):
    gr, _, _, source, D_bfm, _ = solved
    rec = rt.closest_point(gr, np.deg2rad(45.0), R, system="polar")
    host = rt.recontruct_path(D_bfm.prev, source, rec)
    dev = np.asarray(rt.backtrace_paths(D_bfm.prev, source, [rec], max_len=len(host) + 8))[0]
    np.testing.assert_array_equal(dev[: len(host)], host)
    assert np.all(dev[len(host):] == source)


def test_multisource_matches_single(tiny_annulus, tiny_velocity):
    gr, A, halo = tiny_annulus
    sources = [
        rt.closest_point(gr, np.deg2rad(d), R, system="polar") for d in (0.0, 30.0, 120.0)
    ]
    g = rt.prepare(A, halo, gr, tiny_velocity, F64)
    many = rt.solve_many(g, sources, F64)
    for i, s in enumerate(sources):
        single = rt.solve(g, s, F64)
        np.testing.assert_allclose(many.dist[i], single.dist, rtol=1e-12)


def test_radius_stepping_matches_dijkstra_no_halo(tiny_annulus, tiny_velocity):
    gr, A, _ = tiny_annulus
    empty_halo = np.empty((0, 2), dtype=np.int64)
    source = rt.closest_point(gr, 0.0, R, system="polar")
    rs = rt.radius_stepping(A, empty_halo, source, gr, tiny_velocity, F64)
    dj = rt.dijkstra(A, empty_halo, source, gr, tiny_velocity, F64)
    ok = np.isfinite(dj.dist)
    np.testing.assert_allclose(rs.dist[ok], dj.dist[ok], rtol=1e-12, atol=1e-9)


def test_constant_velocity_lower_bound(tiny_annulus):
    """With v=const the travel time is >= straight-line distance / v."""
    gr, A, halo = tiny_annulus
    U = np.full(gr.nnods, 8.0)
    source = rt.closest_point(gr, 0.0, R, system="polar")
    D = rt.bfm(A, halo, source, gr, U, F64)
    chord = np.sqrt((gr.x - gr.x[source]) ** 2 + (gr.z - gr.z[source]) ** 2)
    ok = np.isfinite(D.dist)
    # halo twin merges teleport 0.05 km per discontinuity crossing for free
    # (reference semantics: src/GridAnnulus.jl:938 + src/SSSP/bfm.jl:54-62),
    # so allow 2*7 crossings of slack below the straight-line bound
    slack = 3 * 7 * 0.05 / 8.0 + 1e-9
    assert np.all(D.dist[ok] >= chord[ok] / 8.0 - slack)
    # and within the graph-angular overshoot bound (< 25% on this coarse grid)
    far = ok & (chord > 2000.0)
    assert np.all(D.dist[far] <= 1.25 * chord[far] / 8.0)


def test_f32_close_to_f64(tiny_annulus, tiny_velocity):
    gr, A, halo = tiny_annulus
    source = rt.closest_point(gr, 0.0, R, system="polar")
    d32 = rt.bfm(A, halo, source, gr, tiny_velocity, SolverConfig(dtype="float32"))
    d64 = rt.bfm(A, halo, source, gr, tiny_velocity, F64)
    ok = np.isfinite(d64.dist)
    # < 10 ms absolute error on ~1000 s travel times
    assert np.max(np.abs(d32.dist[ok] - d64.dist[ok])) < 1e-2


def test_dual_velocity_end_to_end(tiny_annulus):
    """(n, 2) above/below velocities through the full BFM path (the
    reference's U::Matrix dispatch, src/SSSP/bfm.jl:113-159)."""
    gr, A, halo = tiny_annulus
    prof = rt.velocity_profile()
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U2 = rt.dual_velocity(gr.r, interp)
    assert U2.shape == (gr.nnods, 2)
    src = rt.closest_point(gr, 0.0, R, system="polar")
    D2 = rt.bfm(A, halo, src, gr, U2, F64)
    Dd = rt.dijkstra(A, halo, src, gr, U2, F64)
    ok = np.isfinite(Dd.dist)
    np.testing.assert_allclose(D2.dist[ok], Dd.dist[ok], rtol=1e-12, atol=1e-9)
    # dual velocities differ from the scalar path only at discontinuities
    U1 = rt.interpolate_velocity(gr.r, interp)
    D1 = rt.bfm(A, halo, src, gr, U1, F64)
    assert not np.allclose(D1.dist[ok], D2.dist[ok])
