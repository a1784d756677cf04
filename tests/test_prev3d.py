"""3-D predecessor recovery + sensitivity: backtraces strictly descend
to the source, path edge-weight sums reproduce the field (via the
homogeneity identity), and finite differences confirm dt/dU."""
import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig
from raytracer_tpu.models.grid3d import grid3d
from raytracer_tpu.solvers.solve3d import prepare3d, recover_prev3d, solve3d

F64 = SolverConfig(dtype="float64")


@pytest.fixture(scope="module")
def wedge():
    g3 = grid3d((np.deg2rad(70.0), np.deg2rad(70.0), R - 1200.0),
                (np.deg2rad(110.0), np.deg2rad(110.0), R), (12, 12, 8))
    prof = rt.velocity_profile("ak135")
    U3 = rt.LinearInterpolation(prof.r, prof.Vp)(g3.r)
    packed = prepare3d(g3, U3, F64)
    n = g3.nnods_total
    srcs = [n - 1, n // 3]
    dist, _ = solve3d(g3, U3, srcs, F64, _packed=packed)
    prevs = recover_prev3d(g3, U3, dist, srcs, F64, _packed=packed)
    return g3, U3, packed, srcs, dist, prevs


def test_backtrace_descends_to_source(wedge):
    g3, U3, _, srcs, dist, prevs = wedge
    n = g3.nnods_total
    rng = np.random.default_rng(1)
    for i, s in enumerate(srcs):
        assert prevs[i][s] == s
        for rec in rng.integers(0, n, 12):
            path = rt.recontruct_path(prevs[i], s, int(rec))
            assert path[0] == rec and path[-1] == s
            d = dist[i][path]
            assert np.all(np.diff(d) < 0) or len(path) <= 2


def test_path_times_reproduce_field(wedge):
    """sum_k U_k * dt/dU_k == -t (homogeneity) chains prev recovery,
    backtrace, and the 3-D sensitivity kernel into one exact check."""
    g3, U3, _, srcs, dist, prevs = wedge
    n = g3.nnods_total
    rng = np.random.default_rng(2)
    for i, s in enumerate(srcs):
        for rec in rng.integers(0, n, 8):
            path = rt.recontruct_path(prevs[i], s, int(rec))
            g = rt.path_sensitivity(g3, U3, path)
            np.testing.assert_allclose(np.dot(U3, g), -dist[i][int(rec)],
                                       rtol=1e-9)


def test_finite_difference_3d(wedge):
    g3, U3, packed, srcs, dist, prevs = wedge
    s = srcs[0]
    rec = g3.nnods_total // 2
    path = rt.recontruct_path(prevs[0], s, rec)
    g = rt.path_sensitivity(g3, U3, path)
    k = int(path[len(path) // 2])
    eps = 1e-6 * U3[k]
    U2 = np.array(U3, np.float64)
    U2[k] += eps
    dist2, _ = solve3d(g3, U2, [s], F64)
    dt = dist2[0][rec] - dist[0][rec]
    np.testing.assert_allclose(dt, eps * g[k], rtol=1e-4)


def test_refine_3d_matches_ray_theory(wedge):
    """Bending refinement generalises to 3-D unchanged: on the
    spherically-symmetric model the 1-D anchor applies at the
    great-circle angle, and the bent wedge path lands within ~1 s where
    SPM is tens of seconds off on this coarse grid."""
    from raytracer_tpu.models.raytheory import ak135_first_arrivals

    g3, U3, packed, srcs, dist, prevs = wedge
    n0, n1, n2 = g3.nnods

    def nid(i, j, k):
        return (k * n1 + j) * n0 + i

    src = nid(1, 1, n2 - 1)
    rec = nid(10, 10, n2 - 1)
    d1, _ = solve3d(g3, U3, [src], F64, _packed=packed)
    prev = recover_prev3d(g3, U3, d1, [src], F64, _packed=packed)[0]
    path = rt.recontruct_path(prev, src, rec)
    pts = np.stack([g3.x[path], g3.y[path], g3.z[path]], axis=1)
    prof = rt.velocity_profile("ak135")
    _, t_ref = rt.refine_path(pts, prof.r, prof.Vp)
    a = pts[0] / np.linalg.norm(pts[0])
    b = pts[-1] / np.linalg.norm(pts[-1])
    delta = float(np.rad2deg(np.arccos(np.clip(a @ b, -1.0, 1.0))))
    anchor = float(ak135_first_arrivals([delta])[0])
    t_spm = float(d1[0][rec])
    assert t_spm - anchor > 5.0          # the bias being cured is real
    assert abs(t_ref - anchor) < 1.0, (t_ref, anchor, t_spm)


def test_device_sensitivity_matrix_3d(wedge):
    g3, U3, _, srcs, dist, prevs = wedge
    n = g3.nnods_total
    recs = [5, n // 4, n // 2, n - 7]
    G = np.asarray(rt.sensitivity_matrix(g3, U3, prevs[0], srcs[0],
                                         recs, max_len=256))
    for r, rec in enumerate(recs):
        path = rt.recontruct_path(prevs[0], srcs[0], rec)
        g = rt.path_sensitivity(g3, U3, path)
        np.testing.assert_allclose(G[r], g, rtol=1e-12, atol=1e-18)
