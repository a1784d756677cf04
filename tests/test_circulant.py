"""Circulant-layout solver tests: structure verification, exactness vs
Dijkstra/ELL-BFM, centre-source solves, predecessor recovery."""
import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig
from raytracer_tpu.ops.circulant import build_circulant, column_map, recover_prev, solve_circulant

F64 = SolverConfig(dtype="float64")


@pytest.fixture(scope="module")
def circ(tiny_annulus, tiny_velocity):
    gr, A, halo = tiny_annulus
    cg = build_circulant(gr, A, halo, tiny_velocity, dtype=np.float64)
    return gr, A, halo, tiny_velocity, cg


def test_column_map_complete(tiny_annulus):
    gr, _, _ = tiny_annulus
    cm = column_map(gr)
    assert cm.M * cm.ntheta == gr.nnods - 1  # everything but the centre
    # node_of is a bijection
    ids = cm.node_of.ravel()
    assert len(np.unique(ids)) == len(ids)
    # consistency of forward/backward maps
    valid = cm.m_of >= 0
    back = cm.node_of[cm.m_of[valid], cm.c_of[valid]]
    np.testing.assert_array_equal(back, np.flatnonzero(valid))


def test_circulant_verifies_on_annulus(circ):
    _, _, _, _, cg = circ
    assert cg.src_flat.shape[0] == cg.M
    assert np.isfinite(cg.w).sum() > 0
    assert len(cg.fan_slots) > 0


def test_circulant_matches_dijkstra(circ):
    gr, A, halo, U, cg = circ
    src = rt.closest_point(gr, 0.0, R, system="polar")
    dist, iters = solve_circulant(cg, src, F64)
    D = rt.dijkstra(A, halo, src, gr, U, F64)
    ok = np.isfinite(D.dist)
    assert iters > 0
    np.testing.assert_allclose(dist[ok], D.dist[ok], rtol=1e-12, atol=1e-9)


def test_circulant_center_source(circ):
    """Solving FROM the core centre exercises the fan special case."""
    gr, A, halo, U, cg = circ
    center = cg.cmap.center
    dist, _ = solve_circulant(cg, center, F64)
    D = rt.dijkstra(A, halo, center, gr, U, F64)
    ok = np.isfinite(D.dist)
    np.testing.assert_allclose(dist[ok], D.dist[ok], rtol=1e-12, atol=1e-9)
    assert dist[center] == 0.0


def test_prev_recovery_device_matches_host(circ):
    # the device argmin sweep implements the same quantise + longest-hop
    # rule as the host lexsort; in f64 they agree except where several
    # edges tie exactly in BOTH keys (either pick is a valid SSSP tree)
    from raytracer_tpu.ops.circulant import PrevRecovery, recover_prev_device

    gr, A, halo, U, cg = circ
    src = rt.closest_point(gr, np.deg2rad(37.0), R, system="polar")
    dist, _ = solve_circulant(cg, src, F64)
    pr = PrevRecovery(gr, A, halo, U)
    prev_host = pr(dist)
    prev_dev = recover_prev_device(cg, dist)
    prev_host[src] = prev_dev[src] = src

    agree = prev_dev == prev_host
    disagree = np.flatnonzero(~agree)
    ok = np.isfinite(dist)
    # every device predecessor must be tree-valid: an edge (j -> i) with
    # dist[j] + w == dist[i] must exist in the solver's own edge list
    # (incl. the epsilon-weight halo twin links)
    for i in disagree:
        if not ok[i]:
            continue
        j = prev_dev[i]
        hits = np.flatnonzero((pr.rows == i) & (pr.cols == j))
        assert hits.size, f"device prev edge {j}->{i} not in graph"
        w = pr.w[hits].min()
        assert abs(dist[j] + w - dist[i]) < 1e-3, (i, j)
    assert agree.mean() > 0.99
    # unreachable nodes point to themselves on both
    np.testing.assert_array_equal(prev_dev[~ok], np.flatnonzero(~ok))


def test_prev_recovery_device_center(circ):
    from raytracer_tpu.ops.circulant import recover_prev_device

    gr, A, halo, U, cg = circ
    center = cg.cmap.center
    dist, _ = solve_circulant(cg, center, F64)
    prev = recover_prev_device(cg, dist)
    prev[center] = center
    # the fan slots nearest the centre must trace back to it
    fan_nodes = cg.cmap.node_of[cg.fan_slots]
    assert (prev[fan_nodes.ravel()] == center).any()
    ok = np.isfinite(dist)
    # backtracing from a surface receiver reaches the centre source
    rec = rt.closest_point(gr, np.deg2rad(90.0), R, system="polar")
    node, hops = rec, 0
    while node != center and hops < gr.nnods:
        node = int(prev[node])
        hops += 1
    assert node == center


def test_annulus_solver_auto_picks_circulant(circ):
    gr, A, halo, U, _ = circ
    solver = rt.AnnulusSolver(gr, A, halo, U, F64)
    assert solver.method == "circulant"
    src = rt.closest_point(gr, 0.0, R, system="polar")
    D = solver.solve(src)
    D_ell = rt.bfm(A, halo, src, gr, U, F64)
    ok = np.isfinite(D_ell.dist)
    np.testing.assert_allclose(D.dist[ok], D_ell.dist[ok], rtol=1e-12, atol=1e-9)
    # recovered predecessors form a valid shortest-path tree
    rec = rt.closest_point(gr, np.deg2rad(120.0), R, system="polar")
    path = rt.recontruct_path(D.prev, src, rec)
    assert path[0] == rec and path[-1] == src
    d = D.dist[path]
    assert np.all(np.diff(d) <= 1e-4)
    assert len(path) < 200  # long-hop tie-breaking keeps paths compact


def test_annulus_solver_table(circ):
    gr, A, halo, U, _ = circ
    solver = rt.AnnulusSolver(gr, A, halo, U, F64)
    srcs = [rt.closest_point(gr, np.deg2rad(d), R, system="polar") for d in (0.0, 90.0)]
    recs = [rt.closest_point(gr, np.deg2rad(d), R, system="polar") for d in (45.0, 180.0)]
    table = solver.travel_time_table(srcs, recs)
    assert table.shape == (2, 2)
    assert np.isfinite(table).all()


def test_s_wave_zero_velocity_core(tiny_annulus):
    """Vs = 0 in the liquid outer core: impassable edges become +inf
    weight (never NaN from zero-length twin edges), and the solve still
    matches Dijkstra exactly on the reachable set."""
    gr, A, halo = tiny_annulus
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vs)
    U = rt.interpolate_velocity(gr.r, interp)
    assert (U <= 0).sum() > 0  # outer core present
    cg = build_circulant(gr, A, halo, U, dtype=np.float64)
    assert not np.isnan(cg.w[np.isfinite(cg.w)]).any()
    src = rt.closest_point(gr, 0.0, R, system="polar")
    dist, _ = solve_circulant(cg, src, F64)
    D = rt.dijkstra(A, halo, src, gr, U, F64)
    ok = np.isfinite(D.dist)
    assert not np.isnan(dist).any()
    np.testing.assert_allclose(dist[ok], D.dist[ok], rtol=1e-12, atol=1e-9)
    np.testing.assert_array_equal(np.isfinite(dist), ok)


def test_prev_recovery_device_with_unreachable(tiny_annulus):
    """S-wave field (Vs = 0 outer core): destinations whose stencil taps
    are ALL +inf must not poison the quantisation offset (inf - inf =
    NaN keys made every tie test false and emitted int32-max node ids).
    Every emitted predecessor must be an in-range node id; unreachable
    nodes self-point."""
    from raytracer_tpu.ops.circulant import PrevRecovery, recover_prev_device

    gr, A, halo = tiny_annulus
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vs)
    U = rt.interpolate_velocity(gr.r, interp)
    cg = build_circulant(gr, A, halo, U, dtype=np.float64)
    src = rt.closest_point(gr, 0.0, R, system="polar")
    dist, _ = solve_circulant(cg, src, F64)
    assert (~np.isfinite(dist)).sum() > 0  # shadowed/core nodes present

    prev_dev = recover_prev_device(cg, dist)
    n = gr.nnods
    assert prev_dev.min() >= 0 and prev_dev.max() < n
    ok = np.isfinite(dist)
    np.testing.assert_array_equal(prev_dev[~ok], np.flatnonzero(~ok))
    # reachable nodes carry a tree-valid predecessor edge
    pr = PrevRecovery(gr, A, halo, U)
    for i in np.flatnonzero(ok):
        j = prev_dev[i]
        if i == src:
            continue
        hits = np.flatnonzero((pr.rows == i) & (pr.cols == j))
        assert hits.size, f"device prev edge {j}->{i} not in graph"
        assert abs(dist[j] + pr.w[hits].min() - dist[i]) < 1e-3, (i, j)

    # adversarial: velocity zero everywhere EXCEPT the centre node, source
    # at the centre -> fan nodes have finite dist but ALL stencil taps
    # +inf (every non-fan edge has U_i + U_j == 0).  The un-guarded
    # offset made their keys NaN and emitted int32-max predecessors.
    U0 = np.zeros_like(U)
    cen = cg.cmap.center
    U0[cen] = 8.0
    cg0 = build_circulant(gr, A, halo, U0, dtype=np.float64)
    dist0, _ = solve_circulant(cg0, cen, F64)
    reach = np.isfinite(dist0)
    assert 1 < reach.sum() < gr.nnods  # centre + its fan only
    prev0 = recover_prev_device(cg0, dist0)
    assert prev0.min() >= 0 and prev0.max() < gr.nnods
    np.testing.assert_array_equal(prev0[~reach], np.flatnonzero(~reach))
    fan = np.flatnonzero(reach)
    fan = fan[fan != cen]
    np.testing.assert_array_equal(prev0[fan], np.full(fan.size, cen))


def test_build_matches_coo_oracle(circ):
    """The CSR-slice construction (r3: the COO path cost 40 min at 12.9M
    nodes on one host core) must reproduce the straightforward full-COO
    stencil extraction entry for entry, including the halo zero-weight
    edges and the sort tie-break order."""
    from raytracer_tpu.ops.circulant import csr_edge_weights, _DC_RANGE

    gr, A, halo, U, cg = circ
    cm = cg.cmap
    nt, M = cm.ntheta, cm.M
    coo = A.tocoo()
    rows = np.concatenate([coo.row.astype(np.int64), halo[:, 1]])
    cols = np.concatenate([coo.col.astype(np.int64), halo[:, 0]])
    is_halo = np.zeros(len(rows), bool)
    is_halo[len(coo.row):] = True
    center = cm.center
    keep = (rows != center) & (cols != center)
    w = csr_edge_weights(gr, rows[keep], cols[keep], U)
    w[is_halo[keep]] = 0.0
    dc = (cm.c_of[cols[keep]] - cm.c_of[rows[keep]]) % nt
    dc = np.where(dc > nt // 2, dc - nt, dc)
    m_dst, m_src = cm.m_of[rows[keep]], cm.m_of[cols[keep]]
    # rebuild the (M, K) ELL from column 0's pattern, the oracle way
    sel = cm.c_of[rows[keep]] == 0
    order = np.lexsort((m_src[sel], dc[sel], m_dst[sel]))
    sm_dst = m_dst[sel][order]
    src_flat = (dc[sel][order] + _DC_RANGE) * M + m_src[sel][order]
    deg = np.bincount(sm_dst, minlength=M)
    offs = np.concatenate([[0], np.cumsum(deg)[:-1]])
    k_idx = np.arange(len(sm_dst)) - offs[sm_dst]
    oracle_src = np.zeros_like(cg.src_flat)
    oracle_w = np.full(cg.w.shape, np.inf, cg.w.dtype)
    oracle_src[sm_dst, k_idx] = src_flat
    oracle_w[sm_dst, k_idx] = w[sel][order]
    np.testing.assert_array_equal(cg.src_flat, oracle_src)
    np.testing.assert_array_equal(cg.w, oracle_w)
