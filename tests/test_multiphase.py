"""Partition + multi-stage/multiphase solver tests."""
import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig
from raytracer_tpu.models.partition import find_layer_number, level_mask, partition_grid
from raytracer_tpu.solvers.multiphase import (
    bfm_ms,
    bfm_multiphase,
    boundary_velocity,
    directions,
    find_new_source_min,
)

F64 = SolverConfig(dtype="float64")


def test_find_layer_number():
    assert find_layer_number(R - 5.0) == 1
    assert find_layer_number(R - 27.0) == 2
    assert find_layer_number(R - 100.0) == 3
    assert find_layer_number(1000.0) == 8


def test_partition_labels(tiny_annulus):
    gr, _, _ = tiny_annulus
    p = partition_grid(gr)
    assert p.nlayers == 8 and p.nboundaries == 7
    # boundary nodes sit exactly on discontinuity radii (originals only;
    # twins are offset 0.05 km and belong to the layer below)
    for k, rb in enumerate(p.rboundaries):
        nodes = np.flatnonzero(p.boundary_of == k + 1)
        assert len(nodes) > 0
        assert np.allclose(gr.r[nodes], rb)
    # every node is labelled
    assert np.all((p.layer_of > 0) | (p.boundary_of > 0))
    # iterator is down-then-up symmetric
    nmax = 2 * p.nlayers - 1
    assert p.iterator[1] == p.iterator[nmax]
    assert p.iterator[2] == p.iterator[nmax - 1]
    assert len(p.iterator) == nmax


def test_level_mask(tiny_annulus):
    gr, _, _ = tiny_annulus
    p = partition_grid(gr)
    m1 = level_mask(p, 1)   # Layer_1 + Boundary_1 (crust down to 20 km)
    assert m1.sum() > 0
    assert np.all(gr.r[m1] >= p.rboundaries[0] - 0.051)


def test_directions():
    d = directions(8)
    assert d[1] == ("above", "above")
    assert d[8] == ("below", "below")
    assert d[2] == d[14] == ("below", "above")


def test_boundary_velocity_swap():
    prof = rt.velocity_profile()
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = np.full(10, 5.0)
    rb = rt.DISCONTINUITY_RADII[0]
    U2 = boundary_velocity(U, interp, rb, np.array([2, 3]), "above")
    assert U2[2] == pytest.approx(interp(rb + 1.0))
    assert U2[0] == 5.0
    U3 = boundary_velocity(U, interp, rb, np.array([2]), "below")
    assert U3[2] == pytest.approx(interp(rb - 1.0))


def test_bfm_ms_first_level_matches_crust_solve(tiny_annulus, tiny_velocity):
    """Level-1 of the multi-stage sweep must reproduce plain BFM distances
    within the crust (Layer_1 + Boundary_1), where the masks agree."""
    gr, A, halo = tiny_annulus
    src = rt.closest_point(gr, 0.0, R, system="polar")
    D_ms = bfm_ms(A, halo, src, gr, tiny_velocity, F64, levels=(1,))
    D_full = rt.bfm(A, halo, src, gr, tiny_velocity, F64)
    p = partition_grid(gr)
    crust = level_mask(p, 1) & np.isfinite(D_full.dist)
    # the full solve may shortcut through deeper layers (head waves), so it
    # can only be faster than the crust-restricted sweep
    finite_ms = np.isfinite(D_ms.dist)
    assert np.all(D_full.dist[crust & finite_ms] <= D_ms.dist[crust & finite_ms] + 1e-9)
    # the restricted sweep actually covered the crust
    assert (crust & finite_ms).sum() > 0.9 * crust.sum()
    # and did not propagate into the deep mantle (below the 660 boundary,
    # beyond the reach of Boundary_1 twins)
    deep = gr.r < (R - 660.0) - 1.0
    assert not np.isfinite(D_ms.dist[deep]).any()


def test_bfm_ms_two_levels_runs(tiny_annulus, tiny_velocity):
    gr, A, halo = tiny_annulus
    src = rt.closest_point(gr, 0.0, R, system="polar")
    D = bfm_ms(A, halo, src, gr, tiny_velocity, F64)
    # after the final (upward) level, distances are the upward-leg times
    # restarted from Boundary_1 (the reference resets everything else,
    # src/SSSP/bfm_new_ms.jl:96-110), so the source carries the
    # boundary-to-surface time, not 0
    assert np.isfinite(D.dist[src])
    assert D.dist[src] > 0.0
    p = partition_grid(gr)
    b1 = np.flatnonzero(p.boundary_of == 1)
    assert np.isfinite(D.dist[b1]).all()


def test_bfm_multiphase_runs(tiny_annulus, tiny_velocity):
    gr, A, halo = tiny_annulus
    prof = rt.velocity_profile()
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    src = rt.closest_point(gr, 0.0, R, system="polar")
    D = bfm_multiphase(A, src, gr, tiny_velocity, interpolant=interp, config=F64)
    assert D.dist[src] == 0.0
    assert np.isfinite(D.dist).sum() > 100


F32 = SolverConfig(dtype="float32")


def test_bfm_ms_stream_matches_ell(tiny_annulus, tiny_velocity):
    # the circulant staged fast path must reproduce the ELL reference
    # implementation: same finite set (level masking), same distances
    gr, A, halo = tiny_annulus
    src = rt.closest_point(gr, 0.0, R, system="polar")
    D_ell = bfm_ms(A, halo, src, gr, tiny_velocity, F32)
    D_str = bfm_ms(A, halo, src, gr, tiny_velocity, F32,
                   method="stream", interpret=True)
    ok = np.isfinite(D_ell.dist)
    np.testing.assert_array_equal(np.isfinite(D_str.dist), ok)
    np.testing.assert_allclose(D_str.dist[ok], D_ell.dist[ok],
                               rtol=1e-5, atol=5e-3)


def test_bfm_ms_stream_single_level(tiny_annulus, tiny_velocity):
    gr, A, halo = tiny_annulus
    src = rt.closest_point(gr, np.deg2rad(45.0), R, system="polar")
    D_ell = bfm_ms(A, halo, src, gr, tiny_velocity, F32, levels=(1,))
    D_str = bfm_ms(A, halo, src, gr, tiny_velocity, F32, levels=(1,),
                   method="stream", interpret=True)
    ok = np.isfinite(D_ell.dist)
    np.testing.assert_array_equal(np.isfinite(D_str.dist), ok)
    np.testing.assert_allclose(D_str.dist[ok], D_ell.dist[ok],
                               rtol=1e-5, atol=5e-3)


def test_bfm_multiphase_stream_matches_ell(tiny_annulus, tiny_velocity):
    gr, A, halo = tiny_annulus
    prof = rt.velocity_profile()
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    src = rt.closest_point(gr, 0.0, R, system="polar")
    D_ell = bfm_multiphase(A, src, gr, tiny_velocity, interpolant=interp,
                           config=F32)
    D_str = bfm_multiphase(A, src, gr, tiny_velocity, interpolant=interp,
                           config=F32, method="stream", interpret=True)
    ok = np.isfinite(D_ell.dist)
    np.testing.assert_array_equal(np.isfinite(D_str.dist), ok)
    np.testing.assert_allclose(D_str.dist[ok], D_ell.dist[ok],
                               rtol=1e-5, atol=5e-3)


def test_bfm_ms_sweep_matches_ell(tiny_annulus, tiny_velocity):
    # the directional-sweep staged engine must reproduce the ELL
    # reference implementation: same finite set, same distances
    gr, A, halo = tiny_annulus
    src = rt.closest_point(gr, 0.0, R, system="polar")
    D_ell = bfm_ms(A, halo, src, gr, tiny_velocity, F32)
    D_sw = bfm_ms(A, halo, src, gr, tiny_velocity, F32,
                  method="sweep", interpret=True)
    ok = np.isfinite(D_ell.dist)
    np.testing.assert_array_equal(np.isfinite(D_sw.dist), ok)
    np.testing.assert_allclose(D_sw.dist[ok], D_ell.dist[ok],
                               rtol=1e-5, atol=5e-3)


def test_bfm_multiphase_sweep_matches_ell(tiny_annulus, tiny_velocity):
    gr, A, halo = tiny_annulus
    prof = rt.velocity_profile()
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    src = rt.closest_point(gr, 0.0, R, system="polar")
    D_ell = bfm_multiphase(A, src, gr, tiny_velocity, interpolant=interp,
                           config=F32)
    D_sw = bfm_multiphase(A, src, gr, tiny_velocity, interpolant=interp,
                          config=F32, method="sweep", interpret=True)
    ok = np.isfinite(D_ell.dist)
    np.testing.assert_array_equal(np.isfinite(D_sw.dist), ok)
    np.testing.assert_allclose(D_sw.dist[ok], D_ell.dist[ok],
                               rtol=1e-5, atol=5e-3)


def test_find_new_source_min(tiny_annulus, tiny_velocity):
    gr, A, halo = tiny_annulus
    src = rt.closest_point(gr, 0.0, R, system="polar")
    D = rt.bfm(A, halo, src, gr, tiny_velocity, F64)
    p = partition_grid(gr)
    s = find_new_source_min(D.dist, p, "Boundary_1")
    assert p.id[s] == "Boundary_1"
    b1 = np.flatnonzero(p.id == "Boundary_1")
    assert D.dist[s] == D.dist[b1].min()


def test_halo_slot_map_multiplicity(tiny_annulus, tiny_velocity):
    """The node-level halo collapses to per-slot maps with small true
    multiplicity (~2: each original slot pairs with two twin slots).
    Regression: theta-duplicate (dst, src) slot pairs must be deduped
    BEFORE sizing K, else K balloons to ~ntheta and the staged kernel's
    twin gather blows up 45-180x."""
    from raytracer_tpu.ops.circulant import build_circulant
    from raytracer_tpu.ops.wrapped_t import pack_twrapped_stencil
    from raytracer_tpu.solvers.multiphase import _halo_slot_map

    gr, A, halo = tiny_annulus
    cg = build_circulant(gr, A, halo, tiny_velocity, dtype=np.float64)
    ws = pack_twrapped_stencil(cg, dtype=np.float64, band_closure=0)
    hm = _halo_slot_map(cg, ws, halo)
    assert hm.ndim == 2 and hm.shape[1] == ws.ML
    assert hm.shape[0] <= 4  # true multiplicity, not ntheta
    # every node-level twin link is represented in some row
    m_dst = cg.cmap.m_of[halo[:, 1]]
    m_src = cg.cmap.m_of[halo[:, 0]]
    for a, b in set(zip(m_dst.tolist(), m_src.tolist())):
        assert (hm[:, a] == b).any(), (a, b)
    # identity where no twin
    twinless = np.setdiff1d(np.arange(ws.ML), m_dst)
    np.testing.assert_array_equal(hm[:, twinless],
                                  np.tile(twinless, (hm.shape[0], 1)))
