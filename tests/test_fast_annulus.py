"""O(M) analytic circulant builder vs the materialised build.

The fast path (models/fast_annulus.py) must produce the SAME stencil the
full `init_annulus` + `build_circulant` pipeline extracts - bit-for-bit
at f32 - plus a consistently tiled grid.  Reference anchor: the per-column
uniform build loop this generalises, src/GridAnnulus.jl:57-70.
"""
import numpy as np
import pytest

from raytracer_tpu import (
    AnnulusSolver,
    LinearInterpolation,
    R,
    build_circulant,
    closest_point,
    dual_velocity,
    init_annulus,
    init_annulus_circulant,
    interpolate_velocity,
    velocity_profile,
)


@pytest.fixture(scope="module")
def interp():
    prof = velocity_profile("ak135")
    return LinearInterpolation(prof.r, prof.Vp)


@pytest.fixture(scope="module")
def full_9032(interp):
    gr, A, halo = init_annulus(90, 32, spacing=20.0)
    return gr, A, halo


def _assert_stencil_equal(cg_ref, cg_fast):
    assert cg_ref.M == cg_fast.M
    assert cg_ref.n == cg_fast.n
    assert np.array_equal(cg_ref.src_flat, cg_fast.src_flat)
    assert np.array_equal(cg_ref.fan_slots, cg_fast.fan_slots)
    assert np.array_equal(cg_ref.fan_w, cg_fast.fan_w)
    assert np.array_equal(cg_ref.w, cg_fast.w), "weights not bit-equal"


def test_fast_stencil_bitequal_scalar(full_9032, interp):
    gr, A, halo = full_9032
    U = interpolate_velocity(gr.r, interp)
    cg_ref = build_circulant(gr, A, halo, U, dtype=np.float32)
    gr2, cg2, U2 = init_annulus_circulant(90, 32, spacing=20.0)
    _assert_stencil_equal(cg_ref, cg2)
    # tiled velocities equal the full-grid sampling on matching nodes
    assert np.array_equal(U[cg_ref.cmap.node_of], U2[cg2.cmap.node_of])
    assert U[cg_ref.cmap.center] == U2[cg2.cmap.center]


def test_fast_stencil_bitequal_dual(full_9032, interp):
    gr, A, halo = full_9032
    Ud = dual_velocity(gr.r, interp)
    cg_ref = build_circulant(gr, A, halo, Ud, dtype=np.float32)
    _, cg2, U2 = init_annulus_circulant(
        90, 32, spacing=20.0, velocity=lambda rr: dual_velocity(rr, interp))
    _assert_stencil_equal(cg_ref, cg2)
    assert U2.shape == (cg2.n, 2)


def test_fast_grid_geometry_matches(full_9032, interp):
    """Tiled node coordinates coincide with the full mesh's, slot by slot."""
    gr, A, halo = full_9032
    U = interpolate_velocity(gr.r, interp)
    cg_ref = build_circulant(gr, A, halo, U, dtype=np.float32)
    gr2, cg2, _ = init_annulus_circulant(90, 32, spacing=20.0)
    assert gr2.nnods == gr.nnods
    cmr, cmf = cg_ref.cmap, cg2.cmap
    for c in (0, 1, 45, 89):
        ir, if_ = cmr.node_of[:, c], cmf.node_of[:, c]
        np.testing.assert_allclose(gr.r[ir], gr2.r[if_], atol=1e-9)
        dth = np.abs(np.mod(gr.theta[ir], 2 * np.pi)
                     - np.mod(gr2.theta[if_], 2 * np.pi))
        dth = np.minimum(dth, 2 * np.pi - dth)
        assert dth.max() < 1e-9
        np.testing.assert_allclose(gr.x[ir], gr2.x[if_], atol=1e-6)
        np.testing.assert_allclose(gr.z[ir], gr2.z[if_], atol=1e-6)
        assert np.array_equal(gr.twin_class[ir], gr2.twin_class[if_])
    # centre node last, at the origin
    assert cmf.center == gr2.nnods - 1
    assert gr2.r[cmf.center] == 0.0


def test_fast_wedge_width_independence():
    _, cg8, _ = init_annulus_circulant(180, 63, spacing=20.0, wedge=8)
    _, cg12, _ = init_annulus_circulant(180, 63, spacing=20.0, wedge=12)
    _assert_stencil_equal(cg8, cg12)


def test_fast_solver_end_to_end(full_9032, interp):
    """AnnulusSolver(circulant=...) fixpoint == the materialised solve."""
    gr, A, halo = full_9032
    U = interpolate_velocity(gr.r, interp)
    s_ref = AnnulusSolver(gr, A, halo, U, method="circulant")
    src = closest_point(gr, 0.0, R, system="polar")
    d_ref = np.asarray(s_ref.solve(src, want_prev=False).dist)

    gr2, cg2, U2 = init_annulus_circulant(90, 32, spacing=20.0)
    s_fast = AnnulusSolver(gr2, None, None, U2, method="circulant",
                           circulant=cg2)
    src2 = closest_point(gr2, 0.0, R, system="polar")
    d_fast = np.asarray(s_fast.solve(src2, want_prev=False).dist)

    dr = d_ref[s_ref.circulant.cmap.node_of]
    df = d_fast[cg2.cmap.node_of]
    assert np.abs(dr - df).max() == 0.0
    assert (d_ref[s_ref.circulant.cmap.center]
            == d_fast[cg2.cmap.center])


def test_fast_prev_recovery(full_9032, interp):
    """Device prev recovery works off the fast-built stencil (no A/halo)."""
    gr2, cg2, U2 = init_annulus_circulant(90, 32, spacing=20.0)
    s = AnnulusSolver(gr2, None, None, U2, method="circulant", circulant=cg2)
    src = closest_point(gr2, 0.0, R, system="polar")
    D = s.solve(src, want_prev=True)
    prev = np.asarray(D.prev)
    assert prev[src] == src
    # walking prev from a far receiver reaches the source
    rec = closest_point(gr2, np.pi, R, system="polar")
    i, hops = rec, 0
    while i != src and hops < gr2.nnods:
        nxt = int(prev[i])
        assert nxt != i, "stuck before reaching the source"
        i = nxt
        hops += 1
    assert i == src


def test_fast_rejects_materialised_methods():
    gr2, cg2, U2 = init_annulus_circulant(90, 32, spacing=20.0)
    with pytest.raises(ValueError):
        AnnulusSolver(gr2, None, None, U2, method="ell", circulant=cg2)
