"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""
import jax
import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig
from raytracer_tpu.parallel import make_mesh, pad_sources, travel_time_table

F64 = SolverConfig(dtype="float64")


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_pad_sources():
    out = pad_sources(np.array([3, 4, 5]), 8)
    assert len(out) == 8
    assert list(out[:3]) == [3, 4, 5]
    assert np.all(out[3:] == 5)


def test_sharded_table_matches_single_solves(tiny_annulus, tiny_velocity):
    gr, A, halo = tiny_annulus
    g = rt.prepare(A, halo, gr, tiny_velocity, F64)
    mesh = make_mesh()
    degs = [0.0, 20.0, 45.0, 90.0, 135.0]
    sources = [rt.closest_point(gr, np.deg2rad(d), R, system="polar") for d in degs]
    receivers = [rt.closest_point(gr, np.deg2rad(d), R, system="polar") for d in (30.0, 60.0, 180.0)]

    table = travel_time_table(g, sources, receivers, F64, mesh)
    assert table.shape == (len(sources), len(receivers))

    for i, s in enumerate(sources):
        single = rt.solve(g, s, F64)
        np.testing.assert_allclose(table[i], single.dist[np.asarray(receivers)], rtol=1e-12)


def test_reciprocity(tiny_annulus, tiny_velocity):
    """Travel time source->receiver equals receiver->source (symmetric
    weights), a physical consistency check on the sharded path."""
    gr, A, halo = tiny_annulus
    g = rt.prepare(A, halo, gr, tiny_velocity, F64)
    a = rt.closest_point(gr, np.deg2rad(10.0), R, system="polar")
    b = rt.closest_point(gr, np.deg2rad(110.0), R, system="polar")
    table = travel_time_table(g, [a, b], [a, b], F64, make_mesh())
    np.testing.assert_allclose(table[0, 1], table[1, 0], rtol=1e-10)


def test_sharded_circulant_table(tiny_annulus, tiny_velocity):
    from raytracer_tpu.ops.circulant import build_circulant
    from raytracer_tpu.parallel import travel_time_table_circulant

    gr, A, halo = tiny_annulus
    cg = build_circulant(gr, A, halo, tiny_velocity, dtype=np.float64)
    mesh = make_mesh()
    sources = [rt.closest_point(gr, np.deg2rad(d), R, system="polar") for d in (0.0, 60.0, 120.0)]
    receivers = [rt.closest_point(gr, np.deg2rad(d), R, system="polar") for d in (30.0, 180.0)]
    table = travel_time_table_circulant(cg, sources, receivers, F64, mesh)
    assert table.shape == (3, 2)
    g = rt.prepare(A, halo, gr, tiny_velocity, F64)
    ref = travel_time_table(g, sources, receivers, F64, mesh)
    np.testing.assert_allclose(table, ref, rtol=1e-12, atol=1e-9)


def test_sharded_twrapped_table(tiny_annulus, tiny_velocity):
    # production Pallas kernel inside each shard (interpret mode on the
    # virtual CPU mesh), uneven source count incl. the centre node
    from raytracer_tpu.ops.circulant import build_circulant
    from raytracer_tpu.parallel import travel_time_table, travel_time_table_twrapped

    gr, A, halo = tiny_annulus
    F32 = SolverConfig(dtype="float32")
    cg = build_circulant(gr, A, halo, tiny_velocity, dtype=np.float32)
    mesh = make_mesh()
    sources = [rt.closest_point(gr, np.deg2rad(d), R, system="polar")
               for d in (0.0, 60.0, 120.0, 250.0, 333.0)]
    sources.append(cg.cmap.center)
    receivers = [rt.closest_point(gr, np.deg2rad(d), R, system="polar")
                 for d in (30.0, 180.0)]
    receivers.append(cg.cmap.center)
    table = travel_time_table_twrapped(cg, sources, receivers, F32, mesh,
                                       interpret=True)
    assert table.shape == (len(sources), len(receivers))
    g = rt.prepare(A, halo, gr, tiny_velocity, F32)
    ref = travel_time_table(g, sources, receivers, F32, mesh)
    np.testing.assert_allclose(table, ref, rtol=1e-5, atol=5e-3)


def test_sharded_sweep_table(tiny_annulus, tiny_velocity):
    # directional-sweep solver inside each shard (radial Pallas kernels
    # in interpret mode on the virtual CPU mesh), uneven source count
    from raytracer_tpu.ops.circulant import build_circulant
    from raytracer_tpu.parallel import travel_time_table, travel_time_table_sweep

    gr, A, halo = tiny_annulus
    F32 = SolverConfig(dtype="float32")
    cg = build_circulant(gr, A, halo, tiny_velocity, dtype=np.float32)
    mesh = make_mesh()
    sources = [rt.closest_point(gr, np.deg2rad(d), R, system="polar")
               for d in (0.0, 60.0, 120.0, 250.0, 333.0)]
    sources.append(cg.cmap.center)
    receivers = [rt.closest_point(gr, np.deg2rad(d), R, system="polar")
                 for d in (30.0, 180.0)]
    receivers.append(cg.cmap.center)
    table = travel_time_table_sweep(cg, sources, receivers, F32, mesh,
                                    interpret=True)
    assert table.shape == (len(sources), len(receivers))
    g = rt.prepare(A, halo, gr, tiny_velocity, F32)
    ref = travel_time_table(g, sources, receivers, F32, mesh)
    np.testing.assert_allclose(table, ref, rtol=1e-5, atol=5e-3)


def test_sharded_3d_table():
    # sharded multi-source 3-D table vs per-source solve3d (both engines;
    # pallas in interpret mode on the virtual CPU mesh), uneven sources
    from raytracer_tpu.models.grid3d import grid3d, nodal_incidence3d
    from raytracer_tpu.parallel import travel_time_table_3d
    from raytracer_tpu.solvers.solve3d import prepare3d, solve3d

    c0 = (np.deg2rad(70.0), np.deg2rad(70.0), R - 2000.0)
    c1 = (np.deg2rad(110.0), np.deg2rad(110.0), R)
    g = grid3d(c0, c1, (6, 6, 5))
    prof = rt.velocity_profile()
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = interp(g.r)
    packed = prepare3d(g, U, F64)
    sources = [0, 17, len(g) // 2, len(g) - 1, 33]   # 5 on 8 devices
    recs = [1, len(g) // 3, len(g) - 2]
    ref, _ = solve3d(g, U, sources, F64, receivers=recs, _packed=packed)

    mesh = make_mesh()
    tab = travel_time_table_3d(packed, sources, recs, F64, mesh)
    assert tab.shape == (len(sources), len(recs))
    np.testing.assert_allclose(tab, ref, rtol=1e-9, atol=1e-6)

    tab_p = travel_time_table_3d(packed, sources, recs, F64, mesh,
                                 engine="pallas", interpret=True)
    np.testing.assert_allclose(tab_p, ref, rtol=1e-9, atol=1e-6)

    tab_s = travel_time_table_3d(packed, sources, recs, F64, mesh,
                                 engine="sweep")
    np.testing.assert_allclose(tab_s, ref, rtol=1e-9, atol=1e-6)


def test_locate_with_sharded_station_fields(tiny_annulus, tiny_velocity):
    """The locator consumes station fields produced by the SHARDED
    circulant table (stations sharded over the mesh) and recovers an
    on-grid event exactly — the location layer rides the distributed
    path end to end."""
    from raytracer_tpu.ops.circulant import build_circulant
    from raytracer_tpu.parallel import travel_time_table_circulant
    from raytracer_tpu.solvers.locate import locate

    gr, A, halo = tiny_annulus
    stations = [rt.closest_point(gr, np.deg2rad(d), R, system="polar")
                for d in (0.0, 70.0, 150.0, 230.0, 310.0)]
    cg = build_circulant(gr, A, halo, tiny_velocity, dtype=np.float64)
    fields = np.asarray(
        travel_time_table_circulant(cg, stations, np.arange(gr.nnods),
                                    F64, make_mesh()), np.float64)
    solver = rt.AnnulusSolver(gr, A, halo, tiny_velocity, F64,
                              method="circulant")
    true = rt.closest_point(gr, np.deg2rad(120.0), R - 900.0,
                            system="polar")
    t_obs = fields[:, true] + 3.0
    loc = locate(solver, stations, t_obs, refine=False, fields=fields)
    xy = np.array([gr.x[loc.node], gr.z[loc.node]])
    np.testing.assert_allclose(xy, [gr.x[true], gr.z[true]], atol=1.0)
    assert abs(loc.t0 - 3.0) < 1e-6


def test_sharded_bend_matches_batch(tiny_annulus, tiny_velocity):
    """refine_paths_sharded == refine_paths_batch on the 8-device mesh:
    the bend stage of the refined table shards over the source axis
    with zero collectives (paths independent); padding rows dropped."""
    from raytracer_tpu.parallel import refine_paths_sharded

    gr, A, halo = tiny_annulus
    solver = rt.AnnulusSolver(gr, A, halo, tiny_velocity, F64,
                              method="circulant")
    prof = rt.velocity_profile("ak135")
    src = rt.closest_point(gr, 0.0, R, system="polar")
    D = solver.solve(src)
    recs = [rt.closest_point(gr, np.deg2rad(d), R, system="polar")
            for d in (30.0, 60.0, 90.0, 120.0, 150.0)]   # 5 paths: pads to 8
    pts = [np.stack([gr.x[p], gr.z[p]], axis=1)
           for p in (rt.recontruct_path(D.prev, src, r) for r in recs)]
    kw = dict(m=48, iters=150, lr=3.0, quad=8)
    Pb, tb = rt.refine_paths_batch(pts, prof.r, prof.Vp, **kw)
    Ps, ts = refine_paths_sharded(pts, prof.r, prof.Vp,
                                  mesh=make_mesh(), **kw)
    assert ts.shape == (5,) and Ps.shape == Pb.shape
    np.testing.assert_allclose(ts, tb, rtol=1e-6)
    np.testing.assert_allclose(Ps, Pb, rtol=1e-5, atol=1e-5)
