"""Multi-source travel-time tables, sharded across TPU chips.

The reference runs one source per solve and loops serially
(benchmarks/gpu.jl:61-63).  Here sources are vmapped on-chip and the
source batch is sharded over a 1-D device mesh with `shard_map`; the BFM
while_loop contains NO collectives, so each chip converges independently
(its local frontier empties) and the ICI is touched only by the final
travel-time gather.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import DEFAULT_SOLVER_CONFIG, SolverConfig
from ..ops.relax import BFMState, DeviceGraph, bfm_step, init_state
from .mesh import SOURCE_AXIS, make_mesh, pad_sources


def _solve_block(g: DeviceGraph, sources: jax.Array, max_iters: int, dtype) -> BFMState:
    """Vmapped multi-source solve for one shard (no cross-device ops)."""
    state = jax.vmap(lambda s: init_state(g, s, dtype))(sources)

    def cond(s: BFMState):
        return jnp.any(s.front) & (s.it[0] < max_iters)

    def body(s: BFMState):
        return jax.vmap(lambda st: bfm_step(st, g))(s)

    return jax.lax.while_loop(cond, body, state)


@functools.partial(jax.jit, static_argnames=("max_iters", "dtype_name", "mesh"))
def _sharded_solve(g: DeviceGraph, sources: jax.Array, max_iters: int, dtype_name: str, mesh: Mesh):
    dtype = jnp.dtype(dtype_name)
    fn = jax.shard_map(
        lambda gg, ss: _solve_block(gg, ss, max_iters, dtype),
        mesh=mesh,
        in_specs=(P(), P(SOURCE_AXIS)),
        out_specs=P(SOURCE_AXIS),
        check_vma=False,
    )
    return fn(g, sources)


def solve_sharded(
    g: DeviceGraph,
    sources: Sequence[int],
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    mesh: Optional[Mesh] = None,
) -> BFMState:
    """Solve a batch of sources sharded over the mesh; returns device state
    with a leading (padded) source axis."""
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    padded = pad_sources(np.asarray(sources), n_dev)
    return _sharded_solve(g, jnp.asarray(padded), config.max_iters, config.dtype, mesh)


def travel_time_table(
    g: DeviceGraph,
    sources: Sequence[int],
    receivers: Sequence[int],
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    mesh: Optional[Mesh] = None,
) -> np.ndarray:
    """(n_sources, n_receivers) travel-time table.

    BASELINE config #4: batched travel-time table, sources sharded across
    chips, zero collectives in the inner loop.
    """
    sources = np.asarray(sources)
    st = solve_sharded(g, sources, config, mesh)
    dist = st.dist  # (padded_sources, n_pad), sharded
    table = dist[:, jnp.asarray(np.asarray(receivers), jnp.int32)]
    return np.asarray(table)[: len(sources)]


def travel_time_table_twrapped(
    cg,
    sources: Sequence[int],
    receivers: Sequence[int],
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    mesh: Optional[Mesh] = None,
    interpret: bool = False,
    _packed=None,
) -> np.ndarray:
    """Sharded travel-time table running the production theta-major
    Pallas kernel (ops/wrapped_t.py) inside each shard.

    Sources shard over the 1-D mesh; every chip runs its local source
    block through the full-iteration kernel (initial state built on
    device from the source descriptors, receivers extracted in-shard) -
    zero collectives anywhere.  `interpret=True` runs the kernel's
    interpret mode for virtual CPU-mesh validation.
    """
    from ..ops.wrapped_t import (_extract_arrays, _solve_twrapped_jit,
                                 _textract_jit, pack_twrapped_stencil,
                                 supports_twrapped)

    if not supports_twrapped(cg):
        raise ValueError("theta-major kernel unsupported for this ntheta")
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    dtype = jnp.dtype(config.dtype)
    ws = _packed if _packed is not None else pack_twrapped_stencil(
        cg, dtype=dtype, band_closure=config.band_closure)
    cmap = cg.cmap

    sources = np.asarray(sources)
    padded = pad_sources(sources, n_dev)
    S_local = len(padded) // n_dev
    is_cen = padded == cmap.center
    src_m = np.where(is_cen, 0, cmap.m_of[padded]).astype(np.int32)
    src_c = np.where(is_cen, 0, cmap.c_of[padded]).astype(np.int32)

    m_idx, c_idx, center_mask, valid = _extract_arrays(cmap, receivers)
    jm, jc = jnp.asarray(m_idx), jnp.asarray(c_idx)
    jcm, jv = jnp.asarray(center_mask), jnp.asarray(valid)
    wrows, rf, rb = map(jnp.asarray, (ws.wrows, ws.ring_f, ws.ring_b))
    cfl, cbl, fan = map(jnp.asarray, (ws.cfl, ws.cbl, ws.fan_w))
    tol = jnp.asarray(config.tol_value(), dtype)

    def solve_block(sm, sc, scen):
        st = _solve_twrapped_jit(
            sm, sc, scen, wrows, rf, rb, cfl, cbl, fan, tol,
            ws.Mp, ws.ML, ws.NTT, ws.nt, ws.maxdm,
            config.max_iters, 4, interpret, S_local)
        return _textract_jit(st.dist, st.dcen, st.it, jm, jc, jcm, jv,
                             S_local, ws.NTT)

    fn = jax.jit(jax.shard_map(
        solve_block,
        mesh=mesh,
        in_specs=(P(SOURCE_AXIS),) * 3,
        out_specs=P(SOURCE_AXIS),
        check_vma=False,
    ))
    vals = np.asarray(fn(jnp.asarray(src_m), jnp.asarray(src_c),
                         jnp.asarray(is_cen)))
    return vals[: len(sources), :-1]


def travel_time_table_stream(
    cg,
    sources: Sequence[int],
    receivers: Sequence[int],
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    mesh: Optional[Mesh] = None,
    interpret: bool = False,
    warm_levels: int = 0,
    _packed=None,
) -> np.ndarray:
    """Sharded travel-time table on the streamed theta-major path
    (ops/stream_t.py) - the >=1M-node engine, optionally warm-started.

    Sources shard over the 1-D mesh; each chip runs its local block
    through the streamed solve (XLA scans + theta-blocked band kernel)
    with in-shard receiver extraction - zero collectives anywhere."""
    from ..ops.stream_t import _solve_stream_jit, _stream_tables
    from ..ops.stream_t import _warm_stencils
    from ..ops.wrapped_t import (_extract_arrays, _textract_jit,
                                 pack_twrapped_stencil)

    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    dtype = jnp.dtype(config.dtype)
    ws = _packed if _packed is not None else pack_twrapped_stencil(
        cg, dtype=dtype, band_closure=config.band_closure)
    cmap = cg.cmap

    levels = [ws]
    if warm_levels:
        levels += _warm_stencils(ws, cg, dtype, config.band_closure,
                                 warm_levels)
    tbls, statics = zip(*(_stream_tables(w, dtype) for w in levels))

    sources = np.asarray(sources)
    padded = pad_sources(sources, n_dev)
    S_local = len(padded) // n_dev
    is_cen = padded == cmap.center
    src_m = np.where(is_cen, 0, cmap.m_of[padded]).astype(np.int32)
    src_c = np.where(is_cen, 0, cmap.c_of[padded]).astype(np.int32)

    m_idx, c_idx, center_mask, valid = _extract_arrays(cmap, receivers)
    jm, jc = jnp.asarray(m_idx), jnp.asarray(c_idx)
    jcm, jv = jnp.asarray(center_mask), jnp.asarray(valid)
    tol = jnp.asarray(config.tol_value(), dtype)
    tol_c = jnp.asarray(max(config.tol_value(), 0.05), dtype)
    nt, ML = ws.nt, ws.ML
    from ..ops.diag_circulant import LANES, SUB

    def solve_block(sm, sc, scen):
        st = _solve_stream_jit(
            sm, sc, scen, tuple(tbls), tol, tol_c, tuple(statics),
            config.max_iters, interpret, S_local)
        cen2d = jnp.broadcast_to(jnp.repeat(st.cen, LANES)[None, :],
                                 (SUB, S_local * LANES))
        return _textract_jit(st.dist.reshape(S_local * nt, ML), cen2d,
                             st.it, jm, jc, jcm, jv, S_local, nt)

    fn = jax.jit(jax.shard_map(
        solve_block,
        mesh=mesh,
        in_specs=(P(SOURCE_AXIS),) * 3,
        out_specs=P(SOURCE_AXIS),
        check_vma=False,
    ))
    vals = np.asarray(fn(jnp.asarray(src_m), jnp.asarray(src_c),
                         jnp.asarray(is_cen)))
    return vals[: len(sources), :-1]


def travel_time_table_sweep(
    cg,
    sources: Sequence[int],
    receivers: Sequence[int],
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    mesh: Optional[Mesh] = None,
    interpret: bool = False,
    _packed=None,
) -> np.ndarray:
    """Sharded travel-time table on the directional-sweep solver
    (ops/sweep_theta.py) - ~3-4 rounds per solve at any grid size.

    Sources shard over the 1-D mesh; each chip runs its local block
    through the hclosure round structure (radial Pallas sweeps + XLA
    closure scans) with in-shard receiver extraction - zero collectives
    anywhere.  `interpret=True` runs the radial kernels' interpret mode
    for virtual CPU-mesh validation."""
    from ..ops.diag_circulant import LANES, SUB
    from ..ops.sweep_theta import (_solve_sweep_pallas_jit,
                                   pack_rsweep_tables, pack_sweep_tables)
    from ..ops.wrapped_t import (_extract_arrays, _textract_jit,
                                 pack_twrapped_stencil)

    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    dtype = jnp.dtype(config.dtype)
    # the sweep tables are rebuilt from the raw decomposition: the
    # shared stencil must be packed closure-free
    ws = _packed if _packed is not None else pack_twrapped_stencil(
        cg, dtype=dtype, band_closure=0)
    tbl, static = pack_sweep_tables(ws, cg, dtype)
    (wtab_dn, wtab_up), rst = pack_rsweep_tables(ws, cg, dtype)
    cmap = cg.cmap

    sources = np.asarray(sources)
    padded = pad_sources(sources, n_dev)
    S_local = len(padded) // n_dev
    is_cen = padded == cmap.center
    src_m = np.where(is_cen, 0, cmap.m_of[padded]).astype(np.int32)
    src_c = np.where(is_cen, 0, cmap.c_of[padded]).astype(np.int32)

    m_idx, c_idx, center_mask, valid = _extract_arrays(cmap, receivers)
    jm, jc = jnp.asarray(m_idx), jnp.asarray(c_idx)
    jcm, jv = jnp.asarray(center_mask), jnp.asarray(valid)
    tol = jnp.asarray(config.tol_value(), dtype)
    nt, ML = static.nt, static.ML

    def solve_block(sm, sc, scen):
        st = _solve_sweep_pallas_jit(sm, sc, scen, tbl, wtab_dn, wtab_up,
                                     tol, static, rst, config.max_iters,
                                     S_local, interpret)
        cen2d = jnp.broadcast_to(jnp.repeat(st.cen, LANES)[None, :],
                                 (SUB, S_local * LANES))
        return _textract_jit(st.dist.reshape(S_local * nt, ML), cen2d,
                             st.it, jm, jc, jcm, jv, S_local, nt)

    fn = jax.jit(jax.shard_map(
        solve_block,
        mesh=mesh,
        in_specs=(P(SOURCE_AXIS),) * 3,
        out_specs=P(SOURCE_AXIS),
        check_vma=False,
    ))
    vals = np.asarray(fn(jnp.asarray(src_m), jnp.asarray(src_c),
                         jnp.asarray(is_cen)))
    return vals[: len(sources), :-1]


def travel_time_table_3d(
    packed,
    sources: Sequence[int],
    receivers: Sequence[int],
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    mesh: Optional[Mesh] = None,
    engine: str = "xla",
    scan_every: int = None,
    sweeps: int = 8,
    interpret: bool = False,
) -> np.ndarray:
    """Sharded multi-source 3-D travel-time table (BASELINE #5 scaled
    over chips — the workload of reference src/Dijsktra.jl:459-481,
    which ran one source per CUDA launch on one GPU).

    `packed` is a solvers.solve3d.Packed3D.  Sources shard over the 1-D
    mesh; each chip runs its local sources sequentially (lax.map — one
    (n2, n1, n0) field resident per chip at a time) through the 26-tap
    sweep while_loop with in-shard receiver extraction, so the ICI/host
    traffic is the (S, n_receivers) table only.  engine='xla' is the
    pure-jnp sweep (compiles per chip anywhere); engine='pallas' runs
    the multi-sweep kernel (ops/sweep3d.py), with `interpret=True` for
    virtual CPU-mesh validation; engine='sweep' the directional
    plane-sweep solver (~2-3 rounds).  Zero collectives anywhere.
    """
    from ..solvers.solve3d import (_solve3d_jit, _solve3d_kernel_jit,
                                   _solve3d_sweep_jit)

    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    dtype = jnp.dtype(config.dtype)
    sources = np.asarray(sources)
    padded = pad_sources(sources, n_dev)
    ridx = jnp.asarray(np.asarray(receivers, dtype=np.int32).ravel())
    tol = jnp.asarray(config.tol_value(), dtype)
    if scan_every is None:
        scan_every = 0 if engine == "pallas" else 8

    if engine == "pallas":
        plan = packed.plan
        W = jnp.asarray(plan.W4)
        statics = (plan.n1, plan.BR, plan.NB, plan.L0, plan.H8, packed.shape)

        def one(src):
            st = _solve3d_kernel_jit(src, W, packed.scan_costs, tol,
                                     statics, config.max_iters, scan_every,
                                     sweeps, interpret)
            return st.dist.reshape(-1)[ridx]
    elif engine == "xla":
        W = jnp.asarray(packed.W_np)

        def one(src):
            st = _solve3d_jit(src, W, packed.scan_costs, tol,
                              config.max_iters, scan_every)
            return st.dist.reshape(-1)[ridx]
    elif engine == "sweep":
        W = jnp.asarray(packed.W_np)

        def one(src):
            st = _solve3d_sweep_jit(src[None], W, packed.scan_costs, tol,
                                    config.max_iters, (0, 1, 2), 1)
            return st.dist[0].reshape(-1)[ridx]
    else:
        raise ValueError(f"unknown engine {engine!r}")

    fn = jax.jit(jax.shard_map(
        lambda srcs: jax.lax.map(one, srcs),
        mesh=mesh,
        in_specs=(P(SOURCE_AXIS),),
        out_specs=P(SOURCE_AXIS),
        check_vma=False,
    ))
    vals = np.asarray(fn(jnp.asarray(padded, jnp.int32)))
    return vals[: len(sources)]


def travel_time_table_circulant(
    cg,
    sources: Sequence[int],
    receivers: Sequence[int],
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    mesh: Optional[Mesh] = None,
) -> np.ndarray:
    """Sharded travel-time table on the circulant layout.

    Sources shard over the mesh; each shard runs the jnp circulant
    while_loop independently (no collectives).  `cg` is a CirculantGraph
    from ops.circulant.build_circulant.
    """
    from ..ops.circulant import _circ_step, CircState

    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    sources = np.asarray(sources)
    padded = pad_sources(sources, n_dev)

    cmap = cg.cmap
    M, nt = cmap.M, cmap.ntheta
    dtype = jnp.dtype(config.dtype)
    src_flat = jnp.asarray(cg.src_flat)
    w = jnp.asarray(cg.w)
    fan_slots = jnp.asarray(cg.fan_slots)
    fan_w = jnp.asarray(cg.fan_w)
    max_iters = config.max_iters

    # per-source initial states (host; small)
    S = len(padded)
    dist0 = np.full((S, M, nt), np.inf, dtype=dtype)
    dcen0 = np.full((S,), np.inf, dtype=dtype)
    for i, s in enumerate(padded):
        if s == cmap.center:
            dcen0[i] = 0.0
        else:
            dist0[i, cmap.m_of[s], cmap.c_of[s]] = 0.0

    def solve_block(d0, c0):
        def one(d, c):
            st = CircState(d, c, jnp.asarray(True), jnp.zeros((), jnp.int32))

            def cond(s):
                return s.changed & (s.it < max_iters)

            def body(s):
                return _circ_step(s, src_flat, w, fan_slots, fan_w)

            out = jax.lax.while_loop(cond, body, st)
            return out.dist, out.dcen

        return jax.vmap(one)(d0, c0)

    fn = jax.jit(jax.shard_map(
        solve_block,
        mesh=mesh,
        in_specs=(P(SOURCE_AXIS), P(SOURCE_AXIS)),
        out_specs=(P(SOURCE_AXIS), P(SOURCE_AXIS)),
        check_vma=False,
    ))
    dist, dcen = fn(jnp.asarray(dist0), jnp.asarray(dcen0))

    receivers = np.asarray(receivers)
    dist_np = np.asarray(dist)[: len(sources)]
    out = np.empty((len(sources), len(receivers)))
    for j, r in enumerate(receivers):
        if r == cmap.center:
            out[:, j] = np.asarray(dcen)[: len(sources)]
        else:
            out[:, j] = dist_np[:, cmap.m_of[r], cmap.c_of[r]]
    return out
