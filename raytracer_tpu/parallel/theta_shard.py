"""Theta-sharded (domain-decomposed) directional-sweep solve.

`parallel/multisource.py` shards the SOURCE batch -- embarrassingly
parallel, zero collectives, but bounded by one chip's HBM/VMEM per
field.  This module shards the GRID itself: the annulus' theta axis is
split into contiguous column blocks across a 1-D device mesh, and each
Gauss-Seidel round exchanges a +-2-column halo with the ring neighbours
(`jax.lax.ppermute`) -- the capability class the reference lacks
entirely (SURVEY.md section 5: no distributed backend; the reference's
halo is an intra-device twin table, src/GridAnnulus.jl:943-950).

Algorithm: block Gauss-Seidel over device blocks (the multi-chip
analogue of the lane-blocked intra-chip sweeps of PERF_NOTES round 3p).
Per round, on every device in parallel:

  1. ppermute the two boundary columns each way (the stencil's theta
     reach is +-2 -- ops/circulant.py), a ring exchange that also
     realises the annulus' periodic wrap exactly;
  2. centre-fan settle with a global `lax.pmin` (the core point is a
     single shared node);
  3. forward in-block column sweep (lax.scan) seeded with the LEFT
     neighbour's halo as the scan carry, then a backward sweep seeded
     with the RIGHT halo -- inside a block this is the same sequential
     Gauss-Seidel as ops/sweep_theta.py (`_sweep(carry_init=...)`);
  4. global convergence vote: `psum` of the per-block improved flags.

Exactness: every candidate is a real path cost (stencil edges and
min-plus chain compositions), iterates decrease monotonically, and a
round that changes nothing anywhere means every stencil edge is
satisfied -- the same fixpoint as the single-device engines; equality
is pinned by tests/test_theta_shard.py on the virtual CPU mesh and by
__graft_entry__.dryrun_multichip.

Scaling story: per-device memory is O(nt/D * ML) for the field while
the (replicated) stencil tables are O(ML) -- fields beyond one chip's
HBM become solvable.  Per round the ICI moves 4*S*ML floats per device
boundary (two columns each way); at 8640x2400 (ML=8192) and S=8 that is
1 MB/boundary/round against ~45 MB of per-round field traffic -- the
halo rides ICI in the noise.  Convergence costs a couple of extra
rounds versus the single-device sweep (block-Jacobi staleness between
blocks), measured 4 -> 5-7 rounds at the test sizes.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import DEFAULT_SOLVER_CONFIG, SolverConfig
from ..ops.circulant import CirculantGraph
from ..ops.diag_wrapped import LANES, SUB, _extract_cached
from ..ops.sweep_theta import (SweepState, _sweep, pack_sweep_tables)
from ..ops.wrapped_t import _textract_jit, pack_twrapped_stencil

THETA_AXIS = "theta"
SRC_AXIS = "src"


def make_theta_mesh(devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (THETA_AXIS,))


def make_grid_mesh(d_src: int, d_theta: Optional[int] = None,
                   devices=None) -> Mesh:
    """2-D (source, theta) device mesh: rows shard the source batch
    (zero inter-row collectives), columns shard the theta axis (ring
    halo inside each row).  The scaling-book composition: DP over
    sources x domain decomposition over the grid."""
    devices = list(devices if devices is not None else jax.devices())
    if d_theta is None:
        if len(devices) % d_src:
            raise ValueError(f"{len(devices)} devices not divisible by "
                             f"d_src={d_src}")
        d_theta = len(devices) // d_src
    arr = np.array(devices[: d_src * d_theta]).reshape(d_src, d_theta)
    return Mesh(arr, (SRC_AXIS, THETA_AXIS))


def _block_fn(static, max_rounds: int, D: int):
    """Per-device block Gauss-Seidel solve closure; all collectives are
    scoped to THETA_AXIS, so the same block serves the 1-D theta mesh
    and each row of the 2-D (source, theta) mesh unchanged."""
    nt, ML = static.nt, static.ML
    ntl = nt // D
    perm_fwd = [(i, (i + 1) % D) for i in range(D)]   # send right
    perm_bwd = [((i + 1) % D, i) for i in range(D)]   # send left

    def block(tbl, src_m, src_c, src_cen, tol):
        dtype = tbl.wg[0].dtype
        inf = jnp.asarray(jnp.inf, dtype)
        zero = jnp.zeros((), dtype)
        fan = tbl.fan_w[None, None, :]
        fan_in = tbl.fan_in[None, None, :]
        bid = jax.lax.axis_index(THETA_AXIS)
        col = bid * ntl + jnp.arange(ntl, dtype=jnp.int32)[None, :, None]
        lane = jnp.arange(ML, dtype=jnp.int32)[None, None, :]
        v0 = jnp.where((col == src_c[:, None, None])
                       & (lane == src_m[:, None, None])
                       & (~src_cen[:, None, None]), zero, inf)
        cen0 = jnp.where(src_cen, zero, inf)

        def rnd(state: SweepState) -> SweepState:
            v, cen = state.dist, state.cen
            # centre fan (global: the core point is shared)
            cen_loc = jnp.min(v + fan_in, axis=(1, 2))
            cen = jnp.minimum(cen, jax.lax.pmin(cen_loc, THETA_AXIS))
            v = jnp.minimum(v, cen[:, None, None] + fan)
            # +-2-column ring halo exchange (also the periodic wrap)
            left = jax.lax.ppermute(v[:, -2:, :], THETA_AXIS, perm_fwd)
            right = jax.lax.ppermute(v[:, :2, :], THETA_AXIS, perm_bwd)
            v = _sweep(v, tbl, static, reverse=False,
                       carry_init=(left[:, 1], left[:, 0]))
            v = _sweep(v, tbl, static, reverse=True,
                       carry_init=(right[:, 0], right[:, 1]))
            changed_loc = (jnp.any(v < state.dist - tol)
                           | jnp.any(cen < state.cen - tol))
            changed = jax.lax.psum(
                changed_loc.astype(jnp.int32), THETA_AXIS) > 0
            return SweepState(v, cen, changed, state.it + 1)

        def cond(s: SweepState):
            return s.changed & (s.it < max_rounds)

        st = jax.lax.while_loop(
            cond, rnd, SweepState(v0, cen0, jnp.asarray(True),
                                  jnp.zeros((), jnp.int32)))
        cen_loc = jnp.min(st.dist + fan_in, axis=(1, 2))
        cen = jnp.minimum(st.cen, jax.lax.pmin(cen_loc, THETA_AXIS))
        v = jnp.minimum(st.dist, cen[:, None, None] + fan)
        return SweepState(v, cen, st.changed, st.it)

    return block


@functools.partial(jax.jit,
                   static_argnames=("static", "max_rounds", "S", "mesh"))
def _solve_theta_sharded_jit(src_m, src_c, src_cen, tbl, tol, static,
                             max_rounds: int, S: int, mesh: Mesh):
    """Sharded solve: returns SweepState with the GLOBAL (S, nt, ML)
    field (theta-sharded on device) and the round count."""
    block = _block_fn(static, max_rounds, mesh.devices.size)
    fn = jax.shard_map(
        block, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=SweepState(P(None, THETA_AXIS, None), P(), P(), P()),
        check_vma=False,
    )
    return fn(tbl, src_m, src_c, src_cen, tol)


@functools.partial(jax.jit,
                   static_argnames=("static", "max_rounds", "S", "mesh"))
def _solve_mesh_sharded_jit(src_m, src_c, src_cen, tbl, tol, static,
                            max_rounds: int, S: int, mesh: Mesh):
    """2-D (source, theta) sharded solve: each source-row of the mesh
    runs the theta-ring block solve on its slice of the batch; rows
    never communicate (their while_loops run independent trip counts —
    legal because every collective is scoped to THETA_AXIS).  changed/it
    come back per-source-row as (S,) arrays."""
    block = _block_fn(static, max_rounds, mesh.shape[THETA_AXIS])

    def block2(tbl, src_m, src_c, src_cen, tol):
        st = block(tbl, src_m, src_c, src_cen, tol)
        s_loc = src_m.shape[0]
        return SweepState(st.dist, st.cen,
                          jnp.broadcast_to(st.changed[None], (s_loc,)),
                          jnp.broadcast_to(st.it[None], (s_loc,)))

    fn = jax.shard_map(
        block2, mesh=mesh,
        in_specs=(P(), P(SRC_AXIS), P(SRC_AXIS), P(SRC_AXIS), P()),
        out_specs=SweepState(P(SRC_AXIS, THETA_AXIS, None), P(SRC_AXIS),
                             P(SRC_AXIS), P(SRC_AXIS)),
        check_vma=False,
    )
    return fn(tbl, src_m, src_c, src_cen, tol)


def solve_sweep_theta_sharded(
    cg: CirculantGraph,
    sources,
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    mesh: Optional[Mesh] = None,
    receivers=None,
    max_rounds: int = None,
    _packed=None,
) -> Tuple[np.ndarray, int]:
    """Domain-decomposed sweep solve over a theta-sharded device mesh.

    Returns (values, rounds): values is (S, n_out) node-ordered travel
    times (all nodes, or the `receivers` subset).  ntheta must divide by
    the mesh size; sources are vmapped (replicated) on every device --
    shard big SOURCE batches with parallel/multisource.py, big GRIDS
    with this.  Backtrace (`prev`) is not assembled here: recover paths
    with the single-device engines, or from the field via the host
    steepest-descent walk (solvers/path.py).
    """
    mesh = mesh if mesh is not None else make_theta_mesh()
    dtype = jnp.dtype(config.dtype)
    ws = _packed if _packed is not None else pack_twrapped_stencil(
        cg, dtype=dtype, band_closure=0)
    tbl, static = pack_sweep_tables(ws, cg, dtype)
    if static.nt % mesh.devices.size:
        raise ValueError(
            f"ntheta={static.nt} not divisible by mesh size "
            f"{mesh.devices.size}")
    sources = np.atleast_1d(np.asarray(sources, dtype=np.int64))
    cmap = cg.cmap
    S = len(sources)
    is_cen = sources == cmap.center
    src_m = jnp.asarray(np.where(is_cen, 0, cmap.m_of[sources]), jnp.int32)
    src_c = jnp.asarray(np.where(is_cen, 0, cmap.c_of[sources]), jnp.int32)
    src_cen = jnp.asarray(is_cen)
    tol = jnp.asarray(config.tol_value(), dtype)
    cap = max_rounds if max_rounds is not None else config.max_iters

    st = _solve_theta_sharded_jit(src_m, src_c, src_cen, tbl, tol, static,
                                  cap, S, mesh)
    n_out, (jm, jc, jcm, jv) = _extract_cached(ws.dcache, cmap, receivers)
    nt = static.nt
    cen2d = jnp.broadcast_to(jnp.repeat(st.cen, LANES)[None, :],
                             (SUB, S * LANES))
    rows = np.asarray(_textract_jit(st.dist.reshape(S * nt, static.ML),
                                    cen2d, st.it, jm, jc, jcm, jv, S, nt))
    return rows[:, :-1], int(rows[0, -1])


def solve_sweep_mesh_sharded(
    cg: CirculantGraph,
    sources,
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    mesh: Optional[Mesh] = None,
    receivers=None,
    max_rounds: int = None,
    _packed=None,
) -> Tuple[np.ndarray, int]:
    """Sweep solve over a 2-D (source, theta) device mesh — the
    composed scaling mode: the source batch is data-parallel across
    mesh ROWS (zero inter-row collectives, like
    parallel/multisource.py) while each row domain-decomposes the
    grid's theta axis with the ring-halo block Gauss-Seidel of
    `solve_sweep_theta_sharded`.  Use when BOTH the table (many
    sources) and the field (big grid) outgrow one chip: a v5e-64 as an
    8x8 mesh holds 8 source shards of an 8-chip-wide grid.

    Returns (values, rounds): values is (S, n_out) in the caller's
    source order; rounds is the max halo-exchange round count over the
    source rows.  S is padded up to a multiple of the source-axis size
    internally (pad rows re-solve sources[0] and are dropped).  ntheta
    must divide by the theta-axis size.
    """
    mesh = mesh if mesh is not None else make_grid_mesh(1)
    if SRC_AXIS not in mesh.shape or THETA_AXIS not in mesh.shape:
        raise ValueError(f"mesh must have axes ({SRC_AXIS!r}, "
                         f"{THETA_AXIS!r}); got {tuple(mesh.shape)}")
    d_src = mesh.shape[SRC_AXIS]
    dtype = jnp.dtype(config.dtype)
    ws = _packed if _packed is not None else pack_twrapped_stencil(
        cg, dtype=dtype, band_closure=0)
    tbl, static = pack_sweep_tables(ws, cg, dtype)
    if static.nt % mesh.shape[THETA_AXIS]:
        raise ValueError(
            f"ntheta={static.nt} not divisible by theta-axis size "
            f"{mesh.shape[THETA_AXIS]}")
    sources = np.atleast_1d(np.asarray(sources, dtype=np.int64))
    S0 = len(sources)
    pad = (-S0) % d_src
    if pad:
        sources = np.concatenate([sources, np.full(pad, sources[0])])
    S = len(sources)
    cmap = cg.cmap
    is_cen = sources == cmap.center
    src_m = jnp.asarray(np.where(is_cen, 0, cmap.m_of[sources]), jnp.int32)
    src_c = jnp.asarray(np.where(is_cen, 0, cmap.c_of[sources]), jnp.int32)
    src_cen = jnp.asarray(is_cen)
    tol = jnp.asarray(config.tol_value(), dtype)
    cap = max_rounds if max_rounds is not None else config.max_iters

    st = _solve_mesh_sharded_jit(src_m, src_c, src_cen, tbl, tol, static,
                                 cap, S, mesh)
    n_out, (jm, jc, jcm, jv) = _extract_cached(ws.dcache, cmap, receivers)
    nt = static.nt
    cen2d = jnp.broadcast_to(jnp.repeat(st.cen, LANES)[None, :],
                             (SUB, S * LANES))
    rounds = jnp.max(st.it)
    rows = np.asarray(_textract_jit(st.dist.reshape(S * nt, static.ML),
                                    cen2d, rounds, jm, jc, jcm, jv, S, nt))
    return rows[:S0, :-1], int(rows[0, -1])


def _staged_block_fn(static, max_rounds: int, D: int,
                     resets, cen_keeps, halos, n_stages: int):
    """Per-device staged block Gauss-Seidel closure: the sharded
    counterpart of ops/sweep_theta.py::_solve_sweep_staged_jit.  Stage
    masks (slot-space resets) and the twin halo min-merge are LANE-space
    operations within each theta column, so they shard along theta with
    zero extra collectives; only the ring halo, centre-fan pmin and the
    convergence psum cross devices - identical per-round comm volume to
    the plain sharded solve."""
    nt, ML = static.nt, static.ML
    ntl = nt // D
    perm_fwd = [(i, (i + 1) % D) for i in range(D)]
    perm_bwd = [((i + 1) % D, i) for i in range(D)]

    def block(stage_tbls, reset_keeps, halo_maps, src_m, src_c, src_cen,
              tol):
        dtype = stage_tbls[0].wg[0].dtype
        inf = jnp.asarray(jnp.inf, dtype)
        zero = jnp.zeros((), dtype)
        bid = jax.lax.axis_index(THETA_AXIS)
        col = bid * ntl + jnp.arange(ntl, dtype=jnp.int32)[None, :, None]
        lane = jnp.arange(ML, dtype=jnp.int32)[None, None, :]
        v = jnp.where((col == src_c[:, None, None])
                      & (lane == src_m[:, None, None])
                      & (~src_cen[:, None, None]), zero, inf)
        cen = jnp.where(src_cen, zero, inf)
        it = jnp.zeros((), jnp.int32)

        for i in range(n_stages):
            tbl = stage_tbls[i]
            fan = tbl.fan_w[None, None, :]
            fan_in = tbl.fan_in[None, None, :]
            if resets[i]:
                v = jnp.where(reset_keeps[i][None, None, :], v, inf)
                if not cen_keeps[i]:
                    cen = jnp.full_like(cen, jnp.inf)

            def rnd(state: SweepState, tbl=tbl, fan=fan, fan_in=fan_in,
                    stage=i) -> SweepState:
                v, cen = state.dist, state.cen
                cen_loc = jnp.min(v + fan_in, axis=(1, 2))
                cen = jnp.minimum(cen, jax.lax.pmin(cen_loc, THETA_AXIS))
                v = jnp.minimum(v, cen[:, None, None] + fan)
                left = jax.lax.ppermute(v[:, -2:, :], THETA_AXIS, perm_fwd)
                right = jax.lax.ppermute(v[:, :2, :], THETA_AXIS, perm_bwd)
                v = _sweep(v, tbl, static, reverse=False,
                           carry_init=(left[:, 1], left[:, 0]))
                v = _sweep(v, tbl, static, reverse=True,
                           carry_init=(right[:, 0], right[:, 1]))
                if halos[stage]:
                    # unmasked twin min-merge, improvement-gated against
                    # the round-start field (src/SSSP/bfm.jl:54-62) -
                    # lane-space, local to each column shard
                    hm = halo_maps[stage]
                    pv = v[:, :, hm]
                    improved = pv < state.dist[:, :, hm]
                    pv = jnp.where(improved, pv, jnp.asarray(jnp.inf, dtype))
                    v = jnp.minimum(v, jnp.min(pv, axis=2))
                changed_loc = (jnp.any(v < state.dist - tol)
                               | jnp.any(cen < state.cen - tol))
                changed = jax.lax.psum(
                    changed_loc.astype(jnp.int32), THETA_AXIS) > 0
                return SweepState(v, cen, changed, state.it + 1)

            def cond(s: SweepState):
                return s.changed & (s.it < max_rounds)

            st = jax.lax.while_loop(
                cond, rnd, SweepState(v, cen, jnp.asarray(True), it))
            v, cen, it = st.dist, st.cen, st.it

        fan = stage_tbls[-1].fan_w[None, None, :]
        fan_in = stage_tbls[-1].fan_in[None, None, :]
        cen_loc = jnp.min(v + fan_in, axis=(1, 2))
        cen = jnp.minimum(cen, jax.lax.pmin(cen_loc, THETA_AXIS))
        v = jnp.minimum(v, cen[:, None, None] + fan)
        return SweepState(v, cen, st.changed, it)

    return block


@functools.partial(jax.jit,
                   static_argnames=("static", "max_rounds", "S", "mesh",
                                    "resets", "cen_keeps", "halos"))
def _solve_staged_theta_sharded_jit(src_m, src_c, src_cen, stage_tbls,
                                    reset_keeps, halo_maps, tol, static,
                                    max_rounds: int, S: int, mesh: Mesh,
                                    resets, cen_keeps, halos):
    block = _staged_block_fn(static, max_rounds, mesh.devices.size,
                             resets, cen_keeps, halos, len(stage_tbls))
    fn = jax.shard_map(
        block, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P()),
        out_specs=SweepState(P(None, THETA_AXIS, None), P(), P(), P()),
        check_vma=False,
    )
    return fn(stage_tbls, reset_keeps, halo_maps, src_m, src_c, src_cen,
              tol)


def solve_sweep_staged_theta_sharded(
    cg: CirculantGraph,
    ws,
    stages,
    sources,
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    mesh: Optional[Mesh] = None,
    receivers=None,
    max_rounds: int = None,
) -> Tuple[np.ndarray, int]:
    """Staged (region-masked / multi-leg) sweep solve over a
    theta-sharded device mesh - the sharded engine for
    solvers/phases.py's PcP/ScS/converted staged solves and
    solvers/multiphase.py's layer sweeps (VERDICT r04 item 4: the
    phases x domain-decomposition composition).  API mirrors
    ops/sweep_theta.py::solve_sweep_staged; equality vs the
    single-device staged engine is pinned in tests/test_theta_shard.py
    and __graft_entry__.dryrun_multichip."""
    from ..ops.sweep_theta import pack_sweep_tables as _pst

    mesh = mesh if mesh is not None else make_theta_mesh()
    dtype = jnp.dtype(config.dtype)
    _, static = _pst(ws, cg, dtype)
    if static.nt % mesh.devices.size:
        raise ValueError(
            f"ntheta={static.nt} not divisible by mesh size "
            f"{mesh.devices.size}")
    sources = np.atleast_1d(np.asarray(sources, dtype=np.int64))
    cmap = cg.cmap
    S = len(sources)
    nt, ML = static.nt, static.ML

    stage_tbls = tuple(sp.tables for sp in stages)
    resets = tuple(sp.reset_keep is not None for sp in stages)
    reset_keeps = tuple(
        jnp.asarray(sp.reset_keep if sp.reset_keep is not None
                    else np.ones(ML, dtype=bool))
        for sp in stages)
    cen_keeps = tuple(bool(sp.cen_keep) for sp in stages)
    halos = tuple(sp.halo_map is not None for sp in stages)
    halo_maps = tuple(
        jnp.asarray(sp.halo_map if sp.halo_map is not None
                    else np.arange(ML, dtype=np.int32)[None, :])
        for sp in stages)

    is_cen = sources == cmap.center
    src_m = jnp.asarray(np.where(is_cen, 0, cmap.m_of[sources]), jnp.int32)
    src_c = jnp.asarray(np.where(is_cen, 0, cmap.c_of[sources]), jnp.int32)
    src_cen = jnp.asarray(is_cen)
    tol = jnp.asarray(config.tol_value(), dtype)
    cap = max_rounds if max_rounds is not None else config.max_iters

    st = _solve_staged_theta_sharded_jit(
        src_m, src_c, src_cen, stage_tbls, reset_keeps, halo_maps, tol,
        static, cap, S, mesh, resets, cen_keeps, halos)

    n_out, (jm, jc, jcm, jv) = _extract_cached(ws.dcache, cmap, receivers)
    cen2d = jnp.broadcast_to(jnp.repeat(st.cen, LANES)[None, :],
                             (SUB, S * LANES))
    rows = np.asarray(_textract_jit(st.dist.reshape(S * nt, static.ML),
                                    cen2d, st.it, jm, jc, jcm, jv, S, nt))
    return rows[:, :-1], int(rows[0, -1])


def station_fields_sharded(
    cg: CirculantGraph,
    stations,
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    mesh: Optional[Mesh] = None,
) -> np.ndarray:
    """(n_stations, n) station travel-time fields for the locator
    (solvers/locate.py), the STATION axis data-parallel across the
    device mesh (reciprocity: one solve per station; zero inter-shard
    collectives) - the sharded form of locate.station_fields
    (VERDICT r04 item 4).  Pass a (source x theta) mesh from
    make_grid_mesh to also domain-decompose each field; a plain 1-D
    mesh shards stations only."""
    mesh = mesh if mesh is not None else make_grid_mesh(
        len(jax.devices()), 1)
    if SRC_AXIS not in mesh.shape:
        # 1-D theta mesh: treat its devices as station shards
        devs = list(mesh.devices.ravel())
        mesh = make_grid_mesh(len(devs), 1, devs)
    vals, _ = solve_sweep_mesh_sharded(cg, stations, config, mesh=mesh)
    return vals
